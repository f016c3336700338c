package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.schemas.Transit._
import graft.streaming.Windows

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01 00:00 UTC

  test("tumbling windows close when the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TurnstileEvent]
    val q = Windows.tumblingCounts(input.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        TurnstileEvent(T0 + 1000, 100, "S", "red"),
        TurnstileEvent(T0 + 2000, 100, "S", "red"),
        TurnstileEvent(T0 + 11 * 60 * 1000, 100, "S", "red"))
      q.processAllAvailable()
      // advance watermark past the first window's end + delay
      input.addData(TurnstileEvent(T0 + 31 * 60 * 1000, 200, "T", "blue"))
      q.processAllAvailable()
      val rows = spark.table("tumbling").collect()
      val byWindow = rows.filter(_.getAs[Int]("station_id") == 100)
        .map(r => r.getAs[java.sql.Timestamp]("window_start").getTime -> r.getAs[Long]("entries"))
        .toMap
      assert(byWindow.get(T0) == Some(2L), s"first window: $byWindow")
      assert(byWindow.get(T0 + 10 * 60 * 1000) == Some(1L))
    } finally q.stop()
  }

  test("session windows merge bursts within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TurnstileEvent]
    val q = Windows.sessionCounts(input.toDF(), "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        TurnstileEvent(T0, 100, "S", "red"),
        TurnstileEvent(T0 + 60 * 1000, 100, "S", "red"),   // same session
        TurnstileEvent(T0 + 20 * 60 * 1000, 100, "S", "red")) // new session
      q.processAllAvailable()
      input.addData(TurnstileEvent(T0 + 60 * 60 * 1000, 200, "T", "blue"))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .filter($"station_id" === 100).collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Long]("entries")).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("sliding windows produce overlapping counts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TurnstileEvent]
    val q = Windows.slidingCounts(input.toDF(), "10 minutes", "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(TurnstileEvent(T0 + 6 * 60 * 1000, 100, "S", "red"))
      q.processAllAvailable()
      input.addData(TurnstileEvent(T0 + 60 * 60 * 1000, 200, "T", "blue"))
      q.processAllAvailable()
      // one event at minute 6 lands in windows [0,10) and [5,15)
      val rows = spark.table("sliding").filter($"station_id" === 100).collect()
      assert(rows.length == 2)
    } finally q.stop()
  }

  test("rate-source synthetic turnstile stream emits well-formed events") {
    val stations = graft.sources.TransitData.stations(spark)
    val stream = Windows.syntheticTurnstileStream(spark, stations, rowsPerSecond = 500)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("synth")
      .outputMode(OutputMode.Append()).start()
    try {
      // rate source needs wall-clock time to emit
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500); q.processAllAvailable()
        n = spark.table("synth").count()
      }
      assert(n > 0, "rate source emitted nothing within 30s")
      val row = spark.table("synth").head()
      assert(row.getAs[Long]("timestamp") > 0)
      assert(Seq("red", "blue", "green").contains(row.getAs[String]("line")))
      assert(row.getAs[String]("station_name").nonEmpty)
    } finally q.stop()
  }
}
