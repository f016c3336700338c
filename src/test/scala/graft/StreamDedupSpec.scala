package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{StreamDedup, Windows}
import graft.schemas.Transit._

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(doc_id: Long, timestamp: Long, text: String)

  test("streaming exact dedup drops repeats across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamDedup.dedupExact(input.toDF())
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Doc(1, 1000, "alpha"), Doc(2, 2000, "beta"))
      q.processAllAvailable()
      input.addData(Doc(3, 3000, "alpha"), Doc(4, 4000, "gamma")) // repeat in later batch
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 4L))
    } finally q.stop()
  }

  test("watermarked dedup bounds state but still drops near-in-time repeats") {
    implicit val sqlCtx = spark.sqlContext
    val T0 = 1704067200000L
    val input = MemoryStream[Doc]
    val q = StreamDedup.dedupExactWithinWatermark(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("wdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Doc(1, T0, "alpha"), Doc(2, T0 + 60000, "alpha"))
      q.processAllAvailable()
      val ids = spark.table("wdedup").select("doc_id").as[Long].collect()
      assert(ids.toSeq == Seq(1L)) // in-horizon duplicate dropped
    } finally q.stop()
  }

  test("stream-stream join attaches the co-hour weather to entries") {
    implicit val sqlCtx = spark.sqlContext
    val T0 = 1704067200000L // on the hour
    val turnstiles = MemoryStream[TurnstileEvent]
    val weather = MemoryStream[WeatherReading]
    val joined = Windows.entriesWithWeather(turnstiles.toDF(), weather.toDF())
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    try {
      weather.addData(WeatherReading(T0 + 60000, 21.5f, "sunny"))
      turnstiles.addData(
        TurnstileEvent(T0 + 120000, 100, "S", "red"),          // same hour → joins
        TurnstileEvent(T0 + 2 * 3600000 + 1, 100, "S", "red")) // different hour → no match
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Float]("temperature") == 21.5f)
      assert(rows(0).getAs[String]("weather_status") == "sunny")
    } finally q.stop()
  }
}
