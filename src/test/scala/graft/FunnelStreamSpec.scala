package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions.col
import graft.streaming.FunnelStream

/** The live funnel replayed against the batch operator: min-per-step is
  * order-insensitive, so chunked out-of-order arrival must land on the
  * exact batch histogram.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  test("funnelDepths replay == batch funnel histogram; regressions emit") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val steps = Seq("view", "click", "purchase")
      val events = Tables.events(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getString(3), r.getDouble(4)))
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val q = FunnelStream.funnelDepths(
        input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
        steps)
        .writeStream.format("memory").queryName("funnel_stream")
        .outputMode(OutputMode.Update()).start()
      val emissions = try {
        // reverse order: late events arrive first — min-per-step must not care
        events.reverse.grouped(math.max(1, events.length / 7)).foreach { c =>
          input.addData(c); q.processAllAvailable()
        }
        spark.table("funnel_stream").as[FunnelStream.DepthChange].collect().toSeq
      } finally q.stop()
      // latest emission per user (memory sink appends update-mode changes
      // in batch order; the final depth is the last one)
      val streamedDepths = emissions.zipWithIndex
        .groupBy(_._1.user_id)
        .map { case (_, es) => es.maxBy(_._2)._1.depth }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val batch = graft.operators.Relational.funnel(Tables.events(spark, sf), steps)
        .collect()
        .map(r => r.getAs[Int]("depth") -> r.getAs[Long]("n_users")).toMap
      assert(streamedDepths == batch,
        s"stream histogram $streamedDepths != batch $batch")
      // out-of-order arrival makes per-user depth NON-monotone (a late
      // earlier 'click' can break the view<=click link), which is exactly
      // why every change — including regressions — must emit; the
      // reversed replay above plus the histogram equality exercises it
      assert(emissions.nonEmpty)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
