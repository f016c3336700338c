package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamSample
import graft.operators.Curation

/** The streaming Efraimidis–Spirakis sampler replayed against the batch
  * draw: same keys by shared projection, exact top-n by the shard-union
  * argument, on RocksDB state.
  */
class StreamSampleSpec extends SparkSpec {
  import spark.implicits._

  test("weightedSampleStream replay == batch weightedSample, exactly") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = Tables.documents(spark, sf)
        .select("doc_id", "text", "source").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      val n = 20
      val input = MemoryStream[(Long, String, String)]
      val q = StreamSample.weightedSampleStream(
        input.toDF().toDF("doc_id", "text", "source"), n, nShards = 4)
        .writeStream.format("memory").queryName("ws_stream")
        .outputMode(OutputMode.Update()).start()
      val emissions = try {
        docs.grouped(math.max(1, docs.length / 5)).foreach { chunk =>
          input.addData(chunk); q.processAllAvailable()
        }
        spark.table("ws_stream").as[StreamSample.ShardTop].collect().toSeq
      } finally q.stop()

      val streamed = StreamSample.globalTopN(emissions, n)
      val batch = Curation.weightedSample(
        Tables.documents(spark, sf), n).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("skey"))).toSeq
      assert(streamed == batch,
        s"stream draw must equal the batch draw:\n$streamed\nvs\n$batch")
      // constant state: no shard ever emits more than n rows per version
      emissions.groupBy(e => (e.shard, e.version)).foreach { case (k, es) =>
        assert(es.size <= n, s"shard/version $k emitted ${es.size} > n rows")
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
