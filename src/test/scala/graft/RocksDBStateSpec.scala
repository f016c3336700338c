package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.schemas.Transit._
import graft.streaming.TransitStreams

/** The train tracker on the RocksDB state store — the provider for state
  * that outgrows executor heaps (hundreds of GB of keys at 100 TB ingest).
  * Own session: the provider is a session-level conf.
  */
class RocksDBStateSpec extends SparkSpec {

  test("trainPositions runs identically on the RocksDB state store") {
    // isolated session: getOrCreate would apply the provider conf to the
    // suite-shared session and leak it into every later streaming test
    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import rocks.implicits._
    implicit val sqlCtx = rocks.sqlContext
    val input = MemoryStream[Arrival]
    val q = TransitStreams.trainPositions(input.toDS())
      .writeStream.format("memory").queryName("rocks_tp")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Arrival(1000L, 10, "RL001", "b", "red", "in_service", None, None))
      q.processAllAvailable()
      input.addData(Arrival(2000L, 20, "RL001", "b", "red", "in_service", Some(10), Some("b")))
      q.processAllAvailable()
      val latest = rocks.table("rocks_tp").as[PlatformState].collect()
        .groupBy(p => (p.station_id, p.direction))
        .map { case (_, ps) => ps.maxBy(_.updated) }
      assert(latest.find(_.station_id == 20).get.train_id.contains("RL001"))
      assert(latest.find(_.station_id == 10).get.train_id.isEmpty)
    } finally q.stop()
  }
}
