package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.DomainGate

// top-level so Spark can construct instances without an outer-scope pointer
case class GateDoc(doc_id: Long, source: String)

/** The streaming domain gate: blocklist drops are stateless and immediate;
  * the per-domain budget is ONE counter per domain that must survive
  * micro-batch boundaries — the first-N-arrivals contract (the
  * crawl-frontier form of the batch md5-rank cap; membership differs by
  * design, counts must not).
  */
class DomainGateSpec extends SparkSpec {

  private def rocksSession() = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  test("per-domain budget spans micro-batches; blocklist drops immediately") {
    val rocks = rocksSession()
    import rocks.implicits._
    implicit val sqlCtx = rocks.sqlContext
    val blocklist = Seq("spam.example").toDF("domain")
    val b1 = (1L to 5L).map(GateDoc(_, "dom0")) ++
      Seq(GateDoc(100L, "spam.example"), GateDoc(101L, "spam.example"))
    val b2 = (6L to 9L).map(GateDoc(_, "dom0")) ++
      Seq(GateDoc(102L, "spam.example"), GateDoc(200L, "dom1"))
    val input = MemoryStream[GateDoc]
    val q = DomainGate.admit(input.toDF(), blocklist, cap = 6)
      .writeStream.format("memory").queryName("sdomgate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val rows = rocks.table("sdomgate").collect().map(r =>
        r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("arrival_rank"), r.getAs[Boolean]("keep"),
            r.getAs[String]("reason"))).toMap
      assert(rows.size == b1.size + b2.size, "one verdict per arriving doc")
      // dom0's counter spans the batch boundary: 9 arrivals, budget 6 —
      // batch 2's docs continue at rank 6..9, they do NOT restart at 1
      val dom0 = (1L to 9L).map(rows)
      assert(dom0.map(_._1).sorted == (1L to 9L),
        s"arrival ranks must be the cross-batch sequence: $dom0")
      assert(dom0.count(_._2) == 6 && dom0.count(_._3 == "over_cap") == 3)
      // blocked domain: dropped with reason, regardless of batch
      Seq(100L, 101L, 102L).foreach { id =>
        assert(rows(id) == ((0L, false, "blocked")), s"doc $id")
      }
      // an unblocked domain under budget keeps everything
      assert(rows(200L) == ((1L, true, "kept")))
    } finally q.stop()
  }
}
