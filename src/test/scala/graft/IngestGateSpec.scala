package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IngestGate

class IngestGateSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200000L
  // (doc_id, text, source, timestamp)
  private type Doc = (Long, String, String, Long)

  private val benchVocab =
    Seq("alpha beta gamma delta", "gamma delta epsilon zeta").toDF("s")

  test("audit classifies short, repetitive, contaminated, and clean docs") {
    val docs = Seq[Doc](
      (1L, "a solid document with plenty of varied words inside", "web", T0),
      (2L, "tiny", "web", T0),
      (3L, "buy now buy now buy now buy now buy now buy now", "spam", T0),
      (4L, "prefix alpha beta gamma delta suffix words here", "web", T0))
      .toDF("doc_id", "text", "source", "timestamp")
    val m = IngestGate.audit(docs, benchVocab).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    assert(m == Map(1L -> "ok", 2L -> "too_short", 3L -> "repetitive",
      4L -> "contaminated"))
  }

  test("admit stream: gates apply per-row and duplicates drop across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = IngestGate.admit(input.toDF().toDF("doc_id", "text", "source", "timestamp"),
        benchVocab)
      .writeStream.format("memory").queryName("admitted")
      .outputMode(OutputMode.Append()).start()
    try {
      val goodA = "the first clean document of the morning run"
      input.addData(
        (1L, goodA, "web", T0),
        (2L, "buy now buy now buy now buy now buy now buy now", "spam", T0 + 1000),
        (3L, "prefix alpha beta gamma delta suffix words here", "web", T0 + 2000))
      q.processAllAvailable()
      input.addData(
        (4L, goodA, "mirror", T0 + 60 * 1000), // exact dup of doc 1 → dropped
        (5L, "a second clean document arrives in batch two", "web", T0 + 61 * 1000))
      q.processAllAvailable()
      input.addData(
        (6L, goodA, "mirror2", T0 + 120 * 1000), // still within watermark → dropped
        (7L, "a third clean document closes out batch three", "web", T0 + 121 * 1000))
      q.processAllAvailable()
      val admitted = spark.table("admitted").collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(admitted == Seq(1L, 5L, 7L),
        s"expected gates + cross-batch dedup to admit 1,5,7; got $admitted")
    } finally q.stop()
  }
}
