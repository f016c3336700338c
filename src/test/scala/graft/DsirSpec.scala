package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
  private val isTarget = col("lang") === "en"

  test("dsirRatiosFrame: every bucket present, counts conserve the streams") {
    val r = Dsir.dsirRatiosFrame(docs, isTarget).collect()
    assert(r.length == 1024)
    assert(r.map(_.getLong(0)).toSeq == (0L until 1024L))
    val (ct, cr) = (r.map(_.getLong(1)).sum, r.map(_.getLong(2)).sum)
    // feature stream totals: one feature per token + one per adjacent pair
    val expected = docs
      .select(isTarget.as("tgt"), size(split(col("text"), " ")).as("n"))
      .select(col("tgt"), (col("n") * 2 - 1).cast("long").as("f"))
      .groupBy(col("tgt")).agg(sum(col("f")).as("s"))
      .collect().map(x => x.getBoolean(0) -> x.getLong(1)).toMap
    assert(ct == expected(true), "target feature count must be conserved")
    assert(cr == expected(false), "raw feature count must be conserved")
  }

  test("weights cover exactly the raw pool; verdict mirrors the threshold") {
    val w = Dsir.dsirWeights(docs, isTarget).collect()
    val rawIds = docs.filter(!isTarget).select(col("doc_id"))
      .as[Long].collect().toSet
    assert(w.map(_.getLong(0)).toSet == rawIds)
    w.foreach { r =>
      val keep = r.getString(3) == "keep"
      assert(keep == (r.getDouble(2) >= 0.0))
      assert(r.getLong(1) > 0L)
    }
  }

  test("a target-language copy outranks a non-target copy in the raw pool") {
    val en = docs.filter(col("lang") === "en").orderBy(col("doc_id"))
      .select(col("text")).as[String].head()
    val zh = docs.filter(col("lang") === "zh").orderBy(col("doc_id"))
      .select(col("text")).as[String].head()
    val spiked = docs.select(col("doc_id"), col("text"), col("lang"))
      .unionByName(Seq(
        (900001L, en, "xx"), (900002L, zh, "xx"))
        .toDF("doc_id", "text", "lang"))
    val w = Dsir.dsirWeights(spiked, col("lang") === "en").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    info(f"logw(en-copy)=${w(900001L)}%.3f logw(zh-copy)=${w(900002L)}%.3f")
    assert(w(900001L) > w(900002L),
      "an English text must weigh more target-like than a Chinese one")
  }

  test("weights are invariant to repartitioning (order-independent sums)") {
    val a = Dsir.dsirWeights(docs, isTarget).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq.sorted
    val b = Dsir.dsirWeights(docs.repartition(17), isTarget).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq.sorted
    assert(a == b)
  }
}
