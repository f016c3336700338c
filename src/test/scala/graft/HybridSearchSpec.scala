package graft

import graft.operators.HybridSearch

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: consensus beats a single list's #1; absent side contributes 0") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val dense = Seq((40L, 1L), (20L, 2L), (30L, 4L)).toDF("id", "rank")
    val got = HybridSearch.rrfFuse(lex, dense, k = 10).collect()
    val byId = got.map(r => r.getAs[Long]("id") -> r).toMap
    val order = got.map(_.getAs[Long]("id")).toSeq
    // 20 is rank 2 in BOTH lists: 1/62 + 1/62 > 1/61 (either #1 alone)
    assert(order.head == 20L)
    // 30 (ranks 3 and 4) still out-fuses both solo #1s: 1/63 + 1/64 > 1/61
    assert(order(1) == 30L)
    // solo entries tie on the reciprocal of rank 1 -> id ascending
    assert(order.drop(2) == Seq(10L, 40L))
    assert(byId(10L).getAs[Double]("rrf") == byId(40L).getAs[Double]("rrf"))
    // absent ranks surface as NULL, not 0
    assert(byId(10L).isNullAt(byId(10L).fieldIndex("dense_rank")))
    assert(byId(40L).isNullAt(byId(40L).fieldIndex("lex_rank")))
  }

  test("hybridTopK: ids enter from either retriever, k bounds the fusion") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val got = HybridSearch.hybridTopK(
      docs, emb, Seq("dup", "window", "merge"), queryVecId = 0L, k = 15)
      .collect()
    assert(got.length == 15)
    // monotone rrf in output order; ties broken by id
    val rrfs = got.map(_.getAs[Double]("rrf")).toSeq
    assert(rrfs == rrfs.sorted(Ordering[Double].reverse))
    // at least one id made the cut from each side alone
    assert(got.exists(r => r.isNullAt(r.fieldIndex("dense_rank"))))
    assert(got.exists(r => r.isNullAt(r.fieldIndex("lex_rank"))))
    // the dense side never returns the query vector itself
    assert(!got.exists(r => !r.isNullAt(r.fieldIndex("dense_rank"))
      && r.getAs[Long]("id") == 0L && r.isNullAt(r.fieldIndex("lex_rank"))))
  }

  test("hybridTopKAnn: ANN-served fusion stays close to the exact twin") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val exact = HybridSearch.hybridTopK(
      docs, emb, Seq("dup", "window", "merge"), queryVecId = 0L)
      .collect().map(_.getAs[Long]("id")).toSet
    val served = HybridSearch.hybridTopKAnn(
      docs, emb, Seq("dup", "window", "merge"), queryVecId = 0L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(served.size == exact.size)
    // the lexical half is identical; only dense-side recall differs, so
    // the fused sets must overlap substantially (>= half at this sf)
    assert((served & exact).size * 2 >= exact.size,
      s"ANN-served fusion drifted too far: ${(served & exact).size}/${exact.size}")
  }

  test("hybridRecallAudit: anchor row exact, tier rows consistent with their fusions") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val terms = Seq("dup", "window", "merge")
    val audit = HybridSearch.hybridRecallAudit(docs, emb, terms, queryVecId = 0L)
      .collect().map(r => r.getAs[String]("tier") -> r).toMap
    assert(audit.keySet ==
      Set("exact_brute", "ivfpq_rerank", "ivfpq_rerank_mp4", "lsh_multiprobe"))
    // widening the probe can only add candidates: fused recall is
    // monotone in nprobe (0.52 -> 0.64 at sf0.01; see the scaladoc)
    assert(audit("ivfpq_rerank_mp4").getAs[Long]("hits") >=
      audit("ivfpq_rerank").getAs[Long]("hits"))
    // the exact fusion compared to itself is the 1.0 anchor
    assert(audit("exact_brute").getAs[Double]("recall") == 1.0)
    // each tier's hits must equal an independent recount of its fused ids
    val truth = HybridSearch.hybridTopK(docs, emb, terms, 0L)
      .collect().map(_.getAs[Long]("id")).toSet
    val pqIds = HybridSearch.hybridTopKAnnIvfPq(docs, emb, terms, 0L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(audit("ivfpq_rerank").getAs[Long]("hits") == (pqIds & truth).size.toLong)
    // recall = hits / k at 6 dp
    val h = audit("lsh_multiprobe").getAs[Long]("hits")
    assert(audit("lsh_multiprobe").getAs[Double]("recall") ==
      math.round(h / 25.0 * 1e6) / 1e6)
  }
}
