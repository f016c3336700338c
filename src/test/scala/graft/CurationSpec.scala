package graft

import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation snapshot assigns every decision branch with documented precedence") {
    val good = "the " + (0 until 59).map(i => s"word$i").mkString(" ")  // 60 tokens
    val goodDup = good.replace("word30", "other30")                    // near-dup of `good`
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "s0", "en"),          // holdout (0 % 97)
      (1L, "noise alpha beta gamma delta trailing words", "s1", "en"),  // contaminated
      (2L, "buy now buy now buy now buy now buy now buy now", "s1", "en"), // repetitive
      // low quality (10 long tokens: length+stopword+token-len components
      // all miss) but NOT repetition-flagged (9 distinct bigrams → top
      // bigram share 1/9; short docs with <5 bigrams would trip that rule)
      (3L, "the abcdefghijk lmnopqrstuv wxyzabcdefg hijklmnopqr stuvwxyzabc defghijklmno pqrstuvwxyza bcdefghijklm nopqrstuvwxy", "s1", "en"),
      (4L, good, "s1", "en"),                                           // keep (canonical)
      (5L, goodDup, "s1", "en"))                                        // duplicate of 4
      .toDF("doc_id", "text", "source", "lang")
    val m = Curation.curationSnapshot(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decision")).toMap
    assert(m == Map(
      0L -> "holdout", 1L -> "drop_contaminated", 2L -> "drop_repetitive",
      3L -> "drop_quality", 4L -> "keep", 5L -> "drop_duplicate"), s"got $m")
    val clusters = Curation.curationSnapshot(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(clusters(4L) == 4L && clusters(5L) == 4L)
  }

  test("sequence packing: contiguous per-source bins at the token budget") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, words(6), "a"), (2L, words(6), "a"), (3L, words(6), "a"),
      (10L, words(4), "b"), (11L, words(9), "b"))
      .toDF("doc_id", "text", "source")
    val rows = Curation.packSequences(d, budget = 10).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"))).toMap
    // source a: starts 0,6,12 -> seqs 0,0,1 (doc 2 straddles, owned by its start)
    assert(rows(1L) == (0L, 0L) && rows(2L) == (0L, 6L) && rows(3L) == (1L, 2L),
      s"got $rows")
    // source b packs independently from offset 0
    assert(rows(10L) == (0L, 0L) && rows(11L) == (0L, 4L))
  }
}
