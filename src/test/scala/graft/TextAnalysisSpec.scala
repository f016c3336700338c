package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf ranks corpus-rare terms above ubiquitous ones") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "the bird flew over the house"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(d, k = 2).collect()
    // "the", "sat", "on" are shared -> idf low; each doc's top term must be
    // one of its unique words (idf = ln 3)
    val top1 = top.filter(_.getLong(0) == 1L).map(_.getAs[String]("token")).toSet
    assert(top1.subsetOf(Set("cat", "mat")), s"got $top1")
    // ubiquitous term scores zero: ln(3/3) = 0
    assert(!top.exists(r => r.getAs[String]("token") == "the"))
  }

  test("bigram PMI favors always-adjacent pairs over chance co-occurrence") {
    // "new york" always adjacent; "the" pairs with everything -> low PMI
    val phrase = Seq.fill(6)("in new york the weather is fine").mkString(" ")
    val d = Seq((1L, phrase)).toDF("doc_id", "text")
    val res = TextAnalysis.bigramPmi(d, minCount = 5, k = 10).collect()
    val pmis = res.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("pmi")).toMap
    assert(pmis.contains(("new", "york")))
    assert(pmis(("new", "york")) > 0)
  }

  test("token counts: BPE-ish regex splits punctuation that whitespace keeps") {
    val d = Seq((1L, "hello, world! x2")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(d).collect().head
    assert(r.getAs[Int]("ws_tokens") == 3)
    // hello , world ! x 2 -> 6
    assert(r.getAs[Int]("bpe_tokens") == 6)
  }

  test("tfidf is a per-doc top-k: at most k rows per doc, ranks contiguous") {
    val res = TextAnalysis.tfidfTopTerms(Tables.documents(spark, sf), k = 3).collect()
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.length <= 3 && ranks.sameElements(1 to ranks.length))
    }
  }
}
