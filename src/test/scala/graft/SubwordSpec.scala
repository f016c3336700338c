package graft

import org.apache.spark.sql.functions._
import graft.operators.Subword
import graft.operators.Subword.Merge

class SubwordSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("fitMerges learns the hand-computable merge sequence, rounds compose") {
    // vocab: "aaab" x3, "ab" x2 (one doc each so word counts are explicit)
    val d = docs(
      (1L, "aaab aaab ab"),
      (2L, "aaab ab"))
    // round 1 pair totals: (a,a) = 2 occurrences x 3 words... per-word
    // adjacency weighted by corpus count: aaab -> [(a,a),(a,a),(a,b)] x 3,
    // ab -> [(a,b)] x 2  =>  (a,a)=6, (a,b)=5
    // round 2 (after aaab -> (aa)(ab), ab -> (ab)): only (aa,ab)=3
    val ms = Subword.fitMerges(d, rounds = 2, mergesPerRound = 2, maxVocab = 16)
    assert(ms == Seq(Merge(1, "a", "a"), Merge(2, "a", "b"), Merge(3, "aa", "ab")))
  }

  test("greedy left-to-right merge scan: overlaps resolve like classic BPE") {
    val ms = Seq(Merge(1, "a", "a"))
    val out = Subword.subwordCounts(
      docs((1L, "aaa"), (2L, "aaaa"), (3L, "aaaaa"), (4L, "b")), ms)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // (a)(a)(a) -> (aa)(a); (a)(a)(a)(a) -> (aa)(aa); 5 a's -> (aa)(aa)(a)
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
  }

  test("subwordCounts kernel matches the declarative HOF fold exactly") {
    // string ops only, so parity is exact equality — the kernel must be a
    // drop-in for the aggregate∘transform fold it replaced in the hot path
    val docs = Tables.documents(spark, sf)
    val merges = Subword.fitMerges(docs)
    val a = Subword.subwordCounts(docs, merges).collect().map(_.toSeq).toSeq
    val b = Subword.subwordCountsHof(docs, merges).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("subwordCounts: learned merges compress the corpus it was fit on") {
    val d = docs(
      (1L, "aaab aaab ab"),
      (2L, "aaab ab"),
      (3L, "zz qq"))
    val ms = Subword.fitMerges(d, rounds = 2, mergesPerRound = 2, maxVocab = 16)
    val out = Subword.subwordCounts(d, ms).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 1: aaab->1 subword, aaab->1, ab->1 => (3 tokens, 3 subwords).
    // round 2's second slot falls to the (q,q)=(z,z)=1 tie, broken by pair
    // asc => (q,q) merges (rank 4), zz stays 2 chars: doc 3 = 1 + 2
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, 1.0),
      (2L, 2L, 2L, 1.0),
      (3L, 2L, 3L, 1.5)))
  }

  test("subword lengthBuckets assigns power-of-two buckets on subword counts") {
    val ms = Seq(Merge(1, "a", "a"))
    // 20 a's -> 10 subwords -> bucket 16; 3 a's -> 2 -> bucket 4 (min)
    val out = Subword.lengthBuckets(
      docs((1L, "a" * 20), (2L, "aaa")), ms, minBucket = 4, maxBucket = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 10L, 16L), (2L, 2L, 4L)))
  }

  test("harness corpus honors the control-char contract; real-corpus fit is sane") {
    val corpus = Tables.documents(spark, sf)
    // the STX/ETX wrapping (and the oracle's chr(1) merge encoding) require
    // the corpus to be free of U+0001..U+0003 — pin it, like the ASCII pin
    // behind the phash oracle
    assert(corpus.filter(col("text").rlike("[\\x01-\\x03]")).count() == 0,
      "corpus text must not contain U+0001..U+0003")
    val ms = Subword.fitMerges(corpus, rounds = 2, mergesPerRound = 10)
    assert(ms.size == 20 && ms.map(_.rank) == (1 to 20))
    val rows = Subword.subwordCounts(corpus, ms).collect()
    // every doc: at least one subword per nonempty token, at most one per char
    val byId = corpus.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val text = byId(r.getLong(0))
      val toks = text.split(" ", -1)
      val nonEmpty = toks.count(_.nonEmpty)
      val chars = toks.map(_.length).sum
      assert(r.getLong(2) >= nonEmpty && r.getLong(2) <= chars,
        s"doc ${r.getLong(0)}: ${r.getLong(2)} subwords outside [$nonEmpty, $chars]")
    }
    // the merges actually compress: strictly fewer subwords than characters
    val totalSw = rows.map(_.getLong(2)).sum
    val totalChars = byId.values.map(_.split(" ", -1).map(_.length).sum).sum
    assert(totalSw < totalChars)
  }

  test("vocab: chars first ascending, merge symbols appended in rank order, no dup ids") {
    val d = docs((1L, "ab ab ba"))
    val ms = Seq(Merge(1, "a", "b"), Merge(2, "b", "a"))
    val v = Subword.vocab(d, ms)
    // base chars of the corpus text: ' ', 'a', 'b' — ascending
    assert(v.take(3) == Seq(" " -> 0L, "a" -> 1L, "b" -> 2L))
    assert(v.drop(3) == Seq("ab" -> 3L, "ba" -> 4L))
    assert(v.map(_._2) == v.indices.map(_.toLong))
    // first creation wins: a duplicate-producing later merge adds nothing
    val v2 = Subword.vocab(d, ms :+ Merge(3, "ab", "a") :+ Merge(4, "a", "ba"))
    assert(v2.count(_._1 == "aba") == 1)
    assert(v2.collectFirst { case ("aba", id) => id }.contains(5L))
  }

  test("encodeIds: decodable stream, in-vocab ids, counts agree with subwordCounts") {
    val corpus = Tables.documents(spark, sf)
    val ms = Subword.fitMerges(corpus, rounds = 2, mergesPerRound = 10)
    val enc = Subword.encodeIds(corpus, ms).collect()
    val vmap = Subword.vocab(corpus, ms).toMap
    // corpus text never encodes out-of-vocab, and every id matches its symbol
    enc.foreach { r =>
      assert(r.getLong(3) >= 0L, s"OOV at doc ${r.getLong(0)} pos ${r.getLong(1)}")
      assert(vmap(r.getString(2)) == r.getLong(3))
    }
    // concatenating symbols in pos order reproduces the doc without spaces
    val byId = corpus.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val grouped = enc.groupBy(_.getLong(0))
    grouped.foreach { case (id, rows) =>
      val joined = rows.sortBy(_.getLong(1)).map(_.getString(2)).mkString
      assert(joined == byId(id).replace(" ", ""), s"doc $id does not decode")
    }
    // per-doc subword counts equal the subwordCounts serve path
    val counts = Subword.subwordCounts(corpus, ms).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    grouped.foreach { case (id, rows) => assert(rows.length.toLong == counts(id)) }
  }

  test("fertilityByLang: the lang the merges table was not fit for fragments more") {
    // 'aa' dominates the pair stats, so the fit learns a+a; lang Y's 'bc'
    // words never merge and stay two symbols each
    val docs = (1L to 8L).map(i => (i, "aa aa aa", "X", "web")) ++
      Seq((9L, "bc bc bc", "Y", "web"), (10L, "bc bc", "Y", "web"))
    val d = docs.toDF("doc_id", "text", "lang", "source")
    val ms = Subword.fitMerges(d, rounds = 1, mergesPerRound = 1, maxVocab = 16)
    val got = Subword.fertilityByLang(d, ms).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(got.keySet == Set("X", "Y"))
    // X: every 'aa' folds to one symbol -> fertility 1.0
    assert(got("X").getAs[Double]("fertility") == 1.0)
    // Y: 'bc' stays (b)(c) -> fertility 2.0; chars count the RAW text
    // (spaces included, what the tokenizer consumes): 8+5 over 10 subwords
    assert(got("Y").getAs[Double]("fertility") == 2.0)
    assert(got("Y").getAs[Double]("chars_per_subword") == 1.3)
    // integer sides are exact: Y = 2 docs, 5 words, 10 subwords
    assert(got("Y").getAs[Long]("n_docs") == 2L)
    assert(got("Y").getAs[Long]("total_tokens") == 5L)
    assert(got("Y").getAs[Long]("total_subwords") == 10L)
  }
}
