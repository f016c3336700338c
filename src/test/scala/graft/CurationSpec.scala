package graft

import org.apache.spark.sql.functions.{avg, col, lit}
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

  test("curation snapshot accepts a holdout predicate over text") {
    // a content-keyed holdout marker is a realistic policy; the predicate is
    // computed once against the full input row, BEFORE the joins strip the
    // text column — referencing it in the final projection used to fail
    // analysis
    import org.apache.spark.sql.functions.col
    val benchWords = (0 until 59).map(i => s"bench$i").mkString(" ")
    val trainWords = (0 until 59).map(i => s"word$i").mkString(" ")
    val d = Seq(
      (1L, "BENCHMARK " + benchWords, "s0", "en"),
      (2L, "the " + trainWords, "s1", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val m = Curation.curationSnapshot(d, isHoldout = col("text").startsWith("BENCHMARK"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decision")).toMap
    assert(m(1L) == "holdout" && m(2L) == "keep", s"got $m")
  }

  test("rebalance sample: over-represented domain thins, rare domain keeps all") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // big: 4 docs x 20 tokens = 80; small: 2 docs x 10 = 20 -> shares 0.8/0.2
    // weights 0.625 / 2.5 -> rates 0.3125 / 1.0 at baseRate 0.5
    val d = ((1L to 4L).map(i => (i, words(20), "big")) ++
      Seq((10L, words(10), "small"), (11L, words(10), "small")))
      .toDF("doc_id", "text", "source")
    val rows = Curation.rebalanceSample(d).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rate")))
    val small = rows.filter(_._1 == "small")
    assert(small.map(_._2).sorted.toSeq == Seq(10L, 11L),
      "rate caps at 1.0 — the rare domain keeps every doc")
    assert(small.forall(_._3 == 1.0))
    assert(rows.filter(_._1 == "big").forall(_._3 == 0.3125))
    // the draw is replayable: same input -> identical sample
    assert(Curation.rebalanceSample(d).collect().toSeq ==
      Curation.rebalanceSample(d).collect().toSeq)
  }

  // enough keepers across two sources that curation, rebalance, and packing
  // all have real work: ids chosen so several md5 buckets fall under the
  // ~0.5 sample rate (the draw is deterministic, so the survivor set is too)
  private def corpusFixture = {
    def keeper(seed: Int) =
      "the " + (0 until 59).map(i => s"w$seed-$i").mkString(" ")
    val junk = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "s1", "en"), // holdout (0 % 97)
      (2L, "buy now buy now buy now buy now buy now buy now", "s1", "en")) // repetitive
    val keepers = (1 to 8).map(i => (100L + i, keeper(i), "s1", "en")) ++
      (1 to 8).map(i => (200L + i, keeper(100 + i), "s2", "en"))
    (junk ++ keepers).toDF("doc_id", "text", "source", "lang")
  }

  test("corpus build == the hand-chained curate -> rebalance -> pack stages") {
    import org.apache.spark.sql.functions.col
    val d = corpusFixture
    val got = Curation.corpusBuild(d, budget = 100)
    // the three public stages chained by hand, same defaults — pins the
    // composition so a refactor can never silently reorder or drop a stage
    val keepIds = Curation.curationSnapshot(d)
      .filter(col("decision") === "keep").select("doc_id")
    val kept = d.join(keepIds, Seq("doc_id"))
    val sampledIds = Curation.rebalanceSample(kept).select("doc_id")
    val expected = Curation.packSequences(kept.join(sampledIds, Seq("doc_id")), budget = 100)
    val gotRows = got.collect().toSeq
    assert(gotRows == expected.collect().toSeq)
    assert(gotRows.nonEmpty, "fixture must survive curation + sampling")
    assert(gotRows.map(_.getAs[String]("source")).distinct.size == 2,
      "both sources must pack")
  }

  test("corpus build: the final pack ordering is the plan's only range exchange") {
    val p = Curation.corpusBuild(corpusFixture, budget = 100)
      .queryExecution.executedPlan.toString
    val n = "rangepartitioning".r.findAllIn(p).size
    assert(n == 1, s"expected exactly one range exchange, got $n in:\n$p")
  }

  test("boilerplate removal: cross-doc repeated lines vanish, order survives") {
    import spark.implicits._
    val footer = "copyright 2026 example corp all rights reserved"
    val cookie = "we use cookies to improve your experience"
    val d = Seq(
      (1L, s"unique alpha content\n$footer\nmore body text", "s1"),
      (2L, s"$cookie\ndifferent beta content\n$footer", "s1"),
      (3L, s"$cookie\nthird gamma content", "s2"),
      (4L, "entirely original document", "s2"),
      // a line repeated WITHIN one doc only is not boilerplate (df counts
      // distinct documents, not occurrences)
      (5L, "self repeated line\nself repeated line\nown body", "s3"))
      .toDF("doc_id", "text", "source")
    val rows = Curation.removeBoilerplate(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("kept_segments"),
          r.getAs[Long]("removed_segments"))).toMap
    assert(rows(1L) == (("unique alpha content\nmore body text", 2L, 1L)), s"got ${rows(1L)}")
    assert(rows(2L) == (("different beta content", 1L, 2L)))
    assert(rows(3L) == (("third gamma content", 1L, 1L)))
    assert(rows(4L) == (("entirely original document", 1L, 0L)))
    assert(rows(5L) == (("self repeated line\nself repeated line\nown body", 3L, 0L)))
  }

  test("boilerplate removal: token-window segmentation round-trips clean docs") {
    import spark.implicits._
    // two docs share an 8-token aligned window; a third is untouched and
    // must round-trip byte-identically through segment + rejoin
    val shared = (1 to 8).map(i => s"bp$i").mkString(" ")
    val d = Seq(
      (1L, shared + " " + (1 to 5).map(i => s"a$i").mkString(" "), "s1"),
      (2L, shared + " " + (1 to 7).map(i => s"b$i").mkString(" "), "s1"),
      (3L, (1 to 19).map(i => s"c$i").mkString(" "), "s2"))
      .toDF("doc_id", "text", "source")
    val rows = Curation.removeBoilerplate(
      d, segments = Curation.tokenWindowSegments(8), joiner = " ").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("removed_segments"))).toMap
    assert(rows(1L) == (((1 to 5).map(i => s"a$i").mkString(" "), 1L)), s"got ${rows(1L)}")
    assert(rows(2L) == (((1 to 7).map(i => s"b$i").mkString(" "), 1L)))
    assert(rows(3L) == (((1 to 19).map(i => s"c$i").mkString(" "), 0L)),
      "untouched doc must reassemble to its exact original text")
  }

  test("shuffle shards: replayable permutation, contiguous per-shard positions") {
    import spark.implicits._
    val d = (1L to 200L).map(i => (i, s"text $i", "s")).toDF("doc_id", "text", "source")
    val a = Curation.shuffleShards(d, nShards = 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("shard_pos")))
    assert(a.map(_._1).sorted.toSeq == (1L to 200L), "a permutation covers every doc once")
    assert(a.forall(x => x._2 >= 0 && x._2 < 8))
    a.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $s positions must be contiguous from 1")
    }
    // replayable: no RNG state, identical on re-evaluation
    val b = Curation.shuffleShards(d, nShards = 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("shard_pos")))
    assert(b.toSeq == a.toSeq)
  }

  test("length buckets: smallest power-of-two step >= n, clamped at the max") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, words(10), "s"), (2L, words(16), "s"), (3L, words(17), "s"),
      (4L, words(100), "s")).toDF("doc_id", "text", "source")
    val m = Curation.lengthBuckets(d, minBucket = 16, maxBucket = 64).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bucket")).toMap
    assert(m == Map(1L -> 16L, 2L -> 16L, 3L -> 32L, 4L -> 64L), s"got $m")
  }

  test("incremental segment-df merge equals the full-corpus index") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val footer = "shared footer line"
    // the footer's df spans the old/batch split (1 old + 1 new); one line
    // repeats only inside old, one only inside batch
    val old_ = Seq(
      (1L, s"alpha body\n$footer\nold only line", "a"),
      (2L, "old only line\nbeta body", "a"))
      .toDF("doc_id", "text", "source")
    val batch = Seq(
      (10L, s"$footer\ngamma body\nnew only line", "b"),
      (11L, "new only line\ndelta body", "b"))
      .toDF("doc_id", "text", "source")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("h") -> r.getAs[Long]("df")).sortBy(_._1).toSeq
    val merged = norm(Curation.mergeSegmentDf(Curation.segmentDfIndex(old_), batch))
    val full = norm(Curation.segmentDfIndex(old_.union(batch)))
    assert(merged == full, s"merge diverged:\n$merged\n$full")
    // and the footer really crossed the split: df == 2 with one doc per side
    val byText = Curation.segmentDfIndex(old_.union(batch))
      .filter(col("df") >= 2).count()
    assert(byText == 3, "footer + both single-side repeats must reach df 2")
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

  test("materialized sequences concatenate members in doc order with the separator") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, words(6), "a"), (2L, words(6), "a"), (3L, words(6), "a"),
      (10L, words(4), "b"))
      .toDF("doc_id", "text", "source")
    val rows = Curation.materializeSequences(d, budget = 10, sep = "|").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("seq_id")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("seq_tokens"),
          r.getAs[String]("seq_text"))).toMap
    // source a: docs 1,2 start inside seq 0 (offsets 0,6), doc 3 in seq 1
    assert(rows(("a", 0L)) == ((2L, 12L, s"${words(6)}|${words(6)}")), s"got $rows")
    assert(rows(("a", 1L)) == ((1L, 6L, words(6))))
    assert(rows(("b", 0L)) == ((1L, 4L, words(4))))
  }

  test("chunking: stride windows with overlap; short docs yield one chunk") {
    import spark.implicits._
    def words(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, words(1, 10), "a"), // 10 tokens > 4 -> starts 0,3,6 (window 6+4 reaches the end)
      (2L, words(1, 11), "a"), // 11 tokens -> starts 0,3,6,9 (last chunk is the 2-token tail)
      (3L, words(1, 4), "a"),  // exactly maxTokens -> one chunk
      (4L, words(1, 2), "a"))  // short -> one chunk
      .toDF("doc_id", "text", "source")
    val rows = Curation.chunkDocuments(d, maxTokens = 4, overlap = 1).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
        (r.getAs[String]("chunk_text"), r.getAs[Long]("n_chunk_tokens"))).toMap
    assert(rows.keySet == Set(
      (1L, 0L), (1L, 1L), (1L, 2L),
      (2L, 0L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 0L), (4L, 0L)), s"got ${rows.keySet}")
    assert(rows((1L, 0L)) == ("w1 w2 w3 w4", 4L))
    assert(rows((1L, 1L)) == ("w4 w5 w6 w7", 4L)) // overlap=1 carries w4
    assert(rows((1L, 2L)) == ("w7 w8 w9 w10", 4L))
    assert(rows((2L, 3L)) == ("w10 w11", 2L)) // tail shorter than maxTokens
    assert(rows((3L, 0L)) == ("w1 w2 w3 w4", 4L))
    assert(rows((4L, 0L)) == ("w1 w2", 2L))
  }

  test("paddingWaste: conserves docs/tokens, integer waste math per bucket") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val buckets = Curation.lengthBuckets(docs).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_tokens")))
    val audit = Curation.paddingWaste(docs).collect()
    assert(audit.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(audit.map(_.getAs[Long]("total_tokens")).sum == buckets.map(_._2).sum)
    audit.foreach { r =>
      val (b, n, tot) = (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tokens"))
      val members = buckets.filter(_._1 == b)
      assert(members.length.toLong == n && members.map(_._2).sum == tot)
      assert(r.getAs[Long]("capacity") == b * n)
      assert(r.getAs[Long]("waste") == b * n - tot)
      assert(r.getAs[Long]("waste_bp") == (b * n - tot) * 10000L / (b * n))
      assert(r.getAs[Long]("waste") >= 0)
    }
  }

  test("domainFilter: blocklist drops, per-domain cap holds, draw is partitioning-independent") {
    import org.apache.spark.sql.functions.col
    val docs = (0 until 90).map { i =>
      (i.toLong, s"dom${i % 3}", s"text body $i")
    }.toDF("doc_id", "source", "text")
    val bl = Seq("dom1").toDF("domain")
    val out = Curation.domainFilter(docs, bl, cap = 10).collect()
    val byReason = out.groupBy(_.getAs[String]("reason")).view.mapValues(_.length).toMap
    // dom1's 30 docs all block; dom0/dom2 keep 10 each, 20 each over cap
    assert(byReason("blocked") == 30 && byReason("kept") == 20
      && byReason("over_cap") == 40)
    assert(out.filter(_.getAs[String]("reason") == "blocked")
      .forall(r => r.getAs[String]("source") == "dom1" && r.isNullAt(r.fieldIndex("rk"))))
    out.filter(r => r.getAs[String]("reason") != "blocked").foreach { r =>
      val rk = r.getAs[Int]("rk")
      assert(if (r.getAs[Boolean]("keep")) rk <= 10 else rk > 10)
    }
    // the md5-rank draw must not depend on physical layout
    val again = Curation.domainFilter(docs.repartition(7), bl, cap = 10)
      .collect().map(_.toSeq).toSet
    assert(again == out.map(_.toSeq).toSet)
    // composition input: domainKept carries full rows for content gates
    val kept = Curation.domainKept(docs, bl, cap = 10)
    assert(kept.count() == 20 && kept.columns.contains("text"))
  }

  test("preferencePairs: best-vs-worst per stratum, deterministic tie-break") {
    val d = Seq(
      // web/en: 1 long high-quality doc, 1 tiny low-quality, 1 middle
      (1L, ("the of and to a " * 30).trim, "en", "web", 0L),
      (2L, "x", "en", "web", 0L),
      (3L, "the of and to a x y z", "en", "web", 0L),
      // books/en: single doc -> no pair
      (4L, "lonely", "en", "books", 0L),
      // web/fr: two IDENTICAL docs -> margin 0, ties break on doc_id
      (5L, "le la et", "fr", "web", 0L),
      (6L, "le la et", "fr", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Curation.preferencePairs(d).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) -> r).toMap
    assert(got.keySet == Set(("web", "en"), ("web", "fr")))
    val en = got(("web", "en"))
    assert(en.getAs[Long]("chosen_id") == 1L)
    assert(en.getAs[Long]("rejected_id") == 2L)
    assert(en.getAs[Double]("margin") > 0.0)
    val fr = got(("web", "fr"))
    assert(fr.getAs[Long]("chosen_id") == 5L && fr.getAs[Long]("rejected_id") == 5L)
    assert(fr.getAs[Double]("margin") == 0.0)
  }

  test("weightedSample: quality-biased, without replacement, seed-replayable") {
    // bimodal corpus: 100 quality~1.0 docs vs 100 quality~0 junk docs —
    // the weight gap (~170x) makes the bias visible deterministically
    val good = ("the alpha beta gamma delta " * 25).trim
    val docs = ((0L until 100L).map(i => (i, good, "en", "web", 0L)) ++
      (100L until 200L).map(i => (i, "x", "en", "web", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val n = 50
    val sample = Curation.weightedSample(docs, n).collect()
    assert(sample.length == n)
    // without replacement: ids unique
    assert(sample.map(_.getAs[Long]("doc_id")).distinct.length == n)
    // the draw is biased: high-weight docs dominate far beyond their 50%
    // population share (every id's key is a fixed md5 draw — no flake)
    val nGood = sample.count(_.getAs[Long]("doc_id") < 100L)
    assert(nGood >= 40, s"quality docs must dominate the draw: $nGood/50")
    // same seed -> same set; new seed -> a different draw
    val again = Curation.weightedSample(docs, n).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(again == sample.map(_.getAs[Long]("doc_id")).toSet)
    val reseeded = Curation.weightedSample(docs, n, seed = "ws2").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(reseeded != again)
  }

  test("contrastivePairs: near-dups are positives, XOR-1 negatives never collide") {
    // 60-token docs; 2 and 3 are near-dups (one word differs), 0/1 unrelated
    val base = (0 until 60).map(i => s"w$i").mkString(" ")
    val variant = base.replace("w30", "w30x")
    val other = (0 until 60).map(i => s"v$i").mkString(" ")
    val third = (0 until 60).map(i => s"u$i").mkString(" ")
    val d = Seq((0L, other), (1L, third), (2L, base), (3L, variant))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = Curation.contrastivePairs(d).collect()
    val pos = got.filter(_.getAs[String]("label") == "pos")
      .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Long]("other_id"))).toSet
    val neg = got.filter(_.getAs[String]("label") == "neg")
      .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Long]("other_id"))).toSet
    assert(pos == Set((2L, 3L)))
    // XOR-1 pairing proposes (0,1) and (2,3); (2,3) is a positive -> excluded
    assert(neg == Set((0L, 1L)))
    // positive weight is the pair's jaccard, negatives carry 0
    val w = got.filter(_.getAs[String]("label") == "pos").head.getAs[Double]("weight")
    assert(w >= 0.6 && w < 1.0)
    assert(got.filter(_.getAs[String]("label") == "neg")
      .forall(_.getAs[Double]("weight") == 0.0))
  }

  test("chunkDupMass: partial chunk overlap reported, within-doc repeats ignored") {
    // 112-token docs -> chunks [0:64] and [48:112]; A and B share the
    // FIRST 64 tokens exactly (chunk 0 identical), differ afterwards; C is
    // fully unique; D is a byte-exact copy of C (all chunks shared)
    val head = (0 until 64).map(i => s"h$i").mkString(" ")
    val a = head + " " + (0 until 48).map(i => s"a$i").mkString(" ")
    val b = head + " " + (0 until 48).map(i => s"b$i").mkString(" ")
    val c = (0 until 112).map(i => s"c$i").mkString(" ")
    val d = Seq((1L, a), (2L, b), (3L, c), (4L, c))
      .toDF("doc_id", "text")
    val got = Curation.chunkDupMass(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks"),
          r.getAs[Double]("dup_fraction")))).toMap
    // A and B: 2 chunks each, exactly one (the shared head) duplicated
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    // C and D: every chunk shared with the byte copy
    assert(got(3L) == ((2L, 2L, 1.0)))
    assert(got(4L) == ((2L, 2L, 1.0)))
  }

  test("globalRowNumber == the one-partition window, across many partitions and tie groups") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // 1000 rows, only 10 distinct sort values -> heavy ties; id breaks them
    val df = spark.range(1000L).select(
      col("id"), (col("id") % 10L).cast("double").as("v"))
    val sortCols = Seq(col("v").desc, col("id").asc)
    val got = graft.operators.Relational
      .globalRowNumber(df, sortCols, as = "rank", nPartitions = 8)
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val want = df.withColumn("rank",
        row_number().over(Window.orderBy(sortCols: _*)).cast("long"))
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == want, "distributed rank must equal the single-window rank")
    // and it really ran range-partitioned: more than one partition held rows
    val pids = graft.operators.Relational
      .globalRowNumber(df, sortCols, as = "rank", nPartitions = 8)
      .select(spark_partition_id()).distinct().count()
    assert(pids > 1, "rank must not have collapsed to one partition")
  }

  test("ntileOf matches SQL NTILE semantics on uneven and degenerate splits") {
    import org.apache.spark.sql.functions._
    def buckets(total: Long, tiles: Int): Seq[Long] = {
      val ranks = spark.range(1L, total + 1).select(col("id").as("rank"))
      ranks.select(graft.operators.Relational
          .ntileOf(col("rank"), total, tiles).cast("long").as("b"))
        .orderBy(col("b")).groupBy(col("b")).count()
        .orderBy(col("b")).collect().map(_.getLong(1)).toSeq
    }
    assert(buckets(10, 4) == Seq(3, 3, 2, 2))  // first N%n buckets take ceil
    assert(buckets(12, 4) == Seq(3, 3, 3, 3))  // even split
    assert(buckets(3, 5) == Seq(1, 1, 1))      // more tiles than rows
    assert(buckets(7, 1) == Seq(7))            // single tile
  }

  test("curriculumStages: stage 1 is the highest-quality slice, stages are NTILE-sized") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val staged = Curation.curriculumStages(docs, nStages = 4)
    val n = docs.count()
    val sizes = staged.groupBy(col("stage")).count()
      .orderBy(col("stage")).collect().map(_.getLong(1)).toSeq
    assert(sizes.sum == n && sizes.size == 4)
    assert(sizes.max - sizes.min <= 1, s"NTILE buckets differ by at most 1: $sizes")
    // monotone contract: every stage-1 quality >= every stage-4 quality
    val s1min = staged.filter(col("stage") === 1)
      .agg(org.apache.spark.sql.functions.min(col("quality"))).first().getDouble(0)
    val s4max = staged.filter(col("stage") === 4)
      .agg(org.apache.spark.sql.functions.max(col("quality"))).first().getDouble(0)
    assert(s1min >= s4max, s"stage 1 min $s1min must be >= stage 4 max $s4max")
    // rank is a permutation of 1..n
    assert(staged.agg(sum(col("rank"))).first().getLong(0) == n * (n + 1) / 2)
  }
}
