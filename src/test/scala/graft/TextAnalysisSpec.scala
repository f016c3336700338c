package graft

import org.apache.spark.sql.functions.col
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

  test("gopherRules: each rule trips on its planted violator and only there") {
    // 60 words, mean word length 4.7, stopword-rich
    val good = ("the quick brown foxes jumped over the lazy sleeping dogs " * 6).trim
    val tooShort = "the cat is here and it sat" // < 50 words
    val longWords = Seq.fill(60)("pneumonoultramicroscopic").mkString(" ") ++ " the is" // mean len > 10
    val hashy = good + " " + Seq.fill(20)("#tag").mkString(" ") // symbol ratio > 0.1
    val numeric = ("the is " + Seq.fill(60)("12345").mkString(" ")) // alpha < 80%
    val noStops = Seq.fill(60)("lorem ipsum dolor").mkString(" ") // < 2 stopword hits
    val bullets = (1 to 10).map(i => s"- item $i the is and of a it in").mkString("\n") // all lines bulleted
    val dots = good + "\n" + (1 to 9).map(i => s"line $i trails off...").mkString("\n")
    val d = Seq(
      (1L, good), (2L, tooShort), (3L, longWords), (4L, hashy),
      (5L, numeric), (6L, noStops), (7L, bullets), (8L, dots))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.gopherRules(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("keep"), "the clean doc must pass every rule")
    def failsOnly(id: Long, rule: String) = {
      assert(!rows(id).getAs[Boolean](rule), s"doc $id should trip $rule")
      assert(!rows(id).getAs[Boolean]("keep"))
    }
    failsOnly(2L, "r_word_count")
    failsOnly(3L, "r_mean_word_len")
    failsOnly(4L, "r_symbol_ratio")
    failsOnly(5L, "r_alpha_words")
    failsOnly(6L, "r_stopwords")
    failsOnly(7L, "r_bullet_lines")
    failsOnly(8L, "r_ellipsis_lines")
    // the clean doc's integer counters are the hand-computed ones
    assert(rows(1L).getAs[Long]("n_words") == 60L)
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

  test("contamination report flags docs sharing 4-grams with the benchmark corpus") {
    // doc 0 is the held-out benchmark; doc 1 contains one of its 4-grams
    // verbatim, doc 2 shares nothing
    val bench = Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "noise alpha beta gamma delta other words here"),
      (2L, "completely different content with no overlap at all"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.contaminationReport(train, bench).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
    val r = rows.head
    // doc 1 (8 tokens) has 5 distinct 4-grams, of which exactly one —
    // "alpha beta gamma delta" — also occurs in the benchmark doc
    assert(r.getAs[Long]("n_shingles") == 5L)
    assert(r.getAs[Long]("n_shared") == 1L)
    assert(r.getAs[Double]("contamination") == 0.2)
  }

  test("repetition scores: stuffed doc drops, varied doc keeps") {
    val d = Seq(
      (1L, "buy now buy now buy now buy now buy now"),
      (2L, "a quiet morning walk through the old town square"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.repetitionScores(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[String]("verdict") == "drop")
    assert(m(1L).getAs[Double]("dup_trigram_frac") > 0.5)
    assert(m(2L).getAs[String]("verdict") == "keep")
    assert(m(2L).getAs[Double]("dup_bigram_frac") == 0.0)
    // degenerate short doc still appears, zero-filled
    val tiny = TextAnalysis.repetitionScores(Seq((9L, "one")).toDF("doc_id", "text"))
      .collect().head
    assert(tiny.getAs[Double]("dup_bigram_frac") == 0.0 &&
      tiny.getAs[String]("verdict") == "keep")
  }

  test("domain mixture weights rebalance toward uniform token share") {
    val d = Seq(
      (1L, "one two three four five six seven eight", "big"),   // 8 tokens
      (2L, "one two three four five six seven eight", "big"),   // 8 tokens
      (3L, "one two three four", "small"))                      // 4 tokens
      .toDF("doc_id", "text", "source")
    val m = TextAnalysis.domainMixture(d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(m("big").getAs[Long]("n_docs") == 2L)
    assert(m("big").getAs[Long]("n_tokens") == 16L)
    assert(m("big").getAs[Double]("token_share") == 0.8)
    // weight = (1/2) / 0.8 = 0.625 ; small: (1/2) / 0.2 = 2.5
    assert(m("big").getAs[Double]("weight") == 0.625)
    assert(m("small").getAs[Double]("weight") == 2.5)
  }

  test("temperature mixture: alpha=1 keeps natural shares, alpha=0.5 interpolates") {
    val d = Seq(
      (1L, "one two three four five six seven eight", "big"),   // 8 tokens
      (2L, "one two three four five six seven eight", "big"),   // 8 tokens
      (3L, "one two three four", "small"))                      // 4 tokens
      .toDF("doc_id", "text", "source")
    def weights(alpha: Double) =
      TextAnalysis.domainMixtureTemp(d, alpha).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Double]("weight")).toMap
    val natural = weights(1.0)
    assert(math.abs(natural("big") - 1.0) < 1e-5 &&
      math.abs(natural("small") - 1.0) < 1e-5,
      s"alpha=1 must keep the natural mixture, got $natural")
    val mid = weights(0.5)
    // sqrt targets: .8 -> ~0.667, .2 -> ~0.333 => weights ~0.833 / ~1.667 —
    // strictly between natural (1, 1) and uniform (0.625, 2.5)
    assert(mid("big") < 1.0 && mid("big") > 0.625, s"got $mid")
    assert(mid("small") > 1.0 && mid("small") < 2.5)
    val uniform = weights(0.0)
    val m0 = TextAnalysis.domainMixture(d).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("weight")).toMap
    assert(math.abs(uniform("big") - m0("big")) < 1e-5 &&
      math.abs(uniform("small") - m0("small")) < 1e-5,
      "alpha=0 must reproduce the uniform-target weights")
  }

  test("tfidf cosine pairs surface docs sharing rare terms, not disjoint ones") {
    val d = Seq(
      (1L, "quantum flux capacitor resonance"),
      (2L, "quantum flux capacitor overload"),
      (3L, "banana smoothie recipe blender"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfCosinePairs(d, threshold = 0.2).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    val cos = rows.head.getAs[Double]("cos")
    // shared terms have df=2 (idf=ln 1.5), unique terms df=1 (idf=ln 3):
    // dot = 3·ln(1.5)², norms equal -> cos = dot/norm² ≈ 0.29
    assert(cos > 0.25 && cos < 0.35, s"got $cos")
  }

  test("tfidf cosine pairs: shuffle-join vocab path (broadcastVocab=false) is bit-identical") {
    // the escape hatch for a vocabulary too large to broadcast must change
    // the plan, never the result: decimal-weight sums are order-free, so the
    // two join strategies agree exactly
    val corpus = Tables.documents(spark, sf)
    val bcast = TextAnalysis.tfidfCosinePairs(corpus).collect().toSet
    val shuffled = TextAnalysis.tfidfCosinePairs(corpus, broadcastVocab = false).collect().toSet
    assert(bcast == shuffled && bcast.nonEmpty)
  }

  test("tfidf cosine pairs: dfCap prunes viral tokens from the vector space") {
    val d = Seq(
      (1L, "shared boilerplate footer alpha"),
      (2L, "shared boilerplate footer beta"),
      (3L, "shared boilerplate footer gamma"))
      .toDF("doc_id", "text")
    // every shared token has df=3 > 2 -> no candidate pairs survive pruning
    assert(TextAnalysis.tfidfCosinePairs(d, threshold = 0.0, dfCap = 2).isEmpty)
  }

  test("NB classifier: seed-class vocabulary separates, unseen tokens are neutral") {
    import org.apache.spark.sql.functions.col
    // seed: positives talk about weather, negatives about spam; one token
    // ("today") is shared so its log-odds sit near zero
    val seed = Seq(
      (1L, "sunny weather forecast today", "good"),
      (2L, "mild weather outlook today", "good"),
      (3L, "buy cheap pills today", "bad"),
      (4L, "cheap spam offer today", "bad"))
      .toDF("doc_id", "text", "label")
    val w = TextAnalysis.nbClassifierWeights(seed, col("label") === "good")
    val wm = w.collect().map(r => r.getAs[String]("token") ->
      r.getAs[java.math.BigDecimal]("weight").doubleValue()).toMap
    assert(wm("weather") > 0 && wm("cheap") < 0, s"got $wm")
    assert(math.abs(wm("today")) < 0.1, "shared token must be near-neutral")
    val scored = TextAnalysis.classifierScore(
      Seq((10L, "sunny weather today"), (11L, "cheap pills offer"),
        (12L, "zxqvk unseen tokens")).toDF("doc_id", "text"), w)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("logit"), r.getAs[String]("verdict"))).toMap
    assert(scored(10L)._2 == "keep" && scored(10L)._1 > 0, s"got $scored")
    assert(scored(11L)._2 == "drop" && scored(11L)._1 < 0)
    // all-unseen doc scores exactly the class-prior bias (balanced seed -> 0)
    assert(scored(12L)._1 == 0.0 && scored(12L)._2 == "drop")
  }

  test("bigram LM scores word order that the unigram cannot see") {
    val inOrder = (1L to 8L).map(i => (i, "the quick brown fox jumps high"))
    val reversed = Seq((9L, "high jumps fox brown quick the"))
    val d = (inOrder ++ reversed).toDF("doc_id", "text")
    // identical token multiset -> the unigram model scores them EQUAL
    val uni = TextAnalysis.lmPerplexityScore(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_nll")).toMap
    assert(uni(9L) == uni(1L), s"unigram must be order-blind, got $uni")
    // the reversed doc's bigrams are novel -> the bigram model separates
    val bi = TextAnalysis.lmBigramScore(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_nll")).toMap
    assert(bi(9L) > bi(1L), s"bigram must score word order, got $bi")
  }

  test("perplexity buckets: fluent docs land in head, gibberish in tail") {
    val common = (1L to 8L).map(i => (i, "the weather is fine today"))
    val rare = Seq((9L, "zxqvk jwpfh qmzot"))
    val d = (common ++ rare).toDF("doc_id", "text")
    val m = TextAnalysis.perplexityBuckets(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert((1L to 8L).forall(m(_) == "head"),
      s"identical low-NLL docs tie at the first cut -> head; got $m")
    assert(m(9L) == "tail")
  }

  test("LM perplexity score: rare-token docs carry higher avg NLL") {
    val common = (1L to 8L).map(i => (i, "the weather is fine today"))
    val rare = Seq((9L, "zxqvk jwpfh qmzot"))
    val d = (common ++ rare).toDF("doc_id", "text")
    val byId = TextAnalysis.lmPerplexityScore(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byId(9L).getAs[Double]("avg_nll") > byId(1L).getAs[Double]("avg_nll"))
    assert(byId(9L).getAs[Long]("n_tokens") == 3L)
    // all 8 common docs score identically (same text, same model)
    assert((2L to 8L).forall(i =>
      byId(i).getAs[Double]("avg_nll") == byId(1L).getAs[Double]("avg_nll")))
  }

  test("Misra-Gries sketch: exact when capacity >= vocab, MG bounds when under") {
    // skewed corpus: 'hot' dominates, a band of warm tokens, a long tail
    val docs = (1L to 60L).map { i =>
      val words =
        Seq.fill(6)("hot") ++
          Seq.fill(3)(s"warm${i % 5}") ++
          Seq(s"tail${i}a", s"tail${i}b")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val exact = TextAnalysis.tokenFrequencies(docs, k = 1000).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum // total token count

    // capacity >= vocabulary: MG holds every counter, never decrements —
    // estimates are EXACT regardless of arrival order or partitioning
    val full = TextAnalysis.tokenFrequenciesSketch(docs.repartition(7), 2048, k = 10)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(full.nonEmpty && full.forall { case (t, c) => exact(t) == c })
    assert(full.head._1 == "hot" && full.head._2 == exact("hot"))

    // capacity << vocabulary (126 tail tokens vs 16 counters): both sides
    // of the MG guarantee — est <= true and true - est <= n/(capacity+1)
    val cap = 16
    val sk = TextAnalysis.tokenFrequenciesSketch(docs.repartition(7), cap, k = cap)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val err = n.toDouble / (cap + 1)
    sk.foreach { case (t, est) =>
      val truth = exact(t)
      assert(est <= truth, s"$t overestimated: $est > $truth")
      assert(truth - est <= err, s"$t undershoots the MG bound: $truth - $est > $err")
    }
    // every heavy hitter (true count > n/(capacity+1)) must be present
    val present = sk.map(_._1).toSet
    exact.collect { case (t, c) if c > err => t }
      .foreach(t => assert(present.contains(t), s"heavy hitter $t missing"))

    // the AUDIT reduction of the same corpus — the order-free row the
    // driver oracle pins: exact total, exactly k emitted, bounds verdict
    // TRUE even at capacity << vocabulary (the guarantee, not the
    // order-dependent estimates, is what the row asserts)
    val a = TextAnalysis
      .tokenFreqSketchAudit(docs.repartition(7), capacity = cap, k = 10)
      .collect().head
    assert(a.getAs[Long]("n_tokens") == n)
    assert(a.getAs[Long]("n_emitted") == 10L)
    assert(a.getAs[Boolean]("bounds_ok"),
      "every emitted MG counter must honor est <= true <= est + n/(cap+1)")
  }

  test("mixturePlan: integer-exact targets, epoch factors, inner-join scoping") {
    val d = Seq(
      (1L, "a b c d e f g h", "big"),    // 8 tokens
      (2L, "a b c d e f g h", "big"),    // 8 tokens -> supply 16
      (3L, "a b c d", "small"),          // supply 4
      (4L, "x y", "unweighted"))         // no part -> excluded
      .toDF("doc_id", "text", "source")
    val w = Seq(("big", 1L), ("small", 3L), ("ghost", 4L)).toDF("source", "part")
    val plan = TextAnalysis.mixturePlan(d, w, budget = 100L).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // inner join both ways: no 'unweighted' (absent part), no 'ghost'
    // (absent supply); total_parts = 1 + 3 = 4
    assert(plan.keySet == Set("big", "small"))
    // big: 100*1 div 4 = 25 targets over supply 16 -> 15625 bp, 'up'
    assert(plan("big").getAs[Long]("target_tokens") == 25L)
    assert(plan("big").getAs[Long]("epochs_bp") == 15625L)
    assert(plan("big").getAs[String]("direction") == "up")
    // small: 100*3 div 4 = 75 over supply 4 -> 187500 bp, 'up'; flip the
    // budget down and it drops below one epoch
    assert(plan("small").getAs[Long]("target_tokens") == 75L)
    val tiny = TextAnalysis.mixturePlan(d, w, budget = 8L).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // big: 8*1 div 4 = 2 over 16 -> 1250 bp, 'down'
    assert(tiny("big").getAs[Long]("epochs_bp") == 1250L)
    assert(tiny("big").getAs[String]("direction") == "down")
  }

  test("bm25: rare terms dominate, length normalization penalizes long docs") {
    val d = Seq(
      (1L, "rare common common", "en", "web", 0L),
      (2L, "common common common common common common common common", "en", "web", 0L),
      (3L, "common rare", "en", "web", 0L),
      (4L, "common", "en", "web", 0L),
      (5L, "filler filler filler", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.bm25TopK(d, Seq("rare", "common"), k = 5).collect()
    val order = got.map(_.getAs[Long]("doc_id")).toSeq
    val score = got.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    // docs holding the rare term outrank any amount of the common one
    assert(order.take(2).toSet == Set(1L, 3L))
    // ...and between them, the shorter doc wins (same tf, smaller dl)
    assert(score(3L) > score(1L))
    // doc 5 matches nothing -> absent even with k=5
    assert(!order.contains(5L))
    // n_terms counts matched query terms per doc
    val nt = got.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_terms")).toMap
    assert(nt(1L) == 2L && nt(4L) == 1L)
    // scores are monotone in the returned order (rounded-rank contract)
    assert(order.map(score) == order.map(score).sorted(Ordering[Double].reverse))
  }

  test("bm25Stats incremental fold: merge == full refit, serve is bit-identical") {
    val docs = Tables.documents(spark, sf)
    val old = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    // the incremental-index invariant on the lexical tier
    val merged = TextAnalysis.mergeBm25Stats(TextAnalysis.bm25Stats(old), batch)
      .collect().map(_.toSeq).toSet
    val refit = TextAnalysis.bm25Stats(docs).collect().map(_.toSeq).toSet
    assert(merged == refit, "merge(stats(old), batch) must equal stats(old ∪ batch)")
    // serving from the merged artifact == the inline twin, row for row
    val stats = TextAnalysis.mergeBm25Stats(TextAnalysis.bm25Stats(old), batch)
    val served = TextAnalysis.bm25TopKFrom(docs, stats, Seq("dup", "window", "merge"))
      .collect().map(_.toSeq).toSeq
    val inline = TextAnalysis.bm25TopK(docs, Seq("dup", "window", "merge"))
      .collect().map(_.toSeq).toSeq
    assert(served == inline)
    // a token only the batch carries still lands in the merged df table
    val a = Seq((1L, "common words here", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val b = Seq((2L, "common unseen", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = TextAnalysis.mergeBm25Stats(TextAnalysis.bm25Stats(a), b).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("df")).toMap
    assert(m("unseen") == 1L && m("common") == 2L && m(" ") == 2L)
  }

  test("retireBm25Stats: exact retraction — retire(stats(c), removed) == stats(c \\ removed)") {
    val docs = Tables.documents(spark, sf)
    val removed = docs.filter(col("doc_id") % 41 === 0)
    val retired = TextAnalysis
      .retireBm25Stats(TextAnalysis.bm25Stats(docs), removed)
      .collect().map(_.toSeq).toSet
    val refit = TextAnalysis.bm25Stats(docs.filter(col("doc_id") % 41 =!= 0))
      .collect().map(_.toSeq).toSet
    assert(retired == refit,
      "retiring must equal re-aggregating the surviving corpus exactly")
    // a token whose LAST document left must vanish from the stats
    import spark.implicits._
    val c = Seq((1L, "common words here", "en", "web", 0L),
      (2L, "common rare", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r2 = TextAnalysis.retireBm25Stats(
      TextAnalysis.bm25Stats(c), c.filter(col("doc_id") === 2L)).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("df")).toMap
    assert(!r2.contains("rare") && r2("common") == 1L && r2(" ") == 1L)
  }
}
