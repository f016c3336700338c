package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("exact dedup groups identical texts and keeps min id") {
    val d = docs((1L, "a b c", "en"), (2L, "a b c", "en"), (3L, "x y z", "en"))
    val groups = Dedup.exactDuplicateGroups(d).collect()
    assert(groups.length == 2)
    assert(groups.map(_.getAs[Long]("n_docs")).sum == 3)
    val survivors = Dedup.dedupKeepFirst(d).as[Long].collect().toSet
    assert(survivors == Set(1L, 3L))
  }

  test("dedupKeepBest keeps the preferred source among exact duplicates") {
    val d = Seq(
      (1L, "same text body", "src9"),
      (2L, "same text body", "src1"),   // wins: lexicographically-least source
      (3L, "same text body", "src5"),
      (4L, "unique text", "src9"))
      .toDF("doc_id", "text", "source")
    val rows = Dedup.dedupKeepBest(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((2L, "src1", 3L), (4L, "src9", 1L)))
  }

  test("tokenHash matches the cross-engine pinned value") {
    // '0x'||substr(md5('tok'),1,15) in DuckDB — pins the md5/conv parity
    val v = Seq("tok").toDF("t")
      .select(TextFunctions.tokenHash(col("t"))).as[Long].head()
    assert(v == 435407939895074749L)
  }

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val nearDup = (0 until 40).map(i => if (i == 7) "CHANGED" else s"w$i").mkString(" ")
    val other = (100 until 140).map(i => s"v$i").mkString(" ")
    val d = docs((1L, base, "en"), (2L, nearDup, "en"), (3L, other, "en"))
    val pairs = Dedup.minhashLshPairs(d).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("i") == 1L && pairs(0).getAs[Long]("j") == 2L)
    assert(pairs(0).getAs[Double]("jac") > 0.8)
  }

  test("incremental exact dedup admits only batch texts novel vs the corpus") {
    val corpus = Seq(
      (1L, "already in the corpus", "web"),
      (2L, "another kept document", "web")).toDF("doc_id", "text", "source")
    val batch = Seq(
      (10L, "already in the corpus", "crawl"), // exact dup of corpus doc 1
      (11L, "a brand new document", "crawl"),
      (12L, "a brand new document", "crawl"),  // intra-batch dup -> min id
      (13L, "another fresh arrival", "crawl")).toDF("doc_id", "text", "source")
    val admitted = Dedup.incrementalExactDedup(corpus, batch)
      .as[Long].collect().toSeq
    assert(admitted == Seq(11L, 13L))
  }

  test("incremental minhash filter drops batch docs near-duplicating the corpus") {
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val nearDup = (0 until 40).map(i => if (i == 7) "CHANGED" else s"w$i").mkString(" ")
    val novel = (100 until 140).map(i => s"v$i").mkString(" ")
    val corpus = docs((1L, base, "en"))
    val batch = docs((10L, nearDup, "en"), (11L, novel, "en"))
    val admitted = Dedup.incrementalMinhashDedup(corpus, batch)
      .as[Long].collect().toSeq
    assert(admitted == Seq(11L))
    // intra-batch near-dups are out of scope by contract: both copies of a
    // novel text are admitted (minhashLshPairs owns that grain)
    val batch2 = docs((10L, novel, "en"), (11L, novel, "en"))
    assert(Dedup.incrementalMinhashDedup(corpus, batch2)
      .as[Long].collect().toSeq == Seq(10L, 11L))
  }

  test("fuzzy decontamination flags the paraphrased bench doc with its match") {
    val benchText = (0 until 40).map(i => s"w$i").mkString(" ")
    val paraphrase = (0 until 40).map(i => if (i == 7) "CHANGED" else s"w$i").mkString(" ")
    val novel = (100 until 140).map(i => s"v$i").mkString(" ")
    val bench = docs((900L, benchText, "en"), (901L, novel.toUpperCase, "en"))
    val train = docs((1L, paraphrase, "en"), (2L, novel, "en"))
    val flagged = Dedup.fuzzyDecontamination(train, bench).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("bench_id"), r.getAs[Double]("jaccard")))
    assert(flagged.map(_._1).toSeq == Seq(1L),
      s"only the paraphrase is contaminated; got ${flagged.toSeq}")
    assert(flagged.head._2 == 900L, "must report the matching bench doc")
    assert(flagged.head._3 >= 0.6 && flagged.head._3 < 1.0)
  }

  test("minhash LSH recall on the corpus' planted dups matches brute force at high jaccard") {
    val d = Tables.documents(spark, sf)
    val lsh = Dedup.minhashLshPairs(d, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force without lang blocking = ground truth
    val base = d.select(col("doc_id"),
      array_distinct(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3)).as("sh"))
    val brute = base.as("a").join(base.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("jac", TextFunctions.jaccard(col("a.sh"), col("b.sh")))
      .filter(col("jac") >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "corpus should contain planted near-dups")
    // at jaccard>=0.8 with 4 bands x 3 rows, collision prob >= 95% per pair;
    // on this corpus the candidate set is exhaustive
    assert(lsh == brute)
  }

  test("simhash: near-identical docs are Hamming-close, unrelated docs are not") {
    val base = (0 until 60).map(i => s"w$i").mkString(" ")
    val nearDup = (0 until 60).map(i => if (i == 30) "CHANGED" else s"w$i").mkString(" ")
    val other = (200 until 260).map(i => s"u$i").mkString(" ")
    val d = docs((1L, base, "en"), (2L, nearDup, "en"), (3L, other, "en"))
    val fp = Dedup.simhashFingerprints(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(fp(1L), fp(2L)) <= 8)
    assert(hamming(fp(1L), fp(3L)) >= 15)
  }

  test("banded-Hamming blocks stay under blockCap at test scale; a dropped block is counted") {
    // oracle contract: the DuckDB twins of q_simhash_pairs /
    // q_media_phash_neardup generate pairs UNCAPPED, so verification-scale
    // data must keep every (chunk_idx, chunk) block far below the 65536
    // default — assert the actual max block size for both fingerprints
    val corpus = Tables.documents(spark, sf)
    def maxBlock(fp: org.apache.spark.sql.DataFrame, chunks: Int, chunkLen: Int): Long =
      fp.select(posexplode(array((0 until chunks).map(c =>
          substring(col("fp"), c * chunkLen + 1, chunkLen)): _*)))
        .groupBy(col("pos"), col("col")).count()
        .agg(max(col("count"))).head().getLong(0)
    val simMax = maxBlock(
      Dedup.simhashFingerprints(corpus).toDF("doc_id", "fp"), 4, 15)
    val phashMax = maxBlock(
      graft.operators.Multimodal.documentPerceptualHashes(corpus)
        .toDF("doc_id", "fp"), 4, 16)
    assert(simMax < 4096 && phashMax < 4096,
      s"blocks approaching the 65536 cap: simhash=$simMax phash=$phashMax")
    // and the cap is not silent: a flooded block bumps the shared
    // droppedBlocks accumulator instead of just vanishing
    import spark.implicits._
    val acc = Dedup.BandedHammingMetrics.droppedBlocks(spark.sparkContext)
    val before = acc.value
    val flood = (1L to 50L).map(i => (i, "1" * 60)).toDF("doc_id", "fp")
    val out = Dedup.bandedHammingCandidates(flood, chunks = 4, chunkLen = 15,
      blockCap = 8).count()
    assert(out == 0L)
    assert(acc.value > before, "dropped block must increment the accumulator")
  }

  test("embedding near-dup finds planted duplicate vectors") {
    val v = (0 until 16).map(_.toFloat / 16).toArray
    val vDup = v.clone(); vDup(3) += 0.001f
    val unrelated = (0 until 16).map(i => if (i % 2 == 0) 1f else -1f).toArray
    val emb = Seq((1L, v), (2L, vDup), (3L, unrelated)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(emb, threshold = 0.99).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("i") == 1L && pairs(0).getAs[Long]("j") == 2L)
  }

  test("ngramJaccardPairs dfCap drops viral posting groups, keeps non-viral pairs") {
    // 100 docs whose ONLY pairwise-shared shingle is viral (identical 3-token
    // text, df = 100), plus one true near-dup pair built from unique shingles
    val viral = (1L to 100L).map(i => (i, "spam spam spam", "en"))
    val truePair = Seq(
      (200L, "alpha beta gamma delta epsilon", "en"),
      (201L, "alpha beta gamma delta zeta", "en"))
    val d = docs(viral ++ truePair: _*)
    val capped = Dedup.ngramJaccardPairs(d, threshold = 0.5, dfCap = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // the df=100 group is short-circuited: none of its 4950 pairs appear
    assert(capped.toSeq == Seq((200L, 201L)),
      s"expected only the non-viral pair, got ${capped.length} pairs")
    // uncapped twin proves the viral pairs exist without the cap
    val uncapped = Dedup.ngramJaccardPairs(d, threshold = 0.5, dfCap = 1000)
      .count()
    assert(uncapped == 4950 + 1)
    // default cap is far above this corpus' max df: real output is exact.
    // Int.MaxValue means "uncapped" (the +1 saturates instead of wrapping
    // take() to a negative limit that would silently return zero pairs)
    val corpus = Tables.documents(spark, sf)
    val defaultOut = Dedup.ngramJaccardPairs(corpus).collect().toSet
    val exactOut = Dedup.ngramJaccardPairs(corpus, dfCap = Int.MaxValue).collect().toSet
    assert(defaultOut == exactOut && defaultOut.nonEmpty)
  }

  test("edit-distance pairs: typo dups found, boundary-straddling lengths collide") {
    // doc 2 = doc 1 with 3 single-char typos (shingle Jaccard would crater,
    // edit distance = 3); doc 3 shares the first token but is unrelated.
    // docs 4/5 are a dup pair whose lengths straddle a 32-char bucket
    // boundary (len 31 vs 33) — the {b, b+1} explode must still pair them.
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en"),
      (2L, "alpha bXta gamma dXlta epsilon zXta eta theta", "en"),
      (3L, "alpha completely different text goes here now okay", "en"),
      (4L, "prefix aaaaaaaaaaaaaaaaaaaaaaaa", "en"),   // 31 chars, b=0
      (5L, "prefix aaaaaaaaaaaaaaaaaaaaaaaaaa", "en")) // 33 chars, b=1
    val pairs = Dedup.editDistancePairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 3), (4L, 5L, 2)), s"got $pairs")
  }

  test("edit-distance pairs: blockCap short-circuits a viral (lang,tok0,bucket) block") {
    // 300 docs share first token + length bucket (think "the …" boilerplate):
    // an uncapped blocker generates 300·299/2 candidate pairs from that ONE
    // block; the take(cap+1) short-circuit must emit zero of them while the
    // small true-dup block (different first token) still pairs
    val viral = (1L to 300L).map(i => (i, "the quick brown fox jumps", "en"))
    val truePair = Seq(
      (900L, "alpha beta gamma delta epsilon", "en"),
      (901L, "alpha bXta gamma delta epsilon", "en"))
    val d = docs(viral ++ truePair: _*)
    val capped = Dedup.editDistancePairs(d, blockCap = 256).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((900L, 901L)),
      s"viral block must emit no pairs; got ${capped.size} pairs")
    // uncapped twin proves the viral pairs exist without the cap, and that
    // Int.MaxValue saturates (+1 must not wrap take() to a negative limit)
    val uncapped = Dedup.editDistancePairs(d, blockCap = Int.MaxValue).count()
    assert(uncapped == 300L * 299L / 2 + 1)
  }

  test("embedding near-dup clusters collapse transitive vector chains") {
    // a~b and b~c are near-dups, a vs c drifts further; the unrelated vector
    // must stay a singleton. Transitivity puts a,b,c in one cluster.
    val a = (0 until 64).map(_.toFloat / 64).toArray
    def drift(v: Array[Float], k: Int) = {
      val w = v.clone(); (0 until k).foreach(i => w(i) += 0.05f); w
    }
    val unrelated = (0 until 64).map(i => if (i % 2 == 0) 1f else -1f).toArray
    val emb = Seq((1L, a), (2L, drift(a, 4)), (3L, drift(a, 8)), (9L, unrelated))
      .toDF("vec_id", "embedding")
    val clusters = Dedup.embeddingNearDupClusters(emb, threshold = 0.995).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(9L) == 9L)
  }

  test("near-dup clusters: transitive chains collapse to the min reachable id") {
    // 1~2 and 2~3 are near-dups (one token changed each step); 4 is unrelated.
    // Even if 1~3 falls below threshold, transitivity must put all three in
    // cluster 1; the singleton clusters to itself.
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val step1 = (0 until 40).map(i => if (i == 5) "X" else s"w$i").mkString(" ")
    val step2 = (0 until 40).map(i => if (i == 5) "X" else if (i == 30) "Y" else s"w$i").mkString(" ")
    val other = (100 until 140).map(i => s"v$i").mkString(" ")
    val d = docs((1L, base, "en"), (2L, step1, "en"), (3L, step2, "en"), (4L, other, "en"))
    val clusters = Dedup.nearDupClusters(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("dedupAudit histogram: conserves the corpus, drop math per size class") {
    // planted: one 3-cluster, one singleton -> sizes {3: 1 cluster, 1: 1}
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val step1 = (0 until 40).map(i => if (i == 5) "X" else s"w$i").mkString(" ")
    val step2 = (0 until 40).map(i => if (i == 5) "X" else if (i == 30) "Y" else s"w$i").mkString(" ")
    val other = (100 until 140).map(i => s"v$i").mkString(" ")
    val d = docs((1L, base, "en"), (2L, step1, "en"), (3L, step2, "en"), (4L, other, "en"))
    val audit = Dedup.dedupAudit(d).collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_dropped")))
      .toMap
    assert(audit == Map(1L -> ((1L, 1L, 0L)), 3L -> ((1L, 3L, 2L))))
    // corpus fixture: histogram must be a pure aggregate of the labels
    val corpus = Tables.documents(spark, sf)
    val labels = Dedup.nearDupClusters(corpus).collect().map(_.getAs[Long]("cluster_id"))
    val want = labels.groupBy(identity).map(_._2.length.toLong)
      .groupBy(identity).map { case (sz, cs) => sz -> cs.size.toLong }
    val got = Dedup.dedupAudit(corpus).collect()
      .map(r => r.getAs[Long]("cluster_size") -> r.getAs[Long]("n_clusters")).toMap
    assert(got == want)
    val full = Dedup.dedupAudit(corpus).collect()
    assert(full.map(_.getAs[Long]("n_docs")).sum == corpus.count())
    full.foreach { r =>
      assert(r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters"))
    }
  }

  test("nearDupClusters fails loudly instead of returning an unconverged fixpoint") {
    // a 3-node path needs 2 star rounds (round 1 re-points 3 at 1, round 2
    // confirms the star); maxIter = 1 must throw rather than emit labels the
    // recursive-CTE oracle would reject
    assertThrows[IllegalArgumentException] {
      val pairs = Seq((1L, 2L), (2L, 3L)).toDF("i", "j")
      Dedup.connectedComponentsStars(pairs, maxIter = 1)
    }
  }

  test("star CC: planted 100-node chain converges in O(log d) rounds, not O(d)") {
    // worst case for min-label propagation: a path graph of diameter 99
    // would need ~99 rounds there; large-star/small-star halves component
    // height per round, so it must land well under log-scale + slack
    val pairs = (1L until 100L).map(i => (i, i + 1)).toDF("i", "j")
    val (labels, rounds) = Dedup.connectedComponentsStars(pairs)
    val lbl = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.keySet == (1L to 100L).toSet)
    assert((1L to 100L).forall(n => lbl(n) == 1L),
      s"all chain nodes must label to the component min; got ${lbl.filter(_._2 != 1L)}")
    assert(rounds <= 12, s"expected O(log 99) ~ 7 rounds (+slack), got $rounds")
  }

  test("transitiveContamination: a clean paraphrase of a contaminated doc flags via_cluster") {
    // doc 1 = shared frame + the leaked bench span (direct hit); doc 2 =
    // the same frame + a distinct tail — near-dup of doc 1 through the
    // frame's shingles, yet carrying NONE of the bench 4-grams, so only
    // the cluster closure can catch it
    val frame = (0 until 36).map(i => s"f$i").mkString(" ")
    val benchSpan = (0 until 8).map(i => s"secret$i").mkString(" ")
    val d = Seq(
      (1L, s"$frame $benchSpan", "en"),               // direct leak
      (2L, s"$frame unique0 unique1 unique2", "en"),  // paraphrase, no leak
      (3L, (100 until 140).map(i => s"v$i").mkString(" "), "en"), // unrelated
      (97L * 5, benchSpan, "en"))                      // the benchmark doc (%97==0)
      .toDF("doc_id", "text", "lang")
    val train = d.filter(col("doc_id") % 97 =!= 0)
    val bench = d.filter(col("doc_id") % 97 === 0)
    val rows = Dedup.transitiveContamination(train, bench).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("vector"), r.getAs[Long]("n_direct"))).toMap
    assert(rows.keySet == Set(1L, 2L), s"got $rows")
    assert(rows(1L) == (("direct", 1L)))
    assert(rows(2L) == (("via_cluster", 1L)),
      "the clean near-dup of a contaminated doc must flag transitively")
    // sanity: doc 2 really is invisible to the direct check
    val direct = graft.operators.TextAnalysis.contaminationReport(train, bench)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(direct == Set(1L))
  }

  test("dedupProvenance: the canonical inherits its cluster's source/lang union") {
    // planted cross-source cluster: three near-dups from two domains; one
    // singleton from a third
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val step1 = (0 until 40).map(i => if (i == 5) "X" else s"w$i").mkString(" ")
    val step2 = (0 until 40).map(i => if (i == 5) "X" else if (i == 30) "Y" else s"w$i").mkString(" ")
    val other = (100 until 140).map(i => s"v$i").mkString(" ")
    val d = Seq(
      (1L, base, "en", "mirror.example"),
      (2L, step1, "en", "origin.example"),
      (3L, step2, "en", "origin.example"),
      (4L, other, "en", "lonely.example"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = Dedup.dedupProvenance(d).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r).toMap
    assert(rows.keySet == Set(1L, 4L))
    val c = rows(1L)
    assert(c.getAs[Long]("canonical_id") == 1L)
    assert(c.getAs[Long]("n_members") == 3L)
    assert(c.getAs[Long]("n_sources") == 2L)
    // sorted-distinct unions, comma-joined: deterministic on any engine
    assert(c.getAs[String]("sources") == "mirror.example,origin.example")
    assert(c.getAs[String]("langs") == "en")
    val s = rows(4L)
    assert(s.getAs[Long]("n_members") == 1L
      && s.getAs[String]("sources") == "lonely.example")
  }

  test("substring dup pairs: verbatim 20-token run pairs docs; shorter runs don't") {
    import spark.implicits._
    val run = (1 to 20).map(i => s"tok$i").mkString(" ")     // exactly 20 tokens
    val short = (1 to 19).map(i => s"shr$i").mkString(" ")   // 19-token run
    val d = Seq(
      (1L, s"alpha beta $run gamma delta"),
      (2L, s"completely different prefix $run and a different suffix too"),
      (3L, s"one two $short three four"),
      (4L, s"five six $short seven eight"),
      (5L, "no overlap with anything else at all here"))
      .toDF("doc_id", "text")
    val rows = Dedup.substringDupPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 1,2 share exactly the one 20-token window; the 19-token run in
    // 3,4 never forms a full window
    assert(rows.toSeq == Seq((1L, 2L, 1L)), s"got ${rows.toSeq}")
    // a 21-token shared run yields 2 shared windows (L - window + 1)
    val run21 = (1 to 21).map(i => s"r$i").mkString(" ")
    val d2 = Seq((1L, s"x $run21 y"), (2L, s"p q $run21 z")).toDF("doc_id", "text")
    assert(Dedup.substringDupPairs(d2).collect().head.getLong(2) == 2L)
  }

  test("substring dup pairs: dfCap drops viral boilerplate windows") {
    import spark.implicits._
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val d = (1L to 4L).map(id => (id, s"doc$id unique preamble $boiler"))
      .toDF("doc_id", "text")
    // the window is shared by 4 docs > dfCap=3 -> short-circuited, no pairs
    assert(Dedup.substringDupPairs(d, dfCap = 3).isEmpty)
    // at dfCap=6 all C(4,2)=6 pairs emerge
    assert(Dedup.substringDupPairs(d, dfCap = 6).count() == 6L)
  }

  test("LSH plan: no shuffle before the band join; candidate join is on band keys") {
    val plan = Dedup.minhashLshPairs(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    // signature computation must stay narrow (no Exchange between scan and generate)
    assert(plan.contains("Generate"), "band explode should be a Generate node")
  }

  test("normalizedDuplicateGroups unifies casing/punct variants byte dedup misses") {
    val d = Seq(
      (1L, "Hello, World!"),
      (2L, "hello world"),          // normalized twin of 1
      (3L, "HELLO  WORLD"),         // and of this (case + double space)
      (4L, "goodbye world"),        // singleton -> filtered out
      (5L, "same text"), (6L, "same text")) // byte-exact pair: 1 variant
      .toDF("doc_id", "text")
    val got = Dedup.normalizedDuplicateGroups(d).collect()
      .map(r => r.getAs[Long]("keeper_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_byte_variants")))).toMap
    assert(got == Map(1L -> ((3L, 3L)), 5L -> ((2L, 1L))))
    // byte-exact dedup sees NONE of the hello group
    val exact = Dedup.exactDuplicateGroups(d).collect()
      .filter(_.getAs[Long]("n_docs") > 1)
    assert(exact.length == 1 && exact.head.getAs[Long]("keeper_id") == 5L)
    // Unicode letters SURVIVE normalization: accented/non-Latin docs keep
    // distinct identities (an ASCII-only class would collapse both pairs)
    val intl = Seq(
      (1L, "caf\u00e9 au lait"), (2L, "CAF\u00c9 au lait!"),  // true variants
      (3L, "caf au lait"),                                // NOT their dup
      (4L, "\u65e5\u672c\u8a9e \u6587\u66f8"), (5L, "\u4e2d\u6587 \u6587\u4ef6"))    // distinct scripts
      .toDF("doc_id", "text")
    val g2 = Dedup.normalizedDuplicateGroups(intl).collect()
      .map(r => r.getAs[Long]("keeper_id") -> r.getAs[Long]("n_docs")).toMap
    assert(g2 == Map(1L -> 2L), s"got $g2")
  }

  test("retireSemanticIndex: no doomed id in cells or evidence; survivors keep serving the gate") {
    val emb = Tables.embeddings(spark, sf)
    val doomed = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val idx = Dedup.buildSemanticIndex(emb, k = 4, iters = 1)
    val retired = Dedup.retireSemanticIndex(idx, doomed)
    // attestation: no doomed member in any packed cell...
    assert(retired.cells
      .select(explode(col("members.id")).as("vec_id"))
      .join(doomed, Seq("vec_id"), "left_semi").isEmpty)
    // ...and EVERY survivor is still packed (frozen centroids: the retire
    // is exactly the survivor filter of the original pack)
    val survivorIds = emb.join(doomed, Seq("vec_id"), "left_anti")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(retired.cells.select(explode(col("members.id")).as("id"))
      .collect().map(_.getLong(0)).toSet == survivorIds)
    // probes re-submitting every original vector: evidence never names a
    // doomed id, and an exact survivor copy still flags as a duplicate
    val probes = emb.select(
      (col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val after = Dedup.semanticNoveltyProbe(probes, retired).collect()
    val doomedSet = doomed.collect().map(_.getLong(0)).toSet
    assert(!after.exists(r => !r.isNullAt(3) && doomedSet(r.getLong(3))),
      "a retired vector must never surface as match evidence")
    val surv = after.filter(r => survivorIds(r.getLong(0) - 1000000L))
    assert(surv.nonEmpty && surv.forall(r =>
      r.getString(4) == "duplicate_semantic" && r.getDouble(2) == 1.0),
      "an exact copy of a surviving vector must still flag at cos 1.0")
  }
}
