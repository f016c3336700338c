package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for LLM training-data pipelines, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Scale design (100 TB):
  *  - exact dedup = hash-groupBy — one shuffle on a 128-bit digest, uniform
  *    by construction (no skew);
  *  - MinHash+LSH = shingle→signature (narrow, codegen'd) → band-explode →
  *    self-join on (band, hash) — the join keys are hash-uniform and the
  *    candidate set is tiny relative to n², which is the whole point vs the
  *    brute-force O(n²) twin kept here as the oracle baseline;
  *  - the brute-force variant blocks on `lang` to bound the quadratic term —
  *    at scale the block key would be (lang, length-bucket).
  */
object Dedup {

  /** Exact-duplicate groups: md5(text) → (n_docs, keeper = min doc_id).
    * Keeping min-id is the usual deterministic survivor rule.
    */
  def exactDuplicateGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))
      .orderBy(col("text_hash"))

  /** Canonical text normalization for dedup identity: lowercase, replace
    * every non-letter/digit/space char with a space (UNICODE classes —
    * an ASCII-only [a-z0-9] would erase every accented or non-Latin
    * letter and collapse unrelated foreign-language docs into one
    * "duplicate" group), collapse runs, trim. The C4/CCNet
    * canonicalization step — byte-exact dedup misses the same article
    * re-crawled with different casing or trailing punctuation, and
    * near-dup (MinHash) catches it only at shingle granularity with band
    * luck. Pure codegen'd column math; Java regex and RE2 agree on
    * \p{L}/\p{N}, so the identity is oracle-exact.
    */
  def normalizeText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N} ]", " "), " +", " "))

  /** Exact-duplicate groups under NORMALIZED identity — the
    * [[exactDuplicateGroups]] rule on md5(normalize(text)), reporting per
    * group how many BYTE-distinct variants it unified (`n_byte_variants`
    * > 1 is the mass normalization recovered that byte-exact dedup left
    * behind — the number that justifies the extra projection). Same one
    * shuffle on the digest; text never crosses the exchange.
    */
  def normalizedDuplicateGroups(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), md5(col("text")).as("raw_hash"),
      md5(normalizeText(col("text"))).as("norm_hash"))
      .groupBy(col("norm_hash"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("raw_hash")).as("n_byte_variants"),
        min(col("doc_id")).as("keeper_id"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("norm_hash"))

  /** Exact dedup survivors — one doc_id per distinct text. */
  def dedupKeepFirst(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  /** Source-priority canonical selection: among exact-duplicate texts, keep
    * the doc from the lexicographically-smallest `source` (tie → min
    * doc_id) — the "prefer the curated mirror over the crawl" survivor
    * policy real corpus merges use, vs [[dedupKeepFirst]]'s min-id rule.
    * One shuffle on the text digest; both window functions share the
    * partition key, so they plan into a single sort.
    */
  def dedupKeepBest(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialize the digest as ONE column: partitioning two windows by
    // separate md5(text) expressions plans two Exchanges (each window gets
    // its own internal _w key); sharing the column collapses them to one
    val part = Window.partitionBy(col("text_hash"))
    // null ordering pinned EXPLICITLY: Spark's bare asc is NULLS FIRST but
    // SQL engines (the DuckDB oracle included) default NULLS LAST — an
    // implicit ordering would silently pick a different survivor per engine
    // on a nullable source column
    val w = part.orderBy(asc_nulls_first("source"), col("doc_id"))
    docs
      .withColumn("text_hash", md5(col("text")))
      .withColumn("n_dups", count(lit(1)).over(part))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("source"), col("n_dups"))
      .orderBy(col("doc_id"))
  }

  /** Incremental EXACT dedup — the shape a continuously-grown corpus
    * actually runs: admit only the docs of a NEW batch whose text digest is
    * absent from the existing corpus, keeping the min-id survivor per batch
    * text (intra-batch dups collapse in the same shuffle).
    *
    * Scale design: the corpus side reduces to ONE 128-bit digest column —
    * at 100 TB that index is stored once (a narrow parquet of digests) and
    * re-read per batch, never the corpus texts. Both sides shuffle once on
    * the hash-uniform digest; the left-anti join is the membership probe
    * and is batch-sized on the probe side.
    */
  /** The corpus digest index summarized as ONE bloom-sketch row
    * (`corpus_bloom` BINARY) — the prefilter artifact for
    * [[graft.streaming.IngestGate.admitNovel]]'s fast path. Built by
    * Spark's own mergeable BloomFilterAggregate (surfaced via
    * [[graft.plans.BloomFns]]): one map-side-combined aggregation over the
    * digest column, O(numBits/8) bytes broadcast no matter the corpus row
    * count. Size it from the lake's doc count: ~10 bits/item ≈ 1% false
    * positives; false positives only cost a redundant exact probe, false
    * negatives cannot happen — the contract every bloom-assisted path
    * leans on. Rebuild beside the digest index at compaction (same
    * artifact-swap mechanics as the semantic index).
    */
  def corpusDigestBloom(
      corpusDigests: DataFrame, estItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    graft.plans.GraftFunctions.register(corpusDigests.sparkSession)
    corpusDigests.agg(
      call_function("bloom_filter_build",
        xxhash64(col("text_hash")), lit(estItems), lit(numBits))
        .as("corpus_bloom"))
  }

  def incrementalExactDedup(corpus: DataFrame, batch: DataFrame): DataFrame =
    batch
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .join(corpus.select(md5(col("text")).as("text_hash")).distinct(),
        Seq("text_hash"), "left_anti")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  /** Incremental MinHash+LSH novelty filter — admit the docs of a NEW batch
    * that near-duplicate NOTHING in the existing corpus: both sides band as
    * in [[minhashLshPairs]]; a batch doc is dropped iff it collides with a
    * corpus doc in ≥1 band AND verifies at exact Jaccard ≥ threshold.
    *
    * Scale design: the corpus side is a PRECOMPUTED index — (band,
    * band_hash, doc_id) postings plus shingle sets, computed once when each
    * doc was admitted and reused by every later batch — so the candidate
    * join is a batch-sized index lookup, not a corpus self-join, and the
    * verify join re-attaches shingles only for candidates. Intra-batch
    * near-dups are [[minhashLshPairs]]'s job; this operator answers novelty
    * against what is already kept. Same recall contract as the self-join
    * LSH: the candidate set is deterministic, so the oracle reproduces the
    * output false negatives included.
    */
  def incrementalMinhashDedup(
      corpus: DataFrame, batch: DataFrame, k: Int = 12, bands: Int = 4,
      rows: Int = 3, threshold: Double = 0.6): DataFrame = {
    require(bands * rows == k, "bands*rows must equal signature length")
    val corpusSig = shingleSignatures(corpus, k)
    val batchSig = shingleSignatures(batch, k)
    def banded(sig: DataFrame, idAs: String): DataFrame = sig.select(
      col("doc_id"), posexplode(bandHashes(col("sig"), bands, rows)))
      .toDF(idAs, "band", "bh")
    val cand = banded(batchSig, "i")
      .join(banded(corpusSig, "j"), Seq("band", "bh"))
      .select(col("i"), col("j")).distinct()
    val contaminated = cand
      .join(batchSig.select(col("doc_id").as("i"), col("sh").as("sh_i")), Seq("i"))
      .join(corpusSig.select(col("doc_id").as("j"), col("sh").as("sh_j")), Seq("j"))
      .withColumn("jac", round(jaccard(col("sh_i"), col("sh_j")), 6))
      .filter(col("jac") >= threshold)
      .select(col("i")).distinct()
    batch.select(col("doc_id"))
      .join(contaminated.withColumnRenamed("i", "doc_id"), Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** FUZZY decontamination: training docs whose shingle set sits at
    * Jaccard ≥ `threshold` against ANY benchmark document — the near-dup
    * complement of [[TextAnalysis.contaminationReport]]'s exact-n-gram
    * overlap (a lightly paraphrased eval answer shares most shingles but
    * not necessarily a verbatim 4-gram). Same probe machinery as
    * [[incrementalMinhashDedup]] with the roles recast — the benchmark is
    * the "corpus index", the training set the probing batch — but instead
    * of the anti-join it REPORTS each flagged doc with its best-matching
    * benchmark doc (highest exact Jaccard, ties to the lowest bench id):
    * the evidence a curation audit needs, not just the verdict.
    *
    * Scale: the banded probe never self-joins the training set; candidates
    * are train×bench band collisions only, and eval suites are tiny next
    * to the corpus, so the per-batch cost model of the incremental dedup
    * carries over unchanged.
    */
  def fuzzyDecontamination(
      train: DataFrame, bench: DataFrame, k: Int = 12, bands: Int = 4,
      rows: Int = 3, threshold: Double = 0.6): DataFrame = {
    require(bands * rows == k, "bands*rows must equal signature length")
    import org.apache.spark.sql.expressions.Window
    val trainSig = shingleSignatures(train, k)
    val benchSig = shingleSignatures(bench, k)
    def banded(sig: DataFrame, idAs: String): DataFrame = sig.select(
      col("doc_id"), posexplode(bandHashes(col("sig"), bands, rows)))
      .toDF(idAs, "band", "bh")
    val cand = banded(trainSig, "i")
      .join(banded(benchSig, "j"), Seq("band", "bh"))
      .select(col("i"), col("j")).distinct()
    val w = Window.partitionBy(col("i")).orderBy(col("jac").desc, col("j"))
    cand
      .join(trainSig.select(col("doc_id").as("i"), col("sh").as("sh_i")), Seq("i"))
      .join(benchSig.select(col("doc_id").as("j"), col("sh").as("sh_j")), Seq("j"))
      .withColumn("jac", round(jaccard(col("sh_i"), col("sh_j")), 6))
      .filter(col("jac") >= threshold)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("i").as("doc_id"), col("j").as("bench_id"), col("jac").as("jaccard"))
      .orderBy(col("doc_id"))
  }

  /** MinHash + LSH near-dup pairs, verified with exact Jaccard.
    *
    * shingle(3-gram) → k-component MinHash → `bands` band hashes →
    * self-join on (band_idx, band_hash) → distinct candidate pairs →
    * exact-Jaccard filter ≥ threshold. With k=12, bands=4, rows=3 a pair at
    * Jaccard 0.6 collides in ≥1 band with p ≈ 1-(1-0.6³)⁴ ≈ 0.65; at 0.8,
    * ≈ 0.95 — the corpus's planted dups sit at ≥0.8 (bimodal vs ≈0.01
    * background). The EXACT candidate set (not just the verified output) is
    * deterministic, so the DuckDB oracle reproduces it including its false
    * negatives.
    */
  /** Shingle sets + MinHash signatures as a mapPartitions kernel: one md5
    * digest instance per partition, k·|sh| digests per doc in a tight loop —
    * the declarative [[graft.functions.TextFunctions.minhashSignature]] runs
    * the same arithmetic through k interpreted array traversals per row.
    * Identical outputs (same md5 bytes, same lexicographic min).
    */
  private def shingleSignatures(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Par.spread(docs.select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexChars = "0123456789abcdef".toCharArray
        val prefixes = Array.tabulate(k)(s => (s.toString + ":").getBytes("UTF-8"))
        // min over hex strings == min over digest bytes compared unsigned —
        // hex-encode only the k winners, not all k·|sh| digests
        def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
          var i = 0
          while (i < a.length) {
            val x = a(i) & 0xff; val y = b(i) & 0xff
            if (x != y) return x < y
            i += 1
          }
          false
        }
        def hex(bytes: Array[Byte]): String = {
          val out = new Array[Char](bytes.length * 2)
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            out(i * 2) = hexChars(b >>> 4); out(i * 2 + 1) = hexChars(b & 0xf)
            i += 1
          }
          new String(out)
        }
        // shingles repeat across docs (planted near-dups, shared boilerplate)
        // — memoize each shingle's k digests per partition; the k-way min
        // fold then touches each digest array once per (doc, shingle)
        val cache = new java.util.HashMap[String, Array[Array[Byte]]]()
        def shingleDigests(s: String): Array[Array[Byte]] = {
          val hit = cache.get(s)
          if (hit != null) hit
          else {
            val sb = s.getBytes("UTF-8")
            val ds = Array.tabulate(k) { i =>
              md.update(prefixes(i)); md.update(sb); md.digest()
            }
            if (cache.size() < (1 << 18)) cache.put(s, ds)
            ds
          }
        }
        it.map { case (id, text) =>
          val toks = text.split(" ", -1)
          val sh: Array[String] =
            if (toks.length >= 3)
              Array.tabulate(toks.length - 2)(i =>
                s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").distinct
            else Array.empty[String]
          val mins = new Array[Array[Byte]](k)
          sh.foreach { s =>
            val ds = shingleDigests(s)
            var i = 0
            while (i < k) {
              if (mins(i) == null || lessUnsigned(ds(i), mins(i))) mins(i) = ds(i)
              i += 1
            }
          }
          val sig = mins.map(m => if (m == null) null else hex(m))
          (id, sh, sig)
        }
      }.toDF("doc_id", "sh", "sig")
  }

  def minhashLshPairs(
      docs: DataFrame, k: Int = 12, bands: Int = 4, rows: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    require(bands * rows == k, "bands*rows must equal signature length")
    val base = shingleSignatures(docs, k)
    val banded = base.select(
      col("doc_id"), posexplode(bandHashes(col("sig"), bands, rows)))
      .toDF("doc_id", "band", "bh")
    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
    val shA = base.select(col("doc_id").as("i"), col("sh").as("sh_i"))
    val shB = base.select(col("doc_id").as("j"), col("sh").as("sh_j"))
    candidates.join(shA, "i").join(shB, "j")
      .withColumn("jac", round(jaccard(col("sh_i"), col("sh_j")), 6))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), col("jac"))
      .orderBy(col("i"), col("j"))
  }

  /** N-gram Jaccard near-dup pairs, blocked by `lang` — the exact-recall
    * baseline the LSH variant trades against.
    *
    * Inverted-index formulation: explode to (shingle, doc) postings and join
    * postings on (shingle, lang) to count |A∩B| per pair — only pairs
    * sharing ≥1 shingle materialize (a pair with jaccard ≥ t > 0 always
    * does). Cost is Σ_s df(s)² instead of n²·|sh|.
    *
    * Skew bound: a posting group is pair-generated only when its document
    * frequency is ≤ `dfCap` — one viral boilerplate shingle ("click here to
    * subscribe…") would otherwise create a df² quadratic group at 100 TB.
    * The group is short-circuited BEFORE materializing (take(dfCap+1)), so
    * the bound holds on memory as well as output. Recall contract: dropping
    * a shingle with df > dfCap removes it from every pair's intersection
    * count — a pair whose shared shingles are ALL viral is missed entirely,
    * and a pair sharing some viral shingles has its jaccard underestimated
    * (denominator keeps all shingles), which can only push it BELOW the
    * threshold, never create a false positive. On this corpus max df ≈ 14 ≪
    * 128, so the default output is exact and the uncapped DuckDB oracle
    * stays green; DfCapSpec plants a viral shingle to prove the bound.
    */
  def ngramJaccardPairs(
      docs: DataFrame, threshold: Double = 0.6, dfCap: Int = 128): DataFrame = {
    // shingling as a kernel: the declarative form re-evaluates split(text)
    // inside the transform lambda for every shingle (CollapseProject inlines
    // the alias), turning an O(tokens) job into O(tokens·shingles)
    val spark = docs.sparkSession
    import spark.implicits._
    val base = Par.spread(docs.select(col("doc_id"), col("lang"), col("text")))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, lang, text) =>
        val toks = text.split(" ", -1)
        val sh: Array[String] =
          if (toks.length >= 3)
            Array.tabulate(toks.length - 2)(i =>
              s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").distinct
          else Array.empty[String]
        (id, lang, sh)
      })
      .toDF("doc_id", "lang", "sh")
      .withColumn("sz", size(col("sh")))
    // one shuffle on the posting key, pairs generated in-group (a self-join
    // would shuffle the postings twice and recompute the shingle kernel for
    // each side); df is hash-bounded (max 14 docs/key at sf0.1)
    val postings = base.select(
      col("doc_id"), col("lang"), col("sz"), explode(col("sh")).as("s"))
      .as[(Long, String, Int, String)]
    postings
      .groupByKey { case (_, lang, _, s) => (lang, s) }
      .flatMapGroups { (_, rows) =>
        // bounded materialization: a viral group is detected at dfCap+1 and
        // dropped without buffering (or pairing) the rest of its postings;
        // saturate the +1 so dfCap = Int.MaxValue means "uncapped" instead
        // of overflowing take() to a negative (empty) limit
        val lim = if (dfCap == Int.MaxValue) Int.MaxValue else dfCap + 1
        val ds = rows.map { case (id, _, sz, _) => (id, sz) }
          .take(lim).toArray
        if (ds.length > dfCap) Iterator.empty
        else {
          java.util.Arrays.sort(ds, Ordering.by((t: (Long, Int)) => t._1))
          for {
            i <- ds.indices.iterator
            j <- (i + 1 until ds.length).iterator
          } yield (ds(i)._1, ds(j)._1, ds(i)._2, ds(j)._2)
        }
      }
      .toDF("i", "j", "sz_i", "sz_j")
      .groupBy(col("i"), col("j"), col("sz_i"), col("sz_j"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jac", round(col("common").cast("double") /
        (col("sz_i") + col("sz_j") - col("common")).cast("double"), 6))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), col("jac"))
      .orderBy(col("i"), col("j"))
  }

  /** Exact-substring duplicate pairs at token-window granularity — the
    * discretized form of the exact-substring criterion of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better" (2021):
    * two documents pair iff they share ANY verbatim run of `window`
    * consecutive tokens. Complements the similarity family: MinHash /
    * SimHash / Jaccard measure GLOBAL overlap, so a verbatim 20-token
    * quote inside two otherwise-unrelated documents is invisible to them —
    * yet it is exactly what memorization audits hunt.
    *
    * Postings carry the md5 digest of each window, never the window text
    * (32 bytes shuffled per posting regardless of window length), distinct
    * per doc. Pairs generate in-group under the same dfCap short-circuit as
    * [[ngramJaccardPairs]]: a boilerplate window shared by thousands of
    * docs buffers dfCap+1 postings and emits zero pairs. Output counts the
    * shared windows per pair (a proxy for run length: a shared run of L ≥
    * window tokens contributes L − window + 1 hits).
    */
  def substringDupPairs(
      docs: DataFrame, window: Int = 20, dfCap: Int = 128): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val posts = Par.spread(docs.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexChars = "0123456789abcdef".toCharArray
        def hex(bytes: Array[Byte]): String = {
          val out = new Array[Char](bytes.length * 2)
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            out(i * 2) = hexChars(b >>> 4); out(i * 2 + 1) = hexChars(b & 0xf)
            i += 1
          }
          new String(out)
        }
        it.flatMap { case (id, text) =>
          val toks = text.split(" ", -1)
          if (toks.length < window) Iterator.empty
          else {
            val seen = new java.util.HashSet[String]()
            (0 to toks.length - window).iterator.flatMap { i =>
              val sb = new StringBuilder(toks(i))
              var j = i + 1
              while (j < i + window) { sb.append(' ').append(toks(j)); j += 1 }
              val h = hex(md.digest(sb.toString.getBytes("UTF-8")))
              if (seen.add(h)) Iterator.single((id, h)) else Iterator.empty
            }
          }
        }
      }
    posts
      .groupByKey(_._2)
      .flatMapGroups { (_, rows) =>
        val lim = if (dfCap == Int.MaxValue) Int.MaxValue else dfCap + 1
        val ds = rows.map(_._1).take(lim).toArray
        if (ds.length > dfCap) Iterator.empty
        else {
          java.util.Arrays.sort(ds)
          for {
            i <- ds.indices.iterator
            j <- (i + 1 until ds.length).iterator
          } yield (ds(i), ds(j))
        }
      }
      .toDF("i", "j")
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n_shared_windows"))
      .orderBy(col("i"), col("j"))
  }

  /** SimHash fingerprints (60-bit, as a bit string): Hamming-near rows are
    * near-dups. Pair extraction at scale: band the bit string into 4 chunks
    * and join on chunk equality (Hamming ≤ 3 ⇒ ≥1 identical chunk).
    *
    * Implemented as a mapPartitions kernel: the declarative form (60
    * per-bit higher-order aggregates per row —
    * [[graft.functions.TextFunctions.simhashBits]]) evaluates interpreted
    * and costs ~60 array traversals/row; the kernel does one md5 + one
    * 60-bit scan per token with identical integer arithmetic, so outputs
    * stay oracle-identical. Narrow, partition-preserving, no shuffle.
    */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Par.spread(docs.select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        // first 15 hex chars of md5 == first 8 digest bytes big-endian >>> 4
        // (identical to parsing the hex prefix, without the formatting cost);
        // tokens repeat heavily, so memoize token -> 60-bit hash per partition
        val cache = new java.util.HashMap[String, java.lang.Long]()
        def tokenHash(t: String): Long = {
          val hit = cache.get(t)
          if (hit != null) hit.longValue()
          else {
            val d = md.digest(t.getBytes("UTF-8"))
            var h = 0L
            var b = 0
            while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
            h >>>= 4
            if (cache.size() < (1 << 20)) cache.put(t, h)
            h
          }
        }
        it.map { case (id, text) =>
          val counts = new Array[Long](60)
          text.split(" ", -1).foreach { t =>
            val h = tokenHash(t)
            var j = 0
            while (j < 60) { counts(j) += ((h >> j) & 1L) * 2 - 1; j += 1 }
          }
          (id, counts.map(c => if (c > 0) '1' else '0').mkString)
        }
      }
      .toDF("doc_id", "simhash")
      .orderBy(col("doc_id"))
  }

  /** Banded-Hamming candidate pairs over an arbitrary bit-string
    * fingerprint column — the shared blocking kernel of
    * [[simhashNearDupPairs]] (60-bit text SimHash) and
    * [[graft.operators.Multimodal.mediaPhashNearDupPairs]] (64-bit
    * perceptual dHash). The fingerprint is banded into `chunks` slices of
    * `chunkLen` bits; by pigeonhole, Hamming ≤ chunks−1 ⇒ at least one
    * identical chunk, so the chunk-equality blocking is EXACT at that
    * threshold. One shuffle on the (chunk_idx, chunk) key with in-group
    * pair generation — a chunk-equality self-join would shuffle (and
    * recompute the fingerprint for) both sides. `blockCap` bounds a
    * degenerate block (e.g. a fingerprint value repeated 10⁵× at corpus
    * scale): a block past the cap buffers cap+1 rows and emits ZERO pairs
    * — the same short-circuit contract as [[editDistancePairs]]' dfCap;
    * exact-duplicate floods should be removed by [[dedupKeepFirst]]
    * upstream, which is the documented pipeline order.
    *
    * A dropped block is NOT silent: the `graft.bandedHamming.droppedBlocks`
    * accumulator counts them (visible in the Spark UI / status API), and
    * each drop logs one executor-side warning — so recall loss at scale has
    * a runtime signal instead of vanishing into an empty result. The DuckDB
    * oracles for the simhash/phash pair queries have NO cap, so the
    * correctness contract is that verification-scale data stays under it —
    * asserted by DedupSpec ("banded-Hamming blocks stay under blockCap at
    * test scale"); at production scale the accumulator is the contract.
    *
    * Input: (doc_id: Long, fp: String). Output: distinct candidate pairs
    * (i, j, fp_i, fp_j), i < j.
    */
  /** The kernel's recall-loss telemetry: ONE named accumulator per
    * SparkContext (re-created on context restart), shared by every
    * banded-Hamming call so operators and monitors read a single counter.
    */
  private[graft] object BandedHammingMetrics {
    @transient private var cached:
      Option[(org.apache.spark.SparkContext,
        org.apache.spark.util.LongAccumulator)] = None
    def droppedBlocks(sc: org.apache.spark.SparkContext)
        : org.apache.spark.util.LongAccumulator = synchronized {
      cached match {
        case Some((c, a)) if (c eq sc) && !c.isStopped => a
        case _ =>
          val a = sc.longAccumulator("graft.bandedHamming.droppedBlocks")
          cached = Some((sc, a)); a
      }
    }
  }

  private[graft] def bandedHammingCandidates(
      fp: DataFrame, chunks: Int, chunkLen: Int,
      blockCap: Int = 65536): DataFrame = {
    val spark = fp.sparkSession
    import spark.implicits._
    val droppedBlocks = BandedHammingMetrics.droppedBlocks(spark.sparkContext)
    val chunked = fp.select(
      col("doc_id"), col("fp"),
      posexplode(array((0 until chunks).map(c =>
        substring(col("fp"), c * chunkLen + 1, chunkLen)): _*)))
      .toDF("doc_id", "fp", "chunk_idx", "chunk")
      .as[(Long, String, Int, String)]
    chunked
      .groupByKey { case (_, _, ci, c) => (ci, c) }
      .flatMapGroups { (key, rows) =>
        val lim = if (blockCap == Int.MaxValue) Int.MaxValue else blockCap + 1
        val ds = rows.map { case (id, s, _, _) => (id, s) }.take(lim).toArray
        if (ds.length > blockCap) {
          droppedBlocks.add(1L)
          // executor-side: resolve the logger in the closure (slf4j
          // Loggers are not serializable; lookup is cached after first use)
          org.slf4j.LoggerFactory.getLogger("graft.Dedup").warn(
            s"bandedHammingCandidates: block $key exceeds " +
              s"blockCap=$blockCap — emitting zero pairs (recall loss)")
          Iterator.empty
        }
        else {
          java.util.Arrays.sort(ds, Ordering.by((t: (Long, String)) => t._1))
          for {
            i <- ds.indices.iterator
            j <- (i + 1 until ds.length).iterator
          } yield (ds(i)._1, ds(j)._1, ds(i)._2, ds(j)._2)
        }
      }
      .toDF("i", "j", "fp_i", "fp_j")
      .distinct() // a pair may collide in several chunks
  }

  /** SimHash near-dup pairs: 60-bit fingerprints banded into 4 15-bit
    * chunks; by pigeonhole, Hamming ≤ 3 ⇒ at least one identical chunk, so
    * the chunk-equality self-join is an EXACT blocking (no recall loss at
    * the ≤3 threshold). Blocking via [[bandedHammingCandidates]];
    * verification uses the native [[graft.plans.HammingDistance]] codegen
    * expression.
    */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    graft.plans.GraftFunctions.register(spark)
    val fp = simhashFingerprints(docs).toDF("doc_id", "fp")
    bandedHammingCandidates(fp, chunks = 4, chunkLen = 15)
      .withColumn("hamming", call_function("hamming_distance", col("fp_i"), col("fp_j")))
      .filter(col("hamming") <= maxHamming)
      .select(col("i"), col("j"), col("hamming"))
      .orderBy(col("i"), col("j"))
  }

  /** Connected components over an undirected pair list `(i, j)` by
    * alternating large-star / small-star edge rewrites (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14).
    *
    * Each round: LARGE-STAR groups the mirrored edge list by every endpoint
    * u and re-points u's strictly-larger neighbors at m(u) = min(N(u) ∪
    * {u}); SMALL-STAR groups by the larger endpoint and re-points its
    * smaller neighbors (and itself) at the group minimum. Component height
    * roughly halves per round, so a diameter-d chain converges in O(log d)
    * rounds — vs the O(d) of plain min-label propagation: on a 100 TB pair
    * graph with one chain-shaped component that is ~10 shuffles instead of
    * ~10,000. Terminal state is a star per component, rooted at the
    * component-minimum id (the same canonical labels the min-label fixpoint
    * and the recursive-CTE oracle produce).
    *
    * Every stage is a hash groupBy/join on node ids — no driver-side graph.
    * Each round's edge set is `localCheckpoint`ed, which TRUNCATES the
    * logical plan to a LogicalRDD — the round-over-round plan otherwise
    * grows ~5× per iteration (union+join+union) and OOMs the driver just
    * RENDERING the explain string by round 7 — and the PREVIOUS round's
    * checkpoint blocks are unpersisted explicitly each iteration, so at
    * most two edge-set copies are ever held (the ContextCleaner alone
    * would let ~10 rounds pile up ~10 copies). On a real cluster with
    * executor loss, swap for reliable `checkpoint` to a checkpoint dir —
    * same truncation, fault-tolerant storage. Fails loudly (require) if
    * `maxIter` rounds do not reach the fixpoint, rather than returning
    * wrong labels.
    *
    * Returns (labels for nodes with degree >= 1 as (doc_id, cluster_id),
    * rounds used) — DedupSpec asserts the O(log d) round count on a planted
    * 100-node chain.
    */
  def connectedComponentsStars(
      pairs: DataFrame, maxIter: Int = 30): (DataFrame, Int) = {
    // localCheckpoint truncates the logical plan WITHOUT a Row ser/de round
    // trip (a createDataFrame(df.rdd, schema) wrap costs ~30% of the whole
    // clustering query, measured); its one flaw — blocks freed only when
    // the ContextCleaner notices the RDD is unreachable — is closed by
    // unpersisting each round's checkpointed RDD (via its LogicalRDD plan
    // node) as soon as the next round is materialized
    def ckptRdd(df: DataFrame): org.apache.spark.rdd.RDD[_] =
      df.queryExecution.analyzed
        .collectFirst { case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd }
        .getOrElse(sys.error("checkpointed frame must plan as LogicalRDD"))
    // set-equality detection in ONE job: both rounds' edge sets are
    // distinct, so equality is decided by (count, Σhash, XORhash) over a
    // 64-bit per-edge hash — a collision needs two DIFFERENT edge sets
    // agreeing on all three simultaneously (≈2⁻¹²⁸ per round, vs the
    // previous per-round `except().count()` which re-shuffled the full
    // edge set a second time: 3 jobs/round → 1)
    def fingerprint(df: DataFrame): (Long, BigDecimal, Long) = {
      // the Σhash leg accumulates in DECIMAL(38,0): a plain long sum of
      // 64-bit hashes overflows (ANSI mode throws), while 10⁹ edges × 2⁶³
      // ≈ 10²⁸ stays far inside 38 digits
      val r = df.agg(
        count(lit(1)),
        sum(xxhash64(col("i"), col("j")).cast("decimal(38,0)")),
        expr("bit_xor(xxhash64(i, j))")).head()
      (r.getLong(0),
        if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    var edges = pairs
      .select(least(col("i"), col("j")).as("i"), greatest(col("i"), col("j")).as("j"))
      .filter(col("i") =!= col("j"))
      .distinct()
      .localCheckpoint()
    var edgesRdd = ckptRdd(edges)
    var fp = fingerprint(edges)
    var iter = 0
    var done = fp._1 == 0
    while (!done && iter < maxIter) {
      // large-star: mirrored neighbor list, m(u) = min(N(u) ∪ {u}); every
      // larger neighbor j of u is re-pointed at m(u). m ≤ u < j keeps the
      // (i < j) canonical form with no self loops.
      val nbrs = edges.union(edges.select(col("j").as("i"), col("i").as("j")))
      val minsL = nbrs.groupBy(col("i")).agg(min(col("j")).as("mn"))
        .select(col("i").as("u"), least(col("i"), col("mn")).as("m"))
      // the canonical (i < j) edge list already IS the set of
      // (node, strictly-larger-neighbor) pairs — no need to mirror and
      // re-filter; each j re-points at m(i)
      val large = edges
        .join(minsL, col("i") === col("u"))
        .select(col("m").as("i"), col("j"))
        .distinct()
      // small-star: group by the larger endpoint j, m = min of its smaller
      // neighbors; re-point each smaller neighbor and j itself at m
      val minsS = large.groupBy(col("j")).agg(min(col("i")).as("m"))
      val small = large.join(minsS, Seq("j"))
        .select(col("m").as("i"), col("i").as("j"))
        .union(minsS.select(col("m").as("i"), col("j")))
        .filter(col("i") =!= col("j"))
        .distinct()
      val next = small.localCheckpoint()
      // fixpoint iff the canonical edge set is unchanged: one agg over the
      // just-checkpointed blocks (reads cache, shuffles nothing)
      val nextFp = fingerprint(next)
      done = nextFp == fp
      // the previous round's blocks are dead once `next` is materialized;
      // free them NOW instead of waiting on the ContextCleaner
      edgesRdd.unpersist(blocking = false)
      edgesRdd = ckptRdd(next)
      edges = next
      fp = nextFp
      iter += 1
    }
    require(done, s"connectedComponentsStars did not converge within $maxIter " +
      "rounds; raise maxIter")
    // the FINAL round stays persisted: the returned labels read it lazily,
    // and unpersisting here would cascade a full recompute (every ancestor
    // round was just freed). One edge-set copy, released by the cleaner
    // when the caller drops the result.
    // terminal star: every leaf j has exactly one edge to its component root
    val labels = edges.select(col("j").as("doc_id"), col("i").as("cluster_id"))
      .union(edges.select(col("i")).distinct()
        .select(col("i").as("doc_id"), col("i").as("cluster_id")))
    (labels, iter)
  }

  /** Near-duplicate CLUSTERS — connected components over the exact-Jaccard
    * pair graph via [[connectedComponentsStars]]. The component label is
    * the min doc_id reachable in the component — a canonical, deterministic
    * cluster id (the survivor a dedup pass would keep). Only vertices with
    * degree ≥ 1 enter the iteration; singletons join back at the end
    * labeled by their own id.
    */
  /** Shared labeling tail of every clustering entry point: attach component
    * labels to the full entity set, defaulting degree-0 singletons to their
    * own id (the survivor rule), ordered by id.
    */
  private def attachClusterLabels(
      entities: DataFrame, idCol: String, labels: DataFrame): DataFrame =
    entities.select(col(idCol))
      .join(labels.select(col("doc_id").as(idCol), col("cluster_id").as("comp")),
        Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("cluster_id"))
      .orderBy(col(idCol))

  def nearDupClusters(
      docs: DataFrame, threshold: Double = 0.6, maxIter: Int = 20): DataFrame = {
    // the entry localCheckpoint inside connectedComponentsStars materializes
    // the shingle + posting pipeline exactly once; no extra persist needed
    val pairs = ngramJaccardPairs(docs, threshold).select(col("i"), col("j"))
    val (labels, _) = connectedComponentsStars(pairs, maxIter)
    attachClusterLabels(docs, "doc_id", labels)
  }

  /** Transitive (cluster-propagated) decontamination — the indirect-
    * leakage closure a direct n-gram check misses: a training doc sharing
    * NO shingle with any benchmark doc can still be a near-duplicate of a
    * doc that does (a paraphrase, a trimmed mirror), and training on the
    * paraphrase leaks the benchmark just the same. Contaminated :=
    * directly contaminated ∪ every near-dup cluster-mate of a directly
    * contaminated doc. Each flagged doc reports its `vector` ('direct' /
    * 'via_cluster'), its cluster, and how many direct hits the cluster
    * holds — the evidence trail a quarantine review reads.
    *
    * Plan shape: the direct report is the usual broadcast probe of the
    * benchmark shingle vocabulary; the closure adds ONE semi-join of the
    * (already-paid) CC labels against the direct set and one shrinking
    * per-cluster count — no new pair generation, no corpus self-join
    * beyond the dedup artifact the pipeline already builds.
    */
  def transitiveContamination(
      trainDocs: DataFrame, benchDocs: DataFrame,
      threshold: Double = 0.6, n: Int = 4): DataFrame = {
    val direct = TextAnalysis.contaminationReport(trainDocs, benchDocs, n)
      .select(col("doc_id")).withColumn("is_direct", lit(true))
    val clusters = nearDupClusters(trainDocs, threshold)
      .select(col("doc_id"), col("cluster_id"))
    val hits = clusters
      .join(direct.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_direct"))
    clusters
      .join(hits, Seq("cluster_id")) // only contaminated clusters survive
      .join(direct, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("cluster_id"), col("n_direct"),
        when(col("is_direct").isNotNull, "direct")
          .otherwise("via_cluster").as("vector"))
      .orderBy(col("doc_id"))
  }

  /** Provenance union over [[nearDupClusters]] — the governance step a
    * keep-one dedup MUST run before dropping anything: the surviving
    * canonical doc inherits the UNION of its cluster's source domains and
    * languages, because dropping a near-duplicate does not drop its
    * provenance obligations (license terms, attribution, takedown scope
    * travel with the TEXT, which the survivor still carries). Per cluster:
    * the min-id canonical, member count, and the sorted-distinct source /
    * lang unions (comma-joined so the row is one flat hashable string —
    * deterministic on any engine). `n_sources > 1` rows are the
    * cross-source duplications — the set a license audit reads first.
    *
    * Plan shape: the CC labels (one fixpoint already paid), one hash join
    * back to the doc metadata on doc_id, ONE shrinking aggregation on
    * cluster_id. collect_set stays bounded by the per-cluster distinct
    * domain count, not member count.
    */
  def dedupProvenance(
      docs: DataFrame, threshold: Double = 0.6, maxIter: Int = 20): DataFrame =
    nearDupClusters(docs, threshold, maxIter)
      .select(col("doc_id"), col("cluster_id"))
      .join(docs.select(col("doc_id"), col("source"), col("lang")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_members"),
        size(array_sort(collect_set(col("source")))).cast("long").as("n_sources"),
        array_join(array_sort(collect_set(col("source"))), ",").as("sources"),
        array_join(array_sort(collect_set(col("lang"))), ",").as("langs"))
      .orderBy(col("cluster_id"))

  /** Duplication report card over [[nearDupClusters]] — the corpus-health
    * summary a curation run publishes with every release: for each
    * duplicate-cluster SIZE class, how many clusters there are, how many
    * documents they hold, and how many a keep-lowest-id dedup would drop
    * (`(size−1)·n_clusters`). Size 1 = the unique tail; the tail of large
    * sizes is the viral-content mass that dominates dedup savings, and a
    * release-over-release shift in this histogram is the drift signal
    * that triggers re-tuning the threshold or the blocking caps.
    *
    * Plan shape: the cluster labels (already one CC fixpoint over banded
    * pairs), then TWO tiny aggregations — sizes per cluster, then the
    * histogram over sizes (shuffle keys: cluster_id, then cluster_size —
    * both shrink the data at each step). Output rows = distinct size
    * classes, O(log corpus) in practice.
    */
  def dedupAudit(
      docs: DataFrame, threshold: Double = 0.6, maxIter: Int = 20): DataFrame =
    nearDupClusters(docs, threshold, maxIter)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"),
        sum(col("cluster_size") - lit(1L)).as("n_dropped"))
      .orderBy(col("cluster_size"))

  /** Character-level near-dup pairs by bounded edit distance — the dedup
    * family that catches typo/OCR-noise duplicates token-level Jaccard
    * misses (a dozen single-character edits leave most shingles broken but
    * the edit distance tiny).
    *
    * Blocking: candidates must share (lang, first token, char-length
    * bucket), with each doc exploded to buckets {b, b+1} so a true pair
    * straddling a bucket boundary still collides (|Δlen| ≤ `bucket` ⇒
    * bucket sets intersect). Two docs within `maxDist` edits differ by at
    * most `maxDist` characters of length, so `bucket` > maxDist makes the
    * blocking LOSSLESS for same-first-token pairs; the first-token key is
    * the recall trade (documented, like LSH's) that keeps groups tiny at
    * corpus scale.
    *
    * Skew bound: candidate pairs generate IN-GROUP under the same
    * take(cap+1) short-circuit as [[ngramJaccardPairs]] — a corpus where
    * thousands of docs share a first token ("the …") and a length bucket
    * would otherwise create a df² quadratic group. A block larger than
    * `blockCap` buffers blockCap+1 ids and emits ZERO pairs, bounding both
    * memory and output. Recall contract: pairs inside a viral block are
    * missed entirely (never mis-scored — every emitted pair is still
    * verified by exact levenshtein); on this corpus the largest block is
    * ≪ 256, so the default output is exact and the uncapped DuckDB oracle
    * stays green. DedupSpec plants a 500-doc viral block to prove the
    * bound. Texts re-attach to the deduped candidate list, then the
    * codegen'd `levenshtein` verifies exactly.
    */
  def editDistancePairs(
      docs: DataFrame, maxDist: Int = 12, bucket: Int = 32,
      blockCap: Int = 256): DataFrame = {
    require(bucket > maxDist, "bucket width must exceed maxDist or boundary pairs are lost")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = Par.spread(docs).select(
      col("doc_id"), col("lang"),
      element_at(split(col("text"), " "), 1).as("tok0"),
      floor(length(col("text")) / bucket).as("b"))
    val exploded = keyed.select(col("doc_id"), col("lang"), col("tok0"),
      explode(array(col("b"), col("b") + 1)).as("blk"))
      .as[(Long, String, String, Long)]
    // one shuffle on the block key, pairs generated in-group (the previous
    // self-join shuffled the keyed frame twice and had no group-size bound)
    val cand = exploded
      .groupByKey { case (_, lang, tok0, blk) => (lang, tok0, blk) }
      .flatMapGroups { (_, rows) =>
        val lim = if (blockCap == Int.MaxValue) Int.MaxValue else blockCap + 1
        val ds = rows.map(_._1).take(lim).toArray
        if (ds.length > blockCap) Iterator.empty
        else {
          java.util.Arrays.sort(ds)
          for {
            i <- ds.indices.iterator
            j <- (i + 1 until ds.length).iterator
          } yield (ds(i), ds(j))
        }
      }
      .toDF("i", "j")
      // a true pair straddling no boundary collides in BOTH its b and b+1
      // blocks — dedup before attaching texts
      .dropDuplicates("i", "j")
    val texts = docs.select(col("doc_id"), col("text"))
    cand
      .join(texts.select(col("doc_id").as("i"), col("text").as("t_i")), Seq("i"))
      .join(texts.select(col("doc_id").as("j"), col("text").as("t_j")), Seq("j"))
      // |Δlen| > maxDist already implies dist > maxDist — kill those pairs
      // before any DP runs
      .filter(abs(length(col("t_i")) - length(col("t_j"))) <= maxDist)
      // thresholded levenshtein is the banded O(maxDist·n) DP with early
      // exit (-1 above the threshold) — ~30x cheaper than the full O(n·m)
      // matrix on these documents, and exact for every surviving pair
      .withColumn("dist", levenshtein(col("t_i"), col("t_j"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("i"), col("j"), col("dist"))
      .orderBy(col("i"), col("j"))
  }

  /** Near-dup CLUSTERS in embedding space: connected components over the
    * banded sign-LSH pair graph — the vector-side analog of
    * [[nearDupClusters]], sharing the same star-CC engine and the same
    * recursive-CTE oracle form. Collapses paraphrase/translation chains
    * that pairwise cosine alone leaves as fragments.
    */
  def embeddingNearDupClusters(
      embeddings: DataFrame, threshold: Double = 0.45, maxIter: Int = 20): DataFrame = {
    val pairs = embeddingNearDupLsh(embeddings, threshold).select(col("i"), col("j"))
    val (labels, _) = connectedComponentsStars(pairs, maxIter)
    attachClusterLabels(embeddings, "vec_id", labels)
  }

  /** Embedding-cosine near-dup pairs via banded sign-LSH — the DEFAULT scale
    * path (no driver collect, no O(corpus) broadcast): every stage is a
    * narrow projection or a hash equi-join, so the plan survives a corpus
    * that does not fit one executor.
    *
    * Shape: each vector gets `bands` bucket ids (bandBits sign bits per
    * band, deterministic md5-derived hyperplanes shared with
    * [[SimilaritySearch.lshBucket]]), posexplode → self-join on
    * (band, bucket) with i<j → dropDuplicates(i,j) → exact codegen'd cosine
    * verify. Candidates are hash-uniform (sign bits of random projections),
    * so the join has no planted skew key.
    *
    * Recall contract: a pair at cosine c collides per band with
    * p = (1 - acos(c)/pi)^bandBits and overall with 1-(1-p^1)^bands; the
    * candidate set is DETERMINISTIC, so the oracle reproduces the exact
    * output false negatives included, and SimilaritySpec measures recall
    * against [[embeddingNearDupPairs]]. Defaults (16 bands x 4 bits) fit
    * this corpus's 0.45 threshold; a production near-dup threshold (>=0.9)
    * takes wider bands (selective buckets) at the same plan shape.
    */
  def embeddingNearDupLsh(
      embeddings: DataFrame, threshold: Double = 0.45,
      bands: Int = 16, bandBits: Int = 4, dim: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // all bands*bandBits sign bits in ONE kernel pass: the declarative
    // lshBucket twin evaluates 64 interpreted HOF plane-dots per row (the
    // measured 5-10x trap, BENCH.md) — the kernel keeps the identical
    // index-ascending double arithmetic (x.toDouble * ±1.0, acc +) so the
    // bucket ids, and therefore the oracle's candidate set, are unchanged
    val planes = SimilaritySearch.planeSigns(bands * bandBits, dim)
      .map(_.map(_.toDouble).toArray).toArray
    val bucketed = Par.spread(embeddings.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (id, f) =>
          val e = f.map(_.toDouble)
          (0 until bands).iterator.map { b =>
            val sb = new java.lang.StringBuilder(bandBits)
            var bit = 0
            while (bit < bandBits) {
              val plane = planes(b * bandBits + bit)
              var s = 0.0; var i = 0
              while (i < plane.length) { s += e(i) * plane(i); i += 1 }
              sb.append(if (s > 0) '1' else '0')
              bit += 1
            }
            (id, b, sb.toString)
          }
        }
      }.toDF("vec_id", "band", "bucket")
    // the band self-join carries ONLY ids — at scale, shuffling 16 copies of
    // every vector through the join dominates; candidates are a small
    // fraction of the corpus, so re-attaching vectors to the deduped pair
    // list with two narrow hash joins is the cheaper (and broadcast-free)
    // shape
    val cand = bucketed.toDF("i", "band", "bucket")
      .join(bucketed.toDF("j", "band", "bucket"), Seq("band", "bucket"))
      .filter(col("i") < col("j"))
      .dropDuplicates("i", "j")
      .select(col("i"), col("j"))
    val emb = embeddings.select(col("vec_id"), col("embedding"))
    cand
      .join(emb.select(col("vec_id").as("i"), col("embedding").as("emb_i")), Seq("i"))
      .join(emb.select(col("vec_id").as("j"), col("embedding").as("emb_j")), Seq("j"))
      .withColumn("cos", round(
        call_function("cosine_similarity", col("emb_i"), col("emb_j")), 6))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), col("cos"))
      .orderBy(col("i"), col("j"))
  }

  /** Embedding-cosine near-dup pairs, brute force — the EXACTNESS BASELINE
    * and recall-measurement twin of [[embeddingNearDupLsh]] (which is the
    * path that scales; this one broadcasts the full corpus as a primitive
    * matrix and must fit an executor). Cosine is computed in double,
    * sequentially, index-ascending — bit-identical to the oracle's list_sum.
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame, threshold: Double = 0.45, dim: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val spreadVecs = Par.spread(embeddings.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
    // The comparison side is broadcast as a primitive matrix and each
    // partition runs a tight JVM loop — the all-pairs kernel is O(n²·dim)
    // regardless of engine, and Catalyst row machinery per pair would
    // dominate it. The broadcast side must fit an executor (it's the
    // exactness baseline; SimilaritySearch.lshTopK is the scale path).
    val mat = spark.sparkContext.broadcast(
      vecs.collect().sortBy(_._1)
        .map { case (id, f) => (id, f.map(_.toDouble)) }
        .map { case (id, d) => (id, d, SimilaritySearch.l2NormKernel(d)) })
    spreadVecs.mapPartitions { it =>
      val all = mat.value
      // sorted by id — binary search the first strictly-greater index so the
      // i<j half-triangle never iterates (or evaluates) the lower half
      def lowerBound(id: Long): Int = {
        var lo = 0; var hi = all.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (all(mid)._1 <= id) lo = mid + 1 else hi = mid
        }
        lo
      }
      it.flatMap { case (id, f) =>
        val e = f.map(_.toDouble)
        val ne = SimilaritySearch.l2NormKernel(e)
        Iterator.range(lowerBound(id), all.length)
          .map { x =>
            val (jd, v, nv) = all(x)
            (id, jd, SimilaritySearch.safeCos(
              SimilaritySearch.dotKernel(e, v), ne, nv))
          }
          .filter(_._3 >= threshold)
      }
    }.toDF("i", "j", "cos").orderBy(col("i"), col("j"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * k-means-cluster the embedding space ([[Embeddings.kmeansAssign]]),
    * then hunt near-duplicates only WITHIN each cluster — the cluster
    * granularity, not the corpus size, bounds the quadratic work, which is
    * how the paper scales pairwise semantic comparison to web corpora
    * (`k` grows with the corpus so mean cluster size stays constant).
    * Catches paraphrases and re-encodings whose token-level signatures
    * (MinHash, SimHash, shingles) share nothing.
    *
    * Decision rule: a vector DROPS when some lower-id clustermate sits at
    * rounded cosine ≥ `threshold` — deterministic, and every epsilon-group
    * keeps exactly its lowest id (the paper keeps one representative per
    * group; lowest-id is the replayable choice, same as the CC canonical).
    *
    * Plan shape: cluster ids come from the k-means jobs (no shuffle);
    * candidate pairs generate IN-GROUP under the same take(cap+1)
    * short-circuit as [[editDistancePairs]] — one shuffle on cluster id,
    * a block larger than `clusterCap` emits zero pairs instead of a
    * quadratic group (recall contract documented there; size clusters via
    * `k` so the cap never binds). Vectors re-attach to the deduped id-only
    * pair list by two narrow hash joins (the [[embeddingNearDupLsh]]
    * shape), then the codegen'd cosine verifies exactly.
    */
  def semanticDedup(
      embeddings: DataFrame, k: Int = 8, iters: Int = 2,
      threshold: Double = 0.45, clusterCap: Int = 65536): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val assigned = Embeddings.assignments(embeddings, k, iters)
      .select(col("vec_id"), col("cluster"))
    val cand = assigned.as[(Long, Int)]
      .groupByKey(_._2)
      .flatMapGroups { (_, rows) =>
        val lim = if (clusterCap == Int.MaxValue) Int.MaxValue else clusterCap + 1
        val ds = rows.map(_._1).take(lim).toArray
        if (ds.length > clusterCap) Iterator.empty
        else {
          java.util.Arrays.sort(ds)
          for {
            i <- ds.indices.iterator
            j <- (i + 1 until ds.length).iterator
          } yield (ds(i), ds(j))
        }
      }
      .toDF("i", "j")
    val emb = embeddings.select(col("vec_id"), col("embedding"))
    val dropped = cand
      .join(emb.select(col("vec_id").as("i"), col("embedding").as("emb_i")), Seq("i"))
      .join(emb.select(col("vec_id").as("j"), col("embedding").as("emb_j")), Seq("j"))
      .withColumn("cos", round(
        call_function("cosine_similarity", col("emb_i"), col("emb_j")), 6))
      .filter(col("cos") >= threshold)
      .select(col("j").as("vec_id"))
      .distinct()
      .withColumn("is_dup", lit(true))
    assigned
      .join(dropped, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cluster"),
        when(col("is_dup"), "drop").otherwise("keep").as("action"))
      .orderBy(col("vec_id"))
  }

  /** A corpus's embedding-space novelty index: the trained coarse quantizer
    * (Lloyd-refined centroids, [[Embeddings.fitCentroids]]) plus the corpus
    * vectors PACKED one-row-per-cell — (cell, members: array<struct<id,
    * emb>>), members sorted by id. The packed layout is what makes the
    * probe APPEND-SAFE on a stream: the stream-static join on cell yields
    * exactly one row per probed vector (no streaming aggregation, no
    * output-mode constraint), and the per-cell max-cosine is a row-local
    * higher-order fold — the bucket-array serving pattern of
    * `classifierModel`, applied to vectors.
    *
    * Scale: the index is O(corpus) overall but probed O(cell) per arrival;
    * size `k` so cells stay broadcastable (corpus/k vectors × dim floats),
    * and shard the static side past that (Spark plans a sort-merge
    * stream-static join; still append-safe). `cellCap` bounds a degenerate
    * cell: past the cap only the `cellCap` members NEAREST the centroid
    * (rounded cos desc, id asc — deterministic) are indexed, a documented
    * recall trade that keeps one packed row bounded — the clusterCap
    * precedent. Refresh contract: the quantizer is batch-fit and FROZEN
    * between refits (SCALE.md "centroid staleness").
    *
    * `sizeHintBytes` is the builder's estimate of the packed side
    * (Catalyst stats of the corpus' id+embedding projection — an
    * overestimate once `cellCap` binds, which errs toward the safe
    * fallback); -1 = unknown. The probe uses it to decide whether the
    * index may be broadcast — see [[semanticNoveltyProbe]].
    */
  case class SemanticIndex(
      centroids: Array[(Int, Array[Double], Double)], cells: DataFrame,
      sizeHintBytes: Long = -1L)

  def buildSemanticIndex(
      corpus: DataFrame, k: Int = 8, iters: Int = 2,
      cellCap: Int = 4096): SemanticIndex = {
    val centroids = Embeddings.fitCentroids(corpus, k, iters)
    // plan-stats estimate of what the packed cells weigh (vec_id +
    // embedding survive into `members`); no job is run for this
    val sizeHint = corpus.select(col("vec_id"), col("embedding"))
      .queryExecution.optimizedPlan.stats.sizeInBytes
      .min(BigInt(Long.MaxValue)).toLong
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("cos").desc, col("vec_id"))
    // the window's cluster shuffle is reused by the groupBy (same key) —
    // one exchange builds the whole index
    val cells = Embeddings.assignTo(corpus, centroids)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cellCap)
      .groupBy(col("cluster").as("cell"))
      .agg(sort_array(collect_list(struct(
        col("vec_id").as("id"), col("embedding").as("emb")))).as("members"))
    SemanticIndex(centroids, cells, sizeHint)
  }

  /** RETIRE vectors from a [[SemanticIndex]] — the novelty-gate half of
    * the forget cascade: explode the doomed ids' packed members out,
    * re-pack the survivors in the same sorted order, keep the FROZEN
    * centroids (the staleness contract — re-fitting is the next
    * refresh's job; unlike the graph's DRAWN quantizer these are k-means
    * MEANS — aggregates, not verbatim corpus rows — so freezing them
    * retains no forgotten embedding). Cells whose last member leaves drop entirely, so a
    * probe landing there reports `ok` exactly as against a rebuild.
    * Equals `assignTo(corpus \ doomed, same centroids)` re-packed
    * whenever no cell was cellCap-truncated at build time (a truncated
    * cell cannot resurrect members the cap dropped — it under-serves
    * candidates until the refresh, which only weakens dup-detection,
    * never the attestation: no doomed id survives in ANY cell,
    * unconditionally). One explode + an id anti-join + one re-pack —
    * work tracks the index size, and at scale the anti-join broadcasts
    * the tombstone batch.
    */
  def retireSemanticIndex(
      index: SemanticIndex, tombstones: DataFrame): SemanticIndex = {
    val doomed = tombstones.select(col("vec_id"))
    // only cells holding a doomed member explode and re-pack; the id-only
    // membership probe never unpacks embeddings, and untouched cells'
    // packed arrays pass through byte-identical (the knnGraphRetire /
    // GraphMaintainer.retire cost shape, applied to the packed layout)
    val touched = index.cells
      .select(col("cell"), explode(col("members.id")).as("vec_id"))
      .join(broadcast(doomed), Seq("vec_id"), "left_semi")
      .select(col("cell")).distinct()
    val repacked = index.cells
      .join(broadcast(touched), Seq("cell"), "left_semi")
      .select(col("cell"), explode(col("members")).as("m"))
      .join(broadcast(doomed), col("m.id") === col("vec_id"), "left_anti")
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(col("m"))).as("members"))
    val untouched = index.cells.join(broadcast(touched), Seq("cell"), "left_anti")
    SemanticIndex(index.centroids, untouched.unionByName(repacked),
      index.sizeHintBytes)
  }

  /** Probe a [[SemanticIndex]] with a batch OR STREAM of vectors: each
    * probe vector is routed to its nearest centroid (stateless kernel
    * pass, [[Embeddings.assignTo]]) and scored against the packed members
    * of that one cell — `duplicate_semantic` when the best rounded cosine
    * reaches `threshold`, else `ok`, with the best-matching corpus id as
    * evidence (ties to the LOWEST id via the negated-id struct max; a
    * vector landing in an unindexed cell has no candidates and is `ok`).
    * Every step is narrow or stream-static — no state, no watermark
    * needed; this is the embedding-space twin of `IngestGate.admitNovel`'s
    * digest anti-join, and the dedup a real pipeline runs at the gate
    * rather than after it.
    *
    * Broadcast is SIZE-AWARE, not forced: the hint is applied only when
    * the builder's `sizeHintBytes` fits the session's
    * `autoBroadcastJoinThreshold`. An oversized (or unknown-size) index
    * gets no hint, so Spark degrades to a sort-merge stream-static join —
    * still append-safe — instead of OOMing the driver on a 100×-corpus
    * index (the scaladoc contract above; fallback pinned by
    * PlanQualitySpec).
    */
  def semanticNoveltyProbe(
      vecs: DataFrame, index: SemanticIndex,
      threshold: Double = 0.45): DataFrame = {
    val spark = vecs.sparkSession
    graft.plans.GraftFunctions.register(spark)
    val bcastLimit = {
      val raw = spark.conf
        .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
      if (raw.startsWith("-")) -1L
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
    }
    val cellsSide =
      if (bcastLimit > 0 && index.sizeHintBytes >= 0 &&
          index.sizeHintBytes <= bcastLimit) broadcast(index.cells)
      else index.cells
    // one fused codegen'd loop over the packed cell per probe row — the
    // declarative twin (array_max ∘ transform ∘ cosine_similarity, with a
    // nanvl zero-norm guard) evaluates its lambda interpreted per member:
    // 12.7 s → 3.7 s on the 10k-probe StreamBench row (≥3.4×, measured
    // with a host-load headwind — controls in the same run were 2-3×
    // slower than the baseline run's). KernelParitySpec pins the
    // bit-level output equivalence of the two forms
    val best = call_function("cell_max_cosine", col("members"), col("embedding"))
    Embeddings.assignTo(vecs, index.centroids)
      .select(col("vec_id"), col("embedding"), col("cluster").as("cell"))
      .join(cellsSide, Seq("cell"), "left_outer")
      .withColumn("best", best)
      .select(
        col("vec_id"), col("cell"),
        col("best").getField("cos").as("max_cos"),
        col("best").getField("id").as("best_match"),
        when(col("best").getField("cos") >= threshold, "duplicate_semantic")
          .otherwise("ok").as("reason"))
  }

  /** Incremental SemDeDup — admit a NEW batch against the EXISTING corpus
    * in embedding space: build the corpus novelty index once, probe each
    * batch vector's cell (the admit-a-batch cost model of
    * [[incrementalExactDedup]]/[[incrementalMinhashDedup]], applied to
    * semantic near-dups — the batch is never self-joined and the corpus is
    * never rescanned per pair). Output one verdict row per batch vector.
    */
  def incrementalSemanticDedup(
      corpus: DataFrame, batch: DataFrame, threshold: Double = 0.45,
      k: Int = 8, iters: Int = 2, cellCap: Int = 4096): DataFrame =
    semanticNoveltyProbe(batch, buildSemanticIndex(corpus, k, iters, cellCap), threshold)
      .orderBy(col("vec_id"))
}
