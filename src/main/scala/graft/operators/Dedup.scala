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

  /** Exact dedup survivors — one doc_id per distinct text. */
  def dedupKeepFirst(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

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

  /** Exact n-gram Jaccard near-dup pairs, blocked by `lang` — the
    * exact-recall baseline the LSH variant trades against.
    *
    * Inverted-index formulation: explode to (shingle, doc) postings and join
    * postings on (shingle, lang) to count |A∩B| per pair — only pairs
    * sharing ≥1 shingle materialize (a pair with jaccard ≥ t > 0 always
    * does, so output equals the naive n² loop's). Cost is Σ_s df(s)² instead
    * of n²·|sh| — at scale, cap df(s) (drop boilerplate shingles) to bound
    * the skew; exact here since the corpus has no ultra-frequent shingles.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.6): DataFrame = {
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
        val ds = rows.map { case (id, _, sz, _) => (id, sz) }.toArray
        java.util.Arrays.sort(ds, Ordering.by((t: (Long, Int)) => t._1))
        for {
          i <- ds.indices.iterator
          j <- (i + 1 until ds.length).iterator
        } yield (ds(i)._1, ds(j)._1, ds(i)._2, ds(j)._2)
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

  /** SimHash near-dup pairs: 60-bit fingerprints banded into 4 15-bit
    * chunks; by pigeonhole, Hamming ≤ 3 ⇒ at least one identical chunk, so
    * the chunk-equality self-join is an EXACT blocking (no recall loss at
    * the ≤3 threshold). Verification uses the native
    * [[graft.plans.HammingDistance]] codegen expression.
    */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val fp = simhashFingerprints(docs)
    // one shuffle on the chunk key with in-group pair generation — a
    // chunk-equality self-join would run the fingerprint kernel once per side
    val chunked = fp.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        substring(col("simhash"), c * 15 + 1, 15)): _*)))
      .toDF("doc_id", "simhash", "chunk_idx", "chunk")
      .as[(Long, String, Int, String)]
    val cand = chunked
      .groupByKey { case (_, _, ci, c) => (ci, c) }
      .flatMapGroups { (_, rows) =>
        val ds = rows.map { case (id, sh, _, _) => (id, sh) }.toArray
        java.util.Arrays.sort(ds, Ordering.by((t: (Long, String)) => t._1))
        for {
          i <- ds.indices.iterator
          j <- (i + 1 until ds.length).iterator
        } yield (ds(i)._1, ds(j)._1, ds(i)._2, ds(j)._2)
      }
      .toDF("i", "j", "sh_i", "sh_j")
      .distinct() // a pair may collide in several chunks
    cand
      .withColumn("hamming", call_function("hamming_distance", col("sh_i"), col("sh_j")))
      .filter(col("hamming") <= maxHamming)
      .select(col("i"), col("j"), col("hamming"))
      .orderBy(col("i"), col("j"))
  }

  /** Near-duplicate CLUSTERS — connected components over the exact-Jaccard
    * pair graph, as iterative min-label propagation: every doc starts
    * labeled with its own id, then repeatedly takes the min label over
    * itself and its neighbors until a fixpoint. The fixpoint label is the
    * min doc_id reachable in the component — a canonical, deterministic
    * cluster id (the survivor a dedup pass would keep).
    *
    * Scale notes: each iteration is one join edges⋈labels + one min-agg +
    * one left join — all hash-partitioned on doc id, no driver-side graph.
    * Iteration count is bounded by component diameter (near-dup components
    * are quasi-cliques, so 2-3 rounds in practice); for adversarial
    * chain-shaped graphs the large-star/small-star variant (Kiveris et al.,
    * "Connected Components in MapReduce") halves diameter per round — same
    * join shapes, different edge rewriting. Labels are persisted per round
    * and the previous round unpersisted, so lineage stays O(1) deep.
    */
  def nearDupClusters(
      docs: DataFrame, threshold: Double = 0.6, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // materialize the pair graph ONCE before mirroring it — a union of two
    // branches of the same uncached plan would run the whole shingle +
    // posting pipeline twice
    val pairs = ngramJaccardPairs(docs, threshold).select(col("i"), col("j"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    pairs.count()
    val edges = pairs
      .union(pairs.select(col("j").as("i"), col("i").as("j")))
    // only vertices with degree >= 1 can ever change label — iterate over
    // that (much smaller) set; singletons join back at the end labeled by
    // their own id
    var persisted = edges.select(col("i").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = persisted
    labels.count()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nmin = edges
        .join(labels.select(col("doc_id").as("jid"), col("cluster_id")),
          col("j") === col("jid"))
        .groupBy(col("i")).agg(min(col("cluster_id")).as("nmin"))
      // carry the previous label so materialization and the convergence
      // check are ONE action per round, not two
      val next = labels
        .join(nmin, labels("doc_id") === nmin("i"), "left_outer")
        .select(labels("doc_id"),
          least(labels("cluster_id"), coalesce(col("nmin"), labels("cluster_id")))
            .as("cluster_id"),
          labels("cluster_id").as("prev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // count(), not isEmpty: isEmpty is a limit-1 job that materializes only
      // the first changed partition, so unpersisting the previous round would
      // force an O(rounds²) recompute cascade; count scans (and caches) all
      // of `next` in the same single action as the convergence check
      done = next.filter(col("cluster_id") =!= col("prev")).count() == 0
      persisted.unpersist()
      persisted = next
      labels = next.select(col("doc_id"), col("cluster_id"))
      iter += 1
    }
    // min-label propagation converges in <= diameter rounds; hitting the cap
    // means the result is NOT the fixpoint the oracle computes — fail loudly
    // rather than return silently-wrong clusters
    require(done, s"nearDupClusters did not converge within $maxIter rounds " +
      "(component diameter exceeds maxIter); raise maxIter")
    pairs.unpersist()
    docs.select(col("doc_id"))
      .join(labels.select(col("doc_id"), col("cluster_id").as("comp")),
        Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("cluster_id"))
      .orderBy(col("doc_id"))
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
    graft.plans.GraftFunctions.register(embeddings.sparkSession)
    val planes = SimilaritySearch.planeSigns(bands * bandBits, dim)
    val bucketCols = (0 until bands).map { b =>
      SimilaritySearch.lshBucket(
        col("embedding"), planes.slice(b * bandBits, (b + 1) * bandBits))
    }
    val bucketed = embeddings
      .select(col("vec_id"), col("embedding"), posexplode(array(bucketCols: _*)))
      .toDF("vec_id", "embedding", "band", "bucket")
    val left = bucketed.toDF("i", "emb_i", "band", "bucket")
    val right = bucketed.toDF("j", "emb_j", "band", "bucket")
    left.join(right, Seq("band", "bucket"))
      .filter(col("i") < col("j"))
      // emb_i/emb_j are functionally determined by (i,j): any surviving row
      // carries the same vectors, so subset-dropDuplicates is sound
      .dropDuplicates("i", "j")
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
            (id, jd, SimilaritySearch.round6(
              SimilaritySearch.dotKernel(e, v) / (ne * nv)))
          }
          .filter(_._3 >= threshold)
      }
    }.toDF("i", "j", "cos").orderBy(col("i"), col("j"))
  }
}
