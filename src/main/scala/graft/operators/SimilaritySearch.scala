package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Scale design (100 TB): brute-force top-k is the exactness baseline — a
  * broadcast of the (small) query set against a full scan of the corpus, no
  * shuffle until the per-query top-k (TakeOrdered per partition, k·P rows to
  * the final heap). The LSH variant prunes the scan to one hash bucket per
  * query: bucket assignment is a narrow codegen'd projection, the join is a
  * hash-partitioned equi-join on bucket id, and recall/cost is tuned by the
  * plane count. An IVF layout (k-means coarse quantizer) would replace the
  * random planes with learned centroids — same join shape.
  */
object SimilaritySearch {

  /** Cosine similarity in double precision, summed index-ascending — the
    * exact arithmetic DuckDB's list_sum(list_transform(...)) performs, so
    * results are bit-identical across engines.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Element-wise dot via higher-order functions — works for any dimension. */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** JVM-side twins of the column math for mapPartitions kernels — identical
    * index-ascending summation, so results match the SQL forms bit-for-bit.
    */
  def dotKernel(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  def l2NormKernel(a: Array[Double]): Double = math.sqrt(dotKernel(a, a))

  /** HALF_UP 6-decimal rounding — the arithmetic of Spark's `round(x, 6)`. */
  def round6(x: Double): Double =
    new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Rounded cosine from a precomputed dot and the two norms, zero-norm
    * safe: a zero vector has no direction, so its similarity to anything is
    * pinned to −1.0 (maximally distant — it can never win an argmax or pass
    * a ≥ τ gate) instead of the 0/0 NaN that would throw from [[round6]]'s
    * BigDecimal constructor mid-job. All JVM cosine kernels route through
    * this; the Column/codegen paths propagate NaN harmlessly and filter it
    * out at their `>= τ` / rank predicates.
    */
  def safeCos(dot: Double, na: Double, nb: Double): Double = {
    val denom = na * nb
    if (denom == 0.0) -1.0 else round6(dot / denom)
  }

  /** Brute-force cosine top-k: for each query vector (from `queries`), the k
    * nearest corpus vectors. Ranking uses the ROUNDED similarity (ties broken
    * by neighbor id) so ordering is reproducible across engines.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int = 10, dim: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // query side broadcast as a primitive matrix; scoring is a tight JVM
    // loop per corpus row (Catalyst row overhead per pair would dominate a
    // 64-flop kernel). The per-query top-k stays declarative: row_number
    // compiles to one shuffle on query_id over k·P pre-filtered rows.
    val qMat = spark.sparkContext.broadcast(
      queries.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
        .collect().sortBy(_._1)
        .map { case (id, f) => val d = f.map(_.toDouble); (id, d, l2NormKernel(d)) })
    val scored = Par.spread(corpus.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = qMat.value
        it.flatMap { case (nid, f) =>
          val e = f.map(_.toDouble)
          val ne = l2NormKernel(e)
          qs.iterator.filter(_._1 != nid).map { case (qid, qv, qn) =>
            (qid, nid, safeCos(dotKernel(qv, e), qn, ne))
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Matryoshka (MRL) truncated-prefix ANN tier — the serving shortcut a
    * matryoshka-trained embedding model buys (Kusupati et al. 2022): the
    * first `dPrefix` dimensions carry a coarse-but-faithful similarity, so
    * the shortlist scores at dPrefix/dim of the full flop cost (and a lake
    * that lands the prefix as its own column cuts the shortlist scan's
    * BYTES by the same factor) and only the O(|q|·
    * shortlist) survivors pay full-width exact cosines in the re-rank.
    * Same two-stage shape as PQ+rerank — prefix slicing simply replaces
    * codebook quantization as the compressor — and like every tier here
    * it is deterministic end to end (rounded cos, id ties) and measured
    * against the brute twin in [[annRecallAudit]].
    */
  def mrlTopK(
      corpus: DataFrame, queries: DataFrame, k: Int = 5, dPrefix: Int = 16,
      shortlist: Int = 20): DataFrame = {
    val spark = corpus.sparkSession
    graft.plans.GraftFunctions.register(spark)
    def prefix(df: DataFrame): DataFrame = df.select(
      col("vec_id"), slice(col("embedding"), 1, dPrefix).as("embedding"))
    val short = bruteForceTopK(prefix(corpus), prefix(queries), shortlist, dPrefix)
      .select(col("query_id"), col("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
      .join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(queries.select(
        col("vec_id").as("query_id"), col("embedding").as("q_emb"))),
        Seq("query_id"))
      .withColumn("cos", round(
        call_function("cosine_similarity", col("q_emb"), col("n_emb")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic random-hyperplane signs: component i of plane p is
    * ±1 from bit 0 of md5("p:i") — reproducible in any engine with md5.
    */
  def planeSigns(numPlanes: Int, dim: Int): Seq[Seq[Int]] = {
    val mdf = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { p =>
      (1 to dim).map { i =>
        val hex = mdf.digest(s"$p:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 1) 1 else -1
      }
    }
  }

  /** IVF (inverted-file) approximate top-k — the learned-quantizer scale
    * path: corpus vectors are assigned to the nearest of a small centroid
    * set, queries probe only their own cell. Centroids are a FIXED-k
    * deterministic corpus sample — the `nCentroids` vectors with the
    * smallest md5(vec_id) (a replayable uniform draw, reproducible in the
    * oracle) — standing in for k-means means; a trained quantizer drops in
    * by replacing the centroid frame. Selection compiles to
    * TakeOrderedAndProject (per-partition top-k, O(k) rows to the driver),
    * so the broadcast is O(k) NO MATTER the corpus size — unlike a
    * `vec_id % m` sample, whose centroid count (and broadcast) grows
    * linearly with the corpus. Assignment is a broadcast-matrix kernel
    * (argmax over centroids, ties to the lowest centroid id on the rounded
    * cosine); the probe is a hash equi-join on cell id.
    */
  /** The coarse quantizer's centroid set: the nCentroids corpus vectors with
    * the smallest md5(vec_id) — a replayable uniform draw. orderBy+limit
    * compiles to TakeOrderedAndProject, so only O(k) rows ever reach the
    * driver regardless of corpus size (asserted by SimilaritySpec).
    */
  def ivfCentroids(corpus: DataFrame, nCentroids: Int): Array[(Long, Array[Double], Double)] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCentroids)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
      .map { case (id, f) => val d = f.map(_.toDouble); (id, d, l2NormKernel(d)) }
  }

  /** UNSIZED draw, phase one: the `maxN` smallest-md5 candidate vec_ids
    * PLUS the corpus row count, measured on the same TakeOrderedAndProject
    * scan (a `Dataset.observe` count aggregate rides it — every row
    * crosses the CollectMetrics node below each partition's top-k heap
    * exactly once, so no full-width corpus pass is paid purely to size
    * the quantizer: the cost the 100 TB entry point must not pay, and
    * `count()` on an arbitrary — filtered, joined — corpus frame is not
    * metadata-answerable the way a bare parquet count is; observed
    * metrics are exactly-once by construction, unlike an accumulator
    * under speculative retries, and the scan stays codegen'd instead of
    * paying a typed `.map`'s per-row deserialization). IDS ONLY: the
    * heaps and the driver collect carry (id, md5) pairs (~24 B each, a
    * few MB at the 131072 clamp), never embeddings — a clamp-max heap of
    * full vectors would cost O(maxN·dim) per task and a multi-GB driver
    * collect at realistic dims. The (md5, vec_id) order gives the PREFIX
    * property: the first m ids ARE [[ivfCentroids]](corpus, m)'s draw,
    * so the caller sizes AFTER the pass, keeps a prefix, and fetches
    * just those ids' embeddings via [[fetchCentroids]] (a broadcast
    * semi-join — the same fetch work the sized draw's own scan does, on
    * a column-pruned second pass).
    */
  private[graft] def ivfCandidateIdsWithCount(
      corpus: DataFrame, maxN: Int): (Array[Long], Long) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val obs = new org.apache.spark.sql.Observation("graft.ivfCorpusSize")
    val ids = corpus
      .select(col("vec_id"))
      .observe(obs, count(lit(1)).as("n"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(maxN)
      .select(col("vec_id")).as[Long]
      .collect()
    (ids, obs.get("n").asInstanceOf[Long]) // get blocks until the collect's metrics land
  }

  /** UNSIZED draw, phase two: the chosen centroid ids' embeddings, by
    * broadcast semi-join (O(|ids|) broadcast, column-pruned scan).
    * Returns [[ivfCentroids]]' exact shape and order (sorted by vec_id),
    * so `fetchCentroids(corpus, ivfCandidateIdsWithCount(corpus, maxN)
    * ._1.take(m))` is bit-equal to `ivfCentroids(corpus, m)`.
    */
  private[graft] def fetchCentroids(
      corpus: DataFrame, ids: Array[Long]): Array[(Long, Array[Double], Double)] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val out = corpus
      .join(broadcast(ids.toSeq.toDF("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
      .map { case (id, f) => val d = f.map(_.toDouble); (id, d, l2NormKernel(d)) }
    // the two-scan draw trusts the corpus frame to be scan-stable and
    // vec_id-unique; a frame that changed between the scans (or carries
    // duplicate ids) would otherwise land a silently mis-sized/mis-drawn
    // quantizer — fail loud instead
    require(out.length == ids.length,
      s"SimilaritySearch.fetchCentroids: asked for ${ids.length} centroid " +
        s"ids but the corpus returned ${out.length} rows — the corpus frame " +
        "changed between the draw and the fetch, or vec_ids are not unique; " +
        "the unsized draw requires a scan-stable, unique-id corpus")
    out
  }

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      k: Int = 5, nCentroids: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val centroids = spark.sparkContext.broadcast(ivfCentroids(corpus, nCentroids))

    def assigned(df: DataFrame): DataFrame =
      Par.spread(df.select(col("vec_id"), col("embedding"))).as[(Long, Array[Float])]
        .mapPartitions { it =>
          val cs = centroids.value
          it.map { case (id, f) =>
            val e = f.map(_.toDouble)
            val ne = l2NormKernel(e)
            var bestId = -1L; var best = Double.NegativeInfinity
            cs.foreach { case (cid, cv, cn) =>
              val cos = safeCos(dotKernel(e, cv), ne, cn)
              if (cos > best) { best = cos; bestId = cid } // ascending ids: first wins ties
            }
            (id, f, bestId)
          }
        }.toDF("vec_id", "embedding", "cell")

    val corpusCells = assigned(corpus)
    val queryCells = assigned(queries).select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpusCells
      .join(broadcast(queryCells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("q_emb"), col("embedding"))
      // native codegen'd expression — identical index-ascending double
      // arithmetic to the HOF composition (KernelParitySpec pins this)
      .withColumn("cos", round(
        call_function("cosine_similarity", col("q_emb"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** [[ivfTopK]] with a TRAINED coarse quantizer — the documented drop-in:
    * cells are the Lloyd-refined k-means centroids
    * ([[Embeddings.fitCentroids]]) instead of the raw smallest-md5 corpus
    * draw, so cell populations track the embedding distribution's density
    * (balanced probe costs) rather than sampling luck. Same plan shape:
    * O(k·dim) centroid broadcast, one narrow assignment kernel per side,
    * a hash equi-join on cell id, per-query top-k. The k-means fit adds
    * `iters` driver-coordinated passes over the corpus — the one-time
    * index-build cost every IVF system pays.
    */
  def ivfTopKKmeans(
      corpus: DataFrame, queries: DataFrame,
      k: Int = 5, nCentroids: Int = 16, iters: Int = 2): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val centroids = Embeddings.fitCentroids(corpus, nCentroids, iters)
    val corpusCells = Embeddings.assignTo(corpus, centroids)
      .select(col("vec_id"), col("embedding"), col("cluster").as("cell"))
    val queryCells = Embeddings.assignTo(queries, centroids)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("cluster").as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpusCells
      .join(broadcast(queryCells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("q_emb"), col("embedding"))
      .withColumn("cos", round(
        call_function("cosine_similarity", col("q_emb"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Recall@k audit of every approximate index against the brute-force
    * twin — the index-QA query a pipeline runs at each index refresh, and
    * the quantitative teeth behind the centroid-staleness contract
    * (SCALE.md): refit the quantizer, run the audit, and a recall drop IS
    * the drift signal. One row per method: how many of the exact top-k
    * neighbors (ties and rounding identical to [[bruteForceTopK]]) the
    * approximate index reproduced, as an exact fraction over deterministic
    * ids — fully oracle-replayable.
    *
    * Plan shape: the truth set is one brute scan (k·|queries| rows,
    * broadcast to mark hits); each method contributes its own probe plan
    * unchanged. The audit is O(sum of the probes it audits) — the cost of
    * measuring an index is the cost of using it, paid per refresh, not per
    * query. Aggregation is a tiny per-method groupBy; nothing leaves the
    * executors except the k·|queries|-row frames already inherent to top-k.
    */
  def annRecallAudit(
      corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nCentroids: Int = 16, numPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val truth = bruteForceTopK(corpus, queries, k, dim)
      .select(col("query_id"), col("neighbor_id"))
    // each tier's DataFrame construction runs its own driver-side index
    // fit (PQ codebooks, k-means iterations, SQ stats — collect()-based
    // jobs that fire BEFORE any downstream stage); built sequentially
    // they serialize ~11 fits head-to-tail, so construct the tiers
    // concurrently and let the scheduler overlap the fit jobs (§2.6).
    // The assembled audit plan — and therefore the result — is identical:
    // only the construction-time fits move in time, and each builder
    // touches no shared mutable state (function registration is
    // idempotent behind the registry's own lock)
    val methodFns: Seq[(String, () => DataFrame)] = Seq(
      "ivf" -> (() => ivfTopK(corpus, queries, k, nCentroids)),
      "ivf_kmeans" -> (() => ivfTopKKmeans(corpus, queries, k, nCentroids)),
      "ivf_pq" -> (() => Pq.ivfPqTopK(corpus, queries, k, nCentroids)),
      "ivf_pq_rerank" ->
        (() => Pq.ivfPqTopKRerank(corpus, queries, k, 20, nCentroids)),
      "ivf_pq_mp" -> (() => Pq.ivfPqTopKRerank(corpus, queries, k, 20,
        nCentroids, nprobe = 4)),
      "lsh" -> (() => lshTopK(corpus, queries, numPlanes, dim, k)),
      "lsh_mp" -> (() => lshMultiProbeTopK(corpus, queries, numPlanes, dim, k)),
      "mrl" -> (() => mrlTopK(corpus, queries, k)),
      "pq" -> (() => Pq.pqTopK(corpus, queries, k)),
      "pq_rerank" -> (() => Pq.pqTopKRerank(corpus, queries, k, 20)),
      "sq8" -> (() => Sq.sq8TopK(corpus, queries, k)))
    val methods = methodFns.map(_._1).zip(Par.joinAll(methodFns.map(_._2)))
    val tagged = methods.map { case (m, df) =>
      df.select(lit(m).as("method"), col("query_id"), col("neighbor_id"))
    }.reduce(_.unionByName(_))
    val truthN = truth.agg(count(lit(1)).as("truth_n"))
    tagged
      .join(broadcast(truth.withColumn("hit", lit(1L))),
        Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy(col("method"))
      .agg(
        countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("returned"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .crossJoin(broadcast(truthN))
      .withColumn("recall",
        round(col("hits").cast("double") / col("truth_n"), 6))
      .select(col("method"), col("n_queries"), col("returned"),
        col("hits"), col("truth_n"), col("recall"))
      .orderBy(col("method"))
  }

  /** Position-aware retrieval-quality metrics of a served ranking against
    * the exact one — the numbers an index refresh publishes next to
    * recall ([[annRecallAudit]] counts set membership; these weigh WHERE
    * the hits landed). Per query:
    *   - `hits`: |served ∩ truth| within the top k (recall's numerator);
    *   - `mrr`: 1/rank of the FIRST served hit (0 when none) — the
    *     single-answer serving metric;
    *   - `ndcg`: DCG/IDCG with graded relevance rel = k+1−truth_rank
    *     (the exact top-1 is worth k, the exact k-th is worth 1, misses
    *     0), so a tier that returns the right set in the wrong order
    *     scores below one — exactly what recall cannot see.
    * Both inputs are (query_id, neighbor_id, rank) shortlists. Numeric
    * policy: every DCG term is 6-dp-rounded then summed as DECIMAL (the
    * repo's order-independent-sum contract), IDCG is the same arithmetic
    * over the ideal ranking, so the oracle reproduces the numbers
    * bit-for-bit. One k-bounded join + one k-bounded aggregate per
    * query: cost is O(|queries|·k), independent of corpus size.
    */
  def rankingMetrics(
      truth: DataFrame, served: DataFrame, k: Int = 5): DataFrame = {
    val t = truth.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("t_rank"))
    val s = served.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("s_rank"))
    val idcg = (1 to k).map { i =>
      BigDecimal((k + 1 - i).toDouble / (math.log(i + 1.0) / math.log(2.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    s.join(t, Seq("query_id", "neighbor_id"), "left_outer")
      .withColumn("rel",
        coalesce(lit(k + 1) - col("t_rank"), lit(0)).cast("double"))
      .withColumn("dcg_term",
        round(col("rel") / log2(col("s_rank").cast("double") + 1.0), 6)
          .cast("decimal(18,6)"))
      .groupBy(col("query_id"))
      .agg(
        sum(when(col("t_rank").isNotNull, 1L).otherwise(0L)).as("hits"),
        round(coalesce(
          lit(1.0) / min(when(col("t_rank").isNotNull, col("s_rank"))),
          lit(0.0)), 6).as("mrr"),
        round(sum(col("dcg_term")).cast("double") / lit(idcg.toDouble), 6)
          .as("ndcg"))
      .orderBy(col("query_id"))
  }

  /** Bucket id = bit string of hyperplane-side signs (dot(v, plane) > 0). */
  def lshBucket(emb: Column, planes: Seq[Seq[Int]]): Column =
    concat(planes.map { plane =>
      val signs = typedlit(plane.map(_.toDouble))
      val dotP = aggregate(
        zip_with(emb, signs, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
      when(dotP > 0, "1").otherwise("0")
    }: _*)

  /** LSH-bucketed approximate top-k: candidates share the query's bucket.
    * Exact-deterministic candidate set ⇒ oracle-reproducible, including its
    * recall loss vs bruteForceTopK (measured in SimilaritySpec).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      numPlanes: Int = 4, dim: Int = 64, k: Int = 5): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val planes = planeSigns(numPlanes, dim)
    val bucketed = corpus.select(
      col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), planes).as("bucket"))
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      lshBucket(col("embedding"), planes).as("q_bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    bucketed
      .join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("q_emb"), col("embedding"))
      // native codegen'd expression — same index-ascending double arithmetic
      // as the HOF composition and the oracle (see CosineSimilarity)
      .withColumn("cos", round(
        call_function("cosine_similarity", col("q_emb"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Flip bit `p` (1-based) of an n-char sign-bucket string. */
  private def flipAt(b: Column, p: Int, n: Int): Column =
    concat(substring(b, 1, p - 1),
      when(substring(b, p, 1) === "1", lit("0")).otherwise(lit("1")),
      substring(b, p + 1, n - p))

  /** MULTI-PROBE LSH top-k (Lv et al. 2007): the query probes its own
    * bucket AND every 1-bit-flip neighbor bucket — a vector whose true
    * neighbors straddle one hyperplane (the dominant LSH failure mode:
    * a near-zero margin on a single plane flips the bit) is recovered
    * without adding hash tables. With `numPlanes` planes the probe set is
    * `numPlanes + 1` of the `2^numPlanes` buckets, so candidate volume
    * rises ~(p+1)/2^p-fold while recall jumps (q_ann_recall now measures
    * both tiers side by side — same corpus, same planes, only the probe
    * set differs).
    *
    * Plan shape: identical to [[lshTopK]] — the query side explodes to
    * its probe buckets BEFORE the broadcast, so the corpus side still
    * partitions by its single stored bucket and the join fans each probe
    * to one bucket's members. Candidate sets stay exact-deterministic
    * (bit flips are string surgery on the md5-derived bucket), so the
    * oracle reproduces them including the recall gap.
    */
  def lshMultiProbeTopK(
      corpus: DataFrame, queries: DataFrame,
      numPlanes: Int = 4, dim: Int = 64, k: Int = 5): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val planes = planeSigns(numPlanes, dim)
    val bucketed = corpus.select(
      col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), planes).as("bucket"))
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      lshBucket(col("embedding"), planes).as("q_bucket"))
    val probeCols = col("q_bucket") +:
      (1 to numPlanes).map(p => flipAt(col("q_bucket"), p, numPlanes))
    val probes = q.select(col("query_id"), col("q_emb"),
      explode(array(probeCols: _*)).as("probe"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    bucketed
      .join(broadcast(probes),
        col("bucket") === col("probe") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("q_emb"), col("embedding"))
      .withColumn("cos", round(
        call_function("cosine_similarity", col("q_emb"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Cell-blocked k-nearest-neighbor GRAPH over the whole corpus — every
    * vector gets its k nearest neighbors, not just a small query set. The
    * kNN graph is the build artifact behind graph-based ANN serving (NSW
    * search walks it), graph-clustering dedup, and label-propagation — a
    * per-refresh batch product, like the IVF index itself.
    *
    * An exact graph is an O(n²) all-pairs scan; the scalable form blocks
    * by the same deterministic IVF coarse quantizer the probe path uses
    * ([[ivfCentroids]]): neighbor candidates are the members of each
    * vector's own cell, so total work is Σ|cell|² — the corpus size bounds
    * nothing, the quantizer granularity does (SemDeDup's argument, applied
    * to graph construction; [[Embeddings.clusterQuality]] is the k-sizing
    * signal that keeps cells bounded). Recall loss vs the exact graph is
    * measurable the same way [[annRecallAudit]] measures the probe tiers.
    *
    * Plan shape: ONE assignment pass (the narrow (vec_id, embedding, cell)
    * frame is localCheckpoint'ed — the same materialize-once trade as the
    * CC fixpoint; on a cluster this is the lake landing of the cell
    * assignment), then a self-equi-join on cell id — both sides hash-
    * partition on `cell`, no broadcast (both sides ARE the corpus), the
    * verify kernel is the fused codegen'd cosine, and the per-vector top-k
    * is one window over cell-local candidates. At 100 TB: one shuffle of
    * the corpus by cell, quadratic work bounded per cell, k·n rows out.
    */
  def knnGraph(corpus: DataFrame, k: Int = 5, nCentroids: Int = 16,
      quantizerSource: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    graft.plans.GraftFunctions.register(spark)
    val centroids = spark.sparkContext.broadcast(
      ivfCentroids(quantizerSource.getOrElse(corpus), nCentroids))
    val cells = cellAssign(corpus, centroids).localCheckpoint()
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cellEdges(cells, cells)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** Narrow kernel pass: route every vector to its nearest centroid —
    * (vec_id, embedding, cell). Shared by the graph build and its
    * incremental maintenance so both sides see bit-identical routing.
    * Package-visible: [[graft.streaming.GraphMaintainer]] persists this
    * routing as a lake artifact (partitioned by cell) so folds never
    * re-assign the stored corpus.
    */
  private[graft] def cellAssign(df: DataFrame,
      centroids: org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Double], Double)]])
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Par.spread(df.select(col("vec_id"), col("embedding"))).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = centroids.value
        it.map { case (id, f) =>
          val e = f.map(_.toDouble)
          val ne = l2NormKernel(e)
          var bestId = -1L; var best = Double.NegativeInfinity
          cs.foreach { case (cid, cv, cn) =>
            val cos = safeCos(dotKernel(e, cv), ne, cn)
            if (cos > best) { best = cos; bestId = cid } // ascending ids: first wins ties
          }
          (id, f, bestId)
        }
      }.toDF("vec_id", "embedding", "cell")
  }

  /** Scored same-cell edges src→dst (self-free): the shared candidate
    * generator of [[knnGraph]] and [[knnGraphIncrement]]. The `WithCell`
    * form keeps the (shared) cell id on each edge — the partition key the
    * maintainer's lake-landed graph artifact prunes folds by.
    */
  private[graft] def cellEdgesWithCell(src: DataFrame, dst: DataFrame): DataFrame =
    src.as("a")
      .join(dst.as("b"), col("a.cell") === col("b.cell")
        && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"),
        col("a.cell").as("cell"),
        col("a.embedding").as("v_emb"), col("b.embedding").as("n_emb"))
      .withColumn("cos", round(
        call_function("cosine_similarity", col("v_emb"), col("n_emb")), 6))
      .select(col("vec_id"), col("neighbor_id"), col("cell"), col("cos"))

  private def cellEdges(src: DataFrame, dst: DataFrame): DataFrame =
    cellEdgesWithCell(src, dst).drop("cell")

  /** Incremental graph maintenance — fold a vector batch into an existing
    * [[knnGraph]] WITHOUT rebuilding it: the quantizer stays FROZEN (the
    * staleness contract's refresh boundary), arriving vectors route to
    * their cells, and only the edges a batch can possibly change are
    * generated — (anyone, batch-member) pairs in the direct role and
    * (batch-member, old-member) in the reverse. Merging those with the old
    * edge list and re-taking top-k per vertex is EXACT: an old cell-mate
    * outside a vertex's old top-k can never enter the new top-k (scores
    * are immutable; the batch only adds candidates), so
    * `knnGraphIncrement(knnGraph(old), old, batch) ==
    * knnGraph(old ∪ batch, quantizerSource = old)` — the merge==rebuild
    * invariant, spec-pinned like the boilerplate index's.
    *
    * Cost model at 100 TB: per-batch work is |batch| × mean-cell-size
    * scored pairs plus a re-rank restricted to the vertices of the
    * batch's TOUCHED cells — a vertex in an untouched cell gets no fresh
    * candidate, so its stored top-k passes through byte-identical and
    * never re-sorts. The corpus contributes its stored cell assignment
    * (here recomputed; [[graft.streaming.GraphMaintainer]] reads the
    * lake-landed, cell-partitioned routing so only touched partitions are
    * even scanned) and the touched slice of its k·n edge list. The batch
    * side broadcasts into both candidate joins.
    *
    * Append-only contract (fail-loud): a batch vec_id already present in
    * the stored corpus is an update/re-embed — the old graph's stale
    * edges for it would survive the merge and silently break
    * merge==rebuild, so overlapping ids throw instead. Route updates
    * through a rebuild (or the maintainer, which distinguishes replayed
    * batches from true updates by comparing the stored embedding).
    */
  def knnGraphIncrement(
      oldGraph: DataFrame, corpus: DataFrame, batch: DataFrame,
      k: Int = 5, nCentroids: Int = 16,
      quantizerSource: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    graft.plans.GraftFunctions.register(spark)
    // chained folds must pin the quantizer to the REFRESH-TIME corpus —
    // letting the draw drift with each accumulated batch would re-route
    // old vertices and break the merge==rebuild argument mid-epoch
    val centroids = spark.sparkContext.broadcast(
      ivfCentroids(quantizerSource.getOrElse(corpus), nCentroids))
    val batchCells = cellAssign(batch, centroids).localCheckpoint()
    val touchedCells = batchCells.select(col("cell")).distinct()
    // append-only guard: id overlap needs ONLY the corpus's vec_id column
    // — a column-pruned id scan (stats + dictionary pages, no embedding
    // bytes), never a materialization
    val dup = batchCells.select(col("vec_id"))
      .join(corpus.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .limit(5).collect().map(_.getLong(0))
    require(dup.isEmpty,
      s"knnGraphIncrement: batch vec_ids already in the stored corpus " +
        s"(e.g. ${dup.mkString(", ")}) — updates/re-embeds break the " +
        "merge==rebuild invariant; rebuild the graph or fold through " +
        "GraphMaintainer instead")
    // only members of touched cells can gain/lose an edge — and only THAT
    // slice gets pinned: the checkpoint holds O(touched-cell) rows with
    // embeddings, shared by the two candidate joins below, never the full
    // corpus assignment (a per-fold O(corpus) materialization is a
    // scale-killer in a maintenance path; sharing one full-corpus scan
    // between the guard and this slice was a false economy)
    val oldTouched = cellAssign(corpus, centroids)
      .join(broadcast(touchedCells), Seq("cell"), "left_semi")
      .select(col("vec_id"), col("embedding"), col("cell"))
      .localCheckpoint()
    val fresh = cellEdges(oldTouched.union(batchCells), broadcast(batchCells))
      .union(cellEdges(broadcast(batchCells), oldTouched))
    val touchedIds = oldTouched.select(col("vec_id"))
      .union(batchCells.select(col("vec_id")))
    val untouched = oldGraph
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"))
      .join(touchedIds, Seq("vec_id"), "left_anti")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val reranked = oldGraph
      .join(touchedIds, Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("neighbor_id"), col("cos"))
      .union(fresh)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"))
    untouched.unionByName(reranked)
      .orderBy(col("vec_id"), col("rank"))
  }

  /** RETIRE vectors from an existing [[knnGraph]] — the index half of
    * right-to-be-forgotten, completing the cascade
    * ([[graft.operators.Governance.forgetCascade]] lists the artifacts,
    * [[graft.sources.LakeTable.applyTombstones]] deletes the table rows,
    * this removes the vectors from the serving graph) WITHOUT a rebuild.
    * The quantizer stays FROZEN, so cell routing is unchanged and every
    * edge is same-cell: only the DOOMED vectors' cells can lose an edge.
    * Survivors of those touched cells re-score their whole cell (a
    * deleted neighbor in a stored top-k needs replacements from below
    * the stored horizon, which the k-row graph does not carry);
    * every vertex in an untouched cell passes its stored rows through
    * byte-identical, and the deleted vertices' own rows drop. Exact:
    * `knnGraphRetire(knnGraph(corpus), corpus, doomed) ==
    * knnGraph(corpus \ doomed, quantizerSource = corpus)` — the
    * retire==rebuild invariant, spec-pinned like merge==rebuild.
    *
    * Cost: the re-scores and the pinned slice track the deletion's cell
    * footprint (Σ|touched cell|² pairs, O(touched) embeddings) — but the
    * routing itself re-assigns the corpus here, exactly like
    * [[knnGraphIncrement]] ("here recomputed"); the streaming twin
    * ([[graft.streaming.GraphMaintainer.retire]]) reads the lake-landed,
    * cell-partitioned routing instead, so only touched partitions are
    * even scanned — use it when the artifact exists.
    *
    * `corpus` must be the corpus THE GRAPH WAS BUILT OVER — run retire
    * BEFORE (or from a time-travel read of) the table delete. A doomed
    * id still present in the graph but missing from `corpus` fails loud:
    * silently returning the old graph would be a false forget
    * attestation. Ids in neither (never ingested) are no-ops.
    */
  def knnGraphRetire(
      oldGraph: DataFrame, corpus: DataFrame, tombstones: DataFrame,
      k: Int = 5, nCentroids: Int = 16,
      quantizerSource: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    graft.plans.GraftFunctions.register(spark)
    val centroids = spark.sparkContext.broadcast(
      ivfCentroids(quantizerSource.getOrElse(corpus), nCentroids))
    val doomed = tombstones.select(col("vec_id"))
    val orphans = oldGraph.select(col("vec_id"))
      .join(broadcast(doomed), Seq("vec_id"), "left_semi")
      .join(corpus.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .limit(5).collect().map(_.getLong(0))
    require(orphans.isEmpty,
      s"knnGraphRetire: doomed vec_ids ${orphans.mkString(", ")} are in the " +
        "graph but not in `corpus` — pass the corpus the graph was built " +
        "over (retire before the table delete, or read the pre-delete " +
        "version); a silent no-op here would falsely attest the forget")
    val touchedCells = cellAssign(
      corpus.join(broadcast(doomed), Seq("vec_id"), "left_semi"), centroids)
      .select(col("cell")).distinct()
    // every member of a touched cell (doomed included) leaves the
    // pass-through set; survivors re-score their cell exactly
    val touchedMembers = cellAssign(corpus, centroids)
      .join(broadcast(touchedCells), Seq("cell"), "left_semi")
      .localCheckpoint()
    val survivors = touchedMembers
      .join(broadcast(doomed), Seq("vec_id"), "left_anti")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val repaired = cellEdges(survivors, survivors)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"))
    val untouched = oldGraph
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"))
      .join(touchedMembers.select(col("vec_id")), Seq("vec_id"), "left_anti")
    untouched.unionByName(repaired)
      .orderBy(col("vec_id"), col("rank"))
  }

  /** Label propagation over the [[knnGraph]] — the weak-supervision move a
    * training-data pipeline uses to stretch a small labeled seed set
    * (human-rated quality, domain tags, license classes) across the whole
    * corpus: each round, every still-unlabeled vertex whose kNN list
    * touches labeled vertices takes the label with the highest
    * cosine-weighted vote (votes are the ×10⁶-integer edge weights, so
    * sums are exact; ties go to the smallest label). Seeds and
    * already-assigned labels are immutable, so the fixpoint is monotone
    * and every row records the round it was assigned in — the confidence
    * proxy (round 1 = a labeled direct neighbor; later = hearsay).
    *
    * Scale shape: per round, one join of the k·n edge list against the
    * label table (hash on neighbor_id), an anti-join to restrict targets
    * to unlabeled vertices, one (vertex, label) vote aggregation, one
    * argmax window. Labels accumulate via localCheckpoint (the CC-fixpoint
    * lineage trade). Work per round is O(edges touching labeled nodes) —
    * never corpus²; `rounds` is a small constant (label radius), not a
    * convergence loop.
    */
  def labelPropagate(
      corpus: DataFrame, seeds: DataFrame, rounds: Int = 2,
      k: Int = 5, nCentroids: Int = 16): DataFrame =
    labelPropagateOnGraph(knnGraph(corpus, k, nCentroids), seeds, rounds)

  /** [[labelPropagate]] over a PREBUILT graph (a [[knnGraph]] output or the
    * maintainer's stored artifact) — the serve split: voting rounds only,
    * no build. Edge weights are the ×10⁶-integer rounded cosines, so the
    * result is identical whichever engine stored the graph.
    */
  def labelPropagateOnGraph(
      graphEdges: DataFrame, seeds: DataFrame, rounds: Int = 2): DataFrame = {
    val graph = weighted(graphEdges).localCheckpoint()
    var labels = seedLabels(seeds).localCheckpoint()
    (1 to rounds).foreach { r =>
      val newly = voteRound(graph, labels, r)
      labels = labels.unionByName(newly).localCheckpoint()
    }
    labels.orderBy(col("vec_id"))
  }

  private def weighted(graphEdges: DataFrame): DataFrame =
    graphEdges
      .withColumn("w", round(col("cos") * 1e6, 0).cast("long"))
      .select(col("vec_id"), col("neighbor_id"), col("w"))

  private def seedLabels(seeds: DataFrame): DataFrame =
    seeds.select(col("vec_id"), col("label").cast("long").as("label"))
      .withColumn("round", lit(0))

  /** One cosine-weighted vote round: for every still-unlabeled vertex in
    * `targets` (all unlabeled vertices when None), the argmax label over
    * its labeled neighbors — exact integer votes, ties to smallest label.
    */
  private def voteRound(
      graph: DataFrame, labels: DataFrame, r: Int,
      targets: Option[DataFrame] = None): DataFrame = {
    val base = targets.fold(graph)(t =>
      graph.join(t.select(col("vec_id")), Seq("vec_id"), "left_semi"))
    val votes = base
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label")),
        Seq("neighbor_id"))
      .join(labels.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("w")).as("votes"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("votes").desc, col("label"))
    votes
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("label"), lit(r).as("round"))
  }

  /** Incremental label propagation after a graph fold — re-votes ONLY the
    * vertices a batch could have influenced, yet returns exactly
    * `labelPropagateOnGraph(newGraph, seeds, rounds)` (spec-pinned).
    *
    * `touched` is the folded batch's influence set: every vertex whose
    * edge list may have changed (the batch's cells' members — what
    * [[graft.streaming.GraphMaintainer.fold]] returns). Per round r the
    * recompute set is
    *   affected_r = touched ∪ delta_{r-1} ∪ inNeighbors(delta_{r-1})
    * where delta is the accumulated set of vertices whose label state
    * diverged from `oldLabels`: a vertex outside affected_r has an
    * unchanged edge list AND every neighbor in an unchanged state, so its
    * old round-r outcome is provably still correct and is KEPT without
    * re-voting. Only affected vertices vote; deltas then grow by the
    * vertices whose round-r outcome actually changed (gained, lost, or
    * relabeled — a full-outer compare restricted to affected_r).
    *
    * Scale shape: per round, one semi-join restricting the edge list to
    * affected vertices (broadcast — affected is batch-sized in steady
    * state), the usual vote aggregation over that slice, and a
    * batch-sized full-outer diff. Work tracks the batch's influence
    * radius, never the corpus — the label-maintenance twin of the
    * maintainer's O(batch) graph fold.
    */
  def labelPropagateIncrement(
      newGraph: DataFrame, oldLabels: DataFrame, seeds: DataFrame,
      touched: DataFrame, rounds: Int = 2): DataFrame = {
    val graph = weighted(newGraph).localCheckpoint()
    val touchedIds = touched.select(col("vec_id")).distinct().localCheckpoint()
    var labels = seedLabels(seeds).localCheckpoint()
    // delta: vertices whose label state (label at ≤ r, or unlabeled)
    // differs from the old run's — seeds are immutable, so it starts
    // PROVABLY empty (None), and round 1 skips the whole delta/in-neighbor
    // pipeline instead of joining against an empty frame
    var delta: Option[DataFrame] = None
    (1 to rounds).foreach { r =>
      val affected = delta.fold(touchedIds) { d =>
        val inNbrs = graph
          .join(d.select(col("vec_id").as("neighbor_id")), Seq("neighbor_id"),
            "left_semi")
          .select(col("vec_id"))
        touchedIds.union(d).union(inNbrs).distinct().localCheckpoint()
      }
      val revoted = voteRound(graph, labels, r, targets = Some(affected))
      // an old round-r label outside the affected set is provably unchanged
      val kept = oldLabels.filter(col("round") === r)
        .select(col("vec_id"), col("label").cast("long").as("label"), col("round"))
        .join(affected, Seq("vec_id"), "left_anti")
        // ...but only if the vertex is still unlabeled in the new state —
        // vacuous outside delta (state matches old, where it WAS unlabeled
        // before round r); kept for defense in depth
        .join(labels.select(col("vec_id")), Seq("vec_id"), "left_anti")
      // outcome diff, restricted to affected: gained / lost / relabeled
      val oldR = oldLabels.filter(col("round") === r)
        .select(col("vec_id"), col("label").cast("long").as("old_label"))
        .join(affected, Seq("vec_id"), "left_semi")
      val changed = oldR.join(revoted.select(col("vec_id"), col("label")),
          Seq("vec_id"), "full_outer")
        .filter(col("old_label").isNull || col("label").isNull ||
          col("old_label") =!= col("label"))
        .select(col("vec_id"))
      delta = Some(delta.fold(changed)(_.union(changed).distinct()))
      labels = labels.unionByName(revoted).unionByName(kept).localCheckpoint()
    }
    labels.orderBy(col("vec_id"))
  }

  /** Graph-walk ANN serving (the NSW search pattern) over the [[knnGraph]]
    * build artifact: start every query at the coarse-quantizer entry
    * points, then `hops` rounds of (expand each frontier node to its graph
    * neighbors, score, keep the `beam` best) — the final frontier's top-k
    * is the answer. Deterministic end to end (fixed entry set, fixed hop
    * count, rounded-cos/node-id tie-breaks), so the whole walk — graph
    * construction included — replays in the oracle.
    *
    * Scale shape: the graph is a PRE-BUILT per-refresh artifact (here
    * rebuilt inline and localCheckpoint'ed; in production read from the
    * lake — the build cost is [[knnGraph]]'s, paid once per refresh, not
    * per query batch). The frontier is O(|queries|·beam) rows — tiny — so
    * every hop broadcasts it: the graph-expansion join and the embedding
    * fetch are both broadcast-hash probes INTO the big side (graph edges,
    * corpus vectors) with no corpus shuffle anywhere; per-hop scored
    * candidates are ≤ |queries|·beam·(graphK+1). Beam search trades hops ×
    * beam for recall exactly the way nprobe trades cells — measured, like
    * every tier here, against the brute twin (SimilaritySpec).
    */
  def graphSearchTopK(
      corpus: DataFrame, queries: DataFrame, k: Int = 5, beam: Int = 8,
      hops: Int = 2, graphK: Int = 5, nCentroids: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val graph = knnGraph(corpus, graphK, nCentroids)
      .select(col("vec_id"), col("neighbor_id")).localCheckpoint()
    val entryNodes = ivfCentroids(corpus, nCentroids).map(_._1).toSeq.toDF("node")
    graphSearchServe(graph, entryNodes, corpus, queries, k, beam, hops)
  }

  /** Serve-side graph walk over a PREBUILT graph artifact — the per-refresh
    * split [[graphSearchTopK]]'s docstring promises: `graph` is the stored
    * edge list (a [[knnGraph]] output or [[graft.streaming.GraphMaintainer]]'s
    * maintained artifact), `entryNodes` the frozen quantizer's centroid ids,
    * and the walk itself contains NO cell self-join — every hop is a
    * broadcast probe of the O(|queries|·beam) frontier into the stored
    * edges and vectors. Build cost is paid once per refresh, never per
    * query batch.
    */
  def graphSearchServe(
      graph: DataFrame, entryNodes: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int = 5, beam: Int = 8, hops: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    graft.plans.GraftFunctions.register(spark)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val vecs = corpus.select(col("vec_id").as("node"), col("embedding").as("n_emb"))

    // score a small (query_id, node) candidate frame and keep the beam best
    def prune(cands: DataFrame, width: Int): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("node"))
      vecs
        .join(broadcast(cands.filter(col("node") =!= col("query_id")).distinct()),
          Seq("node"))
        .join(broadcast(q), Seq("query_id"))
        .withColumn("cos", round(
          call_function("cosine_similarity", col("q_emb"), col("n_emb")), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= width)
        .select(col("query_id"), col("node"), col("cos"))
    }

    // per-hop localCheckpoint: the frontier subtree feeds THREE consumers
    // next hop (both union branches + the prune broadcast) — letting the
    // plan compose would re-evaluate it 3^hops times (measured slower);
    // materializing the O(|queries|·beam)-row frontier per hop is cheaper
    val entry = q.select(col("query_id")).crossJoin(broadcast(entryNodes))
    var frontier = prune(entry, beam).localCheckpoint()
    (1 to hops).foreach { h =>
      val expanded = frontier.select(col("query_id"), col("node"))
        .union(graph
          .join(broadcast(frontier.select(col("query_id"), col("node"))),
            graph("vec_id") === col("node"))
          .select(col("query_id"), col("neighbor_id").as("node")))
      frontier = prune(expanded, beam)
      // the LAST hop's frontier has a single consumer (the final rank), so
      // it composes into that job instead of paying one more checkpoint
      if (h < hops) frontier = frontier.localCheckpoint()
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("node"))
    frontier
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("node").as("neighbor_id"), col("rank"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }
}
