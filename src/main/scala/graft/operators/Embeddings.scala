package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import SimilaritySearch.{dotKernel, l2NormKernel, round6, safeCos}

/** Embedding-space corpus structure: Lloyd-refined k-means clustering and
  * the SemDeDup-style semantic dedup built on it (Abbas et al. 2023:
  * cluster the corpus, then search for near-duplicates only WITHIN each
  * cluster — the cluster granularity, not the corpus size, bounds the
  * quadratic work).
  *
  * Everything is deterministic and engine-reproducible, the property the
  * DuckDB oracle gate exercises:
  *  - init centroids are the `k` corpus vectors with the smallest
  *    md5(vec_id) — the same replayable draw as the IVF coarse quantizer
  *    ([[SimilaritySearch.ivfCentroids]]);
  *  - assignment is argmax ROUNDED (6 dp) cosine, ties to the lowest
  *    cluster ordinal — partitioning-independent;
  *  - the centroid update quantizes each component to 6 dp and sums exact
  *    integers, so the mean is order-independent (float summation order
  *    never leaks into the result);
  *  - a cluster that loses every member simply drops out (no reseeding
  *    rule to replicate).
  */
object Embeddings {

  /** Component quantized to 6 dp as an exact integer (×10⁶): HALF_UP
    * rounding first (Spark/DuckDB `round(x, 6)`), then the scale-up is
    * within 1e-4 of an integer so the final rounding is unambiguous.
    */
  private def quant6(x: Double): Long = Math.round(round6(x) * 1e6)

  /** Lloyd-refined k-means over the embedding column: `iters` rounds of
    * (assign to nearest centroid by cosine, recompute centroids as member
    * means), then a final assignment under the refined centroids —
    * (vec_id, cluster, cos).
    *
    * Scale shape: the narrow (vec_id, embedding) projection is
    * localCheckpoint'ed once (the CC-fixpoint trade; on a cluster swap for
    * a reliable checkpoint or a lake landing) and re-scanned `iters`+1
    * times. Each round is ONE job: a mapPartitions pass that assigns every
    * vector against the broadcast O(k·dim) centroid table and pre-reduces
    * per-partition (cluster → count + exact component sums), collecting
    * only partitions×k tiny rows to the driver — no shuffle at any scale,
    * the classic distributed-k-means layout. The final assignment is a
    * plain narrow projection.
    */
  def kmeansAssign(corpus: DataFrame, k: Int = 8, iters: Int = 2): DataFrame =
    assignments(corpus, k, iters).select(col("vec_id"), col("cluster"), col("cos"))
      .orderBy(col("vec_id"))

  /** Per-cluster quality audit of the trained quantizer — the `k`-sizing
    * signal behind every cell-blocked operator (SemDeDup's constant mean
    * cell size, IVF's probe cost, the semantic gate's cellCap): cluster
    * population `n`, cohesion as the exact ×10⁶ integer sum of the
    * 6-dp-rounded member→centroid cosines (the [[quant6]] reporting trick —
    * a rounded MEAN can land on a half boundary where engines disagree;
    * integer sums cannot; mean = cos_sum_micro / n / 1e6), and the worst
    * member (`min_cos` — a low outlier means the cell's radius outgrew the
    * quantizer and it's time to re-fit or split). One narrow aggregation
    * over the assignment pass; k rows out.
    */
  def clusterQuality(corpus: DataFrame, k: Int = 8, iters: Int = 2): DataFrame =
    assignments(corpus, k, iters)
      .select(col("cluster"), col("cos"))
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("cos") * 1e6, 0).cast("long")).as("cos_sum_micro"),
        min(col("cos")).as("min_cos"))
      .orderBy(col("cluster"))

  /** Per-member outlier flags — the row-level drill-down of
    * [[clusterQuality]]'s `min_cos`: every vector sitting more than
    * `marginMicro`/1e6 cosine BELOW its own cluster's mean member→centroid
    * similarity. These are the mislabeled / garbage / wrong-modality
    * embeddings a curation pipeline quarantines before they poison
    * near-dup verdicts and cell statistics.
    *
    * The comparison is EXACT integer arithmetic end to end — no division,
    * no sqrt: member cos quantizes to ×10⁶ (`cos_micro`), the cluster mean
    * stays as the pair (n, Σcos_micro), and "cos < mean − margin" is
    * cross-multiplied to `n·cos_micro < Σcos_micro − n·margin` (Longs
    * throughout: |cos_micro| ≤ 1e6, so n can reach 10¹² before the product
    * nears overflow — cluster populations at 100 TB are fine). A divided
    * mean could land on an engine-dependent rounding boundary; the integer
    * form cannot. `gap_micro = Σcos_micro − n·cos_micro` (= n·(mean−cos)
    * ×10⁶) reports HOW far out each flagged member sits, exactly.
    *
    * Plan shape: the assignment pass, one k-row aggregation, a broadcast
    * join of those k rows back onto the members, a codegen'd integer
    * filter. One shuffle (the agg); flagged rows out.
    */
  def clusterOutliers(
      corpus: DataFrame, k: Int = 8, iters: Int = 2,
      marginMicro: Long = 150000L): DataFrame = {
    val members = assignments(corpus, k, iters)
      .select(col("vec_id"), col("cluster"), col("cos"))
      .withColumn("cos_micro", round(col("cos") * 1e6, 0).cast("long"))
    val stats = members
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("cos_micro")).as("sum_micro"))
    members
      .join(broadcast(stats), Seq("cluster"))
      .withColumn("gap_micro", col("sum_micro") - col("n") * col("cos_micro"))
      .filter(col("gap_micro") > lit(marginMicro) * col("n"))
      .select(col("vec_id"), col("cluster"), col("cos"), col("n"), col("gap_micro"))
      .orderBy(col("vec_id"))
  }

  /** [[kmeansAssign]] without the presentation sort and with the embedding
    * column carried through — what internal consumers
    * ([[Dedup.semanticDedup]], [[SimilaritySearch.ivfTopKKmeans]]) compose
    * on (the Curation pattern: a sort feeding an aggregation is dead
    * weight).
    */
  private[operators] def assignments(corpus: DataFrame, k: Int, iters: Int): DataFrame =
    assignTo(corpus, fitCentroids(corpus, k, iters))

  /** Assign a stream of vectors to the cells of a BATCH-fit quantizer —
    * the fit-in-batch / assign-on-the-stream split (the IngestGate model
    * pattern applied to embedding space): [[fitCentroids]] runs on the
    * stored corpus, the centroid table broadcasts into [[assignTo]]'s
    * stateless kernel pass, and each arriving vector is routed to its
    * cluster append-safely. StreamCurationSpec pins the stream assignment
    * to [[kmeansAssign]]'s batch output over the same corpus.
    */
  def assignStream(stream: DataFrame, corpus: DataFrame,
      k: Int = 8, iters: Int = 2): DataFrame =
    assignTo(stream, fitCentroids(corpus, k, iters))
      .select(col("vec_id"), col("cluster"), col("cos"))

  /** Assign every vector of `df` to its nearest centroid (argmax rounded
    * cosine, ties to the lowest ordinal) — (vec_id, embedding, cluster,
    * cos). A narrow kernel pass against the broadcast centroid table; used
    * to place QUERY vectors into the cells of a corpus-fit quantizer.
    */
  private[operators] def assignTo(
      df: DataFrame,
      centroids: Array[(Int, Array[Double], Double)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    Par.spread(df.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, f) =>
          val e = f.map(_.toDouble)
          val (ci, cos) = nearest(e, l2NormKernel(e), cs)
          (id, f, ci, cos)
        }
      }.toDF("vec_id", "embedding", "cluster", "cos")
  }

  private def nearest(
      e: Array[Double], ne: Double,
      cs: Array[(Int, Array[Double], Double)]): (Int, Double) = {
    var bestC = -1; var best = Double.NegativeInfinity
    cs.foreach { case (ci, cv, cn) =>
      // zero-norm vectors (or degenerate centroids) score -1.0 instead of
      // NaN — see SimilaritySearch.safeCos; the first centroid then wins
      val cos = safeCos(dotKernel(e, cv), ne, cn)
      if (cos > best) { best = cos; bestC = ci } // ascending ci: first wins ties
    }
    (bestC, best)
  }

  /** The Lloyd loop itself: `iters` rounds of assign + quantized-mean
    * update, returning the refined (ordinal, components, norm) table —
    * the trained coarse quantizer [[SimilaritySearch.ivfTopKKmeans]]
    * plugs in.
    */
  private[operators] def fitCentroids(
      corpus: DataFrame, k: Int, iters: Int): Array[(Int, Array[Double], Double)] = {
    require(k >= 1 && iters >= 0, "need k >= 1, iters >= 0")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = Par.spread(corpus.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .map { case (id, f) => (id, f.map(_.toDouble)) }
      .localCheckpoint()

    // cluster ordinal 0..k-1 by ascending vec_id over the smallest-md5 draw
    var centroids: Array[(Int, Array[Double], Double)] =
      SimilaritySearch.ivfCentroids(corpus, k).zipWithIndex
        .map { case ((_, e, n), ci) => (ci, e, n) }

    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      // assign + pre-reduce in one pass: per-partition (cluster, count,
      // quantized component sums) — exact integers, so partial order is free
      val partials = vecs.mapPartitions { it =>
        val cs = bc.value
        val acc = scala.collection.mutable.HashMap.empty[Int, (Long, Array[Long])]
        it.foreach { case (_, e) =>
          val (ci, _) = nearest(e, l2NormKernel(e), cs)
          val (n, sums) = acc.getOrElseUpdate(ci, (0L, new Array[Long](e.length)))
          var i = 0
          while (i < e.length) { sums(i) += quant6(e(i)); i += 1 }
          acc(ci) = (n + 1, sums)
        }
        acc.iterator.map { case (ci, (n, sums)) => (ci, n, sums) }
      }.collect()
      centroids = partials.groupBy(_._1).toArray.sortBy(_._1).map { case (ci, parts) =>
        val n = parts.map(_._2).sum
        val dim = parts.head._3.length
        val mean = Array.tabulate(dim) { i =>
          parts.map(_._3(i)).sum.toDouble / n.toDouble / 1e6
        }
        (ci, mean, l2NormKernel(mean))
      }
      bc.unpersist()
    }
    vecs.unpersist()
    centroids
  }
}
