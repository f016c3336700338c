package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SimilaritySearch.{dotKernel, l2NormKernel, safeCos}

/** Scalar (int8) quantization of the embedding column — the storage tier
  * BETWEEN raw float32 and product quantization: 4× compression with
  * near-exact scores, no codebook fit. Each dimension gets an affine range
  * [lo_d, hi_d] from one corpus aggregation; a vector component is stored
  * as the byte `round((x−lo)·255/(hi−lo))` and reconstructed as
  * `lo + code·(hi−lo)/255` (max error: half a quantization step per
  * component). This is the "SQ8" tier of the usual vector-store ladder
  * (float32 → SQ8 → PQ), and the right default for corpus embeddings whose
  * per-dimension ranges are stable.
  *
  * Determinism/oracle contract: the fit is a plain min/max per dimension
  * (no iteration, no sampling); encode and reconstruction are per-component
  * IEEE double arithmetic evaluated in a fixed order, so DuckDB replays the
  * whole pipeline bit-for-bit (`Math.round` and DuckDB `round(x,0)` agree
  * on the non-negative scaled values). Scoring reconstructs on the fly and
  * uses the ascending-index dot + [[SimilaritySearch.safeCos]] — the
  * brute-twin arithmetic — so only the final cosine rounds, at 6 dp.
  *
  * Scale shape (100 TB): the fit is ONE narrow aggregation — posexplode to
  * (dim, v) partially aggregates map-side to 64 rows per partition before
  * the 64-row shuffle; the stats artifact is 64×2 doubles, broadcast
  * everywhere else. Encode is a narrow kernel pass emitting the 64-byte
  * code column (the lake artifact replacing 256-byte vectors). Scoring
  * scans CODES and reconstructs in-register from the broadcast stats —
  * memory traffic per row drops 4× — and the per-query top-k is the
  * [[SimilaritySearch.bruteForceTopK]] row_number shape. Out-of-fit inputs
  * (stream probes, post-fit inserts) clamp into [0,255], so a drifted
  * corpus degrades accuracy, not correctness; re-fit cadence is the same
  * centroid-staleness contract as the IVF index (SCALE.md).
  */
object Sq {

  /** Per-dimension fit: (dim ∈ 1..|vec|, lo, hi) — min/max of the
    * float→double-cast component over the corpus. One aggregation, 64-row
    * result.
    */
  def sq8Stats(corpus: DataFrame): DataFrame =
    Par.spread(corpus)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select((col("pos") + 1).cast("long").as("dim"), col("v").cast("double").as("v"))
      .groupBy(col("dim"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("dim"))

  /** The fit as broadcastable primitive arrays (0-indexed). */
  private def statsArrays(corpus: DataFrame): (Array[Double], Array[Double]) = {
    val rows = sq8Stats(corpus).collect()
    val n = rows.map(_.getLong(0)).max.toInt
    val lo = new Array[Double](n); val hi = new Array[Double](n)
    rows.foreach { r =>
      lo(r.getLong(0).toInt - 1) = r.getDouble(1)
      hi(r.getLong(0).toInt - 1) = r.getDouble(2)
    }
    (lo, hi)
  }

  /** Encode one component: non-negative scaled value, HALF_UP round (both
    * engines agree above zero), clamped for out-of-fit inputs.
    */
  private def code1(x: Double, lo: Double, hi: Double): Int =
    if (hi == lo) 0
    else {
      val c = Math.round((x - lo) * 255.0 / (hi - lo))
      if (c < 0L) 0 else if (c > 255L) 255 else c.toInt
    }

  /** The encoded corpus, exploded to (vec_id, dim, code) rows — the
    * persistable artifact in its oracle-comparable shape (the production
    * sink would pack `code` into a 64-byte binary column instead).
    */
  def sq8Encode(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (lo, hi) = statsArrays(corpus)
    val bc = spark.sparkContext.broadcast((lo, hi))
    Par.spread(corpus.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val (l, h) = bc.value
        it.flatMap { case (id, f) =>
          f.iterator.zipWithIndex.map { case (x, i) =>
            (id, (i + 1).toLong, code1(x.toDouble, l(i), h(i)).toLong)
          }
        }
      }.toDF("vec_id", "dim", "code")
  }

  /** Cosine top-k against SQ8 RECONSTRUCTIONS: queries stay raw, each
    * corpus row decodes in-register and scores with the exact dot —
    * output shape (query_id, neighbor_id, rank, cos), the `q_ann_*`
    * contract. At `shortlist`-free SQ8 accuracy a separate re-rank pass
    * is rarely needed; the PQ tier owns that trade.
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (lo, hi) = statsArrays(corpus)
    val bcStats = spark.sparkContext.broadcast((lo, hi))
    val qMat = spark.sparkContext.broadcast(
      queries.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
        .collect().sortBy(_._1)
        .map { case (id, f) => val d = f.map(_.toDouble); (id, d, l2NormKernel(d)) })
    val scored = Par.spread(corpus.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val (l, h) = bcStats.value
        val qs = qMat.value
        it.flatMap { case (nid, f) =>
          // decode to the reconstruction, then the brute-twin arithmetic:
          // ascending-index dot, safeCos — same IEEE ops as the oracle
          val r = new Array[Double](f.length)
          var i = 0
          while (i < f.length) {
            val c = code1(f(i).toDouble, l(i), h(i))
            r(i) = l(i) + c * (h(i) - l(i)) / 255.0
            i += 1
          }
          val rn = l2NormKernel(r)
          qs.iterator.filter(_._1 != nid).map { case (qid, qv, qn) =>
            (qid, nid, safeCos(dotKernel(qv, r), qn, rn))
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    Pq.rankTopK(scored, k)
  }
}
