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
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force cosine top-k: for each query vector (from `queries`), the k
    * nearest corpus vectors. Ranking uses the ROUNDED similarity (ties broken
    * by neighbor id) so ordering is reproducible across engines.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = corpus.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("q_emb"), col("embedding")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
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
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("q_emb"), col("embedding"))
      .withColumn("cos", round(cosine(col("q_emb"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }
}
