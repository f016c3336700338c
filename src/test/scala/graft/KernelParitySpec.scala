package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{Dedup, SimilaritySearch}

/** The mapPartitions kernels exist for speed only — each must compute
  * exactly what its declarative Column twin defines (same md5 bytes, same
  * lexicographic mins, same integer arithmetic). This spec pins that
  * equivalence so kernel and twin can't drift apart.
  */
class KernelParitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).limit(50).cache()

  test("simhash kernel == declarative simhashBits") {
    val kernel = Dedup.simhashFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val declarative = docs.select(
      col("doc_id"),
      simhashBits(transform(tokens(col("text")), tokenHash _), 60).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kernel == declarative)
  }

  test("minhash-LSH pairs equal the fully-declarative pipeline's") {
    val kernelPairs = Dedup.minhashLshPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val base = docs.select(
      col("doc_id"),
      array_distinct(shingles(tokens(col("text")), 3)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), 12))
    val banded = base.select(
      col("doc_id"), posexplode(bandHashes(col("sig"), 4, 3)))
      .toDF("doc_id", "band", "bh")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j")).distinct()
    val declPairs = cand
      .join(base.select(col("doc_id").as("i"), col("sh").as("sh_i")), "i")
      .join(base.select(col("doc_id").as("j"), col("sh").as("sh_j")), "j")
      .withColumn("jac", round(jaccard(col("sh_i"), col("sh_j")), 6))
      .filter(col("jac") >= 0.6)
      .select(col("i"), col("j"), col("jac"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(kernelPairs == declPairs)
  }

  test("cosine kernel == declarative cosine column") {
    val emb = Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    val declarative = Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"),
        round(SimilaritySearch.cosine(col("embedding"), col("embedding")), 6).as("self"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    emb.foreach { case (id, f) =>
      val d = f.map(_.toDouble)
      val kernel = SimilaritySearch.round6(
        SimilaritySearch.dotKernel(d, d) /
          (SimilaritySearch.l2NormKernel(d) * SimilaritySearch.l2NormKernel(d)))
      assert(kernel == declarative(id), s"vec $id")
    }
  }
}
