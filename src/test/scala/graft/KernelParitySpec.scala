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

  test("LSH band-bucket kernel == declarative lshBucket HOF per band") {
    val bands = 16; val bandBits = 4; val dim = 64
    val planes = SimilaritySearch.planeSigns(bands * bandBits, dim)
    val emb = Tables.embeddings(spark, sf).limit(20)
    // declarative: per-band bucket strings from the interpreted HOF twin
    val bucketCols = (0 until bands).map { b =>
      SimilaritySearch.lshBucket(
        col("embedding"), planes.slice(b * bandBits, (b + 1) * bandBits)).as(s"b$b")
    }
    val declarative = emb.select(col("vec_id") +: bucketCols: _*)
      .collect().map(r => r.getLong(0) -> (0 until bands).map(b => r.getString(b + 1))).toMap
    // kernel: the (vec_id, band, bucket) rows embeddingNearDupLsh shuffles
    val planesArr = planes.map(_.map(_.toDouble).toArray).toArray
    val kernel = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, f) =>
        val e = f.map(_.toDouble)
        id -> (0 until bands).map { b =>
          val sb = new StringBuilder
          var bit = 0
          while (bit < bandBits) {
            val plane = planesArr(b * bandBits + bit)
            var s = 0.0; var i = 0
            while (i < plane.length) { s += e(i) * plane(i); i += 1 }
            sb.append(if (s > 0) '1' else '0')
            bit += 1
          }
          sb.toString
        }
      }.toMap
    assert(kernel == declarative)
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

  test("cell_max_cosine == array_max ∘ transform ∘ cosine_similarity") {
    graft.plans.GraftFunctions.register(spark)
    // packed cells of varying size incl. a zero-norm member (nanvl path)
    // and exact ties (two ids sharing one embedding → lowest id must win)
    val vecs = (1L to 40L).map { id =>
      val v = new Array[Float](16)
      if (id != 13L) { // 13 stays all-zero: the zero-norm member
        v((id % 16).toInt) = 1f + (id % 5)
        v(((id * 7) % 16).toInt) += 0.25f * (id % 3)
      }
      (id, v)
    } ++ Seq((41L, (1L to 1L).map(_ => {
      val v = new Array[Float](16); v(3) = 2f; v
    }).head), (42L, { val v = new Array[Float](16); v(3) = 2f; v }))
    val members = vecs.toDF("id", "emb")
      .groupBy((col("id") % 4).cast("int").as("cell"))
      .agg(sort_array(collect_list(struct(col("id"), col("emb")))).as("members"))
    val queries = (100L to 110L).map { q =>
      val v = new Array[Float](16)
      v((q % 16).toInt) = 3f; v(((q * 3) % 16).toInt) += 1.5f
      (q, v, (q % 4).toInt)
    }.toDF("vec_id", "embedding", "cell")
    val joined = queries.join(members, Seq("cell")).cache()
    val native = joined.select(
      col("vec_id"),
      call_function("cell_max_cosine", col("members"), col("embedding")).as("b"))
      .select(col("vec_id"), col("b.cos"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val hof = joined.select(
      col("vec_id"),
      array_max(transform(col("members"), m => struct(
        nanvl(round(call_function("cosine_similarity",
          m.getField("emb"), col("embedding")), 6), lit(-1.0)).as("cos"),
        (-m.getField("id")).as("nid")))).as("b"))
      .select(col("vec_id"), col("b.cos"), (-col("b.nid")).as("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(native == hof)
    // the planted duplicate embedding (ids 41/42 share cell 1 when both
    // probed) must tie to the LOWEST id in both forms — covered by the set
    // equality; sanity: no NaN leaked through either path
    assert(native.forall(t => !t._2.isNaN))
  }
}
