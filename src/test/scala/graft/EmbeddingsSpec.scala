package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Embeddings}

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Two well-separated directions with deterministic jitter on a UNIQUE
    * axis per row (cross terms between distinct members are exactly zero,
    * so same-group cosine tops out at 100/104 ≈ 0.96 while a planted
    * near-duplicate sits at ~1.0). Ids are placed so the two smallest-md5
    * ids (the k=2 init draw) land in DIFFERENT groups, making Lloyd's
    * convergence to the planted split deterministic rather than init-luck.
    */
  private def plantedGroups: (Seq[(Long, Array[Float], Int)], Long, Long) = {
    val ids = (1L to 12L)
    val byMd5 = ids.sortBy(id => (md5hex(id.toString), id))
    val (seedA, seedB) = (byMd5(0), byMd5(1))
    val rest = ids.filterNot(Set(seedA, seedB)).zipWithIndex
    def vec(group: Int, row: Int): Array[Float] = {
      val v = new Array[Float](16)
      v(group) = 10f
      v(4 + row) = 2f + 0.2f * row // own jitter axis per row
      v
    }
    val rows = Seq((seedA, vec(0, 0), 0), (seedB, vec(1, 1), 1)) ++
      rest.map { case (id, i) => (id, vec(i % 2, i + 2), i % 2) }
    (rows, seedA, seedB)
  }

  test("kmeans recovers planted groups when init seeds straddle them") {
    val (rows, seedA, seedB) = plantedGroups
    val df = rows.map { case (id, v, _) => (id, v) }.toDF("vec_id", "embedding")
    val got = Embeddings.kmeansAssign(df, k = 2, iters = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    val want = rows.map { case (id, _, g) => id -> g }.toMap
    // cluster ordinals are by ascending seed vec_id — map the planted group
    // of the LOWER seed id to ordinal 0
    val flip = want(math.min(seedA, seedB)) != 0
    val aligned = want.map { case (id, g) => id -> (if (flip) 1 - g else g) }
    assert(got == aligned, s"got $got want $aligned")
  }

  test("kmeans assignment cos is non-decreasing in refinement rounds") {
    // Lloyd's invariant: each (assign, update) round cannot worsen the mean
    // member→centroid affinity (here: mean assigned cosine)
    val df = Tables.embeddings(spark, sf).limit(200)
    def meanCos(iters: Int): Double = {
      val rows = Embeddings.kmeansAssign(df, k = 4, iters = iters).collect()
      rows.map(_.getAs[Double]("cos")).sum / rows.length
    }
    val (m0, m1, m2) = (meanCos(0), meanCos(1), meanCos(2))
    assert(m1 >= m0 - 1e-9 && m2 >= m1 - 1e-9, s"got $m0 -> $m1 -> $m2")
    info(f"mean assigned cos: iters 0/1/2 = $m0%.4f / $m1%.4f / $m2%.4f")
  }

  test("kmeans is deterministic under repeated evaluation") {
    val df = Tables.embeddings(spark, sf).limit(100)
    val a = Embeddings.kmeansAssign(df, k = 4, iters = 2).collect().toSeq
    val b = Embeddings.kmeansAssign(df, k = 4, iters = 2).collect().toSeq
    assert(a == b)
  }

  test("clusterQuality: populations conserve the corpus, cohesion bounds hold") {
    val emb = Tables.embeddings(spark, sf)
    val q = Embeddings.clusterQuality(emb).collect()
    assert(q.nonEmpty && q.length <= 8)
    assert(q.map(_.getLong(1)).sum == emb.count())
    val assigned = Embeddings.kmeansAssign(emb).collect()
      .groupBy(_.getInt(1))
    q.foreach { r =>
      val (ci, n, micro, minCos) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val mean = micro.toDouble / n / 1e6
      assert(mean >= -1.0 - 1e-9 && mean <= 1.0 + 1e-9)
      assert(minCos <= mean + 1e-9, s"cluster $ci: min > mean")
      // the audit row must be a pure aggregate of the assignment frame
      val members = assigned(ci)
      assert(members.length.toLong == n)
      val wantMicro = members.map(m =>
        math.round(m.getDouble(2) * 1e6)).sum
      assert(micro == wantMicro, s"cluster $ci cohesion sum diverged")
      assert(minCos == members.map(_.getDouble(2)).min)
    }
  }

  test("clusterOutliers agrees exactly with a driver-side recomputation") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val margin = 150000L
    val assigned = Embeddings.kmeansAssign(emb, k = 4, iters = 2).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"), r.getAs[Double]("cos")))
    val byCluster = assigned.groupBy(_._2)
    val want = assigned.filter { case (_, c, cos) =>
      val members = byCluster(c)
      val n = members.length.toLong
      val sm = members.map(m => math.round(m._3 * 1e6)).sum
      sm - n * math.round(cos * 1e6) > margin * n
    }.map(_._1).toSet
    val got = Embeddings.clusterOutliers(emb, k = 4, iters = 2, marginMicro = margin)
      .collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSet == want)
    // and the reported gap is the exact integer the definition promises
    got.foreach { r =>
      val members = byCluster(r.getAs[Int]("cluster"))
      val sm = members.map(m => math.round(m._3 * 1e6)).sum
      val wantGap = sm - members.length * math.round(r.getAs[Double]("cos") * 1e6)
      assert(r.getAs[Long]("gap_micro") == wantGap)
      assert(r.getAs[Long]("n") == members.length.toLong)
    }
  }

  test("clusterOutliers flags a planted stray and nothing else") {
    val (rows, _, _) = plantedGroups
    // 20 leans toward group 0 (axis 0) but mostly lives on its own axis:
    // assigned to cluster 0 with a cosine far below the tight members'
    val stray = new Array[Float](16)
    stray(0) = 1f; stray(15) = 8f
    val df = (rows.map { case (id, v, _) => (id, v) } :+ ((20L, stray)))
      .toDF("vec_id", "embedding")
    val flagged = Embeddings.clusterOutliers(df, k = 2, iters = 2, marginMicro = 300000L)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(flagged == Set(20L), s"got $flagged")
  }

  test("semantic dedup drops the higher id of a planted near-identical pair") {
    val (rows, _, _) = plantedGroups
    // 13 duplicates 3's direction almost exactly; nothing else in the
    // fixture reaches cosine 0.98 (jitter keeps distinct members apart)
    val near = rows.find(_._1 == 3L).get._2.clone()
    near(7) = near(7) + 0.01f
    val df = (rows.map { case (id, v, _) => (id, v) } :+ ((13L, near)))
      .toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(df, k = 2, iters = 2, threshold = 0.98)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("action")).toMap
    assert(got(13L) == "drop", s"got $got")
    assert(got(3L) == "keep", "the lowest id of the epsilon-group survives")
    assert(got.count(_._2 == "drop") == 1)
  }

  test("semantic dedup: clusterCap bounds pair generation (capped -> all keep)") {
    val (rows, _, _) = plantedGroups
    val df = rows.map { case (id, v, _) => (id, v) }.toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(df, k = 1, iters = 1, threshold = 0.0, clusterCap = 2)
      .collect().map(_.getAs[String]("action"))
    assert(got.forall(_ == "keep"),
      "a cluster over the cap must emit zero pairs, never a quadratic group")
  }
}
