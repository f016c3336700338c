package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sq, SimilaritySearch}

class SqSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, sf)

  test("sq8Stats: one (lo <= hi) row per dimension") {
    val st = Sq.sq8Stats(corpus).collect()
    assert(st.length == 64)
    assert(st.map(_.getLong(0)).toSeq == (1L to 64L))
    st.foreach(r => assert(r.getDouble(1) <= r.getDouble(2)))
  }

  test("sq8Encode: full coverage, byte range, duplicates share codes") {
    val n = corpus.count()
    val enc = Sq.sq8Encode(corpus).collect()
    assert(enc.length == n * 64)
    enc.foreach { r =>
      val c = r.getLong(2)
      assert(c >= 0L && c <= 255L, s"code $c out of byte range")
    }
    // byte-identical vectors must encode identically (fit is corpus-wide,
    // so duplicating a row cannot move any (lo, hi))
    val byVec = enc.groupBy(_.getLong(0)).map { case (id, rs) =>
      id -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    }
    val emb = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val dupPair = emb.groupBy(_._2.toSeq).values.find(_.length > 1)
    dupPair.foreach { grp =>
      val codes = grp.map(g => byVec(g._1)).distinct
      assert(codes.length == 1, "identical vectors produced different codes")
    }
  }

  test("reconstruction error is bounded by half a quantization step per dim") {
    val st = Sq.sq8Stats(corpus).collect()
      .map(r => r.getLong(0).toInt -> (r.getDouble(1), r.getDouble(2))).toMap
    val enc = Sq.sq8Encode(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    val emb = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    emb.foreach { case (id, f) =>
      f.zipWithIndex.foreach { case (x, i) =>
        val (lo, hi) = st(i + 1)
        val step = if (hi == lo) 0.0 else (hi - lo) / 255.0
        val recon = lo + enc((id, i + 1)) * step
        assert(math.abs(recon - x.toDouble) <= step / 2.0 + 1e-12,
          s"vec $id dim ${i + 1}: |$recon - $x| > step/2 = ${step / 2}")
      }
    }
  }

  test("sq8TopK: scores near-exact, recall well above the PQ tier") {
    val queries = corpus.filter(col("vec_id") < 5)
    val sq = Sq.sq8TopK(corpus, queries, k = 5).collect()
    assert(sq.length == 25)
    val brute = SimilaritySearch.bruteForceTopK(corpus, queries, k = 5).collect()
    val bruteCos = brute.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    // wherever SQ8 and brute agree on a pair, the 8-bit reconstruction must
    // score within a tight band of the exact cosine (64 dims x half-step)
    var maxErr = 0.0
    sq.foreach { r =>
      bruteCos.get((r.getLong(0), r.getLong(1))).foreach { b =>
        maxErr = math.max(maxErr, math.abs(r.getDouble(3) - b))
      }
    }
    info(f"max |sq8 cos - exact cos| on shared pairs: $maxErr%.5f")
    assert(maxErr <= 0.05, "SQ8 cosine drifted too far from exact")
    val recall = sq.map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(brute.map(r => (r.getLong(0), r.getLong(1))).toSet).size / 25.0
    info(f"SQ8 recall@5 vs brute: $recall%.2f (64 bytes/vector vs 256)")
    assert(recall >= 0.6, "SQ8 should recover most exact neighbors")
  }
}
