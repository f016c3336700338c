package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, SimilaritySearch}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, sf)

  test("fitCodebooks is deterministic and covers every subspace") {
    val a = Pq.fitCodebooks(corpus, m = 8, nCodes = 8, iters = 2)
    val b = Pq.fitCodebooks(corpus, m = 8, nCodes = 8, iters = 2)
    assert(a.length == 8 && b.length == 8)
    (a zip b).foreach { case (ba, bb) =>
      assert(ba.length == bb.length && ba.nonEmpty)
      (ba zip bb).foreach { case ((ca, va), (cb, vb)) =>
        assert(ca == cb && va.sameElements(vb))
      }
    }
    // code ordinals ascend and stay within the init draw's range
    a.foreach { book =>
      assert(book.map(_._1).sameElements(book.map(_._1).sorted))
      assert(book.forall { case (c, v) => c >= 0 && c < 8 && v.length == 8 })
    }
  }

  test("encode emits one in-book ordinal per subspace; duplicates share codes") {
    val books = Pq.fitCodebooks(corpus, m = 8, nCodes = 8, iters = 2)
    val valid = books.map(_.map(_._1).toSet)
    val enc = Pq.encode(corpus, books).as[(Long, Array[Int])].collect()
    assert(enc.length == corpus.count())
    enc.foreach { case (_, codes) =>
      assert(codes.length == 8)
      codes.zipWithIndex.foreach { case (c, s) => assert(valid(s)(c)) }
    }
    // a byte-identical vector pair must land on identical codes
    val dup = corpus.limit(1)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      .unionByName(corpus.limit(1).select(col("vec_id"), col("embedding")))
    val dupCodes = Pq.encode(dup, books).as[(Long, Array[Int])].collect()
    assert(dupCodes.length == 2)
    assert(dupCodes(0)._2.sameElements(dupCodes(1)._2))
  }

  test("pqTopK: k ranked neighbors per query, self excluded, ADC matches reconstruction") {
    val queries = corpus.filter(col("vec_id") < 5)
    val out = Pq.pqTopK(corpus, queries, k = 5).collect()
    assert(out.length == 25)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q))
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(sims.sameElements(sims.sorted.reverse), s"query $q not sorted")
      assert(sims.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    }

    // the quantized-LUT ADC cosine must agree with the explicit
    // reconstruct-then-cosine arithmetic: each of the m per-sub LUT dots
    // carries <= 0.5e-6 rounding, so the dot differs by <= m*0.5e-6 and
    // the final cosine by a comparable hair
    val books = Pq.fitCodebooks(corpus, m = 8, nCodes = 8, iters = 2)
    val posOf = books.map(_.iterator.map(_._1).zipWithIndex.toMap)
    val enc = Pq.encode(corpus, books).as[(Long, Array[Int])].collect().toMap
    val qVecs = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    out.foreach { r =>
      val q = qVecs(r.getAs[Long]("query_id")).map(_.toDouble)
      val recon = enc(r.getAs[Long]("neighbor_id")).zipWithIndex
        .flatMap { case (c, s) => books(s)(posOf(s)(c))._2 }
      val expect = SimilaritySearch.safeCos(
        SimilaritySearch.dotKernel(q, recon),
        SimilaritySearch.l2NormKernel(q), SimilaritySearch.l2NormKernel(recon))
      assert(math.abs(r.getAs[Double]("cos") - expect) < 1e-4,
        s"ADC ${r.getAs[Double]("cos")} vs recon $expect")
    }
  }

  test("recall@5 vs the brute twin is measurable and codes compress 32x") {
    val queries = corpus.filter(col("vec_id") < 5)
    val pq = Pq.pqTopK(corpus, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilaritySearch.bruteForceTopK(corpus, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(brute).size.toDouble / brute.size
    info(f"PQ recall@5 vs brute force: $recall%.2f (8 bytes/vector vs 256)")
    assert(recall > 0.0, "PQ should recover at least some exact neighbors")
  }

  test("pqTopKRerank: exact scores, recall >= plain ADC; full shortlist == brute") {
    val queries = corpus.filter(col("vec_id") < 5)
    val brute = SimilaritySearch.bruteForceTopK(corpus, queries, k = 5).collect()
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteCos = brute.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap

    val rr = Pq.pqTopKRerank(corpus, queries, k = 5, shortlist = 20).collect()
    assert(rr.length == 25)
    // every re-ranked cos is the EXACT cosine: wherever a pair also appears
    // in the brute top-5, the values must be identical (same arithmetic)
    rr.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bruteCos.get(key).foreach(b => assert(r.getDouble(3) == b,
        s"rerank cos for $key diverged from the brute twin"))
    }
    val adcSet = Pq.pqTopK(corpus, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rrSet = rr.map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcRecall = adcSet.intersect(bruteSet).size.toDouble / bruteSet.size
    val rrRecall = rrSet.intersect(bruteSet).size.toDouble / bruteSet.size
    info(f"recall@5: ADC $adcRecall%.2f -> rerank(20) $rrRecall%.2f")
    assert(rrRecall >= adcRecall,
      "exact re-ranking must not lose recall vs raw ADC ranking")

    // a shortlist covering the whole corpus makes rerank = the brute twin
    val n = corpus.count().toInt
    val full = Pq.pqTopKRerank(corpus, queries, k = 5, shortlist = n).collect()
    assert(full.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq ==
      brute.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq)
  }

  test("ivfPqTopKRerank: candidates stay in-cell, scores exact, shape ranked") {
    val queries = corpus.filter(col("vec_id") < 5)
    val rr = Pq.ivfPqTopKRerank(corpus, queries, k = 5, shortlist = 20).collect()
    assert(rr.nonEmpty && rr.length <= 25)
    rr.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q))
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(sims.sameElements(sims.sorted.reverse), s"query $q not sorted")
    }
    // in-cell: every rerank candidate must come from the IVF-PQ shortlist's
    // cell — i.e. appear in the ADC frame at some rank
    val adcPairs = Pq.ivfPqTopK(corpus, queries, k = corpus.count().toInt).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rr.foreach(r => assert(adcPairs((r.getLong(0), r.getLong(1)))))
  }

  test("ivfPqTopK: candidates are exactly the query's cell, ranked and bounded") {
    val queries = corpus.filter(col("vec_id") < 5)
    val out = Pq.ivfPqTopK(corpus, queries, k = 5).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q))
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(sims.sameElements(sims.sorted.reverse), s"query $q not sorted")
    }

    // recompute the whole index driver-side: cell assignment, residual
    // codebooks, and the explicit x-hat = centroid + decoded residual —
    // candidates must share the query's cell and the ADC cosine must agree
    // with reconstruct-then-cosine up to the per-sub quantization hair
    val cents = SimilaritySearch.ivfCentroids(corpus, 16)
    def cellOf(e: Array[Double]): (Long, Array[Double]) = {
      val ne = SimilaritySearch.l2NormKernel(e)
      var bestId = -1L; var best = Double.NegativeInfinity
      var bestVec: Array[Double] = null
      cents.foreach { case (cid, cv, cn) =>
        val cos = SimilaritySearch.safeCos(SimilaritySearch.dotKernel(e, cv), ne, cn)
        if (cos > best) { best = cos; bestId = cid; bestVec = cv }
      }
      (bestId, bestVec)
    }
    val vecs = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, f) => id -> f.map(_.toDouble) }.toMap
    val cellMap = vecs.map { case (id, e) => id -> cellOf(e)._1 }
    out.foreach { r =>
      val qid = r.getAs[Long]("query_id"); val nid = r.getAs[Long]("neighbor_id")
      assert(cellMap(qid) == cellMap(nid), s"($qid,$nid) cross-cell candidate")
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    // every query returns exactly min(k, own-cell population - 1) rows —
    // the probe scans its cell, the whole cell, and nothing else
    val cellPop = cellMap.values.groupBy(identity).view.mapValues(_.size).toMap
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.length == math.min(5, cellPop(cellMap(q)) - 1), s"query $q row count")
    }
    // numeric ADC-vs-reconstruction parity end-to-end is pinned by the
    // q_ann_ivfpq oracle hash-match (the DuckDB side reconstructs from
    // scratch); recall vs brute is the audit row's job
    val brute = SimilaritySearch.bruteForceTopK(corpus, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    info(f"IVF-PQ recall@5 vs brute force: ${got.intersect(brute).size.toDouble / brute.size}%.2f")
  }

  test("pqNoveltyProbe: fused cell_max_adc equals a driver recomputation; index shrinks") {
    val corpusDf = corpus.filter(col("vec_id") % 3 =!= 0)
    val batchDf = corpus.filter(col("vec_id") % 3 === 0)
    val idx = Pq.buildPqSemanticIndex(corpusDf, cellCap = Int.MaxValue)
    val out = Pq.pqNoveltyProbe(batchDf, idx).collect()
    assert(out.nonEmpty)

    // unpack the packed cells and recompute every verdict driver-side with
    // independent loops over the SAME integer decomposition
    val members: Map[Int, Array[(Long, Array[Int], Long)]] =
      idx.cells.collect().map { r =>
        r.getAs[Int]("cell") ->
          r.getSeq[org.apache.spark.sql.Row](1).map { m =>
            (m.getLong(0), m.getSeq[Int](1).toArray, m.getLong(2))
          }.toArray
      }.toMap
    val m = idx.books.length
    val subLen = idx.books(0)(0)._2.length
    val stride = idx.nCodesInit
    def quant(x: Double): Long =
      Math.round(SimilaritySearch.round6(x) * 1e6)
    val qVecs = batchDf.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    out.foreach { r =>
      val qid = r.getAs[Long]("vec_id")
      val q = qVecs(qid).map(_.toDouble)
      val qn = SimilaritySearch.l2NormKernel(q)
      var bestC = -1; var best = Double.NegativeInfinity
      var bestVec: Array[Double] = null
      idx.centroids.foreach { case (ci, cv, cn) =>
        val cos = SimilaritySearch.safeCos(SimilaritySearch.dotKernel(q, cv), qn, cn)
        if (cos > best) { best = cos; bestC = ci; bestVec = cv }
      }
      assert(r.getAs[Int]("cell") == bestC, s"probe $qid routed to the wrong cell")
      val dqc = quant(SimilaritySearch.round6(SimilaritySearch.dotKernel(q, bestVec)))
      val lut = Array.tabulate(m, stride)((_, _) => 0L)
      for (s <- 0 until m; (ord, bv) <- idx.books(s)) {
        var d = 0.0; var i = 0
        while (i < subLen) { d += q(s * subLen + i) * bv(i); i += 1 }
        lut(s)(ord) = quant(SimilaritySearch.round6(d))
      }
      members.get(bestC) match {
        case None =>
          assert(r.isNullAt(r.fieldIndex("max_cos")), s"probe $qid: empty cell must be null")
          assert(r.getAs[String]("reason") == "ok")
        case Some(ms) =>
          val scored = ms.map { case (id, codes, nsq) =>
            var dsum = dqc
            codes.zipWithIndex.foreach { case (c, s) => dsum += lut(s)(c) }
            val dn = qn * math.sqrt(nsq.toDouble / 1e6)
            val cos = if (nsq <= 0L || dn == 0.0) -1.0
              else SimilaritySearch.round6((dsum.toDouble / 1e6) / dn)
            (cos, id)
          }
          val (wantCos, wantId) = scored.maxBy { case (c, id) => (c, -id) }
          assert(r.getAs[Double]("max_cos") == wantCos, s"probe $qid cos")
          assert(r.getAs[Long]("best_match") == wantId, s"probe $qid best id")
      }
    }

    // the compression claim: the PQ hint is an order of magnitude under
    // the raw index's own hint for the same corpus
    val raw = graft.operators.Dedup.buildSemanticIndex(corpusDf, cellCap = Int.MaxValue)
    assert(idx.sizeHintBytes > 0 && raw.sizeHintBytes > 0)
    assert(idx.sizeHintBytes * 5 < raw.sizeHintBytes,
      s"pq hint ${idx.sizeHintBytes} not small vs raw ${raw.sizeHintBytes}")
  }

  test("zero-norm query pins every cosine to -1 instead of NaN") {
    val books = Pq.fitCodebooks(corpus, m = 8, nCodes = 8, iters = 1)
    val zeroQ = Seq((999999L, Array.fill(64)(0f))).toDF("vec_id", "embedding")
    val out = Pq.pqTopK(corpus, zeroQ, k = 3, iters = 1).collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Double]("cos") == -1.0))
    assert(books.forall(_.nonEmpty))
  }

  test("retirePqSemanticIndex: no doomed id in cells or evidence; survivor codes carry unchanged") {
    val emb = Tables.embeddings(spark, sf)
    val doomed = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val idx = Pq.buildPqSemanticIndex(emb, k = 4, iters = 1)
    val retired = Pq.retirePqSemanticIndex(idx, doomed)
    // attestation: no doomed member in any packed cell
    assert(retired.cells
      .select(explode(col("members.id")).as("vec_id"))
      .join(doomed, Seq("vec_id"), "left_semi").isEmpty)
    // survivors all packed, each with the SAME codes+nsq as before
    def flat(cells: org.apache.spark.sql.DataFrame) = cells
      .select(explode(col("members")).as("m"))
      .select(col("m.id"), col("m.codes"), col("m.nsq"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2))).toSet
    val doomedSet = doomed.collect().map(_.getLong(0)).toSet
    assert(flat(retired.cells) == flat(idx.cells).filterNot(t => doomedSet(t._1)),
      "survivors must carry their original codes and nsq byte-identical")
    // probe evidence never names a doomed id
    val probes = emb.select(
      (col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val after = Pq.pqNoveltyProbe(probes, retired).collect()
    assert(!after.exists(r => !r.isNullAt(3) && doomedSet(r.getLong(3))),
      "a retired vector must never surface as ADC match evidence")
  }
}
