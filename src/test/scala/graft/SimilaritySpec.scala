package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal = 0, identical = 1, opposite = -1") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 2f), Array(1f, 2f), 1.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0)
    ).toDF("a", "b", "expect")
    val out = df.select(
      round(SimilaritySearch.cosine(col("a"), col("b")), 9).as("cos"), col("expect"))
      .collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("cosine_similarity expression propagates null elements like the HOF form") {
    graft.plans.GraftFunctions.register(spark)
    val sql =
      """SELECT cosine_similarity(
        |  array(cast(1.0 as float), cast(null as float)),
        |  array(cast(1.0 as float), cast(2.0 as float))) AS c""".stripMargin
    assert(spark.sql(sql).collect().head.isNullAt(0))
    // the aggregate∘zip_with composition it claims parity with also nulls
    val hof = spark.sql(
      """SELECT aggregate(
        |  zip_with(array(cast(1.0 as float), cast(null as float)),
        |           array(cast(1.0 as float), cast(2.0 as float)),
        |           (p, q) -> cast(p as double) * cast(q as double)),
        |  cast(0.0 as double), (acc, v) -> acc + v) AS c""".stripMargin)
    assert(hof.collect().head.isNullAt(0))
  }

  test("bruteForceTopK returns k ordered neighbors per query, self excluded") {
    val emb = Tables.embeddings(spark, sf)
    val out = SimilaritySearch.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 10)
      .collect()
    assert(out.length == 30)
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rows) =>
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q))
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(sims.sameElements(sims.sorted.reverse), s"query $q not sorted")
    }
  }

  test("lshTopK candidates come from the query's bucket and recall is measurable") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    val lsh = SimilaritySearch.lshTopK(emb, queries, k = 5).collect()
    assert(lsh.nonEmpty)
    val brute = SimilaritySearch.bruteForceTopK(emb, queries, k = 5).collect()
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val brutePairs = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lshPairs.intersect(brutePairs).size.toDouble / brutePairs.size
    info(f"LSH recall@5 vs brute force: $recall%.2f (1/16 of corpus scanned per query)")
    assert(recall > 0.1) // 4 planes = 16 buckets; bucket-restricted recall is partial by design
  }

  test("embeddingNearDupLsh: recall vs brute force, no false positives, no collect") {
    import graft.operators.Dedup
    val emb = Tables.embeddings(spark, sf)
    val lsh = Dedup.embeddingNearDupLsh(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brute = Dedup.embeddingNearDupPairs(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every LSH pair is a true pair with the identical verified cosine
    assert(lsh.toSet.subsetOf(brute.toSet), "LSH emitted a non-pair or wrong cosine")
    val recall = if (brute.isEmpty) 1.0 else lsh.length.toDouble / brute.length
    info(f"near-dup LSH recall vs brute force: $recall%.2f (${lsh.length}/${brute.length} pairs)")
    assert(recall >= 0.8, f"16x4-band recall degraded: $recall%.2f")
    // scale contract: the plan is join-shaped — no driver-side matrix
    val plan = Dedup.embeddingNearDupLsh(emb).queryExecution.executedPlan.toString
    assert(plan.contains("Join"), plan)
  }

  test("ivfTopK centroid set is O(k): fixed size on a doubled corpus, TakeOrdered plan") {
    val emb = Tables.embeddings(spark, sf)
    val doubled = emb.union(emb.withColumn("vec_id", col("vec_id") + 100000))
    val c1 = SimilaritySearch.ivfCentroids(emb, 8)
    val c2 = SimilaritySearch.ivfCentroids(doubled, 8)
    assert(c1.length == 8 && c2.length == 8,
      "centroid count must not grow with the corpus")
    // deterministic: same call, same centroids
    assert(SimilaritySearch.ivfCentroids(emb, 8).map(_._1).toSeq == c1.map(_._1).toSeq)
    // selection plan is per-partition top-k, not a global sort
    val selPlan = emb
      .orderBy(org.apache.spark.sql.functions.md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(8).queryExecution.executedPlan.toString
    assert(selPlan.contains("TakeOrderedAndProject"), selPlan)
    val out = SimilaritySearch.ivfTopK(doubled, emb.filter(col("vec_id") < 5),
      k = 5, nCentroids = 8).collect()
    assert(out.nonEmpty)
  }

  test("ivfTopK probes only the query's cell and returns ordered neighbors") {
    val emb = Tables.embeddings(spark, sf)
    val out = SimilaritySearch.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q))
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(sims.sameElements(sims.sorted.reverse))
    }
  }

  test("ivfTopKKmeans: trained cells return ordered neighbors; recall measurable") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    val ivf = SimilaritySearch.ivfTopKKmeans(emb, queries, k = 5).collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q))
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(sims.sameElements(sims.sorted.reverse))
    }
    val brute = SimilaritySearch.bruteForceTopK(emb, queries, k = 5).collect()
    val ivfPairs = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val brutePairs = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivfPairs.intersect(brutePairs).size.toDouble / brutePairs.size
    info(f"IVF-kmeans recall@5 vs brute force: $recall%.2f (1/16 of corpus per probe)")
  }

  test("knnGraph edges restricted to the probe queries equal ivfTopK") {
    // same centroids, same cells, same candidates, same ranking — the graph
    // rows for any vertex ARE that vertex's IVF probe result
    val emb = Tables.embeddings(spark, sf)
    val graph = SimilaritySearch.knnGraph(emb, k = 5).collect()
      .filter(_.getAs[Long]("vec_id") < 5)
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("cos"))).toSet
    val probe = SimilaritySearch.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("cos"))).toSet
    assert(graph == probe)
  }

  test("knnGraph: every vertex gets <= k self-free, descending-cos edges") {
    val emb = Tables.embeddings(spark, sf)
    val out = SimilaritySearch.knnGraph(emb, k = 3).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("vec_id")).foreach { case (v, rows) =>
      assert(rows.length <= 3)
      assert(rows.forall(_.getAs[Long]("neighbor_id") != v))
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).sameElements(1 to rows.length))
      val sims = byRank.map(_.getAs[Double]("cos"))
      assert(sims.sameElements(sims.sorted.reverse))
    }
  }

  test("knnGraphIncrement: merging a batch equals the frozen-quantizer rebuild") {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val incremental = SimilaritySearch
      .knnGraphIncrement(SimilaritySearch.knnGraph(old), old, batch)
      .collect().map(_.toSeq).toSet
    val rebuild = SimilaritySearch
      .knnGraph(old.unionByName(batch), quantizerSource = Some(old))
      .collect().map(_.toSeq).toSet
    assert(incremental == rebuild)
    assert(incremental.nonEmpty)
  }

  test("knnGraphRetire: deleting vectors equals the frozen-quantizer rebuild on survivors") {
    val emb = Tables.embeddings(spark, sf)
    val doomed = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val retired = SimilaritySearch
      .knnGraphRetire(SimilaritySearch.knnGraph(emb), emb, doomed)
      .collect().map(_.toSeq).toSet
    val rebuild = SimilaritySearch
      .knnGraph(emb.join(doomed, Seq("vec_id"), "left_anti"),
        quantizerSource = Some(emb))
      .collect().map(_.toSeq).toSet
    assert(retired == rebuild)
    assert(retired.nonEmpty)
    // forget attestation at the index: no deleted id survives as a vertex
    // OR as anyone's neighbor
    val ids = doomed.collect().map(_.getLong(0)).toSet
    assert(!retired.exists(r =>
      ids(r.head.asInstanceOf[Long]) || ids(r(1).asInstanceOf[Long])))
    // retiring ids the corpus never held is a no-op
    import spark.implicits._
    val ghost = SimilaritySearch.knnGraphRetire(
      SimilaritySearch.knnGraph(emb), emb, Seq(10_000_000L).toDF("vec_id"))
      .collect().map(_.toSeq).toSet
    assert(ghost == SimilaritySearch.knnGraph(emb).collect().map(_.toSeq).toSet)
    // ...but a doomed id still in the GRAPH while missing from `corpus`
    // (the post-delete-corpus misuse) fails loud instead of silently
    // returning the old graph as a false attestation
    intercept[IllegalArgumentException](SimilaritySearch.knnGraphRetire(
      SimilaritySearch.knnGraph(emb),
      emb.join(doomed, Seq("vec_id"), "left_anti"), doomed))
  }

  test("labelPropagate: seeds immutable, monotone rounds, accuracy vs withheld truth") {
    val emb = Tables.embeddings(spark, sf)
    val seeds = emb.filter(col("vec_id") % 4 === 0).select(col("vec_id"), col("label"))
    val out = SimilaritySearch.labelPropagate(emb, seeds).collect()
    val byId = out.map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Long]("label"), r.getAs[Int]("round"))).toMap
    // every seed survives with round 0 and its own label
    val seedRows = seeds.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Int]("label").toLong).toMap
    seedRows.foreach { case (id, l) => assert(byId(id) == ((l, 0))) }
    // non-seeds were assigned in a later round, at most one row per vertex
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == out.length)
    out.foreach { r =>
      if (!seedRows.contains(r.getAs[Long]("vec_id")))
        assert(r.getAs[Int]("round") >= 1)
    }
    // accuracy against the withheld ground truth the corpus carries
    val truth = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label").toLong).toMap
    val scored = byId.filterNot { case (id, _) => seedRows.contains(id) }
    val acc = scored.count { case (id, (l, _)) => truth(id) == l }.toDouble /
      math.max(scored.size, 1)
    info(f"propagated ${scored.size} labels from ${seedRows.size} seeds; " +
      f"accuracy vs withheld truth: $acc%.2f")
    assert(scored.nonEmpty)
  }

  test("labelPropagate recovers planted group labels from two seeds") {
    // two orthogonal directions with per-row jitter axes; one seed per
    // group must label every member of its own group and never cross
    def vec(group: Int, row: Int): Array[Float] = {
      val v = new Array[Float](16)
      v(group) = 10f
      v(4 + row) = 1f + 0.1f * row
      v
    }
    val rows = (0 until 12).map(i => (i.toLong + 1, vec(i % 2, i)))
    val emb = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    // seeds: 1 (group 0), 2 (group 1)
    val seeds = spark.createDataFrame(Seq((1L, 100), (2L, 200)))
      .toDF("vec_id", "label")
    val out = SimilaritySearch
      .labelPropagate(emb, seeds, rounds = 3, k = 4, nCentroids = 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("label")).toMap
    out.foreach { case (id, l) =>
      val want = if ((id - 1) % 2 == 0) 100L else 200L
      assert(l == want, s"vec $id got label $l")
    }
    // labels never cross the planted groups; coverage is bounded by cell
    // reachability (a vertex whose cell holds no path to a seed stays
    // unlabeled — the cell-blocked graph's documented recall trade)
    assert(out.size >= 10, s"expected near-full coverage, got ${out.keySet}")
    assert(out.values.count(_ == 100L) >= 4 && out.values.count(_ == 200L) >= 4)
  }

  test("graphSearchTopK: ordered self-free results, deterministic, recall measurable") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val out = SimilaritySearch.graphSearchTopK(emb, queries, k = 5).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.length <= 5)
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q))
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).sameElements(1 to rows.length))
      val sims = byRank.map(_.getAs[Double]("cos"))
      assert(sims.sameElements(sims.sorted.reverse))
    }
    val again = SimilaritySearch.graphSearchTopK(emb, queries, k = 5).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
    val brute = SimilaritySearch.bruteForceTopK(emb, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val walk = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = walk.intersect(brute).size.toDouble / brute.size
    info(f"graph-walk recall@5 vs brute force (beam 8, 2 hops): $recall%.2f")
  }

  test("graphSearchTopK: a wider beam never loses recall on this corpus") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = SimilaritySearch.bruteForceTopK(emb, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(beam: Int): Double = {
      val got = SimilaritySearch.graphSearchTopK(emb, queries, k = 5, beam = beam)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    val (narrow, wide) = (recallAt(4), recallAt(16))
    assert(wide >= narrow - 1e-9, s"beam 16 recall $wide < beam 4 recall $narrow")
    info(f"recall@5: beam 4 = $narrow%.2f, beam 16 = $wide%.2f")
  }

  test("mrlTopK: exact full-width scores on the shortlist; wider prefix never loses recall") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = SimilaritySearch.bruteForceTopK(emb, queries, k = 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val got = SimilaritySearch.mrlTopK(emb, queries, k = 5).collect()
      .map(r => ((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")),
        r.getAs[Double]("cos")))
    // re-rank scores are the brute twin's arithmetic: any returned pair
    // that IS a true neighbor must carry the identical cosine
    got.foreach { case (pair, cos) =>
      brute.get(pair).foreach(b => assert(b == cos, s"$pair: $cos != $b"))
    }
    def recallAt(dPrefix: Int): Double = {
      val ids = SimilaritySearch.mrlTopK(emb, queries, k = 5, dPrefix = dPrefix)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      ids.intersect(brute.keySet).size.toDouble / brute.size
    }
    // a full-width "prefix" IS the brute search: recall must be 1.0, and
    // the narrow prefix must stay measurably useful
    assert(recallAt(64) == 1.0, "dPrefix = dim must reproduce brute exactly")
    val narrow = recallAt(16)
    assert(narrow > 0.0, "16-dim prefix should find some true neighbors")
    info(f"recall@5: dPrefix 16 = $narrow%.2f, 64 = 1.00")
  }

  test("annRecallAudit: per-method hits/recall equal a driver-side recomputation") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = ids(SimilaritySearch.bruteForceTopK(emb, queries, k = 5))
    val expected = Map(
      "ivf" -> ids(SimilaritySearch.ivfTopK(emb, queries)),
      "ivf_kmeans" -> ids(SimilaritySearch.ivfTopKKmeans(emb, queries)),
      "ivf_pq" -> ids(graft.operators.Pq.ivfPqTopK(emb, queries)),
      "ivf_pq_rerank" -> ids(graft.operators.Pq.ivfPqTopKRerank(emb, queries)),
      "ivf_pq_mp" -> ids(graft.operators.Pq.ivfPqTopKRerank(emb, queries, nprobe = 4)),
      "lsh" -> ids(SimilaritySearch.lshTopK(emb, queries)),
      "lsh_mp" -> ids(SimilaritySearch.lshMultiProbeTopK(emb, queries)),
      "mrl" -> ids(SimilaritySearch.mrlTopK(emb, queries)),
      "pq" -> ids(graft.operators.Pq.pqTopK(emb, queries)),
      "pq_rerank" -> ids(graft.operators.Pq.pqTopKRerank(emb, queries)),
      "sq8" -> ids(graft.operators.Sq.sq8TopK(emb, queries)))
    val audit = SimilaritySearch.annRecallAudit(emb, queries).collect()
    assert(audit.map(_.getString(0)).toSeq ==
      Seq("ivf", "ivf_kmeans", "ivf_pq", "ivf_pq_mp", "ivf_pq_rerank", "lsh",
        "lsh_mp", "mrl", "pq", "pq_rerank", "sq8"))
    audit.foreach { r =>
      val m = r.getString(0)
      val approx = expected(m)
      assert(r.getAs[Long]("returned") == approx.size, m)
      assert(r.getAs[Long]("hits") == approx.intersect(truth).size.toLong, m)
      assert(r.getAs[Long]("truth_n") == truth.size.toLong, m)
      val want = SimilaritySearch.round6(
        approx.intersect(truth).size.toDouble / truth.size)
      assert(r.getAs[Double]("recall") == want, m)
      assert(r.getAs[Double]("recall") >= 0.0 && r.getAs[Double]("recall") <= 1.0)
    }
    // sanity: the indexes aren't degenerate — at least one method recovers
    // at least one true neighbor even on the 50-vector sf0.001 fixture
    // (absolute recall here reflects fixture size, not operator quality)
    assert(audit.map(_.getAs[Double]("recall")).max > 0.0)
  }

  test("entry() flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("plane signs are deterministic and balanced-ish") {
    val p1 = SimilaritySearch.planeSigns(4, 64)
    val p2 = SimilaritySearch.planeSigns(4, 64)
    assert(p1 == p2)
    p1.foreach { plane =>
      val pos = plane.count(_ == 1)
      assert(pos > 16 && pos < 48, s"plane badly unbalanced: $pos/64 positive")
    }
  }

  test("bruteForceTopK scores without any join (broadcast matrix kernel)") {
    val emb = Tables.embeddings(spark, sf)
    val plan = SimilaritySearch.bruteForceTopK(emb, emb.filter(col("vec_id") < 3))
      .queryExecution.executedPlan.toString
    // scoring is mapPartitions over the corpus; the only shuffles are the
    // per-query window and the final presentation sort
    assert(plan.contains("MapPartitions"))
    assert(!plan.contains("Join"), s"no join expected in:\n$plan")
  }

  test("multi-probe LSH: superset of single-probe hits, recall never lower") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val single = SimilaritySearch.lshTopK(emb, queries).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val multi = SimilaritySearch.lshMultiProbeTopK(emb, queries).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // same planes, probe set strictly contains the base bucket: anything
    // the single probe scored is still a candidate, so any single-probe
    // top-k member can only be displaced by something scoring HIGHER
    val truth = SimilaritySearch.bruteForceTopK(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert((multi & truth).size >= (single & truth).size,
      s"multi-probe recall ${(multi & truth).size} < single ${(single & truth).size}")
    // candidate widening is real on this corpus: the audit shows strictly
    // more true neighbors recovered
    assert((multi & truth).size > (single & truth).size,
      "fixture should demonstrate the straddled-hyperplane recovery")
  }

  test("rankingMetrics: perfect ranking scores 1, right-set-wrong-order scores below, miss scores 0") {
    import spark.implicits._
    def ranked(rows: (Long, Long, Int)*) =
      rows.toSeq.toDF("query_id", "neighbor_id", "rank")
    val truth = ranked((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val k = 3
    def metrics(served: org.apache.spark.sql.DataFrame) = {
      val r = SimilaritySearch.rankingMetrics(truth, served, k).collect().head
      (r.getAs[Long]("hits"), r.getAs[Double]("mrr"), r.getAs[Double]("ndcg"))
    }
    // identical ranking: every metric maxes
    assert(metrics(truth) == ((3L, 1.0, 1.0)))
    // exact SET, reversed ORDER: recall still 3/3 and mrr 1 (rank-1 item
    // IS relevant), but graded nDCG sees the inversion — the signal
    // recall cannot provide
    val (h2, m2, n2) = metrics(ranked((1L, 12L, 1), (1L, 11L, 2), (1L, 10L, 3)))
    assert(h2 == 3L && m2 == 1.0 && n2 < 1.0 && n2 > 0.5)
    // first hit at rank 2: mrr halves
    val (h3, m3, n3) = metrics(ranked((1L, 99L, 1), (1L, 10L, 2), (1L, 98L, 3)))
    assert(h3 == 1L && m3 == 0.5 && n3 > 0.0 && n3 < 1.0)
    // total miss: everything zero
    assert(metrics(ranked((1L, 99L, 1), (1L, 98L, 2))) == ((0L, 0.0, 0.0)))
  }
}
