package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.SimilaritySearch
import graft.streaming.GraphMaintainer

class GraphMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-gm-$tag").toString

  private def rebuildWant = {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    SimilaritySearch.knnGraph(
        emb.select(col("vec_id"), col("embedding")),
        quantizerSource = Some(old))
      .collect().map(_.toSeq).toSet
  }

  test("chained folds equal the frozen-quantizer full rebuild") {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val b1 = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") % 2 === 0)
    val b2 = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") % 2 =!= 0)
    val m = GraphMaintainer.build(old, tmp("chain"))
    m.fold(b1)
    m.fold(b2)
    assert(m.graph.collect().map(_.toSeq).toSet == rebuildWant)
    assert(m.corpus.count() == emb.count())
  }

  test("retire purges vectors from the landed artifact; re-run converges; a retired id re-inserts as new") {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val dir = tmp("retire")
    val m = GraphMaintainer.build(old, dir)
    m.fold(batch)
    // a quantizer centroid's raw embedding lives in centroids/ — retiring
    // one must fail loud (only an epoch rebuild can honor that forget)
    val centroidIds = spark.read.parquet(s"$dir/centroids")
      .select(col("cid").as("vec_id"))
    intercept[IllegalArgumentException](m.retire(centroidIds.limit(1)))
    val doomed = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
      .join(centroidIds, Seq("vec_id"), "left_anti")
    // capture one doomed vertex's stale edges for the crash simulation
    val staleProbe = m.graph
      .join(doomed, Seq("vec_id"), "left_semi").limit(3)
    val stale = spark.read.parquet(s"$dir/graph")
      .join(staleProbe.select(col("vec_id"), col("neighbor_id")),
        Seq("vec_id", "neighbor_id"), "left_semi")
      .localCheckpoint()
    assert(stale.count() > 0)
    m.retire(doomed)
    // artifact == frozen-quantizer rebuild over the survivors
    val want = graft.operators.SimilaritySearch
      .knnGraph(emb.join(doomed, Seq("vec_id"), "left_anti"),
        quantizerSource = Some(old))
      .collect().map(_.toSeq).toSet
    assert(m.graph.collect().map(_.toSeq).toSet == want)
    // forget attestation: no doomed id as vertex, neighbor, or stored row
    val ids = doomed.collect().map(_.getLong(0)).toSet
    val g = m.graph.collect()
    assert(!g.exists(r => ids(r.getLong(0)) || ids(r.getLong(1))))
    assert(m.corpus.join(doomed, Seq("vec_id"), "left_semi").isEmpty)
    // re-running the same retire is a no-op that still serves `want`
    m.retire(doomed)
    assert(m.graph.collect().map(_.toSeq).toSet == want)
    // crash convergence: a retire that rewrote routing/ but died before
    // graph/ leaves stale doomed edges behind an already-clean routing —
    // the re-run must find their cells through the GRAPH references
    stale.write.mode("append").partitionBy("cell").parquet(s"$dir/graph")
    assert(m.graph.collect().map(_.toSeq).toSet != want, "stale edges planted")
    m.retire(doomed)
    assert(m.graph.collect().map(_.toSeq).toSet == want,
      "re-run must purge stale graph references after a simulated crash")
    // a retired id re-inserts as a NEW vector (bloom hit, exact confirm
    // finds routing empty for it) and the fold stays exact
    val one = emb.filter(col("vec_id") === ids.min)
    m.fold(one)
    val want2 = graft.operators.SimilaritySearch
      .knnGraph(emb.join(doomed, Seq("vec_id"), "left_anti").unionByName(one),
        quantizerSource = Some(old))
      .collect().map(_.toSeq).toSet
    assert(m.graph.collect().map(_.toSeq).toSet == want2)
  }

  test("attached to a MemoryStream, the artifact matches the rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val rows = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    val input = MemoryStream[(Long, Array[Float])]
    val m = GraphMaintainer.build(old, tmp("stream"))
    val q = m.attach(input.toDF().toDF("vec_id", "embedding"))
    try {
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
      assert(m.graph.collect().map(_.toSeq).toSet == rebuildWant)
    } finally q.stop()
  }

  test("recovery: a maintainer reopened from the landed artifacts folds on as if uninterrupted") {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val b1 = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") % 2 === 0)
    val b2 = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") % 2 =!= 0)
    val dir = tmp("recover")
    val m1 = GraphMaintainer.build(old, dir)
    m1.fold(b1)
    // "crash": drop the maintainer object entirely; the graph, routing and
    // quantizer live only in workDir
    val m2 = GraphMaintainer.recover(spark, dir)
    m2.fold(b2)
    assert(m2.graph.collect().map(_.toSeq).toSet == rebuildWant,
      "recovered maintainer must produce the uninterrupted epoch's graph")
    assert(m2.corpus.count() == emb.count())
    // recovery TOOK OWNERSHIP: the zombie m1 is fenced — two maintainers
    // interleaving dynamic partition overwrites would corrupt cells
    val e = intercept[IllegalArgumentException](m1.fold(b2, Some(99L)))
    assert(e.getMessage.contains("FENCED"), e.getMessage)
  }

  test("the folded/ marker directory stays O(1) files across many batchId folds; legacy markers sweep out") {
    val emb = Tables.embeddings(spark, sf)
    val dir = tmp("hw")
    val m = GraphMaintainer.build(emb.filter(col("vec_id") % 5 =!= 0), dir)
    // a legacy per-batch marker left by a pre-high-water deployment
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/folded"))
    java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$dir/folded/2"))
    // its id must still dedupe (max semantics under monotone batchIds)...
    assert(m.fold(emb.filter(col("vec_id") % 5 === 0).limit(1), Some(1L))
      .isEmpty, "batch 1 <= legacy high-water 2 must be recognized as folded")
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    (3L to 8L).foreach { id =>
      m.fold(fresh.filter(col("vec_id") % 7 === id - 3), Some(id))
    }
    val markerFiles = new java.io.File(s"$dir/folded").listFiles()
      .filterNot(_.getName.startsWith(".")) // Hadoop .crc sidecars
    assert(markerFiles.length == 1,
      s"six folds must leave ONE swept high-water marker, got " +
        markerFiles.map(_.getName).mkString(", "))
    assert(markerFiles.head.getName == f"hw-${8L}%019d",
      "the marker name carries the max id; the legacy file swept out")
    assert(m.fold(fresh.limit(1), Some(5L)).isEmpty,
      "a superseded batchId must no-op against the high-water")
  }

  test("replayed batches are no-ops; a true re-embed fails loud") {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val b1 = emb.filter(col("vec_id") % 5 === 0)
    val m = GraphMaintainer.build(old, tmp("replay"))
    m.fold(b1)
    val want = m.graph.collect().map(_.toSeq).toSet
    // at-least-once redelivery: same rows, no batchId marker — the
    // embedding-equality check classifies every id as a replay
    m.fold(b1)
    assert(m.graph.collect().map(_.toSeq).toSet == want,
      "replaying an applied batch must not change the artifact")
    // same id, different vector = an update: must throw, not silently merge
    val reEmbed = b1.limit(1).withColumn("embedding",
      org.apache.spark.sql.functions.transform(col("embedding"), x => x * 2f))
    val e = intercept[IllegalArgumentException](m.fold(reEmbed))
    assert(e.getMessage.contains("DIFFERENT embeddings"))
  }

  test("labelPropagateIncrement over a fold's influence set equals the full re-propagation") {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    // sparse seeds so round 2 carries real hearsay (deltas can cascade)
    val seeds = emb.filter(col("vec_id") % 16 === 0)
      .select(col("vec_id"), col("label"))
    val m = GraphMaintainer.build(old, tmp("labels"))
    val oldLabels = SimilaritySearch
      .labelPropagateOnGraph(m.graph, seeds).localCheckpoint()
    val touched = m.fold(batch)
    assert(touched.count() > 0, "a non-empty fold must report its influence set")
    val full = SimilaritySearch.labelPropagateOnGraph(m.graph, seeds)
      .collect().map(_.toSeq).toSet
    val incr = SimilaritySearch
      .labelPropagateIncrement(m.graph, oldLabels, seeds, touched)
      .collect().map(_.toSeq).toSet
    assert(incr == full,
      "re-voting only the influence set must reproduce the full propagation")
  }

  test("a fold touches only the batch's cells on disk") {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val b1 = emb.filter(col("vec_id") % 5 === 0).limit(3)
    val dir = tmp("prune")
    val m = GraphMaintainer.build(old, dir)
    def partStamps = new java.io.File(s"$dir/graph").listFiles()
      .filter(_.getName.startsWith("cell="))
      .map(d => d.getName ->
        d.listFiles().map(f => f.getName -> f.lastModified()).toSet)
      .toMap
    val before = partStamps
    Thread.sleep(1100) // FS mtime granularity
    m.fold(b1)
    val touched = graft.operators.SimilaritySearch
      .cellAssign(b1.select(col("vec_id"), col("embedding")),
        spark.sparkContext.broadcast(
          SimilaritySearch.ivfCentroids(old.select(col("vec_id"), col("embedding")), 16)))
      .select(col("cell")).distinct().as[Long].collect()
      .map(c => s"cell=$c").toSet
    val after = partStamps
    val rewritten = after.keySet.filter(p => before.get(p) != after.get(p))
    assert(rewritten.nonEmpty && rewritten.subsetOf(touched),
      s"only the batch's cells may be rewritten: changed=$rewritten touched=$touched")
    assert((before.keySet -- touched).forall(p => before(p) == after(p)),
      "untouched cell partitions must be byte-stable across a fold")
  }
}
