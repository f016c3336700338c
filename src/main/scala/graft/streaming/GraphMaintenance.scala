package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.BloomFilter
import graft.operators.SimilaritySearch

/** Continuously maintained kNN-graph artifact — the streaming arm of
  * [[SimilaritySearch.knnGraphIncrement]]: an always-on ingest stream
  * folds every micro-batch of vectors into the serving graph, exactly
  * (the merge==rebuild invariant holds per fold because the coarse
  * quantizer stays PINNED to the refresh-time corpus; it re-fits only at
  * the next compaction, per the centroid-staleness contract in SCALE.md).
  *
  * State model: the graph is DERIVED state — an index artifact, not
  * stream state — and it lives on RELIABLE storage, not in the streaming
  * checkpoint and not in `localCheckpoint` lineage: `workDir` holds
  *   - `centroids/`   the frozen coarse quantizer (written once per epoch),
  *   - `routing/`     (vec_id, embedding, cell), parquet PARTITIONED BY cell,
  *   - `graph/`       (vec_id, neighbor_id, rank, cos, cell), partitioned by cell,
  *   - `folded/`      the replay HIGH-WATER marker (`hw-<maxBatchId>`,
  *                    swept — O(1) files however many batches ever fold;
  *                    monotone batchIds make `id <= max` the replay test).
  * Restart semantics are therefore the artifact's: [[GraphMaintainer.recover]]
  * reopens `workDir` and continues folding — an executor or driver loss
  * never costs the epoch (the failure mode `localCheckpoint`, documented
  * non-fault-tolerant, could not survive).
  *
  * Per-fold cost is genuinely incremental: the batch alone is assigned to
  * cells (O(|batch| · nCentroids) kernel work); the stored corpus
  * contributes ONLY its touched-cell slice — both `routing/` and `graph/`
  * are partitioned by cell, so the reads partition-prune to the batch's
  * cells — and the writes are dynamic partition overwrites of those same
  * cells. Untouched cells are never read, re-ranked, or rewritten, so
  * steady-state work tracks the ingest rate × mean cell size, never the
  * accumulated corpus.
  *
  * Idempotence / at-least-once: folds are replay-safe three ways —
  * (1) an applied batchId short-circuits on the `folded/` high-water;
  * (2) a batch vector whose vec_id is already stored WITH THE SAME
  * embedding is a replayed row (crash between the routing write and the
  * marker) and is dropped; a same-id DIFFERENT-embedding row is a true
  * update/re-embed and throws — the fail-loud append-only contract
  * [[SimilaritySearch.knnGraphIncrement]] pins; (3) the re-rank dedups
  * (vec_id, neighbor_id) before the window, so re-merging edges a
  * half-applied fold already wrote cannot double-count a neighbor.
  * The id-overlap probe is Bloom-prescreened (driver-held filter over all
  * stored ids, fed per fold), so the common no-collision fold never scans
  * stored ids at all.
  */
final class GraphMaintainer private (
    spark: SparkSession, workDir: String, val k: Int,
    centroids: Broadcast[Array[(Long, Array[Double], Double)]],
    idFilter: BloomFilter, epoch: Int) {
  import GraphMaintainer._

  /** Cross-JVM single-ownership ([[OwnerFence]]): the fold/retire writes
    * are dynamic partition OVERWRITES — two live maintainers interleaving
    * them would corrupt cell partitions non-transactionally, so recover()
    * takes over by landing the next owner epoch and a superseded
    * maintainer fails loud at its next mutation entry.
    */
  private def assertOwner(): Unit =
    OwnerFence.assertOwner(fs, s"$workDir/owner", epoch, "GraphMaintainer")

  private val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The maintained artifact — what [[SimilaritySearch.graphSearchTopK]]
    * walks and the recall audit measures at the next refresh. Always the
    * on-disk state, so a recovered maintainer serves the same frame.
    */
  def graph: DataFrame = spark.read.parquet(s"$workDir/graph")
    .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"))

  /** Vectors folded so far (refresh corpus + every batch). */
  def corpus: DataFrame = spark.read.parquet(s"$workDir/routing")
    .select(col("vec_id"), col("embedding"))

  /** Fold one batch of vectors in — exact per the merge==rebuild
    * invariant (SimilaritySpec pins it); chained folds stay exact because
    * the quantizer never drifts mid-epoch. `batchId` (from foreachBatch)
    * makes the fold skip already-applied streaming batches on replay.
    *
    * Returns the fold's INFLUENCE SET — every vertex whose edge list may
    * have changed (the batch plus its cells' stored members): the
    * `touched` input [[SimilaritySearch.labelPropagateIncrement]] re-votes
    * after a fold. Empty for skipped/replayed batches.
    */
  def fold(batch: DataFrame, batchId: Option[Long] = None): DataFrame = synchronized {
    import spark.implicits._
    assertOwner()
    def noneTouched = spark.emptyDataset[Long].toDF("vec_id")
    // checkpointed batchIds are monotone: id <= the high-water marker IS
    // "already folded" — one swept marker file carries it, where the old
    // one-empty-file-per-batchId protocol grew the folded/ directory one
    // inode per micro-batch forever (2.6M files after a month of 1 s
    // batches); legacy per-batch markers read as their max and sweep out
    if (batchId.exists(id => foldedHighWater.exists(_ >= id)))
      return noneTouched
    val b0 = narrow(batch).localCheckpoint()
    if (b0.isEmpty) return noneTouched

    // id-overlap gate: Bloom prescreen, exact confirm only on a hit
    val ids = b0.select(col("vec_id")).as[Long].collect()
    val suspects = ids.filter(idFilter.mightContainLong)
    val replayIds: Set[Long] = if (suspects.isEmpty) Set.empty else {
      val stored = spark.read.parquet(s"$workDir/routing")
        .join(broadcast(suspects.toSeq.toDF("vec_id")), Seq("vec_id"), "left_semi")
        .select(col("vec_id"), col("embedding").as("stored_emb"))
      val overlap = b0.join(broadcast(stored), Seq("vec_id"))
        .select(col("vec_id"),
          (col("embedding") === col("stored_emb")).as("same"))
        .as[(Long, Boolean)].collect()
      val updates = overlap.collect { case (id, false) => id }
      require(updates.isEmpty,
        s"GraphMaintainer.fold: vec_ids ${updates.take(5).mkString(", ")} are " +
          "already stored with DIFFERENT embeddings — updates/re-embeds " +
          "break the merge==rebuild invariant; rebuild the epoch instead")
      overlap.collect { case (id, true) => id }.toSet
    }
    val b = if (replayIds.isEmpty) b0
      else b0.join(broadcast(replayIds.toSeq.toDF("vec_id")), Seq("vec_id"), "left_anti")
    // re-check the fence at the write boundary: unlike the lake/Bm25
    // maintainers, the partition-overwrite commit has no atomic rename
    // backstop, so the check belongs as close to the writes as possible
    assertOwner()
    val touched =
      if (replayIds.size < ids.length) applyFold(b) else noneTouched
    ids.foreach(idFilter.putLong)
    batchId.foreach(commitFoldedHighWater)
    touched
  }

  /** The replay high-water: the max over `folded/`'s swept `hw-` markers
    * and any legacy one-file-per-batchId names (pre-high-water dirs).
    * The directory is sweep-bounded, so this listing is O(1).
    */
  private def foldedHighWater: Option[Long] = {
    val dir = new Path(s"$workDir/folded")
    if (!fs.exists(dir)) return None
    fs.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case n if n.startsWith("hw-") &&
          n.stripPrefix("hw-").forall(_.isDigit) =>
        n.stripPrefix("hw-").toLong
      case n if n.nonEmpty && n.forall(_.isDigit) => n.toLong // legacy
    }.maxOption
  }

  /** Advance the high-water: land `hw-<id>` (the value lives in the
    * NAME — max wins, so a crash at any point leaves either the old
    * marker or both, never none), then sweep superseded markers
    * including legacy per-batch files. Failures in the sweep are
    * harmless (max still wins); the sweep is what keeps the directory
    * O(1) instead of one file per micro-batch forever.
    */
  private def commitFoldedHighWater(id: Long): Unit = {
    val dir = new Path(s"$workDir/folded")
    fs.mkdirs(dir)
    fs.create(new Path(dir, f"hw-$id%019d"), true).close()
    fs.listStatus(dir).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n.startsWith("hw-") && n.stripPrefix("hw-").forall(_.isDigit) &&
          n.stripPrefix("hw-").toLong < id) ||
          (n.nonEmpty && n.forall(_.isDigit) && n.toLong < id)
      }
      .foreach(fs.delete(_, false))
  }

  private def applyFold(b: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val batchCells = SimilaritySearch.cellAssign(b, centroids).localCheckpoint()
    val touched = batchCells.select(col("cell")).distinct()
      .collect().map(_.getLong(0))
    // partition-pruned reads: only the batch's cells are scanned
    val oldTouched = spark.read.parquet(s"$workDir/routing")
      .filter(col("cell").isin(touched: _*))
      .select(col("vec_id"), col("embedding"), col("cell").cast("long").as("cell"))
      .localCheckpoint()
    val fresh = SimilaritySearch
      .cellEdgesWithCell(oldTouched.unionByName(batchCells), broadcast(batchCells))
      .unionByName(SimilaritySearch.cellEdgesWithCell(broadcast(batchCells), oldTouched))
    val oldEdges = spark.read.parquet(s"$workDir/graph")
      .filter(col("cell").isin(touched: _*))
      .select(col("vec_id"), col("neighbor_id"), col("cell").cast("long").as("cell"),
        col("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val reranked = oldEdges.unionByName(fresh)
      // replay safety: a half-applied fold's edges re-merge as duplicates
      .dropDuplicates("vec_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"), col("cell"))
    // dynamic partition overwrite: only the touched cells' files change.
    // The pre-write repartition on cell puts each cell's rows in ONE task,
    // so every overwritten partition dir holds one file — without it, every
    // shuffle task that owns a few rows of a cell commits its own small
    // file and the per-fold commit cost scales with tasks × cells
    reranked.repartition(col("cell")).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(s"$workDir/graph")
    oldTouched.unionByName(batchCells)
      .repartition(col("cell")).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(s"$workDir/routing")
    oldTouched.select(col("vec_id"))
      .unionByName(batchCells.select(col("vec_id"))).localCheckpoint()
  }

  /** RETIRE stored vectors from the landed artifact —
    * [[SimilaritySearch.knnGraphRetire]] at the maintainer: the frozen
    * quantizer makes every edge same-cell, so only the doomed ids' cells
    * are read (partition-pruned), their survivors re-score, and ONLY
    * those cell partitions of `graph/` and `routing/` rewrite. Returns
    * the influence set (the touched cells' surviving vertices — the
    * re-vote input, like [[fold]]'s).
    *
    * Idempotent by re-run: touched cells are found via the doomed ids in
    * `routing/` OR as a vertex/neighbor in `graph/` (both column-pruned
    * id scans), so a crash between the partition rewrites converges on
    * the next call instead of stranding stale edges behind an
    * already-cleaned routing. Cell partitions left without survivors (or
    * without edges — one survivor makes no pair) are deleted explicitly:
    * dynamic overwrite only touches partitions present in the written
    * frame. Retired ids stay in the Bloom prescreen (additive-only) —
    * harmless: the exact confirm consults `routing/`, so a later
    * re-insert of a retired id folds as a NEW vector.
    */
  def retire(tombstones: DataFrame): DataFrame = synchronized {
    assertOwner()
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val doomed = tombstones.select(col("vec_id")).localCheckpoint()
    // the quantizer stores VERBATIM corpus vectors (ivfCentroids is a
    // draw, not a mean): a doomed centroid's raw embedding would survive
    // in centroids/ and keep routing folds — that is a false forget
    // attestation only an epoch rebuild can honor, so fail loud
    val doomedCentroids = doomed.as[Long].collect().toSet
      .intersect(centroids.value.map(_._1).toSet)
    require(doomedCentroids.isEmpty,
      s"GraphMaintainer.retire: vec_ids ${doomedCentroids.take(5).mkString(", ")} " +
        "are quantizer centroids — their raw embeddings live in centroids/ " +
        "and route every fold; forgetting them requires rebuilding the " +
        "epoch (GraphMaintainer.build over the surviving corpus)")
    val routingCells = spark.read.parquet(s"$workDir/routing")
      .join(broadcast(doomed), Seq("vec_id"), "left_semi")
      .select(col("cell").cast("long").as("cell"))
    val g = spark.read.parquet(s"$workDir/graph")
    val graphCells = g
      .join(broadcast(doomed), Seq("vec_id"), "left_semi")
      .select(col("cell").cast("long").as("cell"))
      .unionByName(g
        .join(broadcast(doomed), g("neighbor_id") === doomed("vec_id"), "left_semi")
        .select(col("cell").cast("long").as("cell")))
    val touched = routingCells.unionByName(graphCells)
      .distinct().as[Long].collect()
    if (touched.isEmpty) return spark.emptyDataset[Long].toDF("vec_id")
    val survivors = spark.read.parquet(s"$workDir/routing")
      .filter(col("cell").isin(touched: _*))
      .select(col("vec_id"), col("embedding"), col("cell").cast("long").as("cell"))
      .join(broadcast(doomed), Seq("vec_id"), "left_anti")
      .localCheckpoint()
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val repaired = SimilaritySearch.cellEdgesWithCell(survivors, survivors)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"), col("cell"))
      .localCheckpoint()
    // re-check the fence at the write boundary (same rationale as fold:
    // the partition overwrite has no atomic rename backstop, and the
    // derivation above can take long enough for a takeover to land)
    assertOwner()
    survivors.repartition(col("cell")).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(s"$workDir/routing")
    repaired.repartition(col("cell")).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(s"$workDir/graph")
    // partitions the writes above could not empty: no survivors → no
    // routing rows; <2 survivors → no edges
    val survivedCells = survivors.select(col("cell")).distinct().as[Long].collect().toSet
    val edgedCells = repaired.select(col("cell")).distinct().as[Long].collect().toSet
    touched.filterNot(survivedCells).foreach(c =>
      fs.delete(new Path(s"$workDir/routing/cell=$c"), true))
    touched.filterNot(edgedCells).foreach(c =>
      fs.delete(new Path(s"$workDir/graph/cell=$c"), true))
    survivors.select(col("vec_id"))
  }

  /** Attach to a vector stream: every micro-batch folds into the graph
    * via foreachBatch (the artifact-maintenance loop; empty batches are
    * skipped so idle triggers don't churn checkpoints, and the batchId
    * marker makes redelivered batches no-ops).
    */
  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        if (!b.isEmpty) { fold(b.toDF(), Some(id)); () }
      }
      .start()
}

object GraphMaintainer {

  private def narrow(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"))

  /** Build the epoch's artifacts in `workDir` (quantizer, routing, graph)
    * from the refresh-time corpus, then maintain from there.
    */
  def build(initialCorpus: DataFrame, workDir: String,
      k: Int = 5, nCentroids: Int = 16): GraphMaintainer = {
    val spark = initialCorpus.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val corpus = narrow(initialCorpus)
    val cs = SimilaritySearch.ivfCentroids(corpus, nCentroids)
    cs.toSeq.map { case (cid, emb, norm) => (cid, emb, norm) }
      .toDF("cid", "emb", "norm")
      .coalesce(1).write.mode("overwrite").parquet(s"$workDir/centroids")
    val bcast = spark.sparkContext.broadcast(cs)
    val cells = SimilaritySearch.cellAssign(corpus, bcast).localCheckpoint()
    cells.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$workDir/routing")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    SimilaritySearch.cellEdgesWithCell(cells, cells)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"), col("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$workDir/graph")
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$workDir/meta.json"), true)
    out.write(s"""{"k":$k}""".getBytes("UTF-8")); out.close()
    new GraphMaintainer(spark, workDir, k, bcast, bloomOf(spark, workDir),
      OwnerFence.acquire(fs, s"$workDir/owner"))
  }

  /** Reopen `workDir` after a restart: the frozen quantizer, routing, and
    * graph are the landed artifacts, so the recovered maintainer's next
    * fold equals the uninterrupted one's (GraphMaintenanceSpec pins it).
    */
  def recover(spark: SparkSession, workDir: String): GraphMaintainer = {
    import spark.implicits._
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(s"$workDir/meta.json"))
    val meta = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val k = """"k":(\d+)""".r.findFirstMatchIn(meta)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"$workDir/meta.json: no k"))
    val cs = spark.read.parquet(s"$workDir/centroids")
      .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
    new GraphMaintainer(spark, workDir, k,
      spark.sparkContext.broadcast(cs), bloomOf(spark, workDir),
      OwnerFence.acquire(fs, s"$workDir/owner"))
  }

  /** Driver-held Bloom over every stored id — the O(1) prescreen that
    * keeps the common no-collision fold from scanning stored ids.
    */
  private def bloomOf(spark: SparkSession, workDir: String): BloomFilter = {
    val ids = spark.read.parquet(s"$workDir/routing").select(col("vec_id"))
    val n = ids.count()
    ids.stat.bloomFilter("vec_id", math.max(1000000L, 8 * n), 0.001)
  }
}
