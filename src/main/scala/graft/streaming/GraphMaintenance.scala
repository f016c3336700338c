package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
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
  *   - `data/routing/fold=<token>/cell=<c>/`  (vec_id, embedding) cell slices,
  *   - `data/graph/fold=<token>/cell=<c>/`    (vec_id, neighbor_id, rank, cos),
  *   - `_commits/`    the MANIFEST LOG (see below) — the only thing readers trust,
  *   - `folded/`      the replay HIGH-WATER marker (`hw-<maxBatchId>`,
  *                    swept — O(1) files however many batches ever fold;
  *                    monotone batchIds make `id <= max` the replay test).
  * Restart semantics are therefore the artifact's: [[GraphMaintainer.recover]]
  * reopens `workDir` and continues folding — an executor or driver loss
  * never costs the epoch (the failure mode `localCheckpoint`, documented
  * non-fault-tolerant, could not survive).
  *
  * ATOMIC VERSIONED COMMIT: every fold/retire lands its touched cells'
  * rows as IMMUTABLE files under a fresh `fold=<token>/` directory (never
  * overwriting a live file), then publishes ONE manifest —
  * `_commits/m<ownerEpoch>-<seq>.txt`, a line per live (artifact, cell)
  * naming its token — by rename-without-overwrite. The rename is the
  * commit point: a crash anywhere before it publishes NOTHING (the landed
  * token dirs are invisible orphans [[vacuum]] sweeps), and both
  * artifacts move in the SAME commit, so the routing-clean/graph-stale
  * half-states the pre-manifest design could leave can no longer exist.
  * Readers resolve the lexicographically newest manifest; the owner
  * epoch LEADS the name, so a fenced zombie's late commit (acquired a
  * lower [[OwnerFence]] epoch, stalled past its fence check) sorts below
  * everything the new owner publishes and is never served once the new
  * owner commits — the fencing-token construction: writes are stamped
  * with the token and only the max-token writer's are honored. The
  * zombie additionally re-checks the fence AFTER its rename and BEFORE
  * advancing the replay marker, so a batch whose commit lost the race
  * can never be marked applied — redelivery re-folds it (the
  * embedding-equality probe makes the replay a no-op if the commit did
  * land visibly). This is the same backstop contract as the lake's
  * versioned rename and Bm25's marker rename; the design cites Delta's
  * commit-protocol ideas (public knowledge), the implementation is a
  * bespoke tab-separated format.
  *
  * Per-fold cost is genuinely incremental: the batch alone is assigned to
  * cells (O(|batch| · nCentroids) kernel work); the stored corpus
  * contributes ONLY its touched-cell slice — the manifest maps every
  * cell to its live files, so reads open exactly the touched cells'
  * directories (manifest-level pruning: untouched cells are never even
  * LISTED, which beats catalog partition pruning at 100 TB scale) — and
  * the commit replaces only the touched cells' manifest entries.
  * Untouched cells are never read, re-ranked, or rewritten, so
  * steady-state work tracks the ingest rate × mean cell size, never the
  * accumulated corpus.
  *
  * Idempotence / at-least-once: folds are replay-safe three ways —
  * (1) an applied batchId short-circuits on the `folded/` high-water;
  * (2) a batch vector whose vec_id is already stored WITH THE SAME
  * embedding is a replayed row (crash between the manifest commit and the
  * marker) and is dropped; a same-id DIFFERENT-embedding row is a true
  * update/re-embed and throws — the fail-loud append-only contract
  * [[SimilaritySearch.knnGraphIncrement]] pins; (3) the re-rank dedups
  * (vec_id, neighbor_id) before the window, so re-merging edges an
  * earlier commit already published cannot double-count a neighbor.
  * The id-overlap probe is Bloom-prescreened (driver-held filter over all
  * stored ids, fed per fold), so the common no-collision fold never scans
  * stored ids at all.
  */
final class GraphMaintainer private (
    spark: SparkSession, workDir: String, val k: Int,
    centroids: Broadcast[Array[(Long, Array[Double], Double)]],
    idFilter0: BloomFilter, epoch: Int, initialManifest: Option[String]) {
  import GraphMaintainer._

  // the id prescreen and the manifest it was built at: both move only
  // under the synchronized mutators (fold/retire/vacuum)
  private var idFilter: BloomFilter = idFilter0
  private var lastSeen: Option[String] = initialManifest

  /** Cross-JVM single-ownership ([[OwnerFence]]): recover() takes over by
    * landing the next owner epoch and a superseded maintainer fails loud
    * at its next mutation entry; the manifest rename (epoch-prefixed,
    * never-overwriting) backstops the residual check→commit window.
    */
  private def assertOwner(): Unit =
    OwnerFence.assertOwner(fs, s"$workDir/owner", epoch, "GraphMaintainer")

  private val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Resolve the manifest every read and the commit base work from —
    * ONCE per mutation. If someone ELSE committed since this maintainer
    * last looked (the only legal case: a fenced zombie's late rename
    * becoming visible before our next commit buries it), the Bloom
    * prescreen is rebuilt from the new state: a construction-time Bloom
    * would MISS the zombie-committed ids, let a redelivered batch slip
    * past the replay probe, and duplicate its rows into routing. Our own
    * commits record themselves in [[publish]], so the common path never
    * rebuilds.
    */
  private def resolveBase(): Map[(String, Long), String] = {
    val cur = manifestNames(fs, workDir).lastOption
    // the listing can only ever move FORWARD for a live maintainer (our
    // own vacuum keeps the newest; commits append): an empty or
    // regressed listing means _commits was deleted out-of-band or the
    // store returned an inconsistent view — treating it as "empty
    // corpus" would make the next commit publish a batch-only manifest
    // and silently orphan the whole stored corpus for vacuum to delete
    // (the same vacuous-pass hole OwnerFence.assertOwner refuses for
    // the owner dir)
    require(cur.isDefined || lastSeen.isEmpty,
      s"GraphMaintainer: _commits at $workDir lists no manifests but this " +
        s"maintainer last saw $lastSeen — the log was deleted out-of-band " +
        "or the listing is inconsistent; refusing to treat the corpus as empty")
    require(lastSeen.isEmpty || cur.exists(_ >= lastSeen.get),
      s"GraphMaintainer: the latest manifest regressed from $lastSeen to " +
        s"$cur at $workDir — out-of-band deletion or inconsistent listing; " +
        "refusing to commit over a rolled-back view of the corpus")
    val entries = cur.map(readManifest(fs, workDir, _)).getOrElse(Map.empty)
    if (cur != lastSeen) {
      idFilter = bloomOf(spark, workDir, entries)
      lastSeen = cur
    }
    entries
  }

  /** The maintained artifact — what [[SimilaritySearch.graphSearchTopK]]
    * walks and the recall audit measures at the next refresh. Always the
    * latest MANIFEST's state, so a recovered maintainer serves the same
    * frame and a torn or orphaned write is never visible.
    */
  def graph: DataFrame =
    readArtifact(spark, workDir, GraphArt, latestEntries(fs, workDir), None)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"))

  /** Vectors folded so far (refresh corpus + every batch). */
  def corpus: DataFrame =
    readArtifact(spark, workDir, RoutingArt, latestEntries(fs, workDir), None)
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
    // ONE manifest snapshot serves the replay probe, the touched-cell
    // reads, and the commit base (and refreshes the Bloom if a foreign
    // commit became visible)
    val base = resolveBase()

    // an at-least-once source can duplicate a record WITHIN one
    // micro-batch too: same-id same-embedding rows collapse here, and a
    // same-id DIFFERENT-embedding pair fails loud NOW — landing both
    // would corrupt routing silently, and only the NEXT fold touching
    // that id would throw, one fold too late to save the artifact
    val ids0 = b0.select(col("vec_id")).as[Long].collect()
    val (bIn, ids) =
      if (ids0.distinct.length == ids0.length) (b0, ids0)
      else {
        val conflicted = b0.groupBy(col("vec_id"))
          .agg(countDistinct(col("embedding")).as("ne"))
          .filter(col("ne") > 1)
          .select(col("vec_id")).as[Long].take(5)
        require(conflicted.isEmpty,
          s"GraphMaintainer.fold: vec_ids ${conflicted.mkString(", ")} appear " +
            "more than once IN THE BATCH with different embeddings — an " +
            "update/re-embed breaks the merge==rebuild invariant; rebuild " +
            "the epoch instead")
        (b0.dropDuplicates("vec_id"), ids0.distinct)
      }

    // id-overlap gate: Bloom prescreen, exact confirm only on a hit
    val suspects = ids.filter(idFilter.mightContainLong)
    val replayIds: Set[Long] = if (suspects.isEmpty) Set.empty else {
      val stored =
        readArtifact(spark, workDir, RoutingArt, base, None)
          .join(broadcast(suspects.toSeq.toDF("vec_id")), Seq("vec_id"), "left_semi")
          .select(col("vec_id"), col("embedding").as("stored_emb"))
      val overlap = bIn.join(broadcast(stored), Seq("vec_id"))
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
    val b = if (replayIds.isEmpty) bIn
      else bIn.join(broadcast(replayIds.toSeq.toDF("vec_id")), Seq("vec_id"), "left_anti")
    val touched =
      if (replayIds.size < ids.length) applyFold(b, base) else noneTouched
    ids.foreach(idFilter.putLong)
    // the marker advances only while STILL owner: a commit that raced a
    // takeover (landed its manifest after the new epoch — invisible the
    // moment the new owner publishes) must stay UNMARKED so the source
    // redelivers it; the replay probe then makes the redelivery exact
    // whether or not the racing commit ended up visible
    batchId.foreach { id => assertOwner(); commitFoldedHighWater(id) }
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

  private def applyFold(
      b: DataFrame, base: Map[(String, Long), String]): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val batchCells = SimilaritySearch.cellAssign(b, centroids).localCheckpoint()
    val touched = batchCells.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq
    // manifest-pruned reads: only the batch's cells' directories open
    val oldTouched =
      readArtifact(spark, workDir, RoutingArt, base, Some(touched.toSet))
        .select(col("vec_id"), col("embedding"), col("cell"))
        .localCheckpoint()
    val fresh = SimilaritySearch
      .cellEdgesWithCell(oldTouched.unionByName(batchCells), broadcast(batchCells))
      .unionByName(SimilaritySearch.cellEdgesWithCell(broadcast(batchCells), oldTouched))
    val oldEdges =
      readArtifact(spark, workDir, GraphArt, base, Some(touched.toSet))
        .select(col("vec_id"), col("neighbor_id"), col("cell"), col("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val reranked = oldEdges.unionByName(fresh)
      // replay safety: a visible racing commit's edges re-merge as duplicates
      .dropDuplicates("vec_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"), col("cell"))
    publish(base, touched, reranked, oldTouched.unionByName(batchCells))
    oldTouched.select(col("vec_id"))
      .unionByName(batchCells.select(col("vec_id"))).localCheckpoint()
  }

  /** Land both artifacts' touched-cell rows as immutable token dirs, then
    * publish ONE manifest replacing the touched cells' entries — cells
    * the new frames left empty simply drop out (no explicit directory
    * deletes; their old files become vacuum garbage). The fence re-check
    * sits immediately before the rename, narrowing the zombie window to
    * the rename itself, which the epoch-prefixed name then loses silently
    * (never served once the new owner commits) instead of corrupting.
    */
  private def publish(
      base: Map[(String, Long), String], touched: Seq[Long],
      graphDf: DataFrame, routingDf: DataFrame): Unit = {
    val (gTok, gCells) = landCells(fs, workDir, graphDf, GraphArt)
    val (rTok, rCells) = landCells(fs, workDir, routingDf, RoutingArt)
    val next = base --
      touched.map(c => (GraphArt, c)) -- touched.map(c => (RoutingArt, c)) ++
      gCells.map(c => (GraphArt, c) -> gTok) ++
      rCells.map(c => (RoutingArt, c) -> rTok)
    assertOwner()
    // record our own commit so resolveBase never mistakes it for a
    // foreign one (which would trigger a pointless Bloom rebuild)
    lastSeen = Some(commitManifest(fs, workDir, epoch, next))
  }

  /** RETIRE stored vectors from the landed artifact —
    * [[SimilaritySearch.knnGraphRetire]] at the maintainer: the frozen
    * quantizer makes every edge same-cell, so only the doomed ids' cells
    * are read (manifest-pruned), their survivors re-score, and ONLY
    * those cells' manifest entries move — in the same single atomic
    * commit as a fold, so no crash can strand stale edges behind an
    * already-clean routing (both artifacts publish together or not at
    * all). Returns the influence set (the touched cells' surviving
    * vertices — the re-vote input, like [[fold]]'s).
    *
    * Idempotent by re-run: touched cells are found via the doomed ids in
    * routing OR as a vertex/neighbor in the graph (both column-pruned
    * id scans), so re-running a completed retire is a no-op. Cells left
    * without survivors (or without edges — one survivor makes no pair)
    * drop out of the manifest. Retired ids stay in the Bloom prescreen
    * (additive-only) — harmless: the exact confirm consults routing, so
    * a later re-insert of a retired id folds as a NEW vector.
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
    val base = resolveBase()
    val routingCells = readArtifact(spark, workDir, RoutingArt, base, None)
      .join(broadcast(doomed), Seq("vec_id"), "left_semi")
      .select(col("cell"))
    val g = readArtifact(spark, workDir, GraphArt, base, None)
    val graphCells = g
      .join(broadcast(doomed), Seq("vec_id"), "left_semi")
      .select(col("cell"))
      .unionByName(g
        .join(broadcast(doomed), g("neighbor_id") === doomed("vec_id"), "left_semi")
        .select(col("cell")))
    val touched = routingCells.unionByName(graphCells)
      .distinct().as[Long].collect().toSeq
    if (touched.isEmpty) return spark.emptyDataset[Long].toDF("vec_id")
    val survivors =
      readArtifact(spark, workDir, RoutingArt, base, Some(touched.toSet))
        .select(col("vec_id"), col("embedding"), col("cell"))
        .join(broadcast(doomed), Seq("vec_id"), "left_anti")
        .localCheckpoint()
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val repaired = SimilaritySearch.cellEdgesWithCell(survivors, survivors)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"), col("cell"))
      .localCheckpoint()
    publish(base, touched, repaired, survivors)
    survivors.select(col("vec_id"))
  }

  /** Sweep commit garbage: manifests beyond the newest `keepManifests`
    * (≥ 2 recommended — a reader that resolved "latest" a moment ago must
    * still be able to open it), token cell-directories no retained
    * manifest references (crashed commits' orphans, replaced cell
    * slices), `.tmp-` debris, and superseded owner epochs. `graceMs`
    * shields a concurrent commit's just-landed-but-not-yet-published
    * files from the sweep — on a deployment where a fenced zombie could
    * be mid-commit, set it longer than the longest conceivable
    * land→rename gap (the same convention as the lake's data-file
    * vacuum). Returns the number of paths dropped.
    */
  def vacuum(keepManifests: Int = 2, graceMs: Long = 0L): Int = synchronized {
    assertOwner()
    require(keepManifests >= 1, "GraphMaintainer.vacuum: keepManifests >= 1")
    val names = manifestNames(fs, workDir)
    val keep = names.takeRight(keepManifests).toSet
    val referenced: Set[String] = names.filter(keep).flatMap { n =>
      readManifest(fs, workDir, n).map { case ((a, c), t) =>
        s"data/$a/fold=$t/cell=$c"
      }
    }.toSet
    val now = System.currentTimeMillis()
    var dropped = 0
    Seq(GraphArt, RoutingArt).foreach { a =>
      val root = new Path(s"$workDir/data/$a")
      if (fs.exists(root)) {
        fs.listStatus(root).filter(_.getPath.getName.startsWith("fold=")).foreach { fd =>
          fs.listStatus(fd.getPath)
            .filter(_.getPath.getName.startsWith("cell=")).foreach { cd =>
              val rel = s"data/$a/${fd.getPath.getName}/${cd.getPath.getName}"
              if (!referenced(rel) && now - cd.getModificationTime >= graceMs) {
                fs.delete(cd.getPath, true)
                dropped += 1
              }
            }
          // an emptied token dir sweeps too — but only once its whole
          // SUBTREE has been quiet past the grace: a token with no
          // cell= children yet may be a concurrent commit's mid-write
          // directory (only _temporary inside), and the dir's own mtime
          // is fixed at creation while Spark keeps writing underneath —
          // anchoring on the dir mtime alone would delete a write merely
          // LONGER than the grace, crashing the in-flight job instead of
          // letting it lose cleanly at the manifest rename. The clock is
          // re-read here because THIS pass's cell sweeps above just
          // touched the dir's mtime — against the loop-entry timestamp
          // a freshly-emptied token would read as "modified in the
          // future" and never sweep
          val nowEmpty = System.currentTimeMillis()
          if (!fs.listStatus(fd.getPath)
                .exists(_.getPath.getName.startsWith("cell=")) &&
              nowEmpty - newestMtime(fs, fd.getPath) >= graceMs) {
            fs.delete(fd.getPath, true)
            ()
          }
        }
      }
    }
    (names.toSet -- keep).foreach { n =>
      fs.delete(new Path(s"$workDir/_commits/$n"), false)
      dropped += 1
    }
    val cDir = new Path(s"$workDir/_commits")
    if (fs.exists(cDir))
      fs.listStatus(cDir).map(_.getPath)
        .filter(p => p.getName.startsWith(".tmp-") &&
          now - fs.getFileStatus(p).getModificationTime >= graceMs)
        .foreach { p => fs.delete(p, false); dropped += 1 }
    dropped + OwnerFence.gcSuperseded(fs, s"$workDir/owner")
  }

  /** The newest modification time anywhere under `p` — the quiet-period
    * anchor for sweeping a cell-less token dir (activity happens deep in
    * `_temporary`, never on the token dir itself).
    */
  private def newestMtime(fs: FileSystem, p: Path): Long = {
    val st = fs.getFileStatus(p)
    val kids =
      if (st.isDirectory) fs.listStatus(p).toSeq.map(_.getPath) else Nil
    (st.getModificationTime +: kids.map(newestMtime(fs, _))).max
  }

  /** Attach to a vector stream: every micro-batch folds into the graph
    * via foreachBatch (the artifact-maintenance loop; empty batches are
    * skipped so idle triggers don't churn checkpoints, and the batchId
    * marker makes redelivered batches no-ops). With `keepManifests` set,
    * [[vacuum]] rides the loop so an always-on maintainer holds the
    * manifest log at O(keep) files and replaced cell slices sweep as
    * they age out, instead of one manifest + dead tokens per micro-batch
    * forever — the same in-loop retention the lake arms expose.
    */
  def attach(
      stream: DataFrame,
      keepManifests: Option[Int] = None,
      vacuumGraceMs: Long = 0L): StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        if (!b.isEmpty) {
          fold(b.toDF(), Some(id))
          keepManifests.foreach(vacuum(_, vacuumGraceMs))
          ()
        }
      }
      .start()
}

object GraphMaintainer {

  private[graft] val GraphArt = "graph"
  private[graft] val RoutingArt = "routing"
  private val GraphDdl =
    "vec_id BIGINT, neighbor_id BIGINT, rank INT, cos DOUBLE, cell BIGINT"
  private val RoutingDdl = "vec_id BIGINT, embedding ARRAY<FLOAT>, cell BIGINT"
  private val ManifestRe = """m(\d{6})-(\d{9})\.txt""".r

  private def narrow(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"))

  /** Committed manifests, ascending — the epoch field leads the name, so
    * lexicographic order IS fencing order: everything a newer owner
    * publishes sorts above everything any superseded owner ever can.
    */
  private[graft] def manifestNames(fs: FileSystem, workDir: String): Seq[String] = {
    val p = new Path(s"$workDir/_commits")
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(ManifestRe.matches(_)).sorted
  }

  /** One manifest's (artifact, cell) → token map. */
  private[graft] def readManifest(
      fs: FileSystem, workDir: String, name: String): Map[(String, Long), String] = {
    val in = fs.open(new Path(s"$workDir/_commits/$name"))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    lines.filter(_.nonEmpty).map { l =>
      val Array(a, c, t) = l.split('\t')
      (a, c.toLong) -> t
    }.toMap
  }

  /** The latest committed state (empty before the first commit). */
  private[graft] def latestEntries(
      fs: FileSystem, workDir: String): Map[(String, Long), String] =
    manifestNames(fs, workDir).lastOption
      .map(readManifest(fs, workDir, _)).getOrElse(Map.empty)

  /** Publish `entries` as the next manifest by rename-without-overwrite
    * — THE commit point. The sequence number is monotone across epochs
    * (max over every committed name + 1), the epoch prefix puts every
    * commit of a superseded owner below the new owner's first, and a
    * lost rename (same name landed twice — impossible under distinct
    * acquired epochs) fails loud rather than retrying blind.
    */
  private[graft] def commitManifest(
      fs: FileSystem, workDir: String, epoch: Int,
      entries: Map[(String, Long), String]): String = {
    val dir = new Path(s"$workDir/_commits")
    fs.mkdirs(dir)
    val seq = manifestNames(fs, workDir)
      .collect { case ManifestRe(_, s) => s.toLong }.maxOption.getOrElse(0L) + 1
    val name = f"m$epoch%06d-$seq%09d.txt"
    val body = entries.toSeq.sortBy { case ((a, c), _) => (a, c) }
      .map { case ((a, c), t) => s"$a\t$c\t$t" }.mkString("\n")
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(dir, name))) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"GraphMaintainer: manifest $name already exists — a concurrent " +
          "commit under the same owner epoch violates the single-owner " +
          "contract (OwnerFence.acquire hands out distinct epochs)")
    }
    name
  }

  /** Land one artifact's rows as an immutable `fold=<token>/cell=<c>/`
    * tree (the pre-write repartition on cell puts each cell's rows in ONE
    * task, so every cell directory holds one file — without it, every
    * shuffle task that owns a few rows of a cell commits its own small
    * file and per-commit file counts scale with tasks × cells). Returns
    * the token and the cells that actually received rows — nothing is
    * visible until a manifest references them.
    */
  private def landCells(
      fs: FileSystem, workDir: String, df: DataFrame,
      artifact: String): (String, Seq[Long]) = {
    val token = "t" + java.util.UUID.randomUUID().toString.replace("-", "").take(16)
    val dir = s"$workDir/data/$artifact/fold=$token"
    df.repartition(col("cell")).write.partitionBy("cell").parquet(dir)
    val cells = fs.listStatus(new Path(dir)).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("cell=") => n.stripPrefix("cell=").toLong }
    (token, cells)
  }

  /** Read one artifact at a manifest's state, optionally pruned to a cell
    * set: exactly the chosen cells' directories are passed to the scan
    * (with `basePath` so the fold/cell partition values resolve), so
    * pruning happens at the MANIFEST — untouched cells are never listed.
    */
  private[graft] def readArtifact(
      spark: SparkSession, workDir: String, artifact: String,
      entries: Map[(String, Long), String],
      cells: Option[Set[Long]]): DataFrame = {
    val chosen = entries.collect {
      case ((a, c), t) if a == artifact && cells.forall(_.contains(c)) => (c, t)
    }.toSeq
    if (chosen.isEmpty) {
      val ddl = if (artifact == GraphArt) GraphDdl else RoutingDdl
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType.fromDDL(ddl))
    }
    val paths = chosen.map { case (c, t) =>
      s"$workDir/data/$artifact/fold=$t/cell=$c"
    }
    spark.read.option("basePath", s"$workDir/data/$artifact")
      .parquet(paths: _*)
      .withColumn("cell", col("cell").cast("long"))
      .drop("fold")
  }

  /** Build the epoch's artifacts in `workDir` (quantizer, routing, graph,
    * first manifest) from the refresh-time corpus, then maintain from
    * there.
    */
  def build(initialCorpus: DataFrame, workDir: String,
      k: Int = 5, nCentroids: Int = 16): GraphMaintainer = {
    val spark = initialCorpus.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epoch = OwnerFence.acquire(fs, s"$workDir/owner")
    val corpus = narrow(initialCorpus)
    val cs = SimilaritySearch.ivfCentroids(corpus, nCentroids)
    cs.toSeq.map { case (cid, emb, norm) => (cid, emb, norm) }
      .toDF("cid", "emb", "norm")
      .coalesce(1).write.mode("overwrite").parquet(s"$workDir/centroids")
    val bcast = spark.sparkContext.broadcast(cs)
    val cells = SimilaritySearch.cellAssign(corpus, bcast).localCheckpoint()
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val edges = SimilaritySearch.cellEdgesWithCell(cells, cells)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"), col("cell"))
    val (rTok, rCells) = landCells(fs, workDir, cells, RoutingArt)
    val (gTok, gCells) = landCells(fs, workDir, edges, GraphArt)
    val entries = (rCells.map(c => (RoutingArt, c) -> rTok) ++
      gCells.map(c => (GraphArt, c) -> gTok)).toMap
    val name = commitManifest(fs, workDir, epoch, entries)
    val out = fs.create(new Path(s"$workDir/meta.json"), true)
    out.write(s"""{"k":$k}""".getBytes("UTF-8")); out.close()
    new GraphMaintainer(spark, workDir, k, bcast,
      bloomOf(spark, workDir, entries), epoch, Some(name))
  }

  /** Reopen `workDir` after a restart: the frozen quantizer and the
    * latest manifest's routing/graph are the landed artifacts, so the
    * recovered maintainer's next fold equals the uninterrupted one's
    * (GraphMaintenanceSpec pins it). A pre-manifest workDir (the
    * partition-overwrite layout this format replaced) migrates in place:
    * its cell directories rename under a `legacy` token and the first
    * manifest pins them.
    */
  def recover(spark: SparkSession, workDir: String): GraphMaintainer = {
    import spark.implicits._
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epoch = OwnerFence.acquire(fs, s"$workDir/owner")
    if (manifestNames(fs, workDir).isEmpty) migrateLegacy(fs, workDir, epoch)
    val in = fs.open(new Path(s"$workDir/meta.json"))
    val meta = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val k = """"k":(\d+)""".r.findFirstMatchIn(meta)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"$workDir/meta.json: no k"))
    val cs = spark.read.parquet(s"$workDir/centroids")
      .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
    // pin the manifest the Bloom is built at BEFORE building it, so a
    // racing commit between the two is detected (not masked) at the
    // first fold's resolveBase
    val name0 = manifestNames(fs, workDir).lastOption
    val entries0 = name0.map(readManifest(fs, workDir, _)).getOrElse(Map.empty)
    new GraphMaintainer(spark, workDir, k,
      spark.sparkContext.broadcast(cs),
      bloomOf(spark, workDir, entries0), epoch, name0)
  }

  /** One-time in-place migration from the pre-manifest layout
    * (`<workDir>/{routing,graph}/cell=<c>/` rewritten by dynamic
    * partition overwrite): each cell directory RENAMES under
    * `data/<artifact>/fold=legacy/` — a metadata move, no data copied —
    * and the first manifest pins them, after which every commit is
    * atomic. Runs under the just-acquired epoch, so a still-live old
    * maintainer is already fenced before the move.
    */
  private def migrateLegacy(fs: FileSystem, workDir: String, epoch: Int): Unit = {
    val entries = Seq(RoutingArt, GraphArt).flatMap { a =>
      val old = new Path(s"$workDir/$a")
      val dest = new Path(s"$workDir/data/$a/fold=legacy")
      if (fs.exists(old)) {
        fs.mkdirs(dest)
        fs.listStatus(old).toSeq.map(_.getPath)
          .filter(_.getName.startsWith("cell="))
          .foreach { c =>
            require(fs.rename(c, new Path(dest, c.getName)),
              s"GraphMaintainer: legacy migration could not move $c")
          }
        fs.delete(old, true) // _SUCCESS / crc debris
      }
      // the manifest pins what is under the DESTINATION, not what this
      // run happened to move: a migration that crashed mid-rename on a
      // prior recover() already moved some cells there, and pinning only
      // the freshly-moved remainder would silently drop them from the
      // first manifest — permanent loss once vacuum sweeps the
      // unreferenced slices (crash-idempotence over the rename loop)
      if (!fs.exists(dest)) Nil
      else fs.listStatus(dest).toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith("cell=") =>
          (a, n.stripPrefix("cell=").toLong) -> "legacy"
        }
    }.toMap
    commitManifest(fs, workDir, epoch, entries)
    ()
  }

  /** Driver-held Bloom over every id stored at `entries` — the O(1)
    * prescreen that keeps the common no-collision fold from scanning
    * stored ids. Built AT a named manifest so the maintainer can detect
    * when the snapshot it screens for has moved under it.
    */
  private def bloomOf(
      spark: SparkSession, workDir: String,
      entries: Map[(String, Long), String]): BloomFilter = {
    val ids = readArtifact(spark, workDir, RoutingArt, entries, None)
      .select(col("vec_id"))
    val n = ids.count()
    ids.stat.bloomFilter("vec_id", math.max(1000000L, 8 * n), 0.001)
  }
}
