package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Cdc
import graft.sources.LakeTable

/** Continuously maintained SCD-TYPE-2 dimension history — the streaming
  * arm of [[Cdc.scdMerge]], RE-HOMED on [[LakeTable]] so per-fold write
  * cost tracks the CHANGE, never the accumulated history (the reference's
  * continuously-maintained dimension table, consumers/faust_stream.py:
  * 87-92, at the 100 TB shape).
  *
  * Why two lake tables: [[Cdc.scdMerge]]'s contract splits the artifact
  * by mutability. CLOSED intervals are immutable forever — they belong
  * in an APPEND-ONLY table (`workDir/closed/t`, clustered on
  * (key, valid_from) so both the temporal join's key probe and the as-of
  * read's validity range prune); the CURRENT slice is a key-unique keyed
  * snapshot that mutates per fold — a merge-on-write table
  * (`workDir/current/t`, clustered on key) where a fold rewrites ONLY the
  * box-intersecting current-slice files. A years-deep dimension never
  * re-serializes: the fold appends its newly-closed intervals
  * (batch-sized), rewrites the touched current files (touched-key-sized),
  * and the untouched closed bulk carries by manifest NAME — the
  * predecessor design re-landed the FULL scdMerge output as a fresh
  * parquet snapshot every micro-batch, an O(history) write per fold.
  *
  * Consistency across the two tables: each committed fold publishes a
  * PAIR MARKER `workDir/fold/v%06d.txt` pinning (closed version, current
  * version, folded batchIds); readers resolve the latest marker and
  * [[LakeTable.readAt]] each table at its pinned version, so a reader
  * never observes one table's fold without the other's. The marker
  * publishes atomically by rename-without-overwrite (the same contract
  * as every lake commit — a duplicate version loses the rename and
  * fails loud), and each lake commit is itself atomic; crash windows between the three are closed
  * by HEAL-ON-ENTRY: every fold first rolls each table back to the pair
  * marker's pinned version ([[LakeTable.restoreTo]] — a metadata commit
  * that also discards the crashed fold's replay markers), because under
  * a single maintainer any lake version beyond the pin IS half-applied
  * work. A crashed batch therefore either replays in full (batchId set,
  * at-least-once source) or is discarded atomically (fold(batch) with
  * no batchId and no redelivery) — no partial closed-without-current
  * state can ever reach a marker; a redelivered already-marked batch
  * short-circuits on the pair marker's folded set before any work.
  * Exactness per fold is the fold==refit invariant (`scdMerge(
  * scdHistory(a), b) == scdHistory(a ∪ b)` under monotone LSNs —
  * q_scd2_merge's oracle IS the refit), so chained folds equal one
  * derivation; the fold only ever hands [[Cdc.scdMerge]] the touched
  * keys' current rows, which is all it reads by contract.
  *
  * Retention: lake versions accumulate one per fold per table;
  * [[vacuumHistory]] applies [[LakeTable.vacuum]] to both tables —
  * `keepVersions` must cover the slowest reader's marker lag, the same
  * contract every lake subscriber carries.
  */
final class ScdMaintainer private (spark: SparkSession, workDir: String) {
  import ScdMaintainer._

  private val fs =
    new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The append-only closed-interval lake table (exposed for manifest
    * audits and external vacuum policy).
    */
  def closedTablePath: String = ScdMaintainer.closedPath(workDir)

  /** The merge-on-write current-slice lake table. */
  def currentTablePath: String = ScdMaintainer.currentPath(workDir)

  /** The served history — the latest committed PAIR: closed intervals ∪
    * the current slice, each read at its marker-pinned table version
    * ([[Cdc.scdHistory]]'s shape).
    */
  def history: DataFrame = {
    val m = markerOf(fs, workDir, currentVersion)
    val closed = LakeTable.readAt(spark, closedTablePath, m.closedV)
      .select(col("key"), col("name"), col("val"),
        col("valid_from"), col("valid_to"), lit(false).as("is_current"))
    val cur = LakeTable.readAt(spark, currentTablePath, m.currentV)
      .select(col("key"), col("name"), col("val"), col("valid_from"),
        lit(null).cast("bigint").as("valid_to"), lit(true).as("is_current"))
    closed.unionByName(cur)
  }

  /** The current-rows slice — a read of the current table ALONE (the
    * closed bulk is neither opened nor even stat-ed), equal to the
    * latest-image MERGE of the same changelog (CdcSpec pins it).
    */
  def current: DataFrame = {
    val m = markerOf(fs, workDir, currentVersion)
    LakeTable.readAt(spark, currentTablePath, m.currentV)
      .select(col("key"), col("name"), col("val"), col("valid_from"),
        lit(null).cast("bigint").as("valid_to"), lit(true).as("is_current"))
  }

  /** Streaming batchIds already folded in (empty right after build).
    * The pair marker namespaces ids PER ARM (`fold#id` / `forget#id`):
    * the changelog stream and a forget stream each restart their
    * batchIds at zero, so un-namespaced ids would collide across arms.
    */
  def foldedBatches: Set[Long] =
    markerOf(fs, workDir, currentVersion).folded
      .collect { case s if s.startsWith("fold#") =>
        s.stripPrefix("fold#").toLong }

  /** Streaming batchIds already applied by the FORGET arm. */
  def forgottenBatches: Set[Long] =
    markerOf(fs, workDir, currentVersion).folded
      .collect { case s if s.startsWith("forget#") =>
        s.stripPrefix("forget#").toLong }

  private def currentVersion: Int = committedVersions(fs, workDir).max

  /** Fold one micro-batch of changes; returns false for an
    * already-folded (redelivered) batchId, true when a new version
    * committed. Per-fold cost: one [[LakeTable.readKeyed]] of the
    * touched keys' current rows, one batch-sized closed APPEND, one
    * touched-file current-table rewrite, three metadata renames.
    *
    * Every fold appends one closed-interval sliver and one current
    * file; with `compactTargetBytes` set, [[LakeTable.shouldCompact]]'s
    * half-target trigger bin-packs either table's undersized files
    * in-loop (content-preserving, changefeed-invisible, never re-picks
    * its own outputs), so ten thousand folds leave a bounded live file
    * count instead of ten thousand slivers — the same response
    * [[LakeMaintenance.attachAppend]] wires for the ingest arm. The
    * compaction runs BEFORE the pair marker, so the marker pins the
    * packed versions.
    */
  def fold(
      batch: DataFrame, batchId: Option[Long] = None,
      compactTargetBytes: Option[Long] = None): Boolean = synchronized {
    val v = currentVersion
    val m = markerOf(fs, workDir, v)
    if (batchId.exists(b => m.folded.contains(s"fold#$b"))) return false
    if (batch.isEmpty) return false
    // HEAL first: any lake version beyond the pair marker's pin is a
    // crashed fold's half-applied work (single maintainer; compaction
    // commits BEFORE the marker, so a healthy fold always leaves
    // latest == pinned). Rolling both tables back to the pin — replay
    // markers included, so a redelivery of the crashed batch re-applies
    // instead of wrongly no-opping — makes every fold start from a
    // consistent cross-table cut: a crashed batch either replays in
    // full (batchId set, source redelivers) or is discarded ATOMICALLY
    // (no partial closed-without-current state can ever reach a marker).
    heal(m)
    val touched = batch.select(col("key")).distinct()
    // the touched keys' current rows, box-pruned — the ONLY history the
    // incremental derivation needs (closed intervals are immutable)
    val curTouched = LakeTable.readKeyed(spark, currentTablePath, touched)
      .withColumn("valid_to", lit(null).cast("bigint"))
      .withColumn("is_current", lit(true))
    val merged = Cdc.scdMerge(curTouched, batch.select(
      col("key"), col("seq"), col("op"), col("name"), col("val")))
      .localCheckpoint() // one derivation feeds two commits
    val newClosed = merged.filter(!col("is_current"))
      .select(col("key"), col("name"), col("val"),
        col("valid_from"), col("valid_to"))
    val newCur = merged.filter(col("is_current"))
      .select(col("key"), col("name"), col("val"), col("valid_from"))
    // 1. closed intervals append immutably (empty appends still commit,
    //    carrying the replay marker)
    val closedStats = LakeTable.append(
      newClosed, closedTablePath, Seq("key", "valid_from"),
      nFilesNew = 1, batchId = batchId, arm = "scd-closed")
    // 2. the current slice rewrites ONLY its touched files
    val curStats = LakeTable.mutate(
      spark, currentTablePath, Seq("key"), keyCol = "key",
      nFilesNew = 1, bits = 16,
      touchKeys = touched,
      rewrite = base =>
        base.join(broadcast(touched), Seq("key"), "left_anti")
          .unionByName(newCur),
      appliedBatch = batchId.map(b => s"scd-current#$b"))
    // 3. bounded file counts: bin-pack either table's slivers in-loop —
    //    compact directly: its own <2-undersized check is the trigger
    //    (no-ops burn no version), so a separate shouldCompact poll would
    //    just resolve each manifest twice
    var (cv, kv) = (closedStats.version, curStats.version)
    compactTargetBytes.foreach { t =>
      cv = LakeTable.compact(
        spark, closedTablePath, Seq("key", "valid_from"), t).version
      kv = LakeTable.compact(spark, currentTablePath, Seq("key"), t).version
    }
    // 4. the pair marker pins the fold for readers — the versions the
    //    commits above RETURNED, no re-resolution
    commitMarker(fs, workDir, v + 1,
      Marker(cv, kv, m.folded ++ batchId.map(b => s"fold#$b")))
    true
  }

  /** Right-to-be-forgotten for the DIMENSION artifact: erase every trace
    * of the tombstoned keys — closed intervals AND current rows — as one
    * pair-marked maintenance step (box-pruned file rewrites on both
    * tables, batchId-idempotent under the `forget#` arm). This is THE
    * supported way to delete from the maintainer's tables: the two lake
    * paths are exposed for AUDIT (manifest diffs, retention telemetry),
    * never for out-of-band mutation — heal-on-entry rolls back any
    * commit the pair marker did not pin, so a tombstone landed directly
    * on `closedTablePath` would be silently undone by the next fold.
    * Routed through here it commits under the same heal/replay contract
    * as folds. Returns false for a redelivered batchId or an empty
    * tombstone set.
    */
  def forget(tombstones: DataFrame, batchId: Option[Long] = None): Boolean =
    synchronized {
      val v = currentVersion
      val m = markerOf(fs, workDir, v)
      if (batchId.exists(b => m.folded.contains(s"forget#$b"))) return false
      if (tombstones.isEmpty) return false
      heal(m)
      val keys = tombstones.select(col("key")).distinct()
      // unlike a fold (whose rewrite is batch-sized), a forget rewrite
      // carries every KEPT row of the box-intersecting files — on a
      // years-deep closed table that is touched-files-sized, so use the
      // tombstone arms' default output width rather than one file/task
      val cStats = LakeTable.applyTombstones(
        spark, closedTablePath, keys, Seq("key", "valid_from"),
        keyCol = "key", batchId = batchId,
        arm = "scd-forget-closed")
      val kStats = LakeTable.applyTombstones(
        spark, currentTablePath, keys, Seq("key"),
        keyCol = "key", batchId = batchId,
        arm = "scd-forget-current")
      commitMarker(fs, workDir, v + 1,
        Marker(cStats.version, kStats.version,
          m.folded ++ batchId.map(b => s"forget#$b")))
      true
    }

  /** The streaming forget arm: a tombstone stream (one `key` column)
    * erases per micro-batch — the dimension-artifact twin of
    * [[LakeMaintenance.attachTombstones]].
    */
  def attachForget(tombstones: DataFrame): StreamingQuery =
    tombstones.writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        forget(b.toDF(), Some(id)); ()
      }
      .start()

  /** Roll both tables back to the pair marker's pin — see the class doc. */
  private def heal(m: Marker): Unit = {
    if (LakeTable.latestVersion(spark, closedTablePath) != m.closedV)
      LakeTable.restoreTo(spark, closedTablePath, m.closedV)
    if (LakeTable.latestVersion(spark, currentTablePath) != m.currentV)
      LakeTable.restoreTo(spark, currentTablePath, m.currentV)
  }

  /** Query-time TEMPORAL JOIN served from the maintained artifact: each
    * fact joins the dimension version valid at its own `t`.
    */
  def serveJoin(facts: DataFrame): DataFrame = Cdc.scdJoin(facts, history)

  /** Attach to a full-image changelog stream (key, seq, op, name, val):
    * every micro-batch folds via foreachBatch, batchId-idempotent;
    * `compactTargetBytes` bounds the live file count in-loop.
    */
  def attach(
      changes: DataFrame,
      compactTargetBytes: Option[Long] = None): StreamingQuery =
    changes.writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        fold(b.toDF(), Some(id), compactTargetBytes); ()
      }
      .start()

  /** Apply lake retention to both tables. `keepVersions` must cover the
    * slowest reader's pair-marker lag (the standard lake subscriber
    * contract); markers themselves are metadata-sized and kept. The
    * effective depth always additionally covers the CURRENT pair pin:
    * after a crashed fold the lake tables sit ahead of the marker, and
    * vacuuming the pinned version's files out would strand both the
    * serving reads and heal-on-entry's rollback.
    */
  def vacuumHistory(keepVersions: Int = 2, graceMs: Long = 0L): Int = {
    val m = markerOf(fs, workDir, currentVersion)
    val keepClosed = math.max(keepVersions,
      LakeTable.latestVersion(spark, closedTablePath) - m.closedV + 1)
    val keepCurrent = math.max(keepVersions,
      LakeTable.latestVersion(spark, currentTablePath) - m.currentV + 1)
    LakeTable.vacuum(spark, closedTablePath, keepClosed, graceMs) +
      LakeTable.vacuum(spark, currentTablePath, keepCurrent, graceMs)
  }
}

object ScdMaintainer {

  private final case class Marker(closedV: Int, currentV: Int, folded: Set[String])

  /** Derive the epoch's history from the accumulated changelog and start
    * maintaining. An empty-history start is `build(emptyLog)`. Debris of
    * a build that crashed before its first marker is cleared and
    * re-derived (nothing uncommitted is ever served).
    */
  def build(initialLog: DataFrame, workDir: String): ScdMaintainer = {
    val spark = initialLog.sparkSession
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(committedVersions(fs, workDir).isEmpty,
      s"ScdMaintainer: $workDir already holds a committed history — recover() it")
    fs.delete(new Path(closedPath(workDir)), true)
    fs.delete(new Path(currentPath(workDir)), true)
    val hist = Cdc.scdHistory(initialLog).localCheckpoint()
    LakeTable.init(
      hist.filter(!col("is_current"))
        .select(col("key"), col("name"), col("val"),
          col("valid_from"), col("valid_to")),
      closedPath(workDir), Seq("key", "valid_from"), nFiles = 2)
    LakeTable.init(
      hist.filter(col("is_current"))
        .select(col("key"), col("name"), col("val"), col("valid_from")),
      currentPath(workDir), Seq("key"), nFiles = 2)
    commitMarker(fs, workDir, 1, Marker(1, 1, Set.empty))
    new ScdMaintainer(spark, workDir)
  }

  /** Reopen `workDir` after a restart: the latest committed pair marker
    * is the whole state — the recovered maintainer's next fold equals
    * the uninterrupted one's, redelivered batchIds stay no-ops, and a
    * fold that crashed mid-way is rolled back to the marker's pin by the
    * next fold's heal-on-entry (see the class doc).
    */
  def recover(spark: SparkSession, workDir: String): ScdMaintainer = {
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(s"$workDir/history")) ||
        fs.exists(new Path(s"$workDir/fold")),
      s"ScdMaintainer: $workDir holds a PRE-lake-homed layout " +
        "(history/v*/_folded.txt snapshots) — this release stores the " +
        "artifact as two LakeTables under closed/ and current/ with " +
        "fold/v*.txt pair markers; rebuild from the changelog with " +
        "build() at a fresh workDir (the old state is intact, not lost)")
    require(committedVersions(fs, workDir).nonEmpty,
      s"ScdMaintainer: no committed history under $workDir")
    new ScdMaintainer(spark, workDir)
  }

  private def closedPath(workDir: String): String = s"$workDir/closed/t"
  private def currentPath(workDir: String): String = s"$workDir/current/t"

  private def markerPath(workDir: String, v: Int): Path =
    new Path(f"$workDir%s/fold/v$v%06d.txt")

  private def committedVersions(
      fs: org.apache.hadoop.fs.FileSystem, workDir: String): Seq[Int] = {
    val dir = new Path(s"$workDir/fold")
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toInt }
  }

  private def markerOf(
      fs: org.apache.hadoop.fs.FileSystem, workDir: String, v: Int): Marker = {
    val in = fs.open(markerPath(workDir, v))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    Marker(
      lines(0).toInt, lines(1).toInt,
      lines.drop(2).filter(_.nonEmpty)
        // bare ids are the pre-namespacing pair-marker format (only the
        // fold arm existed then): read them as fold-arm ids so a marker
        // written before the forget arm landed keeps its dedup records
        .map(l => if (l.forall(_.isDigit)) s"fold#$l" else l).toSet)
  }

  /** Atomic marker publication: full content to a tmp name, then
    * rename-without-overwrite — a crash mid-write leaves tmp garbage,
    * never a truncated marker at the committed name (which would wedge
    * every later read on a parse error).
    */
  private def commitMarker(
      fs: org.apache.hadoop.fs.FileSystem, workDir: String, v: Int,
      m: Marker): Unit = {
    fs.mkdirs(new Path(s"$workDir/fold"))
    val tmp = new Path(s"$workDir/fold/.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(
      (Seq(m.closedV.toString, m.currentV.toString) ++
        m.folded.toSeq.sorted).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, markerPath(workDir, v)),
      s"ScdMaintainer: marker rename lost at $workDir fold v$v")
  }
}
