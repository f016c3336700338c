package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextAnalysis

/** Continuously maintained BM25-stats artifact — the streaming arm of
  * [[TextAnalysis.mergeBm25Stats]] and the lexical twin of
  * [[GraphMaintainer]]: an always-on ingest stream folds every
  * micro-batch of NEW documents into the stored (token, df) + totals
  * artifact, so [[TextAnalysis.bm25TopKFrom]] always serves from stats
  * that are one micro-batch behind the corpus instead of one REFRESH
  * behind. Exactness per fold is the merge==refit invariant
  * (`merge(stats(old), batch) == stats(old ∪ batch)` — q_bm25_incr's
  * oracle proves the arithmetic), so chained folds equal one refit.
  *
  * State model: like the graph, the stats are DERIVED state — an index
  * artifact on reliable storage, not streaming state. `workDir` holds
  * versioned snapshots `stats/v%06d/`, each containing
  *   - the stats parquet (vocab-sized — ONE coalesced file),
  *   - `_folded.txt`: the replay HIGH-WATER batchId (monotone ids make
  *     `id <= max` the replay test, so one line suffices forever — a
  *     legacy full-set marker reads as its max), written AFTER the
  *     parquet lands — its presence IS the version's commit marker.
  * Readers and recovery resolve the highest version WITH a marker; a
  * crash mid-write leaves a markerless directory that is simply ignored.
  *
  * Idempotence / at-least-once: the folded-set travels WITH the version
  * it describes, which closes the replay hole a separate marker file
  * has — with "stats then marker" as two independent writes, a crash
  * between them replays the batch onto stats that already contain it
  * and every df double-counts. Here the fold for batchId B reads the
  * current version's folded set, short-circuits if B is in it, and
  * otherwise publishes (merged stats, set ∪ {B}) as one atomic version.
  * True duplicate DOCUMENTS (same content re-arriving under a new
  * batchId) are upstream's contract: the ingest gate
  * ([[IngestGate]] / [[StreamDedup]]) dedups before anything derived
  * folds — same division of labor as the graph maintainer's id guard.
  *
  * Per-fold cost: one batch-sized aggregation + a full-outer merge on
  * token against the vocab-sized artifact — O(|batch| + vocab), never a
  * corpus re-scan; at 100 TB the corpus is only ever touched by the
  * initial [[Bm25Maintainer.build]] refit.
  */
final class Bm25Maintainer private (
    spark: SparkSession, workDir: String, epoch: Int) {
  import Bm25Maintainer._

  private val fs =
    new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Cross-JVM single-ownership ([[OwnerFence]]): two live maintainers
    * racing the version-dir protocol could clearUnmarked each other's
    * in-flight writes; recover() takes over by landing the next owner
    * epoch and a superseded maintainer fails loud at its next fold.
    */
  private def assertOwner(): Unit =
    OwnerFence.assertOwner(fs, s"$workDir/owner", epoch, "Bm25Maintainer")

  /** The served artifact — always the latest COMMITTED version, so a
    * recovered maintainer serves the same frame a crash interrupted.
    */
  def stats: DataFrame = spark.read.parquet(statsPath(workDir, currentVersion))

  /** The replay HIGH-WATER batchId, as a set (empty right after build;
    * a singleton after any fold — the marker keeps only the max id under
    * the monotone-batchId contract; a legacy full-set marker reads back
    * as its max).
    */
  def foldedBatches: Set[Long] =
    foldedOf(fs, workDir, currentVersion).maxOption
      .map(Set(_)).getOrElse(Set.empty)

  private def currentVersion: Int = committedVersions(fs, workDir).max

  /** Fold one micro-batch of new documents; returns false for an
    * already-folded (redelivered) batchId, true when a new version
    * committed.
    */
  def fold(batch: DataFrame, batchId: Option[Long] = None): Boolean = synchronized {
    assertOwner()
    val v = currentVersion
    val folded = foldedOf(fs, workDir, v)
    // checkpointed batchIds are monotone, so id <= high-water IS
    // "already folded" — and the marker need only CARRY the high-water,
    // keeping marker bytes O(1) per fold where the full accumulated set
    // would be written and re-parsed per fold forever (O(batches-ever))
    if (batchId.exists(b => folded.maxOption.exists(_ >= b))) return false
    if (batch.isEmpty) return false
    // re-check the fence at the write boundary: the isEmpty probe above
    // is a Spark job a zombie can stall in while a takeover lands, and
    // clearUnmarked would then sweep the NEW owner's in-flight (still
    // unmarked) version dir out from under its marker rename — wedging
    // the artifact with a committed version whose parquet is gone
    assertOwner()
    // a fold that crashed between the parquet write and the marker left
    // an unmarked v+1 directory; without clearing it this write would
    // throw 'path already exists' on EVERY subsequent fold — the orphan
    // is uncommitted by definition (no marker), so deleting it is safe
    clearUnmarked(fs, workDir, above = v)
    TextAnalysis.mergeBm25Stats(stats, batch)
      .coalesce(1)
      .write.parquet(statsPath(workDir, v + 1))
    commitMarker(fs, workDir, v + 1,
      (folded ++ batchId.toSet).maxOption.map(Set(_)).getOrElse(Set.empty))
    // keep the previous version for readers in flight; older ones are
    // garbage (vocab-sized dirs — cheap, but unbounded without this)
    committedVersions(fs, workDir).filter(_ < v).foreach { old =>
      fs.delete(new Path(statsPath(workDir, old)), true)
    }
    true
  }

  /** Attach to a document stream: every micro-batch folds via
    * foreachBatch, batchId-idempotent (the artifact-maintenance loop —
    * [[GraphMaintainer.attach]]'s shape for the lexical index).
    */
  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        fold(b.toDF(), Some(id)); ()
      }
      .start()

  /** Query-time serve from the maintained artifact. */
  def serveTopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 25): DataFrame =
    TextAnalysis.bm25TopKFrom(docs, stats, queryTerms, k)
}

object Bm25Maintainer {

  /** Refit the epoch's stats from the corpus and start maintaining. */
  def build(initialDocs: DataFrame, workDir: String): Bm25Maintainer = {
    val spark = initialDocs.sparkSession
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    clearUnmarked(fs, workDir, above = 0) // a crashed build's orphan v1
    TextAnalysis.bm25Stats(initialDocs)
      .coalesce(1)
      .write.parquet(statsPath(workDir, 1))
    commitMarker(fs, workDir, 1, Set.empty)
    new Bm25Maintainer(spark, workDir, OwnerFence.acquire(fs, s"$workDir/owner"))
  }

  /** Reopen `workDir` after a restart: the latest committed version is
    * the whole state, so the recovered maintainer's next fold equals the
    * uninterrupted one's and redelivered batchIds stay no-ops.
    */
  def recover(spark: SparkSession, workDir: String): Bm25Maintainer = {
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(committedVersions(fs, workDir).nonEmpty,
      s"Bm25Maintainer: no committed stats under $workDir")
    new Bm25Maintainer(spark, workDir, OwnerFence.acquire(fs, s"$workDir/owner"))
  }

  private def statsPath(workDir: String, v: Int): String =
    f"$workDir%s/stats/v$v%06d"

  // underscore prefix: invisible to Spark's parquet file listing (the
  // _SUCCESS convention), so the marker can live INSIDE the version dir
  private def markerPath(workDir: String, v: Int): Path =
    new Path(s"${statsPath(workDir, v)}/_folded.txt")

  private def committedVersions(
      fs: org.apache.hadoop.fs.FileSystem, workDir: String): Seq[Int] = {
    val dir = new Path(s"$workDir/stats")
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") => n.stripPrefix("v").toInt }
      .filter(v => fs.exists(markerPath(workDir, v)))
  }

  /** Delete UNMARKED version directories above the committed maximum —
    * debris of folds (or builds) that crashed after the parquet write but
    * before the marker. They are invisible to readers already; clearing
    * them keeps the next fold's write from colliding with the dead path.
    */
  private def clearUnmarked(
      fs: org.apache.hadoop.fs.FileSystem, workDir: String, above: Int): Unit = {
    val dir = new Path(s"$workDir/stats")
    if (!fs.exists(dir)) return
    fs.listStatus(dir).toSeq.map(_.getPath)
      .filter { p =>
        p.getName.startsWith("v") &&
          p.getName.stripPrefix("v").toIntOption.exists(_ > above) &&
          !fs.exists(new Path(p, "_folded.txt"))
      }
      .foreach(fs.delete(_, true))
  }

  private def foldedOf(
      fs: org.apache.hadoop.fs.FileSystem, workDir: String, v: Int): Set[Long] = {
    val in = fs.open(markerPath(workDir, v))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.split('\n').filter(_.nonEmpty).map(_.toLong).toSet
  }

  /** Atomic: content to a tmp name, rename-without-overwrite — a crash
    * mid-write leaves dot-prefixed garbage (invisible to parquet listing
    * AND to the marker check), never a truncated `_folded.txt` whose
    * partial content would mis-parse the folded set.
    */
  private def commitMarker(
      fs: org.apache.hadoop.fs.FileSystem, workDir: String, v: Int,
      folded: Set[Long]): Unit = {
    val tmp = new Path(
      s"${statsPath(workDir, v)}/.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(folded.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, markerPath(workDir, v)),
      s"Bm25Maintainer: marker rename lost at ${statsPath(workDir, v)}")
  }
}
