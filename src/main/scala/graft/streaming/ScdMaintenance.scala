package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Cdc

/** Continuously maintained SCD-TYPE-2 dimension history — the streaming
  * arm of [[Cdc.scdMerge]] and the dimension twin of [[Bm25Maintainer]]:
  * an always-on CDC stream folds every micro-batch of full-row-image
  * changes into the stored validity-interval artifact, so "what did
  * this row say at time t" is answerable one micro-batch behind the
  * source instead of one nightly rebuild behind. Exactness per fold is
  * the fold==refit invariant (`scdMerge(scdHistory(a), b) ==
  * scdHistory(a ∪ b)` under monotone LSNs — q_scd2_merge's oracle IS
  * the refit), so chained folds equal one derivation.
  *
  * State model: derived-artifact versioning, the [[Bm25Maintainer]]
  * protocol verbatim — `workDir/history/v%06d/` snapshots, each
  * committed by a `_folded.txt` marker carrying every folded batchId,
  * written AFTER the parquet lands; recovery resolves the highest
  * MARKED version, redelivered batchIds short-circuit against the
  * marker the version itself carries (the atomic check-and-publish).
  *
  * Scale shape: the artifact lands PARTITIONED BY `is_current`, because
  * [[Cdc.scdMerge]]'s contract is that CLOSED intervals are immutable —
  * a fold semi/anti-joins history against the batch's touched keys, and
  * with the partition split the closed slice (the years-deep bulk of a
  * dimension) passes through as a partition-pruned pass-through while
  * only the current slice (key-count-sized) joins the batch. Per-fold
  * cost tracks the batch and the CURRENT slice, never accumulated
  * history.
  */
final class ScdMaintainer private (spark: SparkSession, workDir: String) {
  import ScdMaintainer._

  private val fs =
    new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The served history — always the latest COMMITTED version. Column
    * order is normalized back to [[Cdc.scdHistory]]'s (partitionBy moves
    * the partition column last on disk).
    */
  def history: DataFrame = {
    val p = historyPath(workDir, currentVersion)
    // an empty history (fresh dimension, or a log of only absent-key
    // deletes) writes no partition dir — parquet cannot infer a schema
    // from nothing, so serve the canonical empty frame instead
    val hasData = fs.listStatus(new Path(p)).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("is_current="))
    if (!hasData)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "key BIGINT, name STRING, val DOUBLE, " +
            "valid_from BIGINT, valid_to BIGINT, is_current BOOLEAN"))
    else spark.read.parquet(p)
      .select(col("key"), col("name"), col("val"),
        col("valid_from"), col("valid_to"),
        col("is_current").cast("boolean").as("is_current"))
  }

  /** The current-rows slice — a partition-pruned read, equal to the
    * latest-image MERGE of the same changelog (CdcSpec pins it).
    */
  def current: DataFrame = history.filter(col("is_current"))

  /** Streaming batchIds already folded in (empty right after build). */
  def foldedBatches: Set[Long] = foldedOf(fs, workDir, currentVersion)

  private def currentVersion: Int = committedVersions(fs, workDir).max

  /** Fold one micro-batch of changes; returns false for an
    * already-folded (redelivered) batchId, true when a new version
    * committed.
    */
  def fold(batch: DataFrame, batchId: Option[Long] = None): Boolean = synchronized {
    val v = currentVersion
    val folded = foldedOf(fs, workDir, v)
    if (batchId.exists(folded.contains)) return false
    if (batch.isEmpty) return false
    Cdc.scdMerge(history, batch)
      .write.partitionBy("is_current")
      .parquet(historyPath(workDir, v + 1))
    commitMarker(fs, workDir, v + 1, folded ++ batchId.toSet)
    committedVersions(fs, workDir).filter(_ < v).foreach { old =>
      fs.delete(new Path(historyPath(workDir, old)), true)
    }
    true
  }

  /** Query-time TEMPORAL JOIN served from the maintained artifact: each
    * fact joins the dimension version valid at its own `t` — the
    * [[Bm25Maintainer.serveTopK]] shape for the dimension store.
    */
  def serveJoin(facts: DataFrame): DataFrame = Cdc.scdJoin(facts, history)

  /** Attach to a full-image changelog stream (key, seq, op, name, val):
    * every micro-batch folds via foreachBatch, batchId-idempotent.
    */
  def attach(changes: DataFrame): StreamingQuery =
    changes.writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        fold(b.toDF(), Some(id)); ()
      }
      .start()
}

object ScdMaintainer {

  /** Derive the epoch's history from the accumulated changelog and start
    * maintaining. An empty-history start is `build(emptyLog)`.
    */
  def build(initialLog: DataFrame, workDir: String): ScdMaintainer = {
    val spark = initialLog.sparkSession
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Cdc.scdHistory(initialLog)
      .write.partitionBy("is_current")
      .parquet(historyPath(workDir, 1))
    commitMarker(fs, workDir, 1, Set.empty)
    new ScdMaintainer(spark, workDir)
  }

  /** Reopen `workDir` after a restart: the latest committed version is
    * the whole state — the recovered maintainer's next fold equals the
    * uninterrupted one's and redelivered batchIds stay no-ops.
    */
  def recover(spark: SparkSession, workDir: String): ScdMaintainer = {
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(committedVersions(fs, workDir).nonEmpty,
      s"ScdMaintainer: no committed history under $workDir")
    new ScdMaintainer(spark, workDir)
  }

  private def historyPath(workDir: String, v: Int): String =
    f"$workDir%s/history/v$v%06d"

  private def markerPath(workDir: String, v: Int): Path =
    new Path(s"${historyPath(workDir, v)}/_folded.txt")

  private def committedVersions(
      fs: org.apache.hadoop.fs.FileSystem, workDir: String): Seq[Int] = {
    val dir = new Path(s"$workDir/history")
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") => n.stripPrefix("v").toInt }
      .filter(v => fs.exists(markerPath(workDir, v)))
  }

  private def foldedOf(
      fs: org.apache.hadoop.fs.FileSystem, workDir: String, v: Int): Set[Long] = {
    val in = fs.open(markerPath(workDir, v))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.split('\n').filter(_.nonEmpty).map(_.toLong).toSet
  }

  private def commitMarker(
      fs: org.apache.hadoop.fs.FileSystem, workDir: String, v: Int,
      folded: Set[Long]): Unit = {
    val out = fs.create(markerPath(workDir, v), false)
    try out.write(folded.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }
}
