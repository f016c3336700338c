package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.LakeTable

/** The always-on lake-maintenance loop — a CDC changelog STREAM folded
  * continuously into a [[LakeTable]]: the reference's changelog-table
  * consumers (the Faust table upserting station rows as they arrive,
  * reference consumers/faust_stream.py:87-92; the KSQL table maintained
  * continuously, consumers/ksql.py:35-39) re-expressed as foreachBatch
  * over the committed boxed layout, WITH deletes, at lake scale.
  *
  * Per micro-batch: [[LakeTable.applyChangelog]] reduces the batch to
  * latest-per-key, prunes to box-intersecting files, rewrites only
  * those, and publishes the next manifest version — so steady-state
  * maintenance cost tracks the CHANGE RATE times the touched-file
  * fraction, never the accumulated table.
  *
  * Fold-boundary semantics: a delete and a later resurrect in the SAME
  * micro-batch keep the row's base-only columns (the batch reduces to
  * latest-per-key before applying); split across micro-batches, the
  * delete really lands and the resurrect is a fresh insert — base-only
  * columns return NULL, exactly as replaying the same batches against
  * any CDC consumer would ([[graft.operators.Cdc.mergeChangelog]]'s
  * batch-boundary caveat, property-pinned in LakeTableSpec).
  *
  * At-least-once safety is the manifest's: the applied-batchId set
  * travels IN the commit (an `A` line per batch), so the dedup check and
  * the apply are one atomic publication — a redelivered batch after a
  * crash between "data landed" and "manifest renamed" simply re-applies
  * from the previous version (the uncommitted files are invisible
  * garbage), and one after a successful commit is a no-op. Batch-grain
  * replay is exact; the MERGE itself is also semantically idempotent for
  * the SAME changelog (upserts re-set the same value, deletes of absent
  * keys no-op), so even the marker is belt-and-braces.
  *
  * The stream is the maintenance ARM; serving reads are
  * [[LakeTable.readLive]] / [[LakeTable.readPrunedLive]] against
  * whatever version is current — a reader never blocks on a fold and
  * never sees a half-applied one.
  */
object LakeMaintenance {

  /** Attach a changelog stream (key, seq, op, val rows) to the table at
    * `path`. Empty batches are skipped (idle triggers must not burn
    * manifest versions).
    */
  def attach(
      changelog: DataFrame, path: String, cols: Seq[String],
      keyCol: String = "key", nFilesNew: Int = 2): StreamingQuery = {
    val spark = changelog.sparkSession
    changelog.writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        if (!b.isEmpty) {
          LakeTable.applyChangelog(
            spark, path, b.toDF(), cols, keyCol, nFilesNew, batchId = Some(id))
          ()
        }
      }
      .start()
  }

  /** One manual fold — the unit the stream repeats; exposed for specs and
    * catch-up batch jobs (same batchId contract).
    */
  def foldOnce(
      spark: SparkSession, path: String, changelog: DataFrame,
      cols: Seq[String], keyCol: String = "key", nFilesNew: Int = 2,
      batchId: Option[Long] = None): LakeTable.ApplyStats =
    LakeTable.applyChangelog(
      spark, path, changelog, cols, keyCol, nFilesNew, batchId = batchId)
}
