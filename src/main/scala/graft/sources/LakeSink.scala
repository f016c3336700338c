package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Data-lake layout helpers — how 100 TB of engine output actually lands.
  *
  * - [[writePartitioned]]: directory-partitioned parquet; readers filtering
  *   on the partition columns scan only matching directories (PartitionFilters
  *   in the plan, asserted in LakeLayoutSpec).
  * - [[writeBucketed]]: pre-shuffled bucket files on the join/agg key; two
  *   tables bucketed the same way join without any Exchange — the co-located
  *   join the reference's single-process dicts get for free and a cluster
  *   has to earn.
  */
object LakeSink {

  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed table write (requires the session catalog — buckets live in
    * table metadata, not the directory layout).
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }
}
