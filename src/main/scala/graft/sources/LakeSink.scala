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

  /** Small-file compaction — the lake-maintenance pass that keeps scan
    * parallelism healthy: a streaming sink (or a 10k-task job) leaves
    * thousands of KB-sized files whose per-file open/footer cost dominates
    * reads. Target file count comes from the RELATION's own size statistic
    * (no extra job, no file listing beyond what the scan already did);
    * round-robin repartition spreads rows evenly regardless of input skew.
    * Returns the file count written.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L << 20): Int = {
    val df = spark.read.parquet(inPath)
    val totalBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFilesBig = ((totalBytes + targetBytes - 1) / targetBytes) max BigInt(1)
    // stats can degrade to defaultSizeInBytes (Long.MaxValue) when unknown;
    // BigInt.toInt would silently WRAP that to a garbage (even negative)
    // partition count — fail loudly instead of compacting wrong
    require(nFilesBig.isValidInt,
      s"compact: implausible target file count $nFilesBig from size estimate " +
        s"$totalBytes — relation statistics unavailable?")
    val nFiles = nFilesBig.toInt
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(outPath)
    nFiles
  }

  /** Range-sorted layout for zone-map file skipping: repartitionByRange
    * gives each output file a DISJOINT span of the sort key and the
    * in-partition sort makes parquet row-group min/max stats tight, so a
    * point or range predicate on the key prunes to the few files whose span
    * intersects — the poor engine's z-order, exact for one-dimensional
    * access patterns (time, id).
    */
  def writeRangeSorted(
      df: DataFrame, path: String, sortCols: Seq[String], nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
