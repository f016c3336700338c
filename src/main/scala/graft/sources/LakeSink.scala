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

  /** MULTI-dimensional zone-map clustering — true Z-order (Morton)
    * interleave, the layout behind Delta/Iceberg `OPTIMIZE ZORDER BY`:
    * where [[writeRangeSorted]] prunes perfectly on its FIRST key and not
    * at all on the second, a Z-order key interleaves the bits of every
    * clustering column, so files cover axis-aligned boxes of the key space
    * and a predicate on ANY clustered column skips most files
    * (LakeLayoutSpec measures exactly this).
    *
    * Each column is affine-scaled to `bits` integer levels from its
    * (min, max) — the [[graft.operators.Sq]] fit shape: one tiny
    * aggregation, broadcast back, floor-binned. Production z-orders bin by
    * RANGE PARTITION ID (quantiles) to resist skew; the affine bin keeps
    * the key a pure deterministic function of the row + two broadcast
    * numbers — replayable by any engine, stable under retries — and the
    * skew trade is documented rather than hidden. Bit i of scaled column j
    * lands at interleaved position `i·n + j` (LSB-first), so the sum of
    * disjoint powers of two IS the bit-or. Everything is integer Column
    * math — codegen'd end to end, no UDF.
    */
  def zorderKey(scaled: Seq[org.apache.spark.sql.Column], bits: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    require(scaled.nonEmpty && bits * scaled.length <= 62,
      s"zorderKey: ${scaled.length} cols x $bits bits exceeds a long")
    val n = scaled.length
    val terms = for {
      (c, j) <- scaled.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _)
  }

  /** Affine bin of `x` into [0, 2^bits): floor((x−lo)·(2^bits−1)/(hi−lo)),
    * clamped; a constant column (hi = lo) bins to 0.
    */
  def scaleToBits(
      x: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{floor, least, lit, when}
    val maxV = (1L << bits) - 1
    when(hi.cast("double") === lo.cast("double"), lit(0L))
      .otherwise(least(
        floor((x.cast("double") - lo.cast("double")) * lit(maxV.toDouble) /
          (hi.cast("double") - lo.cast("double"))).cast("long"),
        lit(maxV)))
  }

  /** `df` plus a `zkey` column over `cols` — the clustering key as a query
    * artifact (min/max fit in ONE broadcast row, key math all codegen'd).
    */
  def zorderFrame(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, max, min}
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"_lo_$c"), max(col(c)).as(s"_hi_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    df.crossJoin(broadcast(stats))
      .withColumn("zkey", zorderKey(
        cols.map(c => scaleToBits(col(c), col(s"_lo_$c"), col(s"_hi_$c"), bits)),
        bits))
      .drop(cols.flatMap(c => Seq(s"_lo_$c", s"_hi_$c")): _*)
  }

  /** Z-order-clustered parquet: range-partition + sort on the Morton key,
    * so each file owns a compact box of the multi-column key space.
    */
  def writeZOrdered(
      df: DataFrame, path: String, cols: Seq[String], nFiles: Int,
      bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.col
    zorderFrame(df, cols, bits)
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
