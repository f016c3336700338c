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

  /** [[writeZOrdered]] plus a landed zone map: after the clustered write,
    * one metadata-only pass reads every file's parquet FOOTER (no data
    * pages) and stores per-file min/max of the clustered columns under
    * `path/_boxes` — the underscore keeps it invisible to normal parquet
    * reads of `path`. This is the Delta/Iceberg stats-collection step:
    * boxes are captured once at layout time, so query-time pruning
    * ([[readPruned]]) is a lookup in a files-count-sized table, never a
    * scan. Footer reads fan out over executors (one ranged read each).
    */
  def writeZOrderedBoxed(
      df: DataFrame, path: String, cols: Seq[String], nFiles: Int,
      bits: Int = 16): Unit = {
    writeZOrdered(df, path, cols, nFiles, bits)
    landBoxes(df.sparkSession, path, cols)
  }

  /** Read each data file's footer statistics and land the zone map
    * (file, col, mn, mx) at `path/_boxes`. Numeric clustered columns only
    * (int/long/float/double) — the types [[zorderKey]] bins.
    */
  def landBoxes(
      spark: org.apache.spark.sql.SparkSession, path: String,
      cols: Seq[String]): Unit =
    writeBoxTable(spark, path, boxesOf(spark, listParquet(spark, path), cols))

  /** Fold a NEW batch into a boxed layout incrementally: the batch is
    * z-order-clustered on the same columns into its own tight-boxed files
    * (an unclustered append would land whole-domain boxes that never
    * prune), appended, and ONLY the new files' footers are read — the
    * stored zone map gains their rows without touching an existing
    * footer: `merge(boxes(old), batch) == boxes(old ∪ batch)`, the
    * boilerplate-index incremental contract applied to layout stats.
    * Per-fold cost is O(|batch|) + one small-file metadata pass; the
    * cross-batch overlap that accumulates (two appends may cover the same
    * key box) degrades pruning, not correctness — a widening overlap
    * fraction is the re-OPTIMIZE (full [[writeZOrderedBoxed]]) signal.
    */
  def appendBoxed(
      df: DataFrame, path: String, cols: Seq[String], nFiles: Int,
      bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val before = listParquet(spark, path).toSet
    zorderFrame(df, cols, bits)
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey")
      .write.mode(SaveMode.Append).parquet(path)
    val fresh = listParquet(spark, path).filterNot(before)
    writeBoxTable(spark, path,
      loadBoxes(spark, path) ++ boxesOf(spark, fresh, cols))
  }

  /** Zone-map health audit — the number the appendBoxed docstring's
    * "widening overlap fraction is the re-OPTIMIZE signal" promise is
    * cashed out in. Per clustered column, over the landed `_boxes` rows:
    * file count, the mean box width relative to the column's domain
    * (tight-after-OPTIMIZE, widening as unclustered mass accumulates),
    * and the fraction of file PAIRS whose boxes overlap in THIS column's
    * projection — per-column telemetry for choosing which columns earn a
    * clustering slot (a column whose projection overlap is ~1 buys no
    * skipping on its own). The layout-level health number is
    * [[boxOverlapAllDims]]. Pure driver arithmetic over the
    * files-count-sized zone map (the same rows query-time pruning
    * reads) — no job, O(files²) pairs at metadata scale.
    */
  def boxAudit(boxes: Seq[(String, String, Double, Double)])
      : Seq[(String, Int, Double, Double)] = {
    boxes.groupBy(_._2).toSeq.sortBy(_._1).map { case (c, rows) =>
      val n = rows.size
      val lo = rows.map(_._3).min
      val hi = rows.map(_._4).max
      val domain = hi - lo
      val meanRelWidth =
        if (domain == 0.0) 0.0
        else rows.map(r => (r._4 - r._3) / domain).sum / n
      val pairs = for {
        (a, i) <- rows.zipWithIndex; b <- rows.drop(i + 1)
      } yield if (a._3 <= b._4 && a._4 >= b._3) 1 else 0
      val overlapFrac =
        if (pairs.isEmpty) 0.0 else pairs.sum.toDouble / pairs.size
      (c, n, meanRelWidth, overlapFrac)
    }
  }

  /** The MULTI-dimensional overlap — fraction of file pairs whose boxes
    * intersect in EVERY clustered column simultaneously. This, not the
    * per-column projection, is the z-order health number: a fresh Morton
    * tiling gives files near-disjoint k-D boxes even though their 1-D
    * projections overlap freely (a file's custkey span recurs in every
    * file at other price bands — inherent, not degradation), while each
    * append epoch re-tiles the whole key space and its boxes intersect
    * most of the previous epochs'. Near 0 after OPTIMIZE, climbing with
    * every fold.
    */
  def boxOverlapAllDims(boxes: Seq[(String, String, Double, Double)]): Double = {
    val byFile = boxes.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.map(r => (r._2, r._3, r._4)) }
    val hits = for {
      (a, i) <- byFile.zipWithIndex; b <- byFile.drop(i + 1)
    } yield if (a.forall { case (c, mn, mx) =>
      b.find(_._1 == c).forall { case (_, bmn, bmx) => mn <= bmx && mx >= bmn }
    }) 1 else 0
    if (hits.isEmpty) 0.0 else hits.sum.toDouble / hits.size
  }

  /** The maintenance decision: re-OPTIMIZE when the all-dims pairwise
    * box-overlap fraction exceeds `maxOverlap`. Correctness never
    * degrades with appends, pruning does — this is the moment the lake
    * schedules [[reoptimizeBoxed]].
    */
  def shouldReoptimize(
      spark: org.apache.spark.sql.SparkSession, path: String,
      maxOverlap: Double = 0.5): Boolean =
    boxOverlapAllDims(loadBoxes(spark, path)) > maxOverlap

  /** The re-OPTIMIZE itself — rewrite an append-degraded boxed layout as
    * a fresh z-order-clustered one (full [[writeZOrderedBoxed]] of the
    * accumulated rows) at `outPath`. A distinct output path because
    * overwriting a parquet directory while reading it is undefined; a
    * production lake swaps the table pointer (the Delta/Iceberg commit)
    * after the rewrite lands. Returns the post-rewrite audit so the
    * caller can assert the overlap actually collapsed.
    */
  def reoptimizeBoxed(
      spark: org.apache.spark.sql.SparkSession, inPath: String, outPath: String,
      cols: Seq[String], nFiles: Int, bits: Int = 16)
      : Seq[(String, Int, Double, Double)] = {
    writeZOrderedBoxed(spark.read.parquet(inPath), outPath, cols, nFiles, bits)
    boxAudit(loadBoxes(spark, outPath))
  }

  private def writeBoxTable(
      spark: org.apache.spark.sql.SparkSession, path: String,
      boxes: Seq[(String, String, Double, Double)]): Unit = {
    import spark.implicits._
    boxes.toDF("file", "col", "mn", "mx")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/_boxes")
  }

  /** ONE footer pass per landed file set: row count, byte size, and the
    * clustered columns' min/max boxes from the same opened footer — the
    * fused form of [[boxesOf]] + [[rowCountsOf]] + a per-file status
    * probe, which every lake mutation previously paid as two separate
    * executor jobs plus O(files) driver-side getFileStatus RPCs per
    * commit (three metadata passes over the same footers). Zero-row
    * files report empty boxes (nothing to bound; callers drop them
    * before the manifest). Returned per file: (rows, bytes,
    * Seq((col, mn, mx))).
    */
  private[sources] def footerMeta(
      spark: org.apache.spark.sql.SparkSession, files: Seq[String],
      cols: Seq[String]): Map[String, (Long, Long, Seq[(String, Double, Double)])] = {
    if (files.isEmpty) return Map.empty
    // ship the SESSION's hadoop configuration into the footer tasks (as
    // Spark's own file readers do): a bare `new Configuration()` would
    // drop spark.hadoop.* settings — object-store credentials, custom
    // filesystems — and the footer job would fail where the write worked
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 32)))
      .map { f =>
        import scala.jdk.CollectionConverters._
        val conf = confB.value.value
        val inputFile = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(inputFile)
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          val rows = blocks.map(_.getRowCount).sum
          val boxes =
            if (rows == 0L) Nil
            else cols.map { c =>
              val stats = blocks.flatMap(
                _.getColumns.asScala.find(_.getPath.toDotString == c))
                .map(_.getStatistics)
                .filter(s => s != null && s.hasNonNullValue)
              require(stats.nonEmpty, s"footerMeta: no footer stats for '$c' in $f")
              def d(v: Any): Double = v match {
                case n: java.lang.Number => n.doubleValue()
                case other => throw new IllegalArgumentException(
                  s"footerMeta: non-numeric stats for '$c' (${other.getClass.getName})")
              }
              (c, stats.map(s => d(s.genericGetMin)).min,
                stats.map(s => d(s.genericGetMax)).max)
            }
          (f, (rows, inputFile.getLength, boxes))
        } finally reader.close()
      }
      .collect().toMap
  }

  /** Footer pass over `files` only — the executor-fanned metadata read
    * shared by [[landBoxes]] (all files) and [[appendBoxed]] (the fresh
    * batch's files).
    */
  private[sources] def boxesOf(
      spark: org.apache.spark.sql.SparkSession, files: Seq[String],
      cols: Seq[String]): Seq[(String, String, Double, Double)] = {
    if (files.isEmpty) return Nil
    spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 32)))
      .flatMap { f =>
        import scala.jdk.CollectionConverters._
        val conf = new org.apache.hadoop.conf.Configuration()
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), conf))
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          // a ZERO-ROW part file (an empty frame's schema-bearing write)
          // has no stats to box; emitting no box row is exact — the file
          // holds nothing, and readers treat unboxed files conservatively
          if (blocks.map(_.getRowCount).sum == 0L) Nil
          else cols.map { c =>
            val stats = blocks.flatMap(
              _.getColumns.asScala.find(_.getPath.toDotString == c))
              .map(_.getStatistics)
              .filter(s => s != null && s.hasNonNullValue)
            require(stats.nonEmpty, s"landBoxes: no footer stats for '$c' in $f")
            def d(v: Any): Double = v match {
              case n: java.lang.Number => n.doubleValue()
              case other => throw new IllegalArgumentException(
                s"landBoxes: non-numeric stats for '$c' (${other.getClass.getName})")
            }
            (f, c, stats.map(s => d(s.genericGetMin)).min,
              stats.map(s => d(s.genericGetMax)).max)
          }
        } finally reader.close()
      }
      .collect().toSeq
  }

  /** Per-file row counts from the parquet footers — the same
    * metadata-sized distributed read as [[boxesOf]], collected once at
    * commit time so `count(*)` never has to open a data file again.
    */
  private[sources] def rowCountsOf(
      spark: org.apache.spark.sql.SparkSession,
      files: Seq[String]): Seq[(String, Long)] = {
    if (files.isEmpty) return Nil
    spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 32)))
      .map { f =>
        import scala.jdk.CollectionConverters._
        val conf = new org.apache.hadoop.conf.Configuration()
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), conf))
        try (f, reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum)
        finally reader.close()
      }
      .collect().toSeq
  }

  private[sources] def listParquet(
      spark: org.apache.spark.sql.SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")
        && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
  }

  /** The files of `path` whose stored box intersects every `ranges` bound
    * (inclusive), plus the total file count — the pruning decision itself,
    * made from the landed `_boxes` zone map plus the ACTUAL data-file
    * listing: a data file with no box row is KEPT, never skipped. That
    * safe default is what makes the append protocol crash-tolerant —
    * [[appendBoxed]] commits data files before it rewrites `_boxes`, so a
    * crash in the window (or mid-overwrite of the non-atomic box table)
    * leaves unknown files behind; pruning on boxes alone would silently
    * drop their rows from every pruned read, the worst failure a lake
    * can have. Unknown files cost a full scan of themselves until the
    * next [[landBoxes]]/append repairs the map — degraded pruning, never
    * degraded answers.
    */
  def pruneFiles(
      spark: org.apache.spark.sql.SparkSession, path: String,
      ranges: Seq[(String, Double, Double)]): (Seq[String], Int) =
    pruneFilesListed(
      listParquet(spark, path), loadBoxes(spark, path), ranges)

  /** [[pruneFiles]] against pre-loaded inputs: `allFiles` is the data-file
    * listing (unknown files kept), `boxes` the zone map.
    */
  def pruneFilesListed(
      allFiles: Seq[String],
      boxes: Seq[(String, String, Double, Double)],
      ranges: Seq[(String, Double, Double)]): (Seq[String], Int) = {
    val byFile = boxes.groupBy(_._1)
    val kept = allFiles.filter { f =>
      byFile.get(f) match {
        case None => true // no box row: cannot prune, must read
        case Some(rows) => ranges.forall { case (c, lo, hi) =>
          rows.find(_._2 == c).forall { case (_, _, mn, mx) => mn <= hi && mx >= lo }
        }
      }
    }.sorted
    (kept, allFiles.size)
  }

  /** The landed zone map as driver rows — load ONCE per layout (a planner
    * caches table stats; the harness memoizes this next to the layout) so
    * per-query pruning is pure driver arithmetic, no job at all.
    */
  def loadBoxes(spark: org.apache.spark.sql.SparkSession, path: String)
      : Seq[(String, String, Double, Double)] = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(s"$path/_boxes")
      .select(col("file"), col("col"), col("mn"), col("mx"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
  }

  /** Range-predicate read over a boxed layout: open ONLY the files whose
    * zone-map box intersects the predicate (plus any file the map does
    * not know — see [[pruneFiles]]'s safe default), then apply the exact
    * residual filter — identical rows to the full scan (LakeLayoutSpec
    * pins it; the q_zorder_prune oracle re-filters the raw table), minus
    * the skipped files' I/O. At 100 TB this is the difference between
    * touching a few boxes and touching the table.
    */
  def readPruned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      ranges: Seq[(String, Double, Double)]): DataFrame =
    readPrunedFrom(spark, path, loadBoxes(spark, path), ranges)

  /** [[readPruned]] against a pre-loaded zone map: the pruning decision is
    * driver arithmetic over `boxes` + the file listing (one metadata RPC),
    * so the query's only job is the scan of the surviving files.
    */
  def readPrunedFrom(
      spark: org.apache.spark.sql.SparkSession, path: String,
      boxes: Seq[(String, String, Double, Double)],
      ranges: Seq[(String, Double, Double)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val (kept, _) = pruneFilesListed(listParquet(spark, path), boxes, ranges)
    val base =
      if (kept.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(kept: _*)
    ranges.foldLeft(base) { case (d, (c, lo, hi)) =>
      d.filter(col(c) >= lo && col(c) <= hi)
    }
  }
}
