package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-file BLOOM-FILTER file skipping for a [[LakeTable]] — the
  * point-lookup complement to the zone map. Z-order boxes prune RANGE
  * predicates on the clustered columns; a needle query on any OTHER
  * column (`WHERE name = 'Customer#000000042'` against a key-clustered
  * table) intersects every box and degenerates to a full scan. The fix
  * every production lake ships (Delta bloom indexes, Parquet bloom
  * filters) is a compact per-file membership sketch: a lookup reads only
  * the files whose sketch says "maybe".
  *
  * Design constraints the implementation leans on:
  *   - data files are IMMUTABLE, so a file's bloom is valid FOREVER —
  *     the index is a grow-only (file → bitset) map with no invalidation
  *     protocol; replaced files simply stop being referenced by the live
  *     manifest, and their orphaned bloom rows are dead weight for
  *     [[vacuumIndex]], never a correctness hazard;
  *   - the index is a DERIVED artifact, not part of the commit: a live
  *     file with no bloom row yet (landed after the last [[refresh]]) is
  *     read CONSERVATIVELY, so the index can lag ingest by any amount
  *     and lookups stay exact — staleness costs IO, never answers;
  *   - duplicate bloom rows (a crashed refresh replayed) are harmless:
  *     the bitset is a deterministic function of the file's bytes, so
  *     duplicates are byte-identical and `dropDuplicates(file)` picks
  *     either;
  *   - the pruning DECISION is distributed (bitsets join against the
  *     broadcast needle set; only surviving file NAMES reach the
  *     driver), so a 100k-file table never materializes 100k bitsets in
  *     driver memory.
  *
  * Scale shape: a lookup touching one key reads
  * |files containing it| + |false positives (~n·2^-bits per hash)| +
  * |not-yet-indexed files| parquet files; the bloom probe itself scans
  * only the metadata-sized index artifact.
  */
object BloomIndex {

  /** Bitset buffer: fixed `words.length` = m/64 Longs per file — bounded
    * state, map-side combinable (merge is bitwise OR).
    */
  final case class BloomBuf(words: Array[Long])

  /** OR bit positions into a fixed-size bitset; the canonical
    * bounded-state Aggregator shape ([[graft.operators.TopK.TopKAgg]]).
    */
  final class BloomAgg(nWords: Int) extends Aggregator[Long, BloomBuf, Seq[Long]] {
    override def zero: BloomBuf = BloomBuf(new Array[Long](nWords))
    override def reduce(b: BloomBuf, pos: Long): BloomBuf = {
      b.words((pos >> 6).toInt) |= 1L << (pos & 63L)
      b
    }
    override def merge(a: BloomBuf, b: BloomBuf): BloomBuf = {
      var i = 0
      while (i < a.words.length) { a.words(i) |= b.words(i); i += 1 }
      a
    }
    override def finish(b: BloomBuf): Seq[Long] = b.words.toSeq
    override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  private def indexDir(tablePath: String, column: String) =
    s"$tablePath/_bloom_$column"

  /** The k hash positions of one value: pmod(xxhash64(value, i), m) for
    * i in 0..k-1 — ONE expression string shared verbatim by the build
    * and the probe, so both sides provably hash alike.
    */
  private def positionsExpr(valueCol: String, m: Long, k: Int): String =
    s"transform(sequence(0, ${k - 1}), i -> pmod(xxhash64($valueCol, i), ${m}L))"

  /** Index every live file that lacks a bloom row for `column`; returns
    * how many files were newly indexed. Incremental by construction —
    * already-indexed files are never re-read (their blooms are immutable
    * with them) — so an always-on loop calls this after each ingest fold
    * and pays O(new files). `bitsLog2`/`nHashes` fix the sketch geometry
    * at first build; a later refresh with different parameters fails
    * loud (mixed-geometry artifacts cannot be probed consistently).
    */
  def refresh(
      spark: SparkSession, tablePath: String, column: String,
      bitsLog2: Int = 16, nHashes: Int = 5): Int = {
    import spark.implicits._
    require(bitsLog2 >= 6 && bitsLog2 <= 26, s"bitsLog2 out of range: $bitsLog2")
    val m = 1L << bitsLog2
    val existing = indexedOrEmpty(spark, tablePath, column)
    existing.foreach { idx =>
      val geo = idx.select(col("m"), col("k")).distinct().collect()
      require(geo.length == 1 && geo(0).getLong(0) == m && geo(0).getInt(1) == nHashes,
        s"BloomIndex: $column artifact has geometry ${geo.toSeq}, " +
          s"refresh asked (m=$m, k=$nHashes) — geometry is fixed at first build")
    }
    val indexed: Set[String] = existing
      .map(_.select(col("file")).as[String].collect().toSet)
      .getOrElse(Set.empty)
    val commit = LakeTable.latest(spark, tablePath)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(commit.schemaDdl)
    // the probe hashes needles as STRING; the build must hash the same
    // bytes, so the indexed column must BE a string (hash a formatted
    // derived column for other types)
    require(schema(column).dataType == org.apache.spark.sql.types.StringType,
      s"BloomIndex: $column is ${schema(column).dataType.simpleString} — " +
        "bloom columns must be STRING (index a formatted derivation instead)")
    val live = commit.files
    val missing = live.filterNot(indexed)
    if (missing.isEmpty) return 0
    val agg = new BloomAgg(nWords = (m >> 6).toInt).toColumn
    // manifest reader schema: post-evolution, older files may lack the
    // column — their rows read NULL, and NULL never indexes (an IN
    // needle can't match NULL, so skipping such files is exact)
    val built = spark.read
      .schema(org.apache.spark.sql.types.StructType(
        schema.fields.map(_.copy(nullable = true))))
      .parquet(missing.map(f => s"$tablePath/$f"): _*)
      .filter(col(column).isNotNull)
      .select(
        substring_index(input_file_name(), "/", -1).as("file"),
        explode(expr(positionsExpr(column, m, nHashes))).as("pos"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("words"))
      .toDF("file", "words")
    // a zero-row file produces no agg group: give it the all-zero bloom
    // (it contains no value, so every probe correctly skips it) instead
    // of leaving it permanently "missing" and conservatively re-read
    val zero = Seq.fill((m >> 6).toInt)(0L)
    val rows = missing.toDF("file")
      .join(built, Seq("file"), "left_outer")
      .select(col("file"),
        coalesce(col("words"), typedLit(zero)).as("words"),
        lit(m).as("m"), lit(nHashes).as("k"))
    rows.write.mode("append").parquet(indexDir(tablePath, column))
    missing.size
  }

  /** Point lookup served through the index: read ONLY the live files
    * whose bloom admits at least one needle, plus (conservatively) live
    * files not yet indexed; then apply the exact residual filter. Result
    * rows are identical to `readLive.filter(column IN values)` — the
    * index changes which files open, never the answer.
    *
    * Concurrency: the lookup resolves the manifest ONCE and uses that
    * pinned commit for both the prune and the read — concurrent
    * mutations/vacuums between the two steps cannot swap the file set
    * under it. The pinned snapshot's files stay on disk as long as
    * retention covers them (the standard lake-reader contract:
    * `vacuum(keepVersions)` must exceed the longest in-flight read's
    * lag, exactly as it must cover a changefeed cursor's); a vacuum
    * outside that contract fails the read loud, never silently wrong.
    */
  def lookup(
      spark: SparkSession, tablePath: String, column: String,
      values: Seq[String]): DataFrame = {
    val c = LakeTable.latest(spark, tablePath)
    val (kept, unindexed) = prunedFilesOf(spark, c, tablePath, column, values)
    val files = kept ++ unindexed
    val base =
      if (files.isEmpty) LakeTable.readLive(spark, tablePath).filter(lit(false))
      // through the table's shared resolver, so deletion vectors apply —
      // a raw read here would resurrect shadowed rows into lookups
      else LakeTable.readFilesResolved(spark, tablePath, c, files)
    base.filter(col(column).isin(values: _*))
  }

  /** The pruning decision itself, for telemetry and specs:
    * (bloom-admitted live files, live files with no bloom row — read
    * conservatively). Only file NAMES reach the driver.
    */
  def prunedFiles(
      spark: SparkSession, tablePath: String, column: String,
      values: Seq[String]): (Seq[String], Seq[String]) =
    prunedFilesOf(
      spark, LakeTable.latest(spark, tablePath), tablePath, column, values)

  /** [[prunedFiles]] against a caller-pinned commit — the form [[lookup]]
    * uses so its prune and its read share one manifest resolution.
    */
  def prunedFilesOf(
      spark: SparkSession, c: LakeTable.Commit, tablePath: String,
      column: String, values: Seq[String]): (Seq[String], Seq[String]) = {
    import spark.implicits._
    require(values.nonEmpty, "BloomIndex.lookup: empty needle set")
    val live = c.files
    val idx = indexedOrEmpty(spark, tablePath, column) match {
      case None      => return (Seq.empty, live) // no index yet: all conservative
      case Some(idx) => idx.dropDuplicates("file")
    }
    val liveIdx = idx.join(broadcast(live.toDF("file")), Seq("file"), "left_semi")
    val geo = liveIdx.select(col("m"), col("k")).distinct().collect()
    if (geo.isEmpty) return (Seq.empty, live)
    require(geo.length == 1, s"BloomIndex: mixed geometry ${geo.toSeq}")
    val (m, k) = (geo(0).getLong(0), geo(0).getInt(1))
    val needles = values.toDF("v")
    // per (file, needle): every one of the k bits must be set; a file
    // survives if ANY needle may be present
    val hit = expr(
      s"forall(${positionsExpr("v", m, k)}, " +
        "p -> (shiftright(element_at(words, int(p div 64) + 1), int(p % 64)) & 1) = 1)")
    val kept = liveIdx.crossJoin(broadcast(needles))
      .filter(hit)
      .select(col("file")).distinct()
      .as[String].collect().toSeq.sorted
    val indexedNames = liveIdx.select(col("file")).as[String].collect().toSet
    (kept, live.filterNot(indexedNames))
  }

  /** Drop bloom rows for files no LIVE manifest version can still read
    * (not referenced by any retained commit) — the index-side twin of
    * [[LakeTable.vacuum]]. Returns rows kept. Rewrites the artifact in
    * place via a temp dir + move (the artifact is derived: a crash here
    * at worst loses the index, never table data).
    */
  def vacuumIndex(
      spark: SparkSession, tablePath: String, column: String): Long = {
    import spark.implicits._
    val referenced = LakeTable.history(spark, tablePath).flatMap(_.files).toSet
    val dir = indexDir(tablePath, column)
    val idx = indexedOrEmpty(spark, tablePath, column).getOrElse(return 0L)
    val kept = idx.join(broadcast(referenced.toSeq.toDF("file")), Seq("file"), "left_semi")
      .dropDuplicates("file")
    val tmp = s"$dir.tmp-${java.util.UUID.randomUUID()}"
    kept.write.parquet(tmp)
    val n = spark.read.parquet(tmp).count()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    require(fs.rename(new Path(tmp), new Path(dir)), s"BloomIndex: vacuum move lost at $dir")
    n
  }

  private def indexedOrEmpty(
      spark: SparkSession, tablePath: String, column: String): Option[DataFrame] = {
    val dir = indexDir(tablePath, column)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir))) None else Some(spark.read.parquet(dir))
  }
}
