package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.LakeSink
import graft.operators.Skew

/** Lake-layout scale patterns: partition pruning, bucketed no-shuffle joins,
  * and salted skew joins — each asserted at the plan or result level.
  */
class LakeLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write prunes directories on partition-column filters") {
    val dir = Files.createTempDirectory("graft-lake").toString + "/orders"
    LakeSink.writePartitioned(
      Tables.orders(spark, sf), dir, Seq("o_orderstatus"))
    val back = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val plan = back.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("o_orderstatus"), s"no partition pruning in:\n$plan")
    // and the pruned read returns exactly the F rows
    val expect = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F").count()
    assert(back.count() == expect)
  }

  test("bucketed tables join without a shuffle exchange") {
    // stale warehouse dirs survive JVM restarts while the in-memory catalog
    // does not — clear both sides before writing
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("orders_bkt", "customer_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        Files.walk(dir.toPath).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
    }
    LakeSink.writeBucketed(
      Tables.orders(spark, sf), "orders_bkt", "o_custkey", 8, sortCol = Some("o_custkey"))
    LakeSink.writeBucketed(
      Tables.customer(spark, sf), "customer_bkt", "c_custkey", 8, sortCol = Some("c_custkey"))
    val joined = spark.sql(
      """SELECT /*+ MERGE(customer_bkt) */ o_orderkey, c_name
        |FROM orders_bkt JOIN customer_bkt ON o_custkey = c_custkey""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey")).count())
  }

  test("boxed z-order layout: footer zone map prunes files, pruned read loses nothing (sf0.1)") {
    val sfDir = "/root/testdata/sf0.1"
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not generated")
    val dir = Files.createTempDirectory("graft-zbox").toString + "/orders"
    val orders = Tables.orders(spark, sfDir)
    LakeSink.writeZOrderedBoxed(
      orders, dir, Seq("o_custkey", "o_totalprice"), nFiles = 16)
    val ranges = Seq(("o_custkey", 100.0, 500.0), ("o_totalprice", 50000.0, 150000.0))

    // the zone map must actually skip files for this narrow 2-D box...
    val (kept, total) = LakeSink.pruneFiles(spark, dir, ranges)
    assert(total >= 8, s"layout should land many files, got $total")
    assert(kept.nonEmpty && kept.size < total,
      s"zone map must prune: kept ${kept.size} of $total")

    // ...and the pruned read must equal the full scan with the predicate
    def scanMetric(df: org.apache.spark.sql.DataFrame, metric: String): Long = {
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case o => o
      }
      plan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics(metric).value
      }.sum
    }
    // execute THESE frames (not derived ones) so their scan metrics fill
    val prunedDf = LakeSink.readPruned(spark, dir, ranges)
      .select(col("o_orderkey"))
    val fullDf = ranges.foldLeft(spark.read.parquet(dir)) { case (d, (c, lo, hi)) =>
      d.filter(col(c) >= lo && col(c) <= hi)
    }.select(col("o_orderkey"))
    val pruned = prunedDf.collect().map(_.getLong(0)).toSet
    val full = fullDf.collect().map(_.getLong(0)).toSet
    assert(pruned == full, "file skipping must be lossless")
    assert(pruned.nonEmpty, "the probe box should select rows at sf0.1")

    // the I/O proof, independent of wall clock: the pruned plan opens
    // fewer files and reads fewer bytes than the full scan of the layout
    val (pFiles, fFiles) =
      (scanMetric(prunedDf, "numFiles"), scanMetric(fullDf, "numFiles"))
    val (pBytes, fBytes) =
      (scanMetric(prunedDf, "filesSize"), scanMetric(fullDf, "filesSize"))
    assert(pFiles == kept.size && pFiles < fFiles,
      s"pruned scan must open only surviving files: $pFiles vs $fFiles")
    assert(pBytes < fBytes,
      s"pruned scan must read fewer bytes: $pBytes vs $fBytes")
  }

  test("appendBoxed folds a batch into the zone map: merge == full relisting, pruning stays lossless") {
    val dir = Files.createTempDirectory("graft-zappend").toString + "/orders"
    val orders = Tables.orders(spark, sf)
    val (oldSlice, batch) =
      (orders.filter(col("o_orderkey") % 3 =!= 0), orders.filter(col("o_orderkey") % 3 === 0))
    LakeSink.writeZOrderedBoxed(
      oldSlice, dir, Seq("o_custkey", "o_totalprice"), nFiles = 8)
    LakeSink.appendBoxed(batch, dir, Seq("o_custkey", "o_totalprice"), nFiles = 4)

    // the incrementally-merged zone map equals a from-scratch relisting
    val merged = LakeSink.loadBoxes(spark, dir).toSet
    LakeSink.landBoxes(spark, dir, Seq("o_custkey", "o_totalprice"))
    assert(LakeSink.loadBoxes(spark, dir).toSet == merged,
      "merge(boxes(old), batch) must equal boxes(old ∪ batch)")
    assert(merged.map(_._1).size >= 10, "every data file must carry a box")

    // pruned read over the appended layout still equals the raw predicate
    val ranges = Seq(("o_custkey", 10.0, 60.0), ("o_totalprice", 0.0, 1e9))
    val (kept, total) = LakeSink.pruneFiles(spark, dir, ranges)
    assert(kept.nonEmpty && kept.size < total,
      s"zone map must still prune after the append: $kept of $total")
    val pruned = LakeSink.readPruned(spark, dir, ranges)
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    val full = orders
      .filter(col("o_custkey") >= 10 && col("o_custkey") <= 60)
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    assert(pruned == full, "append must not lose rows from the pruned read")
  }

  test("boxAudit prices append degradation; reoptimizeBoxed collapses it back") {
    val base = Files.createTempDirectory("graft-zreopt").toString
    val dir = base + "/orders"
    val orders = Tables.orders(spark, sf)
    val cols = Seq("o_custkey", "o_totalprice")
    LakeSink.writeZOrderedBoxed(
      orders.filter(col("o_orderkey") % 4 === 0), dir, cols, nFiles = 8)
    val fresh = LakeSink.boxOverlapAllDims(LakeSink.loadBoxes(spark, dir))
    // three append folds, each clustered alone: every epoch re-tiles the
    // key space, so cross-epoch boxes intersect in ALL dims
    (1 to 3).foreach { r =>
      LakeSink.appendBoxed(
        orders.filter(col("o_orderkey") % 4 === r), dir, cols, nFiles = 4)
    }
    val degraded = LakeSink.boxOverlapAllDims(LakeSink.loadBoxes(spark, dir))
    assert(degraded > fresh,
      s"appends must widen the all-dims overlap: $fresh -> $degraded")
    assert(LakeSink.shouldReoptimize(spark, dir, maxOverlap = 0.3),
      s"the maintenance decision must fire on the degraded layout: $degraded")

    // the rewrite restores a tight layout AND loses no rows
    val out = base + "/orders_opt"
    val after = LakeSink.reoptimizeBoxed(spark, dir, out, cols, nFiles = 20)
    after.foreach { case (c, n, _, _) =>
      assert(n == 20, s"re-clustered layout must land nFiles boxes, got $n for $c")
    }
    val reopt = LakeSink.boxOverlapAllDims(LakeSink.loadBoxes(spark, out))
    assert(reopt < degraded,
      s"re-OPTIMIZE must shrink the all-dims overlap: $degraded -> $reopt")
    assert(!LakeSink.shouldReoptimize(spark, out, maxOverlap = 0.3),
      s"decision must clear after the rewrite: $reopt")
    val a = spark.read.parquet(out).agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    val b = orders.agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    assert(a == b, "re-OPTIMIZE must preserve every row")
  }

  test("compact collapses a many-small-files table to the size-derived count") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val fragmented = s"$tmp/fragmented"
    val compacted = s"$tmp/compacted"
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("value"))
    ev.repartition(64).write.mode("overwrite").parquet(fragmented)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(fragmented) == 64)
    val n = graft.sources.LakeSink.compact(spark, fragmented, compacted,
      targetBytes = 512L << 20)
    assert(n == 1 && parquetFiles(compacted) == 1,
      "a sub-target-size table must compact to a single file")
    // content preserved exactly
    val a = spark.read.parquet(fragmented)
    val b = spark.read.parquet(compacted)
    assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("range-sorted layout gives files disjoint sort-key spans") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val ev = Tables.events(spark, sf).select(col("event_id"), col("ts"))
    graft.sources.LakeSink.writeRangeSorted(ev, s"$tmp/sorted", Seq("ts"), nFiles = 4)
    val files = new java.io.File(s"$tmp/sorted").listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 4)
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
      (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
    }.sortBy(_._1)
    spans.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"file spans overlap: $spans — zone-map skipping broken")
    }
    assert(spark.read.parquet(s"$tmp/sorted").count() == ev.count())
  }

  test("z-order layout prunes on BOTH clustered columns; range-sort only its first") {
    val tmp = Files.createTempDirectory("graft-zo").toString
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val nFiles = 8
    LakeSink.writeZOrdered(ord, s"$tmp/zo", Seq("o_custkey", "o_totalprice"), nFiles)
    LakeSink.writeRangeSorted(ord, s"$tmp/rs", Seq("o_custkey"), nFiles)

    // zone-map simulation: a file is skippable for a predicate range iff its
    // (min, max) span of that column misses the range — exactly what
    // parquet row-group stats + file pruning do with real readers
    def spans(dir: String, c: String): Array[(Double, Double)] =
      new java.io.File(dir).listFiles
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
          (r.getDouble(0), r.getDouble(1))
        }
    def skipped(spans: Array[(Double, Double)], lo: Double, hi: Double): Int =
      spans.count { case (l, h) => h < lo || l > hi }

    // probe: a narrow slice on the SECOND clustered column only
    val stats = ord.agg(
      min(col("o_totalprice")).cast("double"), max(col("o_totalprice")).cast("double")).head()
    val (plo, phi) = (stats.getDouble(0), stats.getDouble(1))
    val width = (phi - plo) / 16.0
    val zoSkip = skipped(spans(s"$tmp/zo", "o_totalprice"), plo, plo + width)
    val rsSkip = skipped(spans(s"$tmp/rs", "o_totalprice"), plo, plo + width)
    info(s"files skipped for a totalprice slice: zorder $zoSkip/$nFiles, rangesort $rsSkip/$nFiles")
    assert(zoSkip > rsSkip,
      "z-order must prune the non-leading column better than a range sort on the leading one")
    // and the first column still prunes usefully under z-order (top bits
    // interleaved, so a half-range predicate must skip something)
    val ck = ord.agg(min(col("o_custkey")).cast("double"),
      max(col("o_custkey")).cast("double")).head()
    val zoCk = skipped(spans(s"$tmp/zo", "o_custkey"),
      ck.getDouble(0), ck.getDouble(0) + (ck.getDouble(1) - ck.getDouble(0)) / 16.0)
    info(s"files skipped for a custkey slice under zorder: $zoCk/$nFiles")
    assert(zoCk > 0, "z-order lost the leading column entirely")
    assert(spark.read.parquet(s"$tmp/zo").count() == ord.count())
  }

  test("corpus build lands through compact + range-sort: curate -> pack -> lay out") {
    // the composed training-corpus query feeding the lake-maintenance path
    // end to end: a many-task writer fragments the packed output, compact
    // collapses it to the size-derived count, and the range-sorted layout
    // gives the dataloader disjoint (source, seq_id) file spans to read
    // sequences from without shuffling
    val tmp = Files.createTempDirectory("graft-corpus-lake").toString
    val packed = graft.operators.Curation.corpusBuild(
      Tables.documents(spark, sf), budget = 512)
    packed.repartition(16).write.mode("overwrite").parquet(s"$tmp/raw")
    val n = LakeSink.compact(spark, s"$tmp/raw", s"$tmp/compact",
      targetBytes = 512L << 20)
    assert(n == 1, "a sub-target-size corpus must compact to one file")
    LakeSink.writeRangeSorted(spark.read.parquet(s"$tmp/compact"),
      s"$tmp/sorted", Seq("source", "seq_id"), nFiles = 4)
    // content survives the whole chain exactly
    val laid = spark.read.parquet(s"$tmp/sorted")
    assert(laid.count() == packed.count() && packed.count() > 0)
    assert(laid.except(packed).isEmpty && packed.except(laid).isEmpty)
    // file-group bounds: every file owns a disjoint (source, seq_id) span
    val files = new java.io.File(s"$tmp/sorted").listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    val spans = files.flatMap { f =>
      val df = spark.read.parquet(f)
      if (df.isEmpty) None
      else {
        val r = df.agg(
          min(struct(col("source"), col("seq_id"))).as("lo"),
          max(struct(col("source"), col("seq_id"))).as("hi")).head()
        def t(i: Int) = (r.getStruct(i).getString(0), r.getStruct(i).getLong(1))
        Some((t(0), t(1)))
      }
    }.sortBy(_._1)
    assert(spans.length >= 2, "fixture must spread over multiple files")
    def leq(a: (String, Long), b: (String, Long)) =
      a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)
    spans.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(leq(hi, lo),
        s"file spans overlap: ${spans.toSeq} — dataloader file skipping broken")
    }
  }

  test("salted join equals the plain join") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val salted = Skew.saltedEquiJoin(orders, customer, "o_custkey", "c_custkey")
      .select(col("o_orderkey"), col("c_custkey"))
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("salted two-phase aggregation equals the direct aggregation") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy(col("user_id"))
      .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSumCount(ev, "user_id", col("value"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 == n)
      assert(math.abs(salted(k)._1 - s) < 1e-6) // double sum order differs across salts
    }
  }

  test("pruned reads KEEP files the zone map does not know (crash-window safety)") {
    val base = Files.createTempDirectory("graft-zcrash").toString
    val dir = base + "/orders"
    val orders = Tables.orders(spark, sf)
    val cols = Seq("o_custkey", "o_totalprice")
    LakeSink.writeZOrderedBoxed(
      orders.filter(col("o_orderkey") % 2 === 0), dir, cols, nFiles = 6)
    // simulate appendBoxed dying between the data commit and the _boxes
    // rewrite: append raw files, do NOT touch the zone map
    orders.filter(col("o_orderkey") % 2 =!= 0)
      .repartition(2).write.mode("append").parquet(dir)
    val ranges = Seq(("o_custkey", 10.0, 60.0), ("o_totalprice", 0.0, 1e9))
    val pruned = LakeSink.readPruned(spark, dir, ranges)
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    val full = orders
      .filter(col("o_custkey") >= 10 && col("o_custkey") <= 60)
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    assert(pruned == full,
      "rows from unknown (not-yet-boxed) files must never vanish from a pruned read")
    // and the boxed slice still prunes: kept < total even with the
    // unknown files force-included
    val (kept, total) = LakeSink.pruneFiles(spark, dir, ranges)
    assert(kept.size < total, s"boxed files must still skip: $kept of $total")
  }
}
