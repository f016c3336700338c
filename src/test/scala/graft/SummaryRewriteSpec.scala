package graft

import org.apache.spark.sql.functions._
import graft.plans.SummaryRewrite

class SummaryRewriteSpec extends SparkSpec {

  private def base = Tables.load(spark, sf, "lineitem")

  private def registerRollup(b: org.apache.spark.sql.DataFrame = base): Unit = {
    val summary = b
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("cnt"),
        count(col("l_quantity")).as("cnt_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .localCheckpoint()
    SummaryRewrite.register("li_rollup", b, summary,
      Seq("l_returnflag", "l_linestatus"),
      Map(
        ("sum", "l_quantity") -> "sum_qty",
        ("count", "*") -> "cnt",
        ("count", "l_quantity") -> "cnt_qty",
        ("min", "l_extendedprice") -> "min_price",
        ("max", "l_extendedprice") -> "max_price"))
    SummaryRewrite.install(spark)
  }

  private def rollupQuery =
    base.groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy(col("l_returnflag"))

  test("subset-grouping rollup rewrites to the summary scan, result exact") {
    SummaryRewrite.clear()
    val want = rollupQuery.collect().map(_.toSeq).toSeq // rule inactive: fact scan
    registerRollup()
    try {
      val q = rollupQuery
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("ExistingRDD"),
        s"must scan the materialized summary:\n$plan")
      assert(!plan.toLowerCase.contains("parquet"),
        s"must not rescan the fact table:\n$plan")
      assert(q.collect().map(_.toSeq).toSeq == want,
        "rewritten plan must return the exact fact-table answer")
    } finally SummaryRewrite.clear()
  }

  test("global (no-group) aggregate also rides the summary") {
    SummaryRewrite.clear()
    val want = base.agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSeq
    registerRollup()
    try {
      val q = base.agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      assert(q.queryExecution.executedPlan.toString.contains("ExistingRDD"))
      assert(q.collect().map(_.toSeq).toSeq == want)
    } finally SummaryRewrite.clear()
  }

  test("avg decomposes to sum-of-sums / sum-of-counts; exact on integer-valued doubles") {
    SummaryRewrite.clear()
    val want = base.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))
      .orderBy(col("l_returnflag")).collect().map(_.toSeq).toSeq
    registerRollup()
    try {
      val q = base.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))
        .orderBy(col("l_returnflag"))
      assert(q.queryExecution.executedPlan.toString.contains("ExistingRDD"),
        "avg over registered (sum, count) must ride the summary")
      // l_quantity is integer-valued: both sums are exact, so the rewritten
      // quotient equals the row-scan average bit-for-bit here
      assert(q.collect().map(_.toSeq).toSeq == want)
    } finally SummaryRewrite.clear()
  }

  test("soundness gates decline: filter, distinct agg, unknown measure, avg") {
    SummaryRewrite.clear()
    registerRollup()
    try {
      val filtered = base.filter(col("l_quantity") > 10)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
      assert(filtered.queryExecution.executedPlan.toString.toLowerCase.contains("parquet"),
        "a filtered aggregate must NOT use the summary")
      val distinctAgg = base.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_linestatus")).as("d"))
      assert(distinctAgg.queryExecution.executedPlan.toString.toLowerCase.contains("parquet"),
        "count(DISTINCT) is not self-decomposable")
      val unknown = base.groupBy(col("l_returnflag")).agg(sum(col("l_tax")).as("s"))
      assert(unknown.queryExecution.executedPlan.toString.toLowerCase.contains("parquet"),
        "a measure the summary lacks must fall back to the fact scan")
      val average = base.groupBy(col("l_returnflag")).agg(avg(col("l_extendedprice")).as("a"))
      assert(average.queryExecution.executedPlan.toString.toLowerCase.contains("parquet"),
        "avg over a measure with no registered SUM must fall back")
    } finally SummaryRewrite.clear()
  }

  test("staleness gate: appending to the base declines the rewrite and the answer sees the new rows") {
    SummaryRewrite.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-stale").toString
    try {
      base.write.mode("overwrite").parquet(dir)
      def rd = spark.read.parquet(dir)
      registerRollup(rd)
      val fresh = rd.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
      assert(fresh.queryExecution.executedPlan.toString.contains("ExistingRDD"),
        "pre-append the rewrite must fire")
      val before = fresh.collect().map(_.toSeq).toSeq

      // append one row with a known quantity and re-read: the listing
      // signature changes, so the SAME aggregate must decline the summary
      // and its answer must include the appended row
      rd.limit(1).withColumn("l_quantity", lit(1000000.0))
        .write.mode("append").parquet(dir)
      spark.catalog.refreshByPath(dir)
      val after = rd.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
      val plan = after.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("parquet") && !plan.contains("ExistingRDD"),
        s"post-append the rewrite must decline (stale summary):\n$plan")
      val beforeTotal = before.map(_(1).asInstanceOf[Double]).sum
      val afterTotal = after.collect().map(_.getDouble(1)).sum
      assert(math.abs(afterTotal - beforeTotal - 1000000.0) < 1e-6,
        "the declined plan's answer must include the appended row")
    } finally {
      SummaryRewrite.clear()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("incremental fold: fold == refit exactly, and the rewrite serves the folded summary after re-register") {
    SummaryRewrite.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-fold").toString
    try {
      import graft.operators.Mv
      val epoch0 = base.filter(col("l_orderkey") % 2 === 0)
      val epoch1 = base.filter(col("l_orderkey") % 2 =!= 0)
      epoch0.write.mode("overwrite").parquet(dir)
      def rd = spark.read.parquet(dir)
      val groupCols = Seq("l_returnflag", "l_linestatus")
      val measures = Map(
        ("sum", "l_quantity") -> "sum_qty", ("count", "*") -> "cnt",
        ("min", "l_extendedprice") -> "min_price",
        ("max", "l_extendedprice") -> "max_price")
      val s0 = Mv.summarize(rd, groupCols, measures).localCheckpoint()
      val folded = Mv.foldSummary(s0, epoch1, groupCols, measures).localCheckpoint()
      // fold == refit, bit-exactly (integer-valued double sums)
      def sorted(df: org.apache.spark.sql.DataFrame) = df
        .orderBy(groupCols.map(col): _*).collect().map(_.toSeq).toSeq
      assert(sorted(folded) == sorted(Mv.summarize(base, groupCols, measures)),
        "folding the epoch must equal re-aggregating the whole base")
      // the maintenance loop: the append epoch lands in the base dir, the
      // FOLDED summary re-registers over the refreshed listing, and the
      // rewrite serves it — no base re-aggregation ever ran
      epoch1.write.mode("append").parquet(dir)
      spark.catalog.refreshByPath(dir)
      val want = base.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"), max(col("l_extendedprice")).as("m"))
        .orderBy(col("l_returnflag")).collect().map(_.toSeq).toSeq
      SummaryRewrite.register("li_fold", rd, folded, groupCols, measures)
      SummaryRewrite.install(spark)
      val q = rd.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"), max(col("l_extendedprice")).as("m"))
        .orderBy(col("l_returnflag"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("ExistingRDD") && !plan.toLowerCase.contains("parquet"),
        s"post-fold the rewrite must serve the folded summary:\n$plan")
      assert(q.collect().map(_.toSeq).toSeq == want,
        "the folded summary must answer for the full (appended) base")
    } finally {
      SummaryRewrite.clear()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("retracting fold: the changefeed maintains the view under deletes, updates and group moves") {
    import spark.implicits._
    import graft.operators.Mv
    import graft.sources.LakeTable
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mv-retract").toString + "/t"
    val base0 = Seq(
      (0L, "g0", 5.0), (1L, "g1", 10.0), (2L, "g1", 20.0),
      (3L, "g2", 30.0), (4L, "g2", 40.0)).toDF("key", "name", "val")
    LakeTable.init(base0, dir, Seq("key"), nFiles = 2)
    // full-image changelog: key 2 MIGRATES g1→g2 with a new val; key 4
    // updates in place; key 0 deletes (g0's last row); key 9 inserts g3
    val ch = Seq(
      (2L, 1L, "U", "g2", 25.0), (4L, 2L, "U", "g2", 45.0),
      (0L, 3L, "D", null.asInstanceOf[String], 0.0),
      (9L, 4L, "U", "g3", 5.0)).toDF("key", "seq", "op", "name", "val")
    LakeTable.applyChangelogFull(spark, dir, ch, Seq("key"))
    val groupCols = Seq("name")
    val measures = Map(("sum", "val") -> "sum_val", ("count", "*") -> "cnt",
      ("count", "val") -> "cnt_val")
    val v1 = Mv.summarize(LakeTable.readAt(spark, dir, 1), groupCols, measures)
    val feed = LakeTable.readChanges(spark, dir, 1, 2, withPreimage = true)
    val got = Mv.applyChanges(v1, feed, groupCols, measures)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("name")).collect().map(_.toSeq).toSeq
    assert(sorted(got) ==
      sorted(Mv.summarize(LakeTable.readAt(spark, dir, 2), groupCols, measures)),
      "retracting fold must equal re-summarizing the new snapshot")
    val m = got.collect() // columns: name, cnt, cnt_val, sum_val
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(!m.contains("g0"), "a group whose last row left must vanish")
    assert(m("g1") == ((1L, 10.0)), "the migrated row must retract from g1")
    assert(m("g2") == ((3L, 100.0)), "g2 = carried 30 + migrated-in 25 + updated 45")
    assert(m("g3") == ((1L, 5.0)), "the insert must open g3")
    // a group whose surviving values go all-NULL must fold to a NULL sum
    // (not 0) — exactly what a refit would produce; the count(val)
    // companion is the detector
    val nullFeed = Seq(
      ("k", "U", "g1", null.asInstanceOf[java.lang.Double],
        "g1", java.lang.Double.valueOf(10.0)))
      .toDF("key", "op", "name", "val", "name_pre", "val_pre")
    val nulled = Mv.applyChanges(got, nullFeed, groupCols, measures)
      .filter(col("name") === "g1").collect().head
    assert(nulled.getLong(1) == 1L && nulled.getLong(2) == 0L &&
      nulled.isNullAt(3),
      s"all-NULL group must carry a NULL sum, got $nulled")
    // non-retractable / underspecified measure sets fail loud: min/max,
    // a missing count(*), and a sum without its count(c) companion
    intercept[IllegalArgumentException](Mv.applyChanges(
      v1, feed, groupCols, Map(("min", "val") -> "m", ("count", "*") -> "cnt")))
    intercept[IllegalArgumentException](Mv.applyChanges(
      v1, feed, groupCols, Map(("sum", "val") -> "sum_val")))
    intercept[IllegalArgumentException](Mv.applyChanges(
      v1, feed, groupCols,
      Map(("sum", "val") -> "sum_val", ("count", "*") -> "cnt")))
  }

  test("touched-group repair maintains min/max under deletes (extremum eviction)") {
    import spark.implicits._
    import graft.operators.Mv
    import graft.sources.LakeTable
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mv-repair").toString + "/t"
    val base0 = Seq(
      (0L, "g0", 5.0), (1L, "g1", 10.0), (2L, "g1", 20.0),
      (3L, "g2", 30.0), (4L, "g2", 40.0)).toDF("key", "name", "val")
    LakeTable.init(base0, dir, Seq("key"), nFiles = 2)
    // key 2 was g1's MAX: its delete must surface 10.0 as the new max —
    // the case no retraction can answer; key 4 raises g2's max in place;
    // key 0's delete kills g0; key 9 opens g3
    val ch = Seq(
      (2L, 1L, "D", null.asInstanceOf[String], 0.0),
      (4L, 2L, "U", "g2", 45.0),
      (0L, 3L, "D", null.asInstanceOf[String], 0.0),
      (9L, 4L, "U", "g3", 5.0)).toDF("key", "seq", "op", "name", "val")
    LakeTable.applyChangelogFull(spark, dir, ch, Seq("key"))
    val groupCols = Seq("name")
    val measures = Map(
      ("min", "val") -> "min_val", ("max", "val") -> "max_val",
      ("count", "*") -> "cnt")
    val v1 = Mv.summarize(LakeTable.readAt(spark, dir, 1), groupCols, measures)
    val got = Mv.repairChanges(
      v1, LakeTable.readLive(spark, dir),
      LakeTable.readChanges(spark, dir, 1, 2, withPreimage = true),
      groupCols, measures)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("name")).collect().map(_.toSeq).toSeq
    assert(sorted(got) ==
      sorted(Mv.summarize(LakeTable.readAt(spark, dir, 2), groupCols, measures)),
      "touched-group repair must equal re-summarizing the new snapshot")
    val m = got.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(m("g1") == ((1L, 10.0, 10.0)),
      "deleting the group max must surface the surviving extremum")
    assert(m("g2") == ((2L, 45.0, 30.0)))
    assert(m("g3") == ((1L, 5.0, 5.0)))
    assert(!m.contains("g0"), "a dead group must not survive the repair")
  }

  test("avg over a nullable measure with NULLs: count(*) denominator declines; count(x) stays exact") {
    SummaryRewrite.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-null").toString
    try {
      // half the measure values NULL: avg must skip them, count(*) wouldn't
      base.withColumn("l_quantity",
          when(col("l_orderkey") % 2 === 0, col("l_quantity")))
        .write.mode("overwrite").parquet(dir)
      val nb = spark.read.parquet(dir)
      val want = nb.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))
        .orderBy(col("l_returnflag")).collect().map(_.toSeq).toSeq

      // registration carrying ONLY the row count: the avg rewrite must
      // decline (nullable measure, wrong denominator) and stay correct
      val starOnly = nb.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
        .localCheckpoint()
      SummaryRewrite.register("null_star", nb, starOnly,
        Seq("l_returnflag", "l_linestatus"),
        Map(("sum", "l_quantity") -> "sum_qty", ("count", "*") -> "cnt"))
      SummaryRewrite.install(spark)
      val declined = nb.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))
        .orderBy(col("l_returnflag"))
      assert(declined.queryExecution.executedPlan.toString.toLowerCase.contains("parquet"),
        "avg over a nullable measure with only count(*) registered must fall back")
      assert(declined.collect().map(_.toSeq).toSeq == want)
      SummaryRewrite.clear()

      // registration carrying the per-column count: the rewrite fires AND
      // matches the row scan (integer-valued doubles -> exact quotient)
      val perCol = nb.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(col("l_quantity")).as("cnt_qty"))
        .localCheckpoint()
      SummaryRewrite.register("null_percol", nb, perCol,
        Seq("l_returnflag", "l_linestatus"),
        Map(("sum", "l_quantity") -> "sum_qty",
          ("count", "l_quantity") -> "cnt_qty"))
      val rewritten = nb.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))
        .orderBy(col("l_returnflag"))
      assert(rewritten.queryExecution.executedPlan.toString.contains("ExistingRDD"),
        "avg with a per-column count measure must ride the summary")
      assert(rewritten.collect().map(_.toSeq).toSeq == want,
        "count(x) denominator reproduces avg's NULL-skipping exactly")
    } finally {
      SummaryRewrite.clear()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("clear(session) drops only that session's registrations") {
    SummaryRewrite.clear()
    registerRollup()
    try {
      assert(rollupQuery.queryExecution.executedPlan.toString.contains("ExistingRDD"))
      SummaryRewrite.clear(spark)
      assert(rollupQuery.queryExecution.executedPlan.toString.toLowerCase.contains("parquet"),
        "after clear(session) the aggregate must plan on the fact scan again")
    } finally SummaryRewrite.clear()
  }

  private def registerInThrowawaySession()
      : java.lang.ref.WeakReference[SummaryRewrite.SessionRule] = {
    val s2 = spark.newSession()
    val b = Tables.load(s2, sf, "lineitem")
    val summary = b.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
    SummaryRewrite.register("throwaway", b, summary,
      Seq("l_returnflag"), Map(("sum", "l_quantity") -> "sum_qty"))
    SummaryRewrite.install(s2)
    // force one optimization pass through the rule in the owner session
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    b.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("sum_qty"))
      .queryExecution.optimizedPlan
    new java.lang.ref.WeakReference(
      s2.experimental.extraOptimizations.collectFirst {
        case r: SummaryRewrite.SessionRule => r
      }.get)
  }

  test("a dead session's registrations (and plan trees) are GC-collectable") {
    SummaryRewrite.clear()
    // register + exercise in a THROWAWAY session, drop every strong ref,
    // and assert the session-owned rule (which pins the registered plan
    // trees) collects. This is the contract the old global registry broke:
    // its 'session-lifetime strong edge' was a listener registered on the
    // SparkContext-lifetime bus, so closed sessions' plans survived until
    // the context died.
    // everything session-bound is built inside a helper ACTIVATION that
    // returns before the GC loop: a JVM stack frame's dead local slots
    // (b, summary, the probe Dataset) are conservatively reachable until
    // the frame pops, so building them inline here would pin the session
    // for the whole test regardless of the registry's correctness
    val ruleRef = registerInThrowawaySession()
    // release the thread-local active-session slot the helper set
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (ruleRef.get() != null && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(100)
    }
    assert(ruleRef.get() == null,
      "the throwaway session's rule (and its registered plan trees) must be " +
        "collectable once the session is unreachable — something still pins it")
  }
}
