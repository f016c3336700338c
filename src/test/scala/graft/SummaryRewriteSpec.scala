package graft

import org.apache.spark.sql.functions._
import graft.plans.SummaryRewrite

class SummaryRewriteSpec extends SparkSpec {

  private def base = Tables.load(spark, sf, "lineitem")

  private def registerRollup(): Unit = {
    val summary = base
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("cnt"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .localCheckpoint()
    SummaryRewrite.register("li_rollup", base, summary,
      Seq("l_returnflag", "l_linestatus"),
      Map(
        ("sum", "l_quantity") -> "sum_qty",
        ("count", "*") -> "cnt",
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
}
