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
}
