package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 (or the
  * LLM-pipeline extension surface) expressed over the driver corpus
  * (TESTDATA.md); [[oracleSql]] carries the DuckDB-equivalent SQL for the
  * hash-compare correctness gate. Column names/aliases match pairwise.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Relational.pricingSummary(Tables.lineitem(spark, d))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pricing_summary" -> ((s, d) => Relational.pricingSummary(Tables.lineitem(s, d))),
    "q_grouped_count" -> ((s, d) => Relational.groupedCount(Tables.events(s, d))),
    "q_filter_project" -> ((s, d) => Relational.filterProject(Tables.lineitem(s, d))),
    "q_distinct_projection" -> ((s, d) => Relational.distinctProjection(Tables.orders(s, d))),
    "q_topk_orders" -> ((s, d) => Relational.topKOrders(Tables.orders(s, d))),
    "q_join_broadcast" -> ((s, d) => Relational.ordersWithCustomer(Tables.orders(s, d), Tables.customer(s, d))),
    "q_join_left_outer" -> ((s, d) => Relational.customerOrderCounts(Tables.customer(s, d), Tables.orders(s, d))),
    "q_join_semi" -> ((s, d) => Relational.customersWithOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "q_join_anti" -> ((s, d) => Relational.customersWithoutOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "q_join_cross" -> ((s, d) => Relational.regionsWithGlobalStats(Tables.region(s, d), Tables.orders(s, d))),
    "q_revenue_by_nation" -> ((s, d) => Relational.revenueByNation(
      Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
      Tables.nation(s, d), Tables.region(s, d))),
    "q_case_projection" -> ((s, d) => Relational.caseProjection(Tables.orders(s, d))),
    "q_latest_per_key" -> ((s, d) => Relational.latestEventPerUser(Tables.events(s, d))),
    "q_latest_per_key2" -> ((s, d) => Relational.latestEventPerUserType(Tables.events(s, d))),
    "q_events_by_hour" -> ((s, d) => Relational.eventsByHour(Tables.events(s, d))),
    "q_entries_model" -> ((s, d) => Relational.entriesModel(Tables.events(s, d))),
    "q_set_ops" -> ((s, d) => Relational.keySetOps(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_rollup" -> ((s, d) => Relational.orderRollup(Tables.orders(s, d))),
    "q_running_total" -> ((s, d) => Relational.runningTotalPerUser(Tables.events(s, d))),
    "q_distinct_count" -> ((s, d) => Relational.distinctUsersPerType(Tables.events(s, d))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_grouped_count" ->
      """SELECT user_id, COUNT(*) AS event_count
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 40
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_distinct_projection" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q_join_broadcast" ->
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_left_outer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_count
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_regionkey, r_name, global_total, global_orders
        |FROM region CROSS JOIN (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS global_total,
        |         COUNT(*) AS global_orders FROM orders)
        |ORDER BY r_regionkey""".stripMargin,
    "q_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_case_projection" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 'finished'
        |       WHEN o_orderstatus = 'O' THEN 'open'
        |       WHEN o_orderstatus = 'P' THEN 'pending'
        |       ELSE NULL END AS status_name,
        |  CASE WHEN o_totalprice > 200000 THEN 'large'
        |       WHEN o_totalprice > 50000 THEN 'medium'
        |       ELSE 'small' END AS size_class
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_latest_per_key" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_latest_per_key2" ->
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q_events_by_hour" ->
      """SELECT EXTRACT(hour FROM ts) AS hour_of_day, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_entries_model" ->
      """SELECT event_id,
        |  GREATEST(0, CAST(FLOOR(value * 0.125 / 3) AS BIGINT)) AS entries,
        |  LEAST(100.0, value) AS clamped
        |FROM events ORDER BY event_id""".stripMargin,
    "q_set_ops" ->
      """SELECT tag, COUNT(*) AS n FROM (
        |  SELECT key, 'both' AS tag FROM (
        |    SELECT o_orderkey AS key FROM orders
        |    INTERSECT SELECT l_orderkey FROM lineitem)
        |  UNION ALL
        |  SELECT key, 'orders_only' AS tag FROM (
        |    SELECT o_orderkey AS key FROM orders
        |    EXCEPT SELECT l_orderkey FROM lineitem))
        |GROUP BY tag ORDER BY tag""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_running_total" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(20,4))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_distinct_count" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS distinct_users, COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
