package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch relational operators covering SURVEY.md §2 (scans, projections,
  * filters, joins, aggregations, sorts, set ops) re-expressed over the driver
  * corpus. Each function is a pure `DataFrame => DataFrame` so ScalaTest and
  * the DuckDB oracle exercise identical plans.
  *
  * Determinism policy for oracle hashing: monetary/quantity aggregates are
  * computed in DECIMAL (exact, order-independent) rather than DOUBLE, because
  * double summation order differs between engines. Counts/min/max are exact by
  * nature.
  *
  * Scale notes (100 TB): aggregations rely on hash-partial aggregation
  * (map-side combine) — no driver collects anywhere; joins declare the small
  * side with `broadcast()` so Catalyst plans BroadcastHashJoin instead of
  * shuffling the fact table; sort+limit compiles to TakeOrderedAndProject
  * (per-partition top-k, no global sort).
  */
object Relational {

  private val dec = DecimalType(20, 4)
  // exact decimal accumulation (order-independent), double result so the
  // parquet/oracle value representations are bit-identical
  private def dsum(c: Column): Column = sum(c.cast(dec)).cast("double")

  /** Fail-loud cardinality guard for the exact-quantile family, whose
    * aggregation state is O(distinct values) — per group for the built-in
    * `percentile` (it merges a value→count map), one packed row for
    * [[priceQuartiles]]. Fine on bounded domains (prices, quantities,
    * enum-ish measures); a silent OOM on a continuous 100 TB column. The
    * guard is ONE extra constant-memory pass (HLL++, 5% rsd, map-side
    * partial) that throws with a pointer to the sketch twin BEFORE the
    * linear-state aggregation is attempted — discovery at plan-build time,
    * not as an executor OOM three hours in. The 5% sketch error is noise
    * against the order-of-magnitude headroom in the default bound
    * (2^20 distinct ≈ 16 MB of packed state vs multi-GB failures).
    * `maxDistinct = Int.MaxValue` skips the pass for known-bounded domains.
    *
    * The sketch COUNT (not the verdict) is memoized per canonicalized
    * `df.select(valueCol)` plan, so repeated quantile calls over the same
    * (input, column) pay the extra scan once per session — the cardinality
    * of a fixed input frame cannot change between calls, and parquet
    * inputs are immutable for a session's planning purposes. Every call
    * still evaluates `require` against ITS OWN `maxDistinct`, so a cached
    * count never weakens the check. The memo is SCOPED PER SparkSession
    * (weak-keyed, so a discarded session's plan trees — which pin
    * session-bound relations — become collectable with it) and bounded by
    * a true access-order LRU of 256 entries per session (eldest evicted
    * under the put lock; the bound can never be transiently exceeded).
    * Two threads racing the same cold key may both run the sketch scan —
    * benign: same input, same count, last write wins; the Spark job is
    * deliberately NOT run under the lock. Derived frames such as a
    * localCheckpoint'ed score table plan as distinct LogicalRDDs and
    * simply miss — correct, never stale.
    */
  private val guardCaches = new java.util.WeakHashMap[
    org.apache.spark.sql.SparkSession,
    java.util.LinkedHashMap[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, java.lang.Long]]()

  private def guardCache(spark: org.apache.spark.sql.SparkSession) =
    guardCaches.synchronized {
      var m = guardCaches.get(spark)
      if (m == null) {
        m = new java.util.LinkedHashMap[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
          java.lang.Long](64, 0.75f, true) {
          override def removeEldestEntry(e: java.util.Map.Entry[
            org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
            java.lang.Long]): Boolean = size() > 256
        }
        guardCaches.put(spark, m)
      }
      m
    }

  private[operators] def requireBoundedDistinct(
      df: DataFrame, valueCol: Column, maxDistinct: Int, op: String): Unit =
    if (maxDistinct != Int.MaxValue) {
      val cache = guardCache(df.sparkSession)
      val key = df.select(valueCol).queryExecution.analyzed.canonicalized
      val hit = cache.synchronized(cache.get(key))
      val approx: Long =
        if (hit != null) hit.longValue()
        else {
          val n = df.agg(
            approx_count_distinct(valueCol, rsd = 0.05).as("n")).head().getLong(0)
          cache.synchronized(cache.put(key, n))
          n
        }
      require(approx <= maxDistinct,
        s"$op: ~$approx distinct values exceed maxDistinct=$maxDistinct; " +
          "exact quantile state is O(distinct) — use the sketch twin " +
          "(approxPriceQuantiles / percentile_approx) for unbounded-domain " +
          "columns, or raise maxDistinct if the domain is genuinely bounded")
    }

  /** A1/Q2 analog — grouped running-count semantics in batch shape.
    * TPC-H Q1-style pricing summary (ref: consumers/ksql.py:24-40 for the
    * grouped-count pattern). Partial agg on 6000..600M rows, shuffle only the
    * tiny per-group state.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** A1 direct analog — `SELECT station_id, COUNT(*) GROUP BY station_id`
    * (ref: consumers/ksql.py:37-39), over the events stream table.
    */
  def groupedCount(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(count(lit(1)).as("event_count"))
      .orderBy(col("user_id"))

  /** P1/P4 — boolean/equality filter + projection (ref:
    * producers/simulation.py:52-56, producers/models/line.py:31-37). Filter
    * and 3-column projection both push into the parquet scan.
    */
  def filterProject(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 40)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** P3/T3 — distinct projection (ref: producers/models/line.py:29). */
  def distinctProjection(orders: DataFrame): DataFrame =
    orders.select(col("o_orderpriority")).distinct().orderBy(col("o_orderpriority"))

  /** T1/T2/T4 — sort + top-k. Catalyst plans TakeOrderedAndProject: each
    * partition keeps k rows, only k*numPartitions reach the driver-side merge.
    */
  def topKOrders(orders: DataFrame, k: Int = 25): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** J1/J2 analog — stream-table equi-join; the dimension is broadcast so the
    * fact side never shuffles (ref: consumers/models/line.py:47-54 dict
    * lookup == hand-rolled broadcast hash join).
    */
  def ordersWithCustomer(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** J5 analog — left-outer join + aggregate: customers with their order
    * counts, keeping customers that never ordered (ref:
    * templates/status.html:29-39 keeps stations with no train).
    */
  def customerOrderCounts(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("order_count"))
      .orderBy(col("c_custkey"))

  /** J1's drop-unmatched semantics as an explicit left-semi join (ref:
    * consumers/models/line.py:73-76 skip-unknown-station guard).
    */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Anti-join complement of the guard above. */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** J5's crossJoin(weatherLatest) analog — every region row paired with the
    * single global-aggregate row. The 1-row side is broadcast; never shuffle a
    * fact table for a cross join against a scalar.
    */
  def regionsWithGlobalStats(region: DataFrame, orders: DataFrame): DataFrame = {
    val stats = orders.agg(
      dsum(col("o_totalprice")).as("global_total"),
      count(lit(1)).as("global_orders"))
    region.crossJoin(broadcast(stats))
      .select(col("r_regionkey"), col("r_name"), col("global_total"), col("global_orders"))
      .orderBy(col("r_regionkey"))
  }

  /** J5 full dashboard-assembly analog — multi-way join fact ⋈ dims with
    * group-by rollup to (nation) grain, dims broadcast (ref:
    * consumers/server.py:55-87 wiring + status.html render join).
    */
  def revenueByNation(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("r_name"), col("n_name"))

  /** P7/Q1 analog — projection + prioritized CASE (ref:
    * consumers/faust_stream.py:72-92: red→blue→green priority, null
    * otherwise). Pure narrow op; whole-stage-codegen'd, no shuffle.
    */
  def caseProjection(orders: DataFrame): DataFrame =
    orders
      .select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", "finished")
          .when(col("o_orderstatus") === "O", "open")
          .when(col("o_orderstatus") === "P", "pending")
          .otherwise(lit(null)).as("status_name"),
        when(col("o_totalprice") > 200000, "large")
          .when(col("o_totalprice") > 50000, "medium")
          .otherwise("small").as("size_class"))
      .orderBy(col("o_orderkey"))

  /** A2/A3/O1 — latest-value-per-key (Faust table upsert / latest weather) in
    * batch shape: row_number over (key ORDER BY ts DESC, tiebreak event_id
    * DESC) == 1 (ref: consumers/faust_stream.py:52-57,
    * consumers/models/weather.py:17-30). At scale this is one shuffle on the
    * key — the same partitioning the streaming state store would use.
    */
  def latestEventPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** latestEventPerUser's aggregation twin: max_by over a (ts, event_id)
    * ordering struct instead of window row_number. Same rows out, different
    * physical strategy — the window form sorts every partition group; this
    * form is a hash aggregate with map-side partials and constant state per
    * key, which wins when keys are many and rows-per-key large (the 100 TB
    * shape). Kept as a first-class operator so both plans stay measurable
    * side by side in Bench.
    */
  def latestEventPerUserAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(
        col("user_id"), col("last.event_id").as("event_id"),
        col("last.event_type").as("event_type"), col("last.value").as("value"))
      .orderBy(col("user_id"))

  /** O3 batch shape — latest event per composite key (station, direction) ≈
    * (user_id, event_type) (ref: consumers/models/station.py:26-39). Same
    * single-shuffle plan as latestEventPerUser, wider key.
    */
  def latestEventPerUserType(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** F6 — time-part extraction + diurnal histogram (ref:
    * producers/models/turnstile_hardware.py:48-56 hourly-curve lookup).
    */
  def eventsByHour(events: DataFrame): DataFrame =
    events
      .groupBy(hour(col("ts")).as("hour_of_day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("hour_of_day"))

  /** Batch twin of the streaming tumbling-window aggregation
    * (Windows.tumblingCounts): epoch-aligned event-time buckets, grouped
    * count + decimal sum. Oracle = DuckDB time_bucket — pinning the window
    * boundary arithmetic the streaming side relies on.
    */
  def tumblingEventCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  /** A4/F7 analog — arithmetic entry model: floor(value*ratio/steps) clamped
    * at 0 (ref: producers/models/turnstile_hardware.py:46-66, noise term
    * omitted: rand() has no cross-engine oracle).
    */
  def entriesModel(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"),
        greatest(lit(0), floor(col("value") * lit(0.125) / lit(3)).cast("long"))
          .as("entries"),
        least(lit(100.0), col("value")).as("clamped"))
      .orderBy(col("event_id"))

  /** Set ops (engine surface beyond the reference — SURVEY §2.6 notes the
    * per-line frames partition one frame). Union/intersect/except of key sets.
    */
  def keySetOps(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val a = orders.select(col("o_orderkey").as("key"))
    val b = lineitem.select(col("l_orderkey").as("key"))
    val inBoth = a.intersect(b).withColumn("tag", lit("both"))
    val onlyA = a.except(b).withColumn("tag", lit("orders_only"))
    inBoth.union(onlyA)
      .groupBy(col("tag")).agg(count(lit(1)).as("n"))
      .orderBy(col("tag"))
  }

  /** Single-pass twin of [[keySetOps]] under the same oracle: INTERSECT and
    * EXCEPT of the same two inputs share all their work, so instead of two
    * independent branches (4 shuffles, 2 joins — each set op re-shuffles
    * both sides) this distincts each side once and takes ONE co-partitioned
    * left join; the tag projection replays both set ops from the join's
    * null pattern. Set semantics are preserved exactly (INTERSECT/EXCEPT
    * are distinct-set operators). At 100 TB this halves the shuffled bytes
    * of the dominant stage.
    */
  def keySetOpsJoin(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val a = orders.select(col("o_orderkey").as("key")).distinct()
    val b = lineitem.select(col("l_orderkey").as("key_b")).distinct()
      .withColumn("in_b", lit(1))
    // null-SAFE equality: SQL set operators treat NULL = NULL as a match
    // (a NULL key present on both sides is 'both'); a plain equi-join would
    // silently tag it 'orders_only' and drift this twin from the shared
    // oracle on any corpus with nullable keys. The in_b marker (never null
    // on the build side) is what distinguishes matched-NULL from no-match.
    a.join(b, col("key") <=> col("key_b"), "left_outer")
      .select(when(col("in_b").isNotNull, "both")
        .otherwise("orders_only").as("tag"))
      .groupBy(col("tag")).agg(count(lit(1)).as("n"))
      .orderBy(col("tag"))
  }

  /** Grouping sets — rollup over (status, priority) (SURVEY §2.4: Catalyst
    * supplies cube/rollup for the generalized surface).
    */
  def orderRollup(orders: DataFrame): DataFrame =
    orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** As-of join (composed from built-ins, SURVEY §7.3 preference (a)): each
    * event picks the latest 'error' event of the same user at-or-before its
    * timestamp. Plan: equi-join on the key + range predicate, then
    * row_number()==1 per left row — the right side is the sparse series so
    * the range fan-out stays bounded; at scale, bucket both sides by key and
    * time-bucket the range (the standard point-in-time-join layout).
    */
  def asOfJoinLatestError(events: DataFrame): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(
        col("user_id").as("e_user_id"), col("ts").as("e_ts"),
        col("event_id").as("error_event_id"), col("value").as("error_value"))
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("e_ts").desc, col("error_event_id").desc)
    events
      .join(errors,
        col("user_id") === col("e_user_id") &&
          col("e_ts") <= col("ts") && col("error_event_id") =!= col("event_id"),
        "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("error_event_id"), col("error_value"))
      .orderBy(col("event_id"))
  }

  /** [[asOfJoinLatestError]]'s sort-based twin — the no-fan-out formulation
    * a 100 TB point-in-time join needs. The join version materializes
    * events × errors-per-user rows before pruning to one; this version makes
    * ONE pass in (ts, kind, id) order per user carrying the latest error as
    * window state:
    *
    *  - error candidates sort before probes at equal ts (kind 0 < 1), so a
    *    probe sees same-timestamp errors, matching `r.ts <= e.ts`;
    *  - the carried payload is the max (ts, id) error so far — exactly the
    *    join's ORDER BY r.ts DESC, r.event_id DESC pick;
    *  - self-exclusion (an error probing for the latest error other than
    *    itself): each candidate also carries its predecessor error id, so
    *    when the carried winner IS the probe, the answer falls back to that
    *    predecessor without a second pass.
    *
    * Cost: one shuffle+sort on user_id plus a final id-equi-join to fetch
    * the error value. Output identical to the join form (same oracle).
    */
  def asOfJoinLatestErrorSorted(events: DataFrame): DataFrame = {
    // microsecond epoch, NOT seconds: `r.ts <= e.ts` must compare at full
    // timestamp precision or two same-second events order wrongly
    val errs = events.filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("sec"),
        col("event_id"), col("value"))
    val wErr = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    val cand = errs
      .withColumn("prev_err_id", lag(col("event_id"), 1).over(wErr))
      .select(col("user_id"), col("sec"), lit(0).as("kind"),
        col("event_id").as("oid"),
        struct(col("sec").as("esec"), col("event_id").as("eid"),
          col("prev_err_id")).as("payload"))
    val payloadType = "struct<esec:bigint,eid:bigint,prev_err_id:bigint>"
    val probes = events.select(
      col("user_id"), unix_micros(col("ts")).as("sec"), lit(1).as("kind"),
      col("event_id").as("oid"), lit(null).cast(payloadType).as("payload"))
    val wAll = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("kind"), col("oid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val resolved = cand.union(probes)
      .withColumn("winner", last(col("payload"), ignoreNulls = true).over(wAll))
      .filter(col("kind") === 1)
      .withColumn("error_event_id",
        when(col("winner").isNull, lit(null))
          .when(col("winner.eid") === col("oid"), col("winner.prev_err_id"))
          .otherwise(col("winner.eid")))
      .select(col("oid").as("event_id"), col("user_id"), col("error_event_id"))
    resolved
      .join(errs.select(col("event_id").as("error_event_id"),
          col("value").as("error_value")),
        Seq("error_event_id"), "left_outer")
      .select(col("event_id"), col("user_id"),
        col("error_event_id"), col("error_value"))
      .orderBy(col("event_id"))
  }

  /** Range (interval) join: per user, pairs of events within `windowSec` of
    * each other. The time-band predicate bounds the fan-out; at scale the
    * band becomes the join's bucketing key.
    */
  def eventPairsWithinWindow(events: DataFrame, windowSec: Int = 60): DataFrame = {
    val a = events.select(
      col("user_id"), col("event_id").as("i"), col("ts").as("ts_i"))
    val b = events.select(
      col("user_id").as("b_user_id"), col("event_id").as("j"), col("ts").as("ts_j"))
    a.join(b,
        col("user_id") === col("b_user_id") && col("i") < col("j") &&
          abs(col("ts_j").cast("long") - col("ts_i").cast("long")) <= windowSec)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("close_pairs"))
      .orderBy(col("user_id"))
  }

  /** Cube — all grouping-set combinations over (status, priority). */
  def orderCube(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** F1/F2/F4 string-function battery over part names: sanitize-style
    * replace chain, zero-pad formatting, manual title-case (engine-portable
    * initcap), substring extraction.
    */
  def partNameFormats(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      lower(regexp_replace(regexp_replace(col("p_name"), " ", "_"), "-", "_")).as("sanitized"),
      concat(upper(substring(col("p_brand"), 1, 1)), lit("#"),
        lpad(col("p_partkey").cast("string"), 8, "0")).as("padded_id"),
      concat(upper(substring(col("p_type"), 1, 1)),
        lower(substring(col("p_type"), 2, 1000))).as("type_titled"),
      length(col("p_name")).as("name_len"))
      .orderBy(col("p_partkey"))

  /** F6 extended — full date-part extraction histogram. */
  def orderDateParts(orders: DataFrame): DataFrame =
    orders
      .groupBy(
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofweek(col("o_orderdate")).as("dow"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("y"), col("m"), col("dow"))

  /** lag/lead analytics — per-user deltas between consecutive events. */
  def eventDeltas(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(
        col("user_id"), col("event_id"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta_prev"),
        lead(col("event_id"), 1).over(w).as("next_event_id"),
        rank().over(w).as("seq"))
      .orderBy(col("user_id"), col("seq"))
  }

  /** Conditional + distinct aggregation: count_if / filtered sums /
    * sum(DISTINCT).
    */
  def conditionalAggs(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        count(when(col("o_totalprice") > 200000, 1)).as("n_large"),
        sum_distinct(col("o_custkey")).as("sum_distinct_cust"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Null-handling functions: coalesce / nullif / null-safe compare over a
    * derived nullable column.
    */
  def nullHandling(orders: DataFrame): DataFrame =
    orders
      .withColumn("maybe", when(col("o_orderstatus") === "O", col("o_totalprice")))
      .select(
        col("o_orderkey"),
        coalesce(col("maybe"), lit(-1.0)).as("filled"),
        nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
        col("maybe").isNull.as("was_null"),
        (col("maybe") <=> lit(null)).as("null_safe_eq"))
      .orderBy(col("o_orderkey"))

  /** Exact interpolated median per group (both engines: linear interpolation
    * between adjacent order statistics). Guarded by
    * [[requireBoundedDistinct]]: `percentile`'s per-group state is a
    * value→count map, linear in distinct quantities.
    */
  def quantityMedian(
      lineitem: DataFrame, maxDistinct: Int = 1 << 20): DataFrame = {
    requireBoundedDistinct(lineitem, col("l_quantity"), maxDistinct, "quantityMedian")
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Windowed analytics — running total per user ordered by time (engine
    * surface; batch twin of a streaming cumulative agg). One shuffle on
    * user_id, then in-partition sort: the partitioning would be reused by any
    * downstream per-user op.
    */
  def runningTotalPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(
        col("user_id"), col("event_id"),
        sum(col("value").cast(dec)).over(w).cast("double").as("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Approximate sketch aggregates — the 100 TB path for distinct counts and
    * quantiles (HLL++ / KLL): constant memory per group vs the exact
    * variants' linear state. Engine-specific sketch internals ⇒ no DuckDB
    * oracle (driver records the weaker rows-only check); exactness is bounded
    * by the rsd/accuracy parameters and cross-checked against the exact twins
    * in RelationalSpec.
    */
  def approxDistinctUsersPerType(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** TOLERANCE-CHECKED oracle shape for [[approxDistinctUsersPerType]] —
    * a sketch DuckDB cannot reproduce bit-for-bit, so the raw estimate
    * can never hash-match; this audit can. It emits, per group, the EXACT
    * distinct count (independently recomputed by the oracle — the hash
    * compare cross-checks it) plus a Spark-side verdict that the HLL++
    * estimate landed within `boundMult`×rsd of that exact value; the
    * oracle pins the verdict column to TRUE, so a silent sketch
    * regression now FAILS the driver compare instead of hiding behind a
    * rows-only check. The default bound (4σ at rsd=0.02 ⇒ ±8 %) is wide
    * against the sketch's standard error and deterministic per dataset
    * (HLL++ is deterministic given the data). The exact `countDistinct`
    * is the AUDIT's cost, paid like the recall audits pay theirs — the
    * serving path stays the constant-state sketch.
    */
  def approxDistinctAudit(
      events: DataFrame, rsd: Double = 0.02, boundMult: Double = 4.0): DataFrame = {
    val spread = Par.spread(events)
    val approx = spread
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))
    val exact = spread
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
    exact.join(broadcast(approx), Seq("event_type"))
      .select(
        col("event_type"), col("exact_users"), col("n"),
        (abs(col("approx_users") - col("exact_users")).cast("double") <=
          lit(boundMult * rsd) * col("exact_users").cast("double")).as("approx_ok"))
      .orderBy(col("event_type"))
  }

  /** Deterministic grouped mode — the most frequent user per event type,
    * ties broken toward the lowest user id (built-in `mode()` picks an
    * arbitrary tie winner, which no replayable pipeline should emit).
    * Two hash aggregations: value counts, then max_by over (count, -id) —
    * no window sort, constant state per group.
    */
  def modalUserPerType(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(
        max_by(col("user_id"), struct(col("n"), (-col("user_id")).as("neg")))
          .as("modal_user"),
        max(col("n")).as("n_max"))
      .orderBy(col("event_type"))

  /** Ordered string aggregation — listagg (Spark 4) with an explicit WITHIN
    * GROUP ordering so the concatenation is deterministic under any
    * partitioning; DISTINCT keeps per-group state bounded by domain
    * cardinality, not row count.
    */
  def statusListAgg(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("listagg(DISTINCT o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus)")
          .as("statuses"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Second-moment statistics per group — stddev/variance (sample) and the
    * quantity↔price correlation/covariance. Both engines maintain these with
    * online update formulas whose summation order differs, so results round
    * (4 decimals absolute for the unbounded moments, 6 for the normalized
    * correlation) before comparison.
    */
  def quantityMoments(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qty_disc"))
      .orderBy(col("l_returnflag"))

  /** Exact multi-quantile per group (p25/p50/p75, linear interpolation) —
    * the exact twin of [[approxPriceQuantiles]]: per-group state is linear
    * in rows where the sketch twin is constant, which is the trade the
    * 100 TB path flips. Quantile probes flatten to scalar columns; results
    * round to 6 decimals so interpolation arithmetic compares cleanly
    * across engines. Guarded by [[requireBoundedDistinct]] (same
    * O(distinct)-per-group envelope as [[quantityMedian]]).
    */
  def exactPriceQuantiles(
      lineitem: DataFrame, maxDistinct: Int = 1 << 20): DataFrame = {
    requireBoundedDistinct(
      lineitem, col("l_extendedprice"), maxDistinct, "exactPriceQuantiles")
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"),
        array(lit(0.25), lit(0.5), lit(0.75))).as("q"))
      .select(
        col("l_returnflag"),
        round(col("q").getItem(0), 6).as("p25"),
        round(col("q").getItem(1), 6).as("p50"),
        round(col("q").getItem(2), 6).as("p75"))
      .orderBy(col("l_returnflag"))
  }

  def approxPriceQuantiles(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        // accuracy 1000 ⇒ ≤0.1% rank error — plenty for corpus statistics,
        // and an order of magnitude cheaper to build AND to merge across
        // partitions (merge cost is what a 1000-executor rollup pays)
        percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(1000)).as("q"),
        count(lit(1)).as("n"))
      // flatten the sketch output to scalar columns: one KLL sketch per
      // group, three probes of it — and a scalar-only schema for sinks
      .select(
        col("l_returnflag"),
        col("q").getItem(0).as("p50"),
        col("q").getItem(1).as("p95"),
        col("q").getItem(2).as("p99"),
        col("n"))
      .orderBy(col("l_returnflag"))

  /** TOLERANCE-CHECKED oracle shape for [[approxPriceQuantiles]] (the
    * [[approxDistinctAudit]] pattern): per group, the exact row count
    * (oracle-cross-checked) plus one Spark-side verdict per probed
    * quantile that the KLL/GK estimate honors its documented RANK
    * guarantee — the returned value is an actual data value whose rank
    * interval [#{x < v}+1, #{x ≤ v}] must meet the target band
    * p·n ± n/accuracy (±1 slack for rank-convention rounding). The
    * oracle pins the verdicts TRUE, so a sketch regression fails the
    * driver hash compare. Plan shape: the 3-or-so-row sketch result
    * broadcasts back onto the fact table for ONE conditional-aggregation
    * pass — no sort, no window, state O(groups).
    */
  def approxQuantilesAudit(
      lineitem: DataFrame, accuracy: Int = 1000): DataFrame = {
    val spread = Par.spread(lineitem)
    val sketch = spread
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)).as("q"))
      .select(
        col("l_returnflag"),
        col("q").getItem(0).as("est50"),
        col("q").getItem(1).as("est95"),
        col("q").getItem(2).as("est99"))
    def lt(est: String) =
      sum(when(col("l_extendedprice") < col(est), 1L).otherwise(0L))
    def le(est: String) =
      sum(when(col("l_extendedprice") <= col(est), 1L).otherwise(0L))
    val counted = spread
      .join(broadcast(sketch), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        lt("est50").as("lt50"), le("est50").as("le50"),
        lt("est95").as("lt95"), le("est95").as("le95"),
        lt("est99").as("lt99"), le("est99").as("le99"))
    val eps = 1.0 / accuracy
    // the estimate's true-rank interval [lt+1, le] must intersect the
    // guaranteed band [(p-eps)n, (p+eps)n]
    def ok(p: Double, ltc: String, lec: String): Column =
      (col(ltc) + lit(1) <= lit(p + eps) * col("n") + lit(1.0)) &&
        (col(lec).cast("double") >= lit(p - eps) * col("n") - lit(1.0))
    counted.select(
      col("l_returnflag"), col("n"),
      ok(0.50, "lt50", "le50").as("p50_ok"),
      ok(0.95, "lt95", "le95").as("p95_ok"),
      ok(0.99, "lt99", "le99").as("p99_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** Pivot — events per (user, type) as one row per user with a column per
    * type (the dashboard's dir-a/dir-b pivot generalized; SURVEY §2.3 J5
    * uses the max(when(...)) form of the same op). Explicit value list keeps
    * the output schema static, which is what a 100 TB plan needs anyway
    * (dynamic pivot = extra distinct-scan job).
    */
  def eventCountsPivot(events: DataFrame, types: Seq[String]): DataFrame =
    events
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("user_id"))

  /** Batch sessionization — split each user's event stream into sessions at
    * `gapSec` inactivity gaps (the batch twin of the streaming
    * `session_window`; see streaming/Windows). Classic gaps-and-islands: a
    * lag-based boundary flag, a running sum to number sessions, then a
    * per-session rollup. One shuffle on user_id, reused by both windows and
    * the final aggregation (same sort order), so at scale this costs a
    * single exchange of the fact table.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(order))
      .withColumn("is_new", when(
        col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapSec, 1L)
        .otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(cum))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ts").cast("long")) - min(col("ts").cast("long"))).as("dur_sec"),
        dsum(col("value")).as("session_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Per-group top-k — the distributed "top N per key" pattern (window
    * row_number over a unique ordering, filtered to k). At scale this is one
    * shuffle on the group key; no global sort ever materializes.
    */
  def topOrdersPerSegment(orders: DataFrame, customer: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("c_mktsegment"), col("rank"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_mktsegment"), col("rank"))
  }

  /** Fixed-width histogram of order totals — binning as pure column math
    * (floor-divide + clamp), one hash aggregation. The shape every data
    * profiler runs over a 100 TB column.
    */
  def priceHistogram(orders: DataFrame, binWidth: Double = 25000.0, maxBin: Int = 20): DataFrame =
    orders
      .groupBy(least(floor(col("o_totalprice") / binWidth), lit(maxBin))
        .cast("long").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("bin_total"))
      .orderBy(col("bin"))

  /** Equal-population quartiles (count/lo/hi per bucket), NTILE(4)-exact,
    * with no global window. Key fact: the grouped rollup of
    * `NTILE(4) OVER (ORDER BY price, orderkey)` depends only on the price
    * MULTISET — the orderkey tiebreak shuffles equal prices between adjacent
    * buckets but bucket sizes are fixed by n alone (base n/4 + 1 extra for
    * the first n%4 buckets) and equal values are interchangeable, so each
    * bucket's min/max is an order statistic of price. Plan: one hash agg
    * builds the (price, count) histogram (partial-agg'd, shuffled on price),
    * a second agg packs the sorted histogram into one row (state =
    * O(distinct prices) — the same envelope as Spark's exact `percentile`,
    * which also merges a value→count map), and a single-row UDF walks it to
    * emit the 4 bucket stats. No interpolation (exact data values out), no
    * tie hazard, no single-partition WindowExec funneling the fact table
    * through one task. Approximate twin for unbounded-distinct columns:
    * [[approxPriceQuantiles]]. Guarded by [[requireBoundedDistinct]]: the
    * packed histogram row is O(distinct prices).
    */
  def priceQuartiles(
      orders: DataFrame, buckets: Int = 4, maxDistinct: Int = 1 << 20): DataFrame = {
    requireBoundedDistinct(orders, col("o_totalprice"), maxDistinct, "priceQuartiles")
    val hist = orders
      .groupBy(col("o_totalprice").as("v"))
      .agg(count(lit(1)).as("c"))
    val packed = hist.agg(
      sort_array(collect_list(struct(col("v"), col("c")))).as("h"))
    val binStats = udf { (h: Seq[org.apache.spark.sql.Row]) =>
      val n = h.iterator.map(_.getLong(1)).sum
      val base = n / buckets
      val rem = (n % buckets).toInt
      // target ranks: each bucket's first and last 1-based rank
      var out = List.empty[(Int, Long, Double, Double)]
      var start = 1L
      var hi = 0 // histogram cursor: index of run containing `covered+1`
      var covered = 0L // ranks strictly before h(hi)
      def valueAt(rank: Long): Double = {
        while (covered + h(hi).getLong(1) < rank) { covered += h(hi).getLong(1); hi += 1 }
        h(hi).getDouble(0)
      }
      for (b <- 1 to buckets) {
        val size = base + (if (b <= rem) 1L else 0L)
        if (size > 0) {
          val lo = valueAt(start)
          val hiV = valueAt(start + size - 1)
          out = (b, size, lo, hiV) :: out
          start += size
        }
      }
      out.reverse
    }
    packed
      .select(explode(binStats(col("h"))).as("q"))
      .select(
        col("q._1").as("quartile"),
        col("q._2").as("n"),
        col("q._3").as("lo"),
        col("q._4").as("hi"))
      .orderBy(col("quartile"))
  }

  /** Deterministic hash-stratified sampling — reproducible corpus sampling
    * with a per-stratum rate: keep a doc iff its md5-derived bucket (0-99)
    * falls under the stratum's rate. Unlike rand()-based sampling this is
    * replayable on any engine and stable under re-partitioning — the
    * property a training-data pipeline needs for audited subsets.
    */
  def hashStratifiedSample(docs: DataFrame, enRate: Int = 50, otherRate: Int = 20): DataFrame =
    docs
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 100)
      .filter(col("bucket") <
        when(col("lang") === "en", enRate).otherwise(otherRate))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))

  /** Time-range window aggregate — per user, the event count and value sum
    * over the trailing `windowSec` seconds (RANGE frame on epoch seconds,
    * not ROWS: all ties at one timestamp enter the frame together, so the
    * result is partitioning- and tie-order-independent). The rolling-metric
    * shape of every ops dashboard; one shuffle on the key.
    */
  def trailingWindowStats(events: DataFrame, windowSec: Long = 300): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-windowSec, 0)
    events
      .withColumn("sec", col("ts").cast("long"))
      .select(
        col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_trailing"),
        sum(col("value").cast(dec)).over(w).cast("double").as("sum_trailing"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** The rank-function family over one ordering — rank, dense_rank,
    * percent_rank, cume_dist side by side (identical definitions in every
    * SQL engine, so one oracle covers all four).
    */
  def priceRanks(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
    orders
      .select(
        col("o_orderkey"), col("o_orderpriority"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"),
        round(cume_dist().over(w), 6).as("cdist"))
      .orderBy(col("o_orderkey"))
  }

  /** Per-user event journey — the ordered collect_list shape (session-path
    * mining / sequence-model training rows). The in-group order is pinned by
    * sorting on (ts, event_id) structs, and the array is serialized to a
    * string so sinks and cross-engine compares stay scalar. One shuffle on
    * the key; per-group state is the user's own event list (bound it with a
    * window/limit upstream when key cardinality is adversarial).
    */
  def userJourneys(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id")))),
            e => e.getField("event_id").cast("string")),
          ",").as("path"))
      .orderBy(col("user_id"))

  /** JSON encode/decode round trip (SURVEY F11 — the Kafka-payload serde,
    * batch-shaped): serialize a struct per row, then extract fields back out
    * of the JSON string. Long/string fields only — double JSON rendering is
    * engine-specific. Narrow, codegen'd projection.
    */
  def jsonRoundTrip(orders: DataFrame): DataFrame =
    orders
      .withColumn("payload",
        to_json(struct(col("o_orderkey"), col("o_orderstatus"))))
      .select(
        col("o_orderkey"), col("payload"),
        get_json_object(col("payload"), "$.o_orderstatus").as("status_rt"),
        get_json_object(col("payload"), "$.o_orderkey").cast("long").as("key_rt"))
      .orderBy(col("o_orderkey"))

  /** VARIANT ingestion (Spark 4 semi-structured type): the nested payload
    * is parsed ONCE into variant's binary-searchable encoding and then
    * probed by typed path — repeated `get_json_object` calls re-parse the
    * JSON string per extraction, which at a JSON-heavy event lake's scale
    * multiplies the scan CPU by the number of probed fields. The oracle
    * compares only the extracted values (shortest-repr double round-trip is
    * exact), not the engines' JSON renderings.
    */
  def variantExtract(orders: DataFrame): DataFrame =
    orders
      .withColumn("payload", to_json(struct(
        col("o_orderkey"),
        struct(col("o_orderstatus").as("status"),
          col("o_totalprice").as("total")).as("meta"))))
      .withColumn("v", parse_json(col("payload")))
      .select(
        col("o_orderkey"),
        expr("variant_get(v, '$.meta.status', 'string')").as("status_v"),
        expr("variant_get(v, '$.meta.total', 'double')").as("total_v"),
        expr("variant_get(v, '$.o_orderkey', 'long')").as("key_v"))
      .orderBy(col("o_orderkey"))

  /** Fixed-size per-stratum sample: exactly `n` docs per source by md5-rank
    * — the "1000 docs per domain for eval" draw. One shuffle on the stratum
    * key; deterministic, replayable, partitioning-independent (same family
    * as hashStratifiedSample, which draws by RATE instead of count).
    */
  def stratifiedFixedN(docs: DataFrame, n: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .select(col("source"), col("rk"), col("doc_id"))
      .orderBy(col("source"), col("rk"))
  }

  /** Group-relative filtering — orders above their priority's average
    * (the correlated-subquery shape, decorrelated into a groupwise-stats
    * join). The comparison is `price * n > total` in exact arithmetic
    * instead of `price > avg` so no engine-specific division rounding can
    * flip a boundary row.
    */
  def aboveAvgOrders(orders: DataFrame): DataFrame = {
    val stats = orders.groupBy(col("o_orderpriority").as("p"))
      .agg(dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
    orders
      .join(broadcast(stats), col("o_orderpriority") === col("p"))
      .filter(col("o_totalprice") * col("n") > col("total"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_above"),
        dsum(col("o_totalprice")).as("above_total"))
      .orderBy(col("o_orderpriority"))
  }

  /** One-pass column profiling (the ANALYZE TABLE shape): per column, row
    * count, null count, exact distinct count, min and max — computed as ONE
    * wide aggregation over the scan, then unpivoted to a row per column with
    * `stack`. At 100 TB this is the single-scan profile every ingestion job
    * runs; swap countDistinct for approx_count_distinct when exactness isn't
    * required and the distinct-state per column is large.
    */
  def profileLineitem(lineitem: DataFrame): DataFrame = {
    val wide = lineitem.agg(
      count(lit(1)).as("n_rows"),
      count(col("l_orderkey")).as("ok_n"),
      countDistinct(col("l_orderkey")).as("ok_nd"),
      min(col("l_orderkey")).cast("string").as("ok_min"),
      max(col("l_orderkey")).cast("string").as("ok_max"),
      count(col("l_quantity")).as("q_n"),
      countDistinct(col("l_quantity")).as("q_nd"),
      min(col("l_quantity")).cast("long").cast("string").as("q_min"),
      max(col("l_quantity")).cast("long").cast("string").as("q_max"),
      count(col("l_returnflag")).as("rf_n"),
      countDistinct(col("l_returnflag")).as("rf_nd"),
      min(col("l_returnflag")).as("rf_min"),
      max(col("l_returnflag")).as("rf_max"),
      count(col("l_shipdate")).as("sd_n"),
      countDistinct(col("l_shipdate")).as("sd_nd"),
      min(col("l_shipdate")).cast("date").cast("string").as("sd_min"),
      max(col("l_shipdate")).cast("date").cast("string").as("sd_max"))
    wide.selectExpr(
      """stack(4,
        |  'l_orderkey',  ok_n, n_rows - ok_n, ok_nd, ok_min, ok_max,
        |  'l_quantity',  q_n,  n_rows - q_n,  q_nd,  q_min,  q_max,
        |  'l_returnflag', rf_n, n_rows - rf_n, rf_nd, rf_min, rf_max,
        |  'l_shipdate',  sd_n, n_rows - sd_n, sd_nd, sd_min, sd_max)
        |AS (col_name, n, n_null, n_distinct, min_val, max_val)""".stripMargin)
      .orderBy(col("col_name"))
  }

  /** Exact distinct count per group (A1 family; approx_count_distinct is the
    * scale path but has no cross-engine oracle — see Bench).
    */
  def distinctUsersPerType(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("distinct_users"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** INTERVAL-overlap self-join via time-bucket blocking — the interval ×
    * interval generalization of [[eventPairsWithinWindow]]'s point-in-
    * range shape. Naively, overlap is a theta join (`a.start <= b.end AND
    * b.start <= a.end`) — a cartesian product at scale. The scalable form
    * explodes each interval to the fixed-width time buckets it covers and
    * equi-joins on (key, bucket): two overlapping intervals ALWAYS share
    * the bucket containing their overlap start, so recall is exact; each
    * pair is emitted EXACTLY ONCE by keeping only that overlap-start
    * bucket (no output distinct, no second shuffle of the result
    * relation); the residual predicate
    * verifies. Work is Σ per-bucket² per key — bounded by the bucket
    * width, never by the row count (the banded-LSH argument applied to
    * time). Per-bucket row counts are the skew signal; shrink `bucketSec`
    * to split hot buckets.
    *
    * Fixture grain: each (user, event_type) activity window [min ts,
    * max ts]; pairs = overlapping type windows within a user, with the
    * overlap length — bounded output, full oracle (the DuckDB side runs
    * the plain theta join, so a hash match proves the blocking lossless).
    */
  def activityOverlapPairs(
      events: DataFrame, bucketSec: Long = 21600): DataFrame = {
    val iv = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        min(col("ts").cast("long")).as("start_s"),
        max(col("ts").cast("long")).as("end_s"))
    def blocks(side: DataFrame, tag: String) = side.select(
      col("user_id"), col("event_type").as(s"type_$tag"),
      col("start_s").as(s"start_$tag"), col("end_s").as(s"end_$tag"),
      explode(sequence(
        expr(s"start_s DIV ${bucketSec}L"),
        expr(s"end_s DIV ${bucketSec}L"))).as("bucket"))
    blocks(iv, "a")
      .join(blocks(iv, "b"), Seq("user_id", "bucket"))
      .filter(col("type_a") < col("type_b"))
      .filter(col("start_a") <= col("end_b") && col("start_b") <= col("end_a"))
      .filter(col("bucket") ===
        expr(s"greatest(start_a, start_b) DIV ${bucketSec}L"))
      .select(col("user_id"), col("type_a"), col("type_b"),
        (least(col("end_a"), col("end_b")) -
          greatest(col("start_a"), col("start_b"))).as("overlap_s"))
      .orderBy(col("user_id"), col("type_a"), col("type_b"))
  }

  /** Ordered-funnel analysis — of the users who did step 1, how many went
    * on to step 2 AFTER it, then step 3 after that (strict temporal
    * order, first-occurrence semantics: the canonical conversion-funnel
    * query). One aggregation computes each user's first ts per step
    * (constant state per user — min_by, never the event history), a
    * narrow projection scores how deep the ordered chain goes, and a tiny
    * rollup counts users per depth. Engine-exact: timestamps compare as
    * epoch seconds, ties on equal seconds count as progression (<=).
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val firsts = events
      .filter(col("event_type").isin(steps: _*))
      .groupBy(col("user_id"))
      .pivot("event_type", steps)
      .agg(min(col("ts").cast("long")))
    val depth = steps.zipWithIndex.drop(1).foldLeft(
      when(col(steps.head).isNotNull, lit(1)).otherwise(lit(0))) {
      case (acc, (s, i)) =>
        when(acc === i && col(s).isNotNull &&
          col(s) >= col(steps(i - 1)), lit(i + 1)).otherwise(acc)
    }
    firsts
      .select(col("user_id"), depth.as("depth"))
      .groupBy(col("depth"))
      // post-pivot rows are already unique per user: a plain count is the
      // same answer without the distinct aggregation's Expand
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("depth"))
  }

  /** GLOBAL row numbering WITHOUT the single-partition window. The naive
    * `row_number() OVER (ORDER BY ...)` has an empty PARTITION BY, so
    * Spark plans one exchange to ONE partition and a single task sorts
    * the world — the canonical accidental scale-killer. This is the
    * distributed equivalent, exact for a TOTAL ordering (pass a unique
    * tiebreaker as the last sort column):
    *
    *   1. range-repartition + in-partition sort on the sort columns —
    *      the same machinery a global `orderBy` uses, n-way parallel;
    *   2. localCheckpoint pins that placement (the barrier every
    *      two-pass consumer of one shuffle pays here — rank ONLY a
    *      narrow projection and join back by id if rows are wide);
    *   3. per-partition row counts (metadata-sized) collect to the
    *      driver; their prefix sums are each partition's global offset;
    *   4. rank = per-partition `row_number` (a PARALLEL window keyed by
    *      the partition id) + the broadcast offset.
    *
    * One range shuffle + one barrier, no single-task stage anywhere.
    */
  def globalRowNumber(
      df: DataFrame, sortCols: Seq[Column], as: String = "rank",
      nPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n =
      if (nPartitions > 0) nPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("c"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).init)
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    val w = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
    ranged
      .join(broadcast(offDf), Seq("_pid"))
      .withColumn(as, row_number().over(w).cast("long") + col("_off"))
      .drop("_pid", "_off")
  }

  /** Exact NTILE from a 1-based global rank: the first `total % tiles`
    * buckets hold `ceil(total/tiles)` rows, the rest `floor` — the SQL
    * NTILE contract, computed as a stateless projection on
    * [[globalRowNumber]]'s output instead of another one-partition
    * window.
    */
  def ntileOf(rank: Column, total: Long, tiles: Int): Column = {
    require(tiles > 0, s"ntileOf: tiles must be positive, got $tiles")
    val sz = total / tiles
    val big = total % tiles
    // Column `/` is DOUBLE division — floor+cast makes both branches the
    // integer division the NTILE arithmetic needs
    def idiv(a: Column, b: Long): Column = floor(a / b).cast("long")
    if (sz == 0) rank // more tiles than rows: each row its own bucket
    else when(rank <= big * (sz + 1), idiv(rank - 1, sz + 1) + 1)
      .otherwise(lit(big) + idiv(rank - big * (sz + 1) - 1, sz) + 1)
  }
}
