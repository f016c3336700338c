package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("pricingSummary groups and sums exactly") {
    val li = Seq(
      ("A", "F", 10.0, 100.0, 0.1, java.sql.Timestamp.valueOf("1995-01-01 00:00:00")),
      ("A", "F", 20.0, 200.0, 0.0, java.sql.Timestamp.valueOf("1995-01-02 00:00:00")),
      ("R", "O", 5.0, 50.0, 0.5, java.sql.Timestamp.valueOf("1999-01-01 00:00:00")) // filtered out
    ).toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
    val out = Relational.pricingSummary(li).collect()
    assert(out.length == 1)
    assert(out(0) == Row("A", "F", 30.0, 300.0, 290.0, 2L))
  }

  test("groupedCount counts per key") {
    val ev = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("user_id", "event_type")
    val out = Relational.groupedCount(ev).as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("latestEventPerUser keeps the newest row per key with tiebreak") {
    val ev = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x", 1.0),
      (1L, 2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "y", 2.0),
      (1L, 3L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "z", 3.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = Relational.latestEventPerUser(ev).collect()
    assert(out.length == 1 && out(0).getAs[Long]("event_id") == 3L)
  }

  test("case projection priority order") {
    val o = Seq((1L, "F", 300000.0), (2L, "X", 60000.0), (3L, "O", 10.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val out = Relational.caseProjection(o).as[(Long, Option[String], String)].collect()
    assert(out.toSeq == Seq(
      (1L, Some("finished"), "large"), (2L, None, "medium"), (3L, Some("open"), "small")))
  }

  test("semi/anti joins partition the customer set") {
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf)
    val withO = Relational.customersWithOrders(c, o).count()
    val withoutO = Relational.customersWithoutOrders(c, o).count()
    assert(withO + withoutO == c.count())
  }

  test("topK is ordered and bounded") {
    val out = Relational.topKOrders(Tables.orders(spark, sf), 10).collect()
    assert(out.length == 10)
    val prices = out.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted.reverse))
  }

  test("broadcast join plans a BroadcastHashJoin, not a shuffle join") {
    val plan = Relational.ordersWithCustomer(
      Tables.orders(spark, sf), Tables.customer(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("approx sketches land within tolerance of their exact twins") {
    val ev = Tables.events(spark, sf)
    val exact = Relational.distinctUsersPerType(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Relational.approxDistinctUsersPerType(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.1, s"$k: $n vs ${approx(k)}")
    }
    val q = Relational.approxPriceQuantiles(Tables.lineitem(spark, sf)).collect()
    q.foreach { r =>
      val qs = Seq(r.getAs[Double]("p50"), r.getAs[Double]("p95"), r.getAs[Double]("p99"))
      assert(qs.sameElements(qs.sorted))
    }
  }

  test("tolerance audits: every sketch verdict TRUE, exact side equal to the exact twin (the driver-checkable oracle shape)") {
    val ev = Tables.events(spark, sf)
    val audit = Relational.approxDistinctAudit(ev).collect()
    assert(audit.nonEmpty)
    audit.foreach(r => assert(r.getAs[Boolean]("approx_ok"),
      s"${r.getString(0)}: HLL++ estimate outside the documented rsd bound"))
    val exactTwin = Relational.distinctUsersPerType(ev).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("distinct_users")).toMap
    audit.foreach(r => assert(
      r.getAs[Long]("exact_users") == exactTwin(r.getString(0)),
      "the audit's exact side must be the oracle-reproducible exact count"))
    val qa = Relational.approxQuantilesAudit(Tables.lineitem(spark, sf)).collect()
    assert(qa.nonEmpty)
    qa.foreach { r =>
      Seq("p50_ok", "p95_ok", "p99_ok").foreach(c =>
        assert(r.getAs[Boolean](c),
          s"${r.getString(0)}/$c: estimate's rank interval missed the " +
            "p·n ± n/accuracy band"))
    }
  }

  test("sessionize splits at inactivity gaps and aggregates per session") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, 10L, ts(0L), 1.0), (1L, 11L, ts(10L), 2.0),
      (1L, 12L, ts(2000L), 3.0), (1L, 13L, ts(2010L), 4.0),
      (2L, 20L, ts(5L), 5.0))
      .toDF("user_id", "event_id", "ts", "value")
    val s = Relational.sessionize(ev, gapSec = 1800).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("dur_sec"))).toMap
    assert(s == Map(
      (1L, 1L) -> (2L, 10L), (1L, 2L) -> (2L, 10L), (2L, 1L) -> (1L, 0L)))
  }

  test("quartile binning yields near-equal populations; histogram covers all rows") {
    val orders = Tables.orders(spark, sf)
    val total = orders.count()
    val quart = Relational.priceQuartiles(orders).collect()
    assert(quart.length == 4)
    val counts = quart.map(_.getAs[Long]("n"))
    assert(counts.sum == total && counts.max - counts.min <= 1)
    val hist = Relational.priceHistogram(orders).collect()
    assert(hist.map(_.getAs[Long]("n")).sum == total)
  }

  test("exact-quantile family fails loud past the distinct-cardinality bound") {
    val orders = Tables.orders(spark, sf)
    // o_totalprice is effectively all-distinct: a tiny bound must trip every
    // exact operator BEFORE its linear-state aggregation runs...
    for ((name, run) <- Seq[(String, () => Unit)](
      ("priceQuartiles", () => Relational.priceQuartiles(orders, maxDistinct = 64)),
      ("exactPriceQuantiles",
        () => Relational.exactPriceQuantiles(Tables.lineitem(spark, sf), maxDistinct = 64)),
      ("quantityMedian",
        () => Relational.quantityMedian(Tables.lineitem(spark, sf), maxDistinct = 3)))) {
      val e = intercept[IllegalArgumentException](run())
      assert(e.getMessage.contains(name) && e.getMessage.contains("sketch twin"),
        s"$name guard message: ${e.getMessage}")
    }
    // ...while bounded domains pass untouched (l_quantity: 50 distinct ints)
    assert(Relational.quantityMedian(Tables.lineitem(spark, sf), maxDistinct = 64)
      .collect().nonEmpty)
    // and Int.MaxValue skips the guard pass entirely (opt-out for domains
    // the caller knows are bounded)
    assert(Relational.priceQuartiles(orders, maxDistinct = Int.MaxValue)
      .collect().length == 4)
  }

  test("hash-stratified sample is deterministic and respects stratum rates") {
    val docs = Tables.documents(spark, sf)
    val s1 = Relational.hashStratifiedSample(docs).collect().map(_.getLong(0)).toSeq
    val s2 = Relational.hashStratifiedSample(docs).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2 && s1.nonEmpty)
    val buckets = Relational.hashStratifiedSample(docs).collect()
    buckets.foreach { r =>
      val cap = if (r.getString(1) == "en") 50 else 20
      assert(r.getAs[Long]("bucket") < cap)
    }
  }

  test("observe() exposes pipeline metrics from the same pass as the query") {
    // the production-monitoring hook: row/value counters ride the existing
    // job instead of a second scan — at 100 TB a separate count() doubles I/O
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions._
    val obs = Observation("ingest-gate")
    val kept = Tables.lineitem(spark, sf)
      .observe(obs, count(lit(1)).as("rows_seen"),
        count(when(col("l_quantity") > 40, 1)).as("rows_heavy"))
      .filter(col("l_quantity") > 40)
      .count()
    val m = obs.get
    assert(m("rows_heavy").asInstanceOf[Long] == kept)
    assert(m("rows_seen").asInstanceOf[Long] >= kept)
  }

  test("filterProject pushes filters into the parquet scan") {
    val plan = Relational.filterProject(Tables.lineitem(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), IsNotNull(l_quantity)")
      || plan.contains("EqualTo(l_returnflag,R)"))
  }

  test("stratifiedFixedN draws exactly n per stratum, deterministically") {
    val docs = Tables.documents(spark, sf)
    val n = 5
    val rows = Relational.stratifiedFixedN(docs, n).collect()
    val bySource = rows.groupBy(_.getString(0))
    val counts = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rs) =>
      assert(rs.length == math.min(n.toLong, counts(src)),
        s"$src drew ${rs.length} of ${counts(src)}")
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
    // replayable: a second run draws the identical sample
    val again = Relational.stratifiedFixedN(docs, n).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("variant extraction round-trips typed fields through parse_json") {
    val rows = Relational.variantExtract(Tables.orders(spark, sf)).limit(20).collect()
    assert(rows.nonEmpty)
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val k = r.getAs[Long]("o_orderkey")
      assert(r.getAs[Long]("key_v") == k)
      assert(r.getAs[String]("status_v") == src(k)._1)
      assert(r.getAs[Double]("total_v") == src(k)._2,
        "shortest-repr JSON round-trip of a double must be exact")
    }
  }

  test("funnel: strict temporal order, first-occurrence semantics") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val events = Seq(
      // user 1: full ordered funnel
      (1L, t(10), 1L, "view", 0.0, "{}"),
      (2L, t(20), 1L, "click", 0.0, "{}"),
      (3L, t(30), 1L, "purchase", 0.0, "{}"),
      // user 2: purchase BEFORE click -> depth 1 only... view at 10,
      // purchase 15, click 20: click>=view -> depth 2; purchase(15) < click -> stops
      (4L, t(10), 2L, "view", 0.0, "{}"),
      (5L, t(15), 2L, "purchase", 0.0, "{}"),
      (6L, t(20), 2L, "click", 0.0, "{}"),
      // user 3: never viewed -> depth 0 even though it clicked
      (7L, t(10), 3L, "click", 0.0, "{}"),
      // user 4: view only
      (8L, t(10), 4L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Relational.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Int]("depth") -> r.getAs[Long]("n_users")).toMap
    assert(got == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L), s"got $got")
  }

  test("interval blocking is lossless across bucket boundaries") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val B = 100L // tiny buckets so the fixture spans several
    val events = Seq(
      // type a: [50, 250] spans buckets 0..2; type b: [240, 260] only
      // overlaps in bucket 2; type c: [300, 400] touches neither... wait
      // c starts at 300 > a's end 250 -> no overlap with a; b [240,260]
      // overlaps c? 300 > 260 -> no
      (1L, t(50), 1L, "a", 0.0, "{}"), (2L, t(250), 1L, "a", 0.0, "{}"),
      (3L, t(240), 1L, "b", 0.0, "{}"), (4L, t(260), 1L, "b", 0.0, "{}"),
      (5L, t(300), 1L, "c", 0.0, "{}"), (6L, t(400), 1L, "c", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Relational.activityOverlapPairs(events, bucketSec = B).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"),
        r.getAs[Long]("overlap_s"))).toSeq
    // exactly the one true overlap, EMITTED ONCE despite the multi-bucket
    // span (row count pins the exactly-once property — a duplicate pair
    // would survive a set compare), with the exact length 250-240
    assert(rows == Seq(("a", "b", 10L)), s"got $rows")
  }
}
