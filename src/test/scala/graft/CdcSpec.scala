package graft

import org.apache.spark.sql.functions.col
import graft.operators.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base =
    Seq((1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0))
      .toDF("key", "name", "val")

  test("mergeChangelog: last change per key wins, full outcome matrix") {
    val changelog = Seq(
      // key 1: update history, last is 'U' 15 → updated
      (1L, 100L, "U", 11.0), (1L, 101L, "U", 15.0),
      // key 2: upserted then tombstoned → deleted
      (2L, 102L, "U", 25.0), (2L, 103L, "D", 0.0),
      // key 3 untouched → carried with NULL last_seq
      // key 4: insert (absent from base) → name NULL
      (4L, 104L, "U", 40.0),
      // key 5: tombstone on a key the base never had → absent, no error
      (5L, 105L, "D", 0.0),
      // key 6: D then later U resurrects → present with the U payload
      (6L, 106L, "D", 0.0), (6L, 107L, "U", 60.0)
    ).toDF("key", "seq", "op", "val")
    val got = Cdc.mergeChangelog(base, changelog).collect()
      .map(r => r.getAs[Long]("key") ->
        ((Option(r.getAs[String]("name")), r.getAs[Double]("val"),
          Option(r.get(r.fieldIndex("last_seq"))))))
      .toMap
    assert(got.keySet == Set(1L, 3L, 4L, 6L))
    assert(got(1L) == ((Some("one"), 15.0, Some(101L))))
    assert(got(3L) == ((Some("three"), 30.0, None)))
    assert(got(4L) == ((None, 40.0, Some(104L))))
    assert(got(6L) == ((None, 60.0, Some(107L))))
  }

  test("mergeChangelog: replay is idempotent (applying twice == once)") {
    val changelog = Seq(
      (1L, 100L, "U", 99.0), (2L, 101L, "D", 0.0), (4L, 102L, "U", 44.0)
    ).toDF("key", "seq", "op", "val")
    val once = Cdc.mergeChangelog(base, changelog)
    val snapshotAsBase = once.select("key", "name", "val")
    val twice = Cdc.mergeChangelog(snapshotAsBase, changelog)
    val a = once.select("key", "name", "val").collect().map(_.toSeq).toSet
    val b = twice.select("key", "name", "val").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("mergeAudit: counts every outcome class and replay depth") {
    val changelog = Seq(
      (1L, 100L, "U", 11.0), (1L, 101L, "U", 15.0), // updated, 2 changes
      (2L, 102L, "D", 0.0),                         // deleted
      (4L, 103L, "U", 40.0),                        // inserted
      (5L, 104L, "D", 0.0)                          // noop_delete
    ).toDF("key", "seq", "op", "val")
    val got = Cdc.mergeAudit(base, changelog).collect()
      .map(r => r.getAs[String]("outcome") ->
        ((r.getAs[Long]("n_keys"), r.getAs[Long]("n_changes")))).toMap
    assert(got == Map(
      "carried" -> ((1L, 0L)),      // key 3
      "updated" -> ((1L, 2L)),
      "deleted" -> ((1L, 1L)),
      "inserted" -> ((1L, 1L)),
      "noop_delete" -> ((1L, 1L))))
  }

  test("latestChanges stream == mergeChangelog batch; stale seqs dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.{Change, KeyChange}
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val chunks = Seq(
        Seq(Change(1L, 100L, "U", 11.0), Change(2L, 102L, "U", 25.0)),
        // key 1: LATE lower seq (must be dropped); key 2: tombstone
        Seq(Change(1L, 99L, "U", 1.0), Change(2L, 103L, "D", 0.0)),
        // key 4 inserts; key 2 resurrects after its delete
        Seq(Change(4L, 104L, "U", 40.0), Change(2L, 105L, "U", 26.0)))
      val input = MemoryStream[Change]
      val q = CdcStream.latestChanges(input.toDS())
        .writeStream.format("memory").queryName("cdc_latest")
        .outputMode(OutputMode.Update()).start()
      val emissions = try {
        val perChunk = chunks.map { c =>
          val before = spark.table("cdc_latest").count()
          input.addData(c); q.processAllAvailable()
          spark.table("cdc_latest").count() - before
        }
        // chunk 2: only key 2 transitions (key 1's late row is stale)
        assert(perChunk == Seq(2L, 1L, 2L), s"emission counts: $perChunk")
        spark.table("cdc_latest").as[KeyChange].collect()
      } finally q.stop()
      // last emission per key == the batch reduction inside mergeChangelog:
      // apply the streamed state to a base and compare full snapshots
      val streamedLatest = emissions.groupBy(_.key)
        .map { case (k, es) => k -> es.maxBy(_.seq) }
      val base = Seq((1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0))
        .toDF("key", "name", "val")
      val changelog = chunks.flatten
        .map(c => (c.key, c.seq, c.op, c.value)).toDF("key", "seq", "op", "val")
      val batch = graft.operators.Cdc.mergeChangelog(base, changelog).collect()
        .map(r => r.getAs[Long]("key") -> r.getAs[Double]("val")).toMap
      val baseMap = Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0)
      val streamedSnapshot = (baseMap.keySet ++ streamedLatest.keySet).flatMap { k =>
        streamedLatest.get(k) match {
          case Some(c) if c.op == "D" => None
          case Some(c) => Some(k -> c.value)
          case None => Some(k -> baseMap(k))
        }
      }.toMap
      assert(streamedSnapshot == batch,
        s"stream-applied snapshot $streamedSnapshot != batch MERGE $batch")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("compactChangelog: replay-equivalent against EVERY base, tombstones kept") {
    val changelog = Seq(
      (1L, 100L, "U", 11.0), (1L, 101L, "U", 15.0),
      (2L, 102L, "U", 25.0), (2L, 103L, "D", 0.0),
      (4L, 104L, "U", 40.0),
      (6L, 106L, "D", 0.0), (6L, 107L, "U", 60.0)
    ).toDF("key", "seq", "op", "val")
    val compacted = Cdc.compactChangelog(changelog)
    // one row per key, highest LSN
    val byKey = compacted.collect()
      .map(r => r.getAs[Long]("key") ->
        ((r.getAs[Long]("seq"), r.getAs[String]("op")))).toMap
    assert(byKey == Map(
      1L -> ((101L, "U")), 2L -> ((103L, "D")),
      4L -> ((104L, "U")), 6L -> ((107L, "U"))))
    // the contract: apply(compact(log)) == apply(log) on bases that do
    // and do not hold the tombstoned key (dropping the 'D' would diverge
    // on the first one)
    val bases = Seq(
      Seq((2L, "two", 20.0), (3L, "three", 30.0)),
      Seq((1L, "one", 10.0)))
    bases.foreach { b =>
      val base = b.toDF("key", "name", "val")
      val full = Cdc.mergeChangelog(base, changelog).collect().map(_.toSeq).toSeq
      val comp = Cdc.mergeChangelog(base, compacted).collect().map(_.toSeq).toSeq
      assert(full == comp, s"replay divergence on base $b")
    }
  }

  private def scdLog = Seq(
    // key 1: two updates -> first closes at 103, second current
    (1L, 101L, "U", "a1", 1.0), (1L, 103L, "U", "a2", 2.0),
    // key 2: update then delete -> interval closes at 104, NO current row
    (2L, 102L, "U", "b1", 3.0), (2L, 104L, "D", null, 0.0),
    // key 3: delete-then-resurrect: D first (closes nothing), then U
    (3L, 105L, "D", null, 0.0), (3L, 106L, "U", "c1", 4.0),
    // key 4: single update, current
    (4L, 107L, "U", "d1", 5.0)
  ).toDF("key", "seq", "op", "name", "val")

  test("scdHistory: validity intervals, deletes close without opening, half-open partition") {
    val h = Cdc.scdHistory(scdLog).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("name"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong),
        r.getAs[Boolean]("is_current"))).toSeq
    assert(h == Seq(
      (1L, "a1", 101L, Some(103L), false),
      (1L, "a2", 103L, None, true),
      (2L, "b1", 102L, Some(104L), false), // closed BY the delete
      (3L, "c1", 106L, None, true),
      (4L, "d1", 107L, None, true)), s"history: $h")
    // a deleted key has no current row; current rows == the MERGE snapshot
    val current = Cdc.scdHistory(scdLog).filter(col("is_current"))
      .select(col("key"), col("name"), col("val"))
      .orderBy(col("key")).collect().map(_.toSeq).toSeq
    val merged = Cdc.mergeChangelogFull(
        base.limit(0), scdLog).drop("last_seq")
      .orderBy(col("key")).collect().map(_.toSeq).toSeq
    assert(current == merged,
      "is_current slice must equal the latest-image MERGE of the same log")
  }

  test("scdAsOf: half-open probe serves at most one row per key, none for deleted keys") {
    val h = Cdc.scdHistory(scdLog)
    def asOf(t: Double) = Cdc.scdAsOf(h, t).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("name"))).toSeq
    // t = 103 is key 1's boundary: the HALF-OPEN rule serves the NEW
    // image a2 (valid [103, ∞)), never both and never the old one
    assert(asOf(103.0) == Seq((1L, "a2"), (2L, "b1")))
    // t = 104 is key 2's delete point: the key serves NOTHING from then
    assert(asOf(104.0) == Seq((1L, "a2")))
    // before everything: empty; after everything: the current snapshot
    assert(asOf(100.0).isEmpty)
    assert(asOf(999.0) == Seq((1L, "a2"), (3L, "c1"), (4L, "d1")))
  }

  test("scdJoin: each fact gets the version valid at its own t; gaps keep NULL dims") {
    val h = Cdc.scdHistory(scdLog)
    val facts = Seq(
      (1L, 100L, 9.0),  // before key 1's first version -> NULL dims
      (1L, 102L, 9.1),  // inside [101, 103) -> a1
      (1L, 103L, 9.2),  // boundary: half-open -> a2, never a1
      (2L, 103L, 9.3),  // inside [102, 104) -> b1
      (2L, 104L, 9.4),  // AT the delete -> NULL dims (key 2 gone)
      (5L, 999L, 9.5)   // key with no history at all -> NULL dims
    ).toDF("key", "t", "amount")
    val got = Cdc.scdJoin(facts, h).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[String]("dim_name"))).toSeq
    assert(got == Seq(
      (1L, 100L, null), (1L, 102L, "a1"), (1L, 103L, "a2"),
      (2L, 103L, "b1"), (2L, 104L, null), (5L, 999L, null)), s"got $got")
    // at most one match per fact: row count == fact count
    assert(Cdc.scdJoin(facts, h).count() == facts.count())
  }

  test("scdMerge: fold == refit on every seq-boundary split (monotone-LSN contract)") {
    val refit = Cdc.scdHistory(scdLog)
      .orderBy(col("key"), col("valid_from")).collect().map(_.toSeq).toSeq
    // every split point, including empty-first and empty-second
    (100L to 108L).foreach { cut =>
      val folded = Cdc.scdMerge(
        Cdc.scdHistory(scdLog.filter(col("seq") <= cut)),
        scdLog.filter(col("seq") > cut))
        .orderBy(col("key"), col("valid_from")).collect().map(_.toSeq).toSeq
      assert(folded == refit, s"fold at seq<=$cut diverged from refit")
    }
    // three-way fold (re-merging a merged history) also matches
    val threeWay = Cdc.scdMerge(
      Cdc.scdMerge(
        Cdc.scdHistory(scdLog.filter(col("seq") <= 103L)),
        scdLog.filter(col("seq") > 103L && col("seq") <= 105L)),
      scdLog.filter(col("seq") > 105L))
      .orderBy(col("key"), col("valid_from")).collect().map(_.toSeq).toSeq
    assert(threeWay == refit, "chained folds must equal the one-shot refit")
  }
}
