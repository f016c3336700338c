package graft

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
}
