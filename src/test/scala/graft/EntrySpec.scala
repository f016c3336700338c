package graft

class EntrySpec extends SparkSpec {
  test("driver entry returns rows spanning both engine halves") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val parts = rows.map(_.getAs[String]("part")).toSet
    assert(parts.contains("pricing_summary"))
    assert(parts.exists(_ != "pricing_summary"), s"curation decisions missing: $parts")
    assert(rows.map(_.getAs[Long]("n")).forall(_ > 0))
  }
}
