package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source-format coverage beyond parquet: CSV, JSON-lines, and ORC write →
  * read round trips preserve the relation (S1/S8 families generalized — the
  * formats a lake ingests from).
  */
class FormatsSpec extends SparkSpec {

  private lazy val orders = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft-$fmt").toString + "/orders"
    orders.write.format(fmt).option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true").load(dir)
    assert(back.count() == orders.count(), s"$fmt row count")
    val a = orders.orderBy("o_orderkey").collect().map(_.toString)
    val b = back.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey").collect().map(_.toString)
    assert(a.sameElements(b), s"$fmt contents drifted")
  }

  test("CSV round trip")(roundTrip("csv"))
  test("JSON-lines round trip")(roundTrip("json"))
  test("ORC round trip")(roundTrip("orc"))

  test("text source reads documents as raw lines") {
    val dir = Files.createTempDirectory("graft-text").toString + "/docs"
    Tables.documents(spark, sf).select(col("text")).limit(100)
      .write.text(dir)
    assert(spark.read.text(dir).count() == 100)
  }
}
