package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated benchmark corpus (TESTDATA.md).
  *
  * Scale notes (100 TB design): every reader takes the parquet path as-is and
  * lets the DataSource V2 scan handle split planning — at cluster scale the
  * same code reads a partitioned directory tree; filters/projections push into
  * the scan (verify with `.explain("formatted")` → `PushedFilters`,
  * `ReadSchema`). Dimension tables (`region`, `nation`, `supplier`, `part`,
  * `customer` at TPC-H proportions) stay broadcast-joinable; fact tables
  * (`lineitem`, `orders`, `events`, `documents`, `embeddings`) are the ones
  * whose shuffles we budget.
  */
object Tables {
  val factNames = Seq("lineitem", "orders", "events", "documents", "embeddings")
  val dimNames  = Seq("region", "nation", "customer", "supplier", "part")
  val names: Seq[String] = dimNames ++ factNames

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Fact tables ship as ONE file with ONE row group, and parquet splits only
    * at row-group boundaries — so the scan plans a single partition and every
    * downstream pipeline stage runs on one core. Fan the scan out to the
    * session's parallelism; on a realistically-split input (the 100 TB case)
    * this is a no-op. Row order is not load-bearing anywhere: every window /
    * row_number in the query set carries a unique tiebreak column precisely
    * so results are partitioning-independent.
    */
  private def loadFact(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.operators.Par.spread(load(spark, sfDir, name))

  def lineitem(spark: SparkSession, d: String): DataFrame  = loadFact(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame    = loadFact(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  /** `events.ts` has shipped in two physical schemas across corpus
    * generations, so normalize by the type the scan actually produces:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read nanos as
    *    long (legacy conf) and truncate to microsecond TimestampType
    *    (`DIV 1000` in integer space — a double division would lose precision
    *    at 1.7e18 ns epochs).
    *  - timestamp[us] without UTC adjustment: lands as TIMESTAMP_NTZ; cast to
    *    session-zone TimestampType (UTC everywhere here, so the micros value
    *    is preserved bit-for-bit and matches DuckDB's naive TIMESTAMP read).
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = loadFact(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = loadFact(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = loadFact(spark, d, "embeddings")
}
