package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the transit seed data (SURVEY.md §2.1 S1/S2/S3).
  * Explicit schemas — header inference is a scan of its own at scale.
  */
object TransitData {

  val DefaultDataDir = "/root/reference/producers/data"

  val stationsSchema = StructType(Seq(
    StructField("stop_id", IntegerType),
    StructField("direction_id", StringType),
    StructField("stop_name", StringType),
    StructField("station_name", StringType),
    StructField("station_descriptive_name", StringType),
    StructField("station_id", IntegerType),
    StructField("order", IntegerType),
    StructField("red", BooleanType),
    StructField("blue", BooleanType),
    StructField("green", BooleanType)))

  val ridershipSeedSchema = StructType(Seq(
    StructField("station_id", IntegerType),
    StructField("stationame", StringType), // sic — reference header
    StructField("month_beginning", StringType),
    StructField("avg_weekday_rides", DoubleType),
    StructField("avg_saturday_rides", DoubleType),
    StructField("avg_sunday_holiday_rides", DoubleType),
    StructField("monthtotal", LongType)))

  val ridershipCurveSchema = StructType(Seq(
    StructField("hour", IntegerType),
    StructField("ridership_ratio", DoubleType)))

  /** S1 — stations dimension, sorted by order on load (simulation.py:35-37).
    * The CSV stands in for the Postgres table (S3/S4): on a cluster, the same
    * frame comes from `spark.read.jdbc(url, "stations", props)` with
    * incremental re-reads keyed on `stop_id > last` (connector.py:42-43).
    */
  def stations(spark: SparkSession, dataDir: String = DefaultDataDir): DataFrame =
    spark.read.option("header", "true").schema(stationsSchema)
      .csv(s"$dataDir/cta_stations.csv")
      .orderBy(col("order"))

  /** S3 — JDBC stations source with the connector's incremental contract
    * (producers/connector.py:26-48): `mode=incrementing` on `stop_id`,
    * ≤500 rows per fetch. Catalyst pushes the predicate into Postgres; call
    * per poll tick with the max stop_id seen so far (the Kafka-Connect 60 s
    * poll loop becomes a driver-side timer or a file/Delta snapshot stream).
    * Compiles against spark-sql only; needs a JDBC driver jar at runtime.
    */
  def stationsJdbc(
      spark: SparkSession, url: String, props: java.util.Properties,
      lastStopId: Option[Int] = None): DataFrame = {
    props.setProperty("fetchsize", "500") // batch.max.rows=500 (connector.py:37)
    val df = spark.read.jdbc(url, "stations", props)
    lastStopId.fold(df)(last => df.filter(col("stop_id") > last))
  }

  /** S2 — ridership seed (144 rows) + hourly curve (25 rows), broadcast-sized. */
  def ridershipSeed(spark: SparkSession, dataDir: String = DefaultDataDir): DataFrame =
    spark.read.option("header", "true").schema(ridershipSeedSchema)
      .csv(s"$dataDir/ridership_seed.csv")

  def ridershipCurve(spark: SparkSession, dataDir: String = DefaultDataDir): DataFrame =
    spark.read.option("header", "true").schema(ridershipCurveSchema)
      .csv(s"$dataDir/ridership_curve.csv")
}
