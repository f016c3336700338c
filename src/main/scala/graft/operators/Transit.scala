package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.schemas.Transit._

/** Batch semantics of the reference's five queries (SURVEY.md §0 Q1–Q5).
  * Streaming twins in [[graft.streaming.TransitStreams]] reuse these column
  * expressions — batch-first keeps every operator DuckDB-oracle-testable.
  *
  * Scale notes: stations is a ~hundreds-of-rows dimension → always broadcast;
  * arrivals/turnstile are the unbounded fact streams → the only shuffles are
  * the keyed aggregations, partitioned by the same keys the streaming state
  * store would use, so the plan shape is identical at 1000 executors.
  */
object Transit {

  /** Q1 — Faust stations transform (consumers/faust_stream.py:72-92):
    * 4-column projection + prioritized CASE red→blue→green, null otherwise.
    * Narrow, whole-stage-codegen'd, no shuffle.
    */
  def transformStations(stations: DataFrame): DataFrame =
    stations.select(
      col("station_id"), col("station_name"), col("order"),
      when(col("red"), "red")
        .when(col("blue"), "blue")
        .when(col("green"), "green")
        .otherwise(lit(null).cast("string")).as("line"))

  /** Q2 — KSQL turnstile summary (consumers/ksql.py:24-40): cumulative count
    * per station, uppercase output fields per the observable contract.
    */
  def turnstileSummary(turnstile: DataFrame): DataFrame =
    turnstile.groupBy(col("station_id").as("STATION_ID"))
      .agg(count(lit(1)).as("COUNT"))

  /** Q3 — latest weather (consumers/models/weather.py:17-30): last reading
    * wins. max_by keeps the agg partial-izable (no global sort); timestamp
    * ties break on nothing — the reference overwrites in arrival order, and
    * its producer emits at most one reading per millisecond.
    */
  def latestWeather(weather: DataFrame): DataFrame =
    weather.agg(
      max_by(struct(col("temperature"), col("status")), col("timestamp")).as("w"),
      max(col("timestamp")).as("timestamp"))
      .select(col("w.temperature").as("temperature"), col("w.status").as("status"),
        col("timestamp"))

  /** O3/J6 — explode one arrival into its two keyed change events: a
    * departure at (prev_station_id, prev_direction) and an arrival at
    * (station_id, direction) (consumers/models/line.py:31-54). Null-guarded
    * like the reference (P9): initial placements emit no departure.
    */
  def arrivalChangeEvents(arrivals: DataFrame): DataFrame = {
    val arrive = arrivals.select(
      col("station_id"), col("direction"), col("timestamp"),
      lit("arrive").as("kind"), col("train_id"), col("train_status"))
    val depart = arrivals
      .filter(col("prev_station_id").isNotNull && col("prev_direction").isNotNull)
      .select(
        col("prev_station_id").as("station_id"), col("prev_direction").as("direction"),
        col("timestamp"), lit("depart").as("kind"),
        col("train_id"), col("train_status"))
    arrive.unionByName(depart)
  }

  /** Q4/O3 — train position tracker, batch shape: latest change event per
    * (station_id, direction); an arrival leaves the train on the platform, a
    * departure clears it (consumers/models/station.py:26-39). Tiebreak at
    * equal timestamps: the arrival wins — when one tick moves train A off a
    * platform and train B onto it, both events carry the same key timestamp
    * and B must survive (the reference applies the departure before the
    * arrival per message, line.py:31-54). One shuffle on the key.
    */
  def trainPositions(arrivals: DataFrame): DataFrame = {
    val events = arrivalChangeEvents(arrivals)
    val w = Window.partitionBy(col("station_id"), col("direction"))
      .orderBy(col("timestamp").desc,
        when(col("kind") === "arrive", 1).otherwise(0).desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("station_id"), col("direction"),
        when(col("kind") === "arrive", col("train_id")).as("train_id"),
        when(col("kind") === "arrive", col("train_status")).as("train_status"),
        col("timestamp").as("updated"))
  }

  /** Q5/J5 — dashboard assembly (templates/status.html:29-39 + server.py
    * wiring): transformed stations ⋈ train positions (pivoted a/b) ⋈
    * turnstile counts ⋈ (cross) latest weather, ordered by (line, order).
    * Dimensions broadcast; the fact-side aggregates are already tiny.
    */
  def dashboard(
      transformedStations: DataFrame,
      trainPositions: DataFrame,
      turnstileSummary: DataFrame,
      latestWeather: DataFrame): DataFrame = {
    val trains = trainPositions.groupBy(col("station_id").as("t_station_id"))
      .agg(
        max(when(col("direction") === "a", col("train_id"))).as("train_dir_a"),
        max(when(col("direction") === "b", col("train_id"))).as("train_dir_b"))
    val colorMap: Column = map(
      LineColors.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    // rename the counts key: Spark's default case-insensitive resolution makes
    // STATION_ID ambiguous with station_id after the join otherwise
    val countsRenamed = turnstileSummary.select(
      col("STATION_ID").as("c_station_id"), col("COUNT"))
    transformedStations
      .filter(col("line").isNotNull)
      .join(broadcast(trains), col("station_id") === col("t_station_id"), "left_outer")
      .join(broadcast(countsRenamed), col("station_id") === col("c_station_id"), "left_outer")
      .crossJoin(broadcast(latestWeather.select(
        col("temperature").as("w_temperature"), col("status").as("w_status"))))
      .select(
        col("line"), colorMap(col("line")).as("color_code"),
        col("station_name"), col("order"),
        col("train_dir_a"), col("train_dir_b"),
        coalesce(col("COUNT"), lit(0L)).as("total_turnstile_entries"),
        floor(col("w_temperature")).cast("int").as("temperature"),
        initcap(regexp_replace(col("w_status"), "_", " ")).as("weather_status"))
      .orderBy(col("line"), col("order"))
  }

  /** A4/J3/J4 — turnstile entries model (turnstile_hardware.py:46-66),
    * bug-compatible per SURVEY §7.4: `total_steps` is 300 (the reference's
    * `time_step.total_seconds()`), weekday branch always taken. The noise
    * term U[-5,4] is injected by the caller (seeded) so the core model stays
    * deterministic and oracle-testable.
    */
  val TotalStepsBugCompatible = 300

  def turnstileEntries(
      stationSeed: DataFrame, curve: DataFrame, atHour: Column): DataFrame =
    stationSeed
      .join(broadcast(curve), curve("hour") === atHour)
      .select(
        col("station_id"),
        greatest(lit(0L),
          floor(col("avg_weekday_rides") * col("ridership_ratio")
            / lit(TotalStepsBugCompatible)).cast("long")).as("entries"))
}
