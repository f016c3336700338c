package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations — the generalized streaming surface the
  * reference lacks entirely (SURVEY.md §2.5: "no tumbling/sliding/session
  * windows... exist in the reference"; §7.1 step 7 adds them as built-ins).
  * All state is bounded by the watermark — the 100 TB prerequisite the
  * reference's unbounded update-mode state would violate (SURVEY §7.4 risk 5).
  */
object Windows {

  /** Tumbling per-station turnstile counts. Append mode once the watermark
    * closes a window; state per (window, station) only until then.
    */
  def tumblingCounts(
      turnstile: DataFrame, width: String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame =
    turnstile
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), width), col("station_id"))
      .agg(count(lit(1)).as("entries"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("station_id"), col("entries"))

  /** Sliding-window event rate (overlapping windows). */
  def slidingCounts(
      turnstile: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    turnstile
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), width, slide), col("station_id"))
      .agg(count(lit(1)).as("entries"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("station_id"), col("entries"))

  /** Session windows per station: bursts of entries separated by `gap` of
    * inactivity collapse into one session row.
    */
  def sessionCounts(
      turnstile: DataFrame, gap: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    turnstile
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("station_id"))
      .agg(count(lit(1)).as("entries"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("station_id"), col("entries"))

  /** Stream–stream join (absent from the reference — SURVEY §2.3 "not
    * present"; part of the generalized engine surface): turnstile entries
    * joined with the weather reading of the same clock hour. Equality on the
    * hour window + watermarks on both sides bounds each side's join state to
    * the watermark horizon.
    */
  def entriesWithWeather(
      turnstile: DataFrame, weather: DataFrame,
      watermark: String = "2 hours"): DataFrame = {
    // each side keeps ONE event-time column: the hour window itself (a
    // second one alongside it is rejected by the streaming planner)
    val t = turnstile
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", watermark)
      .withColumn("hour_window", window(col("event_time"), "1 hour"))
      .select(col("hour_window"), col("station_id"), col("station_name"), col("line"))
    val w = weather
      .withColumn("w_time", timestamp_millis(col("timestamp")))
      .withWatermark("w_time", watermark)
      .withColumn("hour_window", window(col("w_time"), "1 hour"))
      .select(col("hour_window"), col("temperature"), col("status").as("weather_status"))
    t.join(w, "hour_window")
      .select(
        col("station_id"), col("station_name"), col("line"),
        col("hour_window.start").as("entry_hour"),
        col("temperature"), col("weather_status"))
  }

  /** The simulator as a streaming job (SURVEY §3.1 "rebuild shape"): a
    * `rate` source drives synthetic turnstile events via the same column
    * math as the batch entries model — modular station assignment
    * (stream-static broadcast join) + seeded U[-5,4] noise (F8). Swap the
    * sink to `format("kafka")` for the reference's wire layout.
    */
  def syntheticTurnstileStream(
      spark: SparkSession, stations: DataFrame, rowsPerSecond: Int = 100): DataFrame = {
    val indexed = stations
      .select(col("station_id"), col("station_name"))
      .dropDuplicates("station_id")
      .withColumn("idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("station_id"))) - 1)
    val n = indexed.count()
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .withColumn("idx", (col("value") % n).cast("int"))
      .join(broadcast(indexed), "idx")
      .select(
        unix_millis(col("timestamp")).as("timestamp"),
        col("station_id"), col("station_name"),
        graft.functions.RandomFns.categorical(7L, Seq("red", "blue", "green")).as("line"))
  }
}
