package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.schemas.Transit._
import graft.serving.Dashboard

/** The full reference pipeline (SURVEY.md §3.3) wired end-to-end: three
  * continuous queries + the serving layer, with checkpointed state so a
  * restart resumes exactly where it stopped (the reference's earliest-offset
  * replay, consumers/consumer.py:57-68, minus the replay).
  *
  * Sources here are file streams (parquet drop-dirs) so the pipeline runs in
  * this kafka-less environment; on a cluster, swap each `readStream` for
  * [[graft.sources.KafkaIO.readTopic]] — every operator downstream is
  * unchanged. Sinks are `foreachBatch` upserts into the serving maps: update
  * mode delivers only changed keys per micro-batch, so serving writes are
  * O(delta), the streaming analog of the reference's per-message dict upsert.
  */
object TransitPipeline {

  final case class Config(
      arrivalsDir: String,
      turnstileDir: String,
      weatherDir: String,
      checkpointRoot: String,
      triggerMs: Long = 500L,
      /** Some(horizon): evict platforms idle past the watermark horizon
        * (bounded state — trainPositionsWithTTL); None: reference-faithful
        * unbounded state.
        */
      stateTtl: Option[String] = None)

  /** Start the three queries; returns them for await/stop. Restart with the
    * same checkpointRoot to recover all state.
    */
  def start(spark: SparkSession, cfg: Config, dash: Dashboard): Seq[StreamingQuery] = {
    import spark.implicits._
    val trigger = Trigger.ProcessingTime(cfg.triggerMs)

    val arrivals = spark.readStream
      .schema(Encoders.product[Arrival].schema)
      .parquet(cfg.arrivalsDir).as[Arrival]
    val tracked = cfg.stateTtl.fold(TransitStreams.trainPositions(arrivals))(
      h => TransitStreams.trainPositionsWithTTL(arrivals, h))
    val positions = tracked
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"${cfg.checkpointRoot}/positions")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[PlatformState], _: Long) =>
        dash.upsertPlatforms(batch)
      }
      .queryName("train-positions").start()

    val turnstile = spark.readStream
      .schema(Encoders.product[TurnstileEvent].schema)
      .parquet(cfg.turnstileDir)
    val counts = TransitStreams.turnstileSummary(turnstile)
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"${cfg.checkpointRoot}/counts")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        dash.upsertCounts(batch.toDF())
      }
      .queryName("turnstile-counts").start()

    val weather = spark.readStream
      .schema(Encoders.product[WeatherReading].schema)
      .parquet(cfg.weatherDir).as[WeatherReading]
    val latest = TransitStreams.latestWeather(weather)
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"${cfg.checkpointRoot}/weather")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[WeatherReading], _: Long) =>
        dash.upsertWeather(batch)
      }
      .queryName("latest-weather").start()

    Seq(positions, counts, latest)
  }
}
