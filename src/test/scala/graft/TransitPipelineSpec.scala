package graft

import java.nio.file.Files
import graft.schemas.Transit._
import graft.serving.Dashboard
import graft.streaming.TransitPipeline

/** End-to-end pipeline test including checkpoint recovery: feed half the
  * simulated events, stop every query, restart from the same checkpoints,
  * feed the rest, and require the final serving state to equal the batch
  * semantics over the full event log.
  */
class TransitPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("file-source pipeline recovers state across a restart") {
    val root = Files.createTempDirectory("graft-pipeline").toString
    val cfg = TransitPipeline.Config(
      s"$root/arrivals", s"$root/turnstile", s"$root/weather", s"$root/chk",
      triggerMs = 100L)

    val sim = graft.sim.Simulator.fromStations(
      graft.sources.TransitData.stations(spark),
      hourlyRatio = Map(0 -> 0.125), numTrains = 3)
    val (arrivals, turnstiles, weather) = sim.run(24)
    val (a1, a2) = arrivals.splitAt(arrivals.size / 2)
    val (t1, t2) = turnstiles.splitAt(turnstiles.size / 2)
    val (w1, w2) = weather.splitAt(weather.size / 2)

    def dump[T <: Product : org.apache.spark.sql.Encoder](rows: Seq[T], dir: String): Unit =
      rows.toDS().coalesce(1).write.mode("append").parquet(dir)

    // phase 1
    dump(a1, cfg.arrivalsDir); dump(t1, cfg.turnstileDir); dump(w1, cfg.weatherDir)
    val dash = new Dashboard
    val qs1 = TransitPipeline.start(spark, cfg, dash)
    try qs1.foreach(_.processAllAvailable()) finally qs1.foreach(_.stop())
    assert(dash.platforms.nonEmpty && dash.counts.nonEmpty)

    // phase 2: fresh serving layer, SAME checkpoints — aggregation state
    // (cumulative counts) must survive the restart
    dump(a2, cfg.arrivalsDir); dump(t2, cfg.turnstileDir); dump(w2, cfg.weatherDir)
    val dash2 = new Dashboard
    val qs2 = TransitPipeline.start(spark, cfg, dash2)
    try qs2.foreach(_.processAllAvailable()) finally qs2.foreach(_.stop())

    // counts: update-mode only re-emits CHANGED stations after restart, so
    // compare on stations updated in phase 2 — cumulative across BOTH phases
    val batchCounts = graft.operators.Transit.turnstileSummary(turnstiles.toDF())
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dash2.counts.nonEmpty)
    dash2.counts.foreach { case (sid, n) =>
      assert(n == batchCounts(sid), s"station $sid diverged after recovery")
    }

    // platforms: final state for keys touched in phase 2 equals batch over all
    val batchPositions = graft.operators.Transit.trainPositions(arrivals.toDF())
      .collect()
      .map(r => ((r.getInt(0), r.getString(1)), Option(r.getAs[String]("train_id"))))
      .toMap
    assert(dash2.platforms.nonEmpty)
    dash2.platforms.foreach { case (k, p) =>
      assert(batchPositions(k) == p.train_id, s"platform $k diverged")
    }

    // weather: newest reading wins
    assert(dash2.weather.map(_.timestamp) == Some(weather.map(_.timestamp).max))

    // dashboard renders from recovered state
    dash2.upsertStations(
      graft.operators.Transit.transformStations(
        graft.sources.TransitData.stations(spark))
        .dropDuplicates("station_id").as[TransformedStation])
    assert(dash2.rows.exists(_.total_turnstile_entries > 0))
  }
}
