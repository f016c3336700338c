package graft.serving

import org.apache.spark.sql.SparkSession
import graft.schemas.Transit._

/** End-to-end transit demo (the reference's `python server.py` analog,
  * consumers/server.py:42-101): seeded simulator → the Q1/Q2/Q3/Q4 operators
  * → serving state → HTTP dashboard.
  *
  * Usage: `graft.serving.TransitDemo [ticks] [port] [batch|stream]` —
  * renders at http://localhost:<port>/ until killed (port 0 = render once to
  * stdout). `stream` runs the checkpointed Structured Streaming pipeline
  * (graft.streaming.TransitPipeline) over file sources instead of batch ops.
  */
object TransitDemo {
  def main(args: Array[String]): Unit = {
    val ticks = args.headOption.map(_.toInt).getOrElse(60)
    val port = args.drop(1).headOption.map(_.toInt).getOrElse(8888)
    val mode = args.drop(2).headOption.getOrElse("batch")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-transit-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val stations = graft.sources.TransitData.stations(spark)
    val seed = graft.sources.TransitData.ridershipSeed(spark)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    val curve = graft.sources.TransitData.ridershipCurve(spark)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val sim = graft.sim.Simulator.fromStations(stations, seed, curve)
    val (arrivals, turnstiles, weather) = sim.run(ticks)
    println(s"[demo] simulated $ticks ticks: ${arrivals.size} arrivals, " +
      s"${turnstiles.size} turnstile events, ${weather.size} weather readings")

    val dash = new Dashboard
    dash.upsertStations(graft.operators.Transit.transformStations(stations)
      .dropDuplicates("station_id").as[TransformedStation])
    if (mode == "stream") {
      val root = graft.Scratch.dir("graft-demo")
      arrivals.toDS().write.parquet(s"$root/arrivals")
      turnstiles.toDS().write.parquet(s"$root/turnstile")
      weather.toDS().write.parquet(s"$root/weather")
      val ttl = sys.env.get("GRAFT_STATE_TTL") // e.g. "30 minutes"
      val qs = graft.streaming.TransitPipeline.start(spark,
        graft.streaming.TransitPipeline.Config(
          s"$root/arrivals", s"$root/turnstile", s"$root/weather", s"$root/chk",
          stateTtl = ttl),
        dash)
      qs.foreach(_.processAllAvailable())
      println(s"[demo] streaming pipeline caught up (${qs.size} queries, checkpoints at $root/chk)")
    } else {
      dash.upsertCounts(graft.operators.Transit.turnstileSummary(turnstiles.toDF()))
      dash.upsertPlatforms(graft.operators.Transit.trainPositions(arrivals.toDF()).as[PlatformState])
      dash.upsertWeather(weather.toDS())
    }

    if (port == 0) {
      println(dash.renderHtml)
      spark.stop()
    } else {
      Dashboard.serve(dash, port)
      println(s"[demo] dashboard at http://localhost:$port/ — ctrl-c to stop")
      Thread.currentThread().join()
    }
  }
}
