package graft

import java.nio.file.{Files, Paths}
import graft.schemas.Transit._

/** Golden end-to-end check (SURVEY.md §5): a fixed-seed 24-tick replay must
  * render exactly the committed dashboard relation. Guards every layer —
  * simulator determinism, the Q1/Q2/Q4 operators, and the serving join —
  * against silent drift across rounds.
  *
  * Regenerate after an INTENTIONAL semantic change:
  * `GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.GoldenDashboardSpec"` and
  * commit the updated fixture.
  */
class GoldenDashboardSpec extends SparkSpec {
  import spark.implicits._

  private val goldenPath = "src/test/resources/golden_dashboard.txt"

  private def renderRows(): Seq[String] = {
    val stations = graft.sources.TransitData.stations(spark)
    val sim = graft.sim.Simulator.fromStations(
      stations, ridership = Map.empty, hourlyRatio = Map(0 -> 0.125),
      numTrains = 3, seed = 42L)
    val (arrivals, turnstiles, weather) = sim.run(24)
    val dash = new graft.serving.Dashboard
    dash.upsertStations(graft.operators.Transit.transformStations(stations)
      .dropDuplicates("station_id").as[TransformedStation])
    dash.upsertCounts(graft.operators.Transit.turnstileSummary(turnstiles.toDF()))
    dash.upsertPlatforms(
      graft.operators.Transit.trainPositions(arrivals.toDF()).as[PlatformState])
    dash.upsertWeather(weather.toDS())
    dash.rows.map(r =>
      s"${r.line}|${r.color_code}|${r.station_name}|${r.order}|" +
        s"${r.train_dir_a.getOrElse("---")}|${r.train_dir_b.getOrElse("---")}|" +
        s"${r.total_turnstile_entries}")
  }

  test("24-tick seeded replay matches the golden dashboard relation") {
    val rows = renderRows()
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      Files.createDirectories(Paths.get(goldenPath).getParent)
      Files.writeString(Paths.get(goldenPath), rows.mkString("\n"))
      info(s"regenerated $goldenPath (${rows.size} rows)")
    } else {
      assert(Files.exists(Paths.get(goldenPath)),
        s"golden fixture missing — run with GRAFT_REGEN_GOLDEN=1 once")
      val golden = Files.readString(Paths.get(goldenPath)).linesIterator.toSeq
      assert(rows.size == golden.size, s"row count ${rows.size} != ${golden.size}")
      rows.zip(golden).zipWithIndex.foreach { case ((got, want), i) =>
        assert(got == want, s"dashboard row $i drifted")
      }
    }
  }
}
