package graft.sim

import scala.collection.mutable
import scala.util.Random
import graft.schemas.Transit._

/** Deterministic transit-event simulator (SURVEY.md §3.1) — test-fixture
  * generation, deliberately driver-side: train movement is sequential global
  * state, not a distributed query (SURVEY §3.1 "Spark rebuild shape").
  *
  * Reproduces the reference's observable event model
  * (producers/simulation.py:58-76, producers/models/line.py:82-136):
  *  - per line, `numTrains` trains walk a back-and-forth track: direction "b"
  *    = ascending station order, "a" = descending, flipping at the ends
  *    (line.py:171-186);
  *  - each tick every train advances one station and emits one Arrival with
  *    the retraction keys (prev_station_id, prev_direction); the initial
  *    placement emits null prevs (line.py:62-64);
  *  - turnstile events per station per tick:
  *    max(0, floor(rides*ratio/300) + U[-5,4]) (turnstile_hardware.py:46-66,
  *    bug-compatible steps=300 per SURVEY §7.4);
  *  - one weather reading per simulated hour: triangular temperature drift,
  *    uniform status (weather.py:57-65).
  * Seeded `Random` everywhere → identical fixtures per run.
  */
final class Simulator(
    stationsByLine: Map[String, Seq[(Int, String, Int)]], // line -> (station_id, name, order) ascending
    ridership: Map[Int, Double],                          // station_id -> avg_weekday_rides
    hourlyRatio: Map[Int, Double],                        // hour -> ridership_ratio
    numTrains: Int = 10,
    seed: Long = 42L,
    startMillis: Long = 1704067200000L, // 2024-01-01 00:00 UTC
    tickMillis: Long = 5 * 60 * 1000L) {

  private val rng = new Random(seed)

  private case class TrainPos(trainId: String, var idx: Int, var dirB: Boolean)

  private val tracks: Map[String, Seq[(Int, String, Int)]] = stationsByLine
  private val trains: Map[String, mutable.Buffer[TrainPos]] = stationsByLine.map {
    case (line, stations) =>
      val n = stations.size
      val spacing = math.max(1, n / numTrains)
      line -> mutable.Buffer.tabulate(numTrains) { i =>
        TrainPos(trainId(line, i), (i * spacing) % n, dirB = true)
      }
  }

  private def trainId(line: String, num: Int): String =
    s"${line.head.toUpper}L${"%03d".format(num)}"

  private var tick = 0L
  private var placed = false

  def currentMillis: Long = startMillis + tick * tickMillis
  private def simHour: Int = ((currentMillis / 3600000L) % 24L).toInt

  /** Advance one tick; returns the arrivals it produced. */
  def stepArrivals(): Seq[Arrival] = {
    val ts = currentMillis
    val out = mutable.Buffer.empty[Arrival]
    for ((line, track) <- tracks) {
      val n = track.size
      for (t <- trains(line)) {
        if (!placed) {
          val (sid, _, _) = track(t.idx)
          out += Arrival(ts, sid, t.trainId, if (t.dirB) "b" else "a", line,
            "in_service", None, None)
        } else {
          val (prevSid, _, _) = track(t.idx)
          val prevDir = if (t.dirB) "b" else "a"
          // one-station step with end-of-line flip (line.py:171-186)
          if (t.dirB) { if (t.idx + 1 < n) t.idx += 1 else { t.dirB = false; t.idx -= 1 } }
          else { if (t.idx - 1 >= 0) t.idx -= 1 else { t.dirB = true; t.idx += 1 } }
          val (sid, _, _) = track(t.idx)
          out += Arrival(ts, sid, t.trainId, if (t.dirB) "b" else "a", line,
            "in_service", Some(prevSid), Some(prevDir))
        }
      }
    }
    placed = true
    tick += 1
    out.toSeq
  }

  /** Turnstile events for the CURRENT tick (call before stepArrivals if exact
    * co-timestamps matter; the reference runs turnstiles then trains per tick,
    * line.py:69-72).
    */
  def stepTurnstiles(): Seq[TurnstileEvent] = {
    val ts = currentMillis
    val ratio = hourlyRatio.getOrElse(simHour, 0.01)
    val out = mutable.Buffer.empty[TurnstileEvent]
    for ((line, track) <- tracks; (sid, name, _) <- track) {
      val rides = ridership.getOrElse(sid, 5000.0)
      val noise = rng.between(-5, 5) // U[-5,4] like random.choice(range(-5,5))
      val n = math.max(0L, math.floor(rides * ratio / 300.0).toLong + noise)
      var i = 0L
      while (i < n) { out += TurnstileEvent(ts, sid, name, line); i += 1 }
    }
    out.toSeq
  }

  private var temperature: Double = 4.0 // winter start, like month-based seed

  /** One weather reading per simulated hour (simulation.py:72-73). */
  def maybeWeather(): Option[WeatherReading] = {
    if (currentMillis % 3600000L != 0L) return None
    // triangular(-10, 10, 0) drift via inverse CDF (weather.py:57-65)
    val u = rng.nextDouble()
    val drift = if (u < 0.5) -10 + math.sqrt(u * 200) else 10 - math.sqrt((1 - u) * 200)
    temperature = math.max(-30.0, math.min(40.0, temperature + drift * 0.1))
    val status = WeatherStatuses(rng.nextInt(WeatherStatuses.size))
    Some(WeatherReading(currentMillis, temperature.toFloat, status))
  }

  /** Run `ticks` ticks, returning all emitted events. */
  def run(ticks: Int): (Seq[Arrival], Seq[TurnstileEvent], Seq[WeatherReading]) = {
    val as = mutable.Buffer.empty[Arrival]
    val ts = mutable.Buffer.empty[TurnstileEvent]
    val ws = mutable.Buffer.empty[WeatherReading]
    var i = 0
    while (i < ticks) {
      ws ++= maybeWeather()
      ts ++= stepTurnstiles()
      as ++= stepArrivals()
      i += 1
    }
    (as.toSeq, ts.toSeq, ws.toSeq)
  }
}

object Simulator {
  /** Build from the stations dimension frame (graft.sources.TransitData). */
  def fromStations(
      stations: org.apache.spark.sql.DataFrame,
      ridership: Map[Int, Double] = Map.empty,
      hourlyRatio: Map[Int, Double] = Map.empty,
      numTrains: Int = 10, seed: Long = 42L): Simulator = {
    import org.apache.spark.sql.functions._
    val byLine = Seq("red", "blue", "green").map { line =>
      val rows = stations.filter(col(line))
        .select(col("station_id"), col("station_name"), col("order"))
        .dropDuplicates("station_id")
        .orderBy(col("order"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
        .toSeq
      line -> rows
    }.filter(_._2.nonEmpty).toMap
    new Simulator(byLine, ridership, hourlyRatio, numTrains, seed)
  }
}
