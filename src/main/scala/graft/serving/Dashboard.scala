package graft.serving

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.schemas.Transit._

/** Serving layer (SURVEY.md §3.3): the reference's in-memory materialized
  * views (consumers/models/lines.py, station.py, weather.py) become
  * concurrent maps upserted from `foreachBatch`, plus an HTML renderer with
  * the same shape as templates/status.html.
  *
  * Scale note: these maps hold the SERVING state only — ~230 station rows +
  * 1 weather row — never stream data. All heavy lifting stays in the
  * streaming queries; foreachBatch receives already-aggregated micro-batch
  * deltas (update mode), so upserts are O(changed keys).
  */
final class Dashboard {

  val stations = TrieMap.empty[Int, TransformedStation]
  val platforms = TrieMap.empty[(Int, String), PlatformState]
  val counts = TrieMap.empty[Int, Long]
  @volatile var weather: Option[WeatherReading] = None

  def upsertStations(batch: Dataset[TransformedStation]): Unit =
    batch.collect().foreach(s => stations.put(s.station_id, s))

  def upsertPlatforms(batch: Dataset[PlatformState]): Unit =
    batch.collect().foreach(p => platforms.put((p.station_id, p.direction), p))

  /** Accepts the update-mode (STATION_ID, COUNT) changelog frame. */
  def upsertCounts(batch: DataFrame): Unit =
    batch.collect().foreach(r => counts.put(
      r.getAs[Int]("STATION_ID"), r.getAs[Long]("COUNT")))

  def upsertWeather(batch: Dataset[WeatherReading]): Unit =
    batch.collect().sortBy(_.timestamp).lastOption.foreach { w =>
      if (weather.forall(_.timestamp <= w.timestamp)) weather = Some(w)
    }

  /** J5 + T2 — the dashboard relation, ordered by (line, order)
    * (templates/status.html:29-39).
    */
  def rows: Seq[DashboardRow] =
    stations.values.toSeq
      .filter(_.line.isDefined)
      .sortBy(s => (s.line.get, s.order))
      .map { s =>
        DashboardRow(
          line = s.line.get,
          color_code = LineColors.getOrElse(s.line.get, "#000000"),
          station_name = s.station_name,
          order = s.order,
          train_dir_a = platforms.get((s.station_id, "a")).flatMap(_.train_id),
          train_dir_b = platforms.get((s.station_id, "b")).flatMap(_.train_id),
          total_turnstile_entries = counts.getOrElse(s.station_id, 0L))
      }

  /** HTML render with the reference template's structure
    * (templates/status.html:5,14,29-39): header with title-cased weather,
    * per-line tables, "---" for empty platforms, 10 s meta refresh.
    */
  def renderHtml: String = {
    val w = weather.map(w =>
      f"${w.temperature.toInt}%dºF and ${w.status.replace('_', ' ').split(' ').map(_.capitalize).mkString(" ")}")
      .getOrElse("unknown")
    val body = rows.groupBy(_.line).toSeq.sortBy(_._1).map { case (line, rs) =>
      val trs = rs.map { r =>
        s"<tr><td>${r.station_name}</td><td>${r.train_dir_a.getOrElse("---")}</td>" +
          s"<td>${r.train_dir_b.getOrElse("---")}</td><td>${r.total_turnstile_entries}</td></tr>"
      }.mkString("\n")
      s"""<h2 style="color:${rs.head.color_code}">${line.capitalize} Line</h2>
         |<table><tr><th>Station</th><th>Dir A</th><th>Dir B</th><th>Entries</th></tr>
         |$trs</table>""".stripMargin
    }.mkString("\n")
    s"""<html><head><meta http-equiv="refresh" content="10"><title>Transit Status</title></head>
       |<body><h1>Chicago Transit Status</h1><p>Weather: $w</p>$body</body></html>""".stripMargin
  }
}

object Dashboard {

  /** Minimal HTTP server for the render (S11) — com.sun.net.httpserver, no
    * extra dependency (consumers/server.py:23-39's Tornado analog).
    */
  def serve(dash: Dashboard, port: Int): com.sun.net.httpserver.HttpServer = {
    import com.sun.net.httpserver._
    val server = HttpServer.create(new java.net.InetSocketAddress(port), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val bytes = dash.renderHtml.getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "text/html; charset=utf-8")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    })
    server.setExecutor(null)
    server.start()
    server
  }
}
