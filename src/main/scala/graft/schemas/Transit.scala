package graft.schemas

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Schemas and constants for the CTA transit domain — the reference's data
  * model re-expressed as case classes / Encoders (SURVEY.md §1, FIXTURES.md).
  *
  * Sources cited from /root/reference:
  *  - arrival value schema: producers/models/schemas/arrival_value.json
  *  - turnstile value schema: producers/models/schemas/turnstile_value.json
  *  - weather value schema: producers/models/schemas/weather_value.json
  *  - stations DDL: load_stations.sql:1-12
  *  - TransformedStation: consumers/faust_stream.py:30-35
  *  - TURNSTILE_SUMMARY uppercase fields: consumers/ksql.py:35-39
  */
object Transit {

  /** Raw station dimension row (load_stations.sql:1-12). */
  case class StationRecord(
      stop_id: Int,
      direction_id: String,
      stop_name: String,
      station_name: String,
      station_descriptive_name: String,
      station_id: Int,
      order: Int,
      red: Boolean,
      blue: Boolean,
      green: Boolean)

  /** Faust Q1 output (consumers/faust_stream.py:30-35); `line` nullable when
    * no color flag is set (faust_stream.py:77-84).
    */
  case class TransformedStation(
      station_id: Int, station_name: String, order: Int, line: Option[String])

  /** Arrival event (producers/models/schemas/arrival_value.json + key
    * timestamp epoch millis, producer.py:93-95).
    */
  case class Arrival(
      timestamp: Long,
      station_id: Int,
      train_id: String,
      direction: String,
      line: String,
      train_status: String,
      prev_station_id: Option[Int],
      prev_direction: Option[String])

  /** Turnstile event — one message per rider entry (turnstile.py:47-59). */
  case class TurnstileEvent(
      timestamp: Long, station_id: Int, station_name: String, line: String)

  /** KSQL Q2 output; uppercase field names are part of the observable contract
    * (consumers/models/line.py:70-77).
    */
  case class TurnstileSummary(STATION_ID: Int, COUNT: Long)

  /** Weather reading (weather_value.json). */
  case class WeatherReading(timestamp: Long, temperature: Float, status: String)

  /** Per-(station, direction) platform state maintained by the train tracker
    * (consumers/models/station.py:26-39).
    */
  case class PlatformState(
      station_id: Int, direction: String,
      train_id: Option[String], train_status: Option[String], updated: Long)

  /** Dashboard relation (templates/status.html:29-39; FIXTURES.md §4). */
  case class DashboardRow(
      line: String, color_code: String, station_name: String, order: Int,
      train_dir_a: Option[String], train_dir_b: Option[String],
      total_turnstile_entries: Long)

  // Topic names (producers/models/station.py:22-30, turnstile.py:13,
  // weather.py:35, connector.py:41-44, faust_stream.py:46-48, ksql.py:35-39)
  val ArrivalTopicPrefix = "org.chicago.cta.station.arrivals."
  val ArrivalTopicPattern = "org\\.chicago\\.cta\\.station\\.arrivals\\..*"
  val TurnstileTopic = "org.chicago.cta.turnstile.v1"
  val WeatherTopic = "org.chicago.cta.weather.v1"
  val StationsTopic = "org.chicago.cta.stations"
  val StationsTableTopic = "org.chicago.cta.stations.table.v1"
  val TurnstileSummaryTopic = "TURNSTILE_SUMMARY"

  // Enum domains (train.py:12; weather.py:21-23; line color codes line.py:17-22)
  val TrainStatuses = Seq("out_of_service", "in_service", "broken_down")
  val WeatherStatuses = Seq("sunny", "partly_cloudy", "cloudy", "windy", "precipitation")
  val LineColors = Map("blue" -> "#1E90FF", "red" -> "#DC143C", "green" -> "#32CD32")

  /** F1 — station-name → topic-suffix sanitizer (station.py:22-28): lower,
    * "/"→"_and_", " "→"_", "-"→"_", "'"→"". Column form keeps the whole
    * pipeline codegen'd; the Scala twin serves driver-side topic admin.
    */
  def sanitizeNameCol(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(c), "/", "_and_"),
          " ", "_"),
        "-", "_"),
      "'", "")

  def sanitizeName(s: String): String =
    s.toLowerCase.replace("/", "_and_").replace(" ", "_")
      .replace("-", "_").replace("'", "")

  /** F2 — train id format `f"{color[0].upper()}L{num:03d}"` (line.py:55-57). */
  def trainIdCol(lineColor: Column, num: Column): Column =
    concat(upper(substring(lineColor, 1, 1)), lit("L"), lpad(num.cast("string"), 3, "0"))

  /** F12 — checked-in Avro schemas (no registry dependency, zero-egress;
    * SURVEY §1.3). Byte-compatible with the reference's producer contracts
    * (producers/models/schemas/ arrival_value, turnstile_value,
    * weather_value, arrival_key .json). On a cluster with spark-avro these
    * feed `from_avro`/`to_avro` at the KafkaIO swap sites; the key schema is
    * the shared `{timestamp}` record (producer.py:93-95).
    */
  val AvroKeySchema: String =
    """{"namespace":"org.chicago.cta","type":"record","name":"arrival.key","fields":[{"name":"timestamp","type":"long"}]}"""
  val ArrivalAvroSchema: String =
    """{"namespace":"org.chicago.cta","type":"record","name":"arrival.value","fields":[
      |{"name":"station_id","type":"int"},
      |{"name":"train_id","type":"string"},
      |{"name":"direction","type":"string"},
      |{"name":"line","type":"string"},
      |{"name":"train_status","type":"string"},
      |{"name":"prev_station_id","type":["int","null"]},
      |{"name":"prev_direction","type":["string","null"]}]}""".stripMargin
  val TurnstileAvroSchema: String =
    """{"namespace":"org.chicago.cta","type":"record","name":"turnstile.value","fields":[
      |{"name":"station_id","type":"int"},
      |{"name":"station_name","type":"string"},
      |{"name":"line","type":"string"}]}""".stripMargin
  val WeatherAvroSchema: String =
    """{"namespace":"org.chicago.cta","type":"record","name":"weather.value","fields":[
      |{"name":"temperature","type":"float"},
      |{"name":"status","type":"string"}]}""".stripMargin
}
