package graft

import org.apache.spark.sql.Row
import graft.operators.Transit
import graft.schemas.Transit._
import graft.sources.TransitData

class TransitOpsSpec extends SparkSpec {
  import spark.implicits._

  test("transformStations: red→blue→green priority, null when no flag") {
    val df = Seq(
      (1, "A", 0, true, true, false),   // red wins over blue
      (2, "B", 1, false, true, true),   // blue wins over green
      (3, "C", 2, false, false, true),  // green
      (4, "D", 3, false, false, false)  // null
    ).toDF("station_id", "station_name", "order", "red", "blue", "green")
    val out = Transit.transformStations(df).orderBy("station_id")
      .as[(Int, String, Int, Option[String])].collect()
    assert(out.map(_._4).toSeq == Seq(Some("red"), Some("blue"), Some("green"), None))
  }

  test("transformStations on the real CTA stations file") {
    val st = TransitData.stations(spark)
    val out = Transit.transformStations(st)
    assert(out.count() == 230)
    // 42 CTA stop rows carry no color flag → null line, the reference's
    // warn-and-null path (faust_stream.py:84)
    assert(out.filter("line is null").count() == 42)
  }

  test("turnstileSummary counts per station with uppercase contract fields") {
    val ev = Seq((100, "S1", "red"), (100, "S1", "red"), (200, "S2", "blue"))
      .toDF("station_id", "station_name", "line")
    val out = Transit.turnstileSummary(ev).orderBy("STATION_ID").collect()
    assert(out.toSeq == Seq(Row(100, 2L), Row(200, 1L)))
  }

  test("latestWeather keeps the newest reading") {
    val w = Seq((1000L, 10.0f, "sunny"), (3000L, -2.5f, "windy"), (2000L, 5.0f, "cloudy"))
      .toDF("timestamp", "temperature", "status")
    val out = Transit.latestWeather(w).collect()
    assert(out.length == 1 && out(0) == Row(-2.5f, "windy", 3000L))
  }

  test("trainPositions: arrival places train, departure clears previous platform") {
    val arrivals = Seq(
      Arrival(1000L, 10, "RL001", "b", "red", "in_service", None, None),
      // RL001 moves 10→20: platform (10,b) must clear, (20,b) must hold it
      Arrival(2000L, 20, "RL001", "b", "red", "in_service", Some(10), Some("b"))
    ).toDF()
    val out = Transit.trainPositions(arrivals)
      .orderBy("station_id").collect()
    assert(out.length == 2)
    val at10 = out(0); val at20 = out(1)
    assert(at10.getAs[Int]("station_id") == 10 && at10.getAs[String]("train_id") == null)
    assert(at20.getAs[Int]("station_id") == 20 && at20.getAs[String]("train_id") == "RL001")
  }

  test("trainPositions: same-timestamp arrive of next train survives the departure") {
    val arrivals = Seq(
      Arrival(1000L, 10, "RL001", "b", "red", "in_service", None, None),
      Arrival(1000L, 20, "RL002", "b", "red", "in_service", None, None),
      // same tick: RL001 leaves 10, RL002 arrives at 10 from 20
      Arrival(2000L, 30, "RL001", "b", "red", "in_service", Some(10), Some("b")),
      Arrival(2000L, 10, "RL002", "b", "red", "in_service", Some(20), Some("b"))
    ).toDF()
    val out = Transit.trainPositions(arrivals)
    val at10 = out.filter("station_id = 10").collect()(0)
    assert(at10.getAs[String]("train_id") == "RL002") // not cleared by the departure
  }

  test("dashboard joins stations, trains, counts and weather ordered by line/order") {
    val stations = Seq(
      (1, "Alpha", 0, "red"), (2, "Beta", 1, "red"), (3, "Gamma", 0, "blue"))
      .toDF("station_id", "station_name", "order", "line")
    val trains = Seq((1, "a", "RL001", "in_service", 1000L))
      .toDF("station_id", "direction", "train_id", "train_status", "updated")
    val counts = Seq((1, 42L), (3, 7L)).toDF("STATION_ID", "COUNT")
    val weather = Seq((23.9f, "partly_cloudy", 5000L))
      .toDF("temperature", "status", "timestamp")
    val out = Transit.dashboard(stations, trains, counts, weather).collect()
    assert(out.map(_.getAs[String]("station_name")).toSeq == Seq("Gamma", "Alpha", "Beta"))
    val alpha = out(1)
    assert(alpha.getAs[String]("train_dir_a") == "RL001")
    assert(alpha.getAs[String]("train_dir_b") == null)
    assert(alpha.getAs[Long]("total_turnstile_entries") == 42L)
    assert(alpha.getAs[Int]("temperature") == 23)
    assert(alpha.getAs[String]("weather_status") == "Partly Cloudy")
    assert(alpha.getAs[String]("color_code") == "#DC143C")
  }

  test("turnstileEntries: floor(rides*ratio/300) clamped at zero") {
    import org.apache.spark.sql.functions._
    val seed = Seq((100, 22811.6), (200, 10.0)).toDF("station_id", "avg_weekday_rides")
    val curve = Seq((8, 0.125), (0, 0.01)).toDF("hour", "ridership_ratio")
    val out = Transit.turnstileEntries(seed, curve, lit(8)).orderBy("station_id").collect()
    assert(out(0) == Row(100, math.floor(22811.6 * 0.125 / 300).toLong))
    assert(out(1) == Row(200, 0L))
  }

  test("sanitizer matches the reference's topic naming") {
    assert(sanitizeName("Harlem/Lake") == "harlem_and_lake")
    assert(sanitizeName("Addison-North Main") == "addison_north_main")
    assert(sanitizeName("King Drive") == "king_drive")
    assert(sanitizeName("O'Hare") == "ohare")
    // column twin agrees with the scala twin on all real station names
    import org.apache.spark.sql.functions._
    val st = TransitData.stations(spark).select(col("station_name")).distinct()
    val both = st.withColumn("c", sanitizeNameCol(col("station_name")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    both.foreach { case (name, viaCol) => assert(viaCol == sanitizeName(name)) }
  }

  test("trainId format zero-pads to 3") {
    import org.apache.spark.sql.functions._
    val df = Seq(("blue", 3), ("red", 123)).toDF("line", "num")
    val out = df.select(trainIdCol(col("line"), col("num"))).as[String].collect()
    assert(out.toSeq == Seq("BL003", "RL123"))
  }
}
