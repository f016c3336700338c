package graft

import org.apache.spark.sql.Encoders
import graft.schemas.Transit._
import graft.sources.KafkaIO

class KafkaIOSpec extends SparkSpec {
  import spark.implicits._

  private def kafkaShaped(rows: (String, String, String)*) =
    rows.toDF("key", "value", "topic")
      .selectExpr("cast(key as binary) as key", "cast(value as binary) as value", "topic")

  test("decodeJsonValue: well-formed payloads decode to typed columns") {
    val df = kafkaShaped((
      """{"timestamp": 1700000000123}""",
      """{"station_id": 40020, "station_name": "Harlem/Lake", "line": "green"}""",
      TurnstileTopic))
    val valueSchema = Encoders.product[TurnstileEvent].schema
      .filter(_.name != "timestamp")
    val out = KafkaIO.decodeJsonValue(df,
      org.apache.spark.sql.types.StructType(valueSchema)).collect()(0)
    assert(out.getAs[Int]("station_id") == 40020)
    assert(out.getAs[String]("station_name") == "Harlem/Lake")
    assert(out.getAs[Long]("key_timestamp") == 1700000000123L)
    assert(out.getAs[String]("topic") == TurnstileTopic)
  }

  test("decodeJsonValue: malformed payloads null out and are droppable") {
    val valueSchema = org.apache.spark.sql.types.StructType(
      Encoders.product[TurnstileEvent].schema.filter(_.name != "timestamp"))
    val df = kafkaShaped(
      ("""{"timestamp": 1}""", """{"station_id": 1, "station_name": "A", "line": "red"}""", "t"),
      ("""{"timestamp": 2}""", """not json at all""", "t"),
      ("""garbage-key""", """{"station_id": 2, "station_name": "B", "line": "blue"}""", "t"))
    val decoded = KafkaIO.decodeJsonValue(df, valueSchema)
    assert(decoded.count() == 3) // PERMISSIVE: malformed rows survive as nulls
    val clean = KafkaIO.dropUndecodable(decoded, "station_id").collect()
    assert(clean.length == 2)
    // bad key but good value: key_timestamp null, payload intact
    assert(clean.exists(r => r.isNullAt(r.fieldIndex("key_timestamp"))
      && r.getAs[Int]("station_id") == 2))
  }

  test("serde round-trip: writeTopic's payload shape decodes back to the original rows") {
    import org.apache.spark.sql.functions._
    val summary = Seq((40020, 123L), (40380, 7L)).toDF("STATION_ID", "COUNT")
    // the exact payload projection writeTopic sends to Kafka
    val wire = summary.select(
      col("STATION_ID").cast("string").as("key"),
      to_json(struct(summary.columns.map(col): _*)).as("value"))
    // ...reshaped as the broker would hand it back to readTopic
    val kafkaShape = wire.select(
      concat(lit("""{"timestamp": 1, "key": """"), col("key"), lit(""""}""")).cast("binary").as("key"),
      col("value").cast("binary").as("value"),
      lit(TurnstileSummaryTopic).as("topic"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("STATION_ID", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("COUNT", org.apache.spark.sql.types.LongType)))
    val back = KafkaIO.decodeJsonValue(kafkaShape, schema)
      .select(col("STATION_ID"), col("COUNT"))
    assert(back.collect().toSet == summary.collect().toSet)
  }

  test("topicsExist degrades to pass without kafka-clients on the classpath") {
    assert(KafkaIO.topicsExist("localhost:9092", Seq(TurnstileTopic)))
  }
}
