package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Encoder
import graft.schemas.Transit._

/** Kafka source/sink constructors (SURVEY.md §2.1 S5–S13).
  *
  * Serialization: the reference's derived topics are JSON already
  * (stations/Faust/KSQL outputs, SURVEY §1.2); its producer topics are Avro
  * with checked-in schemas. This build ships JSON serde end-to-end
  * (`from_json`/`to_json` with the exact StructTypes) — the spark-avro module
  * isn't on this image's classpath; on a cluster with spark-avro, swap
  * `from_json(...)` for `from_avro(col("value"), schemaJson)` at the two
  * marked call sites without touching any downstream operator.
  *
  * These builders compile against spark-sql only (`format("kafka")` resolves
  * the connector at runtime); in this kafka-less test environment the same
  * pipelines are driven through MemoryStream/file sources instead — see
  * TransitStreamsSpec.
  */
object KafkaIO {

  def schemaOf[T: Encoder]: StructType =
    implicitly[Encoder[T]].schema

  /** S7/S8/S9 — subscribe one topic or a pattern (the ~91 arrival topics
    * collapse into one `subscribePattern` source — consumers/server.py:76-79).
    * Kafka partitions map 1:1 to Spark input partitions; at scale, partition
    * the hot topics, not the code.
    */
  def readTopic(
      spark: SparkSession, bootstrap: String,
      subscribe: Either[String, String],
      valueSchema: StructType,
      startingOffsets: String = "earliest"): DataFrame = {
    val base = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("startingOffsets", startingOffsets)
    val src = subscribe match {
      case Left(topic)    => base.option("subscribe", topic)
      case Right(pattern) => base.option("subscribePattern", pattern)
    }
    decodeJsonValue(src.load(), valueSchema)
  }

  /** Decode a Kafka-shaped frame (binary key/value + topic): JSON value to
    * typed columns, epoch-millis key to `key_timestamp`. Malformed payloads
    * decode to all-null columns (PERMISSIVE) — the reference logs and skips
    * them (consumers/models/lines.py:33-39); drop with
    * [[dropUndecodable]]. Factored from the streaming reader so serde
    * behavior is batch-testable without a broker.
    */
  def decodeJsonValue(df: DataFrame, valueSchema: StructType): DataFrame =
    df.select(
      // [avro swap site] from_json → from_avro for Avro-carrying topics
      from_json(col("value").cast("string"), valueSchema).as("v"),
      get_json_object(col("key").cast("string"), "$.timestamp")
        .cast("long").as("key_timestamp"),
      col("topic"))
      .select(col("v.*"), col("key_timestamp"), col("topic"))

  /** The reference's skip-unroutable guard: require the given fields. */
  def dropUndecodable(df: DataFrame, requiredField: String): DataFrame =
    df.filter(col(requiredField).isNotNull)

  /** S5/S12/S13 — changelog sink: key by `keyCol`, JSON-encode all value
    * columns (update-mode changelog like Faust's table topic /
    * KSQL's TURNSTILE_SUMMARY).
    */
  def writeTopic(
      df: DataFrame, bootstrap: String, topic: String,
      keyCol: String, checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val payload = df.select(
      col(keyCol).cast("string").as("key"),
      // [avro swap site] to_json → to_avro on Avro clusters
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
    payload.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
  }

  /** S10 — topic-existence gate (consumers/topic_check.py:4-8): the driver
    * checks its subscriptions resolve before starting queries. Without
    * kafka-clients on the classpath this degrades to a no-op that reports
    * unverifiable; with it, listTopics via reflection.
    */
  def topicsExist(bootstrap: String, topics: Seq[String]): Boolean =
    try {
      val cls = Class.forName("org.apache.kafka.clients.admin.AdminClient")
      val props = new java.util.Properties()
      props.put("bootstrap.servers", bootstrap)
      val client = cls.getMethod("create", classOf[java.util.Properties])
        .invoke(null, props)
      try {
        val names = client.getClass.getMethod("listTopics").invoke(client)
        val future = names.getClass.getMethod("names").invoke(names)
        val set = future.getClass.getMethod("get").invoke(future)
          .asInstanceOf[java.util.Set[String]]
        topics.forall(set.contains)
      } finally client.getClass.getMethod("close").invoke(client)
    } catch { case _: ClassNotFoundException => true /* unverifiable: pass */ }
}
