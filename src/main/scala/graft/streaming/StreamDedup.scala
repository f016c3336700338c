package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the streaming arm of [[graft.operators.Dedup]]
  * for continuous ingestion pipelines (an LLM-corpus firehose).
  *
  * State design: dedup state is keyed by the md5 content hash — uniform,
  * shuffle-partitioned, no skew. Unbounded [[dedupExact]] state grows with
  * distinct-document count (the reference's own unbounded-table shape,
  * SURVEY §7.4 risk 5); [[dedupExactWithinWatermark]] bounds it to the
  * watermark horizon, which is the only sane configuration at 100 TB/day.
  */
object StreamDedup {

  /** Keep the first occurrence of each distinct text, forever. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.withColumn("text_hash", md5(col("text")))
      .dropDuplicates("text_hash")

  /** Keep the first occurrence per content hash within the watermark
    * horizon — duplicates separated by more than `horizon` pass through
    * (bounded state, the at-scale trade).
    */
  def dedupExactWithinWatermark(
      docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark("text_hash")
}
