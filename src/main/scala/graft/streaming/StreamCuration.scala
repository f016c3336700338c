package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions.tokens
import graft.operators.Curation

/** Streaming arm of [[graft.operators.Curation]] — the resample and packing
  * stages for a continuously-ingested corpus, closing the batch/stream gap
  * the transit operators already have (IngestGate covers admission; these
  * cover what happens to admitted docs).
  *
  * Split of responsibilities (the lambda shape): the domain MIXTURE is a
  * whole-corpus aggregate, so the stream takes it as a static snapshot owned
  * and periodically refreshed by the batch job ([[graft.operators
  * .TextAnalysis.domainMixture]]); the per-document DRAW and the per-source
  * packing cumsum are incremental and run here.
  */
object StreamCuration {

  /** Streaming domain-rebalance sampling: the same replayable md5-bucket
    * draw as [[Curation.rebalanceSample]] (shared code path —
    * `Curation.rebalanceDraw`), against a FIXED (source, weight) mixture
    * snapshot. The draw is a pure row-local function of (doc_id, source) ×
    * a broadcast of the tiny weight table — append-safe, zero streaming
    * state, and any doc draws identically in batch replay and on the
    * stream.
    */
  def rebalanceSample(
      docs: DataFrame, mixture: DataFrame, baseRate: Double = 0.5): DataFrame =
    Curation.rebalanceDraw(
      docs, mixture.select(col("source"), col("weight")), baseRate)

  /** Stateful streaming sequence packing: the per-source cumulative token
    * offset of [[Curation.packSequences]] carried across micro-batches in
    * one Long state cell per source (flatMapGroupsWithState — state size is
    * 8 bytes × source count, nothing to watermark).
    *
    * Ordering contract: packing is defined over (source, doc_id) order, so
    * the stream assumes per-source APPEND-ORDERED arrival — every doc_id in
    * a later micro-batch exceeds those already packed for that source (the
    * lake-ingest contract; out-of-order arrivals would need the batch
    * repack as ground truth). Within a micro-batch the group sorts by
    * doc_id, so intra-batch arrival order is free. Each group materializes
    * one micro-batch × one source of (id, n_tokens) pairs — bounded by the
    * micro-batch, not the corpus.
    */
  def packSequences(docs: DataFrame, budget: Long = 2048): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long, Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (source, rows, state) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toArray.sortBy(_._2).map { case (_, id, n) =>
            val start = cum
            cum += n
            // integer DIV/mod on non-negative longs — bit-identical to the
            // batch window's `start DIV budget` / `start % budget`
            (source, id, n, cum, start / budget, start % budget)
          }
          state.update(cum)
          out.iterator
      }
      .toDF("source", "doc_id", "n_tokens", "cum_tokens", "seq_id", "seq_offset")
  }
}
