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

  /** Semantic novelty gate on an embedding stream — the embedding-space
    * twin of `IngestGate.admitNovel`: the corpus IVF novelty index is fit
    * and packed in BATCH ([[graft.operators.Dedup.buildSemanticIndex]] —
    * the fit-in-batch/probe-on-stream split of `Embeddings.assignStream`),
    * then every arriving vector probes its own cell row-locally and is
    * admitted only when NO corpus vector sits at rounded cosine ≥
    * `threshold` there. Stateless end to end (kernel assign → stream-static
    * broadcast join → row-local fold), so the gate is append-safe and holds
    * no streaming state at any corpus size.
    *
    * The packed cells are cached: the static side of a stream-static join
    * re-executes every micro-batch, and the index build (k-means fit +
    * window + pack) is exactly the work the cache amortizes. At lake scale
    * the cached frame is the served index artifact — refresh it on corpus
    * compaction (SCALE.md "centroid staleness" contract).
    */
  def admitNovelSemantic(
      stream: DataFrame, corpus: DataFrame, threshold: Double = 0.45,
      k: Int = 8, iters: Int = 2, cellCap: Int = 4096): DataFrame = {
    val idx = graft.operators.Dedup.buildSemanticIndex(corpus, k, iters, cellCap)
    admitNovelSemantic(stream, idx.copy(cells = idx.cells.cache()), threshold)
  }

  /** [[admitNovelSemantic]] against a PRE-BUILT (and typically pre-cached)
    * index — the production shape: the index artifact is refreshed on
    * corpus compaction by a batch job; the always-on gate query only
    * probes it.
    */
  def admitNovelSemantic(
      stream: DataFrame, index: graft.operators.Dedup.SemanticIndex,
      threshold: Double): DataFrame =
    graft.operators.Dedup.semanticNoveltyProbe(stream, index, threshold)
      .filter(col("reason") === "ok")
      .select(col("vec_id"), col("cell"), col("max_cos"))

  /** [[admitNovelSemantic]] served from the PQ-COMPRESSED index
    * ([[graft.operators.Pq.buildPqSemanticIndex]]): same stateless
    * append-safe shape — kernel assign + LUT build, stream-static join,
    * fused `cell_max_adc` loop — with 32× less broadcast payload and
    * m integer adds per member instead of a dim-float cosine. The gate's
    * max-cos becomes the ADC approximation; the recall audit measures
    * that gap at every index refresh (SCALE.md centroid-staleness
    * contract).
    */
  def admitNovelSemanticPq(
      stream: DataFrame, corpus: DataFrame, threshold: Double = 0.45,
      k: Int = 8, iters: Int = 2, cellCap: Int = 4096): DataFrame = {
    val idx = graft.operators.Pq.buildPqSemanticIndex(corpus, k, iters, cellCap)
    admitNovelSemanticPq(stream, idx.copy(cells = idx.cells.cache()), threshold)
  }

  /** [[admitNovelSemanticPq]] against a pre-built (typically pre-cached)
    * compressed index — the production refresh-on-compaction shape.
    */
  def admitNovelSemanticPq(
      stream: DataFrame, index: graft.operators.Pq.PqSemanticIndex,
      threshold: Double): DataFrame =
    graft.operators.Pq.pqNoveltyProbe(stream, index, threshold)
      .filter(col("reason") === "ok")
      .select(col("vec_id"), col("cell"), col("max_cos"))
}
