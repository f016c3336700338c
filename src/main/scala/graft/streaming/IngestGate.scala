package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Streaming admission gate for a training-data lake: the front door that
  * scores every incoming document BEFORE it lands in the corpus, composing
  * the batch text-pipeline semantics (TextAnalysis/Dedup) into shapes legal
  * under streaming's incremental planner.
  *
  * Everything is row-local or stream-static:
  *  - length + repetition checks are per-row array math (no streaming agg,
  *    so no output-mode constraint; in batch the same stats use the
  *    explode+agg form — per-row HOFs are right here because each doc is
  *    scored alone and tight bounds beat throughput on the ingest edge);
  *  - decontamination is a stream-static broadcast of the benchmark shingle
  *    vocabulary (eval suites are small; `arrays_overlap` against the
  *    broadcast set is one codegen'd check per row);
  *  - cross-batch exact dedup uses dropDuplicatesWithinWatermark on the
  *    text digest, so dedup state is BOUNDED by the watermark horizon — the
  *    unbounded dropDuplicates state would be the 100 TB failure mode.
  *
  * Expected input columns: doc_id, text, source, timestamp (epoch millis).
  */
object IngestGate {

  /** Per-document verdict stream (append-safe, one row per input doc):
    * `reason` ∈ ok | too_short | repetitive | contaminated | low_quality,
    * first failing gate wins in that order.
    *
    * `lmModel` (optional): the one-row token→logp frame from
    * [[graft.operators.TextAnalysis.lmModel]], fit in batch on a trusted
    * reference corpus. When present, each doc is scored row-locally —
    * avg NLL via a left fold over its token array against the broadcast
    * map — and docs above `maxAvgNll` fail as `low_quality`. No streaming
    * aggregation, so the gate stays append-safe; the fold order is the
    * token order, which DuckDB's list_reduce reproduces exactly.
    */
  def audit(
      docs: DataFrame, benchShingles: DataFrame, n: Int = 4,
      minTokens: Int = 5, maxDupTrigramFrac: Double = 0.15,
      cacheVocab: Boolean = false,
      lmModel: Option[DataFrame] = None, maxAvgNll: Double = 10.0): DataFrame = {
    val toks = tokens(col("text"))
    val tri = shingles(toks, 3)
    val dupTri = when(size(tri) > lit(0),
      lit(1.0) - size(array_distinct(tri)).cast("double") / size(tri).cast("double"))
      .otherwise(lit(0.0))
    // one-row static frame carrying the whole benchmark vocabulary; the
    // stream side sees it as a broadcast nested-loop of exactly one row.
    // cacheVocab (set by admit): the STATIC side of a stream-static join is
    // re-executed every micro-batch — cached, batches re-broadcast one row.
    // The cache entry lives as long as the streaming query needs it; batch
    // callers leave it off (one-shot execution, nothing to amortize, and a
    // CacheManager entry per caller plan would outlive the job)
    val vocabAgg = benchShingles.agg(collect_set(col("s")).as("bench_vocab"))
    val vocab = if (cacheVocab) vocabAgg.cache() else vocabAgg
    val base = docs
      .withColumn("n_tokens", size(toks))
      .withColumn("dup_trigram_frac", round(dupTri, 6))
      .crossJoin(broadcast(vocab))
    val withLm = lmModel.fold(base.withColumn("avg_nll", lit(null).cast("double"))) { m =>
      val mdl = if (cacheVocab) m.cache() else m
      base
        .crossJoin(broadcast(mdl))
        .withColumn("avg_nll",
          when(col("n_tokens") > 0, round(
            -aggregate(toks, lit(0.0), (acc, t) =>
              acc + coalesce(element_at(col("lm_map"), t), col("oov_logp")))
              / col("n_tokens").cast("double"), 6))
            .otherwise(lit(0.0)))
        .drop("lm_map", "oov_logp")
    }
    withLm
      .withColumn("reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("dup_trigram_frac") > maxDupTrigramFrac, "repetitive")
          .when(arrays_overlap(
            array_distinct(shingles(toks, n)), col("bench_vocab")), "contaminated")
          .when(col("avg_nll") > maxAvgNll, "low_quality")
          .otherwise("ok"))
      .drop("bench_vocab")
  }

  /** Admitted-document stream: audit-passing docs, exact-deduped across
    * micro-batches with watermark-bounded state. A duplicate arriving after
    * the watermark horizon is re-admitted — the documented trade that keeps
    * dedup state finite; the batch compaction pass (Dedup.dedupKeepBest)
    * remains the lake's end-of-day ground truth.
    */
  def admit(
      docs: DataFrame, benchShingles: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    audit(docs, benchShingles, cacheVocab = true)
      .filter(col("reason") === "ok")
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("text_hash")
      .select(col("doc_id"), col("text"), col("source"), col("event_time"))
}
