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
    * `reason` ∈ ok | too_short | repetitive | contaminated | low_quality |
    * classifier_reject | dsir_reject, first failing gate wins in that order.
    *
    * `lmModel` (optional): the one-row token→logp frame from
    * [[graft.operators.TextAnalysis.lmModel]], fit in batch on a trusted
    * reference corpus. When present, each doc is scored row-locally —
    * avg NLL via a left fold over its token array against the broadcast
    * map — and docs above `maxAvgNll` fail as `low_quality`. No streaming
    * aggregation, so the gate stays append-safe; the fold order is the
    * token order, which DuckDB's list_reduce reproduces exactly.
    */
  /** `classifier` (optional): the one-row (clf_buckets, clf_bias) frame from
    * [[graft.operators.TextAnalysis.classifierModel]], fit in batch on a
    * labeled seed — model-based quality filtering served on the stream.
    * Each doc's logit is a row-local double fold over its token array
    * (unseen tokens add 0) plus the bias, rounded to 6 dp; docs whose logit
    * is at or below `minLogit` fail as `classifier_reject` — the SAME
    * open/closed boundary as [[graft.operators.TextAnalysis.classifierScore]]
    * (keep ⇔ logit STRICTLY above the threshold), so the gate admits exactly
    * the set the batch scorer would keep.
    */
  /** `dsir` (optional): the one-row dense ratio array from
    * [[graft.operators.Dsir.dsirServeModel]], fit in batch against a target
    * domain — importance-weight selection served on the stream. Each doc's
    * logw is a row-local fold over its unigram+bigram features (O(1)
    * element_at per feature — the array is dense, no OOV branch), rounded
    * to 6 dp; docs strictly below `minLogw` fail as `dsir_reject` — the
    * SAME open/closed boundary as [[graft.operators.Dsir.dsirWeights]]
    * (keep ⇔ logw ≥ τ), so the gate admits exactly the set the batch
    * selector keeps.
    */
  def audit(
      docs: DataFrame, benchShingles: DataFrame, n: Int = 4,
      minTokens: Int = 5, maxDupTrigramFrac: Double = 0.15,
      cacheVocab: Boolean = false,
      lmModel: Option[DataFrame] = None, maxAvgNll: Double = 10.0,
      classifier: Option[DataFrame] = None, minLogit: Double = 0.0,
      dsir: Option[DataFrame] = None, minLogw: Double = 0.0): DataFrame = {
    // the token array and trigram list are staged as REAL columns, not
    // shared Column expressions: an expression reused across projections is
    // re-inlined by CollapseProject into every consumer, so the previous
    // form re-evaluated split(text) ~7× and the trigram transform 3× per
    // row (n_tokens, dup-frac's three references, contamination shingles,
    // LM fold). Multi-referenced NON-CHEAP aliases survive CollapseProject
    // (SPARK-36718, collapseProjectAlwaysInline=false default), so each now
    // evaluates exactly once per row — measured ~2.5× docs/s on the ingest
    // StreamBench at identical audit output
    val staged = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("tri", shingles(col("toks"), 3))
    // one-row static frame carrying the whole benchmark vocabulary; the
    // stream side sees it as a broadcast nested-loop of exactly one row.
    // cacheVocab (set by admit): the STATIC side of a stream-static join is
    // re-executed every micro-batch — cached, batches re-broadcast one row.
    // The cache entry lives as long as the streaming query needs it; batch
    // callers leave it off (one-shot execution, nothing to amortize, and a
    // CacheManager entry per caller plan would outlive the job)
    val vocabAgg = benchShingles.agg(collect_set(col("s")).as("bench_vocab"))
    val vocab = if (cacheVocab) vocabAgg.cache() else vocabAgg
    val base = staged
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("dup_trigram_frac", round(
        when(size(col("tri")) > lit(0),
          lit(1.0) - size(array_distinct(col("tri"))).cast("double") /
            size(col("tri")).cast("double"))
          .otherwise(lit(0.0)), 6))
      .crossJoin(broadcast(vocab))
    val withLm = lmModel.fold(base.withColumn("avg_nll", lit(null).cast("double"))) { m =>
      val mdl = if (cacheVocab) m.cache() else m
      // bucket-array probe (see lmModel's layout note): O(1) array slot,
      // O(vocab/buckets) residual map scan per token
      base
        .crossJoin(broadcast(mdl))
        .withColumn("avg_nll",
          when(col("n_tokens") > 0, round(
            -aggregate(col("toks"), lit(0.0), (acc, t) =>
              acc + coalesce(
                element_at(
                  element_at(col("lm_buckets"),
                    (pmod(hash(t), size(col("lm_buckets"))) + 1).cast("int")),
                  t),
                col("oov_logp")))
              / col("n_tokens").cast("double"), 6))
            .otherwise(lit(0.0)))
        .drop("lm_buckets", "oov_logp")
    }
    val withClf = classifier.fold(withLm.withColumn("logit", lit(null).cast("double"))) { m =>
      val mdl = if (cacheVocab) m.cache() else m
      // bucket-array probe: element_at on the ARRAY is O(1), the residual
      // map scan is O(vocab/buckets) — see classifierModel's layout note
      withLm
        .crossJoin(broadcast(mdl))
        .withColumn("logit", round(
          col("clf_bias") + aggregate(col("toks"), lit(0.0), (acc, t) =>
            acc + coalesce(
              element_at(
                element_at(col("clf_buckets"),
                  (pmod(hash(t), size(col("clf_buckets"))) + 1).cast("int")),
                t),
              lit(0.0))), 6))
        .drop("clf_buckets", "clf_bias")
    }
    val withDsir = dsir.fold(withClf.withColumn("dsir_logw", lit(null).cast("double"))) { m =>
      val mdl = if (cacheVocab) m.cache() else m
      // dense-array probe: element_at by md5 bucket slot is O(1), no
      // residual scan and no OOV branch (every bucket carries a ratio)
      withClf
        .crossJoin(broadcast(mdl))
        .withColumn("dsir_logw", round(
          aggregate(
            concat(col("toks"), shingles(col("toks"), 2)),
            lit(0.0),
            (acc, f) => acc + element_at(col("dsir_ratios"),
              graft.operators.Dsir.featureSlot(f, size(col("dsir_ratios"))))), 6))
        .drop("dsir_ratios")
    }
    withDsir
      .withColumn("reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("dup_trigram_frac") > maxDupTrigramFrac, "repetitive")
          .when(arrays_overlap(
            array_distinct(shingles(col("toks"), n)), col("bench_vocab")), "contaminated")
          .when(col("avg_nll") > maxAvgNll, "low_quality")
          .when(col("logit") <= minLogit, "classifier_reject")
          .when(col("dsir_logw") < minLogw, "dsir_reject")
          .otherwise("ok"))
      .drop("bench_vocab", "toks", "tri")
  }

  /** Admitted-document stream: audit-passing docs, exact-deduped across
    * micro-batches with watermark-bounded state. A duplicate arriving after
    * the watermark horizon is re-admitted — the documented trade that keeps
    * dedup state finite; the batch compaction pass (Dedup.dedupKeepBest)
    * remains the lake's end-of-day ground truth.
    *
    * The dedup runs BEFORE the audit. Legal because every audit gate is a
    * pure function of `text` (token/shingle/NLL math — never doc_id, source
    * or timestamp), so all rows sharing a text share a verdict and dropping
    * duplicates first provably changes nothing about the admitted set: the
    * survivor per text_hash is the same first-arriving row either way.
    * It is also the throughput order: the dedup's state shuffle fans the
    * stream out to `spark.sql.shuffle.partitions`, so the HOF-heavy scoring
    * runs at full parallelism instead of the micro-batch's source-file
    * partition count (2 small files → 2 of 32 cores before), and exact
    * duplicates are dropped before they are ever scored. The trade: rejects
    * now occupy dedup state too (still watermark-bounded). Revisit the
    * order if a gate keyed on anything but text is ever added.
    */
  def admit(
      docs: DataFrame, benchShingles: DataFrame,
      watermark: String = "10 minutes",
      classifier: Option[DataFrame] = None, minLogit: Double = 0.0,
      lmModel: Option[DataFrame] = None, maxAvgNll: Double = 10.0,
      dsir: Option[DataFrame] = None, minLogw: Double = 0.0): DataFrame =
    admitImpl(docs, benchShingles, watermark, identity,
      classifier, minLogit, lmModel, maxAvgNll, dsir, minLogw)

  /** [[admit]] that is also NOVEL against the existing corpus — the
    * streaming twin of [[graft.operators.Dedup.incrementalExactDedup]]:
    * a stream-static LEFT ANTI join on the text digest against the lake's
    * stored digest index (`text_hash` column, one md5 per kept doc).
    *
    * Stateless (the anti-join holds no streaming state; only the watermark
    * dedup does), so the probe runs before scoring: a doc already in the
    * corpus is never tokenized. The static side is re-planned each
    * micro-batch — at lake scale keep the index as a compact
    * digest-sorted/bucketed parquet (or cache it and refresh on compaction);
    * Spark broadcasts it while it fits and sort-merge-joins past that, both
    * legal for stream-static anti.
    */
  /** `bloom` (optional): the one-row `corpus_bloom` sketch from
    * [[graft.operators.Dedup.corpusDigestBloom]]. When present, each
    * arriving digest probes the broadcast sketch FIRST: a miss proves the
    * doc novel (blooms have no false negatives) and bypasses the
    * digest-index anti-join entirely; only hits — true duplicates plus the
    * sketch's ~1% false positives — pay the exact probe. At steady state
    * most arrivals are novel, so the index join's input drops from the
    * whole stream to roughly (duplicate share + fpp): the sketch is
    * O(numBits/8) bytes vs the digest index's 16 bytes×corpus, and it is
    * what keeps the front door cheap once the index outgrows broadcast
    * and the anti-join turns sort-merge. The admitted SET is provably
    * unchanged (spec-pinned) — the sketch only ever skips work the exact
    * join would also have skipped.
    */
  def admitNovel(
      docs: DataFrame, benchShingles: DataFrame, corpusDigests: DataFrame,
      watermark: String = "10 minutes",
      classifier: Option[DataFrame] = None, minLogit: Double = 0.0,
      lmModel: Option[DataFrame] = None, maxAvgNll: Double = 10.0,
      dsir: Option[DataFrame] = None, minLogw: Double = 0.0,
      bloom: Option[DataFrame] = None): DataFrame = {
    val exactProbe: DataFrame => DataFrame =
      _.join(corpusDigests.select(col("text_hash")), Seq("text_hash"), "left_anti")
    val probe: DataFrame => DataFrame = bloom match {
      case None => exactProbe
      case Some(bf) =>
        graft.plans.GraftFunctions.register(docs.sparkSession)
        // might_contain requires a CONSTANT sketch (the same constraint the
        // runtime-filter rewrite satisfies with a scalar subquery), so the
        // one-row artifact is collected once at gate construction and rides
        // the plan as a binary literal — numBits/8 bytes, the same envelope
        // as any served model row, shipped once per executor via the task
        // broadcast. Rebuilding the sketch = restarting the gate, which is
        // the semantic-index refresh contract already.
        val sketch = lit(bf.collect().head.getAs[Array[Byte]]("corpus_bloom"))
        stream => {
          val tagged = stream.withColumn("_maybe",
            call_function("bloom_might_contain",
              sketch, xxhash64(col("text_hash"))))
          val provenNovel = tagged.filter(!col("_maybe")).drop("_maybe")
          val verified = exactProbe(tagged.filter(col("_maybe")).drop("_maybe"))
          provenNovel.unionByName(verified)
        }
    }
    admitImpl(docs, benchShingles, watermark, probe,
      classifier, minLogit, lmModel, maxAvgNll, dsir, minLogw)
  }

  private def admitImpl(
      docs: DataFrame, benchShingles: DataFrame, watermark: String,
      noveltyProbe: DataFrame => DataFrame,
      classifier: Option[DataFrame] = None, minLogit: Double = 0.0,
      lmModel: Option[DataFrame] = None, maxAvgNll: Double = 10.0,
      dsir: Option[DataFrame] = None, minLogw: Double = 0.0): DataFrame =
    audit(
      noveltyProbe(
        docs
          .withColumn("event_time", timestamp_millis(col("timestamp")))
          .withColumn("text_hash", md5(col("text")))
          .withWatermark("event_time", watermark)
          .dropDuplicatesWithinWatermark("text_hash")),
      benchShingles, cacheVocab = true,
      lmModel = lmModel, maxAvgNll = maxAvgNll,
      classifier = classifier, minLogit = minLogit,
      dsir = dsir, minLogw = minLogw)
      .filter(col("reason") === "ok")
      .select(col("doc_id"), col("text"), col("source"), col("event_time"))
}
