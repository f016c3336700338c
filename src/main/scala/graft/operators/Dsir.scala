package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): pick raw-corpus documents whose HASHED n-gram profile looks like
  * a small trusted target domain. Both corpora are reduced to counts over
  * `buckets` md5-hashed unigram+bigram feature buckets; each bucket gets an
  * add-one-smoothed log-likelihood ratio
  * `ln p̂_target(b) − ln p̂_raw(b)`, and a raw document's importance weight
  * is the count-weighted sum of its buckets' ratios — a bag-of-hashed-ngrams
  * likelihood ratio. Selection here is the deterministic threshold variant
  * (`logw ≥ τ`, default τ=0: "more target-like than raw-like"): a per-row
  * predicate, embarrassingly parallel, replayable by any engine — where the
  * paper's Gumbel top-k resampling would need a global sort; if sampled
  * selection is wanted, compose the weight column with
  * [[Relational.hashStratifiedSample]]'s hash-threshold draw instead.
  *
  * Determinism/oracle contract: features hash through md5 (never engine
  * hash()), bucket ratios are 6-dp-rounded log terms in DECIMAL(18,6) (the
  * [[TextAnalysis.lmPerplexityScore]] policy), and the per-doc sum is
  * DECIMAL-exact — order-independent, so partitioning and retries can't
  * move a weight.
  *
  * Scale shape (100 TB): the model is a CONSTANT-size artifact — `buckets`
  * rows no matter the vocabulary (the point of hashing: no Heap's-law
  * growth, no maxVocab cap to tune) — built by one map-side-combined
  * aggregation over the feature stream with a two-branch conditional sum
  * (the [[TextAnalysis.nbClassifierWeights]] shape); scoring is one
  * broadcast join of that fixed table plus a per-doc aggregation. Weighing
  * the full 100 TB raw pool is exactly one pass.
  */
object Dsir {

  /** md5-derived feature bucket in [0, buckets): the engine-replayable
    * stand-in for the paper's feature hash.
    */
  private def bucketOf(feat: Column, buckets: Int): Column =
    conv(substring(md5(feat.cast("binary")), 1, 15), 16, 10)
      .cast("long") % buckets

  /** The hashed feature stream: one row per unigram and per adjacent
    * bigram occurrence, carrying the caller's flag column.
    */
  private def featureStream(
      docs: DataFrame, flag: Column, buckets: Int): DataFrame = {
    import graft.functions.TextFunctions.shingles
    // ONE explode over unigrams ++ bigrams instead of a two-branch union
    // that scanned and tokenized the corpus twice per evaluation (row
    // order differs from the old union, but every consumer aggregates
    // order-independently; shingles(t,2) emits exactly the old zip_with
    // pairs as the same "a b" strings, and the same f multiset hashes to
    // the same bucket counts)
    Par.spread(docs)
      .select(col("doc_id"), flag.as("tgt"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("tgt"),
        explode(concat(col("t"), shingles(col("t"), 2))).as("f"))
      .select(col("doc_id"), col("tgt"), bucketOf(col("f"), buckets).as("bkt"))
  }

  /** The fitted model: every bucket's (target count, raw count, 6-dp
    * DECIMAL log-ratio) — including never-seen buckets, which still carry
    * the smoothing-only ratio. `buckets` rows, broadcastable forever.
    */
  def dsirLogRatios(
      docs: DataFrame, isTarget: Column, buckets: Int = 1024): DataFrame =
    logRatiosFromCounts(
      docs.sparkSession,
      featureStream(docs, isTarget, buckets)
        .groupBy(col("bkt"))
        .agg(
          sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
          sum(when(!col("tgt"), 1L).otherwise(0L)).as("cr")),
      buckets)

  /** The smoothing/ratio arithmetic over a per-bucket (ct, cr) count
    * frame — shared by [[dsirLogRatios]] (counts off the raw feature
    * stream) and [[dsirWeights]] (counts re-aggregated from its
    * materialized per-doc bucket counts; Σ of per-doc counts ≡ the raw
    * stream count, so both fit the SAME model).
    */
  private def logRatiosFromCounts(
      spark: org.apache.spark.sql.SparkSession, counts: DataFrame,
      buckets: Int): DataFrame = {
    val tot = counts.agg(
      sum(col("ct")).cast("double").as("nt"),
      sum(col("cr")).cast("double").as("nr"))
    spark.range(buckets).select(col("id").as("bkt"))
      .join(counts, Seq("bkt"), "left")
      .na.fill(0L, Seq("ct", "cr"))
      .crossJoin(broadcast(tot))
      .select(col("bkt"), col("ct"), col("cr"),
        (round(log((col("ct").cast("double") + 1.0) /
            (col("nt") + buckets.toDouble)), 6).cast("decimal(18,6)") -
          round(log((col("cr").cast("double") + 1.0) /
            (col("nr") + buckets.toDouble)), 6).cast("decimal(18,6)"))
          .as("lrd"))
  }

  /** [[dsirLogRatios]] in its query-artifact shape (logratio as double). */
  def dsirRatiosFrame(
      docs: DataFrame, isTarget: Column, buckets: Int = 1024): DataFrame =
    dsirLogRatios(docs, isTarget, buckets)
      .select(col("bkt"), col("ct"), col("cr"),
        col("lrd").cast("double").as("logratio"))
      .orderBy(col("bkt"))

  /** [[dsirLogRatios]] packaged for row-local serving: ONE row carrying the
    * bucket-ordered ratio array (as 6-dp doubles). Because the model is a
    * DENSE fixed-size array — every bucket has a value, unseen ones carry
    * the smoothing-only ratio — the serve probe is a plain `element_at` by
    * bucket index: O(1) with no residual map scan, simpler than even the
    * lmModel bucket layout. Broadcast into a stream-static join; the
    * streaming edge scores each arriving doc with a row-local fold
    * ([[graft.streaming.IngestGate.audit]]'s `dsir` gate) — fit in batch,
    * serve on the stream, no streaming aggregation.
    */
  def dsirServeModel(
      docs: DataFrame, isTarget: Column, buckets: Int = 1024): DataFrame =
    dsirLogRatios(docs, isTarget, buckets)
      .agg(map_from_entries(collect_list(
        struct(col("bkt").cast("int"), col("lrd").cast("double")))).as("m"))
      .select(transform(sequence(lit(0), lit(buckets - 1)),
        b => element_at(col("m"), b)).as("dsir_ratios"))

  /** The md5 feature bucket as a servable expression (1-based for
    * `element_at` against the dense ratio array).
    */
  def featureSlot(feat: Column, buckets: Column): Column =
    (conv(substring(md5(feat.cast("binary")), 1, 15), 16, 10)
      .cast("long") % buckets.cast("long") + 1).cast("int")

  /** Importance weight + threshold verdict for every RAW (non-target)
    * document: logw = Σ_b n_b·ratio_b, keep iff logw ≥ τ.
    */
  def dsirWeights(
      docs: DataFrame, isTarget: Column, buckets: Int = 1024,
      tau: Double = 0.0): DataFrame = {
    // per-(doc, bkt) feature counts materialized ONCE: previously the
    // model fit and the scoring pass each re-ran the whole tokenize +
    // explode + hash stream (measured as two identical 64-task stages
    // per run). The model's per-bucket counts re-aggregate from this
    // frame (Σ of per-doc counts ≡ the stream count), so fit and
    // scoring share one evaluation; doc-bucket counts are the smallest
    // faithful intermediate (≤ buckets rows PER DOC — corpus-scale, not
    // model-sized; TextAnalysis.tfidfTopTerms' SCALE/RELIABILITY NOTE
    // applies: executor-local blocks, an executor loss fails the query,
    // a production pipeline lands this in the lake instead).
    val fs = featureStream(docs, isTarget, buckets)
      .groupBy(col("doc_id"), col("tgt"), col("bkt"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val lr = logRatiosFromCounts(
      docs.sparkSession,
      fs.groupBy(col("bkt"))
        .agg(
          sum(when(col("tgt"), col("n")).otherwise(0L)).as("ct"),
          sum(when(!col("tgt"), col("n")).otherwise(0L)).as("cr")),
      buckets)
      .select(col("bkt"), col("lrd"))
    fs.filter(!col("tgt"))
      .select(col("doc_id"), col("bkt"), col("n"))
      .join(broadcast(lr), "bkt")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n")).as("n_feats"),
        sum(col("n").cast("decimal(18,0)") * col("lrd")).cast("double")
          .as("logw_raw"))
      .select(col("doc_id"), col("n_feats"),
        round(col("logw_raw"), 6).as("logw"),
        when(col("logw_raw") >= tau, "keep").otherwise("drop").as("verdict"))
      .orderBy(col("doc_id"))
  }
}
