package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-product query of a corpus-curation pipeline: every upstream
  * signal — heuristic quality, Gopher-style repetition, benchmark
  * decontamination, exact-Jaccard near-dup clustering — joined into ONE
  * per-document decision: what actually ships into the training set, and
  * why each rejected doc fell out.
  *
  * Decision precedence (first match wins, mirrored exactly in the oracle):
  * holdout (benchmark slice) > drop_contaminated > drop_repetitive >
  * drop_quality > drop_duplicate (non-canonical cluster member — the min-id
  * representative survives; a production policy might instead pick the
  * highest-quality member, which is a one-line change to the canonical
  * rule) > keep.
  *
  * Plan shape: four per-doc signal frames, each one-to-one with doc_id,
  * hash-joined on doc_id — at scale every join co-partitions on the same
  * key, so the composition adds exactly one shuffle per signal beyond the
  * signals' own cost.
  */
object Curation {

  /** `isHoldout` picks the benchmark slice — a policy the CALLER owns (the
    * harness uses the deterministic doc_id % 97 split; production passes
    * membership in its eval suites). The operator embeds no selection rule.
    */
  def curationSnapshot(
      docs: DataFrame,
      isHoldout: org.apache.spark.sql.Column = col("doc_id") % 97 === 0): DataFrame =
    curationDecisions(docs, isHoldout).orderBy(col("doc_id"))

  /** [[curationSnapshot]] without the presentation sort — the form internal
    * consumers compose on (a sort feeding a filter/join is dead weight, and
    * keeping it out of the plan matters once the keep set is checkpointed,
    * where EliminateSorts can no longer remove it).
    */
  private def curationDecisions(
      docs: DataFrame,
      isHoldout: org.apache.spark.sql.Column = col("doc_id") % 97 === 0): DataFrame = {
    // the caller's predicate is evaluated ONCE, against the full input row —
    // re-evaluating it in the final decision projection (where only
    // doc_id/source survive the joins) would fail analysis for any holdout
    // marker over text, a perfectly realistic policy
    val flagged = docs.withColumn("is_holdout", isHoldout)
    val bench = flagged.filter(col("is_holdout")).drop("is_holdout")
    val train = flagged.filter(!col("is_holdout")).drop("is_holdout")
    val q = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("verdict").as("q_verdict"))
    val r = TextAnalysis.repetitionScores(docs)
      .select(col("doc_id"), col("verdict").as("r_verdict"))
    val clusters = Dedup.nearDupClusters(docs)
    val contam = TextAnalysis.contaminationReport(train, bench)
      .select(col("doc_id"), lit(1).as("contaminated"))
    flagged.select(col("doc_id"), col("source"), col("is_holdout"))
      .join(q, Seq("doc_id"))
      .join(r, Seq("doc_id"))
      .join(clusters, Seq("doc_id"))
      .join(contam, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("source"), col("cluster_id"),
        when(col("is_holdout"), "holdout")
          .when(col("contaminated").isNotNull, "drop_contaminated")
          .when(col("r_verdict") === "drop", "drop_repetitive")
          .when(col("q_verdict") === "drop", "drop_quality")
          .when(col("cluster_id") =!= col("doc_id"), "drop_duplicate")
          .otherwise("keep").as("decision"))
  }

  /** Domain rebalance sampling — APPLY the mixture weights
    * [[TextAnalysis.domainMixture]] reports: sample each domain at
    * rate = min(1, baseRate · weight), so over-represented domains thin
    * toward the uniform token target and under-represented ones keep
    * everything (rate caps at 1). The step between "the mixture is skewed"
    * and the training set that fixes it.
    *
    * Sampling is the replayable md5-bucket draw of `hashStratifiedSample`
    * (bucket = md5(doc_id) mod 10⁴, keep while bucket < rate·10⁴) — no RNG
    * state, partitioning-independent, and reproducible by any engine. The
    * per-domain rates derive from the ROUNDED (6 dp) weights, pinning the
    * keep/drop boundary cross-engine. Plan: one broadcast of the tiny
    * per-domain weight table onto a narrow scan — no extra shuffle beyond
    * the mixture aggregation itself.
    */
  def rebalanceSample(docs: DataFrame, baseRate: Double = 0.5): DataFrame = {
    val mix = TextAnalysis.domainMixture(docs).select(col("source"), col("weight"))
    rebalanceDraw(Par.spread(docs), mix, baseRate)
      .orderBy(col("source"), col("doc_id"))
  }

  /** The draw itself, against a caller-supplied (source, weight) mixture
    * frame — shared verbatim with the streaming twin
    * [[graft.streaming.StreamCuration.rebalanceSample]], so the batch and
    * stream arms can never disagree on a keep/drop boundary.
    */
  private[graft] def rebalanceDraw(
      docs: DataFrame, mix: DataFrame, baseRate: Double): DataFrame = {
    val rate = least(lit(1.0), lit(baseRate) * col("weight"))
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(mix), Seq("source"))
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 10000)
      .filter(col("bucket").cast("double") < rate * 10000.0)
      .select(col("source"), col("doc_id"), round(rate, 6).as("rate"))
  }

  /** Sequence packing: assign documents to fixed token-budget training
    * sequences — the batch-assembly step between a curated corpus and a
    * pretraining dataloader. Contiguous greedy packing in deterministic
    * (source, doc_id) order: each document starts at the cumulative token
    * offset of its predecessors within its source shard, and its sequence
    * id is that offset DIV `budget` (a doc straddling a boundary belongs
    * to the sequence where it starts).
    *
    * Integer arithmetic end to end — no float summation-order sensitivity —
    * and ONE window sum partitioned by `source`, so packing shuffles once
    * and parallelizes across shards. A single global packing would be a
    * partition-less window (the one-task funnel PlanQualitySpec bans).
    * Parallelism equals the shard count: at 100 TB a caller pre-splits any
    * giant source into bounded sub-shards (e.g. the range-sorted file
    * groups LakeSink emits) and passes the sub-shard id as `source` —
    * sequences then never straddle sub-shards, which is exactly how
    * distributed dataloaders consume them.
    */
  /** The full corpus-build a training-data user actually runs, as ONE
    * composed query: [[curationSnapshot]] picks the keep set →
    * [[rebalanceSample]] thins over-represented domains over the KEPT
    * corpus (weights re-derived post-curation, where they belong — a
    * mixture computed on the raw corpus would re-inflate domains whose
    * docs were mostly dropped) → [[packSequences]] assigns the survivors
    * to fixed-budget training sequences.
    *
    * Plan shape: both narrowing steps are doc_id equi-joins onto the
    * documents frame, so every stage co-partitions on the key the signals
    * already shuffled by; the stages' internal orderBys are eliminated
    * under the joins (EliminateSorts), leaving the final pack ordering as
    * the only range exchange — CurationSpec asserts exactly one, and pins
    * the composition itself against the hand-chained three stages.
    */
  def corpusBuild(
      docs: DataFrame, baseRate: Double = 0.5, budget: Long = 2048): DataFrame = {
    // `kept` has three consumers (the mixture aggregation, the draw join,
    // the pack join), and without a materialization barrier each one
    // re-executes the whole four-signal curation DAG — measured ~2.5× the
    // standalone snapshot's cost at bench scale. Checkpointing the ids-only
    // keep set (8 bytes/row; executor-local storage, the same trade the CC
    // fixpoint already makes) caps curation at ONE evaluation; re-deriving
    // `kept` from it is a docs scan + one co-partitioned join. At 100 TB
    // a pipeline would instead land `kept` in the lake between stages —
    // this barrier is that stage boundary, without the external write.
    val keepIds = curationDecisions(docs)
      .filter(col("decision") === "keep")
      .select(col("doc_id"))
      .localCheckpoint()
    val kept = docs.join(keepIds, Seq("doc_id"))
    val sampledIds = rebalanceSample(kept, baseRate).select(col("doc_id"))
    packSequences(kept.join(sampledIds, Seq("doc_id")), budget)
  }

  /** Document chunking — the complement of [[packSequences]]: SPLIT each
    * document into fixed-size token chunks with `overlap` tokens of context
    * carried across boundaries (stride = maxTokens − overlap), the way a
    * pretraining/embedding pipeline windows long documents. Chunk starts
    * are 0, stride, 2·stride, …; the last chunk is the first one whose
    * window reaches the end (docs at or under `maxTokens` yield exactly one
    * chunk). All integer arithmetic, so the DuckDB oracle reproduces chunk
    * boundaries exactly.
    *
    * Plan: narrow per-row explode — no shuffle at any size; output rows ≈
    * input tokens ÷ stride, and the explode is lazy per-row (no doc's full
    * chunk set is ever held beyond its own row).
    */
  def chunkDocuments(
      docs: DataFrame, maxTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens, "need 0 <= overlap < maxTokens")
    import graft.functions.TextFunctions.tokens
    val stride = maxTokens - overlap
    val chunks = Par.spread(docs)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      // chunks = 1 + ceil((n - maxTokens) / stride) when n > maxTokens;
      // DIV keeps it in exact integer math on both engines
      .withColumn("n_chunks",
        when(col("n_tokens") <= maxTokens, lit(1L))
          .otherwise(expr(
            s"1L + (n_tokens - $maxTokens + ${stride - 1}) DIV $stride")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("doc_id"), col("chunk_idx"),
        array_join(
          slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"),
            lit(maxTokens)), " ").as("chunk_text"),
        least(lit(maxTokens).cast("long"),
          col("n_tokens") - col("chunk_idx") * stride).as("n_chunk_tokens"))
    // stateless per-row math, so the operator is stream-legal as-is — minus
    // the presentation sort, which only a bounded input can have
    if (docs.isStreaming) chunks else chunks.orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Deterministic corpus shuffle + shard assignment — the training-order
    * step between a curated corpus and a distributed dataloader: every doc
    * gets a shard (md5-uniform over `nShards`) and a position within its
    * shard (ascending md5, ties by doc_id), so the global read order is a
    * reproducible pseudo-random permutation with NO RNG state — any engine
    * (and any retry) derives the identical order, the same replayability
    * contract as the md5-bucket samplers. One shuffle: the per-shard
    * position window partitions on the shard key, so parallelism equals
    * the shard count and no partition-less window exists.
    */
  def shuffleShards(docs: DataFrame, nShards: Int = 64): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    import org.apache.spark.sql.expressions.Window
    val h = md5(col("doc_id").cast("string"))
    val shard = conv(substring(h, 1, 15), 16, 10).cast("long") % nShards
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    Par.spread(docs)
      .select(col("doc_id"), h.as("h"), shard.as("shard"))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("shard_pos"))
      .orderBy(col("shard"), col("shard_pos"))
  }

  /** Length-bucketed batching: group docs into power-of-two token-length
    * buckets so fixed-shape batches pad minimally (the SFT/eval-batching
    * complement of [[packSequences]]' concat-packing — packing destroys
    * document boundaries, bucketing preserves them). Bucket = 2^⌈log₂ n⌉
    * clamped to [minBucket, maxBucket]; integer-exact in both engines via
    * doubling comparisons rather than float log₂.
    */
  def lengthBuckets(
      docs: DataFrame, minBucket: Int = 16, maxBucket: Int = 2048): DataFrame = {
    require(minBucket >= 1 && Integer.bitCount(minBucket) == 1 &&
      Integer.bitCount(maxBucket) == 1 && maxBucket >= minBucket,
      "buckets must be powers of two")
    import graft.functions.TextFunctions.tokens
    val n = size(tokens(col("text"))).cast("long")
    val steps = Iterator.iterate(minBucket)(_ * 2)
      .takeWhile(_ <= maxBucket).toSeq
    // first power-of-two step >= n, else the max bucket (oversize docs are
    // the chunkDocuments caller's problem, flagged here as bucket=maxBucket)
    val bucket = steps.reverse.foldLeft(lit(maxBucket.toLong)) {
      (acc, b) => when(n <= b, lit(b.toLong)).otherwise(acc)
    }
    Par.spread(docs)
      .select(col("doc_id"), n.as("n_tokens"), bucket.as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Padding-waste audit over [[lengthBuckets]] — the dataloader-planning
    * number bucketed batching exists to optimize: per bucket, how many
    * docs land there, their real token mass, the padded capacity
    * (bucket·n_docs), the waste (capacity − tokens), and waste as an
    * exact per-ten-thousand integer (`waste_bp` — basis points; a DOUBLE
    * ratio would re-open the engine-rounding door the bucket ladder
    * closed). A release-over-release waste shift says re-tune the bucket
    * ladder or the chunker. One tiny aggregation over the bucket
    * projection; bucket-count rows out.
    */
  def paddingWaste(
      docs: DataFrame, minBucket: Int = 16, maxBucket: Int = 2048): DataFrame =
    lengthBuckets(docs, minBucket, maxBucket)
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
      .withColumn("capacity", col("bucket") * col("n_docs"))
      .withColumn("waste", col("capacity") - col("total_tokens"))
      // integer `div`, not `/`: a double quotient loses exactness past
      // 2^53 and its cast re-opens the engine-rounding door
      .withColumn("waste_bp", expr("(waste * 10000) div capacity"))
      .orderBy(col("bucket"))

  /** Cross-document boilerplate removal (the C4/RefinedWeb line-dedup rule):
    * segment every document, count in how many DISTINCT documents each
    * segment occurs, strip segments whose document frequency reaches
    * `minDf`, and reassemble each document from its surviving segments in
    * original order. Headers, footers, cookie banners and license blurbs —
    * anything repeated verbatim across documents — vanish corpus-wide in one
    * pass, the sub-document complement of exact dedup.
    *
    * Segmentation is caller policy, like curationSnapshot's holdout rule:
    * the default splits on newline (the classic line rule); token-stream
    * corpora without line structure pass fixed token windows (see
    * [[tokenWindowSegments]]) and a `" "` joiner so an untouched document
    * round-trips to its exact original text.
    *
    * Plan shape: posexplode → one hash aggregation on the 128-bit segment
    * digest (hash-uniform, skew-free — the md5 of a viral segment is still
    * ONE group whose state is a count) → a left join of the exploded
    * segments against ONLY the boilerplate digests (df ≥ minDf — the small
    * minority side, broadcastable under AQE when it fits, co-partitioned
    * shuffle join when a 100 TB crawl's boilerplate set outgrows that) →
    * one per-document regroup whose state is bounded by that document's own
    * segment count (the userJourneys contract). Nothing is ever globally
    * collected or broadcast unconditionally.
    */
  def removeBoilerplate(
      docs: DataFrame,
      minDf: Int = 2,
      segments: org.apache.spark.sql.Column = split(col("text"), "\n"),
      joiner: String = "\n"): DataFrame = {
    val seg = Par.spread(docs)
      .select(col("doc_id"), posexplode(segments).as(Seq("pos", "seg")))
      .withColumn("h", md5(col("seg")))
    val boilerplate = boilerplateIndex(docs, minDf, segments)
      .select(col("h"), lit(true).as("bp"))
    seg.join(boilerplate, Seq("h"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(col("pos"), col("seg"),
                coalesce(col("bp"), lit(false)).as("bp")))),
              s => !s("bp")),
            s => s("seg")),
          joiner).as("clean_text"),
        sum(when(col("bp").isNull, 1L).otherwise(0L)).as("kept_segments"),
        sum(when(col("bp").isNotNull, 1L).otherwise(0L)).as("removed_segments"))
      .orderBy(col("doc_id"))
  }

  /** The corpus's boilerplate-segment index: (h = md5(segment), df) for
    * every segment reaching `minDf` distinct documents — the df aggregation
    * inside [[removeBoilerplate]], exposed so a lake can persist it and the
    * streaming edge ([[stripBoilerplate]]) can probe it without re-scanning
    * the corpus (the [[graft.streaming.IngestGate.admitNovel]] index
    * pattern, one level below whole-document granularity).
    */
  def boilerplateIndex(
      docs: DataFrame,
      minDf: Int = 2,
      segments: org.apache.spark.sql.Column = split(col("text"), "\n")): DataFrame = {
    require(minDf >= 2, "minDf < 2 would strip every segment")
    segmentDfIndex(docs, segments).filter(col("df") >= minDf)
  }

  /** The UNFILTERED segment-df aggregation — what a lake actually persists
    * (filtering to df ≥ minDf happens at serve time, so raising the
    * threshold later needs no corpus re-scan): (h = md5(segment),
    * df = distinct-document count).
    */
  def segmentDfIndex(
      docs: DataFrame,
      segments: org.apache.spark.sql.Column = split(col("text"), "\n")): DataFrame =
    Par.spread(docs)
      .select(col("doc_id"), explode(segments).as("seg"))
      .select(col("doc_id"), md5(col("seg")).as("h"))
      .groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("df"))

  /** Fold a NEW batch into a stored segment-df index without re-scanning
    * the corpus — the incremental-dedup cost model one level below document
    * granularity: per-batch work scales with the BATCH, the corpus
    * contributes only index I/O. Requires batch doc_ids disjoint from the
    * indexed corpus (the [[graft.operators.Dedup.incrementalExactDedup]]
    * contract), under which distinct-doc counts ADD and the invariant
    * `merge(index(old), batch) == index(old ∪ batch)` holds exactly
    * (CurationSpec pins it; the q_boilerplate_incr oracle recomputes the
    * union side in SQL). One shuffle on the hash-uniform digest.
    */
  def mergeSegmentDf(
      index: DataFrame,
      batchDocs: DataFrame,
      segments: org.apache.spark.sql.Column = split(col("text"), "\n")): DataFrame =
    index.select(col("h"), col("df"))
      .union(segmentDfIndex(batchDocs, segments))
      .groupBy(col("h"))
      .agg(sum(col("df")).as("df"))

  /** Strip known-boilerplate segments from documents ROW-LOCALLY against a
    * stored index — the streaming arm of [[removeBoilerplate]] (whose df
    * aggregation needs the whole corpus): the index digests ride a one-row
    * broadcast (the IngestGate vocabulary pattern) and each document is
    * cleaned by a per-row array filter, so the operator is stateless,
    * append-safe, and batch/stream agnostic. StreamCurationSpec pins the
    * stream output to [[removeBoilerplate]]'s clean_text over the same
    * corpus+index. The broadcast bounds the served index to the frequent
    * head — at lake scale feed it `boilerplateIndex(...).filter/limit`
    * (rare boilerplate costs little; the head is what pollutes training).
    *
    * Passes every input column except `text` through (plus clean_text and
    * the kept/removed counts), so it composes in front of the ingest gate:
    * strip → rename clean_text→text → `IngestGate.admit` is one continuous
    * append-safe query (the fully-loaded front door StreamBench measures).
    */
  def stripBoilerplate(
      docs: DataFrame,
      bpIndex: DataFrame,
      segments: org.apache.spark.sql.Column = split(col("text"), "\n"),
      joiner: String = "\n"): DataFrame = {
    val idx = bpIndex.agg(collect_set(col("h")).as("bp_set"))
    docs
      .withColumn("segs", segments)
      .crossJoin(broadcast(idx))
      .withColumn("kept", filter(col("segs"),
        s => !array_contains(col("bp_set"), md5(s))))
      .withColumn("clean_text", array_join(col("kept"), joiner))
      .withColumn("kept_segments", size(col("kept")).cast("long"))
      .withColumn("removed_segments",
        (size(col("segs")) - size(col("kept"))).cast("long"))
      .drop("segs", "bp_set", "kept", "text")
  }

  /** Fixed non-overlapping token windows as a [[removeBoilerplate]]
    * segmentation policy — `w`-token slices at 0, w, 2w, … with the
    * remainder kept as a final short segment, so the segments joined by
    * `" "` reproduce the original token stream exactly.
    */
  def tokenWindowSegments(w: Int): org.apache.spark.sql.Column = {
    import graft.functions.TextFunctions.tokens
    val toks = tokens(col("text"))
    // last window index = floor((n-1)/w); the doubles are exact for any
    // realistic token count, so the floor is the integer quotient
    val lastIdx = floor((size(toks) - 1).cast("double") / w).cast("int")
    transform(
      sequence(lit(0), lastIdx),
      i => array_join(slice(toks, i * w + 1, lit(w)), " "))
  }

  /** Materialize [[packSequences]]' assignments into the actual training
    * sequences a dataloader reads: per (source, seq_id), the member
    * documents concatenated in doc_id order with an EOS separator, plus
    * doc/token counts — the last step between a curated corpus and
    * tokenizer input. One groupBy on (source, seq_id) whose state is
    * bounded by the token budget itself (a sequence holds at most
    * `budget`-ish tokens by construction), so per-group memory is capped
    * no matter the corpus size.
    */
  def materializeSequences(
      docs: DataFrame, budget: Long = 2048,
      sep: String = "<|endoftext|>"): DataFrame = {
    val packed = packSequences(docs, budget)
      .select(col("doc_id"), col("seq_id"), col("n_tokens"))
    docs.select(col("doc_id"), col("source"), col("text"))
      .join(packed, Seq("doc_id"))
      .groupBy(col("source"), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            s => s("text")),
          sep).as("seq_text"))
      .orderBy(col("source"), col("seq_id"))
  }

  def packSequences(docs: DataFrame, budget: Long = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.tokens
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Par.spread(docs)
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("start", col("cum_tokens") - col("n_tokens"))
      .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_tokens"),
        expr(s"start DIV ${budget}L").as("seq_id"),
        (col("start") % budget).as("seq_offset"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** RefinedWeb-style domain curation front door — the URL/domain rules a
    * web corpus runs before any content signal:
    *  1. BLOCKLIST: docs from a blocked domain drop outright (broadcast
    *     anti-tag; a production blocklist of millions of domains is still
    *     a broadcast-or-bloom side, never a shuffle of the corpus);
    *  2. PER-DOMAIN CAP: no surviving domain contributes more than `cap`
    *     docs — the anti-SEO-farm guard — drawn by md5-rank, the same
    *     deterministic hash order as [[Relational.stratifiedFixedN]], so
    *     the kept set is replayable on any engine and stable under
    *     re-partitioning.
    * Output is the full per-doc AUDIT (doc_id, source, rk, reason, keep):
    * every drop carries its reason, the governance contract of every gate
    * here. One broadcast tag + one window shuffle on the domain key.
    */
  def domainFilter(
      docs: DataFrame, blocklist: DataFrame, cap: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // distinct: a blocklist with a repeated domain must not multiply the
    // blocked audit rows (IN-list semantics, matching the oracle)
    val tagged = Par.spread(docs).select(col("doc_id"), col("source"))
      .join(broadcast(blocklist.select(col("domain")).distinct()),
        col("source") === col("domain"), "left_outer")
      .withColumn("blocked", col("domain").isNotNull)
      .drop("domain")
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val survivors = tagged.filter(!col("blocked"))
      .withColumn("rk", row_number().over(w))
      .withColumn("reason",
        when(col("rk") <= cap, "kept").otherwise("over_cap"))
    val dropped = tagged.filter(col("blocked"))
      .withColumn("rk", lit(null).cast("int"))
      .withColumn("reason", lit("blocked"))
    survivors.select(col("doc_id"), col("source"), col("rk"), col("reason"))
      .unionByName(dropped.select(col("doc_id"), col("source"), col("rk"), col("reason")))
      .withColumn("keep", col("reason") === "kept")
      .orderBy(col("doc_id"))
  }

  /** The docs [[domainFilter]] keeps, full rows — the composition input
    * for downstream content gates (the Gopher battery, dedup, quality).
    */
  def domainKept(
      docs: DataFrame, blocklist: DataFrame, cap: Int = 20): DataFrame =
    docs.join(
      domainFilter(docs, blocklist, cap).filter(col("keep"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")

  /** Chunk-grain duplicate mass — per document, how many of its chunks
    * ([[chunkDocuments]]'s dataloader windows) also occur verbatim in
    * ANOTHER document. Byte-exact dedup sees none of this (the docs
    * differ), substring-window dedup ([[Dedup.substringDupPairs]]) finds
    * the pairs at higher cost; this is the cheap corpus-wide audit at the
    * grain that actually reaches training: a doc whose chunks are 80%
    * shared is mostly redundant to the model even if no whole-doc rule
    * fires. Only docs with at least one shared chunk report.
    *
    * Plan shape: the chunk projection, a digest-grain distinct-doc count
    * (bounded two-level aggregate — never a per-digest member list, the
    * [[segmentDfIndex]] trade), a co-keyed join back, then the per-doc
    * aggregation. Digests, never chunk text, cross the shuffles.
    */
  def chunkDupMass(docs: DataFrame): DataFrame = {
    val chunks = chunkDocuments(docs)
      .select(col("doc_id"), md5(col("chunk_text")).as("digest"))
    val df = chunks.groupBy(col("digest"))
      .agg(countDistinct(col("doc_id")).as("n_docs_sharing"))
    chunks.join(df, "digest")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs_sharing") >= 2, 1L).otherwise(0L))
          .as("n_dup_chunks"))
      .filter(col("n_dup_chunks") >= 1)
      .withColumn("dup_fraction", round(
        col("n_dup_chunks").cast("double") / col("n_chunks").cast("double"), 6))
      .orderBy(col("doc_id"))
  }

  /** Contrastive-pair mining for embedding training — the (anchor,
    * positive) / (anchor, negative) set a contrastive or triplet loss
    * consumes, bootstrapped from the corpus itself: positives are the
    * MinHash-LSH near-dup pairs ([[Dedup.minhashLshPairs]] — documents
    * that SHOULD embed close, weighted by their Jaccard), negatives the
    * deterministic XOR-1 id pairing (the [[graft.SparkEntry]] cross-modal
    * fixture's trick: adjacent ids are independent draws in any corpus
    * ordered by arrival, and the pairing needs no shuffle, no global
    * rank, no RNG) minus any pair the positive miner surfaced. Every pair
    * is replayable by construction — the oracle reproduces positives
    * through the full MinHash chain and negatives through the same XOR
    * arithmetic.
    *
    * Plan shape: the positive side is the banded LSH join (Σ bucket²
    * bounded, never n²); the negative side is a narrow projection + two
    * broadcast-size semi/anti joins. Scales exactly as far as the dedup
    * tier it reuses.
    */
  def contrastivePairs(docs: DataFrame, threshold: Double = 0.6): DataFrame = {
    val pos = Dedup.minhashLshPairs(docs, threshold = threshold)
      .select(col("i").as("anchor_id"), col("j").as("other_id"),
        lit("pos").as("label"), col("jac").as("weight"))
    val ids = docs.select(col("doc_id"))
    val neg = ids.select(col("doc_id").as("anchor_id"),
        col("doc_id").bitwiseXOR(lit(1L)).as("other_id"))
      .filter(col("anchor_id") < col("other_id"))
      .join(ids.select(col("doc_id").as("other_id")), Seq("other_id"), "left_semi")
      .join(pos.select(col("anchor_id"), col("other_id")),
        Seq("anchor_id", "other_id"), "left_anti")
      .select(col("anchor_id"), col("other_id"),
        lit("neg").as("label"), lit(0.0).as("weight"))
    pos.unionByName(neg)
      .orderBy(col("label"), col("anchor_id"), col("other_id"))
  }

  /** Weighted sampling WITHOUT replacement, one distributed pass — the
    * Efraimidis–Spirakis A-Res scheme: each row draws a deterministic
    * uniform u from its id, keys itself with ln(u)/w (equivalently
    * u^(1/w)), and the global top-`n` keys ARE an exact without-
    * replacement sample with inclusion probability proportional to the
    * weight `w`. This is how a curation run takes "100k docs, biased
    * toward quality" from a 100 TB corpus in one scan: a narrow codegen'd
    * projection plus TakeOrderedAndProject (per-partition heaps of n, no
    * global sort, no state, no second pass) — the sequential reservoir
    * algorithm's distributed form.
    *
    * Weight = [[TextAnalysis.qualityScore]] + 0.001 (the floor keeps
    * zero-quality docs drawable with vanishing, not undefined, odds).
    * Engine parity: u = (md5-long + 0.5) / 2^60 is exact double math,
    * ln(u) is rounded to 6 dp (the libm guard), and the quotient of two
    * identical doubles is identical — the selected SET matches across
    * engines, not just approximately.
    */
  def weightedSample(docs: DataFrame, n: Int = 100, seed: String = "ws"): DataFrame =
    sampleKeyed(Par.spread(docs), seed)
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(n)
      .select(col("doc_id"), col("source"), col("quality"), col("skey"))

  /** The per-row sampling key projection [[weightedSample]] ranks on —
    * shared verbatim with the streaming sampler
    * ([[graft.streaming.StreamSample]]) so both draw IDENTICAL keys:
    * quality from the one shared judge column, u from the seeded md5
    * draw, skey = round(ln u, 6) / (quality + 0.001). Stream-safe (pure
    * projection, no sort, no state).
    */
  private[graft] def sampleKeyed(docs: DataFrame, seed: String): DataFrame = {
    val h = conv(substring(
      md5(concat(lit(seed), lit(":"), col("doc_id").cast("string"))), 1, 15),
      16, 10).cast("long")
    docs.select(
      col("doc_id"), col("source"),
      TextAnalysis.qualityColumn.as("quality"))
      .withColumn("skey",
        round(log((h.cast("double") + lit(0.5)) / lit((1L << 60).toDouble)), 6) /
          (col("quality") + lit(0.001)))
  }

  /** Preference-pair mining — per (source, lang) stratum, pair the
    * highest-quality document with the lowest as a (chosen, rejected)
    * training example, the way DPO/RLHF data pipelines bootstrap
    * preference sets from a scalar judge when no human labels exist. The
    * judge here is [[TextAnalysis.qualityScore]] (already oracle-exact);
    * `margin` is the score gap — downstream consumers threshold on it
    * (a near-zero margin is a coin-flip pair, worse than no pair).
    *
    * Plan shape: the scored frame aggregates once per stratum with
    * max_by/min_by over a (quality, ±doc_id) ordering struct — a hash
    * aggregate with CONSTANT state per group (never a per-stratum sort or
    * materialized ranking), the [[Relational.latestEventPerUserAgg]]
    * shape. Strata with one doc can't form a pair and drop. Ties break
    * on doc_id (chosen: lowest id among max-quality; rejected: lowest id
    * among min-quality) so the pair set is engine-exact.
    */
  def preferencePairs(docs: DataFrame): DataFrame = {
    val scored = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality"))
      .join(docs.select(col("doc_id"), col("source"), col("lang")), Seq("doc_id"))
    scored
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        max_by(col("doc_id"), struct(col("quality"), (-col("doc_id")).as("n")))
          .as("chosen_id"),
        max(col("quality")).as("chosen_q"),
        min_by(col("doc_id"), struct(col("quality"), col("doc_id")))
          .as("rejected_id"),
        min(col("quality")).as("rejected_q"))
      .filter(col("n_docs") >= 2)
      .withColumn("margin", round(col("chosen_q") - col("rejected_q"), 6))
      .select(
        col("source"), col("lang"), col("n_docs"), col("chosen_id"),
        col("rejected_id"), col("chosen_q"), col("rejected_q"), col("margin"))
      .orderBy(col("source"), col("lang"))
  }

  /** CURRICULUM staging — the data-ordering step between curation and
    * the dataloader when training wants easy→hard progression (Bengio
    * et al. 2009): every doc gets its GLOBAL quality rank (1 = highest,
    * ties broken by doc_id so the order is total and engine-exact) and
    * an equal-size stage bucket 1..nStages, stage 1 served first. Rank
    * and staging are [[Relational.globalRowNumber]] + [[Relational
    * .ntileOf]] — the distributed global sort, never the accidental
    * one-partition `NTILE() OVER (ORDER BY ...)` window; the quality
    * signal is the SAME 6-dp score the gate and the preference pairs
    * use, so a corpus curates, stages, and packs under one metric.
    * Cost: one narrow (doc_id, quality) range shuffle + the barrier;
    * the text column never moves.
    */
  def curriculumStages(docs: DataFrame, nStages: Int = 4): DataFrame = {
    require(nStages >= 1, "need at least one stage")
    val scored = Par.spread(docs)
      .select(col("doc_id"), TextAnalysis.qualityColumn.as("quality"))
    val total = scored.count()
    val ranked = Relational.globalRowNumber(
      scored, Seq(col("quality").desc, col("doc_id").asc), as = "rank")
    ranked
      .withColumn("stage", Relational.ntileOf(col("rank"), total, nStages))
      .select(col("doc_id"), col("quality"), col("rank"), col("stage"))
      .orderBy(col("doc_id"))
  }
}
