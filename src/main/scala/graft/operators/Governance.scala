package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus governance: the bookkeeping operators a managed training-data
  * lake runs between ingest and the dataloader — snapshot-to-snapshot
  * diffs (what changed since the last corpus release) and versioned,
  * deterministic train/val/test splits (the contract that keeps eval
  * honest across re-curations).
  *
  * Reference scope: the transit pipeline re-publishes full station/arrival
  * state on every poll (producers/connector.py:26-48 re-snapshots the
  * stations table; consumers rebuild tables from the changelog) — diffing
  * consecutive snapshots is the batch generalization of that changelog,
  * and split assignment is the curation-side contract the reference's
  * fixed station universe never needed but any ML corpus does.
  */
object Governance {

  /** Snapshot diff — per doc_id, how the new corpus release differs from
    * the old one: `added` (new id), `removed` (id gone), `changed` (same
    * id, different content digest), `unchanged`. Content identity is
    * md5(text) so the wide text column never crosses the shuffle — the
    * same digest-not-payload trade every dedup path here makes.
    *
    * Plan shape: two narrow (doc_id, digest) projections, ONE full-outer
    * hash join on doc_id, a codegen'd CASE. At 100 TB both snapshots
    * shuffle once on doc_id — and when snapshots land bucketed by doc_id
    * (the lake layout [[graft.sources.LakeSink]] writes), the exchange
    * disappears entirely: a storage-partitioned join over co-bucketed
    * releases. The diff row count is the changelog a downstream
    * incremental consumer (re-embed only `added`+`changed`, retire
    * `removed` from the index) budgets against.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("doc_id"), md5(col("text")).as("old_digest"))
    val n = newSnap.select(col("doc_id"), md5(col("text")).as("new_digest"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_digest").isNull, lit("added"))
          .when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest") === col("new_digest"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col("doc_id"), col("status"), col("old_digest"), col("new_digest"))
      .orderBy(col("doc_id"))
  }

  /** Per-source corpus report card — the one-page summary a curation run
    * publishes per release, per provenance: volume (docs / tokens /
    * chars), language spread, and the exact-duplicate mass (docs whose
    * md5(text) digest appears more than once ANYWHERE in the corpus —
    * cross-source copies count in every source holding one, which is what
    * a provenance audit wants to see).
    *
    * Plan shape: one narrow projection (digest + integer stats), a window
    * count over digest (the one exchange — digest groups mark their own
    * members, no broadcast of an unbounded dup set), then the per-source
    * aggregation whose key count is tiny. All-integer outputs, no
    * means/ratios, so the row set is engine-exact at any scale.
    */
  def sourceReportCard(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("digest"))
    docs
      .select(col("source"), col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("text")).as("digest"))
      .withColumn("dn", count(lit(1)).over(w))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("dn") > 1, 1L).otherwise(0L)).as("dup_docs"))
      .orderBy(col("source"))
  }

  /** Embedding-store integrity audit — the referential/shape contract
    * between the document corpus and its embedding table, checked in one
    * full-outer pass: docs with no vector (the re-embed backlog), vectors
    * with no doc (the retire backlog — exactly what [[snapshotDiff]]'s
    * `removed` rows should have retired), wrong-dimension rows (a mixed
    * model-version write), zero-norm rows (a failed encode — they poison
    * every cosine downstream, see the ANN tiers' zero-norm guards), and
    * NaN components (the arithmetic already happened somewhere upstream).
    * One audit row per defect class, integer counts — the gate a serving
    * index refresh runs before it trusts the table.
    *
    * Plan shape: one full-outer hash join on the id plus a narrow
    * projection of per-row flags, then a tiny class aggregation. The
    * flags are pure column math (`size`, `exists` over the float array) —
    * no kernel needed for an audit pass.
    */
  def embeddingIntegrity(
      docs: DataFrame, embeddings: DataFrame, dim: Int = 64): DataFrame = {
    val e = embeddings.select(
      col("vec_id").as("doc_id"),
      size(col("embedding")).as("edim"),
      exists(col("embedding"), v => isnan(v)).as("has_nan"),
      (aggregate(col("embedding"),
        lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")) === 0.0)
        .as("zero_norm"))
    docs.select(col("doc_id"), lit(1).as("in_docs"))
      .join(e, Seq("doc_id"), "full_outer")
      .select(
        when(col("edim").isNull, lit("missing_vector"))
          .when(col("in_docs").isNull, lit("orphan_vector"))
          .when(col("edim") =!= dim, lit("bad_dim"))
          .when(col("has_nan"), lit("nan_component"))
          .when(col("zero_norm"), lit("zero_norm"))
          .otherwise(lit("ok")).as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("status"))
  }

  /** Embedding drift audit between two snapshots of the same ids — the
    * re-embed QA gate: when an encoder is refreshed (new checkpoint, new
    * quantization, new preprocessing), per-id cosine(old, new) says
    * whether the space MOVED. Per label: stable (cos ≥ tau) / drifted /
    * flipped (cos < 0) counts plus the min and DECIMAL-exact mean cosine
    * — a label whose vectors flipped wholesale is the classic
    * sign-convention or normalization regression, and every stored
    * artifact fit on the old space (IVF centroids, PQ codebooks, kNN
    * graph — the SCALE.md centroid-staleness contract) must refit before
    * serving resumes.
    *
    * Plan shape: one co-keyed join of two narrow (id, vector) frames, the
    * fused cosine kernel per pair, a tiny per-label aggregation.
    */
  def embeddingDrift(
      oldSnap: DataFrame, newSnap: DataFrame, tau: Double = 0.99): DataFrame = {
    graft.plans.GraftFunctions.register(oldSnap.sparkSession)
    oldSnap.select(col("vec_id"), col("label"), col("embedding").as("a"))
      .join(newSnap.select(col("vec_id"), col("embedding").as("b")), Seq("vec_id"))
      .withColumn("cos", round(
        call_function("cosine_similarity", col("a"), col("b")), 6))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("cos") >= tau, 1L).otherwise(0L)).as("n_stable"),
        sum(when(col("cos") < tau && col("cos") >= 0.0, 1L).otherwise(0L))
          .as("n_drifted"),
        sum(when(col("cos") < 0.0, 1L).otherwise(0L)).as("n_flipped"),
        min(col("cos")).as("min_cos"),
        (sum(col("cos").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_cos"))
      .orderBy(col("label"))
  }

  /** Right-to-be-forgotten cascade — given a tombstone list of doc_ids,
    * enumerate EVERY derived artifact a deletion request must reach before
    * the lake can attest the data is gone: the documents themselves, their
    * byte-identical copies elsewhere in the corpus (a deletion request
    * covers the content, not one row id), the chunk artifacts cut from any
    * affected doc, and the packed training sequences that contain one
    * (those must be re-materialized — a sequence is an artifact of its
    * member docs). The output is the deletion work list, one row per
    * (artifact, affected doc): the thing a compliance job executes and a
    * governance audit files.
    *
    * Plan shape at scale: the tombstone list and its digest set are tiny
    * and ride as broadcasts — the corpus is probed twice with semi-join
    * filters (never shuffled on content), the chunk enumeration runs only
    * over the affected docs, and the pack-assignment join reuses the
    * corpus's existing (source, doc_id → seq_id) artifact grain
    * ([[Curation.packSequences]]'s one range exchange). Deleting from a
    * packed corpus without this membership join is the classic compliance
    * bug — the doc's tokens survive inside sequence files.
    */
  /** `budget` is the SAME token budget the corpus was packed with — it
    * feeds both [[Curation.packSequences]] and the straddle arithmetic
    * below from one parameter, so a lake packed at a non-default budget
    * cannot silently attest deletions against the wrong sequence grid
    * (the fragility a hardcoded constant had: change one site, and
    * deletion is attested while tokens survive in unlisted files).
    */
  def forgetCascade(
      docs: DataFrame, tombstones: DataFrame, budget: Long = 2048): DataFrame = {
    val digests = docs
      .join(broadcast(tombstones), Seq("doc_id"), "left_semi")
      .select(md5(col("text")).as("digest")).distinct()
    val affected = docs
      .withColumn("digest", md5(col("text")))
      .join(broadcast(digests), Seq("digest"), "left_semi")
      .join(broadcast(tombstones.withColumn("req", lit(1))),
        Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("req").isNotNull, lit("requested"))
          .otherwise(lit("exact_copy")).as("reason"))
    val docRows = affected.select(
      lit("document").as("artifact"),
      col("doc_id").cast("string").as("artifact_key"),
      col("doc_id"), col("reason"))
    val chunkRows = Curation
      .chunkDocuments(docs.join(broadcast(affected), Seq("doc_id"), "left_semi"))
      .join(broadcast(affected), Seq("doc_id"))
      .select(
        lit("chunk").as("artifact"),
        concat(col("doc_id").cast("string"), lit(":"),
          col("chunk_idx").cast("string")).as("artifact_key"),
        col("doc_id"), col("reason"))
    // EVERY sequence the doc's tokens touch, not just the one it starts
    // in: a doc straddling a budget boundary spills into the next
    // sequence(s) — [start DIV budget .. (cum_tokens-1) DIV budget].
    // Missing the continuation is the compliance bug where a deletion is
    // attested while the doc's tail tokens survive in the next file.
    val seqRows = Curation.packSequences(docs, budget)
      .join(broadcast(affected), Seq("doc_id"))
      .select(col("source"), col("doc_id"),
        explode(sequence(
          expr(s"(cum_tokens - n_tokens) DIV ${budget}L"),
          expr(s"(cum_tokens - 1) DIV ${budget}L"))).as("seq_id"))
      .select(
        lit("packed_seq").as("artifact"),
        concat(col("source"), lit(":"),
          col("seq_id").cast("string")).as("artifact_key"),
        col("doc_id"), lit("contains_forgotten").as("reason"))
    docRows.unionAll(chunkRows).unionAll(seqRows)
      .orderBy(col("artifact"), col("artifact_key"), col("doc_id"))
  }

  /** LEAKAGE-SAFE train/val/test split — [[trainValTestSplit]]'s seeded
    * md5 draw keyed by the document's NEAR-DUP CLUSTER instead of its own
    * id, so a doc and its paraphrases/mirrors always land in the SAME
    * split. Splitting by doc_id alone has a quiet eval bug: a near-dup
    * pair straddling train/test leaks the test set through the training
    * copy (the same indirect channel [[Dedup.transitiveContamination]]
    * closes for benchmarks, applied to the corpus's own eval slice).
    * The split KEY is content-derived: min md5(text) over the cluster's
    * members — the same content digest every dedup/forget path here keys
    * on — never the cluster's min doc_id (row identity). Stability
    * contract, precisely: a doc's split survives any re-curation that
    * (a) re-assigns doc_ids (re-IDing the corpus moves no one — an
    * id-keyed split fails this), or (b) drops cluster members OTHER than
    * the one holding the cluster's min digest; dropping that member
    * re-keys the survivors (inherent to any membership-derived key — the
    * cluster IS its members), and a singleton's key is its own digest,
    * stable under everything but its own edit.
    *
    * Cost: the near-dup clustering artifact the pipeline already builds
    * ([[Dedup.nearDupClusters]] — banded pair generation + CC), plus one
    * narrow digest join and a cluster-count-sized min aggregation. When
    * the cluster table is stored per release, the split is a projection
    * plus one tiny join, the same order as the naive one.
    */
  def leakageSafeSplit(
      docs: DataFrame, seed: String = "v1",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val clusters = Dedup.nearDupClusters(docs)
    val keys = clusters
      .join(docs.select(col("doc_id"), md5(col("text")).as("ck")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(min(col("ck")).as("content_key"))
    clusters.join(keys, Seq("cluster_id"))
      .withColumn("bucket",
        conv(substring(md5(concat(lit(seed), lit(":"),
          col("content_key"))), 1, 15), 16, 10).cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("cluster_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Versioned deterministic train/val/test split: each document's bucket
    * is md5(seed ":" doc_id) reduced mod 100 — the replayable uniform draw
    * every sampler here uses ([[Relational.hashStratifiedSample]],
    * [[Curation.rebalanceSample]]), SALTED with a split seed so a
    * re-split is a new named version (change the seed, get an independent
    * partition; keep it, and every re-curation of the corpus lands each
    * surviving doc in the SAME split — the property that stops eval-set
    * leakage across corpus releases, because membership depends only on
    * (seed, doc_id), never on ordering, partitioning, or what else
    * survived curation).
    *
    * Stratification comes free in expectation: the hash is uniform within
    * every source/lang stratum, so each stratum splits ~trainPct/valPct/
    * rest without a per-stratum pass (the exact-n variant is
    * [[Relational.stratifiedFixedN]]'s job). Plan: one narrow codegen'd
    * projection, no shuffle, no state — it composes in front of the gate
    * or the dataloader at any scale.
    */
  def trainValTestSplit(
      docs: DataFrame, seed: String = "v1",
      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    docs
      .withColumn("bucket",
        conv(substring(md5(concat(lit(seed), lit(":"), col("doc_id").cast("string"))),
          1, 15), 16, 10).cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("source"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))
}
