package graft

/** Results must not depend on HOW the data is partitioned — the property
  * that lets the same code run on local[4] and a 1000-executor cluster.
  *
  * Each query runs twice: once at the suite's defaults, once with a prime
  * shuffle-partition count and pathologically small scan splits. That
  * changes the group→reducer mapping, the intra-partition arrival order,
  * and the physical plan AQE settles on; any operator leaning on iterator
  * order, float summation order, or partition-local tie-breaking diverges.
  * The suite targets the queries most at risk: sampling (hash-bucketed),
  * top-k/latest-per-key (tie-breaking), ordered collect_list, iterative
  * clustering, and the decimal-accumulated aggregates.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val targets = Seq(
    "q_hash_sample", "q_topk_per_group", "q_latest_per_key",
    "q_quartiles", "q_quantiles_exact", "q_sessionize", "q_user_journeys",
    "q_dedup_minhash_lsh", "q_simhash_pairs", "q_dedup_clusters",
    "q_decontaminate", "q_repetition", "q_domain_mix", "q_tfidf",
    "q_stratified_n", "q_dedup_editdist", "q_dedup_keepbest",
    "q_dedup_clusters_emb", "q_set_ops_join", "q_tfidf_pairs", "q_lm_score",
    "q_dedup_substring", "q_pack_sequences", "q_ingest_audit_lm",
    "q_domain_resample",
    // round-5 wave: quantized-mean clustering, within-cluster dedup,
    // df-threshold reassembly, decimal-logit scoring, temperature mixture
    "q_kmeans", "q_semantic_dedup", "q_boilerplate", "q_boilerplate_incr",
    "q_classifier", "q_ingest_audit_clf", "q_domain_mix_temp",
    "q_lm_bigram", "q_ccnet_buckets", "q_materialize_seqs",
    "q_fuzzy_decontaminate", "q_shuffle_shards", "q_length_buckets",
    // round-8 wave: incremental label re-vote (join-order-sensitive if the
    // delta bookkeeping leaned on arrival order), zone-map pruned read
    // (file-set selection), cross-modal cosines, md5-rank domain caps
    "q_label_prop_incr", "q_zorder_prune", "q_crossmodal_filter",
    "q_crossmodal_report", "q_domain_filter", "q_domain_gopher",
    "q_ann_mrl", "q_mixture_plan",
    // this round's wave: rank fusions and top-k draws (tie-breaking),
    // max_by/min_by reductions (arrival order), artifact cascades
    "q_bm25", "q_hybrid_search", "q_cdc_merge", "q_cdc_audit",
    "q_forget_cascade", "q_preference_pairs", "q_weighted_sample",
    "q_bm25_incr", "q_contrastive_pairs", "q_dedup_normalized",
    "q_emb_integrity", "q_cdc_compact", "q_ann_lsh_mp",
    "q_split_leakage_safe", "q_emb_drift", "q_chunk_dedup",
    "q_interval_join", "q_funnel", "q_hybrid_search_ann",
    // full-image MERGE (max_by reduction) + the MV folds (re-aggregated
    // partials must not depend on which reducer saw which epoch)
    "q_cdc_merge_full", "q_mv_incr", "q_mv_cdc", "q_mv_minmax")

  test("query results are invariant to shuffle-partition count and scan splits") {
    val missing = targets.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown queries in invariance sweep: $missing")
    val conf = spark.conf
    val defaults = Map(
      "spark.sql.shuffle.partitions" -> conf.get("spark.sql.shuffle.partitions"),
      "spark.sql.files.maxPartitionBytes" -> conf.get("spark.sql.files.maxPartitionBytes"))
    def run(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    try {
      for (name <- targets) {
        conf.set("spark.sql.shuffle.partitions", defaults("spark.sql.shuffle.partitions"))
        conf.set("spark.sql.files.maxPartitionBytes",
          defaults("spark.sql.files.maxPartitionBytes"))
        val base = run(name)
        assert(base.nonEmpty, s"$name returned no rows at sf0.001")
        conf.set("spark.sql.shuffle.partitions", "17")
        conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
        val reshuffled = run(name)
        assert(base == reshuffled,
          s"$name is partitioning-dependent: ${base.diff(reshuffled).take(3)} vs " +
            s"${reshuffled.diff(base).take(3)}")
      }
    } finally defaults.foreach { case (k, v) => conf.set(k, v) }
  }
}
