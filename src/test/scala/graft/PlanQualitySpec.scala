package graft

/** Plan-shape assertions for the headline queries (the `.explain` review the
  * 100 TB design demands): pushdowns reach the scan, dimensions broadcast,
  * top-k compiles to TakeOrdered, aggregates are partial (map-side combine).
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("pricing summary: partial aggregation and shipdate filter pushed to scan") {
    val p = plan("q_pricing_summary")
    assert(p.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final agg")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
  }

  test("revenue by nation: all dimension joins broadcast, no sort-merge join") {
    val p = plan("q_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("filter+project reads only 3 columns from the scan") {
    val p = plan("q_filter_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"), s"column pruning failed: $readSchema")
  }

  test("doc stats prunes to doc_id + text") {
    val p = plan("q_doc_stats")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("source") && !readSchema.contains("n_chars"),
      s"column pruning failed: $readSchema")
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("q_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("tfidf: per-term df table joins broadcast, no fact-side sort-merge") {
    val p = plan("q_tfidf")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sessionize: both windows and the rollup share one user_id exchange") {
    val p = plan("q_sessionize")
    // exchanges: Par.spread round-robin + hashpartitioning(user_id) + the
    // tiny final-agg exchange; the two Window ops and the session rollup
    // must NOT add extra user_id shuffles
    val hashExchanges = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(user_id"))
      .size
    assert(hashExchanges == 1, s"expected one user_id exchange, plan:\n$p")
  }

  test("hash-stratified sample is a pure narrow projection (no shuffle, no join)") {
    val p = plan("q_hash_sample")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    // one exchange for the final orderBy + the spread; nothing key-based
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("lake keyed point-read: key probe and DV resolution both broadcast, never sort-merge") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.sources.LakeTable
    val dir = java.nio.file.Files
      .createTempDirectory("graft-planlake").toString + "/t"
    LakeTable.init((0L until 400L).map(k => (k, s"n$k", k * 1.0))
      .toDF("key", "name", "val"), dir, Seq("key"), nFiles = 4)
    // shadow one file so the point read resolves through a DV sidecar
    LakeTable.applyTombstonesDv(spark, dir, Seq(10L).toDF("key"))
    val read = LakeTable.readKeyed(spark, dir, Seq(11L, 12L).toDF("key"))
    val p = read.queryExecution.executedPlan.toString
    // the semi probe AND the DV anti-join are broadcast joins — neither
    // the keys nor a tombstone sidecar is ever data-sized, so the 100 TB
    // point read never shuffles the fact side (the only exchanges left
    // are the key-set-sized distincts on the BUILD sides)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
    // the fact scan feeds its joins directly: no exchange between the
    // data-file FileScan and the first join (fact-side shuffle = failure)
    val factSubtree = p.linesIterator
      .dropWhile(!_.contains("BroadcastHashJoin"))
      .takeWhile(!_.contains("BroadcastExchange")).mkString("\n")
    assert(!factSubtree.contains("Exchange hashpartitioning"),
      s"a keyed point read must not shuffle the fact side:\n$p")
  }

  test("runtime bloom filter prunes the fact scan when the dim can't broadcast") {
    // The 100 TB shape: dims too big to broadcast -> shuffle join; Spark then
    // converts a selective dim predicate into a bloom runtime filter applied
    // at the fact scan, cutting shuffle volume before the join. Local sizes
    // are far below the production thresholds, so lower them to observe the
    // same rewrite the big cluster would get.
    import org.apache.spark.sql.functions._
    val keep = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // raw loaders: the injection pattern requires a plain
      // scan/filter/project application side (no Repartition in between),
      // which is also what a realistically-split 100 TB input looks like
      val j = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders")
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom"), s"expected runtime bloom filter, got:\n$p")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("no shipped query plans a partition-less window (single-task funnel)") {
    // A Window with an empty partitionSpec sorts the ENTIRE input through one
    // task — correct on 60k rows, dead at 100 TB. Sweep every shipped query's
    // optimized plan so the next one can't land unnoticed (round-2 verdict:
    // q_quartiles did exactly this).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit}
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      val globalWindows = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w.nodeName
        case w: WindowGroupLimit if w.partitionSpec.isEmpty => w.nodeName
      }
      globalWindows.map(n => s"$name: $n")
    }
    assert(offenders.isEmpty,
      s"partition-less Window operators found:\n${offenders.mkString("\n")}")
  }

  test("global rank: range exchange, no SinglePartition, windows keyed by partition id") {
    // the whole point of globalRowNumber is replacing the one-partition
    // sort: its plan must contain a RANGE repartition and NO exchange to
    // a single partition anywhere
    val p = plan("q_global_rank")
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"),
      s"expected a range exchange:\n$p")
    assert(!p.contains("SinglePartition"),
      s"a SinglePartition exchange defeats the operator:\n$p")
  }

  test("temporal dimension join: key equality drives a hash join, interval is residual") {
    // the interval predicate must ride a key-equality join (hash or
    // sort-merge), never a BroadcastNestedLoopJoin range join
    val p = plan("q_scd2_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"interval predicate must be residual on the key join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected a key-driven join:\n$p")
  }

  test("quartile binning matches NTILE(4) exactly, including boundary ties") {
    // planted ties straddling every bucket boundary: 12 rows, 3 distinct
    // prices x 4 — each boundary cuts through a tie run
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.operators.Relational
    val rows = (1L to 12L).map(k => (k, Seq(10.0, 20.0, 30.0)((k % 3).toInt)))
    val orders = rows.toDF("o_orderkey", "o_totalprice")
    val got = Relational.priceQuartiles(orders).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    val want = orders.withColumn("q", ntile(4).over(w))
      .groupBy(col("q")).agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      .orderBy(col("q")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
    // and an n % 4 != 0 case: 10 rows -> buckets 3,3,2,2
    val odd = (1L to 10L).map(k => (k, (k / 2).toDouble)).toDF("o_orderkey", "o_totalprice")
    val gotOdd = Relational.priceQuartiles(odd).collect().map(_.getLong(1)).toSeq
    assert(gotOdd == Seq(3L, 3L, 2L, 2L))
  }

  test("grouped count: map-side partial agg over a vectorized 1-column scan") {
    // (AQE prints the pre-execution plan without WholeStageCodegen wrappers;
    // the codegen-ability is implied by Batched vectorized scan + HashAggregate)
    val p = plan("q_grouped_count")
    assert(p.contains("partial_count"), p)
    assert(p.contains("Batched: true"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props") && !readSchema.contains("event_type"),
      s"column pruning failed: $readSchema")
  }

  test("decontamination: benchmark vocabulary joins broadcast; %97 filters push below the explodes") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // both branches filter doc_id BEFORE generating shingles — the bench
    // branch must not shingle the whole corpus
    assert("% 97".r.findAllIn(p).size >= 2, p)
  }

  test("semantic index serve is size-aware: small index broadcasts, oversized degrades to sort-merge") {
    val emb = Tables.load(spark, sf, "embeddings")
    val idx = graft.operators.Dedup.buildSemanticIndex(emb, k = 4, iters = 1)
    assert(idx.sizeHintBytes > 0, "builder must record a size hint")
    // under the default 10MB threshold the sf0.001 index fits -> hinted
    // broadcast (the fast path q_ingest_audit_sem measures)
    val pSmall = graft.operators.Dedup.semanticNoveltyProbe(emb.limit(20), idx)
      .queryExecution.executedPlan.toString
    assert(pSmall.contains("BroadcastHashJoin"), pSmall)
    // shrink the session threshold below the recorded hint: the probe must
    // NOT force the broadcast — Spark degrades the (stream-)static join to
    // sort-merge instead of OOMing the driver on an oversized index
    val keep = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
    try {
      assert(idx.sizeHintBytes > 1024, s"hint ${idx.sizeHintBytes} not above 1KB")
      val pBig = graft.operators.Dedup.semanticNoveltyProbe(emb.limit(20), idx)
        .queryExecution.executedPlan.toString
      assert(pBig.contains("SortMergeJoin"), pBig)
      assert(!pBig.contains("BroadcastHashJoin"), pBig)
    } finally keep match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("edit-distance dedup: candidate blocks shuffle ids+keys only, never text") {
    val df = graft.operators.Dedup.editDistancePairs(Tables.documents(spark, sf))
    val p = df.queryExecution.executedPlan.toString
    // pairs generate in-group under the blockCap short-circuit: the block-key
    // shuffle feeds MapGroups with (doc_id, lang, tok0, blk) only — text
    // re-attaches through the post-dedup broadcast joins on i/j
    val groupLines = p.linesIterator.filter(_.contains("MapGroups")).toSeq
    assert(groupLines.nonEmpty, p)
    assert(!groupLines.exists(_.contains("text#")),
      s"block grouping must not carry document text: $groupLines")
    assert(!p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("text#")),
      "no shuffle may carry document text")
  }

  test("tfidf cosine pairs: df/N broadcast; the posting self-join ships ONE exchange") {
    val df = SparkEntry.queries("q_tfidf_pairs")(spark, sf)
    df.collect() // finalize the AQE plan so exchange reuse is visible
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    // both legs of the w-frame self-join are the same subplan: the doc-term
    // aggregate's shuffle must be planned once and reused, not shipped twice
    assert(p.contains("ReusedExchange"), s"posting exchange not reused:\n$p")
  }

  test("knn graph: top-k pushed below the exchange, no forced broadcast hint") {
    val p = plan("q_knn_graph")
    // Spark 4 WindowGroupLimit: per-partition top-k runs BEFORE the rank
    // exchange, so k·P rows shuffle instead of every scored pair
    assert(p.contains("WindowGroupLimit"), s"rank limit not pushed down:\n$p")
    // the self-join must stay AQE's choice: at this SF it may broadcast,
    // but the logical plan carries no hint — assert by building the graph
    // over a frame with the hint-blocking threshold disabled
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val forced = SparkEntry.queries("q_knn_graph")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!forced.contains("BroadcastHashJoin"),
        s"broadcast forced by hint (survives threshold=-1):\n$forced")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("graph search: final plan is a top-k over the materialized frontier") {
    // each hop materializes (localCheckpoint) before the next expands, so
    // the served plan is just per-query top-k over the tiny frontier —
    // the hop joins themselves ran as broadcast probes at build time
    val p = plan("q_graph_search")
    assert(p.contains("ExistingRDD"), s"frontier not materialized:\n$p")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("source report card: one digest exchange feeds the window, no dup-set broadcast join") {
    val p = plan("q_source_report")
    assert(p.contains("Window"), p)
    // the dup marking must be the window count, not a join against a
    // collected dup-digest set
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("graph maintainer cell read is manifest-pruned: only the requested cells' files open, no shuffle") {
    import org.apache.spark.sql.functions._
    import graft.streaming.GraphMaintainer
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-plangraph").toString
    val m = GraphMaintainer.build(
      emb.select(col("vec_id"), col("embedding")), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = GraphMaintainer.latestEntries(fs, dir)
    val cells = entries.keys.collect {
      case (a, c) if a == GraphMaintainer.RoutingArt => c
    }.toSeq.sorted
    assert(cells.size >= 3, s"fixture needs several cells, got $cells")
    val want = cells.take(2).toSet
    val read = GraphMaintainer.readArtifact(
      spark, dir, GraphMaintainer.RoutingArt, entries, Some(want))
    // pruning happens at the MANIFEST, before Spark ever lists: the
    // scan's input files sit exclusively under the wanted cells' dirs —
    // at 100 TB the untouched cells are never even listed, which beats
    // catalog partition pruning (O(all partitions) listing) outright
    val files = read.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(f => want.exists(c => f.contains(s"/cell=$c/"))),
      s"scan escaped the manifest-chosen cells: ${files.take(3).mkString(", ")}")
    // and the read is a pure scan + project — no exchange, no join
    val p = read.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"), p)
    assert(m.graph.inputFiles.nonEmpty) // full read resolves the same manifest
  }

  test("sketch audits: the tiny sketch/totals frames broadcast onto the fact side, never a fact sort-merge") {
    // the tolerance audits' scale shape: q_approx_quantiles joins the
    // 3-row sketch result back to lineitem for ONE conditional-agg pass,
    // and q_token_freq_sketch joins the 30-row emitted set + 1-row total
    // onto the exact counts — all small sides must broadcast
    val pq = plan("q_approx_quantiles")
    assert(pq.contains("BroadcastHashJoin"), pq)
    assert(!pq.contains("SortMergeJoin"), pq)
    val pt = plan("q_token_freq_sketch")
    assert(pt.contains("BroadcastHashJoin"), pt)
    assert(!pt.contains("SortMergeJoin"), pt)
    val pd = plan("q_approx_distinct")
    assert(!pd.contains("SortMergeJoin"), pd)
  }

  private val Dedup = graft.operators.Dedup
}
