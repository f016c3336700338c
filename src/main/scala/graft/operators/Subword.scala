package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subword (BPE-style) tokenization — fit a merges table on the corpus,
  * serve it as a row-local fold. Every token-budgeted operator
  * (lengthBuckets, packSequences, materializeSequences) budgets whitespace
  * tokens; a real dataloader budgets SUBWORD counts — this operator is the
  * bridge.
  *
  * Fit ([[fitMerges]]): classic byte-pair-encoding structure, made
  * engine-replayable. The word-frequency table (one explode+groupBy
  * shuffle) is capped to the `maxVocab` most frequent words (orderBy+limit
  * — TakeOrderedAndProject, O(maxVocab) to the driver like
  * `ivfCentroids`); then `rounds` rounds each (1) aggregate adjacent
  * symbol-pair frequencies weighted by word count, (2) take the top
  * `mergesPerRound` pairs by (total desc, pair asc) — deterministic ties —
  * and (3) apply them to the vocab symbolization in rank order. Batching
  * M merges per round instead of re-counting after every single merge is
  * the scale trade (R aggregation jobs instead of R·M); multi-character
  * subwords still emerge because later rounds pair previously-merged
  * symbols. The oracle replays the fit as R chained CTE blocks — the
  * `duckKmeansCtes` iterative-fit pattern.
  *
  * Symbol encoding (the engine-portability trick): a token's symbol
  * sequence is ONE string with every symbol wrapped as STX·sym·ETX (U+0002/U+0003).
  * Applying merge (a,b) is then a plain non-overlapping left-to-right
  * string `replace` of "(a)(b)" by "(ab)" — exactly the greedy BPE merge
  * scan — and Spark's `replace` and DuckDB's `replace` share those
  * semantics, so fit and serve replay bit-identically in the oracle. The
  * wrappers make occurrences self-delimiting: "(a)(b)(a)(b)" rewrites to
  * "(ab)(ab)" in one pass, "(a)(a)(a)" to "(aa)(a)" — no shared-boundary
  * misses. Contract: corpus text must not contain U+0001..U+0003
  * (SubwordSpec pins this for the harness corpus).
  *
  * Serve ([[subwordCounts]], [[lengthBuckets]]): the merges ship as a
  * ONE-ROW broadcast frame holding the rank-ordered array (the `lmModel`
  * serve pattern) and each token folds over it row-locally
  * (`aggregate(merges, wrap(tok), replace)`) — no shuffle, no state, no
  * UDF; refreshing the model swaps the static side without replanning.
  * 100 TB shape: the fold is O(merges) codegen'd string ops per token;
  * fit cost is bounded by `maxVocab`, not the corpus.
  */
object Subword {

  private val Open = "\u0002"
  private val Close = "\u0003"

  /** One learned merge: `rank` is the global application order. */
  case class Merge(rank: Int, a: String, b: String)

  /** Wrapped-symbol initialization: each character of the token becomes a
    * STX·c·ETX symbol. `split(tok, "")` keeps a trailing empty slot
    * (Java split with limit -1), hence the filter.
    */
  private def wrap(tok: Column): Column =
    array_join(transform(
      filter(split(tok, ""), c => c =!= ""),
      c => concat(lit(Open), c, lit(Close))), "")

  /** Symbol list back out of a wrapped string. */
  private def syms(seq: Column): Column =
    transform(
      filter(split(seq, Open), s => s =!= ""),
      s => translate(s, Close, ""))

  /** Apply literal merges in rank order (fit-side: the merges just
    * collected for this round).
    */
  private def applyLiteral(seq: Column, ms: Seq[Merge]): Column =
    ms.sortBy(_.rank).foldLeft(seq) { (acc, m) =>
      call_function("replace", acc,
        lit(Open + m.a + Close + Open + m.b + Close),
        lit(Open + m.a + m.b + Close))
    }

  /** Fold a wrapped token over the broadcast merges array (serve-side). */
  private def applyTable(tok: Column, merges: Column): Column =
    aggregate(merges, wrap(tok), (acc, m) =>
      call_function("replace", acc,
        concat(lit(Open), m.getField("a"), lit(Close),
          lit(Open), m.getField("b"), lit(Close)),
        concat(lit(Open), m.getField("a"), m.getField("b"), lit(Close))))

  /** Symbol count of a folded wrapped string = its STX count. */
  private def symbolCount(folded: Column): Column =
    (length(folded) - length(translate(folded, Open, ""))).cast("long")

  /** JVM twin of the serve fold — Catalyst higher-order functions evaluate
    * interpreted AND the HOF form rebuilds each merge's search pattern per
    * token; the kernel precomputes the pattern table once per partition
    * and runs the same literal left-to-right non-overlapping
    * `String.replace` scan (identical semantics to SQL `replace`), with
    * code-point iteration matching `split(tok, "")`. SubwordSpec pins
    * kernel == HOF on the corpus; all string ops, so parity is exact
    * equality, not epsilon.
    */
  private[operators] def patternTable(merges: Seq[Merge]): Array[(String, String)] =
    merges.sortBy(_.rank).map(m =>
      (Open + m.a + Close + Open + m.b + Close, Open + m.a + m.b + Close)).toArray

  private[operators] def foldKernel(tok: String, pats: Array[(String, String)]): String = {
    val sb = new java.lang.StringBuilder(tok.length * 3)
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      sb.append(Open).appendCodePoint(cp).append(Close)
      i += Character.charCount(cp)
    }
    var s = sb.toString
    var j = 0
    while (j < pats.length) { s = s.replace(pats(j)._1, pats(j)._2); j += 1 }
    s
  }

  private def countOpen(folded: String): Long = {
    val o = Open.charAt(0)
    var c = 0L; var i = 0
    while (i < folded.length) { if (folded.charAt(i) == o) c += 1; i += 1 }
    c
  }

  def fitMerges(
      docs: DataFrame, rounds: Int = 3, mergesPerRound: Int = 20,
      maxVocab: Int = 512): Seq[Merge] = {
    require(rounds >= 1 && mergesPerRound >= 1 && maxVocab >= 1)
    val wc = Par.spread(docs)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    // checkpointed: every round's pair-count collect re-derived the
    // corpus word count + top-K through the accumulating merge chain
    // (rounds × full corpus passes); the working vocabulary is at most
    // maxVocab rows, so materializing it once leaves each round a
    // trivial plan over the cached frame
    var vocab = wc
      .orderBy(col("cnt").desc, col("token")).limit(maxVocab)
      .select(col("token"), col("cnt"), wrap(col("token")).as("seq"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    for (r <- 0 until rounds) {
      val pairs = vocab
        .select(col("cnt"), syms(col("seq")).as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(0), size(col("syms")) - 2),
          i => struct(
            element_at(col("syms"), i + 1).as("a"),
            element_at(col("syms"), i + 2).as("b")))).as("p"))
        .groupBy(col("p").getField("a").as("a"), col("p").getField("b").as("b"))
        .agg(sum(col("cnt")).as("total"))
        .orderBy(col("total").desc, col("a"), col("b"))
        .limit(mergesPerRound)
        .collect()
      val ms = pairs.zipWithIndex.map { case (row, i) =>
        Merge(r * mergesPerRound + i + 1, row.getString(0), row.getString(1))
      }.toSeq
      out ++= ms
      vocab = vocab.withColumn("seq", applyLiteral(col("seq"), ms))
    }
    out.toSeq
  }

  /** The learned merges as the one-row broadcast serving frame:
    * (merges: array<struct<a,b>>) in rank order.
    */
  def mergesTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "a", "b")
      .agg(sort_array(collect_list(
        struct(col("rank"), col("a"), col("b")))).as("ms"))
      .select(transform(col("ms"), m =>
        struct(m.getField("a").as("a"), m.getField("b").as("b"))).as("merges"))
  }

  /** The merges themselves as a query result (rank, a, b) — the model
    * artifact a pipeline persists and the direct correctness check on the
    * fit.
    */
  def mergesFrame(docs: DataFrame, rounds: Int = 3, mergesPerRound: Int = 20,
      maxVocab: Int = 512): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fitMerges(docs, rounds, mergesPerRound, maxVocab)
      .map(m => (m.rank.toLong, m.a, m.b)).toDF("rank", "a", "b")
      .orderBy(col("rank"))
  }

  /** Per-document subword budget: whitespace token count vs BPE subword
    * count under the merges table, plus their ratio — the correction
    * factor between the whitespace budgets used elsewhere and a real
    * dataloader's subword budgets.
    */
  def subwordCounts(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pats = spark.sparkContext.broadcast(patternTable(merges))
    Par.spread(docs.select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions { it =>
        val ps = pats.value
        it.map { case (id, text) =>
          val toks = text.split(" ", -1) // limit -1 = Spark split semantics
          var subs = 0L
          var i = 0
          while (i < toks.length) { subs += countOpen(foldKernel(toks(i), ps)); i += 1 }
          (id, toks.length.toLong, subs)
        }
      }.toDF("doc_id", "n_tokens", "n_subwords")
      .withColumn("subword_ratio",
        when(col("n_tokens") > 0,
          round(col("n_subwords").cast("double") / col("n_tokens").cast("double"), 6))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer fertility audit, per language — the per-release number a
    * tokenizer owner watches: subwords per whitespace word ("fertility")
    * and characters per subword ("compression"). A language whose
    * fertility drifts up is being fragmented by a merges table fit on
    * someone else's distribution — the signal that the vocab budget needs
    * re-allocating before a training run pays the token-count bill.
    *
    * Same row-local fold kernel as [[subwordCounts]] with lang carried
    * through the partition walk (no join back to the corpus), then one
    * tiny per-lang aggregation: integer sums shuffle, the two ratios are
    * single rounded double divisions on the reduced rows — engine-exact.
    * Scale: O(tokens × merges) compute, one |langs|-key exchange.
    */
  def fertilityByLang(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pats = spark.sparkContext.broadcast(patternTable(merges))
    Par.spread(docs.select(col("lang"), col("doc_id"), col("text")))
      .as[(String, Long, String)]
      .mapPartitions { it =>
        val ps = pats.value
        it.map { case (lang, _, text) =>
          val toks = text.split(" ", -1)
          var subs = 0L
          var i = 0
          while (i < toks.length) { subs += countOpen(foldKernel(toks(i), ps)); i += 1 }
          (lang, toks.length.toLong, subs, text.length.toLong)
        }
      }.toDF("lang", "n_tokens", "n_subwords", "n_chars")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_subwords")).as("total_subwords"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("fertility", round(
        col("total_subwords").cast("double") / col("total_tokens").cast("double"), 6))
      .withColumn("chars_per_subword", round(
        col("total_chars").cast("double") / col("total_subwords").cast("double"), 6))
      .orderBy(col("lang"))
  }

  /** The declarative twin of [[subwordCounts]] (the aggregate∘transform
    * HOF fold) — kept as the parity baseline the kernel is pinned to.
    */
  private[graft] def subwordCountsHof(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val mt = mergesTable(docs.sparkSession, merges)
    Par.spread(docs)
      .crossJoin(broadcast(mt))
      .select(col("doc_id"), split(col("text"), " ").as("toks"), col("merges"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        aggregate(
          transform(col("toks"), t => symbolCount(applyTable(t, col("merges")))),
          lit(0L), (acc, v) => acc + v).as("n_subwords"))
      .withColumn("subword_ratio",
        when(col("n_tokens") > 0,
          round(col("n_subwords").cast("double") / col("n_tokens").cast("double"), 6))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id"))
  }

  /** The tokenizer's id table, GPT-2 style: base symbols = the corpus's
    * distinct characters, ids 0.. by ascending character; then each merge
    * in rank order appends its created symbol `a+b` (first creation wins
    * when two merge paths build the same string). A symbol outside the
    * table encodes as -1 — impossible for corpus text (every character is
    * a base symbol, every merged symbol is in the table) but the
    * deterministic convention for serving unseen streams.
    */
  def vocab(docs: DataFrame, merges: Seq[Merge]): Seq[(String, Long)] = {
    val chars = docs
      .select(explode(filter(split(col("text"), ""), c => c =!= "")).as("c"))
      .distinct().orderBy(col("c"))
      .collect().map(_.getString(0)).toSeq
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    chars.zipWithIndex.foreach { case (c, i) => out(c) = i.toLong }
    merges.sortBy(_.rank).foreach { m =>
      val sym = m.a + m.b
      if (!out.contains(sym)) out(sym) = out.size.toLong
    }
    out.toSeq
  }

  /** Encode every document to its subword id sequence — (doc_id, pos, sym,
    * token_id), 1-based position over the doc's full subword stream. The
    * materialized form a dataloader reads; the whole pipeline is columnar:
    * the merges fold per token (the [[subwordCounts]] serve path), one
    * flatten+posexplode, and a broadcast equi-join against the id table.
    * 100 TB shape: no shuffle except the broadcast probe — output stays
    * partitioned by input split; the id table is O(vocab) and ships once.
    */
  def encodeIds(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vdf = broadcast(vocab(docs, merges).toDF("sym", "id"))
    val pats = spark.sparkContext.broadcast(patternTable(merges))
    Par.spread(docs.select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions { it =>
        val ps = pats.value
        it.map { case (id, text) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          text.split(" ", -1).foreach { t =>
            // same symbol extraction as syms(): split on STX, drop the
            // leading empty, strip the trailing ETX of each symbol
            foldKernel(t, ps).split(Open, -1).foreach { s =>
              if (s.nonEmpty) out += s.replace(Close, "")
            }
          }
          (id, out.toSeq)
        }
      }.toDF("doc_id", "syms")
      .select(col("doc_id"), posexplode(col("syms")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("sym"))
      .join(vdf, Seq("sym"), "left_outer")
      .select(col("doc_id"), col("pos"), col("sym"),
        coalesce(col("id"), lit(-1L)).as("token_id"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** [[Curation.lengthBuckets]] on the SUBWORD count — the bucket a real
    * dataloader would assign. Same power-of-two ladder.
    */
  def lengthBuckets(
      docs: DataFrame, merges: Seq[Merge],
      minBucket: Int = 16, maxBucket: Int = 2048): DataFrame = {
    require(minBucket >= 1 && Integer.bitCount(minBucket) == 1 &&
      Integer.bitCount(maxBucket) == 1 && maxBucket >= minBucket,
      "buckets must be powers of two")
    val steps = Iterator.iterate(minBucket)(_ * 2)
      .takeWhile(_ <= maxBucket).toSeq
    val counted = subwordCounts(docs, merges)
    val n = col("n_subwords")
    val bucket = steps.reverse.foldLeft(lit(maxBucket.toLong)) {
      (acc, b) => when(n <= b, lit(b.toLong)).otherwise(acc)
    }
    counted
      .select(col("doc_id"), n.as("n_subwords"), bucket.as("bucket"))
      .orderBy(col("doc_id"))
  }
}
