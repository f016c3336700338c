package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.{Curation, TextAnalysis}
import graft.streaming.StreamCuration

// top-level so Spark can construct instances without an outer-scope pointer
// (groupByKey's deserializer rejects spec-inner case classes)
case class CorpusDoc(doc_id: Long, source: String, text: String)

case class EmbRow(vec_id: Long, embedding: Array[Float])

/** Batch/stream equivalence for the corpus resample and packing stages:
  * replay the same fixture through the streaming twins across multiple
  * micro-batches and assert the output equals the batch operators'.
  */
class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  private type Doc = CorpusDoc
  private val Doc = CorpusDoc

  private def words(seed: Int, n: Int) = (1 to n).map(i => s"w$seed-$i").mkString(" ")

  // skewed mixture: `big` thins under the uniform target, `small` keeps all
  private val fixture: Seq[Doc] =
    (1 to 12).map(i => Doc(i.toLong, "big", words(i, 20))) ++
      (1 to 3).map(i => Doc(100L + i, "small", words(1000 + i, 10)))

  test("gopher rule battery on the stream equals the batch verdicts per doc") {
    implicit val sqlCtx = spark.sqlContext
    // mix fixture docs (all short -> r_word_count trips) with a long clean
    // one so both verdicts appear on the stream
    val clean = Doc(500L, "big",
      ("the quick brown foxes jumped over the lazy sleeping dogs " * 6).trim)
    val rows = fixture :+ clean
    val expected = TextAnalysis.gopherRules(rows.toDF())
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[Long]("n_words"))).toMap
    assert(expected.values.exists(_._1) && expected.values.exists(!_._1))
    val input = MemoryStream[Doc]
    val q = TextAnalysis.gopherRulesStream(input.toDF())
      .writeStream.format("memory").queryName("sgopher")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = rows.partition(_.doc_id % 2 == 0)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("sgopher").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Boolean]("keep"), r.getAs[Long]("n_words"))).toMap
      assert(got == expected, s"stream verdicts diverged:\n$got\n$expected")
    } finally q.stop()
  }

  test("streaming rebalance draw replays the batch sample exactly") {
    implicit val sqlCtx = spark.sqlContext
    val batchDf = fixture.toDF()
    val expected = Curation.rebalanceSample(batchDf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rate"))).sorted.toSeq
    assert(expected.nonEmpty && expected.size < fixture.size,
      "fixture must make the draw non-trivial (some kept, some dropped)")
    // the batch job owns the mixture; the stream consumes it as a static side
    val mixture = TextAnalysis.domainMixture(batchDf)
    val input = MemoryStream[Doc]
    val q = StreamCuration.rebalanceSample(input.toDF(), mixture)
      .writeStream.format("memory").queryName("sresample")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = fixture.partition(_.doc_id % 2 == 0)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("sresample").collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
          r.getAs[Double]("rate"))).sorted.toSeq
      assert(got == expected, s"stream draw diverged from batch:\n$got\n$expected")
    } finally q.stop()
  }

  test("stateful packing across micro-batches equals batch packSequences") {
    implicit val sqlCtx = spark.sqlContext
    val batchDf = fixture.toDF()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"))
    val expected = Curation.packSequences(batchDf, budget = 50).collect()
      .map(key).sorted.toSeq
    val input = MemoryStream[Doc]
    val q = StreamCuration.packSequences(input.toDF(), budget = 50)
      .writeStream.format("memory").queryName("spack")
      .outputMode(OutputMode.Append()).start()
    try {
      // per-source append order across batches (the documented contract):
      // each source's later batch carries only larger doc_ids
      val b1 = fixture.filter(d => d.doc_id <= 6 || d.doc_id == 101L)
      val b2 = fixture.filterNot(b1.contains(_))
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("spack").collect().map(key).sorted.toSeq
      assert(got == expected, s"stream packing diverged from batch:\n$got\n$expected")
      // the budget actually bins: the big source spans multiple sequences
      assert(got.filter(_._1 == "big").map(_._5).distinct.size > 1)
    } finally q.stop()
  }

  test("chunkDocuments is stream-legal as-is: stateless windows, batch parity") {
    // chunking is a per-row projection + explode — no state, no output-mode
    // constraint — so the BATCH operator runs unchanged on a stream; assert
    // the replay matches the batch output exactly
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = Curation.chunkDocuments(input.toDF(), maxTokens = 8, overlap = 2)
      .writeStream.format("memory").queryName("chunks")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = fixture.splitAt(7)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
          r.getAs[String]("chunk_text"), r.getAs[Long]("n_chunk_tokens"))
      val got = spark.table("chunks").collect().map(key).sorted.toSeq
      val expected = Curation.chunkDocuments(fixture.toDF(), maxTokens = 8, overlap = 2)
        .collect().map(key).sorted.toSeq
      assert(got == expected && got.nonEmpty)
    } finally q.stop()
  }

  test("stripBoilerplate on the stream equals removeBoilerplate in batch") {
    // the batch job owns the df aggregation (the boilerplate index); the
    // stream consumes it row-locally through the one-row broadcast — the
    // rebalance-draw split applied one level below document granularity
    implicit val sqlCtx = spark.sqlContext
    val footer = "shared footer line repeated across documents"
    val corpus = Seq(
      Doc(1L, "a", s"unique alpha body\n$footer"),
      Doc(2L, "a", s"$footer\nunique beta body"),
      Doc(3L, "b", s"unique gamma body\nunique gamma tail"),
      Doc(4L, "b", "entirely original document"))
    val batchDf = corpus.toDF()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"),
        r.getAs[Long]("kept_segments"), r.getAs[Long]("removed_segments"))
    val expected = Curation.removeBoilerplate(batchDf).collect().map(key).sorted.toSeq
    assert(expected.exists(_._4 > 0), "fixture must contain cross-doc boilerplate")
    val index = Curation.boilerplateIndex(batchDf)
    val input = MemoryStream[Doc]
    val q = Curation.stripBoilerplate(input.toDF(), index)
      .writeStream.format("memory").queryName("sclean")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = corpus.splitAt(2)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("sclean").collect().map(key).sorted.toSeq
      assert(got == expected, s"stream strip diverged from batch:\n$got\n$expected")
    } finally q.stop()
  }

  test("streaming kmeans assignment equals the batch assignment (fit-in-batch)") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic 12-vector corpus: two dominant directions + unique jitter
    val corpus = (1L to 12L).map { id =>
      val v = new Array[Float](8)
      v((id % 2).toInt) = 10f
      v(2 + (id % 6).toInt) = 1f + 0.1f * id
      EmbRow(id, v)
    }
    val corpusDf = corpus.toDF()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"), r.getAs[Double]("cos"))
    val expected = graft.operators.Embeddings.kmeansAssign(corpusDf, k = 2, iters = 2)
      .collect().map(key).sorted.toSeq
    val input = MemoryStream[EmbRow]
    val q = graft.operators.Embeddings.assignStream(input.toDF(), corpusDf, k = 2, iters = 2)
      .writeStream.format("memory").queryName("sassign")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = corpus.splitAt(5)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("sassign").collect().map(key).sorted.toSeq
      assert(got == expected, s"stream assignment diverged:\n$got\n$expected")
    } finally q.stop()
  }

  test("streaming semantic novelty gate admits exactly the batch probe's ok set") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val corpus = (1L to 12L).map { id =>
      val v = new Array[Float](8)
      v((id % 2).toInt) = 10f
      v(2 + (id % 6).toInt) = 1f + 0.1f * id
      EmbRow(id, v)
    }
    val corpusDf = corpus.toDF()
    // probes: 101/103 are near-clones of corpus vectors (tiny jitter →
    // cosine ≈ 1 ≥ 0.45, rejected); 102 sits on an axis the corpus barely
    // uses (cosine ≪ 0.45 everywhere, admitted)
    val nearClone1 = corpus(0).embedding.clone(); nearClone1(7) += 0.05f
    val nearClone2 = corpus(5).embedding.clone(); nearClone2(6) += 0.05f
    val novel = new Array[Float](8); novel(7) = 5f
    val probes = Seq(
      EmbRow(101L, nearClone1), EmbRow(102L, novel), EmbRow(103L, nearClone2))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"), r.getAs[Double]("max_cos"))
    val batch = graft.operators.Dedup.incrementalSemanticDedup(
      corpusDf, probes.toDF(), k = 2, iters = 2)
    val expected = batch.filter(col("reason") === "ok")
      .select(col("vec_id"), col("cell"), col("max_cos"))
      .collect().map(key).sorted.toSeq
    // fixture sanity: the gate must both reject and admit something
    assert(expected.map(_._1) == Seq(102L))
    assert(batch.filter(col("reason") === "duplicate_semantic").count() == 2)
    val input = MemoryStream[EmbRow]
    val q = graft.streaming.StreamDedup.admitNovelSemantic(
      input.toDF(), corpusDf, k = 2, iters = 2)
      .writeStream.format("memory").queryName("snovel")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = probes.splitAt(1)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("snovel").collect().map(key).sorted.toSeq
      assert(got == expected, s"stream novelty gate diverged:\n$got\n$expected")
    } finally q.stop()
  }

  test("streaming PQ-compressed semantic gate admits exactly the batch probe's ok set") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // the admitNovelSemantic fixture, served from the compressed index:
    // near-clones must still be rejected THROUGH the ADC approximation
    // (reconstruction error stays far from the 0.45 boundary), the novel
    // axis probe must still be admitted
    val corpus = (1L to 12L).map { id =>
      val v = new Array[Float](8)
      v((id % 2).toInt) = 10f
      v(2 + (id % 6).toInt) = 1f + 0.1f * id
      EmbRow(id, v)
    }
    val corpusDf = corpus.toDF()
    val nearClone1 = corpus(0).embedding.clone(); nearClone1(7) += 0.05f
    val nearClone2 = corpus(5).embedding.clone(); nearClone2(6) += 0.05f
    val novel = new Array[Float](8); novel(7) = 5f
    val probes = Seq(
      EmbRow(101L, nearClone1), EmbRow(102L, novel), EmbRow(103L, nearClone2))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"), r.getAs[Double]("max_cos"))
    val batch = graft.operators.Pq.incrementalSemanticDedupPq(
      corpusDf, probes.toDF(), k = 2, iters = 2)
    val expected = batch.filter(col("reason") === "ok")
      .select(col("vec_id"), col("cell"), col("max_cos"))
      .collect().map(key).sorted.toSeq
    assert(expected.map(_._1) == Seq(102L))
    assert(batch.filter(col("reason") === "duplicate_semantic").count() == 2)
    val input = MemoryStream[EmbRow]
    val q = graft.streaming.StreamDedup.admitNovelSemanticPq(
      input.toDF(), corpusDf, k = 2, iters = 2)
      .writeStream.format("memory").queryName("spqnovel")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = probes.splitAt(1)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("spqnovel").collect().map(key).sorted.toSeq
      assert(got == expected, s"stream PQ novelty gate diverged:\n$got\n$expected")
    } finally q.stop()
  }

  test("front door recovers dedup + packing state across a kill/restart") {
    // the flagship continuous query's recovery contract: kill the chained
    // admit -> pack query with data already landed but not yet committed,
    // restart from the SAME checkpoint, and the final output must equal the
    // uninterrupted run — i.e. (a) the watermark-dedup state survives (the
    // post-restart duplicate of a pre-kill doc is still dropped), (b) the
    // packing state survives (cum_tokens/seq_id continue, not reset), and
    // (c) the exactly-once file sink never double-writes in-flight work
    import graft.streaming.IngestGate
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-frontdoor").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"; val chk = s"$root/chk"
    val benchVocab = Seq("alpha beta gamma delta").toDF("s")
    val T0 = 1704067200000L
    val goodA = "the first clean document of the morning run"
    val goodB = "a second clean document arrives right behind it"
    val goodC = "a third clean document closes out the stream"
    val b1 = Seq(
      (1L, goodA, "web", T0),
      (2L, "buy now buy now buy now buy now buy now buy now", "spam", T0 + 1000),
      (3L, "prefix alpha beta gamma delta suffix words here", "web", T0 + 2000))
    val b2 = Seq(
      (4L, goodA, "mirror", T0 + 60000), // exact dup of doc 1, post-restart
      (5L, goodB, "web", T0 + 61000),
      (6L, goodC, "wiki", T0 + 62000))
    def dump(rows: Seq[(Long, String, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "source", "timestamp")
        .coalesce(1).write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream
        .schema("doc_id LONG, text STRING, source STRING, timestamp LONG")
        .parquet(inDir)
      StreamCuration.packSequences(IngestGate.admit(src, benchVocab), budget = 6)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chk)
        .outputMode(OutputMode.Append()).start()
    }
    dump(b1)
    val q1 = start()
    q1.processAllAvailable()
    dump(b2) // lands while the query is live...
    q1.stop() // ...and the query dies with it (possibly) in flight
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"))
    val got = spark.read.parquet(outDir).collect().map(key).sorted.toSeq
    val admitted = Seq((1L, goodA, "web"), (5L, goodB, "web"), (6L, goodC, "wiki"))
      .toDF("doc_id", "text", "source")
    val expected = Curation.packSequences(admitted, budget = 6)
      .collect().map(key).sorted.toSeq
    assert(got == expected,
      s"recovered run diverged from uninterrupted semantics:\n$got\n$expected")
    assert(got.map(_._2).sorted == Seq(1L, 5L, 6L),
      "dedup state must survive the restart: doc 4 (pre-kill text) stays dropped")
  }

  test("the whole streaming front door chains: admit -> pack in ONE query") {
    // dropDuplicatesWithinWatermark (bounded dedup state) -> row-local gate
    // scoring -> flatMapGroupsWithState packing, all in a single continuous
    // query — Spark's multi-stateful-operator support carries the full
    // ingest-to-training-sequence path without an intermediate sink. Output
    // must equal the batch pack over exactly the admitted set.
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.IngestGate
    import org.apache.spark.sql.functions.col
    val T0 = 1704067200000L
    val benchVocab = Seq("alpha beta gamma delta").toDF("s")
    val goodA = "the first clean document of the morning run"
    val goodB = "a second clean document arrives right behind it"
    val goodC = "a third clean document closes out the stream"
    val b1 = Seq(
      (1L, goodA, "web", T0),
      (2L, "buy now buy now buy now buy now buy now buy now", "spam", T0 + 1000),
      (3L, "prefix alpha beta gamma delta suffix words here", "web", T0 + 2000))
    val b2 = Seq(
      (4L, goodA, "mirror", T0 + 60000), // exact dup of doc 1 -> dropped
      (5L, goodB, "web", T0 + 61000),
      (6L, goodC, "wiki", T0 + 62000))
    val input = MemoryStream[(Long, String, String, Long)]
    val chained = StreamCuration.packSequences(
      IngestGate.admit(
        input.toDF().toDF("doc_id", "text", "source", "timestamp"), benchVocab),
      budget = 6)
    val q = chained.writeStream.format("memory").queryName("frontdoor")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("cum_tokens"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"))
      val got = spark.table("frontdoor").collect().map(key).sorted.toSeq
      // ground truth: batch pack over exactly the docs the gate admits
      val admitted = Seq((1L, goodA, "web"), (5L, goodB, "web"), (6L, goodC, "wiki"))
        .toDF("doc_id", "text", "source")
      val expected = Curation.packSequences(admitted, budget = 6)
        .collect().map(key).sorted.toSeq
      assert(got == expected, s"chained stream diverged:\n$got\n$expected")
      assert(got.map(_._2).sorted == Seq(1L, 5L, 6L),
        "gates + dedup must admit exactly docs 1, 5, 6")
    } finally q.stop()
  }
}
