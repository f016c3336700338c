package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IngestGate

class IngestGateSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200000L
  // (doc_id, text, source, timestamp)
  private type Doc = (Long, String, String, Long)

  private val benchVocab =
    Seq("alpha beta gamma delta", "gamma delta epsilon zeta").toDF("s")

  test("audit classifies short, repetitive, contaminated, and clean docs") {
    val docs = Seq[Doc](
      (1L, "a solid document with plenty of varied words inside", "web", T0),
      (2L, "tiny", "web", T0),
      (3L, "buy now buy now buy now buy now buy now buy now", "spam", T0),
      (4L, "prefix alpha beta gamma delta suffix words here", "web", T0))
      .toDF("doc_id", "text", "source", "timestamp")
    val m = IngestGate.audit(docs, benchVocab).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    assert(m == Map(1L -> "ok", 2L -> "too_short", 3L -> "repetitive",
      4L -> "contaminated"))
  }

  test("audit with LM model: OOV-gibberish docs fail low_quality; precedence holds") {
    val ref = Seq[Doc](
      (100L, "the quick brown fox jumps over the lazy dog", "ref", T0),
      (101L, "the quick dog naps under the warm brown sun", "ref", T0))
      .toDF("doc_id", "text", "source", "timestamp")
    val lm = graft.operators.TextAnalysis.lmModel(ref)
    val docs = Seq[Doc](
      (1L, "the quick brown dog jumps over the lazy fox", "web", T0),   // in-vocab
      (2L, "zxqvk jwpfh qmzot blarg wibble snork fizzle quux", "web", T0), // all OOV
      (3L, "buy now buy now buy now buy now buy now buy now", "spam", T0)) // repetitive AND high-nll
      .toDF("doc_id", "text", "source", "timestamp")
    val m = IngestGate.audit(docs, benchVocab, lmModel = Some(lm), maxAvgNll = 3.3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("reason"),
        r.getAs[Double]("avg_nll"))).sortBy(_._1)
    // ref corpus: 18 tokens, 13 types -> in-vocab logp ≈ ln(2/31)..ln(3/31)
    // (avg_nll ≈ 2.6); all-OOV doc scores ln(1/31) ≈ 3.43 per token
    assert(m.map(x => x._1 -> x._2).toMap ==
      Map(1L -> "ok", 2L -> "low_quality", 3L -> "repetitive"), s"got ${m.toSeq}")
    assert(m(1)._3 > m(0)._3, "OOV doc must carry higher avg NLL than in-vocab doc")
  }

  test("lmModel maxVocab caps the served map; capped-out tokens score as OOV") {
    // "the" dominates; with maxVocab=1 only it survives in the map
    val ref = Seq((100L, "the the the fox dog")).toDF("doc_id", "text")
    def served(maxVocab: Int): (Map[String, Double], Double) = {
      val row = graft.operators.TextAnalysis.lmModel(ref, maxVocab).collect().head
      (row.getAs[scala.collection.Seq[Map[String, Double]]]("lm_buckets")
        .iterator.flatten.toMap,
        row.getAs[Double]("oov_logp"))
    }
    val (full, fullOov) = served(Int.MaxValue)
    val (capped, cappedOov) = served(1)
    assert(full.keySet == Set("the", "fox", "dog"))
    assert(capped.keySet == Set("the"))
    // normalization unchanged by the cap: same logp for the kept token, same OOV
    assert(capped("the") == full("the"))
    assert(cappedOov == fullOov)
  }

  test("audit with classifier: off-seed docs fail classifier_reject; precedence holds") {
    import org.apache.spark.sql.functions.col
    val seed = Seq(
      (100L, "sunny weather forecast report today", "good"),
      (101L, "mild weather outlook report today", "good"),
      (102L, "buy cheap pills online today", "bad"),
      (103L, "cheap spam offer online today", "bad"))
      .toDF("doc_id", "text", "label")
    val clf = graft.operators.TextAnalysis.classifierModel(seed, col("label") === "good")
    val docs = Seq[Doc](
      (1L, "sunny weather report expected fine today outlook", "web", T0),
      (2L, "cheap pills online offer spam deal available now", "web", T0),
      (3L, "buy now buy now buy now buy now buy now buy now", "spam", T0)) // repetitive first
      .toDF("doc_id", "text", "source", "timestamp")
    val m = IngestGate.audit(docs, benchVocab, classifier = Some(clf)).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[String]("reason"), r.getAs[Double]("logit")))).toMap
    assert(m(1L)._1 == "ok" && m(1L)._2 > 0, s"got $m")
    assert(m(2L)._1 == "classifier_reject" && m(2L)._2 < 0)
    assert(m(3L)._1 == "repetitive", "repetition precedes the classifier check")
  }

  test("classifierModel maxVocab keeps the most discriminative head") {
    import org.apache.spark.sql.functions.col
    // "weather" (2 pos / 0 neg) and "cheap" (0/2) outweigh the shared
    // near-neutral "today" — with maxVocab=2 only they survive
    val seed = Seq(
      (100L, "weather nice today", "good"), (101L, "weather calm today", "good"),
      (102L, "cheap pills today", "bad"), (103L, "cheap spam today", "bad"))
      .toDF("doc_id", "text", "label")
    val capped = graft.operators.TextAnalysis
      .classifierModel(seed, col("label") === "good", maxVocab = 2).collect().head
    val slots = capped.getAs[scala.collection.Seq[Map[String, Double]]]("clf_buckets")
    assert(slots.flatMap(_.keySet).toSet == Set("weather", "cheap"))
    // the bucket array is dense: every slot materialized, most empty
    assert(slots.size == 4096)
  }

  test("audit stream with classifier: served map scores append-safe per row") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val seed = Seq(
      (100L, "sunny weather forecast report today", "good"),
      (101L, "cheap spam offer online today", "bad"))
      .toDF("doc_id", "text", "label")
    val clf = graft.operators.TextAnalysis.classifierModel(seed, col("label") === "good")
    val input = MemoryStream[Doc]
    val q = IngestGate.audit(
        input.toDF().toDF("doc_id", "text", "source", "timestamp"),
        benchVocab, cacheVocab = true, classifier = Some(clf))
      .writeStream.format("memory").queryName("audited_clf")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "sunny weather report arrives with the forecast", "web", T0),
        (2L, "cheap spam offer lands online again here now", "web", T0))
      q.processAllAvailable()
      val rows = spark.table("audited_clf").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
      assert(rows == Map(1L -> "ok", 2L -> "classifier_reject"), s"got $rows")
      // stream and batch scorers share the model row — identical logits
      val batch = IngestGate.audit(
        Seq[Doc]((1L, "sunny weather report arrives with the forecast", "web", T0))
          .toDF("doc_id", "text", "source", "timestamp"),
        benchVocab, classifier = Some(clf)).collect().head.getAs[Double]("logit")
      val streamed = spark.table("audited_clf").collect()
        .find(_.getAs[Long]("doc_id") == 1L).get.getAs[Double]("logit")
      assert(batch == streamed)
    } finally q.stop()
  }

  test("audit stream with LM model: row-local scoring stays append-safe") {
    implicit val sqlCtx = spark.sqlContext
    val lm = graft.operators.TextAnalysis.lmModel(
      Seq((100L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text"))
    val input = MemoryStream[Doc]
    val q = IngestGate.audit(
        input.toDF().toDF("doc_id", "text", "source", "timestamp"),
        benchVocab, cacheVocab = true, lmModel = Some(lm), maxAvgNll = 2.5)
      .writeStream.format("memory").queryName("audited_lm")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog", "web", T0),
        (2L, "zxqvk jwpfh qmzot blarg wibble snork fizzle quux", "web", T0))
      q.processAllAvailable()
      val rows = spark.table("audited_lm").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
      assert(rows == Map(1L -> "ok", 2L -> "low_quality"), s"got $rows")
    } finally q.stop()
  }

  test("admit stream: gates apply per-row and duplicates drop across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = IngestGate.admit(input.toDF().toDF("doc_id", "text", "source", "timestamp"),
        benchVocab)
      .writeStream.format("memory").queryName("admitted")
      .outputMode(OutputMode.Append()).start()
    try {
      val goodA = "the first clean document of the morning run"
      input.addData(
        (1L, goodA, "web", T0),
        (2L, "buy now buy now buy now buy now buy now buy now", "spam", T0 + 1000),
        (3L, "prefix alpha beta gamma delta suffix words here", "web", T0 + 2000))
      q.processAllAvailable()
      input.addData(
        (4L, goodA, "mirror", T0 + 60 * 1000), // exact dup of doc 1 → dropped
        (5L, "a second clean document arrives in batch two", "web", T0 + 61 * 1000))
      q.processAllAvailable()
      input.addData(
        (6L, goodA, "mirror2", T0 + 120 * 1000), // still within watermark → dropped
        (7L, "a third clean document closes out batch three", "web", T0 + 121 * 1000))
      q.processAllAvailable()
      val admitted = spark.table("admitted").collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(admitted == Seq(1L, 5L, 7L),
        s"expected gates + cross-batch dedup to admit 1,5,7; got $admitted")
    } finally q.stop()
  }

  test("admitNovel: docs already in the corpus digest index never enter") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, md5}
    val inCorpus = "a document the lake already keeps"
    val corpusDigests = Seq(inCorpus, "some other stored text").toDF("text")
      .select(md5(col("text")).as("text_hash"))
    val input = MemoryStream[Doc]
    val q = IngestGate.admitNovel(
        input.toDF().toDF("doc_id", "text", "source", "timestamp"),
        benchVocab, corpusDigests)
      .writeStream.format("memory").queryName("novel")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, inCorpus, "crawl", T0), // clean text, but the corpus has it
        (2L, "a genuinely new document shows up here", "crawl", T0 + 1000),
        (3L, "buy now buy now buy now buy now buy now buy now", "spam", T0 + 2000))
      q.processAllAvailable()
      input.addData(
        (4L, inCorpus, "mirror", T0 + 60000), // corpus dup in a later batch
        (5L, "a genuinely new document shows up here", "m", T0 + 61000), // stream dup
        (6L, "and one more novel arrival to close", "web", T0 + 62000))
      q.processAllAvailable()
      val admitted = spark.table("novel").collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(admitted == Seq(2L, 6L),
        s"expected corpus anti-join + gates + stream dedup to admit 2,6; got $admitted")
    } finally q.stop()
  }

  test("admitNovel with bloom prefilter: identical admitted set, no false negatives") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{call_function, col, md5, xxhash64}
    val docs = Tables.documents(spark, sf)
    val corpusDigests = docs.filter(col("doc_id") % 3 =!= 0)
      .select(md5(col("text")).as("text_hash"))
    val bloom = graft.operators.Dedup.corpusDigestBloom(corpusDigests)

    // the load-bearing sketch contract, asserted directly: every digest the
    // corpus actually holds MUST probe true (misses may only be novel docs)
    graft.plans.GraftFunctions.register(spark)
    val sketch = org.apache.spark.sql.functions.lit(
      bloom.collect().head.getAs[Array[Byte]]("corpus_bloom"))
    val falseNeg = corpusDigests
      .filter(!call_function("bloom_might_contain",
        sketch, xxhash64(col("text_hash"))))
      .count()
    assert(falseNeg == 0L, "bloom produced a false negative — contract broken")

    // replay the SAME arrivals through the exact and bloom-assisted doors
    val arrivals = docs.orderBy(col("doc_id")).limit(60)
      .select(col("doc_id"), col("text"), col("source")).collect()
      .zipWithIndex.map { case (r, i) =>
        (r.getLong(0), r.getString(1), r.getString(2), T0 + i * 1000L)
      }.toSeq
    def admittedWith(bloomOpt: Option[org.apache.spark.sql.DataFrame],
        name: String): Seq[Long] = {
      val input = MemoryStream[Doc]
      val q = IngestGate.admitNovel(
          input.toDF().toDF("doc_id", "text", "source", "timestamp"),
          benchVocab, corpusDigests, bloom = bloomOpt)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(arrivals: _*)
        q.processAllAvailable()
        spark.table(name).collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      } finally q.stop()
    }
    val exact = admittedWith(None, "novel_exact")
    val fast = admittedWith(Some(bloom), "novel_bloom")
    assert(exact == fast,
      s"bloom prefilter changed the admitted set: exact=$exact bloom=$fast")
    assert(fast.nonEmpty, "fixture should admit at least one novel doc")
  }

  test("audit with DSIR: gate folds match the batch selector's weights and set") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val isTarget = col("lang") === "en"
    val model = graft.operators.Dsir.dsirServeModel(docs, isTarget)
    val bench = graft.operators.TextAnalysis.benchmarkShingles(
      docs.filter(col("doc_id") % 97 === 0))
    val audited = IngestGate.audit(docs, bench, dsir = Some(model), minLogw = 0.0)
      .select(col("doc_id"), col("dsir_logw"), col("reason")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    val batch = graft.operators.Dsir.dsirWeights(docs, isTarget).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getString(3))).toMap
    // the stream fold (feature order, doubles) and the batch sum (DECIMAL,
    // bucket-grouped) must land on the same 6-dp weight for every raw doc
    batch.foreach { case (id, (logw, verdict)) =>
      assert(audited(id)._1 == logw, s"doc $id: fold ${audited(id)._1} != sum $logw")
      // docs that reach the dsir gate mirror the batch keep/drop boundary
      val reason = audited(id)._2
      if (reason == "ok") assert(verdict == "keep", s"doc $id admitted but batch-dropped")
      if (reason == "dsir_reject") assert(verdict == "drop", s"doc $id rejected but batch-kept")
    }
  }

  test("audit stream with DSIR: dense-array fold scores append-safe per row") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // target profile: weather-ish English; raw: everything else
    val seed = Seq(
      (100L, "sunny weather forecast report today", "en"),
      (101L, "wolkig regen wetter bericht heute", "de"),
      (102L, "cheap spam offer online now", "de"))
      .toDF("doc_id", "text", "lang")
    val model = graft.operators.Dsir.dsirServeModel(seed, col("lang") === "en")
    val input = MemoryStream[Doc]
    val q = IngestGate.audit(
        input.toDF().toDF("doc_id", "text", "source", "timestamp"),
        benchVocab, cacheVocab = true, dsir = Some(model))
      .writeStream.format("memory").queryName("audited_dsir")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "sunny weather report arrives with the forecast today", "web", T0),
        (2L, "cheap spam offer appears online again right now", "web", T0))
      q.processAllAvailable()
      val rows = spark.table("audited_dsir").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("reason"), r.getAs[Double]("dsir_logw"))).toMap
      assert(rows(1L)._1 == "ok", s"got $rows")
      assert(rows(2L)._1 == "dsir_reject", s"got $rows")
      assert(rows(1L)._2 > rows(2L)._2)
      // stream and batch share the model row — identical weights
      val batch = IngestGate.audit(
        Seq[Doc]((1L, "sunny weather report arrives with the forecast today", "web", T0))
          .toDF("doc_id", "text", "source", "timestamp"),
        benchVocab, dsir = Some(model)).collect().head.getAs[Double]("dsir_logw")
      assert(batch == rows(1L)._2)
    } finally q.stop()
  }
}
