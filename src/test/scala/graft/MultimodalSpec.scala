package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRecord, MediaFeatures}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(n: Int) = (0 until n).map { i =>
    val kind = if (i % 3 == 0) "video" else if (i % 3 == 1) "image" else "audio"
    MediaRecord(i.toLong, kind, s"application/x-$kind",
      width = 640 + i, height = 480, duration_ms = if (kind == "video") 3500L else 0L,
      content = s"payload-$i".getBytes("UTF-8"))
  }

  test("extractFeatures: deterministic 8-dim features, one row per media row") {
    val ds = media(12).toDS().repartition(3)
    val f1 = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(f1.length == 12)
    assert(f1.forall(_.feature.length == 8))
    assert(f1.forall(_.feature.forall(v => v >= -0.5f && v <= 0.5f)))
    // deterministic across runs (stub decoder hashes content)
    f1.zip(f2).foreach { case (a, b) => assert(a.feature.sameElements(b.feature)) }
    // distinct payloads → distinct features
    assert(f1.map(_.feature.toSeq).distinct.length == 12)
  }

  test("extractFeatures is partition-preserving (no shuffle)") {
    val ds = spark.createDataset(spark.sparkContext.parallelize(media(10), 4))
    val out = Multimodal.extractFeatures(ds)
    assert(out.rdd.getNumPartitions == 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode stage must not shuffle:\n$plan")
  }

  test("end-to-end multimodal retrieval: decode → features → ANN search") {
    import org.apache.spark.sql.functions.col
    // the full pipeline shape: opaque media → feature extraction (stub
    // codec) → similarity search over the feature vectors
    val feats = Multimodal.extractFeatures(media(40).toDS())
      .toDF().select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val out = graft.operators.SimilaritySearch.bruteForceTopK(
      feats, feats.filter(col("vec_id") < 2), k = 3, dim = 8).collect()
    assert(out.length == 6) // 2 queries × top-3
    assert(out.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
  }

  test("resizePlan fits within the box preserving aspect ratio, never upscales") {
    val df = Seq(
      (1L, "image", 1024, 768),
      (2L, "image", 256, 128),
      (3L, "image", 512, 1024)
    ).toDF("media_id", "kind", "width", "height")
    val out = Multimodal.resizePlan(df, maxSide = 512).orderBy("media_id").collect()
    assert(out(0).getAs[Int]("target_width") == 512 && out(0).getAs[Int]("target_height") == 384)
    assert(out(1).getAs[Int]("target_width") == 256 && out(1).getAs[Int]("target_height") == 128)
    assert(out(2).getAs[Int]("target_width") == 256 && out(2).getAs[Int]("target_height") == 512)
  }

  test("frameSamples: one row per sampling interval, videos only") {
    val df = media(6).toDS().toDF()
    val out = Multimodal.frameSamples(df, everyMs = 1000L).collect()
    // videos are ids 0 and 3, duration 3500ms → frames at 0,1000,2000,3000
    assert(out.map(_.getAs[Long]("media_id")).distinct.sorted.toSeq == Seq(0L, 3L))
    val frames = out.filter(_.getAs[Long]("media_id") == 0L)
      .map(r => (r.getAs[Int]("frame_idx"), r.getAs[Long]("frame_ts_ms"))).sorted
    assert(frames.toSeq == Seq((0, 0L), (1, 1000L), (2, 2000L), (3, 3000L)))
  }

  test("documentPerceptualHashes: 64-bit strings, deterministic, content-addressed") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "totally different text with other words"),
      (4L, "")).toDF("doc_id", "text")
    val fp = Multimodal.documentPerceptualHashes(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp.size == 4)
    assert(fp.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
    assert(fp(1L) == fp(2L)) // identical payload → identical fingerprint
    assert(fp(1L) != fp(3L))
    // empty payload: all 8 slice hashes equal md5("") = d41d8cd98f00b204...
    // → every grid row carries the same neighbor-compare bits (d4<1d? no,
    // 1d<8c? yes, ...) = "01100101", repeated — deterministic, no crash
    assert(fp(4L) == "01100101" * 8)
  }

  test("perceptualHashes ingests the BINARY media column: byte-path parity + non-UTF8 payloads") {
    import org.apache.spark.sql.functions.{col, encode, length, octet_length}
    // (a) the oracle contract: q_media_phash_neardup's DuckDB twin slices
    // VARCHAR by characters, the engine slices payload BYTES — identical
    // exactly when the harness corpus is single-byte; pin that here
    val corpus = Tables.documents(spark, sf)
    assert(corpus.filter(
      length(col("text")) =!= octet_length(encode(col("text"), "UTF-8"))).count() == 0,
      "harness corpus must be ASCII for the char-sliced oracle to match byte slicing")
    // (b) text entering as MediaRecord payload bytes fingerprints identically
    // to the document wrapper — the binary column is the real input path
    val asMedia = corpus.select(
      col("doc_id").as("media_id"), encode(col("text"), "UTF-8").as("content"))
    def fps(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val fromBytes = fps(Multimodal.perceptualHashes(asMedia))
    val fromDocs = fps(Multimodal.documentPerceptualHashes(corpus))
    assert(fromBytes == fromDocs)
    // (c) a genuinely non-UTF8 payload (invalid sequences, NUL, high bytes)
    // fingerprints fine: content-addressed at Hamming 0, and a one-byte flip
    // perturbs only the grid row whose slice changed (<= 8 bits)
    val blob = Array.tabulate(64)(i => ((i * 37 + 200) % 256).toByte)
    val flipped = blob.clone(); flipped(32) = (flipped(32) ^ 0x5a).toByte
    val bin = Seq((1L, blob), (2L, blob.clone()), (3L, flipped))
      .toDF("media_id", "content")
    val fp = fps(Multimodal.perceptualHashes(bin))
    assert(fp(1L) == fp(2L), "identical binary payloads must collide at Hamming 0")
    val hamming = fp(1L).zip(fp(3L)).count { case (x, y) => x != y }
    assert(hamming <= 8, s"one-byte flip must stay within one grid row, got $hamming")
    // and the binary pair entry point finds the planted byte-identical pair
    val pairs = Multimodal.phashNearDupPairs(bin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)))
  }

  test("mediaPhashNearDupPairs == brute-force Hamming<=3 over the same fingerprints") {
    val texts = (0 until 40).map { i =>
      val body =
        if (i % 4 == 0) "duplicate payload body shared across several docs"
        else s"unique body $i with words ${i * 7} and tail ${i * 13}"
      (i.toLong, body)
    }
    val docs = texts.toDF("doc_id", "text")
    val fps = Multimodal.documentPerceptualHashes(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val brute = for {
      a <- fps.toSeq; b <- fps.toSeq if a._1 < b._1
      h = a._2.zip(b._2).count { case (x, y) => x != y } if h <= 3
    } yield (a._1, b._1, h)
    val got = Multimodal.mediaPhashNearDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // banded blocking is pigeonhole-EXACT at Hamming <= 3: no recall loss
    assert(got == brute.sortBy(p => (p._1, p._2)))
    // the planted exact duplicates pair at Hamming 0
    assert(got.count(_._3 == 0) >= (10 * 9) / 2)
  }

  test("cross-modal gate: keeps aligned pairs, drops misaligned, report sums the verdicts") {
    import org.apache.spark.sql.functions._
    // planted geometry: id 0/1 aligned (same direction), 2/3 orthogonal,
    // 4/5 opposed — cosines 1, 0, -1 exactly
    val pairs = Seq(
      (0L, "web", Array(1f, 0f), Array(2f, 0f)),
      (1L, "web", Array(0f, 3f), Array(0f, 1f)),
      (2L, "book", Array(1f, 0f), Array(0f, 1f)),
      (3L, "book", Array(0f, 1f), Array(1f, 0f)),
      (4L, "web", Array(1f, 0f), Array(-1f, 0f)),
      (5L, "web", Array(0f, 1f), Array(0f, -2f)))
      .toDF("pair_id", "source", "text_emb", "image_emb")
    val got = Multimodal.crossModalConsistency(pairs, tau = 0.5).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(got(0L) == ((1.0, true)) && got(1L) == ((1.0, true)))
    assert(got(2L) == ((0.0, false)) && got(3L) == ((0.0, false)))
    assert(got(4L) == ((-1.0, false)) && got(5L) == ((-1.0, false)))
    val report = Multimodal.crossModalReport(pairs, tau = 0.5).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(report("web") == ((4L, 2L)) && report("book") == ((2L, 0L)))
  }

  test("cross-modal gate on the stream equals the batch verdicts per pair") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val rows = (0 until 20).map { i =>
      val t = Array.tabulate(4)(j => (math.sin(i * 4 + j) * 10).toFloat)
      val im = Array.tabulate(4)(j => (math.cos(i * 4 + j) * 10).toFloat)
      (i.toLong, if (i % 2 == 0) "web" else "book", t, im)
    }
    val batch = rows.toDF("pair_id", "source", "text_emb", "image_emb")
    val expected = Multimodal.crossModalConsistency(batch).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(expected.values.exists(_._2) && expected.values.exists(!_._2),
      "fixture must exercise both verdicts")
    val input = MemoryStream[(Long, String, Array[Float], Array[Float])]
    val q = Multimodal.crossModalConsistencyStream(
        input.toDF().toDF("pair_id", "source", "text_emb", "image_emb"))
      .writeStream.format("memory").queryName("scrossmodal")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = rows.partition(_._1 % 2 == 0)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("scrossmodal").collect()
        .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
      assert(got == expected, "stream gate diverged from the batch twin")
    } finally q.stop()
  }
}
