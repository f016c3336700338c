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
}
