package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side plumbing — schema, partition-preserving
  * batch shape, iterator-based per-partition decoding (the Scala analog of
  * `mapInPandas` batches) — is real and tested; the actual media decoding is
  * STUBBED behind [[Decoder]] because no image/audio libraries exist in this
  * environment. Swap [[DeterministicFakeDecoder]] for a JNI/FFmpeg-backed
  * implementation without touching any plan shape.
  *
  * Scale notes: decode is the classic CPU-heavy narrow stage — it must stay
  * in mapPartitions (one decoder init per partition, streaming iterator, no
  * per-row setup) and NEVER force a shuffle; partition sizing is governed by
  * bytes not rows (`spark.sql.files.maxPartitionBytes`), since one row can
  * be a 100 MB video.
  */
object Multimodal {

  /** Media row: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long, kind: String, mime: String,
      width: Int, height: Int, duration_ms: Long, content: Array[Byte])

  case class MediaFeatures(media_id: Long, feature: Array[Float], decoder: String)

  /** Batch decode interface — the seam where a real codec plugs in.
    * Implementations must be serializable (constructed per partition).
    */
  trait Decoder extends Serializable {
    def name: String
    /** Decode a batch; called once per partition with a streaming iterator. */
    def decode(records: Iterator[MediaRecord]): Iterator[MediaFeatures]
  }

  /** STUB decoder — no media libraries in this container. Emits a
    * deterministic 8-dim feature from the md5 of the payload so downstream
    * plumbing (schema, joins, ANN) is exercised with stable values. A real
    * implementation decodes pixels/samples here.
    *
    * The fake feature is byte/256 − 1/2: every value is DYADIC (a multiple
    * of 2⁻⁸), so it is exactly representable in float32 and float64 alike —
    * any engine that can take md5 and slice hex bytes (DuckDB included)
    * reproduces the features bit-for-bit, which is what lets q_media_features
    * carry a full hash-matching oracle instead of a rows-only check.
    */
  object DeterministicFakeDecoder extends Decoder {
    val name = "fake-md5"
    def decode(records: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
      // one digest instance per partition — the "decoder init" cost the
      // mapPartitions shape exists to amortize
      val md = java.security.MessageDigest.getInstance("MD5")
      records.map { r =>
        val d = md.digest(r.content)
        val feats = Array.tabulate(8)(i => ((d(i) & 0xff) / 256.0f) - 0.5f)
        MediaFeatures(r.media_id, feats, name)
      }
    }
  }

  /** Decode/feature-extract: partition-parallel, no shuffle. */
  def extractFeatures(
      media: Dataset[MediaRecord],
      decoder: Decoder = DeterministicFakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(decoder.decode _)
  }

  /** Treat the documents corpus as opaque media payloads — the binary-column
    * ingestion shape (content = raw bytes, metadata typed) — and run the full
    * decode pipeline over it. Exercises every seam of the multimodal path
    * (schema, mapPartitions batch decode, feature flattening to a scalar
    * schema) on real data. Features surface as DOUBLE: the stub's dyadic
    * values make the float→double widening exact, so the DuckDB oracle
    * (md5 hex-pair slicing, double arithmetic) hash-matches bit-for-bit.
    */
  def documentMediaFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val media = Par.spread(docs)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        MediaRecord(id, "image", "application/octet-stream",
          nChars.toInt, 1, 0L, text.getBytes("UTF-8"))
      }
    val cols = Seq(col("media_id"), col("decoder")) ++
      (0 until 8).map(i => col("feature").getItem(i).cast("double").as(s"f$i"))
    extractFeatures(media)
      .select(cols: _*)
      .orderBy(col("media_id"))
  }

  /** dHash perceptual fingerprints over the RAW BINARY payload column —
    * the image near-dup operator (every other LLM-pipeline pillar has one;
    * this is the multimodal column's), operating on `content` bytes
    * directly: any payload a [[MediaRecord]] carries (a JPEG, a WAV, a
    * UTF-8 transcript) fingerprints the same way.
    *
    * Real pipeline: decode → grayscale-resize to a (rows)×(cols) grid →
    * dHash bit(r,c) = px(r,c) < px(r,c+1) — robust to re-encode / resize /
    * small edits because neighboring-pixel ORDER survives them. Here the
    * decode is the deterministic stub ([[DeterministicFakeDecoder]]'s
    * md5-derived pixels, generalized to a grid): pixel row `r` is the first
    * `cols` bytes of md5 of the r-th of `rows` contiguous BYTE slices of
    * the payload (Spark's substring/md5/length all operate natively on
    * BinaryType), so identical payloads collide at Hamming 0 and a payload
    * edit perturbs only the grid rows whose slices changed — the locality
    * a real dHash gets from downsampling. Swapping in a real decoder
    * replaces only the pixel-grid derivation; banding, verification, and
    * the pair plan are unchanged.
    *
    * Pure column math (md5/substr/conv are all codegen'd) — narrow, no
    * shuffle, no UDF. The 8 slice-hash columns are staged as real columns
    * so each md5 evaluates once per row (multi-referenced non-cheap aliases
    * survive CollapseProject — the IngestGate staging pattern).
    */
  def perceptualHashes(media: DataFrame, idCol: String = "media_id",
      contentCol: String = "content"): DataFrame = {
    val gridRows = 8
    val gridCols = 9
    val n = length(col(contentCol)) // BYTE length on a binary column
    // fake pixel row r: md5 of the r-th contiguous byte slice; slice
    // boundaries floor(n*r/rows) are exact in doubles for any real payload
    def sliceHash(r: Int): Column = {
      val lo = floor(n.cast("double") * r / gridRows).cast("int")
      val hi = floor(n.cast("double") * (r + 1) / gridRows).cast("int")
      md5(col(contentCol).substr(lo + lit(1), hi - lo))
    }
    val staged = Par.spread(media).select(
      col(idCol) +: (0 until gridRows).map(r => sliceHash(r).as(s"h$r")): _*)
    def px(r: Int, c: Int): Column =
      conv(substring(col(s"h$r"), c * 2 + 1, 2), 16, 10).cast("int")
    val bits = for { r <- 0 until gridRows; c <- 0 until gridCols - 1 }
      yield when(px(r, c) < px(r, c + 1), "1").otherwise("0")
    staged.select(col(idCol), concat(bits: _*).as("phash"))
  }

  /** [[perceptualHashes]] over the documents corpus: text re-enters the
    * media path as its UTF-8 payload bytes (the binary-column ingestion
    * shape of [[documentMediaFeatures]]). The DuckDB oracle slices VARCHAR
    * by characters while the engine slices the payload by bytes — identical
    * exactly when the corpus is single-byte (ASCII), which MultimodalSpec
    * pins for the harness corpus; a multi-byte corpus is still correct
    * engine-side (bytes are the real contract), it just needs a byte-aware
    * oracle.
    */
  def documentPerceptualHashes(docs: DataFrame): DataFrame =
    perceptualHashes(docs.select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("content")))
      .select(col("media_id").as("doc_id"), col("phash"))

  /** Perceptual near-dup pairs over the media column: 64-bit dHash banded
    * into 4 16-bit chunks ([[graft.operators.Dedup.bandedHammingCandidates]]
    * — pigeonhole-exact at Hamming ≤ 3), verified with the codegen'd
    * [[graft.plans.HammingDistance]]. Same scale shape as the text SimHash
    * pairs: one shuffle on the chunk key, capped in-group generation,
    * O(pairs-sharing-a-chunk) work — never all-pairs.
    */
  def mediaPhashNearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    phashPairs(documentPerceptualHashes(docs), maxHamming)

  /** The same near-dup pair plan over a RAW media frame (media_id,
    * content: binary) — the entry point for actual binary payloads.
    */
  def phashNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    phashPairs(perceptualHashes(media), maxHamming)

  private def phashPairs(fingerprints: DataFrame, maxHamming: Int): DataFrame = {
    graft.plans.GraftFunctions.register(fingerprints.sparkSession)
    val fp = fingerprints.toDF("doc_id", "fp")
    Dedup.bandedHammingCandidates(fp, chunks = 4, chunkLen = 16)
      .withColumn("hamming", call_function("hamming_distance", col("fp_i"), col("fp_j")))
      .filter(col("hamming") <= maxHamming)
      .select(col("i"), col("j"), col("hamming"))
      .orderBy(col("i"), col("j"))
  }

  /** Resize planning — pure metadata projection (narrow, codegen'd): target
    * box fit preserving aspect ratio; the byte-level resample happens in the
    * decoder seam.
    */
  def resizePlan(media: DataFrame, maxSide: Int = 512): DataFrame = {
    val scale = least(
      lit(maxSide).cast("double") / col("width"),
      lit(maxSide).cast("double") / col("height"),
      lit(1.0))
    media.select(
      col("media_id"), col("kind"), col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("target_width"),
      floor(col("height") * scale).cast("int").as("target_height"))
  }

  /** Frame sampling for video rows: one output row per sampled frame at
    * `everyMs` intervals — a generator (posexplode), the plumbing a
    * frame-extraction stage hangs off.
    */
  def frameSamples(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("kind") === "video")
      .select(
        col("media_id"),
        posexplode(sequence(lit(0L), greatest(col("duration_ms") - 1, lit(0L)), lit(everyMs))))
      .toDF("media_id", "frame_idx", "frame_ts_ms")

  /** Cross-modal consistency gate — the LAION-style filter an image-text
    * corpus runs before anything else: a caption whose text-tower embedding
    * does not align with its image-tower embedding (cosine < τ) is noise
    * (mis-scraped alt text, watermark spam) and is dropped. Input is a
    * PAIRS frame (pair_id, source, text_emb, image_emb — both towers in
    * one space, CLIP's contract); output adds the 6-dp rounded cosine and
    * the keep verdict. Pure codegen'd column math over the fused cosine
    * kernel — stateless and narrow, so the streaming front door serves the
    * identical projection ([[crossModalConsistencyStream]], stream==batch
    * spec-pinned) and at 100 TB the gate rides the ingest scan with no
    * shuffle at all.
    */
  def crossModalConsistency(pairs: DataFrame, tau: Double = 0.05): DataFrame =
    crossModalProjection(Par.spread(pairs), tau).orderBy(col("pair_id"))

  /** [[crossModalConsistency]] minus the presentation sort — the stateless
    * append-safe twin the streaming front door composes.
    */
  def crossModalConsistencyStream(pairs: DataFrame, tau: Double = 0.05): DataFrame =
    crossModalProjection(pairs, tau)

  private def crossModalProjection(pairs: DataFrame, tau: Double): DataFrame = {
    graft.plans.GraftFunctions.register(pairs.sparkSession)
    pairs.select(
      col("pair_id"), col("source"),
      round(call_function("cosine_similarity",
        col("text_emb"), col("image_emb")), 6).as("cos"))
      .withColumn("keep", col("cos") >= lit(tau))
  }

  /** Per-source consistency distribution — the corpus-health report the
    * gate's τ is tuned against: pair/kept counts plus min/avg/max cosine
    * per source. The average is summed in DECIMAL (6-dp cosines are exact
    * there) and divided once in double, so every engine reproduces it
    * bit-for-bit. One narrow projection + one shrinking aggregation.
    */
  def crossModalReport(pairs: DataFrame, tau: Double = 0.05): DataFrame =
    crossModalProjection(pairs, tau)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("keep").cast("long")).as("n_kept"),
        min(col("cos")).as("min_cos"),
        max(col("cos")).as("max_cos"),
        round(sum(col("cos").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("avg_cos"))
      .orderBy(col("source"))
}
