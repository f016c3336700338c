package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.OutputMode
import graft.schemas.Transit._

/** Streaming-throughput measurement against the reference's own metric
  * (BASELINE.md: peak ≈ 41 events/s sustained by the simulator).
  *
  * Replays N synthetic turnstile events + M arrivals through the two
  * heavyweight continuous queries (grouped-count aggregation and the
  * flatMapGroupsWithState train tracker) from file sources in multiple
  * micro-batches, and prints events/s.
  *
  * Usage: `graft.StreamBench [nTurnstile] [nArrivalTicks]`
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nTurnstile = args.headOption.map(_.toInt).getOrElse(1000000)
    val ticks = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Scratch.dir("graft-sbench")

    // --- fixture generation (not timed) ---
    val turnstiles = spark.range(nTurnstile).select(
      (org.apache.spark.sql.functions.col("id") * 7L % 86400000L).as("timestamp"),
      (org.apache.spark.sql.functions.col("id") % 200).cast("int").as("station_id"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("station-"),
        (org.apache.spark.sql.functions.col("id") % 200)).as("station_name"),
      org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit("red"),
          org.apache.spark.sql.functions.lit("blue"),
          org.apache.spark.sql.functions.lit("green")),
        (org.apache.spark.sql.functions.col("id") % 3 + 1).cast("int")).as("line"))
    turnstiles.repartition(8).write.parquet(s"$root/turnstile")

    val sim = graft.sim.Simulator.fromStations(
      graft.sources.TransitData.stations(spark), numTrains = 10)
    val (arrivals, _, _) = sim.run(ticks) // 30 arrivals per tick
    arrivals.toDS().repartition(8).write.parquet(s"$root/arrivals")

    // the concurrent-reader arms run the LIBRARY protocol, not a bench-local
    // loop: the elapsed-time-bounded retry lives in ReadRetry, the external
    // graph subscriber in GraphMaintainer.openReader, and the changefeed
    // subscriber loop in ScdMaintainer.pollChangefeed — the bench drives the
    // same entry points a real downstream consumer calls
    def retryFor[T](windowMs: Long, onRetry: () => Unit)(f: => T): T =
      graft.streaming.ReadRetry.retryFor(windowMs, onRetry)(f)

    // --- timed: grouped-count over the turnstile replay ---
    def timeQuery(label: String, n: Long)(start: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val t0 = System.nanoTime()
      val q = start
      q.processAllAvailable(); q.stop()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[stream-bench] $label: $n%d events in $s%.1f s = ${n / s}%.0f events/s")
    }

    timeQuery("turnstile grouped-count", nTurnstile) {
      spark.readStream
        .schema(turnstiles.schema)
        .option("maxFilesPerTrigger", "2") // force multiple micro-batches
        .parquet(s"$root/turnstile")
        .groupBy($"station_id").count()
        .writeStream.format("noop").outputMode(OutputMode.Complete())
        .option("checkpointLocation", s"$root/chk1").start()
    }

    timeQuery("train tracker (flatMapGroupsWithState)", arrivals.size.toLong) {
      val src: Dataset[Arrival] = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[Arrival].schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/arrivals").as[Arrival]
      graft.streaming.TransitStreams.trainPositions(src)
        .writeStream.format("noop").outputMode(OutputMode.Update())
        .option("checkpointLocation", s"$root/chk2").start()
    }

    // --- timed: ingest gate (quality + decontamination + bounded dedup) ---
    // synthetic docs: ids sharing a seed (id and id-1 when id % 8 == 0) get
    // IDENTICAL text → exactly ~1/8 exact dups for the dedup state to drop;
    // the token space (prime 100003 ≫ nDocs) keeps all other texts and
    // their 4-grams distinct, so most docs pass the gate and the
    // dropDuplicatesWithinWatermark stage is genuinely exercised — a doc
    // contaminates only when its dup partner landed in the %97 benchmark
    // slice, a realistic smattering
    val f = org.apache.spark.sql.functions
    val nDocs = math.max(nTurnstile / 10, 10000)
    val seed = f.when(f.col("id") % 8 === 0 && f.col("id") > 0, f.col("id") - 1)
      .otherwise(f.col("id"))
    val docs = spark.range(nDocs).select(
      f.col("id").as("doc_id"),
      f.concat_ws(" ",
        (0 until 12).map(i => f.concat(f.lit(s"w"),
          (seed * (i + 7) % 100003L))): _*).as("text"),
      f.concat(f.lit("src"), f.col("id") % 5).as("source"),
      (f.col("id") * 911L % 86400000L).as("timestamp"))
    docs.repartition(8).write.parquet(s"$root/docs")
    val benchVocab = spark.read.parquet(s"$root/docs")
      .filter(f.col("doc_id") % 97 === 0)
      .select(f.explode(graft.functions.TextFunctions.shingles(
        graft.functions.TextFunctions.tokens(f.col("text")), 4)).as("s"))
      .distinct()
    timeQuery("ingest gate (audit+dedup admit)", nDocs.toLong) {
      val src = spark.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/docs")
      graft.streaming.IngestGate.admit(src, benchVocab, watermark = "24 hours")
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$root/chk4").start()
    }

    // --- timed: novelty gate (admit + anti-join vs the corpus digest index) ---
    // the index holds every 10th stream text (so ~10% of the stream is
    // "already in the lake" and drops at the probe) plus enough synthetic
    // digests to make the static side index-sized rather than toy-sized
    val corpusDigests = spark.read.parquet(s"$root/docs")
      .filter(f.col("doc_id") % 10 === 3)
      .select(f.md5(f.col("text")).as("text_hash"))
      .union(spark.range(4 * nDocs).select(
        f.md5(f.concat(f.lit("corpus-"), f.col("id"))).as("text_hash")))
    timeQuery("novelty gate (admit + corpus-index anti-join)", nDocs.toLong) {
      val src = spark.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/docs")
      graft.streaming.IngestGate.admitNovel(
        src, benchVocab, corpusDigests, watermark = "24 hours")
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$root/chk6").start()
    }

    // --- timed: classifier-gated admit (fit-in-batch, score-on-the-stream) ---
    // NB weights fit on the stored corpus (label: even-numbered sources as
    // the 'reference' class) — the served map carries the full ~1.2M-token
    // hash vocabulary head, so the per-row fold probes a realistic model
    val clf = graft.operators.TextAnalysis.classifierModel(
      spark.read.parquet(s"$root/docs"),
      f.col("source").isin("src0", "src2", "src4"))
    timeQuery("classifier gate (admit + served NB logit)", nDocs.toLong) {
      val src = spark.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/docs")
      graft.streaming.IngestGate.admit(
        src, benchVocab, watermark = "24 hours", classifier = Some(clf))
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$root/chk7").start()
    }

    // --- timed: the CHAINED front door (admit -> pack, ONE continuous query) ---
    // dropDuplicatesWithinWatermark -> gate scoring -> flatMapGroupsWithState
    // packing with no intermediate sink (multi-stateful-operator support;
    // StreamCurationSpec pins output == batch pack over the admitted set).
    // The fixture's doc_ids are not per-source monotonic across micro-batches,
    // so packed offsets here are throughput-only; the ordering contract is
    // StreamCuration.packSequences's scaladoc.
    timeQuery("front door chained (admit+pack, one query)", nDocs.toLong) {
      val src = spark.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/docs")
      graft.streaming.StreamCuration.packSequences(
        graft.streaming.IngestGate.admit(src, benchVocab, watermark = "24 hours"))
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$root/chk5").start()
    }

    // --- timed: SEMANTIC novelty gate over an embedding stream ---
    // corpus: nVecs stored 64-dim vectors; stream: nVecs probes of which
    // ~1/8 are byte-identical clones of a corpus vector (cosine 1 → reject)
    // and the rest are fresh draws (near-orthogonal in 64-dim → admit).
    // The IVF index (k-means fit + per-cell pack) is built and cached
    // UNTIMED — it is the batch-refreshed artifact; the timed region is
    // the always-on probe query, the number a gate capacity plan needs.
    val nVecs = math.max(nDocs / 10, 5000)
    val dim = 64
    def embOf(seedCol: org.apache.spark.sql.Column) =
      f.transform(f.sequence(f.lit(0), f.lit(dim - 1)),
        j => ((f.pmod(seedCol * (j + 3), f.lit(9973L)).cast("double") / 9973.0)
          - 0.5).cast("float"))
    spark.range(nVecs).select(
      f.col("id").as("vec_id"), embOf(f.col("id") * 31L + 7L).as("embedding"))
      .repartition(8).write.parquet(s"$root/corpusvec")
    val probeSeed = f.when(f.col("id") % 8 === 0, f.col("id"))
      .otherwise(f.col("id") + nVecs)
    spark.range(nVecs).select(
      (f.col("id") + 1000000L).as("vec_id"),
      embOf(probeSeed * 31L + 7L).as("embedding"))
      .repartition(8).write.parquet(s"$root/probevec")
    val corpusVec = spark.read.parquet(s"$root/corpusvec")
    val semIdx = {
      val idx = graft.operators.Dedup.buildSemanticIndex(corpusVec, k = 64, iters = 2)
      val cached = idx.copy(cells = idx.cells.cache())
      cached.cells.count() // materialize the cache before the clock starts
      cached
    }
    timeQuery("semantic novelty gate (IVF cell probe)", nVecs) {
      val src = spark.readStream
        .schema(corpusVec.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/probevec")
      graft.streaming.StreamDedup.admitNovelSemantic(src, semIdx, threshold = 0.45)
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$root/chk8").start()
    }

    // --- timed: continuously maintained kNN graph (incremental folds) ---
    // the refresh-time build is UNTIMED (it is the batch artifact); the
    // timed region is the always-on maintenance loop folding arriving
    // vector batches into the serving graph — steady-state work tracks
    // the ingest rate, never the accumulated corpus
    val maintainer = {
      val m = graft.streaming.GraphMaintainer.build(
        corpusVec, s"$root/knngraph", k = 5, nCentroids = Some(64))
      m.graph.count() // land the initial build before the clock starts
      m
    }
    val foldTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    timeQuery("knn-graph maintenance (incremental folds)", nVecs) {
      val src = spark.readStream
        .schema(corpusVec.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/probevec")
      src.writeStream
        .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!b.isEmpty) {
            val t0 = System.nanoTime()
            maintainer.fold(b.toDF(), Some(id))
            foldTimes += (System.nanoTime() - t0) / 1e9
            ()
          }
        }
        .start()
    }
    // the O(batch) contract made visible: fold times must stay flat even
    // though the accumulated corpus doubles over the run (manifest-pruned
    // cell reads + one atomic manifest commit — never an O(corpus) pass)
    println(f"[stream-bench] knn-graph per-fold seconds: ${
      foldTimes.map(t => f"$t%.2f").mkString(", ")}")

    // --- long-horizon graph METADATA arm: 60 folds, in-loop vacuum,
    // --- one CONCURRENT READER racing the sweep the whole run ---
    // the graph manifest log's boundedness at weeks-of-streaming shape:
    // every fold publishes ONE commit (a delta of the touched cells,
    // checkpoint-anchored) and strands the touched cells' replaced token
    // slices; with vacuum(keep=2) riding the loop the manifest count and
    // live token-dir counts must stay FLAT, and per-commit manifest
    // bytes must track the TOUCHED cells, never the live cell count
    // (64 cells here so the delta-vs-checkpoint contrast is visible).
    // The reader thread serves + scans the graph continuously THROUGH the
    // maintainer's serve getters (the hot serving-loop shape: a 250 ms
    // poller) while folds and the grace-0 sweep churn: keep>=2's
    // in-flight-reader claim, measured instead of argued — the documented
    // reader protocol (re-resolve and retry when a scan loses the race to
    // the sweep, bounded by ELAPSED TIME, not a fixed retry count — a
    // scan slower than two fold intervals is a slow host, not a broken
    // clamp) must end the run with ZERO unrecovered errors and bounded hw
    // staleness. The serve-resolves counter printed at the end measures
    // the head==lastSeen short-circuit: ~0 means the common serve path
    // paid no manifest reads at all (one LIST only).
    val gmLong = graft.streaming.GraphMaintainer.build(
      spark.range(2000).select(f.col("id").as("vec_id"),
        embOf(f.col("id") * 31L + 7L).as("embedding")),
      s"$root/knnlong", k = 5, nCentroids = Some(64))
    // shared by every long-horizon metadata arm below
    def fCount(p: String, pred: String => Boolean): Int =
      Option(new java.io.File(p).listFiles())
        .map(_.count(x => pred(x.getName))).getOrElse(0)
    def dCount(p: String, prefix: String): Int =
      fCount(p, _.startsWith(prefix))
    val gmDir = s"$root/knnlong"
    val gmFs = new org.apache.hadoop.fs.Path(gmDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    @volatile var gmDone = false
    @volatile var gmCommittedFold = 0L
    val gmReads = new java.util.concurrent.atomic.AtomicInteger
    val gmRetries = new java.util.concurrent.atomic.AtomicInteger
    val gmErrors = new java.util.concurrent.atomic.AtomicInteger
    val gmMaxLag = new java.util.concurrent.atomic.AtomicLong
    // the EXTERNAL subscriber, through the library API (openReader): one
    // handle for the whole run, so its monotonicity anchor and retry
    // counter behave exactly as a real cross-JVM consumer's would
    val gmExtReader = graft.streaming.GraphMaintainer.openReader(
      spark, gmDir, retryWindowMs = 30000L,
      onRetry = () => { gmRetries.incrementAndGet(); () })
    val gmReader = new Thread(() => {
      var poll = 0
      while (!gmDone) {
        val foldNow = gmCommittedFold
        poll += 1
        // BOTH reader shapes ride the run, alternating: the same-JVM
        // serving loop through the maintainer's serve getters (measures
        // the head==lastSeen short-circuit — the serve-resolves counter)
        // and the EXTERNAL GraphReader re-resolving the pinned #base
        // chain from disk every poll (the cross-JVM subscriber whose
        // chain-walk races against the sweep are exactly what keep>=2
        // protects — dropping this shape would let a chain-resolution
        // regression pass the arm green)
        def readOnce(): Long =
          if (poll % 2 == 0)
            retryFor(30000L, () => { gmRetries.incrementAndGet(); () }) {
              gmLong.graph.count()
              gmLong.highWater.getOrElse(0L)
            }
          else gmExtReader.snapshot { s =>
            s.graph.count()
            s.highWater.getOrElse(0L)
          }
        try {
          val hw = readOnce()
          gmReads.incrementAndGet()
          val lag = math.max(0L, foldNow - hw)
          gmMaxLag.getAndUpdate(l => math.max(l, lag))
          ()
        } catch { case e: Exception =>
          gmErrors.incrementAndGet()
          println(s"[stream-bench] knn-graph reader ERROR: ${e.getMessage}")
        }
        // a realistic subscriber polls at a cadence; a pause-free loop
        // would just measure core contention, not the reader protocol
        Thread.sleep(250)
      }
    }, "knn-graph-concurrent-reader")
    gmReader.setDaemon(true)
    gmReader.start()
    val gmFoldTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val gmSamples = scala.collection.mutable.ArrayBuffer.empty[String]
    val gmDeltaBytes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val gmCkptBytes = scala.collection.mutable.ArrayBuffer.empty[Long]
    (1 to 60).foreach { i =>
      val batch = spark.range(25).select(
        (f.col("id") + 500000L + i * 25L).as("vec_id"),
        embOf((f.col("id") + 500000L + i * 25L) * 31L + 7L).as("embedding"))
      val t0 = System.nanoTime()
      gmLong.fold(batch, Some(i.toLong))
      gmCommittedFold = i.toLong
      gmLong.vacuum(keepManifests = 2)
      gmFoldTimes += (System.nanoTime() - t0) / 1e9
      // classify + size the fold's commit: delta bytes must track the
      // ~20 touched cells, not the 64 live ones
      Option(new java.io.File(s"$gmDir/_commits").listFiles())
        .getOrElse(Array.empty)
        .filter(x => x.getName.startsWith("m") && x.getName.endsWith(".txt"))
        .maxByOption(_.getName).foreach { newest =>
          val src = scala.io.Source.fromFile(newest, "UTF-8")
          val firstLine =
            try src.getLines().nextOption().getOrElse("") finally src.close()
          if (firstLine.endsWith("delta")) gmDeltaBytes += newest.length()
          else gmCkptBytes += newest.length()
        }
      if (i % 15 == 0) gmSamples += (f"fold $i%2d: " +
        f"manifests=${dCount(s"$gmDir/_commits", "m")}%d " +
        f"graph-tokens=${dCount(s"$gmDir/data/graph", "fold=")}%d " +
        f"routing-tokens=${dCount(s"$gmDir/data/routing", "fold=")}%d " +
        f"quantizers=${dCount(s"$gmDir/quantizers", "q")}%d " +
        f"owner-epochs=${dCount(s"$gmDir/owner", "e")}%d")
    }
    gmDone = true
    gmReader.join(30000)
    gmSamples.foreach(s => println(s"[stream-bench] knn-graph long-horizon $s"))
    println(f"[stream-bench] knn-graph long-horizon fold-seconds quartile means: ${
      gmFoldTimes.grouped(15).map(g => f"${g.sum / g.size}%.3f").mkString(", ")}")
    println(f"[stream-bench] knn-graph manifest bytes: delta mean=${
      gmDeltaBytes.sum.toDouble / math.max(1, gmDeltaBytes.size)}%.0f " +
      f"(n=${gmDeltaBytes.size}%d) ckpt mean=${
        gmCkptBytes.sum.toDouble / math.max(1, gmCkptBytes.size)}%.0f " +
      f"(n=${gmCkptBytes.size}%d) live cells=${
        graft.streaming.GraphMaintainer.latestEntries(gmFs, gmDir).size}%d")
    println(s"[stream-bench] knn-graph concurrent reader: " +
      s"reads=${gmReads.get} retries=${gmRetries.get} " +
      s"errors=${gmErrors.get} max-hw-lag=${gmMaxLag.get} folds " +
      s"serve-resolves=${gmLong.serveResolves.get} (manifest chain walks " +
      "on the serve path; ~0 = the head==lastSeen short-circuit held)")
    require(gmErrors.get == 0,
      s"knn-graph concurrent reader hit ${gmErrors.get} unrecovered errors " +
        "racing the in-loop vacuum — the keep>=2 in-flight-reader clamp is broken")

    // --- timed: FORGET-CASCADE CENTROID ARM (the quantizer path) ---
    // the most expensive forget arm, measured: a doomed id that IS a
    // quantizer centroid can only be honored by rebuildEpoch — re-fit
    // (unsized: inherits the 64-cell geometry), re-route, re-edge, ONE
    // checkpoint cutover — then one further commit pushes the pre-rebuild
    // state past the keep-2 clamp and vacuum reclaims its bytes: the
    // commit-then-vacuum forget SLA, byte-attested like the spec twin
    def dirBytes(p: String): Long = {
      val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try stream.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally stream.close()
    }
    val doomedId = gmLong.centroidIds.max
    // the runbook's entry point: retire must REFUSE the centroid and name
    // the executable path this arm then takes
    val retireRefused =
      try { gmLong.retire(spark.range(1).select(f.lit(doomedId).as("vec_id"))); false }
      catch { case e: IllegalArgumentException => e.getMessage.contains("rebuildEpoch") }
    require(retireRefused,
      "retire must refuse a quantizer centroid and name rebuildEpoch")
    val bytesBefore = dirBytes(gmDir)
    val tRb = System.nanoTime()
    gmLong.rebuildEpoch(gmLong.corpus.filter(f.col("vec_id") =!= doomedId))
    val rebuildS = (System.nanoTime() - tRb) / 1e9
    gmLong.fold(spark.range(1).select(
      (f.col("id") + 900000L).as("vec_id"),
      embOf((f.col("id") + 900000L) * 31L + 7L).as("embedding")), Some(61L))
    val tVac = System.nanoTime()
    val sweptPaths = gmLong.vacuum(keepManifests = 2)
    val vacuumS = (System.nanoTime() - tVac) / 1e9
    val bytesAfter = dirBytes(gmDir)
    val doomedOnDisk = spark.read.option("basePath", s"$gmDir/data/routing")
      .parquet(s"$gmDir/data/routing")
      .filter(f.col("vec_id") === doomedId).count() +
      spark.read.parquet(s"$gmDir/quantizers/*")
        .filter(f.col("cid") === doomedId).count()
    println(f"[stream-bench] knn-graph centroid-forget arm (64 cells, ${
        gmLong.corpus.count()}%d vectors): rebuildEpoch=$rebuildS%.2f s " +
      f"vacuum=$vacuumS%.2f s paths-swept=$sweptPaths%d " +
      f"bytes $bytesBefore%d -> $bytesAfter%d " +
      f"cells=${gmLong.centroidIds.length}%d (geometry inherited) " +
      f"doomed-bytes-on-disk=$doomedOnDisk%d")
    require(doomedOnDisk == 0,
      "centroid-forget attestation failed: the doomed id survives on disk " +
        "after rebuildEpoch + commit + vacuum")

    // --- timed: BM25-stats maintainer (lexical index folds) ---
    // the GraphMaintainer pattern on the lexical tier: stats refit on half
    // the gate corpus (untimed), the other half folded in per micro-batch
    // via mergeBm25Stats — O(|batch| + vocab) per fold, batchId-idempotent,
    // versioned-commit landing. Throughput in docs/s like the gate rows.
    val bmHalfA = spark.read.parquet(s"$root/docs").filter(f.col("doc_id") % 2 === 0)
    val bmHalfB = spark.read.parquet(s"$root/docs").filter(f.col("doc_id") % 2 =!= 0)
    bmHalfB.repartition(8).write.parquet(s"$root/bm25feed")
    val bm25m = graft.streaming.Bm25Maintainer.build(
      bmHalfA, s"$root/bm25stats")
    timeQuery("bm25-stats maintainer (mergeBm25Stats folds)", nDocs / 2L) {
      val src = spark.readStream
        .schema(bmHalfB.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/bm25feed")
      bm25m.attach(src)
    }

    // --- timed: the FULLY-LOADED front door, every serve-side model on ---
    // boilerplate strip + exact-novelty anti-join + watermark dedup + LM
    // perplexity + NB classifier + contamination + packing, ONE continuous
    // query — the gate-composition cost a capacity plan needs. Fixture:
    // docs2 = the gate corpus with a shared 3-variant footer line appended
    // (real cross-doc boilerplate for the strip to remove); all models are
    // fit/materialized UNTIMED on the stored corpus (batch artifacts).
    val docs2 = spark.read.parquet(s"$root/docs").select(
      f.col("doc_id"),
      f.concat(f.col("text"), f.lit("\n"),
        f.lit("standard footer line "), f.col("doc_id") % 3).as("text"),
      f.col("source"), f.col("timestamp"))
    docs2.repartition(8).write.parquet(s"$root/docs2")
    val storedDocs2 = spark.read.parquet(s"$root/docs2")
    graft.operators.Curation.boilerplateIndex(storedDocs2)
      .write.parquet(s"$root/bpidx")
    val bpIdx = spark.read.parquet(s"$root/bpidx")
    val cleanedStored = graft.operators.Curation.stripBoilerplate(storedDocs2, bpIdx)
      .withColumnRenamed("clean_text", "text")
    val benchVocab2 = cleanedStored
      .filter(f.col("doc_id") % 97 === 0)
      .select(f.explode(graft.functions.TextFunctions.shingles(
        graft.functions.TextFunctions.tokens(f.col("text")), 4)).as("s"))
      .distinct()
    val corpusDigests2 = cleanedStored
      .filter(f.col("doc_id") % 10 === 3)
      .select(f.md5(f.col("text")).as("text_hash"))
      .union(spark.range(4 * nDocs).select(
        f.md5(f.concat(f.lit("corpus-"), f.col("id"))).as("text_hash")))
    val lm2 = graft.operators.TextAnalysis.lmModel(
      cleanedStored.filter(f.col("doc_id") % 7 === 0))
    val clf2 = graft.operators.TextAnalysis.classifierModel(
      cleanedStored, f.col("source").isin("src0", "src2", "src4"))
    timeQuery("front door FULLY LOADED (strip+novel+LM+clf+pack)", nDocs.toLong) {
      val src = spark.readStream
        .schema(storedDocs2.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/docs2")
      val stripped = graft.operators.Curation.stripBoilerplate(src, bpIdx)
        .withColumnRenamed("clean_text", "text")
      graft.streaming.StreamCuration.packSequences(
        graft.streaming.IngestGate.admitNovel(
          stripped, benchVocab2, corpusDigests2, watermark = "24 hours",
          classifier = Some(clf2), lmModel = Some(lm2), maxAvgNll = 12.0))
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$root/chk9").start()
    }

    // v2 stateful API on the RocksDB store (the provider it requires)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    timeQuery("train tracker (transformWithState, RocksDB)", arrivals.size.toLong) {
      val src: Dataset[Arrival] = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[Arrival].schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/arrivals").as[Arrival]
      graft.streaming.TwsOps.trainPositionsTws(src)
        .writeStream.format("noop").outputMode(OutputMode.Update())
        .option("checkpointLocation", s"$root/chk3").start()
    }

    // --- timed: CDC changelog reduction (latest change per key) ---
    // the continuous half of Cdc.mergeChangelog: one ValueState row per
    // key (100k keys here, 10 changes each), late/stale seqs dropped in
    // the processor — per-batch work tracks the batch, state the keyspace
    val nChanges = nTurnstile.toLong
    spark.range(nChanges).select(
      (org.apache.spark.sql.functions.col("id") % 100000L).as("key"),
      org.apache.spark.sql.functions.col("id").as("seq"),
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("id") % 11L === 0L,
        org.apache.spark.sql.functions.lit("D"))
        .otherwise(org.apache.spark.sql.functions.lit("U")).as("op"),
      (org.apache.spark.sql.functions.col("id") % 9973L).cast("double").as("value"))
      .repartition(8).write.parquet(s"$root/changes")
    // --- timed: streaming LAKE maintenance (changelog -> LakeTable) ---
    // the full storage-layer loop per micro-batch: reduce to latest-per-
    // key, prune to box-intersecting files, rewrite + manifest commit.
    // Reuses the $root/changes fixture; base = one row per live key.
    val lakeDir = s"$root/laketab"
    graft.sources.LakeTable.init(
      spark.range(100000L).select(
        org.apache.spark.sql.functions.col("id").as("key"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("n"),
          org.apache.spark.sql.functions.col("id")).as("name"),
        (org.apache.spark.sql.functions.col("id") % 997L).cast("double").as("val")),
      lakeDir, Seq("key"), nFiles = 8)
    timeQuery("lake maintenance (changelog MERGE -> committed layout)", nChanges) {
      val src = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[
          graft.streaming.CdcStream.Change].schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$root/changes")
        .withColumnRenamed("value", "val")
      graft.streaming.LakeMaintenance.attach(src, lakeDir, Seq("key"), nFilesNew = 4)
    }

    // --- timed: MERGE-ON-READ lake maintenance (paired with the row
    // above): the same change stream, full-image-ified, folds through
    // applyChangelogFullMor — each batch commits one deletion-vector
    // sidecar + fresh image files, reading ZERO existing data, with the
    // in-loop materialize trigger folding vectors when a third of the
    // files are shadowed. The delta vs the MoW row is the
    // ingest-latency / read-amplification trade, measured.
    val lakeDirM = s"$root/laketabmor"
    graft.sources.LakeTable.init(
      spark.range(100000L).select(
        org.apache.spark.sql.functions.col("id").as("key"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("n"),
          org.apache.spark.sql.functions.col("id")).as("name"),
        (org.apache.spark.sql.functions.col("id") % 997L).cast("double").as("val")),
      lakeDirM, Seq("key"), nFiles = 8)
    timeQuery("lake maintenance MERGE-ON-READ (DV sidecar + fresh images per batch)", nChanges) {
      val src = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[
          graft.streaming.CdcStream.Change].schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$root/changes")
        .withColumnRenamed("value", "val")
        .withColumn("name", org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("n"),
          org.apache.spark.sql.functions.col("key")))
      graft.streaming.LakeMaintenance.attachMor(
        src, lakeDirM, Seq("key"), nFilesNew = 4,
        materializeAtShadowedFraction = Some(0.34))
    }

    // --- timed: LOCKSTEP lake maintenance (table + derived view) ---
    // the end-to-end incremental pipeline: per micro-batch, the changelog
    // folds into the table AND the materialized rollup advances via the
    // changefeed (retracting applyChanges path; 64 groups) — the delta
    // over the table-only row above is the price of a continuously-fresh
    // downstream view
    val lakeDir2 = s"$root/laketab2"
    graft.sources.LakeTable.init(
      spark.range(100000L).select(
        org.apache.spark.sql.functions.col("id").as("key"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("g"),
          org.apache.spark.sql.functions.col("id") % 64L).as("name"),
        (org.apache.spark.sql.functions.col("id") % 997L).cast("double").as("val")),
      lakeDir2, Seq("key"), nFiles = 8)
    timeQuery("lake maintenance + lockstep view (table AND rollup per batch)", nChanges) {
      val src = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[
          graft.streaming.CdcStream.Change].schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$root/changes")
        .withColumnRenamed("value", "val")
      graft.streaming.LakeMaintenance.attachWithView(
        src, lakeDir2, Seq("key"), s"$root/lakeview", Seq("name"),
        Map(("sum", "val") -> "sum_val", ("count", "*") -> "cnt",
          ("count", "val") -> "cnt_val"),
        nFilesNew = 4)
    }

    // --- timed: streaming INGEST arm (append stream -> committed lake) ---
    // each micro-batch lands O(batch) as its own z-ordered files under the
    // manifest (exactly-once per batchId — an append replay is NOT
    // semantically idempotent, so the marker is load-bearing); in-loop
    // bin-packing compaction keeps the live file count bounded while the
    // changefeed stays empty across compaction spans
    val lakeDir3 = s"$root/laketab3"
    graft.sources.LakeTable.init(
      spark.range(1000L).select(
        org.apache.spark.sql.functions.col("id").as("key"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("s"),
          org.apache.spark.sql.functions.col("id")).as("name"),
        (org.apache.spark.sql.functions.col("id") % 997L).cast("double").as("val")),
      lakeDir3, Seq("key"), nFiles = 2)
    val nIngest = 200000L
    val ingestRows = spark.range(nIngest).select(
      (org.apache.spark.sql.functions.col("id") + 10000L).as("key"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("n"),
        org.apache.spark.sql.functions.col("id")).as("name"),
      (org.apache.spark.sql.functions.col("id") % 997L).cast("double").as("val"))
    ingestRows.repartition(16).write.parquet(s"$root/ingestsrc")
    timeQuery("lake ingest arm (append stream, in-loop compaction)", nIngest) {
      val src = spark.readStream
        .schema(ingestRows.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/ingestsrc")
      graft.streaming.LakeMaintenance.attachAppend(
        src, lakeDir3, Seq("key"), nFilesNew = 4,
        compactTargetBytes = Some(4L << 20))
    }
    println(s"[stream-bench] ingest-arm live files after 8 folds: " +
      s"${graft.sources.LakeTable.latest(spark, lakeDir3).files.size} " +
      s"(rows ${graft.sources.LakeTable.readLive(spark, lakeDir3).count()})")

    // --- timed: SCD2 dimension maintainer (lake-homed validity history) ---
    // build derives a DEEP history untimed (the epoch refit); the timed
    // loop folds full-image change batches — each fold APPENDS its newly-
    // closed intervals and rewrites only touched current-slice files, so
    // per-fold seconds stay FLAT while the closed bulk grows every batch
    // (the predecessor design re-serialized the whole accumulated history
    // parquet per fold — O(history) writes). Feed files are seq-range-
    // partitioned so micro-batches respect the monotone-LSN contract.
    val nScdKeys = 20000L
    val scdSeed = spark.range(nScdKeys * 5).select(
      (f.col("id") % nScdKeys).as("key"),
      f.col("id").as("seq"),
      f.when(f.col("id") % 13L === 0L, f.lit("D"))
        .otherwise(f.lit("U")).as("op"),
      f.concat(f.lit("n"), f.col("id") % 97).as("name"),
      (f.col("id") % 9973L).cast("double").as("val"))
    val scdm = graft.streaming.ScdMaintainer.build(scdSeed, s"$root/scdm")
    val nScdChanges = nScdKeys * 2
    val scdFeed = spark.range(nScdChanges).select(
      (f.col("id") * 7L % nScdKeys).as("key"),
      (f.col("id") + nScdKeys * 10L).as("seq"),
      f.when(f.col("id") % 13L === 0L, f.lit("D"))
        .otherwise(f.lit("U")).as("op"),
      f.concat(f.lit("m"), f.col("id") % 97).as("name"),
      (f.col("id") % 997L).cast("double").as("val"))
    scdFeed.repartitionByRange(8, f.col("seq")).write.parquet(s"$root/scdfeed")
    // the fold==refit invariant needs micro-batches in seq-RANGE order;
    // the file stream source orders new files by modification time, which
    // a parallel write does NOT guarantee matches the part numbering —
    // stamp mtimes explicitly ascending in part order (ranges ascend with
    // part number under repartitionByRange) so pickup order is pinned
    def pinFeedOrder(dir: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val t0 = System.currentTimeMillis() - 1000000L
      hfs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
        .zipWithIndex
        .foreach { case (s, i) => hfs.setTimes(s.getPath, t0 + i * 1000L, -1) }
    }
    pinFeedOrder(s"$root/scdfeed")
    val scdFoldTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    timeQuery("scd2 maintainer (closed append + touched current rewrite per fold)", nScdChanges) {
      val src = spark.readStream
        .schema(scdFeed.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/scdfeed")
      src.writeStream
        .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!b.isEmpty) {
            val t0 = System.nanoTime()
            scdm.fold(b.toDF(), Some(id))
            scdFoldTimes += (System.nanoTime() - t0) / 1e9
            ()
          }
        }
        .start()
    }
    println(f"[stream-bench] scd2 per-fold seconds (closed bulk grows every fold): ${
      scdFoldTimes.map(t => f"$t%.2f").mkString(", ")}")
    // the pair marker must stay O(arms) — flat bytes per fold, however
    // many batches ever folded (the metadata twin of the flat fold times)
    locally {
      val foldDir = new java.io.File(s"$root/scdm/fold")
      val markers = foldDir.listFiles().filter(_.getName.endsWith(".txt"))
        .sortBy(_.getName)
      println(s"[stream-bench] scd2 pair-marker bytes by fold: " +
        markers.map(_.length).mkString(", ") + " (flat = O(arms) replay state)")
    }

    // --- timed: the SAME fold chain, current slice routed MERGE-ON-READ ---
    // (morThresholdBytes=0: every fold commits one DV sidecar + fresh
    // image files, zero existing current files opened; the materialize
    // trigger folds vectors in once a third of the files are shadowed).
    // The delta vs the MoW row above is the ingest-latency /
    // read-amplification trade at the dimension artifact.
    val scdmMor = graft.streaming.ScdMaintainer.build(scdSeed, s"$root/scdmmor")
    val scdMorTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    timeQuery("scd2 maintainer MERGE-ON-READ (DV sidecar + fresh images per fold)", nScdChanges) {
      val src = spark.readStream
        .schema(scdFeed.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/scdfeed")
      src.writeStream
        .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!b.isEmpty) {
            val t0 = System.nanoTime()
            scdmMor.fold(b.toDF(), Some(id),
              morThresholdBytes = Some(0L),
              materializeAtShadowedFraction = Some(0.34))
            scdMorTimes += (System.nanoTime() - t0) / 1e9
            ()
          }
        }
        .start()
    }
    println(f"[stream-bench] scd2 MoR per-fold seconds: ${
      scdMorTimes.map(t => f"$t%.2f").mkString(", ")}")

    // --- timed: SCD2 FORGET arm (right-to-be-forgotten SLA on the dim) ---
    // a tombstone stream erases keys' whole records — closed intervals
    // AND current rows — per micro-batch; per-forget seconds are the SLA
    // number (cost is touched-files-sized on the closed table, the one
    // rewrite the fold path never pays)
    val nForget = 512L
    spark.range(nForget).select((f.col("id") * 39L % nScdKeys).as("key"))
      .repartition(4).write.parquet(s"$root/scdforget")
    val scdForgetTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    timeQuery("scd2 forget arm (tombstone stream, both tables erased per batch)", nForget) {
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("key BIGINT"))
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/scdforget")
      src.writeStream
        .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!b.isEmpty) {
            val t0 = System.nanoTime()
            scdm.forget(b.toDF(), Some(id))
            scdForgetTimes += (System.nanoTime() - t0) / 1e9
            ()
          }
        }
        .start()
    }
    println(f"[stream-bench] scd2 per-forget seconds (box-pruned rewrite on both tables): ${
      scdForgetTimes.map(t => f"$t%.2f").mkString(", ")}")

    // --- long-horizon METADATA arm: 200 folds, every retention knob on ---
    // the bounded-metadata claims (O(arms) replay markers, O(keep) pair
    // markers, vacuumManifests' O(keep + checkpoint-interval) commit log,
    // swept owner epochs) at weeks-of-streaming shape: 200 micro-folds
    // with keepMarkers + in-loop vacuumManifests + vacuumHistory, the
    // sampled file counts and latest() resolution time must stay FLAT —
    // the pre-r12 protocol grew one manifest + one marker per micro-batch
    // forever (2.6M files after a month of 1 s batches), and an
    // un-vacuumed log makes every listing-based operation O(folds-ever)
    val nLongKeys = 1000L
    val scdLong = graft.streaming.ScdMaintainer.build(
      spark.range(nLongKeys).select(
        f.col("id").as("key"), f.col("id").as("seq"),
        f.lit("U").as("op"), f.concat(f.lit("n"), f.col("id")).as("name"),
        (f.col("id") * 1.0).as("val")),
      s"$root/scdlong")
    def isManifest(n: String) = n.startsWith("v") && n.endsWith(".txt")
    val nLongFolds = 200
    val longFoldTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val longSamples = scala.collection.mutable.ArrayBuffer.empty[String]
    // a CONCURRENT changefeed subscriber rides the whole 200-fold run:
    // poll pendingChanges, process (count), commit the cursor — the
    // documented at-least-once consumer loop — while folds, in-loop
    // vacuumManifests, and vacuumHistory(keep=2) churn underneath. The
    // retention-covers-the-slowest-cursor contract plus one re-poll (the
    // reader protocol when a scan loses the race to a sweep) must end
    // the run with ZERO unrecovered errors and a bounded version lag.
    val feedCursorDir = s"$root/scdlong-cursor"
    @volatile var scdDone = false
    val feedPolls = new java.util.concurrent.atomic.AtomicInteger
    val feedRetries = new java.util.concurrent.atomic.AtomicInteger
    val feedErrors = new java.util.concurrent.atomic.AtomicInteger
    val feedDrained = new java.util.concurrent.atomic.AtomicLong
    val feedMaxLag = new java.util.concurrent.atomic.AtomicInteger
    val feedReader = new Thread(() => {
      while (!scdDone) {
        // the library subscriber loop (poll -> process -> commit cursor,
        // retry window included) — ScdMaintainer.pollChangefeed is the
        // entry point a real downstream consumer calls
        def pollOnce(): Unit = {
          val before = graft.sources.LakeTable.cursor(spark, feedCursorDir)
          graft.streaming.ScdMaintainer.pollChangefeed(
              spark, s"$root/scdlong", feedCursorDir, initial = "latest",
              retryWindowMs = 30000L,
              onRetry = () => { feedRetries.incrementAndGet(); () }) {
            (feed, v) =>
              before.foreach(b =>
                feedMaxLag.getAndUpdate(l => math.max(l, v - b)))
              feedDrained.addAndGet(feed.count())
              ()
          }
          ()
        }
        try {
          pollOnce()
          feedPolls.incrementAndGet()
          ()
        } catch { case e: Exception =>
          feedErrors.incrementAndGet()
          println(s"[stream-bench] scd2 changefeed reader ERROR: ${e.getMessage}")
        }
        Thread.sleep(250)
      }
    }, "scd2-changefeed-reader")
    feedReader.setDaemon(true)
    feedReader.start()
    (1 to nLongFolds).foreach { i =>
      val batch = spark.range(25).select(
        ((f.col("id") * 13L + i * 25L) % nLongKeys).as("key"),
        (f.col("id") + i * 1000L + nLongKeys * 100L).as("seq"),
        f.lit("U").as("op"), f.concat(f.lit("u"), f.col("id")).as("name"),
        (f.col("id") + i * 1.0).as("val"))
      val t0 = System.nanoTime()
      scdLong.fold(batch, Some(i.toLong), keepMarkers = Some(2),
        compactTargetBytes = Some(1L << 20))
      if (i % 8 == 0) {
        graft.sources.LakeTable.vacuumManifests(
          spark, scdLong.closedTablePath, keepManifests = 8)
        graft.sources.LakeTable.vacuumManifests(
          spark, scdLong.currentTablePath, keepManifests = 8)
        scdLong.vacuumHistory(keepVersions = 2)
        ()
      }
      longFoldTimes += (System.nanoTime() - t0) / 1e9
      if (i % 40 == 0) {
        val r0 = System.nanoTime()
        graft.sources.LakeTable.latest(spark, scdLong.currentTablePath)
        val resolveMs = (System.nanoTime() - r0) / 1e6
        longSamples += (f"fold $i%3d: " +
          f"closed-commits=${fCount(s"${scdLong.closedTablePath}/_commits", isManifest)}%d " +
          f"current-commits=${fCount(s"${scdLong.currentTablePath}/_commits", isManifest)}%d " +
          f"pair-markers=${fCount(s"$root/scdlong/fold", _.endsWith(".txt"))}%d " +
          f"owner-epochs=${fCount(s"$root/scdlong/owner", _.endsWith(".txt"))}%d " +
          f"latest()=$resolveMs%.1f ms")
      }
    }
    scdDone = true
    feedReader.join(30000)
    longSamples.foreach(s => println(s"[stream-bench] scd2 long-horizon $s"))
    val q = nLongFolds / 4
    println(f"[stream-bench] scd2 long-horizon fold-seconds quartile means: ${
      longFoldTimes.grouped(q).map(g => f"${g.sum / g.size}%.3f").mkString(", ")}")
    println(s"[stream-bench] scd2 concurrent changefeed reader: " +
      s"polls=${feedPolls.get} drained=${feedDrained.get} rows " +
      s"retries=${feedRetries.get} errors=${feedErrors.get} " +
      s"max-version-lag=${feedMaxLag.get}")
    require(feedErrors.get == 0,
      s"scd2 changefeed reader hit ${feedErrors.get} unrecovered errors " +
        "racing in-loop retention — the keepVersions contract is broken")

    timeQuery("cdc changelog reduction (transformWithState)", nChanges) {
      val src = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[
          graft.streaming.CdcStream.Change].schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/changes")
        .as[graft.streaming.CdcStream.Change]
      graft.streaming.CdcStream.latestChanges(src)
        .writeStream.format("noop").outputMode(OutputMode.Update())
        .option("checkpointLocation", s"$root/chk12").start()
    }

    // --- timed: streaming weighted sampler (E-S top-n per shard) ---
    // constant nShards x n state; the key projection (quality + md5 draw)
    // dominates per-row cost, the heap fold is O(log n); docs/s like the
    // gate rows. Uses the same gate corpus.
    timeQuery("weighted sampler (E-S shard top-n)", nDocs.toLong) {
      val src = spark.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/docs")
      graft.streaming.StreamSample.weightedSampleStream(src, n = 100, nShards = 32)
        .writeStream.format("noop").outputMode(OutputMode.Update())
        .option("checkpointLocation", s"$root/chk13").start()
    }

    // --- timed: vocab-drift monitor (MG sketch ON the stream) ---
    // constant state (nShards x capacity counters, forever) over the same
    // gate corpus — the 12-token docs make this a tokens-heavy stateful
    // fold; throughput is reported in docs/s like the gate rows
    timeQuery("vocab drift monitor (MG transformWithState)", nDocs.toLong) {
      val src = spark.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/docs")
      graft.streaming.VocabDrift.monitor(src, nShards = 32, capacity = 256, k = 10)
        .writeStream.format("noop").outputMode(OutputMode.Update())
        .option("checkpointLocation", s"$root/chk10").start()
    }

    // --- timed: streaming domain gate (blocklist + per-domain budget) ---
    // one transformWithState counter per domain — the crawl-frontier cap;
    // the fixture's 5 sources: one blocked, the rest budgeted far under
    // their supply so the counter path dominates the measurement
    timeQuery("domain gate (blocklist + first-N budget)", nDocs.toLong) {
      val src = spark.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$root/docs")
      val blocklist = Seq("src3").toDF("domain")
      graft.streaming.DomainGate.admit(src, blocklist, cap = nDocs / 400)
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$root/chk11").start()
    }

    spark.stop()
  }
}
