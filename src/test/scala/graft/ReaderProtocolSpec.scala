package graft

import org.apache.spark.sql.functions._
import graft.sources.LakeTable
import graft.streaming.{GraphMaintainer, ScdMaintainer}

/** The cross-JVM READER protocol as library API ([[GraphMaintainer.openReader]]
  * / [[LakeTable.pollChanges]] / [[ScdMaintainer.pollChangefeed]]): external
  * subscribers resolve committed state from disk, retry a lost race against
  * in-loop retention within an elapsed-time window, refuse emptied/regressed
  * listings, and deliver at-least-once — previously only StreamBench's
  * hand-rolled threads proved this; these specs pin the library form.
  */
class ReaderProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-reader-$tag").toString

  private def vecs(ids: Seq[Long]) = {
    val dim = 8
    ids.map { id =>
      (id, Array.tabulate(dim)(j => (((id * (j + 3) + 7) % 97).toFloat / 97f) - 0.5f))
    }.toDF("vec_id", "embedding")
  }

  test("GraphReader serves the owner's committed state without taking ownership") {
    val dir = tmp("serve")
    val m = GraphMaintainer.build(vecs(0L until 40L), dir, nCentroids = Some(8))
    m.fold(vecs(100L until 120L), Some(1L))
    val r = GraphMaintainer.openReader(spark, dir)
    r.snapshot { s =>
      assert(s.commit.isDefined)
      assert(s.highWater.contains(1L))
      assert(s.graph.collect().map(_.toSeq).toSet ==
        m.graph.collect().map(_.toSeq).toSet)
      assert(s.corpus.count() == 60L)
    }
    assert(r.highWater.contains(1L))
    assert(r.retries == 0L, "a quiet log must cost zero retries")
    // frames must not ESCAPE f: the retry window and the forward-listing
    // refusal protect only reads inside snapshot{} — a leaked unforced
    // frame fails loud at first access instead of racing the owner's
    // vacuum unretried
    val escaped = r.snapshot(identity)
    val e = intercept[IllegalArgumentException](escaped.graph)
    assert(e.getMessage.contains("INSIDE f"), e.getMessage)
    // opening readers acquired no fence epoch: the owner's next mutation
    // must still succeed (a reader that took ownership would fence it)
    m.fold(vecs(200L until 210L), Some(2L))
    assert(r.highWater.contains(2L))
  }

  test("GraphReader survives folds racing a grace-0 in-loop vacuum: zero unrecovered errors, monotone hw") {
    val dir = tmp("race")
    val m = GraphMaintainer.build(vecs(0L until 60L), dir, nCentroids = Some(8))
    val nFolds = 12
    @volatile var maintainerErr: Option[Throwable] = None
    val writer = new Thread(() => {
      try (1 to nFolds).foreach { i =>
        m.fold(vecs((1000L + i * 20L) until (1000L + i * 20L + 20L)), Some(i.toLong))
        m.vacuum(keepManifests = 2, graceMs = 0L)
      } catch { case t: Throwable => maintainerErr = Some(t) }
    }, "reader-race-writer")
    writer.start()
    val r = GraphMaintainer.openReader(spark, dir, retryWindowMs = 60000L)
    var lastHw = -1L
    var reads = 0
    while (writer.isAlive) {
      // snapshot retries internally on a lost race; an escape here fails
      // the spec — exactly the bench arm's zero-unrecovered-errors claim
      val hw = r.snapshot { s => s.graph.count(); s.highWater.getOrElse(0L) }
      assert(hw >= lastHw, "served high-water regressed across reader polls")
      lastHw = hw
      reads += 1
    }
    writer.join()
    assert(maintainerErr.isEmpty, s"maintainer failed: $maintainerErr")
    assert(reads > 0)
    r.snapshot { s =>
      assert(s.highWater.contains(nFolds.toLong))
      assert(s.graph.collect().map(_.toSeq).toSet ==
        m.graph.collect().map(_.toSeq).toSet,
        "final external read must equal the owner's served state")
    }
  }

  test("GraphReader refuses emptied and regressed listings once it has served") {
    val dir = tmp("refuse")
    val m = GraphMaintainer.build(vecs(0L until 30L), dir, nCentroids = Some(8))
    m.fold(vecs(100L until 110L), Some(1L))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val r = GraphMaintainer.openReader(spark, dir, retryWindowMs = 300L)
    r.snapshot(_.highWater) // anchor: the reader has now served the head
    // REGRESSION: deleting the newest manifest out-of-band rolls the
    // listing back below the served commit — refuse, don't time-travel
    val names = GraphMaintainer.manifestNames(fs, dir)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_commits/${names.last}"), false)
    val e1 = intercept[IllegalArgumentException](r.snapshot(_.highWater))
    assert(e1.getMessage.contains("regressed"))
    // EMPTIED: no manifests at all after having served — refuse, don't
    // answer with an empty corpus
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_commits"), true)
    val e2 = intercept[IllegalArgumentException](r.snapshot(_.highWater))
    assert(e2.getMessage.contains("refusing to serve an empty corpus"))
    // a FRESH reader on a genuinely empty log serves the empty state fine
    val r2 = GraphMaintainer.openReader(spark, dir, retryWindowMs = 300L)
    r2.snapshot { s =>
      assert(s.commit.isEmpty && s.graph.isEmpty && s.corpus.isEmpty)
    }
  }

  test("pollChangefeed: latest-anchor, net-span drain, at-least-once redelivery through the retry window") {
    val dir = tmp("feed")
    val cursorDir = tmp("feed-cursor")
    val seed = (0L until 50L).map(i => (i, i, "U", s"n$i", i * 1.0))
      .toDF("key", "seq", "op", "name", "val")
    val scd = ScdMaintainer.build(seed, dir)
    // anchor poll: initial = latest pins the subscription at the current
    // version and delivers nothing
    assert(ScdMaintainer.pollChangefeed(spark, dir, cursorDir)(
      (_, _) => fail("anchor poll must deliver no feed")).isEmpty)
    scd.fold((0L until 10L).map(i => (i, 100L + i, "U", s"u$i", i * 2.0))
      .toDF("key", "seq", "op", "name", "val"), Some(1L))
    scd.fold(Seq((3L, 200L, "D", "x", 0.0)).toDF("key", "seq", "op", "name", "val"),
      Some(2L))
    // ONE poll drains the whole multi-fold span as a NET feed; the handler
    // throwing on its first delivery exercises the retry window — the
    // second attempt re-delivers (at-least-once) and the cursor advances
    // exactly once, to the version the successful attempt processed
    var attempts = 0
    var drainedKeys = Set.empty[Long]
    val v = ScdMaintainer.pollChangefeed(
        spark, dir, cursorDir, retryWindowMs = 30000L) { (feed, _) =>
      attempts += 1
      if (attempts == 1) sys.error("simulated subscriber crash before cursor commit")
      val rows = feed.collect()
      drainedKeys = rows.map(_.getAs[Long]("key")).toSet
      val ops = rows.map(r => r.getAs[Long]("key") -> r.getAs[String]("op")).toMap
      assert(ops(3L) == "D", "a key deleted later in the span must arrive as D")
      assert((ops - 3L).values.forall(_ == "U"))
    }
    assert(v.isDefined)
    assert(attempts == 2, "the thrown first delivery must be retried in-window")
    assert(drainedKeys == (0L until 10L).toSet)
    assert(LakeTable.cursor(spark, cursorDir).contains(v.get))
    // up to date again
    assert(ScdMaintainer.pollChangefeed(spark, dir, cursorDir)(
      (_, _) => fail("no new changes")).isEmpty)
  }

  test("pollChangefeed races folds + in-loop retention: zero unrecovered errors, bounded lag") {
    val dir = tmp("feedrace")
    val cursorDir = tmp("feedrace-cursor")
    val nKeys = 200L
    val seed = spark.range(nKeys).select(
      col("id").as("key"), col("id").as("seq"), lit("U").as("op"),
      concat(lit("n"), col("id")).as("name"), (col("id") * 1.0).as("val"))
    val scd = ScdMaintainer.build(seed, dir)
    ScdMaintainer.pollChangefeed(spark, dir, cursorDir)((_, _) => ()) // anchor
    val nFolds = 12
    @volatile var writerErr: Option[Throwable] = None
    val writer = new Thread(() => {
      try (1 to nFolds).foreach { i =>
        scd.fold(
          spark.range(20).select(
            ((col("id") * 7L + i) % nKeys).as("key"),
            (col("id") + i * 1000L + nKeys * 10L).as("seq"),
            lit("U").as("op"), concat(lit("u"), col("id")).as("name"),
            (col("id") + i * 1.0).as("val")),
          Some(i.toLong), keepMarkers = Some(2))
        LakeTable.vacuumManifests(spark, scd.currentTablePath, keepManifests = 8)
        scd.vacuumHistory(keepVersions = 2)
        ()
      } catch { case t: Throwable => writerErr = Some(t) }
    }, "feed-race-writer")
    writer.start()
    var drained = 0L
    var polls = 0
    while (writer.isAlive) {
      // the library loop retries a lost race internally; an escape fails
      // the spec (the bench arm's zero-unrecovered-errors claim)
      ScdMaintainer.pollChangefeed(
          spark, dir, cursorDir, retryWindowMs = 60000L) { (feed, _) =>
        drained += feed.count()
      }
      polls += 1
    }
    writer.join()
    assert(writerErr.isEmpty, s"maintainer failed: $writerErr")
    // final drain: the subscriber ends fully caught up
    ScdMaintainer.pollChangefeed(
        spark, dir, cursorDir, retryWindowMs = 60000L)((feed, _) =>
      drained += feed.count())
    assert(ScdMaintainer.pollChangefeed(spark, dir, cursorDir)(
      (_, _) => fail("must be caught up after the final drain")).isEmpty)
    assert(drained > 0L, "the run must have delivered changes")
    assert(polls > 0)
  }
}
