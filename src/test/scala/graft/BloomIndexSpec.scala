package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{BloomIndex, LakeTable}

class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(prefix: String): (String, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory(prefix).toString + "/t"
    // clustered on KEY: a name needle intersects every key box, so any
    // pruning the lookup achieves is the bloom's alone
    val base = (0L until 800L).map(k => (k, s"name_$k", k * 1.5))
      .toDF("key", "name", "val")
    LakeTable.init(base, dir, Seq("key"), nFiles = 8)
    (dir, base)
  }

  test("lookup equals the raw filter; only bloom-admitted files open") {
    val (dir, base) = mkTable("graft-bloom")
    assert(BloomIndex.refresh(spark, dir, "name") == 8)
    assert(BloomIndex.refresh(spark, dir, "name") == 0, "second refresh is a no-op")
    val needles = Seq("name_42", "name_777")
    val got = BloomIndex.lookup(spark, dir, "name", needles)
      .orderBy(col("key")).collect().map(_.toSeq).toSeq
    val want = base.filter(col("name").isin(needles: _*))
      .orderBy(col("key")).collect().map(_.toSeq).toSeq
    assert(got == want)
    val (kept, unindexed) = BloomIndex.prunedFiles(spark, dir, "name", needles)
    assert(unindexed.isEmpty, "every live file is indexed")
    assert(kept.nonEmpty && kept.size < 8,
      s"the needles live in at most a few files, got ${kept.size}")
    // soundness: every file actually containing a needle is admitted
    val mustKeep = spark.read.parquet(LakeTable.liveFiles(spark, dir): _*)
      .filter(col("name").isin(needles: _*))
      .select(substring_index(input_file_name(), "/", -1)).distinct()
      .as[String].collect().toSet
    assert(mustKeep.subsetOf(kept.toSet))
  }

  test("an absent needle prunes every file; NULL values never index or match") {
    val dir = Files.createTempDirectory("graft-bloomnull").toString + "/t"
    val base = Seq((1L, "alpha", 1.0), (2L, null.asInstanceOf[String], 2.0),
      (3L, "gamma", 3.0)).toDF("key", "name", "val")
    LakeTable.init(base, dir, Seq("key"), nFiles = 2)
    BloomIndex.refresh(spark, dir, "name")
    val (kept, unindexed) = BloomIndex.prunedFiles(
      spark, dir, "name", Seq("no_such_value_xyzzy"))
    assert(kept.isEmpty && unindexed.isEmpty,
      s"an absent needle reads NOTHING: kept=$kept unindexed=$unindexed")
    assert(BloomIndex.lookup(spark, dir, "name", Seq("no_such_value_xyzzy")).isEmpty)
    assert(BloomIndex.lookup(spark, dir, "name", Seq("alpha")).count() == 1)
  }

  test("index lag is conservative, never wrong: fresh files read unpruned until refresh") {
    val (dir, _) = mkTable("graft-bloomlag")
    BloomIndex.refresh(spark, dir, "name")
    // ingest lands AFTER the index was built
    LakeTable.append(
      Seq((9000L, "late_arrival", 9.0)).toDF("key", "name", "val"),
      dir, Seq("key"), nFilesNew = 1)
    val (kept, unindexed) = BloomIndex.prunedFiles(
      spark, dir, "name", Seq("late_arrival"))
    assert(kept.isEmpty && unindexed.size == 1,
      "the un-indexed fresh file must be read conservatively")
    assert(BloomIndex.lookup(spark, dir, "name", Seq("late_arrival")).count() == 1)
    // refresh indexes ONLY the missing file, and the conservative read ends
    assert(BloomIndex.refresh(spark, dir, "name") == 1)
    val (kept2, unindexed2) = BloomIndex.prunedFiles(
      spark, dir, "name", Seq("late_arrival"))
    assert(unindexed2.isEmpty && kept2.size == 1)
    // geometry is fixed at first build
    intercept[IllegalArgumentException] {
      BloomIndex.refresh(spark, dir, "name", bitsLog2 = 10)
    }
  }

  test("pruned-away files are provably not opened; vacuumIndex drops orphans") {
    val (dir, base) = mkTable("graft-bloomgone")
    BloomIndex.refresh(spark, dir, "name")
    val (kept, _) = BloomIndex.prunedFiles(spark, dir, "name", Seq("name_42"))
    val victim = LakeTable.latest(spark, dir).files
      .filterNot(kept.toSet).head
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$victim"), false)
    // the lookup plan never references the deleted file
    assert(BloomIndex.lookup(spark, dir, "name", Seq("name_42"))
      .collect().map(_.getAs[Long]("key")).toSeq == Seq(42L))
    // restore a consistent table for the vacuum half
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val (dir2, _) = mkTable("graft-bloomvac")
    BloomIndex.refresh(spark, dir2, "name")
    // a MERGE replaces files; their bloom rows become orphans once the
    // pre-merge version falls out of retention
    LakeTable.applyChangelog(spark, dir2,
      Seq((42L, 1L, "U", 1.0)).toDF("key", "seq", "op", "val"), Seq("key"))
    BloomIndex.refresh(spark, dir2, "name")
    val keptRows = BloomIndex.vacuumIndex(spark, dir2, "name")
    // both versions still in retention: every row survives
    assert(keptRows >= 8)
    // lookups after vacuum are still exact
    assert(BloomIndex.lookup(spark, dir2, "name", Seq("name_43")).count() == 1)
  }

  test("a vacuum racing between prune and read stays exact inside the retention window") {
    val (dir, base) = mkTable("graft-bloomrace")
    BloomIndex.refresh(spark, dir, "name")
    // an in-flight reader pins the manifest, then decides its file set
    val pinned = LakeTable.latest(spark, dir)
    val (kept, unindexed) = BloomIndex.prunedFilesOf(
      spark, pinned, dir, "name", Seq("name_42"))
    assert(unindexed.isEmpty && kept.nonEmpty)
    // maintenance races in BETWEEN the prune and the read: an OPTIMIZE
    // replaces every file, then vacuum runs with retention that still
    // covers the pinned version (keepVersions=2 = the pre- and
    // post-optimize manifests)
    LakeTable.optimize(spark, dir, Seq("key"), nFiles = 4)
    assert(LakeTable.vacuum(spark, dir, keepVersions = 2) == 0,
      "inside the retention window the pinned version loses no file")
    // the in-flight read finishes exactly off its pinned snapshot
    val inflight = LakeTable.readFilesResolved(spark, dir, pinned, kept)
      .filter(col("name") === "name_42")
      .collect().map(_.getAs[Long]("key")).toSeq
    assert(inflight == Seq(42L),
      "an in-flight lookup must stay exact through a covered vacuum")
    // a FRESH lookup re-pins the post-optimize manifest: the new files
    // have no bloom rows yet, so it reads conservatively — exact answers,
    // degraded pruning until the next refresh
    assert(BloomIndex.lookup(spark, dir, "name", Seq("name_42"))
      .collect().map(_.getAs[Long]("key")).toSeq == Seq(42L))
    // retention VIOLATED (keepVersions=1 drops the pre-optimize files):
    // a reader still holding the old pin fails LOUD, never silently wrong
    assert(LakeTable.vacuum(spark, dir, keepVersions = 1) > 0)
    intercept[Exception] {
      LakeTable.readFilesResolved(spark, dir, pinned, kept)
        .filter(col("name") === "name_42").collect()
    }
  }
}
