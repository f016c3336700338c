package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1: measure first).
  *
  * For each named query: one warm run, then one timed run under a
  * SparkListener that attributes wall-clock to individual JOBS (action
  * call sites) with task counts and shuffle bytes — the breakdown that
  * tells a fixture query's build/fold/serve phases apart, which a single
  * end-to-end number cannot. Optionally dumps `.explain("formatted")` per
  * query to a directory (the plans/r17 before/after artifacts).
  *
  * Usage: `runMain graft.Profile q_a,q_b [planDir] [tag]`
  */
object Profile {
  private final case class JobRow(
      id: Int, desc: String, ms: Long, tasks: Int, stages: Int,
      shufR: Long, shufW: Long)

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q_pricing_summary"))
    val planDir = args.drop(1).headOption
    val tag = args.drop(2).headOption.getOrElse("")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[JobRow]()
    val stageShuf = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    val sqlDescs = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    // @volatile: flipped on the main thread, read on the listener-bus
    // thread — without it JMM visibility could mis-attribute or drop job
    // rows at the measurement boundaries
    @volatile var listening = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (listening) {
        // the result stage's name is the action's call site; jobs spawned
        // on SQL-execution threads are opaque there, so prefer the owning
        // SQL execution's description (captured in onOtherEvent)
        val name = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        val desc =
          if (!name.contains("withThreadLocalCaptured")) name
          else Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.root.id"))
              .orElse(Option(p.getProperty("spark.sql.execution.id"))))
            .flatMap(id => Option(sqlDescs.get(id.toLong)))
            .map("sql: " + _).getOrElse(name)
        jobs.put(e.jobId, (e.time, desc))
        jobStages.put(e.jobId, e.stageIds)
        ()
      }
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          sqlDescs.put(s.executionId, s.description); ()
        case _ => ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (listening) {
          val m = e.stageInfo.taskMetrics
          stageShuf.put(e.stageInfo.stageId,
            (m.shuffleReadMetrics.totalBytesRead,
              m.shuffleWriteMetrics.bytesWritten, e.stageInfo.numTasks))
          ()
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (listening) {
        Option(jobs.get(e.jobId)).foreach { case (t0, desc) =>
          val sids = Option(jobStages.get(e.jobId)).getOrElse(Nil)
          val ms = sids.flatMap(s => Option(stageShuf.get(s)))
          done.add(JobRow(e.jobId, desc, e.time - t0,
            ms.map(_._3).sum, sids.size, ms.map(_._1).sum, ms.map(_._2).sum))
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // JIT/codegen warmup shared across queries
    spark.range(1000000L).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()

    val qmap = SparkEntry.queries
    names.foreach { name =>
      val fn = qmap(name)
      // plan BEFORE any run (same shape either way; cheap)
      planDir.foreach { d =>
        new java.io.File(d).mkdirs()
        val df = fn(spark, sfDir)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/${name}_$tag.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
      // warm run (unmeasured)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[profile] $name warm failed: ${e.getMessage}")
      }
      System.gc()
      // timed run with job attribution
      jobs.clear(); done.clear(); stageShuf.clear(); jobStages.clear()
      listening = true
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[profile] $name timed failed: ${e.getMessage}")
      }
      val total = (System.nanoTime() - t0) / 1e9
      // let stragglers' JobEnd events drain
      Thread.sleep(300)
      listening = false
      val rows = done.toArray(Array.empty[JobRow]).sortBy(-_.ms)
      val jobSum = rows.map(_.ms).sum / 1e3
      println(f"%n== $name%s total=$total%.3fs jobs=${rows.length}%d jobTime=$jobSum%.3fs (gap=${total - jobSum}%.3fs driver/plan) ==")
      rows.take(30).foreach { r =>
        println(f"  job ${r.id}%3d ${r.ms}%6dms tasks=${r.tasks}%4d stages=${r.stages}%2d shufR=${r.shufR}%9d shufW=${r.shufW}%9d  ${r.desc.take(110)}%s")
      }
    }
    spark.stop()
  }
}
