package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, hash, lit, pmod}
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.VocabDrift

// top-level so Spark can construct instances without an outer-scope pointer
case class DriftDoc(doc_id: Long, text: String)

/** The streaming vocab-drift monitor vs the batch MG sketch: shared
  * transition kernel, so the contract to verify is (a) the MG error bounds
  * hold per shard against exact counts whatever the micro-batch split,
  * (b) with capacity ≥ per-shard vocabulary the stream estimates are EXACT
  * and equal the (equally exact) batch sketch, and (c) a flood arriving in
  * a later batch surfaces as a large positive delta — the drift signal.
  */
class VocabDriftSpec extends SparkSpec {

  // transformWithState requires the RocksDB state store; isolated session
  // so the provider conf can't leak into the suite-shared session
  private def rocksSession() = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private val b1 = Seq(
    DriftDoc(1, "alpha alpha alpha beta gamma"),
    DriftDoc(2, "alpha beta delta epsilon zeta"))
  private val b2 = Seq(
    DriftDoc(3, "omega omega omega omega omega omega"),
    DriftDoc(4, "alpha omega eta theta"))

  /** Replay the two fixture batches through the monitor, return the final
    * per-shard emission rows (max n_shard per shard).
    */
  private def replay(
      rocks: org.apache.spark.sql.SparkSession,
      nShards: Int, capacity: Int): Seq[VocabDrift.TokenDrift] = {
    import rocks.implicits._
    implicit val sqlCtx = rocks.sqlContext
    val input = MemoryStream[DriftDoc]
    val q = VocabDrift.monitor(input.toDF(), nShards, capacity, k = capacity)
      .writeStream.format("memory").queryName(s"vdrift_$capacity")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      rocks.table(s"vdrift_$capacity").as[VocabDrift.TokenDrift].collect()
        .groupBy(_.shard).values.flatMap { rs =>
          val nMax = rs.map(_.n_shard).max
          rs.filter(_.n_shard == nMax)
        }.toSeq
    } finally q.stop()
  }

  /** Exact truth: per-(shard, token) counts and per-shard totals under the
    * monitor's own shard assignment (Spark murmur3 hash).
    */
  private def truth(rocks: org.apache.spark.sql.SparkSession, nShards: Int)
      : (Map[(Int, String), Long], Map[Int, Long]) = {
    import rocks.implicits._
    val toks = (b1 ++ b2).flatMap(_.text.split(" "))
    val sharded = toks.toDF("token")
      .select(col("token"),
        pmod(hash(col("token")), lit(nShards)).cast("int").as("shard"))
      .collect().map(r => (r.getInt(1), r.getString(0)))
    val perToken = sharded.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val perShard = sharded.groupBy(_._1).map { case (s, v) => s -> v.size.toLong }
    (perToken, perShard)
  }

  test("MG bounds hold per shard on the stream, whatever the batch split") {
    val rocks = rocksSession()
    val nShards = 2
    val capacity = 4 // below per-shard vocab: decrements must fire
    val finalRows = replay(rocks, nShards, capacity)
    val (perToken, perShard) = truth(rocks, nShards)
    assert(perShard.values.exists(_ > 0) && finalRows.nonEmpty)
    finalRows.foreach { r =>
      val t = perToken.getOrElse((r.shard, r.token), 0L)
      val n = perShard(r.shard)
      assert(r.n_shard == n, s"shard ${r.shard} total: got ${r.n_shard}, want $n")
      assert(r.est_count <= t, s"${r.token}: est ${r.est_count} above true $t")
      assert(t - r.est_count <= n.toDouble / (capacity + 1),
        s"${r.token}: underestimate ${t - r.est_count} breaks n/(cap+1) = ${n.toDouble / (capacity + 1)}")
    }
    // completeness: every token heavier than its shard's n/(cap+1) bound is
    // guaranteed held by MG and must appear (k = capacity shows all counters)
    val reported = finalRows.map(r => (r.shard, r.token)).toSet
    perToken.foreach { case ((s, tok), c) =>
      if (c > perShard(s).toDouble / (capacity + 1))
        assert(reported.contains((s, tok)), s"heavy token $tok missing from shard $s")
    }
  }

  test("exact at capacity >= vocab: stream == exact counts == batch sketch; flood shows as delta") {
    val rocks = rocksSession()
    import rocks.implicits._
    val nShards = 2
    val finalRows = replay(rocks, nShards, capacity = 64)
    val (perToken, perShard) = truth(rocks, nShards)
    // exact: every token reported with its true count, none missing
    val got = finalRows.map(r => (r.shard, r.token) -> r.est_count).toMap
    assert(got == perToken)
    finalRows.foreach(r => assert(r.n_shard == perShard(r.shard)))
    // equals the batch sketch at exactness (shared kernel, both exact)
    val batch = graft.operators.TextAnalysis.tokenFrequenciesSketch(
      (b1 ++ b2).toDF("doc_id", "text"), capacity = 1024, k = 100)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("est_count")).toMap
    val streamByToken = finalRows.map(r => r.token -> r.est_count).toMap
    assert(streamByToken == batch)
    // the drift signal: omega floods in batch 2 — previous snapshot had no
    // omega, so its final delta is its whole (exact) count
    val omega = finalRows.find(_.token == "omega").get
    assert(omega.prev_count == 0L && omega.delta == 7L && omega.est_count == 7L)
    // a steady token drifts by exactly its batch-2 arrivals: alpha 4 -> 5
    val alpha = finalRows.find(_.token == "alpha").get
    assert(alpha.prev_count == 4L && alpha.delta == 1L && alpha.est_count == 5L)
  }
}
