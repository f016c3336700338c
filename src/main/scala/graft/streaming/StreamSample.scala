package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.{col, pmod, lit}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Weighted sampling without replacement ON THE STREAM — the
  * Efraimidis–Spirakis draw ([[graft.operators.Curation.weightedSample]])
  * as a continuous query. The per-row key is the identical stateless
  * projection the batch operator ranks on (shared via
  * `Curation.sampleKeyed`, so stream and batch draw the SAME keys); the
  * stateful part is per-shard top-n maintenance:
  *
  *  - rows shard by `doc_id mod nShards` (any id lands in exactly one
  *    shard, deterministically);
  *  - each shard keeps its local top-n in ONE ValueState cell — constant
  *    `nShards × n` state forever, per-batch work O(|batch| + n);
  *  - the global top-n is always contained in the union of shard top-ns
  *    (a globally-selected row is by definition in its own shard's local
  *    top-n), so a reader takes each shard's LATEST emission and ranks
  *    the union — exact, not approximate, equality with the batch draw
  *    (StreamSampleSpec replays and pins it).
  *
  * This is the distributed-reservoir shape: the reduction is a max-heap
  * per shard, emissions are the shard's current holdings stamped with a
  * monotone version so late readers can pick the newest snapshot.
  */
object StreamSample {

  case class Draw(shard: Int, doc_id: Long, source: String,
      quality: Double, skey: Double)
  case class Entry(doc_id: Long, source: String, quality: Double, skey: Double)
  case class TopState(version: Long, rows: Seq[Entry])
  case class ShardTop(shard: Int, version: Long, rank: Int, doc_id: Long,
      source: String, quality: Double, skey: Double)

  /** Higher skey wins; ties break on lower doc_id (the batch rule). */
  private def better(a: Entry, b: Entry): Boolean =
    a.skey > b.skey || (a.skey == b.skey && a.doc_id < b.doc_id)

  class TopNProcessor(n: Int)
      extends StatefulProcessor[Int, Draw, ShardTop] {
    @transient private var state: ValueState[TopState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TopState](
        "topn", Encoders.product[TopState], TTLConfig.NONE)

    override def handleInputRows(
        shard: Int, rows: Iterator[Draw],
        timerValues: TimerValues): Iterator[ShardTop] = {
      val cur = if (state.exists()) state.get() else TopState(0L, Nil)
      val merged = (cur.rows.iterator ++
        rows.map(d => Entry(d.doc_id, d.source, d.quality, d.skey)))
        .toSeq.sortWith(better).take(n)
      if (merged == cur.rows) Iterator.empty
      else {
        val next = TopState(cur.version + 1, merged)
        state.update(next)
        merged.iterator.zipWithIndex.map { case (e, i) =>
          ShardTop(shard, next.version, i + 1, e.doc_id, e.source,
            e.quality, e.skey)
        }
      }
    }
  }

  /** The continuous sampler: docs stream in, each shard's current top-n
    * streams out (update mode) whenever it changes. Requires the RocksDB
    * state store (transformWithState).
    */
  def weightedSampleStream(
      docs: DataFrame, n: Int, nShards: Int = 32,
      seed: String = "ws"): Dataset[ShardTop] = {
    import docs.sparkSession.implicits._
    graft.operators.Curation.sampleKeyed(docs, seed)
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)).cast("int"))
      .select(col("shard"), col("doc_id"), col("source"),
        col("quality"), col("skey"))
      .as[Draw]
      .groupByKey(_.shard)
      .transformWithState(
        new TopNProcessor(n), TimeMode.None(), OutputMode.Update())
  }

  /** Reduce a collected emission log to the global top-n: latest version
    * per shard, union, rank by (skey desc, doc_id) — the read-side of the
    * sampler, driver-scale arithmetic over nShards × n rows.
    */
  def globalTopN(emissions: Seq[ShardTop], n: Int): Seq[(Long, Double)] = {
    val latest = emissions.groupBy(_.shard).values.flatMap { es =>
      val v = es.map(_.version).max
      es.filter(_.version == v)
    }.toSeq
    latest.map(e => (e.doc_id, e.skey))
      .sortBy { case (id, k) => (-k, id) }
      .take(n)
  }
}
