package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.operators.MisraGries

/** Streaming vocabulary-drift monitor — the Misra-Gries frequent-items
  * sketch ([[graft.operators.TextAnalysis.tokenFrequenciesSketch]]) run ON
  * the ingest stream as a `transformWithState` processor, emitting each
  * shard's current top-k with the delta against the previously emitted
  * snapshot after every micro-batch. A sudden new heavy hitter (a spam
  * template flooding the gate, a new language entering the mix) surfaces as
  * a large positive `delta` within one batch of arriving — the measurable
  * signal behind SCALE.md's drift-detection bullet.
  *
  * Why THIS sketch can sit on the stream side: MG state is CONSTANT —
  * `capacity` counters per shard, regardless of vocabulary size — so the
  * monitor's state store holds nShards × capacity entries forever, where
  * the exact-count twin would grow O(vocab) without bound. Tokens shard by
  * hash, so each token lives in exactly one shard and per-shard MG bounds
  * apply to that shard's sub-stream: est ≤ true, true − est ≤
  * n_shard/(capacity+1) over the `n_shard` tokens the shard has absorbed
  * (`n_shard` is emitted with every row precisely so a consumer — or the
  * tolerance spec — can evaluate the bound). The transition function is
  * [[graft.operators.MisraGries]] itself, shared with the batch Aggregator,
  * so the two paths cannot drift apart.
  *
  * Scale notes: one shuffle on the shard key (nShards partitions of
  * state); shard count trades state-store parallelism against per-shard
  * error (the bound tightens as shards split n). Requires the RocksDB
  * state store provider, like every transformWithState operator.
  */
object VocabDrift {

  /** One emitted drift row: shard's current estimate for a top-k token,
    * the estimate at the previous emission, and the change. `n_shard` is
    * the shard's total absorbed token count — the denominator of the MG
    * error bound at the moment of emission.
    */
  case class TokenDrift(
      shard: Int, token: String, est_count: Long,
      prev_count: Long, delta: Long, n_shard: Long)

  class DriftProcessor(capacity: Int, k: Int)
      extends StatefulProcessor[Int, (Int, String), TokenDrift] {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    @transient private var sketch: ValueState[Map[String, Long]] = _
    @transient private var snapshot: ValueState[Map[String, Long]] = _
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val mapEnc: Encoder[Map[String, Long]] = ExpressionEncoder()
      sketch = getHandle.getValueState[Map[String, Long]](
        "mg", mapEnc, TTLConfig.NONE)
      snapshot = getHandle.getValueState[Map[String, Long]](
        "emitted", mapEnc, TTLConfig.NONE)
      total = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Int, rows: Iterator[(Int, String)],
        timerValues: TimerValues): Iterator[TokenDrift] = {
      var b = if (sketch.exists()) sketch.get() else Map.empty[String, Long]
      var n = if (total.exists()) total.get() else 0L
      rows.foreach { case (_, t) => b = MisraGries.reduce(b, t, capacity); n += 1 }
      sketch.update(b); total.update(n)
      val prev = if (snapshot.exists()) snapshot.get() else Map.empty[String, Long]
      val top = MisraGries.top(b, k)
      snapshot.update(top.toMap)
      top.iterator.map { case (t, c) =>
        TokenDrift(key, t, c, prev.getOrElse(t, 0L), c - prev.getOrElse(t, 0L), n)
      }
    }
  }

  /** Monitor a document stream: explode tokens, shard by token hash, fold
    * each shard's MG sketch forward, and emit the top-k drift rows per
    * micro-batch. Sits naturally downstream of `IngestGate.admit` (monitor
    * what was ADMITTED) or on the raw feed (monitor what arrives).
    */
  def monitor(
      docs: DataFrame, nShards: Int = 8,
      capacity: Int = 256, k: Int = 10): Dataset[TokenDrift] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .select(
        pmod(hash(col("token")), lit(nShards)).cast("int").as("shard"),
        col("token"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .transformWithState(
        new DriftProcessor(capacity, k), TimeMode.None(), OutputMode.Update())
  }
}
