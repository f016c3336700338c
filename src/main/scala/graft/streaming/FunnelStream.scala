package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The conversion funnel ([[graft.operators.Relational.funnel]]) as a
  * continuous query — per-user funnel depth maintained live instead of
  * recomputed per batch report. State per user is ONE fixed-width vector:
  * the first-seen timestamp of each step (the batch operator's pivot-min,
  * kept incrementally — min is order-insensitive, so arrival order inside
  * and across micro-batches cannot change the result, and the replay
  * equals the batch histogram exactly, spec-pinned). Depth is recomputed
  * from the firsts vector on every update and emitted only when it
  * CHANGES — the update-mode changefeed a live dashboard consumes.
  *
  * Scale: constant |steps| longs per user on RocksDB, per-batch work
  * O(|batch|); the depth histogram is a tiny downstream aggregation of
  * the latest emission per user.
  */
object FunnelStream {

  case class Ev(user_id: Long, step: Int, ts_s: Long)
  case class Firsts(firsts: Seq[Long])
  case class DepthChange(user_id: Long, depth: Int)

  /** Batch-identical depth: walk the chain while each step's first ts
    * exists and is not earlier than the previous step's. -1 = unseen.
    */
  private[streaming] def depthOf(firsts: Seq[Long]): Int = {
    if (firsts.head < 0) return 0
    var d = 1
    while (d < firsts.length && firsts(d) >= 0 && firsts(d) >= firsts(d - 1))
      d += 1
    d
  }

  class FunnelProcessor(nSteps: Int)
      extends StatefulProcessor[Long, Ev, DepthChange] {
    @transient private var state: ValueState[Firsts] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Firsts](
        "firsts", Encoders.product[Firsts], TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[DepthChange] = {
      val existed = state.exists()
      val cur =
        if (existed) state.get().firsts.toArray
        else Array.fill(nSteps)(-1L)
      val before = depthOf(cur.toSeq)
      rows.foreach { e =>
        if (e.step >= 0 && e.step < nSteps &&
          (cur(e.step) < 0 || e.ts_s < cur(e.step))) cur(e.step) = e.ts_s
      }
      state.update(Firsts(cur.toSeq))
      val after = depthOf(cur.toSeq)
      // a user's FIRST sighting always emits (even depth 0 — the funnel
      // population is part of the feed); afterwards only depth changes do
      if (existed && after == before) Iterator.empty
      else Iterator.single(DepthChange(user, after))
    }
  }

  /** events (user_id, event_type, ts) → per-user depth changefeed.
    * Requires the RocksDB state store (transformWithState).
    */
  def funnelDepths(
      events: DataFrame, steps: Seq[String]): Dataset[DepthChange] = {
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("event_type"), col("ts").cast("long").as("ts_s"))
      .as[(Long, String, Long)]
      .map { case (u, t, s) => Ev(u, stepIdx(t), s) }
      .groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor(steps.size), TimeMode.None(), OutputMode.Update())
  }
}
