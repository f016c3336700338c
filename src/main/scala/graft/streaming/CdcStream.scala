package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The streaming half of [[graft.operators.Cdc]] — a changelog arriving
  * as a stream, reduced continuously to "latest change per key" state, the
  * table the batch MERGE reads as its reduced side. This is exactly what
  * the reference's consumers maintain continuously (the Faust station
  * table and KSQL turnstile table fold their changelogs forever,
  * consumers/faust_stream.py:85-92, consumers/ksql.py:31-40), upgraded
  * with tombstones and out-of-order safety.
  *
  * Contract: state per key is the highest-`seq` change seen; a row whose
  * seq is not above the stored one is DROPPED (late/duplicate replay —
  * commit LSNs are monotone per key, so a lower seq is by definition
  * stale). Every state transition emits the new resolved row in update
  * mode, so the downstream (a batch MERGE, a serving view) sees the same
  * reduced changefeed `Cdc.mergeChangelog`'s aggregation computes — the
  * stream==batch equivalence CdcSpec pins.
  *
  * Scale: keyed ValueState on the RocksDB store (the v2 API's home), one
  * row per live key regardless of replay depth — per-batch work tracks
  * the batch, state tracks the keyspace, both the 100 TB contract.
  */
object CdcStream {

  case class Change(key: Long, seq: Long, op: String, value: Double)

  /** The resolved per-key state: the latest change and its LSN. */
  case class KeyChange(key: Long, seq: Long, op: String, value: Double)

  class LatestChangeProcessor
      extends StatefulProcessor[Long, Change, KeyChange] {
    @transient private var state: ValueState[KeyChange] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyChange](
        "latest", Encoders.product[KeyChange], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Change],
        timerValues: TimerValues): Iterator[KeyChange] = {
      val cur = if (state.exists()) Some(state.get()) else None
      val incoming = rows.map(r => KeyChange(key, r.seq, r.op, r.value))
      val best = (cur.iterator ++ incoming).maxBy(_.seq)
      if (cur.contains(best)) Iterator.empty
      else { state.update(best); Iterator.single(best) }
    }
  }

  /** Continuous latest-change-per-key over a changelog stream; update-mode
    * emissions are the reduced changefeed. Requires the RocksDB state
    * store provider (transformWithState).
    */
  def latestChanges(changes: Dataset[Change]): Dataset[KeyChange] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.key)
      .transformWithState(
        new LatestChangeProcessor, TimeMode.None(), OutputMode.Update())
  }
}
