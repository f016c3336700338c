package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.schemas.Transit._
import graft.streaming.TransitStreams.ChangeEvent

/** The train tracker on Spark 4's arbitrary-stateful-processing v2 API
  * (`transformWithState` + `StatefulProcessor`) — the successor to
  * `flatMapGroupsWithState` for custom streaming state.
  *
  * Why a twin: the v2 API gives named, independently-typed state variables
  * (`ValueState`/`ListState`/`MapState`), native TTL per state variable,
  * timers decoupled from input arrival, and state schema evolution — all on
  * the RocksDB state store (which the API requires). The transition function
  * itself is shared with the v1 operator
  * ([[TransitStreams.applyPlatformChanges]]), so both paths stay
  * semantically identical by construction; the spec replays the same
  * simulated feed through both and asserts equality against the batch twin.
  *
  * Scale notes: state is still partitioned by the grouping key, so the
  * operator scales exactly like the v1 form; RocksDB keeps per-key state
  * off-heap and spills to disk, which is what unbounded platform maps need
  * at fleet scale.
  */
object TwsOps {

  /** One PlatformState per (station_id, direction), kept in a ValueState. */
  class PlatformProcessor
      extends StatefulProcessor[(Int, String), ChangeEvent, PlatformState] {
    @transient private var state: ValueState[PlatformState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[PlatformState](
        "platform", Encoders.product[PlatformState], TTLConfig.NONE)

    override def handleInputRows(
        key: (Int, String), rows: Iterator[ChangeEvent],
        timerValues: TimerValues): Iterator[PlatformState] = {
      val (stationId, direction) = key
      val current = if (state.exists()) Some(state.get()) else None
      val next = TransitStreams.applyPlatformChanges(
        stationId, direction, current, rows)
      next.foreach(state.update)
      if (next != current) next.iterator else Iterator.empty
    }
  }

  /** [[TransitStreams.trainPositions]] on the v2 API. Requires the RocksDB
    * state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`).
    */
  def trainPositionsTws(arrivals: Dataset[Arrival]): Dataset[PlatformState] = {
    import arrivals.sparkSession.implicits._
    TransitStreams.arrivalChangeEvents(arrivals)
      .groupByKey(e => (e.station_id, e.direction))
      .transformWithState(
        new PlatformProcessor, TimeMode.None(), OutputMode.Update())
  }
}
