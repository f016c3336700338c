package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming arm of [[graft.operators.Curation.domainFilter]] — the
  * RefinedWeb front-door rules enforced at ingest time:
  *
  *  - BLOCKLIST stays stateless: a broadcast anti tag on the domain column,
  *    identical to the batch rule (and append-safe on any stream).
  *  - The PER-DOMAIN CAP is inherently stateful on a stream. The batch
  *    form draws by md5-rank over the CLOSED corpus; a stream cannot rank
  *    arrivals it hasn't seen, so the streaming contract is
  *    FIRST-N-ARRIVALS-PER-DOMAIN — the crawl-frontier form of the same
  *    guard (stop fetching a domain once its budget is spent). The two
  *    agree on WHICH domains are capped and on the kept count per domain;
  *    they differ on which members survive (hash-draw vs arrival order) —
  *    a documented semantic, not an approximation, and the batch
  *    re-curation at compaction remains ground truth for membership.
  *
  * State: ONE Long counter per domain (transformWithState ValueState) —
  * the state store holds |domains| counters regardless of corpus size,
  * the same constant-state argument as the vocab-drift monitor. Each
  * verdict carries the arrival rank so downstream audits can reconstruct
  * the admission decision exactly.
  */
object DomainGate {

  /** One admission verdict: the doc's arrival rank within its domain and
    * whether it fit the budget. Blocked rows carry rank 0.
    */
  case class DomainVerdict(
      doc_id: Long, source: String, arrival_rank: Long, keep: Boolean,
      reason: String)

  class CapProcessor(cap: Int)
      extends StatefulProcessor[String, (String, Long), DomainVerdict] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[DomainVerdict] = {
      var n = if (count.exists()) count.get() else 0L
      // materialize before updating state: the returned iterator is
      // consumed after this call, but the counter must advance now
      val out = rows.map { case (_, id) =>
        n += 1
        DomainVerdict(id, key, n, n <= cap, if (n <= cap) "kept" else "over_cap")
      }.toVector
      count.update(n)
      out.iterator
    }
  }

  /** Gate a doc stream: blocklist drops stateless, survivors pay the
    * per-domain counter. Emits the full per-doc audit (every drop carries
    * its reason, like the batch gate); compose `filter(keep)` +
    * a doc_id semi-join to admit full rows downstream.
    */
  def admit(
      docs: DataFrame, blocklist: DataFrame, cap: Int = 20): Dataset[DomainVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tagged = docs.select(col("doc_id"), col("source"))
      .join(broadcast(blocklist.select(col("domain"))),
        col("source") === col("domain"), "left_outer")
      .withColumn("blocked", col("domain").isNotNull)
      .drop("domain")
    val blockedOut = tagged.filter(col("blocked"))
      .select(col("doc_id"), col("source"),
        lit(0L).as("arrival_rank"), lit(false).as("keep"),
        lit("blocked").as("reason"))
      .as[DomainVerdict]
    val capped = tagged.filter(!col("blocked"))
      .select(col("source"), col("doc_id")).as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(
        new CapProcessor(cap), TimeMode.None(), OutputMode.Append())
    capped.union(blockedOut)
  }
}
