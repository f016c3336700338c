package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog application — the batch MERGE that turns a CDC stream's
  * accumulated (key, seq, op, payload) rows into the next snapshot of a
  * keyed table.
  *
  * Reference scope: this is the batch generalization of what every
  * consumer in the reference does continuously — the Faust table upserts
  * station rows from the stations changelog (consumers/faust_stream.py:
  * 85-92 materializes the transformed-station table keyed by station_id),
  * and the KSQL table folds turnstile events into per-station state
  * (consumers/ksql.py:31-40). Both are "latest write per key wins"
  * appliers without delete handling (the transit station universe never
  * shrinks); a training-data lake needs the full upsert/delete contract,
  * so the operator here adds tombstones ('D') on top of the reference's
  * upsert ('U') semantics.
  *
  * Contract (classic CDC MERGE):
  *   - the LAST change per key (highest `seq`) decides the key's fate —
  *     intermediate history is irrelevant to the snapshot;
  *   - last op 'U' → the key exists with the change's payload (an update
  *     if the base had the key, an insert if not — inserted keys carry
  *     NULL for base-only columns);
  *   - last op 'D' → the key is absent, even if the base had it and even
  *     if earlier changes upserted it;
  *   - keys the changelog never touched pass through from the base
  *     unchanged, `last_seq` NULL.
  */
object Cdc {

  /** Apply a changelog to a base snapshot.
    *
    * Shapes: `base` = (key LONG, name STRING, val DOUBLE) — the current
    * snapshot; `changelog` = (key LONG, seq LONG, op STRING 'U'|'D',
    * val DOUBLE) with `seq` unique per key (a commit LSN / offset), so
    * "latest" is well-defined and the reduction is deterministic.
    *
    * Plan shape — two exchanges, both on `key`, at any scale:
    *   1. the changelog reduces to one row per touched key via
    *      `max_by(struct(op, val), seq)` — a hash aggregate with map-side
    *      partials and CONSTANT state per key (never a per-key sort, and
    *      never materializing the key's history), the same
    *      latest-per-key-as-aggregation shape
    *      [[Relational.latestEventPerUserAgg]] benches against its window
    *      twin;
    *   2. one full-outer hash join of base × reduced changelog. A day's
    *      changelog is normally orders of magnitude smaller than a 100 TB
    *      snapshot — AQE turns the reduced side into a broadcast under
    *      the threshold, and when snapshots land bucketed by key (the
    *      [[graft.sources.LakeSink]] layout) the base side's exchange
    *      disappears into a storage-partitioned join, leaving the
    *      changelog reduction as the only shuffle in the whole MERGE.
    *
    * The filter keeps `op IS NULL` (untouched base rows) or `op <> 'D'`;
    * a 'D' on a key the base never had drops silently (idempotent
    * replay), and a 'D' followed by a later 'U' WITHIN ONE MERGE
    * resurrects the key with its base payload intact — both standard CDC
    * replay semantics. Batch-boundary caveat (LakeTableSpec's property
    * case pins it): applying a log in several sequential MERGEs is NOT
    * identical to one MERGE of the concatenation when a delete and a
    * resurrect straddle a batch boundary — the intermediate snapshot
    * really dropped the row, so base-only columns the changelog does not
    * carry (`name`) come back NULL, where the one-shot reduction's
    * latest-wins collapse would have kept the stale base value. The
    * sequential chain is the ground truth (the delete happened); emit
    * full-row images in the changelog if resurrection must preserve
    * them.
    */
  def mergeChangelog(base: DataFrame, changelog: DataFrame): DataFrame = {
    val latest = changelog
      .groupBy(col("key"))
      .agg(
        max_by(struct(col("op"), col("val")), col("seq")).as("c"),
        max(col("seq")).as("last_seq"))
      .select(
        col("key"), col("c.op").as("op"),
        col("c.val").as("new_val"), col("last_seq"))
    base
      .join(latest, Seq("key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        col("key"),
        col("name"),
        when(col("op") === "U", col("new_val")).otherwise(col("val")).as("val"),
        col("last_seq"))
      .orderBy(col("key"))
  }

  /** [[mergeChangelog]] over FULL-ROW IMAGES — the Debezium "after image"
    * model: every 'U' row carries the COMPLETE new row (key, name, val),
    * not just the changed payload, so an upsert replaces the whole row
    * and never reaches back into the base for columns the changelog
    * "doesn't know". This is the remedy for [[mergeChangelog]]'s
    * batch-boundary caveat: with full images, applying a log in any
    * batching equals one MERGE of the concatenation EXACTLY — a
    * cross-batch delete-then-resurrect re-creates the row from its own
    * image instead of resurrecting NULLs (LakeTableSpec's property case
    * pins both behaviors side by side). The cost is changelog width:
    * every image ships every column, which is why slim payload
    * changelogs exist at all — pick per table.
    *
    * Shapes: `base` = (key, name, val); `changelog` = (key, seq,
    * op 'U'|'D', name, val). Identical two-exchange plan.
    */
  def mergeChangelogFull(base: DataFrame, changelog: DataFrame): DataFrame = {
    val latest = changelog
      .groupBy(col("key"))
      .agg(
        max_by(struct(col("op"), col("name"), col("val")), col("seq")).as("c"),
        max(col("seq")).as("last_seq"))
      .select(
        col("key"), col("c.op").as("op"), col("c.name").as("new_name"),
        col("c.val").as("new_val"), col("last_seq"))
    base
      .join(latest, Seq("key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        col("key"),
        when(col("op") === "U", col("new_name")).otherwise(col("name")).as("name"),
        when(col("op") === "U", col("new_val")).otherwise(col("val")).as("val"),
        col("last_seq"))
      .orderBy(col("key"))
  }

  /** [[compactChangelog]] for full-row-image changelogs: one change per
    * key, the whole image kept with it. Same replay contract.
    */
  def compactChangelogFull(changelog: DataFrame): DataFrame =
    changelog
      .groupBy(col("key"))
      .agg(
        max_by(struct(col("op"), col("name"), col("val")), col("seq")).as("c"),
        max(col("seq")).as("seq"))
      .select(col("key"), col("seq"), col("c.op").as("op"),
        col("c.name").as("name"), col("c.val").as("val"))
      .orderBy(col("key"))

  /** Changelog compaction — Kafka log-compaction semantics as a batch
    * operator: keep exactly ONE change per key (the highest-`seq` one),
    * shaped AS a changelog so it replays anywhere the full log did.
    * Tombstones are KEPT (dropping a 'D' would resurrect the key on
    * replay against a base that still has it — the classic compaction
    * bug; Kafka only drops them after a delete-retention window, which
    * is a policy decision left to the caller). The contract the spec
    * pins: `mergeChangelog(base, compact(log)) == mergeChangelog(base,
    * log)` for EVERY base.
    *
    * Same single constant-state reduction as the MERGE's own first stage
    * — compaction is exactly that stage materialized as an artifact, so
    * a log compacted at rest makes every later MERGE's reduction read
    * |keys| rows instead of |history|.
    */
  def compactChangelog(changelog: DataFrame): DataFrame =
    changelog
      .groupBy(col("key"))
      .agg(
        max_by(struct(col("op"), col("val")), col("seq")).as("c"),
        max(col("seq")).as("seq"))
      .select(col("key"), col("seq"), col("c.op").as("op"), col("c.val").as("val"))
      .orderBy(col("key"))

  /** SCD TYPE 2 — the full-history twin of [[mergeChangelogFull]]: where
    * the MERGE keeps only each key's LATEST image, SCD2 keeps EVERY
    * image as a validity interval, the dimension-table shape a training
    * lake needs to answer "what did this row say when snapshot S was
    * cut" without time-travelling the whole table.
    *
    * Input: a full-row-image changelog (key, seq, op 'U'|'D', name, val),
    * `seq` unique per key (commit LSN). Output: one row per 'U' change —
    * (key, name, val, valid_from = its seq, valid_to = the key's NEXT
    * change's seq or NULL, is_current = open AND not later deleted).
    * A 'D' closes the prior interval (its seq becomes that row's
    * valid_to) and opens nothing — a deleted key has NO current row.
    * Half-open intervals [valid_from, valid_to): the standard warehouse
    * convention, so `valid_from <= t < valid_to` partitions history.
    *
    * Plan: ONE shuffle (hash by key) + per-key sort for the `lead`
    * window, then a filter — no join, no second pass. Per-key history is
    * change-count-sized; the window state is one row of lookahead.
    */
  def scdHistory(changelog: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("seq"))
    changelog
      .withColumn("valid_to", lead(col("seq"), 1).over(w))
      .filter(col("op") === "U")
      .select(
        col("key"), col("name"), col("val"),
        col("seq").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("key"), col("valid_from"))
  }

  /** POINT-IN-TIME dimension lookup — the read [[scdHistory]] exists to
    * serve: the snapshot as of LSN `t`, i.e. every interval with
    * `valid_from <= t < valid_to` (open intervals unbounded above). The
    * half-open convention makes the probe a partition of history: each
    * key serves AT MOST one row for any t, exactly one iff the key
    * existed (a 'D'-closed key serves none). A pure filter — on a
    * history landed partitioned/clustered by validity this is a pruned
    * scan, never a window or join.
    */
  def scdAsOf(history: DataFrame, t: Double): DataFrame =
    history
      .filter(col("valid_from") <= t &&
        (col("valid_to").isNull || col("valid_to") > t))
      .select(col("key"), col("name"), col("val"),
        col("valid_from"), col("valid_to"))
      .orderBy(col("key"))

  /** TEMPORAL dimension join — the read pattern SCD2 history EXISTS to
    * serve: each fact row (keyed, stamped `tCol`) joins the dimension
    * version that was valid AT ITS OWN time, `valid_from <= t <
    * valid_to`. The half-open partition guarantees at most one match
    * per fact; facts before the key's first version (or after its
    * delete) keep NULL dimension columns (left join — losing facts to a
    * dimension gap is a silent-data bug, not a join semantic).
    *
    * Plan shape: the key equality DRIVES the join (hash/broadcast on
    * `keyCol`); the interval predicate is a residual filter on the
    * matched pairs — never a BroadcastNestedLoop range join, because
    * per key the candidate set is that key's history, change-count
    * sized. This is the as-of join's interval twin:
    * [[Relational.asOfJoinLatestError]] matches "latest before t" by
    * windowing, this matches "the interval containing t" by predicate —
    * with SCD2 both give the same answer, one exchange cheaper here.
    */
  def scdJoin(
      facts: DataFrame, history: DataFrame,
      keyCol: String = "key", tCol: String = "t"): DataFrame = {
    val h = history.select(
      col(keyCol).as("_hkey"), col("name").as("dim_name"),
      col("val").as("dim_val"), col("valid_from"), col("valid_to"))
    facts
      .join(h,
        facts(keyCol) === h("_hkey") &&
          facts(tCol) >= h("valid_from") &&
          (h("valid_to").isNull || facts(tCol) < h("valid_to")),
        "left")
      .drop("_hkey")
      .orderBy(col(keyCol), col(tCol))
  }

  /** Incremental SCD2 fold — apply a NEW changelog slice to an existing
    * history WITHOUT re-deriving it, under the monotone-LSN contract
    * (every new seq for a key exceeds every seq already folded for it —
    * the property any CDC offset stream satisfies). The invariant the
    * spec pins: `scdMerge(scdHistory(a), b) == scdHistory(a ∪ b)`.
    *
    * Shape: CLOSED intervals are immutable history and pass through
    * untouched (at scale: never read, if history lands partitioned by
    * is_current). Only touched keys' OPEN rows re-enter the derivation:
    * they convert back to changelog rows (their valid_from as seq) and
    * re-derive together with the new slice — the lead window then closes
    * them at the slice's first seq and opens the new intervals, exactly
    * as the refit would have. Open rows of untouched keys also pass
    * through. Cost: one window over (open rows of touched keys + new
    * slice) — slice-sized, not history-sized.
    */
  def scdMerge(history: DataFrame, changelog: DataFrame): DataFrame = {
    val touched = changelog.select(col("key")).distinct()
    val closedOrUntouched = history
      .join(touched, Seq("key"), "left_semi").filter(!col("is_current"))
      .unionByName(history.join(touched, Seq("key"), "left_anti"))
    val reopened = history
      .join(touched, Seq("key"), "left_semi").filter(col("is_current"))
      .select(col("key"), col("valid_from").as("seq"), lit("U").as("op"),
        col("name"), col("val"))
    scdHistory(reopened.unionByName(changelog.select(
      col("key"), col("seq"), col("op"), col("name"), col("val"))))
      .unionByName(closedOrUntouched)
      .orderBy(col("key"), col("valid_from"))
  }

  /** The audit row a MERGE publishes alongside the snapshot it wrote:
    * how many keys were inserted / updated / deleted / carried through,
    * and the changelog's replay depth (changes per touched key) — the
    * number that says whether compacting the changelog before the MERGE
    * would pay. Same two-exchange plan as [[mergeChangelog]] (the counts
    * are a tiny agg over the pre-filter join), so publishing the audit
    * costs one reuse of the MERGE's own shuffles, not a new pass.
    */
  def mergeAudit(base: DataFrame, changelog: DataFrame): DataFrame = {
    val latest = changelog
      .groupBy(col("key"))
      .agg(
        max_by(col("op"), col("seq")).as("op"),
        count(lit(1)).as("n_changes"))
    base.select(col("key"), lit(1).as("in_base"))
      .join(latest, Seq("key"), "full_outer")
      .select(
        when(col("op").isNull, lit("carried"))
          .when(col("op") === "D" && col("in_base").isNotNull, lit("deleted"))
          .when(col("op") === "D", lit("noop_delete"))
          .when(col("in_base").isNotNull, lit("updated"))
          .otherwise(lit("inserted")).as("outcome"),
        coalesce(col("n_changes"), lit(0L)).as("n_changes"))
      .groupBy(col("outcome"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("n_changes")).as("n_changes"))
      .orderBy(col("outcome"))
  }
}
