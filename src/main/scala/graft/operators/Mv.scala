package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of materialized rollups — the refresh half of
  * [[graft.plans.SummaryRewrite]]'s serve half. The rewrite's staleness
  * gate declines a summary the moment its base's file listing changes;
  * without a fold that makes every append a FULL base re-aggregation
  * before the summary serves again. For the mergeable measure family the
  * rewrite already understands (sum / count / min / max, with avg
  * derived from sum+count), the refit is unnecessary: partial-aggregate
  * the batch alone in the summary's own column layout, then merge — a
  * shuffle over O(|summary| + |batch|) rows that never rescans the base.
  * The invariant the spec and oracle pin:
  * `foldSummary(summarize(old), batch) == summarize(old ∪ batch)`
  * exactly, for any batching of the appends.
  *
  * The maintenance loop this closes: base gains an append epoch (e.g.
  * [[graft.sources.LakeTable.append]]) → the registered rewrite declines
  * (listing signature changed — answers stay correct via the fact scan)
  * → `foldSummary` folds the batch → re-register over the refreshed base
  * → the rewrite serves again, now from the folded summary. Deletes are
  * the documented boundary: sum/count could retract, min/max cannot —
  * a changefeed 'D' (see [[graft.sources.LakeTable.readChanges]]) forces
  * re-summarizing the affected groups, so this operator's contract is
  * append-only epochs, exactly the spans whose changefeed is pure 'I'.
  *
  * Measures use [[graft.plans.SummaryRewrite.register]]'s shape:
  * (func, base column) -> summary column, count(1) keyed ("count", "*").
  */
object Mv {

  private def partialExprs(measures: Map[(String, String), String]): Seq[Column] =
    measures.toSeq.sortBy(_._2).map {
      case (("sum", c), name)     => sum(col(c)).as(name)
      case (("count", "*"), name) => count(lit(1)).as(name)
      case (("count", c), name)   => count(col(c)).as(name)
      case (("min", c), name)     => min(col(c)).as(name)
      case (("max", c), name)     => max(col(c)).as(name)
      case ((f, c), _) => throw new IllegalArgumentException(
        s"Mv: non-mergeable measure $f($c) — sum/count/min/max only " +
          "(avg derives from a registered sum + count pair)")
    }

  /** The rollup of one frame in the summary's column layout — both the
    * initial materialization and the per-batch partial the fold merges.
    */
  def summarize(
      df: DataFrame, groupCols: Seq[String],
      measures: Map[(String, String), String]): DataFrame = {
    val exprs = partialExprs(measures)
    df.groupBy(groupCols.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Merge a batch into a stored summary: per measure, sum-of-sums /
    * sum-of-counts / min-of-mins / max-of-maxes over the union of the
    * old summary and the batch's partial — new groups appear, untouched
    * groups pass through the (summary-sized) shuffle unchanged. Measure
    * columns cast back to the stored summary's types, so a re-aggregated
    * decimal sum's widened precision never drifts the schema across
    * folds and the result re-registers as-is.
    */
  def foldSummary(
      oldSummary: DataFrame, batch: DataFrame, groupCols: Seq[String],
      measures: Map[(String, String), String]): DataFrame = {
    val names = measures.toSeq.sortBy(_._2).map(_._2)
    val layout = groupCols.map(col) ++ names.map(col)
    val mergeExprs = measures.toSeq.sortBy(_._2).map {
      case (("sum" | "count", _), name) => sum(col(name)).as(name)
      case (("min", _), name)           => min(col(name)).as(name)
      case (("max", _), name)           => max(col(name)).as(name)
      case ((f, c), _) => throw new IllegalArgumentException(
        s"Mv: non-mergeable measure $f($c)")
    }
    val merged = oldSummary.select(layout: _*)
      .unionByName(summarize(batch, groupCols, measures).select(layout: _*))
      .groupBy(groupCols.map(col): _*)
      .agg(mergeExprs.head, mergeExprs.tail: _*)
    val oldTypes = names.map(n => n -> oldSummary.schema(n).dataType).toMap
    merged.select(
      groupCols.map(col) ++ names.map(n => col(n).cast(oldTypes(n)).as(n)): _*)
  }

  /** Fold a RETRACTING changefeed into a stored summary — incremental
    * view maintenance under deletes and updates, not just appends:
    * `changes` is [[graft.sources.LakeTable.readChanges]]'s
    * `withPreimage = true` shape (op 'I'|'U'|'D', postimage payload
    * columns, `<col>_pre` preimages). Each change contributes up to two
    * delta rows — a retraction keyed by the PREIMAGE's group values
    * ('U'/'D') and an addition keyed by the POSTIMAGE's ('I'/'U') — so
    * an update that moves a row between groups retracts from the old
    * group and lands in the new, and a group whose last row leaves
    * vanishes (its count reaches zero). One shuffle over
    * O(|summary| + 2·|changes|) rows; the base is never rescanned.
    * Invariant (spec-pinned):
    * `applyChanges(summarize(v1), readChanges(v1, v2, withPreimage)) ==
    * summarize(v2)`.
    *
    * Only sum/count measures are retractable — min/max lose information
    * on delete (the new extremum may live in unread rows), so they fail
    * loud here: maintain them by re-summarizing the touched groups, or
    * keep the view append-only and use [[foldSummary]]. A ("count", "*")
    * measure is REQUIRED — it is the group-death detector — and every
    * ("sum", c) needs its ("count", c) companion, the all-NULL-group
    * detector (the fold rewrites such a sum to NULL exactly where a
    * refit would). Exactness
    * caveat: a double-typed sum retracts bit-exactly only when addition
    * is (integer-valued doubles, decimals); cast the measure to DECIMAL
    * first otherwise.
    */
  def applyChanges(
      oldSummary: DataFrame, changes: DataFrame, groupCols: Seq[String],
      measures: Map[(String, String), String]): DataFrame = {
    measures.keys.foreach { case (f, c) =>
      require(f == "sum" || f == "count",
        s"Mv.applyChanges: $f($c) is not retractable — min/max need a " +
          "re-summarize of the touched groups (or an append-only view)")
    }
    val cntName = measures.getOrElse(("count", "*"),
      throw new IllegalArgumentException(
        "Mv.applyChanges: a (\"count\", \"*\") measure is required — it " +
          "detects groups whose last row left"))
    // every sum needs its count(c) companion: when a group's surviving
    // values are all NULL, summarize gives a NULL sum but a retracting
    // fold's arithmetic gives 0 — count(c) == 0 is the detector
    val sumCompanion: Map[String, String] = measures.collect {
      case (("sum", c), sumName) =>
        sumName -> measures.getOrElse(("count", c),
          throw new IllegalArgumentException(
            s"Mv.applyChanges: sum($c) needs a count($c) measure — " +
              "retraction cannot tell an all-NULL group's NULL sum from zero"))
    }
    val names = measures.toSeq.sortBy(_._2).map(_._2)
    def deltas(sign: Int): Seq[Column] = measures.toSeq.sortBy(_._2).map {
      case (("sum", c), name) =>
        val v = if (sign > 0) col(c) else -col(s"${c}_pre")
        v.as(name)
      case (("count", "*"), name) => lit(sign.toLong).as(name)
      case (("count", c), name) =>
        val src = if (sign > 0) col(c) else col(s"${c}_pre")
        when(src.isNotNull, lit(sign.toLong)).otherwise(lit(0L)).as(name)
      case ((f, c), _) => throw new IllegalArgumentException(
        s"Mv.applyChanges: unexpected measure $f($c)")
    }
    val add = changes.filter(col("op") =!= "D")
      .select(groupCols.map(col) ++ deltas(1): _*)
    val retract = changes.filter(col("op") =!= "I")
      .select(groupCols.map(c => col(s"${c}_pre").as(c)) ++ deltas(-1): _*)
    val layout = groupCols.map(col) ++ names.map(col)
    val merged = oldSummary.select(layout: _*)
      .unionByName(add).unionByName(retract)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col(names.head)).as(names.head),
        names.tail.map(n => sum(col(n)).as(n)): _*)
      .filter(col(cntName) =!= 0L)
    val oldTypes = names.map(n => n -> oldSummary.schema(n).dataType).toMap
    merged.select(
      groupCols.map(col) ++ names.map { n =>
        val v = sumCompanion.get(n) match {
          case Some(cntC) => when(col(cntC) === 0L, lit(null)).otherwise(col(n))
          case None       => col(n)
        }
        v.cast(oldTypes(n)).as(n)
      }: _*)
  }

  /** Maintain a summary WITH non-retractable measures (min/max) under
    * deletes: re-summarize only the groups the changefeed touched. The
    * feed names every group whose membership could have changed — each
    * change's POSTIMAGE group ('I'/'U') and PREIMAGE group ('U'/'D') —
    * so untouched groups pass through from the old summary without a
    * base read, touched groups recompute all measures from
    * `newBase`-restricted rows (on a group-clustered lake that filter is
    * a pruned scan), and a group whose last row left simply has no
    * recomputed row. Work: O(|summary|) pass-through + one scan of the
    * touched groups' rows — between [[applyChanges]]'s feed-only cost
    * and a full refit, and the ONLY sound option once min/max are in
    * the measure set (a delete can evict the current extremum, whose
    * replacement lives in rows no feed carries). NULL-valued groups
    * repair correctly (null-safe group equality throughout).
    */
  def repairChanges(
      oldSummary: DataFrame, newBase: DataFrame, changes: DataFrame,
      groupCols: Seq[String],
      measures: Map[(String, String), String]): DataFrame = {
    val names = measures.toSeq.sortBy(_._2).map(_._2)
    val touched = changes.filter(col("op") =!= "D")
      .select(groupCols.map(col): _*)
      .unionByName(changes.filter(col("op") =!= "I")
        .select(groupCols.map(c => col(s"${c}_pre").as(c)): _*))
      .distinct()
    def nullSafeOn(left: DataFrame, right: DataFrame): Column =
      groupCols.map(c => left(c) <=> right(c)).reduce(_ && _)
    val repaired = summarize(
      newBase.join(broadcast(touched), nullSafeOn(newBase, touched), "left_semi"),
      groupCols, measures)
    val untouched = oldSummary.select(
      groupCols.map(col) ++ names.map(col): _*)
    val kept = untouched.join(
      broadcast(touched), nullSafeOn(untouched, touched), "left_anti")
    val oldTypes = names.map(n => n -> oldSummary.schema(n).dataType).toMap
    kept.unionByName(repaired.select(
      groupCols.map(col) ++ names.map(n => col(n).cast(oldTypes(n)).as(n)): _*))
  }
}
