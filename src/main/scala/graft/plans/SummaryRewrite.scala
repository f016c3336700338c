package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation}

/** Materialized-rollup rewrite — the aggregate-reuse optimization every
  * warehouse ships (Oracle query rewrite, BigQuery/Snowflake materialized
  * views): a query that re-aggregates a REGISTERED summary's base table on
  * a SUBSET of its grouping columns is rewritten to re-aggregate the tiny
  * summary instead of re-scanning the fact table, exploiting that
  * sum/count/min/max are self-decomposable (sum of sums, sum of counts,
  * min of mins). At 100 TB this turns a full fact scan into a read of a
  * few thousand pre-aggregated rows — the biggest constant-factor win a
  * reporting workload can get, and exactly what Catalyst's rule API
  * exists for.
  *
  * Soundness gates (all checked, rewrite declined otherwise):
  *  - the aggregate's input must be the summary's base relation (matched
  *    by parquet root paths, through column-pruning Projects only — a
  *    Filter/Join/expression in between disqualifies: the summary rows
  *    could not reproduce it);
  *  - the base relation must be UNCHANGED since `register()`: the file
  *    listing signature (path, length, modification time of every data
  *    file) captured at register time must equal the candidate scan's
  *    current listing. A single appended, rewritten, or removed file
  *    declines the rewrite — the materialized-view staleness contract.
  *    The compare costs one in-memory listing of an already-listed
  *    FileIndex, paid only for scans whose root paths already matched;
  *  - every grouping expression is a bare column ⊆ the summary's group
  *    columns (subset ⇒ valid rollup);
  *  - every aggregate is an undistinct, unfiltered sum/count/min/max
  *    over a measure the summary carries, or an avg whose denominator is
  *    provably null-correct (below). count(DISTINCT) is the classic
  *    non-example — not self-decomposable — and is declined.
  *
  * avg(x) decomposes to SUM(sum_x)/SUM(n) only when the denominator
  * matches avg's null semantics: a registered per-column ("count", x)
  * measure always qualifies (count(x) skips NULLs exactly as avg does);
  * the row count ("count", "*") qualifies ONLY when x is non-nullable —
  * over a nullable x with NULLs present, count(*) over-counts the
  * denominator and the quotient would be silently too small.
  *
  * The rewritten Aggregate preserves each original output attribute's
  * exprId (parents keep resolving), casts a re-sum back to the original
  * result type (decimal re-aggregation widens precision), and reads the
  * registered summary plan — for a localCheckpoint'ed / lake-landed
  * summary, a scan of the materialization, not a recompute.
  *
  * Injection: `SummaryRewrite.install(spark)` appends a PER-SESSION rule
  * instance to `spark.experimental.extraOptimizations` (runtime-
  * injectable, no session rebuild) — the same insertion family as
  * GraftExtensions' injectOptimizerRule, which requires the extensions
  * conf at session build time.
  */
object SummaryRewrite {

  /** One registered summary: the analyzed plan of the MATERIALIZED rollup
    * plus the recipe that built it and the base relation's file-listing
    * signature at registration (the freshness token).
    */
  final case class SummaryDef(
      name: String,
      basePaths: Seq[String],
      baseSignature: Seq[(String, Long, Long)],
      summary: LogicalPlan,
      groupCols: Seq[String],
      nonNullable: Set[String],
      // (func, base column) -> summary column; count(1) keys as ("count", "*")
      measures: Map[(String, String), String])

  /** The registry lives INSIDE the session it serves: one rule instance
    * per session, held only by that session's own
    * `experimental.extraOptimizations`. Lifetime is therefore structural,
    * not bookkept — session alive ⇒ sessionState ⇒ extraOptimizations ⇒
    * rule ⇒ defs; session unreachable ⇒ the rule, its defs, and their
    * plan trees (which strongly reference the session through
    * HadoopFsRelation) all collect with it, no global map to leak
    * through. This replaces a WeakHashMap + listener-bus indirection
    * whose "session-lifetime strong edge" was in fact CONTEXT-lifetime:
    * listenerManager registrations land on the SparkContext's shared
    * LiveListenerBus, so a closed session's plans survived until the
    * context died — exactly the leak the indirection claimed to close.
    *
    * The owner-identity guard keeps rewrites session-scoped even when a
    * cloned session copies the parent's extraOptimizations seq (clones
    * share the instance but must not consume the parent's plans).
    */
  final class SessionRule private[SummaryRewrite] (
      private[SummaryRewrite] val owner: SparkSession)
      extends Rule[LogicalPlan] {
    private[SummaryRewrite] val defs =
      scala.collection.concurrent.TrieMap.empty[String, SummaryDef]
    // owner is a session -> rule -> session CYCLE, not a leak: the rule's
    // only inbound strong edge is the owner's own extraOptimizations seq,
    // and a tracing GC collects cycles whole once the session is
    // unreachable. Reference identity (eq) is the ownership test — a
    // cloned session copies the parent's extraOptimizations seq and must
    // not consume the parent's plans.
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (defs.isEmpty ||
        !SparkSession.getActiveSession.exists(_ eq owner)) plan
      else plan.transformUp {
        case agg: Aggregate =>
          defs.values.iterator.flatMap(rewrite(agg, _)).nextOption().getOrElse(agg)
      }
  }

  private def ruleFor(spark: SparkSession): SessionRule = synchronized {
    spark.experimental.extraOptimizations.collectFirst {
      case r: SessionRule if r.owner eq spark => r
    }.getOrElse {
      val r = new SessionRule(spark)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ r
      r
    }
  }

  /** (path, length, modificationTime) of every data file the index lists —
    * the equality token `rewrite` compares against the registered one.
    */
  private def listingSignature(idx: FileIndex): Seq[(String, Long, Long)] =
    idx.listFiles(Nil, Nil)
      .flatMap(_.files)
      .map(f => (f.getPath.toString, f.getLen, f.getModificationTime))
      .sortBy(_._1)

  /** Register a materialized rollup of `base.groupBy(groupCols)`:
    * `measures` maps (func, baseCol) -> the summary column holding it.
    * Scoped to `base`'s session; valid only while the base relation's
    * file listing stays byte-identical (see staleness gate above).
    */
  def register(
      name: String, base: DataFrame, summary: DataFrame,
      groupCols: Seq[String], measures: Map[(String, String), String]): Unit = {
    val baseIndex = fileIndex(stripProjects(base.queryExecution.analyzed))
      .getOrElse(throw new IllegalArgumentException(
        s"summary '$name': base must be a file relation (got ${base.queryExecution.analyzed.nodeName})"))
    val nonNull = base.schema.fields.collect { case f if !f.nullable => f.name }.toSet
    ruleFor(base.sparkSession).defs.put(name, SummaryDef(
      name, baseIndex.rootPaths.map(_.toString), listingSignature(baseIndex),
      summary.queryExecution.analyzed, groupCols, nonNull, measures))
  }

  /** Drop the calling thread's reachable sessions' registrations (active
    * + default) — the one-session harness convenience; the precise API is
    * [[clear(spark*]].
    */
  def clear(): Unit =
    (SparkSession.getActiveSession.toSeq ++ SparkSession.getDefaultSession)
      .distinct.foreach(clear)

  /** Drop `spark`'s registrations only — call when a query's registration
    * must not outlive the query (the harness pattern: register, force
    * optimization, clear). Uninstalls the session's rule instance
    * entirely, releasing every registered plan tree immediately.
    */
  def clear(spark: SparkSession): Unit = synchronized {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filter {
        case r: SessionRule if r.owner eq spark => false
        case _ => true
      }
  }

  /** Idempotently append the session's rule instance to its runtime
    * optimizer (a no-op if already installed; `register` installs too).
    */
  def install(spark: SparkSession): Unit = { ruleFor(spark); () }

  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(child)
    case other => other
  }

  private def fileIndex(p: LogicalPlan): Option[FileIndex] = p match {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => Some(h.location)
      case _ => None
    }
    case _ => None
  }

  private def rewrite(agg: Aggregate, d: SummaryDef): Option[Aggregate] = {
    val idx = fileIndex(stripProjects(agg.child)).getOrElse(return None)
    if (idx.rootPaths.map(_.toString) != d.basePaths) return None
    // staleness gate: any appended / rewritten / vacuumed file since
    // register() changes the listing → the summary no longer reproduces
    // the base and the rewrite declines (the query runs on the fact scan)
    if (listingSignature(idx) != d.baseSignature) return None
    val sOut: Map[String, Attribute] = d.summary.output.map(a => a.name -> a).toMap

    // grouping: bare columns, subset of the summary's group columns
    val grouping = agg.groupingExpressions.map {
      case a: AttributeReference if d.groupCols.contains(a.name) => sOut(a.name)
      case _ => return None
    }

    val results = agg.aggregateExpressions.map { ne =>
      rewriteResult(ne, d, sOut).getOrElse(return None)
    }
    Some(Aggregate(grouping, results, d.summary))
  }

  private def rewriteResult(
      ne: NamedExpression, d: SummaryDef,
      sOut: Map[String, Attribute]): Option[NamedExpression] = ne match {
    // a grouping column carried into the output: re-point at the summary's
    // attr under the ORIGINAL exprId so parents keep resolving
    case a: AttributeReference if d.groupCols.contains(a.name) =>
      Some(Alias(sOut(a.name), a.name)(exprId = a.exprId))
    case al @ Alias(ae: AggregateExpression, name)
        if !ae.isDistinct && ae.filter.isEmpty =>
      val rolled: Option[Expression] = ae.aggregateFunction match {
        case s: Sum => s.child match {
          case c: AttributeReference =>
            d.measures.get(("sum", c.name)).map(m => Sum(sOut(m)).toAggregateExpression())
          case _ => None
        }
        case c: Count if c.children == Seq(Literal(1)) =>
          d.measures.get(("count", "*")).map(m => Sum(sOut(m)).toAggregateExpression())
        // count(x) re-sums a registered per-column count exactly (each
        // summary row already excluded its NULLs); for non-nullable x the
        // row count is an equivalent fallback
        case c: Count if c.children.length == 1 =>
          c.children.head match {
            case x: AttributeReference =>
              d.measures.get(("count", x.name))
                .orElse(if (d.nonNullable(x.name)) d.measures.get(("count", "*")) else None)
                .map(m => Sum(sOut(m)).toAggregateExpression())
            case _ => None
          }
        case m: Min => m.child match {
          case c: AttributeReference =>
            d.measures.get(("min", c.name)).map(x => Min(sOut(x)).toAggregateExpression())
          case _ => None
        }
        case m: Max => m.child match {
          case c: AttributeReference =>
            d.measures.get(("max", c.name)).map(x => Max(sOut(x)).toAggregateExpression())
          case _ => None
        }
        // avg decomposes as sum-of-sums / sum-of-counts when the summary
        // carries both AND the denominator matches avg's null semantics:
        // a per-column ("count", x) measure always does; the row count
        // ("count", "*") only when x is non-nullable (avg skips NULLs,
        // count(*) doesn't — over a nullable x the quotient would be
        // silently too small). Caveat (documented, spec-pinned): for
        // fractional doubles the re-sum's addition order differs from the
        // row scan's, so results agree to ulp, not bit — exact for
        // integer-valued and decimal measures. Spark's own
        // partial-aggregation merge makes the identical trade.
        case a: org.apache.spark.sql.catalyst.expressions.aggregate.Average
            if al.dataType == org.apache.spark.sql.types.DoubleType =>
          a.child match {
            case c: AttributeReference =>
              for {
                s <- d.measures.get(("sum", c.name))
                n <- d.measures.get(("count", c.name))
                  .orElse(if (d.nonNullable(c.name)) d.measures.get(("count", "*")) else None)
              } yield org.apache.spark.sql.catalyst.expressions.Divide(
                Cast(Sum(sOut(s)).toAggregateExpression(),
                  org.apache.spark.sql.types.DoubleType),
                Cast(Sum(sOut(n)).toAggregateExpression(),
                  org.apache.spark.sql.types.DoubleType))
            case _ => None
          }
        case _ => None
      }
      rolled.map { r =>
        // re-aggregation can widen the type (decimal sum-of-sums): cast
        // back so the output slot keeps its original type AND exprId
        val typed = if (r.dataType == al.dataType) r else Cast(r, al.dataType)
        Alias(typed, name)(exprId = al.exprId)
      }
    case _ => None
  }
}
