package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  *  - every grouping expression is a bare column ⊆ the summary's group
  *    columns (subset ⇒ valid rollup);
  *  - every aggregate is an undistinct, unfiltered sum/count(1)/min/max
  *    over a measure the summary carries. count(DISTINCT) is the classic
  *    non-example — not self-decomposable — and is declined.
  *
  * The rewritten Aggregate preserves each original output attribute's
  * exprId (parents keep resolving), casts a re-sum back to the original
  * result type (decimal re-aggregation widens precision), and reads the
  * registered summary plan — for a localCheckpoint'ed / lake-landed
  * summary, a scan of the materialization, not a recompute.
  *
  * Injection: `SummaryRewrite.install(spark)` appends the rule to
  * `spark.experimental.extraOptimizations` (runtime-injectable, no
  * session rebuild) — the same insertion family as GraftExtensions'
  * injectOptimizerRule, which requires the extensions conf at session
  * build time.
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  /** One registered summary: the analyzed plan of the MATERIALIZED rollup
    * plus the recipe that built it.
    */
  final case class SummaryDef(
      name: String,
      basePaths: Seq[String],
      summary: LogicalPlan,
      groupCols: Seq[String],
      // (func, base column) -> summary column; count(1) keys as ("count", "*")
      measures: Map[(String, String), String])

  // registry scoped per session (identity key): a summary's analyzed plan
  // carries session-bound relations, so a rewrite must never cross
  // sessions — process-global caches of session-bound plans leak
  private val defs =
    new scala.collection.concurrent.TrieMap[(Int, String), SummaryDef]

  private def sessionKey(s: org.apache.spark.sql.SparkSession): Int =
    System.identityHashCode(s)

  /** Register a materialized rollup of `base.groupBy(groupCols)`:
    * `measures` maps (func, baseCol) -> the summary column holding it.
    * Scoped to `base`'s session.
    */
  def register(
      name: String, base: DataFrame, summary: DataFrame,
      groupCols: Seq[String], measures: Map[(String, String), String]): Unit = {
    val paths = rootPaths(stripProjects(base.queryExecution.analyzed))
      .getOrElse(throw new IllegalArgumentException(
        s"summary '$name': base must be a file relation (got ${base.queryExecution.analyzed.nodeName})"))
    defs.put((sessionKey(base.sparkSession), name), SummaryDef(
      name, paths, summary.queryExecution.analyzed, groupCols, measures))
  }

  def clear(): Unit = defs.clear()

  private def sessionDefs: Iterator[SummaryDef] =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        val key = sessionKey(s)
        defs.iterator.collect { case ((u, _), d) if u == key => d }
      case None => Iterator.empty
    }

  /** Idempotently append this rule to the session's runtime optimizer. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      sessionDefs.flatMap(rewrite(agg, _)).nextOption().getOrElse(agg)
  }

  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(child)
    case other => other
  }

  private def rootPaths(p: LogicalPlan): Option[Seq[String]] = p match {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => Some(h.location.rootPaths.map(_.toString))
      case _ => None
    }
    case _ => None
  }

  private def rewrite(agg: Aggregate, d: SummaryDef): Option[Aggregate] = {
    val child = stripProjects(agg.child)
    if (!rootPaths(child).contains(d.basePaths)) return None
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
        // carries BOTH. Caveat (documented, spec-pinned): for fractional
        // doubles the re-sum's addition order differs from the row scan's,
        // so results agree to ulp, not bit — exact for integer-valued and
        // decimal measures. Spark's own partial-aggregation merge makes
        // the identical trade.
        case a: org.apache.spark.sql.catalyst.expressions.aggregate.Average
            if al.dataType == org.apache.spark.sql.types.DoubleType =>
          a.child match {
            case c: AttributeReference =>
              for {
                s <- d.measures.get(("sum", c.name))
                n <- d.measures.get(("count", "*"))
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
