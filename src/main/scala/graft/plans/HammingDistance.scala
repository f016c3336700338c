package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** `hamming_distance(a, b)`: positions where two strings differ (+ length
  * difference). Native Catalyst expression with whole-stage codegen — the
  * SimHash pair-verify hot path compares millions of 60-char bit strings, and
  * the built-in composition (zip_with over split strings) allocates two
  * arrays per row-pair; this is a single byte loop.
  *
  * The custom-Expression insertion point promised in SURVEY.md §4/§7.3 for
  * ops Spark's built-ins can't express efficiently.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_distance"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    val n = math.min(a.length, b.length)
    var d = math.abs(a.length - b.length)
    var i = 0
    while (i < n) { if (a(i) != b(i)) d += 1; i += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ab = ctx.freshName("ab"); val bb = ctx.freshName("bb")
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""
         |byte[] $ab = $a.getBytes();
         |byte[] $bb = $b.getBytes();
         |int $n = Math.min($ab.length, $bb.length);
         |int $d = Math.abs($ab.length - $bb.length);
         |for (int $i = 0; $i < $n; $i++) { if ($ab[$i] != $bb[$i]) $d++; }
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule for the custom expression: `hamming_distance(x, x)` folds
  * to 0 (deterministic, null-safe when x is non-nullable) — constant-folding
  * Catalyst cannot do for an opaque function. Demonstrates the
  * injectOptimizerRule insertion point next to injectFunction.
  */
object SimplifyHammingSelfCompare
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // a.deterministic required: a rand()-derived string appearing as both
      // children re-evaluates per reference, so the fold would be unsound
      case HammingDistance(a, b)
          if a.semanticEquals(b) && !a.nullable && a.deterministic =>
        Literal(0, IntegerType)
    }
}

object GraftFunctions {
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("hamming_distance"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming_distance"),
      (children: Seq[Expression]) => HammingDistance(children(0), children(1))),
    CosineSimilarity.registration,
    CellMaxCosine.registration,
    CellMaxAdc.registration) ++ BloomFns.registrations

  /** Programmatic registration (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `--conf spark.sql.extensions=graft.plans.GraftExtensions` registers the
  * graft function library into every session of the cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => SimplifyHammingSelfCompare)
  }
}
