package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `cell_max_cosine(members, query)` — the semantic-novelty-probe kernel as
  * ONE fused loop: `members` is a packed IVF cell
  * (`array<struct<id: bigint, emb: array<float>>>`,
  * [[graft.operators.Dedup.buildSemanticIndex]]'s layout), `query` the
  * arriving vector; the result is `struct<cos: double, id: bigint>` — the
  * best ROUNDED cosine in the cell and the matching corpus id, ties to the
  * LOWEST id.
  *
  * Exists because the declarative form —
  * `array_max(transform(members, m → struct(round(cosine_similarity(...)))))`
  * — evaluates the lambda INTERPRETED per member (higher-order functions
  * sit outside whole-stage codegen), allocating an expression-tree walk and
  * a struct per member per row; on the streaming gate that lambda overhead
  * dominated the actual arithmetic. This expression runs the whole cell in
  * a tight JVM loop (the [[HammingDistance]] insertion-point pattern).
  *
  * Arithmetic contract (bit-for-bit with the HOF composition and the DuckDB
  * oracle): per member, floats widen to double, dot/norms accumulate
  * index-ascending over min(len) elements ([[CosineSimilarity]]'s rule),
  * cosine rounds HALF_UP to 6 dp; zero-norm or NaN pins to −1.0 (the
  * `nanvl` guard — a directionless vector can never win the argmax or pass
  * a ≥ τ gate). Null handling: null `members`/`query` (or a null query
  * element) → null; a member with a null id, null emb, or null emb element
  * is skipped; no scorable member → null.
  */
case class CellMaxCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(StructType(Array(idF, embF)), _), ArrayType(FloatType, _)) =>
        idF.dataType == LongType && (embF.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<struct<id: bigint, emb: array<float>>>, " +
        s"array<float>), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "cell_max_cosine"

  override protected def nullSafeEval(m: Any, q: Any): Any =
    CellMaxCosine.best(m.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])

  // the loop lives in the compiled static helper either way; codegen only
  // needs to call it, which keeps the surrounding operators in one
  // whole-stage span instead of falling back to interpreted projection
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = nullSafeCodeGen(ctx, ev, (m, q) => {
      s"""
         |${ev.value} = graft.plans.CellMaxCosine.best($m, $q);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
    res
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellMaxCosine =
    copy(left = newLeft, right = newRight)
}

object CellMaxCosine {

  /** One pass over the packed cell; see the class scaladoc for the exact
    * arithmetic/null contract. Returns null when nothing is scorable.
    */
  def best(members: ArrayData, query: ArrayData): InternalRow = {
    val qd = query.numElements()
    val qv = new Array[Double](qd)
    var qNormFullSq = 0.0
    var i = 0
    while (i < qd) {
      if (query.isNullAt(i)) return null
      val x = query.getFloat(i).toDouble
      qv(i) = x; qNormFullSq += x * x; i += 1
    }
    var found = false
    var bestCos = Double.NegativeInfinity
    var bestId = 0L
    val n = members.numElements()
    var k = 0
    while (k < n) {
      if (!members.isNullAt(k)) {
        val row = members.getStruct(k, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val id = row.getLong(0)
          val emb = row.getArray(1)
          val d = math.min(emb.numElements(), qd)
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var ok = true
          var j = 0
          while (ok && j < d) {
            if (emb.isNullAt(j)) ok = false
            else {
              val y = emb.getFloat(j).toDouble
              dot += y * qv(j); na += y * y; nb += qv(j) * qv(j)
              j += 1
            }
          }
          if (ok) {
            // CosineSimilarity accumulates BOTH norms over min(len) — reuse
            // the precomputed full query norm only when lengths agree
            val qn = math.sqrt(if (d == qd) qNormFullSq else nb)
            val denom = math.sqrt(na) * qn
            val raw = dot / denom
            val cos =
              if (denom == 0.0 || java.lang.Double.isNaN(raw)) -1.0
              else graft.operators.SimilaritySearch.round6(raw)
            if (!found || cos > bestCos || (cos == bestCos && id < bestId)) {
              found = true; bestCos = cos; bestId = id
            }
          }
        }
      }
      k += 1
    }
    if (!found) null
    else new GenericInternalRow(Array[Any](bestCos, bestId))
  }

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier("cell_max_cosine"),
      new ExpressionInfo(classOf[CellMaxCosine].getName, "cell_max_cosine"),
      (children: Seq[Expression]) => CellMaxCosine(children(0), children(1)))
}
