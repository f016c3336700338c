package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `cell_max_adc(members, lut, dqc, qn)` — the PQ-compressed semantic-
  * novelty-probe kernel as ONE fused loop (the [[CellMaxCosine]] pattern,
  * with asymmetric-distance scoring over codes instead of full-vector
  * cosines):
  *
  *  - `members`: a packed PQ cell —
  *    `array<struct<id: bigint, codes: array<int>, nsq: bigint>>`
  *    ([[graft.operators.Pq.buildPqSemanticIndex]]'s layout): each corpus
  *    member's residual code ordinals plus its PRECOMPUTED reconstruction
  *    norm² in ×10⁶ micro-units (‖centroid + decoded residual‖², already
  *    the exact-integer sum of the per-term quantized dots);
  *  - `lut`: the probe row's flattened query lookup table,
  *    `array<bigint>` of size m·nCodes indexed `sub·nCodes + code` — each
  *    entry the ×10⁶-quantized 6-dp-rounded dot of the query's subvector
  *    with that code's residual centroid;
  *  - `dqc`: the ×10⁶-quantized rounded dot of the query with the CELL
  *    centroid (`bigint`);
  *  - `qn`: the query's full-precision L2 norm (`double`).
  *
  * Result: `struct<cos: double, id: bigint>` — the best member by
  * `round6(((dqc + Σₛ lut[s·nCodes + codeₛ]) / 10⁶) / (qn · √(nsq/10⁶)))`,
  * ties to the LOWEST id; a member with `nsq ≤ 0` or a zero denominator
  * scores −1.0 (the safeCos rule). The integer sums make the score
  * independent of association order — the [[graft.operators.Pq]] contract
  * — so the DuckDB oracle replays it bit-for-bit.
  *
  * Null handling (the [[CellMaxCosine]] rules): null `members`/`lut`/
  * `dqc`/`qn`, or a null lut element → null; a member with a null field,
  * null code element, or an out-of-range code is skipped; no scorable
  * member → null.
  */
case class CellMaxAdc(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val membersOk = first.dataType match {
      case ArrayType(StructType(Array(idF, codesF, nsqF)), _) =>
        idF.dataType == LongType && nsqF.dataType == LongType &&
          (codesF.dataType match {
            case ArrayType(IntegerType, _) => true
            case _ => false
          })
      case _ => false
    }
    val ok = membersOk &&
      (second.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      }) && third.dataType == LongType && fourth.dataType == DoubleType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<struct<id: bigint, codes: array<int>, " +
        s"nsq: bigint>>, array<bigint>, bigint, double), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}, ${fourth.dataType.simpleString})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "cell_max_adc"

  override protected def nullSafeEval(m: Any, l: Any, d: Any, n: Any): Any =
    CellMaxAdc.best(m.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData],
      d.asInstanceOf[Long], n.asInstanceOf[Double])

  // same insertion-point pattern as CellMaxCosine: the loop lives in the
  // compiled static helper, codegen just calls it, so the surrounding
  // operators stay in one whole-stage span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, l, d, n) => {
      s"""
         |${ev.value} = graft.plans.CellMaxAdc.best($m, $l, $d, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): CellMaxAdc =
    copy(first = f, second = s, third = t, fourth = q)
}

object CellMaxAdc {

  /** One pass over the packed PQ cell; see the class scaladoc for the
    * exact arithmetic/null contract. Returns null when nothing is
    * scorable.
    */
  def best(members: ArrayData, lut: ArrayData, dqc: Long, qn: Double): InternalRow = {
    val lutN = lut.numElements()
    val luts = new Array[Long](lutN)
    var i = 0
    while (i < lutN) {
      if (lut.isNullAt(i)) return null
      luts(i) = lut.getLong(i); i += 1
    }
    var found = false
    var bestCos = Double.NegativeInfinity
    var bestId = 0L
    val n = members.numElements()
    var k = 0
    while (k < n) {
      if (!members.isNullAt(k)) {
        val row = members.getStruct(k, 3)
        if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2)) {
          val id = row.getLong(0)
          val codes = row.getArray(1)
          val nsq = row.getLong(2)
          val m = codes.numElements()
          // stride: lut covers m subspaces of nCodes slots each
          val stride = if (m > 0) lutN / m else 0
          var dsum = dqc
          var ok = m > 0 && stride * m == lutN
          var s = 0
          while (ok && s < m) {
            if (codes.isNullAt(s)) ok = false
            else {
              val c = codes.getInt(s)
              if (c < 0 || c >= stride) ok = false
              else { dsum += luts(s * stride + c); s += 1 }
            }
          }
          if (ok) {
            val denom = qn * math.sqrt(nsq.toDouble / 1e6)
            val cos =
              if (nsq <= 0L || denom == 0.0) -1.0
              else graft.operators.SimilaritySearch.round6((dsum.toDouble / 1e6) / denom)
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
    (new FunctionIdentifier("cell_max_adc"),
      new ExpressionInfo(classOf[CellMaxAdc].getName, "cell_max_adc"),
      (children: Seq[Expression]) =>
        CellMaxAdc(children(0), children(1), children(2), children(3)))
}
