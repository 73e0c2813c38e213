package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd double dot product over two numeric-array columns
  * (float or double elements on either side) — the hyperplane-projection /
  * centroid-assignment hot loop of the ANN queries (added round 9).
  *
  * Why it exists: the composed `aggregate(zip_with(a, b, (x, y) =>
  * x.cast(double) * y), 0.0, _ + _)` is CORRECT but interpreted — Spark's
  * higher-order functions never enter whole-stage codegen, and a round-9
  * stack-sample audit caught exactly that shape (ZipWith.eval /
  * ArrayAggregate.eval) burning 95 s in the SINGLE scan task of
  * q_sim_ann_lsh when the JIT hadn't warmed the eval path. A fused
  * codegen'd loop is immune to that failure mode and allocation-free.
  *
  * Accumulation is index order in double precision — bit-identical to the
  * composed form it replaces, so bucket assignments (sign tests on the
  * rounded dot) cannot change. That contract includes null ELEMENTS: the
  * composed `zip_with` + `aggregate` yields NULL when any zipped element is
  * null, so this loop propagates NULL the same way. The per-element check
  * is emitted only when the input type's containsNull says it can happen —
  * the non-nullable fast path is branch-free.
  */
case class DotProductDouble(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })
  override def nullable: Boolean = super.nullable || elemNullable

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    val checkNulls = elemNullable
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xd = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yd = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xd * yd
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nullCheck = if (elemNullable)
        s"""if ($a.isNullAt(${ev.value}_i) || $b.isNullAt(${ev.value}_i)) {
           |  ${ev.isNull} = true; break;
           |}""".stripMargin
      else ""
      s"""
      double ${ev.value}_dot = 0.0;
      int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
      for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
        $nullCheck
        ${ev.value}_dot += (double) $a.$lGet(${ev.value}_i)
          * (double) $b.$rGet(${ev.value}_i);
      }
      ${ev.value} = ${ev.value}_dot;
    """})
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
