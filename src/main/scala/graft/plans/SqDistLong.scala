package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer squared-L2 distance over two long-array
  * columns — the quantized nearest-neighbor hot loop (kNN classify, and
  * the assignment shape under k-means/PQ). The composed
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, _+_)` is
  * interpreted (higher-order functions are CodegenFallback and zip_with
  * materializes the difference array); this is one fused allocation-free
  * loop in the enclosing whole-stage span, the [[DotProductLong]] altitude
  * applied to distances. Integer arithmetic — exactly the composed form's
  * values on any evaluation order; null elements propagate NULL
  * identically (check emitted only when containsNull is set).
  */
case class SqDistLong(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })
  // Always nullable: a length mismatch yields NULL regardless of the
  // children's nullability (matching the composed null-padded fold).
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sqdist_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // Ragged inputs: the composed zip_with/aggregate form null-pads the
    // shorter array and the fold yields NULL — a truncated partial distance
    // here would be a plausible WRONG value, so mismatch returns NULL too.
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val checkNulls = elemNullable
    var acc = 0L
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      long ${ev.value}_acc = 0L;
      int ${ev.value}_n = $a.numElements();
      if ($b.numElements() != ${ev.value}_n) { ${ev.isNull} = true; ${ev.value}_n = 0; }
      for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
        ${if (elemNullable)
          s"if ($a.isNullAt(${ev.value}_i) || $b.isNullAt(${ev.value}_i)) { ${ev.isNull} = true; break; }"
        else ""}
        long ${ev.value}_d = $a.getLong(${ev.value}_i) - $b.getLong(${ev.value}_i);
        ${ev.value}_acc += ${ev.value}_d * ${ev.value}_d;
      }
      ${ev.value} = ${ev.value}_acc;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
