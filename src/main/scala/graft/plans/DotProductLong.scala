package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer dot product over two long-array columns — the
  * quantized-similarity hot loop (q_sim_quantized).
  *
  * The composed formulation `aggregate(zip_with(a, b, _*_), 0L, _+_)` is
  * correct but interpreted twice over: Spark's higher-order functions are
  * CodegenFallback (they break the enclosing whole-stage-codegen span) AND
  * zip_with materializes the intermediate product array. This is one fused
  * allocation-free loop that codegens into the stage — the same (b)-tier
  * custom-Expression altitude as [[CosineSimilarity]], applied to the int8
  * candidate-generation path.
  *
  * Integer addition is associative, so unlike the float cosine there is no
  * accumulation-order caveat: results are exactly those of the composed
  * form on any evaluation order. Null ELEMENTS propagate NULL exactly like
  * the composed fold; the check is only emitted when containsNull is set.
  */
case class DotProductLong(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })
  override def nullable: Boolean = super.nullable || elemNullable

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
  override def prettyName: String = "graft_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val checkNulls = elemNullable
    var dot = 0L
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      long ${ev.value}_dot = 0L;
      int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
      for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
        ${if (elemNullable)
          s"if ($a.isNullAt(${ev.value}_i) || $b.isNullAt(${ev.value}_i)) { ${ev.isNull} = true; break; }"
        else ""}
        ${ev.value}_dot += $a.getLong(${ev.value}_i) * $b.getLong(${ev.value}_i);
      }
      ${ev.value} = ${ev.value}_dot;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
