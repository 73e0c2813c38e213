package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity over two string columns — the fuzzy
  * name-matching score entity resolution ranks candidate pairs by
  * (complementing the edit-distance surface of `levenshtein` +
  * [[LevenshteinPruning]]: JW weighs common prefixes and tolerates
  * transpositions, the right shape for person/product names).
  *
  * Spark ships no Jaro-Winkler; this is the standard formulation —
  * match window floor(max(|a|,|b|)/2)−1, half-transposition count,
  * Winkler prefix boost p=0.1 over at most 4 chars applied only when
  * jaro > 0.7, empty strings score 0 — verified against DuckDB's
  * `jaro_winkler_similarity` on the classic pairs (MARTHA/MARHTA
  * 0.9611…, DIXON/DICKSONX 0.8133…, AB/BA 0, ''/x 0; boost threshold
  * probed: jaro 0.6 + common prefix gets NO boost, 0.7143 does). Graded
  * queries round to 4 decimals (the q_math_funcs transcendental rule) so
  * last-ulp association differences between engines cannot flip a rank.
  *
  * Codegen: the loop lives in a static helper; `doGenCode` emits one
  * static call, so the expression stays inside whole-stage codegen (the
  * same shape as Spark's own `levenshtein`, which defers to UTF8String).
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroWinkler.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Static entry point shared by eval and generated code. */
  def jw(as: UTF8String, bs: UTF8String): Double = {
    val a = as.toString
    val b = bs.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // Half-transpositions are FLOORED (integer division), matching
    // DuckDB/rapidfuzz — the one spot where textbook variants differ
    // (probed on 'red gear'/'large gear': t=3 raw, floor gives 0.8107
    // vs 0.7869 with exact halves).
    var jaro = (m / la + m / lb + (m - t / 2) / m) / 3.0
    if (jaro > 0.7) {
      val maxp = math.min(4, math.min(la, lb))
      var prefix = 0
      while (prefix < maxp && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
      jaro += prefix * 0.1 * (1.0 - jaro)
    }
    jaro
  }
}
