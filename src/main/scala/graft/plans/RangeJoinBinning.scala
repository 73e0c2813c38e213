package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, AttributeReference, EqualTo, Explode, Expression,
  GreaterThan, GreaterThanOrEqual, IntegralDivide, LessThan,
  LessThanOrEqual, Literal, Pmod, Sequence, Subtract, UnixMicros}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: automatic range-join binning.
  *
  * A pure point-in-interval join —
  *
  * {{{ points.join(intervals, p >= lo && p <= hi) }}}
  *
  * with no cross-side equality — has no equi keys for the planner to
  * extract, so Spark executes it as a broadcast nested loop (or a
  * cartesian product): every point row is tested against EVERY interval
  * row, O(|points|·|intervals|). This rule rewrites the LOGICAL join into
  * the banded form the suite otherwise writes by hand
  * (q_join_interval_banded):
  *
  *  - the point side gains `bin = floorDiv(p, W)`;
  *  - the interval side generates one row per covered bin,
  *    `explode(sequence(floorDiv(lo, W), floorDiv(hi, W)))`;
  *  - the join becomes an EQUI join on the bin with the original range
  *    predicate as its residual, and a final projection restores the
  *    original output.
  *
  * Equivalence: a qualifying pair has lo ≤ p ≤ hi, hence
  * floorDiv(lo,W) ≤ floorDiv(p,W) ≤ floorDiv(hi,W) (floorDiv is
  * monotone), so the pair meets under exactly ONE bin key (the point owns
  * one bin) — no duplicates, no dedup step — and the residual keeps
  * strict/inclusive bounds exact. Intervals with `hi < lo` or a NULL
  * bound match nothing in the original inner join and are filtered before
  * the generator (also keeping `sequence()` monotone). NULL points get a
  * NULL bin, which an equi join drops — same as the original predicate.
  *
  * Scope guards (all must hold, checked on the RESOLVED join):
  *  - inner join whose condition bounds ONE point expression from both
  *    sides by same-typed bounds from the other side; long points bin
  *    directly, timestamp points bin on exact epoch micros (the width
  *    conf is then in µs);
  *  - NO cross-side equi conjunct — if one exists the planner already
  *    hash-joins on it and the suite's manual pre-binning
  *    (q_join_interval_banded) no longer matches here (its bin IS an equi
  *    conjunct), which also makes the rule idempotent: the rewritten join
  *    contains `bin = bin` and can never match again.
  *
  * The bin width is operator-chosen, one conf key PER UNIT SYSTEM
  * ([[ConfKey]] for long points in the column's own unit,
  * [[MicrosConfKey]] for timestamp points in µs; each 0/unset keeps its
  * arm off — see MicrosConfKey's scaladoc for why sharing one width
  * across units would be a foot-gun). Width trades generator fan-out,
  * (hi−lo)/W + 1 rows per interval, against residual selectivity per
  * bucket — the same knob every production range-join implementation
  * exposes. Exercised by q_join_range_auto, whose spec asserts the
  * nested loop is gone from the executed plan.
  */
object RangeJoinBinning extends Rule[LogicalPlan] {
  /** Bin width for LONG-typed points, in the column's own unit. */
  val ConfKey = "spark.graft.rangeJoin.binSize"

  /** Bin width for TIMESTAMP-typed points, in MICROSECONDS. A separate
    * key on purpose: one shared width across unit systems would let a
    * day-unit setting (e.g. 16, left by a long-typed query in the shared
    * session) apply to a microsecond-scale join, where a 30-minute
    * interval would explode into 10^8 generated bins. Each type's rule
    * arm is armed only by its own key; 0/unset keeps it off.
    */
  val MicrosConfKey = "spark.graft.rangeJoin.binSizeMicros"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** 1 = only left attrs, 2 = only right attrs, 0 = neither/mixed. */
  private def sideOf(e: Expression, j: Join): Int =
    if (e.references.isEmpty) 0
    else if (e.references.subsetOf(j.left.outputSet)) 1
    else if (e.references.subsetOf(j.right.outputSet)) 2
    else 0

  private case class Bounds(point: Expression, lo: Expression,
                            hi: Expression, pointSide: Int)

  private def findBounds(j: Join, cond: Expression,
                         wLong: Long, wTs: Long): Option[Bounds] = {
    val cs = conjuncts(cond)
    val hasCrossEqui = cs.exists {
      case EqualTo(a, b) =>
        val (sa, sb) = (sideOf(a, j), sideOf(b, j))
        (sa == 1 && sb == 2) || (sa == 2 && sb == 1)
      case _ => false
    }
    if (hasCrossEqui) return None
    // (point, bound, boundIsLower) candidates, cross-side; long-typed
    // directly, or timestamp-typed (binned on epoch micros — the bin conf
    // is then in MICROSECONDS, documented).
    def binnable(t: org.apache.spark.sql.types.DataType) =
      (t == LongType && wLong > 0) || (t == TimestampType && wTs > 0)
    def cand(p: Expression, b: Expression, lower: Boolean) = {
      val (sp, sb) = (sideOf(p, j), sideOf(b, j))
      if (binnable(p.dataType) && p.dataType == b.dataType &&
          sp != 0 && sb != 0 && sp != sb) Seq((p, b, lower, sp))
      else Seq.empty
    }
    val triples = cs.flatMap {
      case GreaterThanOrEqual(a, b) => cand(a, b, lower = true) ++
        cand(b, a, lower = false)
      case GreaterThan(a, b) => cand(a, b, lower = true) ++
        cand(b, a, lower = false)
      case LessThanOrEqual(a, b) => cand(a, b, lower = false) ++
        cand(b, a, lower = true)
      case LessThan(a, b) => cand(a, b, lower = false) ++
        cand(b, a, lower = true)
      case _ => Seq.empty
    }
    val lowers = triples.filter(_._3)
    val uppers = triples.filterNot(_._3)
    (for {
      (p, lo, _, sp) <- lowers
      (p2, hi, _, _) <- uppers
      if p.semanticEquals(p2)
    } yield Bounds(p, lo, hi, sp)).headOption
  }

  private def binOf(e: Expression, w: Long): Expression = {
    val width = Literal(w, LongType)
    // Timestamps bin on their exact epoch-micros representation (the bin
    // width conf is then in µs); longs bin directly.
    val asLong = if (e.dataType == TimestampType) UnixMicros(e) else e
    // floorDiv: (e - pmod(e, w)) / w — exact for negatives too.
    new IntegralDivide(Subtract(asLong, Pmod(asLong, width)), width)
  }

  private def rewrite(j: Join, b: Bounds, wLong: Long,
                      wTs: Long): LogicalPlan = {
    val w = if (b.point.dataType == TimestampType) wTs else wLong
    val (pointPlan, boundPlan) =
      if (b.pointSide == 1) (j.left, j.right) else (j.right, j.left)
    val binAlias = Alias(binOf(b.point, w), "__graft_bin")()
    val pointProj = Project(pointPlan.output :+ binAlias, pointPlan)
    val binAttr = binAlias.toAttribute
    // Degenerate/NULL intervals match nothing in the inner join; the
    // filter also keeps sequence() monotone.
    val guarded = Filter(LessThanOrEqual(b.lo, b.hi), boundPlan)
    val binR = AttributeReference("__graft_bin_gen", LongType,
      nullable = false)()
    // Sequence is TimeZoneAwareExpression: without a timeZoneId it reports
    // unresolved and the optimizer's plan validator rejects the rewrite
    // (long args never consult it, but resolution requires it).
    val gen = Generate(
      Explode(Sequence(binOf(b.lo, w), binOf(b.hi, w),
        Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binR), child = guarded)
    val newCond = And(EqualTo(binAttr, binR), j.condition.get)
    val joined =
      if (b.pointSide == 1) j.copy(left = pointProj, right = gen,
        condition = Some(newCond))
      else j.copy(left = gen, right = pointProj,
        condition = Some(newCond))
    Project(j.output, joined)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val wLong = conf.getConfString(ConfKey, "0").toLong
    val wTs = conf.getConfString(MicrosConfKey, "0").toLong
    if (wLong <= 0 && wTs <= 0) return plan
    plan.transform {
      case j @ Join(_, _, Inner, Some(cond), _) if j.resolved =>
        findBounds(j, cond, wLong, wTs)
          .map(rewrite(j, _, wLong, wTs)).getOrElse(j)
    }
  }
}
