package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, AttributeReference, CreateMap, EqualTo, Explode, Expression,
  Greatest, GreaterThan, GreaterThanOrEqual, If, IntegralDivide, Least,
  LessThan, LessThanOrEqual, Literal, Pmod, RaiseError, Sequence, Subtract,
  UnixMicros}
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
  * A second arm (round 11) handles the two-sided INTERVAL×INTERVAL
  * overlap join — `a.lo <= b.hi && b.lo <= a.hi` in any conjunct order /
  * strictness — which is the other common range-join shape (temporal
  * overlap, genomic intervals). Both sides explode their covered bins
  * and the pair is kept only in its OWNERSHIP bin, the one containing
  * `greatest(a.lo, b.lo)` — see [[rewriteOverlap]] for the no-dup /
  * no-loss argument. The point arm is tried first (one generator beats
  * two). Exercised end-to-end by q_join_interval_overlap.
  *
  * The bin width is operator-chosen, one conf key PER UNIT SYSTEM
  * ([[ConfKey]] for long points in the column's own unit,
  * [[MicrosConfKey]] for timestamp points in µs; each 0/unset keeps its
  * arm off — see MicrosConfKey's scaladoc for why sharing one width
  * across units would be a foot-gun). Width trades generator fan-out,
  * (hi−lo)/W + 1 rows per interval, against residual selectivity per
  * bucket — the same knob every production range-join implementation
  * exposes; a per-interval fan-out CAP ([[MaxBinsConfKey]]) turns the
  * too-small-width failure mode into a named error. Exercised by
  * q_join_range_auto, whose spec asserts the nested loop is gone from
  * the executed plan.
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

  /** Cap on generated bins PER INTERVAL ROW. A too-small width would turn
    * a slow-but-working nested loop into a runtime array-allocation
    * failure deep inside `Sequence` (the µs arm makes this easy: a 1 µs
    * width over a 2-hour window is 7.2e9 bins). The generator is wrapped
    * in a per-row guard that raises a NAMED error — pointing at the width
    * conf — the moment one interval would exceed the cap, instead of an
    * anonymous negative-array-size/OOM from the depths of codegen.
    */
  val MaxBinsConfKey = "spark.graft.rangeJoin.maxBinsPerInterval"
  val MaxBinsDefault = 1000000L

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

  /** `sequence(binLo, binHi)` guarded by the per-interval fan-out cap:
    * any single row whose interval would generate more than `maxBins`
    * bins raises a named error citing the width conf instead of dying in
    * an array allocation (see [[MaxBinsConfKey]]). RaiseError's dataType
    * is pinned to the sequence's array type so the If branches agree.
    */
  private def cappedBinSeq(binLo: Expression, binHi: Expression,
                           maxBins: Long): Expression = {
    val seq = Sequence(binLo, binHi, Some(Literal(1L, LongType)),
      Some(conf.sessionLocalTimeZone))
    val err = RaiseError(Literal("USER_RAISED_EXCEPTION"),
      CreateMap(Seq(Literal("errorMessage"), Literal(
        s"graft range-join binning: one interval spans more than $maxBins " +
          s"bins ($MaxBinsConfKey); widen $ConfKey / $MicrosConfKey or " +
          "raise the cap"))),
      seq.dataType)
    // A row generates binHi-binLo+1 bins, so the cap trips at
    // binHi-binLo >= maxBins (>= not >: `>` admitted maxBins+1 bins).
    If(GreaterThanOrEqual(Subtract(binHi, binLo), Literal(maxBins, LongType)),
      err, seq)
  }

  private def rewrite(j: Join, b: Bounds, wLong: Long, wTs: Long,
                      maxBins: Long): LogicalPlan = {
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
      Explode(cappedBinSeq(binOf(b.lo, w), binOf(b.hi, w), maxBins)),
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

  /** Two-sided interval OVERLAP join: `[lo1,hi1]` on the left, `[lo2,hi2]`
    * on the right, condition `lo1 {<,<=} hi2 && lo2 {<,<=} hi1`.
    */
  private case class Overlap(lo1: Expression, hi1: Expression,
                             lo2: Expression, hi2: Expression)

  /** Detect the overlap shape: one `small <= big` conjunct whose small
    * side is a LEFT expression and big side RIGHT, and one the other way
    * round (strict variants included — strictness rides the residual).
    * Runs only after [[findBounds]] fails, so a point-in-interval join
    * (where the "interval" would be degenerate `[p,p]`) takes the cheaper
    * single-generator arm.
    */
  private def findOverlap(j: Join, cond: Expression,
                          wLong: Long, wTs: Long): Option[Overlap] = {
    val cs = conjuncts(cond)
    val hasCrossEqui = cs.exists {
      case EqualTo(a, b) =>
        val (sa, sb) = (sideOf(a, j), sideOf(b, j))
        (sa == 1 && sb == 2) || (sa == 2 && sb == 1)
      case _ => false
    }
    if (hasCrossEqui) return None
    def binnable(t: org.apache.spark.sql.types.DataType) =
      (t == LongType && wLong > 0) || (t == TimestampType && wTs > 0)
    // Normalized cross-side (small, big, smallSide) upper-bound conjuncts.
    def norm(small: Expression, big: Expression): Seq[(Expression, Expression, Int)] = {
      val (ss, sb) = (sideOf(small, j), sideOf(big, j))
      if (binnable(small.dataType) && small.dataType == big.dataType &&
          ss != 0 && sb != 0 && ss != sb) Seq((small, big, ss))
      else Seq.empty
    }
    val les = cs.flatMap {
      case LessThanOrEqual(a, b) => norm(a, b)
      case LessThan(a, b) => norm(a, b)
      case GreaterThanOrEqual(a, b) => norm(b, a)
      case GreaterThan(a, b) => norm(b, a)
      case _ => Seq.empty
    }
    for {
      (lo1, hi2, _) <- les.find(_._3 == 1) // left.lo <= right.hi
      (lo2, hi1, _) <- les.find(_._3 == 2) // right.lo <= left.hi
      if lo1.dataType == lo2.dataType
    } yield Overlap(lo1, hi1, lo2, hi2)
  }

  /** Rewrite the overlap join into an equi join on a shared bin key.
    * BOTH sides generate their covered bins over `[least(lo,hi),
    * greatest(lo,hi)]` (least/greatest so an ill-formed `lo > hi` row —
    * which the original condition can still match — stays monotone for
    * `sequence`), and the residual keeps exactly ONE of the common bins
    * per matching pair: the bin containing `greatest(lo1, lo2)`. That
    * value lies inside both covered ranges whenever the condition holds
    * (m = max(lo1,lo2): m >= lo1 and, via the condition's lo2 <= hi1,
    * m <= greatest(lo1,hi1); symmetrically for the right side), so no
    * match is lost and none duplicates — no dedup step, same invariant
    * as the point arm. NULL bounds: sequence(NULL,…) explodes to zero
    * rows and the residual original condition is NULL — both sides agree
    * on "no match".
    */
  private def rewriteOverlap(j: Join, o: Overlap, wLong: Long, wTs: Long,
                             maxBins: Long): LogicalPlan = {
    val w = if (o.lo1.dataType == TimestampType) wTs else wLong
    def gen(child: LogicalPlan, lo: Expression, hi: Expression,
            name: String): (LogicalPlan, AttributeReference) = {
      val attr = AttributeReference(name, LongType, nullable = false)()
      val g = Generate(
        Explode(cappedBinSeq(binOf(Least(Seq(lo, hi)), w),
          binOf(Greatest(Seq(lo, hi)), w), maxBins)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(attr), child = child)
      (g, attr)
    }
    val (genL, binL) = gen(j.left, o.lo1, o.hi1, "__graft_bin_l")
    val (genR, binR) = gen(j.right, o.lo2, o.hi2, "__graft_bin_r")
    val ownership =
      EqualTo(binL, binOf(Greatest(Seq(o.lo1, o.lo2)), w))
    val newCond = And(EqualTo(binL, binR),
      And(j.condition.get, ownership))
    Project(j.output,
      j.copy(left = genL, right = genR, condition = Some(newCond)))
  }

  private def confLong(key: String, default: Long): Long = {
    val raw = conf.getConfString(key, default.toString)
    try raw.toLong
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(
        s"$key must be a long (bin width / bin cap), got '$raw'")
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val wLong = confLong(ConfKey, 0L)
    val wTs = confLong(MicrosConfKey, 0L)
    if (wLong <= 0 && wTs <= 0) return plan
    val maxBins = confLong(MaxBinsConfKey, MaxBinsDefault)
    plan.transform {
      case j @ Join(_, _, Inner, Some(cond), _) if j.resolved =>
        findBounds(j, cond, wLong, wTs)
          .map(rewrite(j, _, wLong, wTs, maxBins))
          .orElse(findOverlap(j, cond, wLong, wTs)
            .map(rewriteOverlap(j, _, wLong, wTs, maxBins)))
          .getOrElse(j)
    }
  }
}
