package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator as-of join — the (c)-tier custom operator of the build
  * brief: a logical node, an injected planner strategy, and a physical
  * merge-join exec, because this is the one relational operator in the
  * suite the built-in operators can only EMULATE, not express.
  *
  * The composed form (q_join_asof: theta join `r.time <= l.time` on the
  * equi key + per-probe row_number window) materializes EVERY candidate
  * pair — each probe joins a user's whole history before the window keeps
  * one row, so the intermediate is Σ|history per probe|, quadratic-ish in
  * events per key at 100 TB. This operator instead asks the planner for
  * co-partitioned (key) + co-sorted (key, time) children — the SAME
  * exchange/sort infrastructure a sort-merge join uses — and then streams
  * both sides ONCE per partition, carrying one remembered row: output is
  * |probes| rows with no intermediate blow-up at all.
  *
  * Semantics (hash-verified against the composed form's oracle), by mode:
  *  - [[AsOfMode.Backward]]: for each left row, the right row with the
  *    greatest (time, tie) such that `r.time <= l.time` and keys match.
  *  - [[AsOfMode.Nearest]] (round 10): the right row minimizing
  *    (|r.time - l.time|, r.time, tie) — the sensor-alignment variant;
  *    equidistant past/future resolves to the past row (smaller r.time),
  *    and equal-time candidates resolve to the smallest tie, exactly the
  *    composed form's `row_number() OVER (ORDER BY |Δt|, ts, tie)`.
  * In both modes left rows with no matching right row are dropped (inner
  * as-of) unless `outer = true` (round 10), which keeps them with NULL
  * right columns — the left-outer as-of a feature pipeline needs when
  * "no version yet" is a feature, not a row to lose. Keys, times and ties
  * must be 64-bit-comparable (long / timestamp); null keys or times never
  * match, mirroring the theta join the operator replaces (under `outer`
  * they surface as unmatched left rows).
  */
sealed trait AsOfMode
object AsOfMode {
  /** Latest right row at or before the left time. */
  case object Backward extends AsOfMode
  /** Closest right row on either side; ties prefer past, then lowest tie. */
  case object Nearest extends AsOfMode
}

case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, mode: AsOfMode = AsOfMode.Backward,
    outer: Boolean = false)
  extends BinaryNode {

  // The merge exec compares keys/times as raw longs (timestamp's internal
  // form IS micros-as-long); anything narrower would ClassCastException
  // mid-task. Enforce the documented 64-bit contract at plan construction
  // so misuse fails at planning, not in an executor.
  Seq("leftKey" -> leftKey, "rightKey" -> rightKey, "leftTime" -> leftTime,
      "rightTime" -> rightTime, "rightTie" -> rightTie).foreach {
    case (role, e) if e.resolved =>
      require(e.dataType == LongType || e.dataType == TimestampType,
        s"as-of join $role must be bigint or timestamp (64-bit comparable), " +
          s"got ${e.dataType.simpleString}")
    case _ => ()
  }

  // Outer: unmatched left rows emit NULL right columns, so the right
  // attributes must advertise nullability or downstream null checks fold.
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true))
                    else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfMergeJoinExec]] (injected via
  * `injectPlannerStrategy`, see [[GraftExtensions]]).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, mode, outer) =>
      AsOfMergeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie,
        mode, outer) :: Nil
    case _ => Nil
  }
}

/** Per-partition streaming merge over co-partitioned, co-sorted children.
  *
  * `requiredChildDistribution` pins BOTH sides to hash-clustering on the
  * key with an explicit partition count (the mandated count keeps AQE from
  * coalescing the two shuffles differently — the children must stay
  * zip-compatible), and `requiredChildOrdering` asks for (key, time[, tie])
  * sorts, so EnsureRequirements builds exactly the exchange+sort spine a
  * sort-merge join would get. The merge itself advances the right iterator
  * monotonically — left times are ascending within a key, so a right row
  * consumed for one probe is never needed "un-consumed" for the next — and
  * remembers ONE row (the latest `<=` candidate); memory per task is O(1)
  * beyond the sorter.
  */
case class AsOfMergeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, mode: AsOfMode = AsOfMode.Backward,
    outer: Boolean = false)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true))
                    else right.output)

  private val numParts = SQLConf.get.numShufflePartitions

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil, requiredNumPartitions = Some(numParts)) ::
    ClusteredDistribution(rightKey :: Nil, requiredNumPartitions = Some(numParts)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val schema = output
    val nearest = mode == AsOfMode.Nearest
    val emitUnmatched = outer
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val project = UnsafeProjection.create(schema, schema)
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered
      // The one remembered right row: the best candidate at or before the
      // current left time for `matchedKey`. Backward mode keeps the
      // greatest (time, tie) — each consume strictly improves. Nearest
      // mode keeps the FIRST row seen at the greatest time (= lowest tie
      // at that time, since the right sort is (key, time, tie) ascending),
      // matching the composed form's (|Δt|, ts, tie) minimization.
      var matched: InternalRow = null
      var matchedKey: Long = 0L
      var matchedTime: Long = 0L

      new Iterator[InternalRow] {
        private var nextRow: InternalRow = null

        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && lIter.hasNext) {
            val l = lIter.next()
            val lkV = lKey.eval(l)
            val ltV = lTime.eval(l)
            if (lkV != null && ltV != null) { // null key/time: never matches
              val lk = lkV.asInstanceOf[Long]
              val lt = ltV.asInstanceOf[Long]
              // Advance the right side monotonically for this left row.
              var continue = true
              while (continue && rBuf.hasNext) {
                val h = rBuf.head
                val rkV = rKey.eval(h)
                val rtV = rTime.eval(h)
                if (rkV == null || rtV == null) { rBuf.next() } // never matches
                else {
                  val rk = rkV.asInstanceOf[Long]
                  val rt = rtV.asInstanceOf[Long]
                  if (rk < lk) { rBuf.next() } // earlier key: discard
                  else if (rk == lk && rt <= lt) {
                    val consumed = rBuf.next()
                    if (!nearest || matched == null || matchedKey != rk ||
                        rt > matchedTime) {
                      matched = consumed.copy()
                      matchedKey = rk
                      matchedTime = rt
                    }
                  } else continue = false
                }
              }
              val hasBefore = matched != null && matchedKey == lk
              if (!nearest) {
                if (hasBefore) nextRow = project(joined(l, matched))
                else if (emitUnmatched) nextRow = project(joined(l, nullRight))
              } else {
                // Forward candidate: the right head, which the advance loop
                // left as the first (time, tie)-ordered row past lt for this
                // key (or a later key / exhausted). NOT consumed — the same
                // row may be a later probe's backward candidate.
                var after: InternalRow = null
                var afterTime = 0L
                if (rBuf.hasNext) {
                  val h = rBuf.head
                  val rkV = rKey.eval(h)
                  val rtV = rTime.eval(h)
                  if (rkV != null && rtV != null &&
                      rkV.asInstanceOf[Long] == lk) {
                    after = h
                    afterTime = rtV.asInstanceOf[Long]
                  }
                }
                // Equidistant resolves to the past row (smaller time).
                if (hasBefore &&
                    (after == null || lt - matchedTime <= afterTime - lt)) {
                  nextRow = project(joined(l, matched))
                } else if (after != null) {
                  nextRow = project(joined(l, after))
                } else if (emitUnmatched) {
                  nextRow = project(joined(l, nullRight))
                }
              }
            } else if (emitUnmatched) {
              // Null key/time never matches; under outer it still emits.
              nextRow = project(joined(l, nullRight))
            }
          }
        }

        override def hasNext: Boolean = {
          if (nextRow == null) advance()
          nextRow != null
        }
        override def next(): InternalRow = {
          if (nextRow == null) advance()
          val r = nextRow
          nextRow = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Name-based DataFrame surface (names resolve against each child's own
  * analyzed output, so the two sides may share column names).
  */
object AsOfJoin {
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, leftTime: String,
           rightKey: String, rightTime: String, rightTie: String,
           mode: AsOfMode = AsOfMode.Backward,
           outer: Boolean = false): DataFrame = {
    // Self-join hygiene: the analyzer's DeduplicateRelations only fires for
    // real Join nodes, so when both sides derive from one scan the children
    // would share exprIds and the optimizer mis-prunes. An alias
    // re-projection mints fresh exprIds for the right side.
    val overlap = left.queryExecution.analyzed.outputSet
      .intersect(right.queryExecution.analyzed.outputSet).nonEmpty
    val r = if (overlap)
      right.select(right.columns.map(c => right.col(c).as(c)).toIndexedSeq: _*)
    else right
    def attr(df: DataFrame, name: String) =
      df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${df.queryExecution.analyzed.output.map(_.name)}"))
    GraftShim.ofRows(left.sparkSession, AsOfJoinPlan(
      left.queryExecution.analyzed, r.queryExecution.analyzed,
      attr(left, leftKey), attr(r, rightKey),
      attr(left, leftTime), attr(r, rightTime), attr(r, rightTie), mode,
      outer))
  }
}
