package graft

import org.apache.spark.sql.functions._

import graft.plans.RangeJoinBinning

/** The automatic range-join binning rule: fires on pure point-in-interval
  * joins, leaves equi joins alone, and is result-identical to the
  * nested-loop plan it replaces — including strict bounds, NULLs, and
  * degenerate intervals.
  */
class RangeJoinBinningSpec extends SparkTestBase {
  import spark.implicits._

  private def withBinSize[A](w: Long)(f: => A): A = {
    val old = spark.conf.getOption(RangeJoinBinning.ConfKey)
    spark.conf.set(RangeJoinBinning.ConfKey, w.toString)
    try f finally old match {
      case Some(v) => spark.conf.set(RangeJoinBinning.ConfKey, v)
      case None => spark.conf.unset(RangeJoinBinning.ConfKey)
    }
  }

  private val points = Seq(0L, 5L, 15L, 16L, 31L, 32L, 100L, -7L)
  private val intervals: Seq[(Long, java.lang.Long, java.lang.Long)] = Seq(
    (1L, 0L, 10L), (2L, 10L, 40L), (3L, 30L, 30L),
    (4L, 50L, 20L),                  // degenerate: hi < lo, matches nothing
    (5L, null, 10L), (6L, 90L, null), // NULL bounds match nothing
    (7L, -10L, -1L))                  // negative range exercises floorDiv

  private def run(cond: org.apache.spark.sql.Column) = {
    val p = points.toDF("p")
    val iv = intervals.toDF("id", "lo", "hi")
    p.join(iv, cond).select($"p", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("binned result identical to the nested-loop result, all edge cases") {
    for (cond <- Seq(
        $"p" >= $"lo" && $"p" <= $"hi",
        $"p" > $"lo" && $"p" < $"hi",
        $"lo" <= $"p" && $"hi" >= $"p")) {
      // binSize=0 disables the rule even if a prior query in the shared
      // session enabled it (q_join_range_auto sets 16 persistently).
      val plain = withBinSize(0L)(run(cond))
      for (w <- Seq(1L, 7L, 16L, 1000L)) {
        assert(withBinSize(w)(run(cond)) == plain, s"w=$w cond=$cond")
      }
      assert(plain.nonEmpty)
    }
  }

  test("timestamp points bin on epoch micros under their own width key") {
    def ts(minute: Int) =
      new java.sql.Timestamp(1700000000000L + minute * 60000L)
    val p = (0 until 40).map(i => (i.toLong, ts(i * 3))).toDF("pid", "t")
    val iv = Seq((1L, ts(0), ts(30)), (2L, ts(25), ts(90)),
      (3L, ts(100), ts(95))).toDF("id", "lo", "hi")
    def run() = p.join(iv, $"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val key = RangeJoinBinning.MicrosConfKey
    val plain = run() // micros key unset -> timestamps not binned
    try {
      spark.conf.set(key, (10 * 60 * 1000000L).toString) // 10-minute bins
      assert(run() == plain && plain.nonEmpty)
      val plan = p.join(iv, $"t" >= $"lo" && $"t" <= $"hi")
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("__graft_bin"))
      // the LONG width key being set must not affect timestamp joins
      spark.conf.unset(key)
      withBinSize(16L) { assert(run() == plain) }
    } finally spark.conf.unset(key)
  }

  test("rule fires: bin key in the plan, nested loop gone") {
    withBinSize(16L) {
      val df = SparkEntry.queries("q_join_range_auto")(spark, sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_bin"))
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"))
    }
  }

  test("joins with a cross-side equi key are left untouched") {
    withBinSize(16L) {
      val plan = SparkEntry.queries("q_join_theta_range")(spark, sf0001)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bin"))
    }
  }

  test("manual pre-binned interval join unchanged (its bin IS an equi key)") {
    withBinSize(16L) {
      val plan = SparkEntry.queries("q_join_interval_banded")(spark, sf0001)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bin"))
    }
  }
}
