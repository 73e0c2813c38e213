package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.plans.AsOfJoin

/** The custom whole-operator as-of join (plans/AsOfJoin.scala): the
  * injected strategy must actually plan it, the merge must equal the
  * composed theta-join + window formulation row-for-row, and the edge
  * semantics (no-prior-event probes dropped, exact-timestamp ties broken
  * by the tie column) must match the inner as-of contract.
  */
class AsOfMergeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("q_join_asof_merge equals the composed q_join_asof row-for-row") {
    val merge = SparkEntry.queries("q_join_asof_merge")(spark, sf0001)
      .as[(Long, Timestamp, Long, Timestamp)].collect().toSeq
    val composed = SparkEntry.queries("q_join_asof")(spark, sf0001)
      .as[(Long, Timestamp, Long, Timestamp)].collect().toSeq
    assert(merge.nonEmpty && merge == composed)
  }

  test("the injected strategy plans AsOfMergeJoinExec, not a window") {
    val df = SparkEntry.queries("q_join_asof_merge")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("row_number"), "composed-form window leaked in")
  }

  test("merge semantics on a literal fixture: ties, no-match drops, reuse") {
    def t(s: String) = Timestamp.valueOf(s)
    val right = Seq(
      (1L, 10L, t("2024-01-01 10:00:00")),
      (1L, 11L, t("2024-01-01 10:00:00")), // tie: same ts, higher event_id wins
      (1L, 12L, t("2024-01-01 12:00:00")),
      (3L, 30L, t("2024-01-01 09:00:00")))
      .toDF("user_id", "event_id", "ts")
    val left = Seq(
      (1L, t("2024-01-01 10:00:00")), // exact hit -> event 11 (tie-break)
      (1L, t("2024-01-01 11:59:59")), // between -> still event 11
      (1L, t("2024-01-01 13:00:00")), // after all -> event 12
      (2L, t("2024-01-01 10:00:00")), // user with no events: dropped
      (3L, t("2024-01-01 08:00:00"))) // before all of user 3: dropped
      .toDF("user_id", "probe_ts")
    val got = AsOfJoin.asof(left, right,
        "user_id", "probe_ts", "user_id", "ts", "event_id")
      .toDF("user_id", "probe_ts", "r_user_id", "event_id", "ts")
      .select($"user_id", $"probe_ts", $"event_id")
      .as[(Long, Timestamp, Long)].collect().toSet
    assert(got == Set(
      (1L, t("2024-01-01 10:00:00"), 11L),
      (1L, t("2024-01-01 11:59:59"), 11L),
      (1L, t("2024-01-01 13:00:00"), 12L)))
  }

  test("non-64-bit key/time columns fail at planning, not mid-task") {
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq((1, t("2024-01-01 10:00:00")))
      .toDF("user_id", "probe_ts") // user_id is INT, not BIGINT
    val right = Seq((1L, 10L, t("2024-01-01 09:00:00")))
      .toDF("user_id", "event_id", "ts")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, right, "user_id", "probe_ts", "user_id", "ts", "event_id")
    }
    assert(e.getMessage.contains("bigint or timestamp"), e.getMessage)
  }
}
