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

  test("outer mode keeps unmatched probes with null right columns") {
    def t(s: String) = Timestamp.valueOf(s)
    val right = Seq(
      (1L, 10L, t("2024-01-01 10:00:00")),
      (3L, 30L, t("2024-01-01 09:00:00")))
      .toDF("user_id", "event_id", "ts")
    val left = Seq(
      (1L, t("2024-01-01 10:30:00")), // matched -> event 10
      (2L, t("2024-01-01 10:00:00")), // no events for user: kept, nulls
      (3L, t("2024-01-01 08:00:00"))) // before all of user 3: kept, nulls
      .toDF("user_id", "probe_ts")
    val got = AsOfJoin.asof(left, right,
        "user_id", "probe_ts", "user_id", "ts", "event_id", outer = true)
      .toDF("user_id", "probe_ts", "r_user_id", "event_id", "ts")
      .select($"user_id", $"probe_ts", $"event_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got == Set(
      (1L, t("2024-01-01 10:30:00"), Some(10L)),
      (2L, t("2024-01-01 10:00:00"), None),
      (3L, t("2024-01-01 08:00:00"), None)))
    // The outer output must advertise nullable right columns.
    val schema = AsOfJoin.asof(left, right,
      "user_id", "probe_ts", "user_id", "ts", "event_id", outer = true).schema
    assert(schema.fields.drop(2).forall(_.nullable))
  }

  test("q_join_asof_outer matches = inner result; unmatched = the complement") {
    val outer = SparkEntry.queries("q_join_asof_outer")(spark, sf0001).cache()
    val matched = outer.filter($"matched")
      .select($"user_id", $"probe_ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    // Recompute the inner form over the same probe grid.
    val e = Catalog.load(spark, sf0001, "events")
      .select($"user_id", $"event_id", $"ts")
    val probes = e.select($"user_id").distinct()
      .withColumn("probe_ts", explode(array(
        lit("2024-01-01 12:00:00").cast("timestamp"),
        lit("2024-01-15").cast("timestamp"))))
    val inner = AsOfJoin.asof(probes, e,
        "user_id", "probe_ts", "user_id", "ts", "event_id")
      .toDF("user_id", "probe_ts", "r_user_id", "event_id", "ts")
      .select($"user_id", $"probe_ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(matched == inner && matched.nonEmpty)
    // Outer covers the full probe grid: one row per (user, probe).
    assert(outer.count() == probes.count())
    assert(outer.filter(!$"matched").count() > 0)
  }

  test("nearest mode equals the composed |Δt| window form on the fixture table") {
    import graft.plans.AsOfMode
    val e = Catalog.load(spark, sf0001, "events")
      .select($"user_id", $"event_id", $"ts")
    val probes = e.select($"user_id").distinct()
      .withColumn("probe_ts", explode(array(
        lit("2024-01-08").cast("timestamp"),
        lit("2024-01-15").cast("timestamp"),
        lit("2024-01-22").cast("timestamp"))))
    val custom = AsOfJoin.asof(probes, e,
        "user_id", "probe_ts", "user_id", "ts", "event_id", AsOfMode.Nearest)
      .toDF("user_id", "probe_ts", "r_user_id", "event_id", "ts")
      .select($"user_id", $"probe_ts", $"event_id", $"ts")
      .orderBy($"user_id", $"probe_ts")
      .as[(Long, Timestamp, Long, Timestamp)].collect().toSeq
    val dt = abs(unix_micros($"ts") - unix_micros($"probe_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"probe_ts")
      .orderBy(dt.asc, $"ts".asc, $"event_id".asc)
    val composed = probes.join(e, Seq("user_id"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"probe_ts", $"event_id", $"ts")
      .orderBy($"user_id", $"probe_ts")
      .as[(Long, Timestamp, Long, Timestamp)].collect().toSeq
    assert(custom.nonEmpty && custom == composed)
  }

  test("nearest semantics on a literal fixture: side choice and tie-breaks") {
    import graft.plans.AsOfMode
    def t(s: String) = Timestamp.valueOf(s)
    val right = Seq(
      (1L, 10L, t("2024-01-01 10:00:00")),
      (1L, 11L, t("2024-01-01 10:00:00")), // same ts: LOWEST event_id wins
      (1L, 12L, t("2024-01-01 12:00:00")),
      (3L, 30L, t("2024-01-01 09:00:00")))
      .toDF("user_id", "event_id", "ts")
    val left = Seq(
      (1L, t("2024-01-01 10:00:00")), // dt=0 -> event 10 (lowest tie at ts)
      (1L, t("2024-01-01 11:00:00")), // equidistant 10:00/12:00 -> past (10)
      (1L, t("2024-01-01 11:30:00")), // closer to 12:00 -> event 12
      (1L, t("2024-01-01 13:00:00")), // after all -> backward match (12)
      (2L, t("2024-01-01 10:00:00")), // user with no events: dropped
      (3L, t("2024-01-01 08:00:00"))) // before all of user 3: FORWARD match
      .toDF("user_id", "probe_ts")
    val got = AsOfJoin.asof(left, right,
        "user_id", "probe_ts", "user_id", "ts", "event_id", AsOfMode.Nearest)
      .toDF("user_id", "probe_ts", "r_user_id", "event_id", "ts")
      .select($"user_id", $"probe_ts", $"event_id")
      .as[(Long, Timestamp, Long)].collect().toSet
    assert(got == Set(
      (1L, t("2024-01-01 10:00:00"), 10L),
      (1L, t("2024-01-01 11:00:00"), 10L),
      (1L, t("2024-01-01 11:30:00"), 12L),
      (1L, t("2024-01-01 13:00:00"), 12L),
      (3L, t("2024-01-01 08:00:00"), 30L)))
  }

  test("q_join_asof_nearest plans the custom exec") {
    val plan = SparkEntry.queries("q_join_asof_nearest")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"custom exec missing:\n$plan")
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
