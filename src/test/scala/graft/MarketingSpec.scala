package graft

import org.apache.spark.sql.functions._

import graft.operators.Marketing

/** Semantic checks for the marketing-ETL pack (SURVEY §2.L) on the sf0.001
  * fixture plus hand-verifiable invariants — the DuckDB oracle covers value
  * equality; these pin the SEMANTICS (funnel ordering, island maximality,
  * SCD2 validity chaining, MERGE action partitioning) independently.
  */
class MarketingSpec extends SparkTestBase {
  import spark.implicits._

  private def q(id: String) =
    SparkEntry.queries(id)(spark, sf0001).cache()

  test("funnel stages are ordered and monotone") {
    val f = q("q_funnel_steps")
    // Stage k implies timestamps t_view < t_click < t_purchase up to k.
    assert(f.filter($"stage" >= 2 && ($"t_click" <= $"t_view")).count() == 0)
    assert(f.filter($"stage" === 3 && ($"t_purchase" <= $"t_click")).count() == 0)
    // Stage encodes exactly which timestamps are present.
    assert(f.filter($"stage" === 1 && $"t_click".isNotNull).count() == 0)
    assert(f.filter($"stage" === 2 && ($"t_click".isNull || $"t_purchase".isNotNull)).count() == 0)
    assert(f.filter($"stage" === 3 && $"t_purchase".isNull).count() == 0)
    // Every user with a view event appears exactly once.
    val viewers = Catalog.load(spark, sf0001, "events")
      .filter($"event_type" === "view").select($"user_id").distinct().count()
    assert(f.count() == viewers)
  }

  test("retention cohort (week 0) counts every cohort member; offsets non-negative") {
    val r = q("q_retention_cohorts")
    assert(r.filter($"week_offset" < 0).count() == 0)
    // At offset 0 every user of the cohort is active (their first event is
    // in that week), so sum over offset-0 rows = total distinct users.
    val week0 = r.filter($"week_offset" === 0)
      .agg(sum($"active_users")).as[Long].head()
    val users = Catalog.load(spark, sf0001, "events")
      .select($"user_id").distinct().count()
    assert(week0 == users)
    // Retention never exceeds the cohort's week-0 size.
    val bad = r.as("a").join(r.filter($"week_offset" === 0).as("z"), "cohort_week")
      .filter($"a.active_users" > $"z.active_users").count()
    assert(bad == 0)
  }

  test("streak islands are maximal, disjoint, and cover all active days") {
    val s = q("q_streak_islands")
    // Length matches the day span (consecutive days, inclusive).
    val spanBad = s.filter(
      datediff($"streak_end".cast("date"), $"streak_start".cast("date"))
        =!= $"streak_days" - 1).count()
    assert(spanBad == 0)
    // Islands of one user never touch or overlap (gap of >= 2 days between
    // consecutive islands — a 1-day gap would have merged them).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"streak_start".asc)
    val touching = s
      .withColumn("prev_end", lag($"streak_end", 1).over(w))
      .filter($"prev_end".isNotNull &&
        datediff($"streak_start".cast("date"), $"prev_end".cast("date")) < 2)
      .count()
    assert(touching == 0)
    // Total streak days = distinct (user, day) pairs.
    val activeDays = Catalog.load(spark, sf0001, "events")
      .select($"user_id", date_trunc("day", $"ts").as("day")).distinct().count()
    assert(s.agg(sum($"streak_days")).as[Long].head() == activeDays)
  }

  test("merge-upsert actions partition the key space") {
    val m = q("q_merge_upsert")
    // Keys are unique after the merge.
    assert(m.select($"custkey").distinct().count() == m.count())
    // Inserted rows are exactly the delta keys missing from the base.
    val inserted = m.filter($"action" === "I")
    assert(inserted.filter($"custkey" % 3 =!= 0).count() == 0)
    assert(inserted.filter(!$"name".startsWith("NEW#")).count() == 0)
    // Kept rows carry the base balance untouched; updated rows exceed it
    // whenever the delta spend is positive (o_totalprice > 0 always).
    val base = Catalog.load(spark, sf0001, "customer")
      .filter($"c_custkey" % 3 =!= 0)
      .select($"c_custkey".as("custkey"), $"c_acctbal")
    val kept = m.filter($"action" === "K").join(base, "custkey")
    assert(kept.filter(abs($"balance" - $"c_acctbal") > 1e-9).count() == 0)
    val updated = m.filter($"action" === "U").join(base, "custkey")
    assert(updated.filter($"balance" <= $"c_acctbal").count() == 0)
  }

  test("scd2 versions chain: valid_to = next valid_from, one current row per user") {
    val h = q("q_scd2_history")
    // Exactly one open-ended (current) version per user.
    val currents = h.filter($"is_current")
      .groupBy($"user_id").count().filter($"count" =!= 1).count()
    assert(currents == 0)
    val openEnded = h.filter($"valid_to".isNull && !$"is_current").count()
    assert(openEnded == 0)
    // Versions are dense from 1 and validity intervals chain exactly.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"version".asc)
    val chained = h
      .withColumn("next_from", lead($"valid_from", 1).over(w))
      .withColumn("next_ver", lead($"version", 1).over(w))
    assert(chained.filter($"next_ver".isNotNull &&
      $"next_ver" =!= $"version" + 1).count() == 0)
    assert(chained.filter($"next_from".isNotNull &&
      $"valid_to" =!= $"next_from").count() == 0)
    assert(h.filter($"version" === 1).count() ==
      h.select($"user_id").distinct().count())
  }

  test("pack registration: 19 queries, all with oracles") {
    assert(Marketing.queries.map(_.id).toSet == Set(
      "q_funnel_steps", "q_retention_cohorts", "q_streak_islands",
      "q_merge_upsert", "q_scd2_history", "q_session_stats",
      "q_cdc_apply", "q_basket_pairs", "q_basket_rules", "q_seq_pattern",
      "q_attribution", "q_attribution_markov", "q_snapshot_diff",
      "q_scd2_compact", "q_marketing_engagement_decay",
      "q_path_transitions", "q_survival_km", "q_cohort_ltv",
      "q_funnel_window"))
    assert(Marketing.queries.forall(_.oracle.isDefined))
  }
}
