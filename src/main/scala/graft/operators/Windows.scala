package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Catalog, Q, QueryPack}
import graft.Dsl._

/** SURVEY.md §2.E — window functions.
  *
  * Scale notes (100 TB posture): every window here is partitioned by a
  * high-cardinality key (customer / user / brand), so window evaluation is a
  * single shuffle on the partition key followed by per-partition sorts — no
  * global single-partition window anywhere in this pack. The one ordered-only
  * window (7-day moving average) runs AFTER a daily pre-aggregation, whose
  * output is |days| rows regardless of input scale.
  *
  * Determinism notes: every `orderBy` inside a window carries a unique
  * tie-breaker key. Windowed double sums go through DECIMAL(18,6) exactly
  * like grouped sums (see [[graft.Dsl]]) — DuckDB evaluates window aggregates
  * with a segment tree whose summation order differs from Spark's sequential
  * accumulation, so raw-double running sums would diverge in the last bits.
  */
object Windows extends QueryPack {

  /** Exact windowed double sum: decimal accumulation is order-free. */
  private def wsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(18,6)"))

  private def winRanking(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Catalog.load(spark, sfDir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("nt4", ntile(4).over(w).cast("long"))
      .orderBy($"o_custkey".asc_nulls_first, $"rn".asc_nulls_first)
  }

  private def winTopnPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Catalog.load(spark, sfDir, "lineitem")
    val part = Catalog.load(spark, sfDir, "part")
    val rev = li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy($"p_brand", $"p_partkey")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
    val w = Window.partitionBy($"p_brand")
      .orderBy($"revenue".desc, $"p_partkey".asc)
    rev.withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .orderBy($"p_brand".asc_nulls_first, $"rn".asc_nulls_first)
  }

  private def winLagLead(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Catalog.load(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
      .withColumn("prev_value", lag($"value", 1).over(w))
      .withColumn("next_type", lead($"event_type", 1).over(w))
      // `div` (integer division): DuckDB's `//` floors identically for the
      // always-nonnegative gaps here.
      .withColumn("gap_s",
        expr("(unix_micros(ts) - unix_micros(lag(ts, 1) over " +
          "(partition by user_id order by ts asc, event_id asc))) div 1000000"))
      .orderBy($"event_id".asc_nulls_first)
  }

  private def winRunningSum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Catalog.load(spark, sfDir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .withColumn("running_spend", wsum($"o_totalprice").over(w).cast("double"))
      .withColumn("order_seq", row_number().over(
        Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate".asc, $"o_orderkey".asc)).cast("long"))
      .orderBy($"o_custkey".asc_nulls_first, $"order_seq".asc_nulls_first)
  }

  private def winMovingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Pre-aggregate to daily totals first (SURVEY §2.E): the window then runs
    // over |days| rows — constant in input scale — so the ordered-only window
    // is safe here and both engines see identical 7-row frames.
    val daily = Catalog.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(dsum($"value").as("daily_val"))
      .withColumn("day_idx",
        datediff($"day".cast("date"), lit("2024-01-01").cast("date")))
    val w = Window.orderBy($"day_idx").rangeBetween(-6, 0)
    daily.select(
        $"day", $"daily_val",
        round(wsum($"daily_val").over(w).cast("double") /
          count(lit(1)).over(w), 4).as("ma7"))
      .orderBy($"day".asc_nulls_first)
  }

  private def winFirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Catalog.load(spark, sfDir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .withColumn("first_prio", first($"o_orderpriority").over(w))
      .withColumn("last_prio", last($"o_orderpriority").over(w))
      .orderBy($"o_custkey".asc_nulls_first, $"o_orderkey".asc_nulls_first)
  }

  private def winSessionIds(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Catalog.load(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts")
      .withColumn("gap_s",
        (unix_micros($"ts") - unix_micros(lag($"ts", 1).over(wOrd))) / lit(1000000L))
      .withColumn("is_new",
        when($"gap_s".isNull || $"gap_s" > 1800, lit(1L)).otherwise(lit(0L)))
      .withColumn("session_id", sum($"is_new").over(wRun))
      .select($"event_id", $"user_id", $"ts", $"session_id")
      .orderBy($"event_id".asc_nulls_first)
  }

  /** IGNORE NULLS window surface (added round 9 close): last-observation-
    * carried-forward, previous non-null, and second non-null per user over a
    * sparsified value column (clicks carry no value). The three ignore-nulls
    * forms — `last`, `lag`, `nth_value` — are the sensor-fill idiom
    * q_ts_gapfill uses on a bounded spine, here demonstrated per-key over
    * the raw event stream (one shuffle on user_id, no spine). Values pass
    * through unchanged — raw doubles are bit-comparable cross-engine.
    */
  private def winIgnoreNulls(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Catalog.load(spark, sfDir, "events")
      .withColumn("v",
        when($"event_type" === "click", lit(null).cast("double"))
          .otherwise($"value"))
      .select($"event_id", $"user_id", $"ts", $"v",
        last($"v", ignoreNulls = true).over(wRun).as("filled"),
        lag($"v", 1, null, ignoreNulls = true).over(w).as("prev_nn"),
        nth_value($"v", 2, ignoreNulls = true).over(wFull).as("second_nn"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** Trailing event-time RANGE frame (added round 10): per event, the
    * same user's activity over the trailing hour [ts − 1 h, ts] — count
    * and decimal-exact value sum via `rangeBetween` on event-time MICROS.
    * The time-window-per-row primitive behind rate features and burst
    * detection; a RANGE frame (unlike ROWS) includes all PEERS at equal
    * timestamps, so ties cannot make the result order-dependent, and the
    * decimal sum is order-free — deterministic without any tie-break
    * column. One shuffle on user_id; frame evaluation is the sliding
    * two-pointer pass over each user's sorted slice, O(events) total.
    */
  private def winTrailing1h(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600000000L, 0L)
    Catalog.load(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts",
        count(lit(1)).over(w).as("n_1h"),
        sum($"value".cast("decimal(18,6)")).over(w).cast("double").as("sum_1h"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** Per-group top-3 via the custom mergeable heap aggregate
    * ([[graft.plans.TopKAgg]], added round 10 batch 2) instead of a window
    * sort — the AGGREGATION answer to top-n-per-group: O(k) state per group
    * rides the ordinary partial → shuffle → final hash-agg path (map-side
    * combine caps the shuffle at k longs per partition per group), where
    * the `row_number()` formulation sorts every group's full row set. The
    * value is PACKED (price-cents·2³³ + orderkey — both exact integers) so
    * ties are impossible, the emitted order is total, and the decode is
    * exact arithmetic; cents/100.0 is the correctly-rounded double of the
    * same 2-decimal rational the parquet value encodes, so the recovered
    * price is bit-identical to the original column on both engines. The
    * ORACLE is the window formulation — the two plans verify each other.
    */
  private def winTopnAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pack = ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long") *
      lit(8589934592L) + $"o_orderkey"
    Catalog.load(spark, sfDir, "orders")
      .select($"o_orderpriority", pack.as("p"))
      .groupBy($"o_orderpriority")
      .agg(expr("graft_topk_agg(p, 3)").as("tops"))
      .select($"o_orderpriority", posexplode($"tops").as(Seq("pos", "pv")))
      .select($"o_orderpriority",
        ($"pos" + 1).cast("long").as("rank"),
        (expr("pv div 8589934592").cast("double") / lit(100.0)).as("price"),
        ($"pv" % lit(8589934592L)).as("o_orderkey"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"rank".asc_nulls_first)
  }

  private val winTopnAggOracle = """
    WITH r AS (
      SELECT o_orderpriority, o_totalprice, o_orderkey,
        row_number() OVER (PARTITION BY o_orderpriority
          ORDER BY o_totalprice DESC, o_orderkey DESC) AS rank
      FROM orders)
    SELECT o_orderpriority, CAST(rank AS BIGINT) AS rank,
      o_totalprice AS price, o_orderkey
    FROM r WHERE rank <= 3
    ORDER BY o_orderpriority ASC NULLS FIRST, rank ASC NULLS FIRST"""

  /** ratio_to_report / share-of-total window (added round 11): each
    * nation's share of its region's customer account balance — the
    * contribution analytic (Oracle's RATIO_TO_REPORT, also the
    * normalization step of every mix/share report). The denominator is
    * an EXACT decimal window sum over the pre-aggregated per-nation
    * frame (25 rows), so the ratio is one double division on identical
    * operands cross-engine; the raw fact pass is a plain
    * map-side-combined agg.
    */
  private def winRatioToReport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perNation = Catalog.load(spark, sfDir, "customer")
      .join(broadcast(Catalog.load(spark, sfDir, "nation")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_regionkey", $"n_name")
      .agg(sum($"c_acctbal".cast("decimal(18,2)")).as("bal"))
    val w = Window.partitionBy($"n_regionkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perNation
      .withColumn("region_bal", sum($"bal").over(w))
      .select($"n_regionkey", $"n_name",
        $"bal".cast("double").as("nation_bal"),
        round($"bal".cast("double") / $"region_bal".cast("double"), 6)
          .as("share"))
      .orderBy($"n_regionkey".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  private val winRatioToReportOracle = """
    WITH pn AS (
      SELECT n_regionkey, n_name,
        sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2)
    SELECT n_regionkey, n_name,
      CAST(bal AS DOUBLE) AS nation_bal,
      round(CAST(bal AS DOUBLE) /
        CAST(sum(bal) OVER (PARTITION BY n_regionkey) AS DOUBLE), 6) AS share
    FROM pn
    ORDER BY n_regionkey ASC NULLS FIRST, n_name ASC NULLS FIRST"""

  override val queries: Vector[Q] = Vector(
    Q("q_win_ratio_to_report", winRatioToReport, Some(winRatioToReportOracle)),
    Q("q_win_topn_agg", winTopnAgg, Some(winTopnAggOracle)),
    Q("q_win_trailing_1h", winTrailing1h, Some("""
      SELECT event_id, user_id, ts,
        count(*) OVER w AS n_1h,
        CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id ASC NULLS FIRST""")),
    Q("q_win_ignore_nulls", winIgnoreNulls, Some("""
      WITH e AS (
        SELECT event_id, user_id, ts,
          CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
        FROM events)
      SELECT event_id, user_id, ts, v,
        last_value(v IGNORE NULLS) OVER wrun AS filled,
        lag(v, 1 IGNORE NULLS) OVER wrun AS prev_nn,
        nth_value(v, 2 IGNORE NULLS) OVER wfull AS second_nn
      FROM e
      WINDOW
        wrun AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wfull AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY event_id ASC NULLS FIRST""")),
    Q("q_win_ranking", winRanking, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(row_number() OVER w AS BIGINT) AS rn,
        CAST(rank() OVER w AS BIGINT) AS rnk,
        CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        CAST(ntile(4) OVER w AS BIGINT) AS nt4
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
      ORDER BY o_custkey ASC NULLS FIRST, rn ASC NULLS FIRST""")),
    Q("q_win_topn_per_group", winTopnPerGroup, Some(s"""
      WITH rev AS (
        SELECT p_brand, p_partkey,
          ${graft.Oracle.dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey),
      ranked AS (
        SELECT *, CAST(row_number() OVER
          (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC) AS BIGINT) AS rn
        FROM rev)
      SELECT p_brand, p_partkey, revenue, rn FROM ranked WHERE rn <= 3
      ORDER BY p_brand ASC NULLS FIRST, rn ASC NULLS FIRST""")),
    Q("q_win_lag_lead", winLagLead, Some("""
      SELECT event_id, user_id, ts, event_type, value,
        lag(value, 1) OVER w AS prev_value,
        lead(event_type, 1) OVER w AS next_type,
        (epoch_us(ts) - epoch_us(lag(ts, 1) OVER w)) // 1000000 AS gap_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      ORDER BY event_id ASC NULLS FIRST""")),
    Q("q_win_running_sum", winRunningSum, Some("""
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        CAST(row_number() OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS BIGINT) AS order_seq
      FROM orders
      ORDER BY o_custkey ASC NULLS FIRST, order_seq ASC NULLS FIRST""")),
    Q("q_win_moving_avg", winMovingAvg, Some("""
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS daily_val,
          datediff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS day_idx
        FROM events GROUP BY 1, 3)
      SELECT day, daily_val,
        round(CAST(sum(CAST(daily_val AS DECIMAL(18,6))) OVER w AS DOUBLE)
              / count(*) OVER w, 4) AS ma7
      FROM daily
      WINDOW w AS (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY day ASC NULLS FIRST""")),
    Q("q_win_first_last", winFirstLast, Some("""
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        first_value(o_orderpriority) OVER w AS first_prio,
        last_value(o_orderpriority) OVER w AS last_prio
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""")),
    Q("q_win_session_ids", winSessionIds, Some("""
      WITH g AS (
        SELECT event_id, user_id, ts,
          (epoch_us(ts) - epoch_us(lag(ts, 1) OVER
            (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))) / 1000000 AS gap_s
        FROM events),
      f AS (
        SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS is_new
        FROM g)
      SELECT event_id, user_id, ts,
        CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM f ORDER BY event_id ASC NULLS FIRST""")),
  )
}
