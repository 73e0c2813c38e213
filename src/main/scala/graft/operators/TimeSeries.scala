package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Catalog, Oracle, Q, QueryPack}
import graft.Dsl._

/** SURVEY.md §2.N — time-series depth (added round 5): calendar-spine
  * gap-fill, linear interpolation over gaps, RANGE-frame trailing windows,
  * and a finite-horizon EWMA.
  *
  * Scale notes (100 TB posture):
  *  - The calendar spine is bounded by CALENDAR LENGTH (|days| rows from one
  *    `sequence()` over the min/max bounds), never by data volume: at 100 TB
  *    the spine is still ~2.4k rows and every spine join broadcasts. The
  *    big side is always the pre-aggregated daily table, whose size is
  *    |days × dims| regardless of raw row count.
  *  - Interpolation and EWMA run ordered-only windows over that bounded
  *    daily series (same justification as q_win_moving_avg: the window input
  *    is |days| rows post-aggregation, not the raw table, so the single
  *    ordered partition holds ~2.4k rows at any scale factor).
  *  - The RANGE-frame trailing spend partitions by `o_custkey`
  *    (high-cardinality) and orders by an epoch-day integer — one hash
  *    shuffle, per-customer frames evaluated with Spark's sliding
  *    window-frame machinery; no self-join, no spine needed.
  *  - Window sums go through DECIMAL(18,6) (Dsl rule): DuckDB evaluates
  *    window aggregates with a segment tree whose double-summation order
  *    differs from Spark's sequential accumulation — decimal addition is
  *    exact and order-free, so both engines recover the same value.
  */
object TimeSeries extends QueryPack {

  /** Daily (day × priority) order counts/revenue with missing cells filled
    * with zeros from a generated calendar spine × dimension grid.
    */
  private def gapfill(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Catalog.load(spark, sfDir, "orders")
      .select(date_trunc("day", $"o_orderdate").as("day"),
        $"o_orderpriority", $"o_totalprice")
    val spine = o.agg(min($"day").as("d0"), max($"day").as("d1"))
      .select(explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
    val dims = o.select($"o_orderpriority").distinct()
    val daily = o.groupBy($"day", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
    // spine × dims is |days × priorities| (tiny, data-independent) — it is
    // the BUILD side; the probe side `daily` is already aggregated.
    spine.crossJoin(broadcast(dims))
      .join(daily, Seq("day", "o_orderpriority"), "left")
      .select($"day", $"o_orderpriority",
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"revenue", lit(0.0)).as("revenue"))
      .orderBy($"day".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  private val gapfillOracle = s"""
    WITH o AS (
      SELECT date_trunc('day', o_orderdate) AS day, o_orderpriority, o_totalprice
      FROM orders),
    b AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
    spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM b),
    dims AS (SELECT DISTINCT o_orderpriority FROM o),
    daily AS (
      SELECT day, o_orderpriority, count(*) AS n_orders,
             ${Oracle.dsum("o_totalprice")} AS revenue
      FROM o GROUP BY day, o_orderpriority)
    SELECT s.day, dims.o_orderpriority,
           coalesce(d.n_orders, 0) AS n_orders,
           coalesce(d.revenue, 0.0) AS revenue
    FROM spine s CROSS JOIN dims
    LEFT JOIN daily d ON d.day = s.day AND d.o_orderpriority = dims.o_orderpriority
    ORDER BY s.day ASC NULLS FIRST, dims.o_orderpriority ASC NULLS FIRST"""

  /** Linear interpolation of gap days in the URGENT daily-revenue series:
    * actual value where present, linear between bracketing observations in
    * interior gaps, nearest-observation hold at the edges. The two
    * ignore-nulls window scans are over the bounded |days| spine.
    */
  private def interpolate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Catalog.load(spark, sfDir, "orders")
      .select(date_trunc("day", $"o_orderdate").as("day"),
        $"o_orderpriority", $"o_totalprice")
    val spine = o.agg(min($"day").as("d0"), max($"day").as("d1"))
      .select(explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
    val daily = o.filter($"o_orderpriority" === "1-URGENT")
      .groupBy($"day").agg(dsum($"o_totalprice").as("rev"))
    val di = datediff($"day", to_date(lit("1970-01-01"))).cast("long")
    val joined = spine.join(daily, Seq("day"), "left")
      .select($"day", di.as("di"), $"rev",
        when($"rev".isNotNull, di).as("obs_di"))
    val wPrev = Window.orderBy($"di".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.orderBy($"di".asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val stepped = joined
      .withColumn("prev_rev", last($"rev", ignoreNulls = true).over(wPrev))
      .withColumn("prev_di", last($"obs_di", ignoreNulls = true).over(wPrev))
      .withColumn("next_rev", first($"rev", ignoreNulls = true).over(wNext))
      .withColumn("next_di", first($"obs_di", ignoreNulls = true).over(wNext))
    // Identical arithmetic shape on both sides: prev + (next-prev) * (dt/dT).
    val interp = $"prev_rev" + ($"next_rev" - $"prev_rev") *
      (($"di" - $"prev_di").cast("double") / ($"next_di" - $"prev_di").cast("double"))
    stepped.select($"day", $"rev",
        when($"rev".isNotNull, $"rev")
          .when($"prev_rev".isNotNull && $"next_rev".isNotNull, interp)
          .otherwise(coalesce($"prev_rev", $"next_rev")).as("rev_filled"),
        when($"rev".isNotNull, lit("actual"))
          .when($"prev_rev".isNotNull && $"next_rev".isNotNull, lit("interp"))
          .otherwise(lit("edge")).as("fill_kind"))
      .orderBy($"day".asc_nulls_first)
  }

  private val interpolateOracle = s"""
    WITH o AS (
      SELECT date_trunc('day', o_orderdate) AS day, o_orderpriority, o_totalprice
      FROM orders),
    b AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
    spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM b),
    daily AS (
      SELECT day, ${Oracle.dsum("o_totalprice")} AS rev
      FROM o WHERE o_orderpriority = '1-URGENT' GROUP BY day),
    j AS (
      SELECT s.day, date_diff('day', DATE '1970-01-01', CAST(s.day AS DATE)) AS di,
             d.rev,
             CASE WHEN d.rev IS NOT NULL
                  THEN date_diff('day', DATE '1970-01-01', CAST(s.day AS DATE)) END AS obs_di
      FROM spine s LEFT JOIN daily d ON d.day = s.day),
    st AS (
      SELECT day, di, rev,
        last_value(rev IGNORE NULLS) OVER
          (ORDER BY di ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_rev,
        last_value(obs_di IGNORE NULLS) OVER
          (ORDER BY di ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_di,
        first_value(rev IGNORE NULLS) OVER
          (ORDER BY di ASC ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_rev,
        first_value(obs_di IGNORE NULLS) OVER
          (ORDER BY di ASC ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_di
      FROM j)
    SELECT day, rev,
      CASE WHEN rev IS NOT NULL THEN rev
           WHEN prev_rev IS NOT NULL AND next_rev IS NOT NULL
             THEN prev_rev + (next_rev - prev_rev) *
                  (CAST(di - prev_di AS DOUBLE) / CAST(next_di - prev_di AS DOUBLE))
           ELSE coalesce(prev_rev, next_rev) END AS rev_filled,
      CASE WHEN rev IS NOT NULL THEN 'actual'
           WHEN prev_rev IS NOT NULL AND next_rev IS NOT NULL THEN 'interp'
           ELSE 'edge' END AS fill_kind
    FROM st
    ORDER BY day ASC NULLS FIRST"""

  /** Trailing 90-day spend per customer via a RANGE frame over an epoch-day
    * integer sort key — value-based frames (peers included by VALUE distance,
    * not row count), partitioned on the high-cardinality customer key.
    */
  private def rangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Catalog.load(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        datediff(to_date($"o_orderdate"), to_date(lit("1970-01-01")))
          .cast("long").as("di"))
    val w = Window.partitionBy($"o_custkey").orderBy($"di".asc)
      .rangeBetween(-89, Window.currentRow)
    o.select($"o_orderkey", $"o_custkey", $"di",
        count(lit(1)).over(w).as("n_orders_90d"),
        sum($"o_totalprice".cast("decimal(18,6)")).over(w).cast("double")
          .as("spend_90d"))
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  private val rangeFrameOracle = """
    SELECT o_orderkey, o_custkey,
      date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS di,
      count(*) OVER w AS n_orders_90d,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS spend_90d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) ASC
                 RANGE BETWEEN 89 PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey ASC NULLS FIRST"""

  private val EwmaTerms = 14

  /** Finite-horizon EWMA (alpha = 0.5, 14 terms) over the global daily
    * revenue series. Weights 0.5^k are exactly representable doubles, each
    * product is an exact binary scaling, and both engines evaluate the same
    * left-associated sum — bit-identical without rounding. Missing leading
    * terms (series start) drop out of numerator AND denominator.
    */
  private def ewma(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(dsum($"o_totalprice").as("rev"))
    val w = Window.orderBy($"day".asc)
    val lagged = daily.select($"day" +: $"rev" +:
      (0 until EwmaTerms).map(k => lag($"rev", k).over(w).as(s"x$k")): _*)
    val num = (0 until EwmaTerms).map { k =>
      when(col(s"x$k").isNotNull, col(s"x$k") * lit(math.pow(0.5, k)))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    val den = (0 until EwmaTerms).map { k =>
      when(col(s"x$k").isNotNull, lit(math.pow(0.5, k))).otherwise(lit(0.0))
    }.reduce(_ + _)
    lagged.select($"day", $"rev", (num / den).as("ewma"))
      .orderBy($"day".asc_nulls_first)
  }

  private val ewmaOracle: String = {
    val lags = (0 until EwmaTerms)
      .map(k => s"lag(rev, $k) OVER (ORDER BY day ASC) AS x$k").mkString(",\n        ")
    def wLit(k: Int) = new java.math.BigDecimal(math.pow(0.5, k)).toPlainString
    val num = (0 until EwmaTerms)
      .map(k => s"(CASE WHEN x$k IS NOT NULL THEN x$k * CAST('${wLit(k)}' AS DOUBLE) ELSE 0.0 END)")
      .mkString(" + ")
    val den = (0 until EwmaTerms)
      .map(k => s"(CASE WHEN x$k IS NOT NULL THEN CAST('${wLit(k)}' AS DOUBLE) ELSE 0.0 END)")
      .mkString(" + ")
    s"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             ${Oracle.dsum("o_totalprice")} AS rev
      FROM orders GROUP BY 1),
    lagged AS (
      SELECT day, rev,
        $lags
      FROM daily)
    SELECT day, rev, ($num) / ($den) AS ewma
    FROM lagged
    ORDER BY day ASC NULLS FIRST"""
  }

  /** Trailing z-score anomaly flags over the global daily revenue series:
    * each day scored against the mean/std of the PRECEDING 28 observations
    * (current day excluded — an outlier must not dilute its own baseline).
    * Mean/std derive from decimal moment sums in the window (order-free),
    * so z is the same IEEE expression on both engines; days with fewer than
    * 8 history points or zero variance get a null z.
    */
  private def anomaly(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(dsum($"o_totalprice").as("rev"))
    val w = Window.orderBy($"day".asc).rowsBetween(-28, -1)
    val revDec = $"rev".cast("decimal(18,6)")
    val scored = daily.select($"day", $"rev",
      count($"rev").over(w).as("n_hist"),
      sum(revDec).over(w).cast("double").as("s1"),
      sum((revDec * revDec).cast("decimal(38,12)")).over(w).cast("double").as("s2"))
    val mean = $"s1" / $"n_hist".cast("double")
    val variance = $"s2" / $"n_hist".cast("double") - mean * mean
    val std = sqrt(greatest(variance, lit(0.0)))
    scored.select($"day", $"rev", $"n_hist",
        when($"n_hist" >= 8, ($"rev" - mean) / nullif(std, lit(0.0)))
          .as("z"))
      .withColumn("is_anomaly", coalesce(abs($"z") > 2.0, lit(false)))
      .orderBy($"day".asc_nulls_first)
  }

  private val anomalyOracle = s"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             ${Oracle.dsum("o_totalprice")} AS rev
      FROM orders GROUP BY 1),
    scored AS (
      SELECT day, rev,
        count(rev) OVER w AS n_hist,
        CAST(CAST(sum(CAST(rev AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE) AS s1,
        -- DECIMAL(19,6) inputs force DuckDB's int128 multiply (the 18-digit
        -- form multiplies int64 significands and overflows); 19+19 = 38 stays
        -- within the precision cap and the exact product equals Spark's
        -- DECIMAL(18,6) x DECIMAL(18,6).
        CAST(CAST(sum(CAST(CAST(rev AS DECIMAL(19,6)) * CAST(rev AS DECIMAL(19,6))
          AS DECIMAL(38,12))) OVER w AS VARCHAR) AS DOUBLE) AS s2
      FROM daily
      WINDOW w AS (ORDER BY day ASC ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)),
    z AS (
      SELECT day, rev, n_hist,
        CASE WHEN n_hist >= 8 THEN
          (rev - s1 / CAST(n_hist AS DOUBLE)) /
          nullif(sqrt(greatest(
            s2 / CAST(n_hist AS DOUBLE) -
              (s1 / CAST(n_hist AS DOUBLE)) * (s1 / CAST(n_hist AS DOUBLE)),
            0.0)), 0.0)
        END AS z
      FROM scored)
    SELECT day, rev, n_hist, z, coalesce(abs(z) > 2.0, false) AS is_anomaly
    FROM z
    ORDER BY day ASC NULLS FIRST"""

  /** Robust MAD outlier flags (added round 9 close): the median-based twin
    * of q_ts_anomaly's trailing z-score — each day of the global daily
    * revenue series scored against the FULL series' median via the median
    * absolute deviation, flag at the standard 3σ-equivalent (3 × 1.4826 ×
    * MAD, folded to the 4.4478 literal so both engines share one product
    * shape). Robust scoring is what an alerting run uses when the series
    * itself contains the outliers the mean/std would absorb.
    *
    * Scale: the series is the bounded |days| aggregate; both medians are
    * interpolating exact percentiles over it (1-row plans broadcast back),
    * so nothing data-sized crosses an exchange after the first aggregate.
    * Both engines compute identical doubles: same daily rev (decimal-sum
    * convention), same (a+b)/2 median interpolation, same product shapes.
    */
  private def outlierMad(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(dsum($"o_totalprice").as("rev"))
    val med = daily.agg(expr("percentile(rev, 0.5D)").as("med"))
    val dev = daily.crossJoin(broadcast(med))
      .select($"day", $"rev", abs($"rev" - $"med").as("dev"))
    val mad = dev.agg(expr("percentile(dev, 0.5D)").as("mad"))
    dev.crossJoin(broadcast(mad))
      .select($"day", $"rev",
        round($"dev", 4).as("dev_r"),
        round($"dev" / nullif(lit(1.4826) * $"mad", lit(0.0)), 4).as("robust_z"),
        ($"dev" > lit(4.4478) * $"mad").as("is_outlier"))
      .orderBy($"day".asc_nulls_first)
  }

  private val outlierMadOracle = s"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             ${Oracle.dsum("o_totalprice")} AS rev
      FROM orders GROUP BY 1),
    m AS (SELECT quantile_cont(rev, 0.5) AS med FROM daily),
    d AS (
      SELECT day, rev, abs(rev - (SELECT med FROM m)) AS dev FROM daily),
    md AS (SELECT quantile_cont(dev, 0.5) AS mad FROM d)
    SELECT day, rev, round(dev, 4) AS dev_r,
      round(dev / nullif(1.4826 * (SELECT mad FROM md), 0.0), 4) AS robust_z,
      dev > 4.4478 * (SELECT mad FROM md) AS is_outlier
    FROM d ORDER BY day ASC NULLS FIRST"""

  /** Rolling 7-day distinct active users (WAU) per day. Spark has no
    * `count(DISTINCT) OVER`, and a `collect_set` window would funnel a
    * data-sized (day × user) table through one ordered partition — instead
    * each (user, active-day) pair is EXPANDED to the ≤7 trailing days it
    * keeps the user "active" for, then deduped and counted: three hash
    * shuffles, no window, fan-out bounded by the window length. (The same
    * expansion trick as the sliding-window oracle.)
    *
    * When to pick expansion vs per-day re-aggregation: expansion costs
    * O(|pairs| × window) rows through hash shuffles — right for SHORT
    * windows (here 7×). Re-aggregating from scratch per day (join days ×
    * trailing pairs) costs O(|days| × avg pairs/window) and wins only when
    * the window is long relative to the data's day span. A sketch
    * (approx_count_distinct over merged HLLs) is the 100 TB answer when
    * exactness is negotiable; this operator's contract is exact.
    */
  private def rollingDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dayUser = Catalog.load(spark, sfDir, "events")
      .select(datediff(to_date($"ts"), to_date(lit("1970-01-01")))
        .cast("long").as("di"), $"user_id")
      .distinct()
    val bounds = dayUser.agg(min($"di").as("d0"), max($"di").as("d1"))
    dayUser
      .select($"user_id", explode(sequence($"di", $"di" + 6)).as("d"))
      .distinct()
      .crossJoin(broadcast(bounds))
      .filter($"d" <= $"d1")
      .groupBy($"d")
      // (user, d) is already deduped above — a plain count IS the distinct
      // count, without a second dedup shuffle.
      .agg(count(lit(1)).as("wau"))
      .select(
        to_timestamp(date_add(to_date(lit("1970-01-01")), $"d".cast("int")))
          .as("day"),
        $"wau")
      .orderBy($"day".asc_nulls_first)
  }

  private val rollingDistinctOracle = """
    WITH du AS (
      SELECT DISTINCT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
             user_id
      FROM events),
    b AS (SELECT min(di) AS d0, max(di) AS d1 FROM du),
    expanded AS (
      SELECT DISTINCT user_id, di + i AS d
      FROM du CROSS JOIN range(7) t(i))
    SELECT CAST(CAST(DATE '1970-01-01' + CAST(e.d AS INTEGER) AS DATE) AS TIMESTAMP) AS day,
           count(DISTINCT e.user_id) AS wau
    FROM expanded e CROSS JOIN b
    WHERE e.d <= b.d1
    GROUP BY e.d
    ORDER BY day ASC NULLS FIRST"""

  /** Cumulative unique users to date, per day — the scale-correct running
    * distinct count: each user contributes on their FIRST-SEEN day (one hash
    * agg), then a running sum over the bounded |days| series. A windowed
    * `collect_set` would carry the whole user universe per row; first-touch
    * reduces the window input to |days| rows regardless of user count.
    */
  private def cumulativeDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val firstSeen = Catalog.load(spark, sfDir, "events")
      .groupBy($"user_id")
      .agg(min(date_trunc("day", $"ts")).as("day"))
      .groupBy($"day").agg(count(lit(1)).as("new_users"))
    val allDays = Catalog.load(spark, sfDir, "events")
      .select(date_trunc("day", $"ts").as("day")).distinct()
    val w = Window.orderBy($"day".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    allDays.join(firstSeen, Seq("day"), "left")
      .select($"day", coalesce($"new_users", lit(0L)).as("new_users"))
      .withColumn("cum_users", sum($"new_users").over(w))
      .orderBy($"day".asc_nulls_first)
  }

  private val cumulativeDistinctOracle = """
    WITH fs AS (
      SELECT user_id, min(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS day
      FROM events GROUP BY user_id),
    nu AS (SELECT day, count(*) AS new_users FROM fs GROUP BY day),
    days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events)
    SELECT d.day, coalesce(nu.new_users, 0) AS new_users,
      CAST(sum(coalesce(nu.new_users, 0)) OVER (ORDER BY d.day ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
    FROM days d LEFT JOIN nu ON nu.day = d.day
    ORDER BY d.day ASC NULLS FIRST"""

  /** Weekly OHLC downsampling of the global daily revenue series — the
    * resolution-reduction op every time-series store ships (candlestick
    * bars / Gorilla-style rollups). open/close are the values at the
    * week's first/last day (`min_by`/`max_by` ↔ DuckDB `arg_min`/`arg_max`
    * — deterministic because `day` is unique after the daily aggregation),
    * high/low are plain extrema. Scale: the daily pre-aggregation is the
    * only pass over raw data; the OHLC agg runs over |days| rows.
    */
  private def downsampleOhlc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(dsum($"o_totalprice").as("rev"))
    daily
      // cast("date"): DuckDB 1.0's date_trunc('week') returns DATE, Spark's
      // returns TIMESTAMP — align the declared output type (same instant).
      .groupBy(date_trunc("week", $"day").cast("date").as("week"))
      .agg(
        count(lit(1)).as("n_days"),
        min_by($"rev", $"day").as("open"),
        max($"rev").as("high"),
        min($"rev").as("low"),
        max_by($"rev", $"day").as("close"))
      .orderBy($"week".asc_nulls_first)
  }

  private val downsampleOhlcOracle = s"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
        ${Oracle.dsum("o_totalprice")} AS rev
      FROM orders GROUP BY 1)
    SELECT date_trunc('week', day) AS week,
      count(*) AS n_days,
      arg_min(rev, day) AS open,
      max(rev) AS high,
      min(rev) AS low,
      arg_max(rev, day) AS close
    FROM daily GROUP BY 1 ORDER BY week ASC NULLS FIRST"""

  /** Classical seasonal decomposition of the daily revenue series (added
    * round 9): trend = centered 7-day moving average (full windows only),
    * seasonal = per-day-of-week mean of the detrended series, residual =
    * what's left. The moving-average decomposition every monitoring stack
    * runs before alerting on the residual (q_ts_anomaly's z-score is the
    * sibling one-pass form).
    *
    * Determinism: the trend window sums DECIMAL(18,6) day revenues (exact,
    * order-free) and only then casts to double for the /7 — per-row IEEE,
    * engine-identical. The seasonal mean uses the davg pattern over
    * detrended values; those carry a /7 quotient so they sit far from
    * decimal rounding boundaries (the Dsl §r4 precondition). Scale: one
    * pass over raw rows for the daily aggregate; everything after runs
    * over |days| rows, and the seasonal table (7 rows) broadcasts back.
    */
  /** The classical-decomposition frame shared by [[tsDecompose]] and
    * [[tsSeasonalStrength]]: per day, revenue / centered-7 trend / dow
    * seasonal mean / residual. */
  private def decomposed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(sum($"o_totalprice".cast("decimal(18,6)")).as("rev_d"))
    val w7 = Window.orderBy($"day").rowsBetween(-3, 3)
    val t = daily.select(
        $"day",
        $"rev_d".cast("double").as("revenue"),
        when(count(lit(1)).over(w7) === 7,
          sum($"rev_d").over(w7).cast("double") / 7).as("trend"),
        // DuckDB's dayofweek is 0-based Sunday, Spark's is 1-based.
        (dayofweek($"day") - 1).cast("long").as("dow"))
      .withColumn("detrended", $"revenue" - $"trend")
    val seasonal = t.filter($"detrended".isNotNull)
      .groupBy($"dow")
      .agg(round(sum($"detrended".cast("decimal(18,6)")).cast("double")
        / count($"detrended"), 4).as("seasonal"))
    t.join(broadcast(seasonal), Seq("dow"), "left")
      .select($"day", $"revenue", $"trend", $"dow", $"seasonal",
        ($"detrended" - $"seasonal").as("residual"))
  }

  private def tsDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decomposed(spark, sfDir).orderBy($"day".asc_nulls_first)
  }

  private val tsDecomposeOracle = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_d
      FROM orders GROUP BY 1),
    t AS (
      SELECT day,
        CAST(rev_d AS DOUBLE) AS revenue,
        CASE WHEN count(*) OVER w = 7
          THEN CAST(sum(rev_d) OVER w AS DOUBLE) / 7 END AS trend,
        CAST(dayofweek(day) AS BIGINT) AS dow
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    t2 AS (SELECT *, revenue - trend AS detrended FROM t),
    seas AS (
      SELECT dow,
        round(CAST(sum(CAST(detrended AS DECIMAL(18,6))) AS DOUBLE)
          / count(detrended), 4) AS seasonal
      FROM t2 WHERE detrended IS NOT NULL GROUP BY dow)
    SELECT t2.day, t2.revenue, t2.trend, t2.dow, s.seasonal,
      t2.detrended - s.seasonal AS residual
    FROM t2 LEFT JOIN seas s USING (dow)
    ORDER BY t2.day ASC NULLS FIRST"""

  /** Seasonal-naive forecast backtest (added round 10 close): the baseline
    * every forecasting pipeline must beat — predict each day's revenue as
    * the SAME WEEKDAY last week (lag 7) vs the plain naive lag-1, with
    * per-day absolute errors and the per-day model pick. All inputs are
    * the decimal-exact daily sums (bit-identical doubles both engines), so
    * subtraction/abs/comparison are identical IEEE ops — no rounding
    * anywhere. Days without a full seasonal history are excluded (the
    * backtest convention), so both models are always defined.
    *
    * Scale: the window runs over the BOUNDED |days| daily series (the
    * documented global-series exception — see q_ts_decompose); the only
    * pass over raw rows is the daily pre-aggregation.
    */
  private def tsForecastSnaive(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(sum($"o_totalprice".cast("decimal(18,6)")).as("rev_d"))
    val w = Window.orderBy($"day".asc)
    daily.select(
        $"day",
        $"rev_d".cast("double").as("actual"),
        lag($"rev_d", 7).over(w).cast("double").as("fcst_snaive"),
        lag($"rev_d", 1).over(w).cast("double").as("fcst_naive"))
      .filter($"fcst_snaive".isNotNull)
      .select($"day", $"actual", $"fcst_snaive", $"fcst_naive",
        abs($"actual" - $"fcst_snaive").as("err_snaive"),
        abs($"actual" - $"fcst_naive").as("err_naive"),
        (abs($"actual" - $"fcst_snaive") <= abs($"actual" - $"fcst_naive"))
          .as("snaive_wins"))
      .orderBy($"day".asc_nulls_first)
  }

  private val tsForecastSnaiveOracle = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_d
      FROM orders GROUP BY 1),
    l AS (
      SELECT day, CAST(rev_d AS DOUBLE) AS actual,
        CAST(lag(rev_d, 7) OVER (ORDER BY day ASC) AS DOUBLE) AS fcst_snaive,
        CAST(lag(rev_d, 1) OVER (ORDER BY day ASC) AS DOUBLE) AS fcst_naive
      FROM daily)
    SELECT day, actual, fcst_snaive, fcst_naive,
      abs(actual - fcst_snaive) AS err_snaive,
      abs(actual - fcst_naive) AS err_naive,
      abs(actual - fcst_snaive) <= abs(actual - fcst_naive) AS snaive_wins
    FROM l WHERE fcst_snaive IS NOT NULL
    ORDER BY day ASC NULLS FIRST"""

  private val BacktestHorizons = Seq(1, 3)

  /** ROLLING-ORIGIN FORECAST BACKTEST (round 18; r17 VERDICT task 6) —
    * the out-of-sample scoring the TS pack's forecasters (Holt,
    * Holt-Winters, snaive) never received: over the daily revenue series
    * in INTEGER CENTS, every day t with a full warmup becomes a backtest
    * target forecast from origin t−h for horizons h ∈
    * [[BacktestHorizons]], by three models using ONLY data ≤ the origin —
    * naive (ŷ = y_{t−h}), seasonal-naive (ŷ = y_{t−7}; h ≤ 7 keeps it
    * origin-legal), and drift (ŷ = y_{t−h} + h·slope, slope = the
    * origin's mean historical step (y_{t−h} − y₁)/(idx_{t−h} − 1),
    * integral FLOOR division via a non-negative dividend shift — see
    * the in-line comment) — scored as MAE in cents and MAPE in ppm
    * ((err·10⁶) div y_t, then the mean as an integral div), ALL-INTEGER
    * end to end so both engines grade bit-equal with no rounding
    * contract. The uniform warmup idx > 7 + h puts every model on the
    * SAME origin set per horizon (the backtest convention). Output: one
    * row per (model, horizon) — 6 rows.
    *
    * Scale: one raw-row pass (the daily pre-aggregation), then windows
    * and the 6-way scoring run over the BOUNDED |days| series (the
    * documented global-series exception, see q_ts_decompose); the
    * stacked struct-explode scores all 6 cells in ONE pass over it. */
  private def tsBacktest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(sum(($"o_totalprice".cast("decimal(14,2)") * 100).cast("long"))
        .as("cents"))
    val w = Window.orderBy($"day".asc)
    val feat = daily.select($"cents",
      row_number().over(w).as("idx"),
      lag($"cents", 1).over(w).as("l1"),
      lag($"cents", 3).over(w).as("l3"),
      lag($"cents", 7).over(w).as("l7"),
      first($"cents").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("y0"))
    val cells = BacktestHorizons.flatMap { h =>
      Seq(
        ("naive", expr(s"l$h")),
        ("snaive", expr("l7")),
        // The warmup guard lives INSIDE the expression: the struct array
        // evaluates for every row before the validity filter, and ANSI
        // mode makes the idx = h+1 zero denominator an eager error.
        // FLOOR-division drift via the non-negative shift (round-19 ADVICE
        // fix, the EvalOps k$-band precedent): the raw dividend
        // h·(l_h − y0) is negative whenever the origin's revenue is below
        // day 1's, and a negative integral division is exactly where a
        // truncating engine and a flooring engine disagree. Adding
        // h·y0·den to the dividend (den = idx−h−1 ≥ 7 under the warmup
        // guard) makes it PROVABLY non-negative — h·l_h + h·y0·(den−1),
        // every term ≥ 0 — where truncate ≡ floor, then subtracting h·y0
        // yields floor(h·(l_h − y0)/den) on BOTH engines regardless of
        // their division convention.
        ("drift", expr(s"if(idx > 7 + $h, " +
          s"l$h + ($h * l$h + $h * y0 * (idx - $h - 2)) div (idx - $h - 1)" +
          s" - $h * y0, " +
          "cast(null as bigint))"))
      ).map { case (m, f) =>
        struct(lit(m).as("model"), lit(h.toLong).as("horizon"),
          f.as("fc"), ($"idx" > 7 + h).as("valid"))
      }
    }
    feat.select($"cents", explode(array(cells: _*)).as("e"))
      .filter($"e.valid")
      .select($"e.model".as("model"), $"e.horizon".as("horizon"),
        abs($"cents" - $"e.fc").as("err"),
        expr("(abs(cents - e.fc) * 1000000) div cents").as("ape_ppm"))
      .groupBy($"model", $"horizon")
      .agg(count(lit(1)).as("n_origins"), sum($"err").as("se"),
        sum($"ape_ppm").as("sa"))
      .select($"model", $"horizon", $"n_origins",
        expr("se div n_origins").as("mae_cents"),
        expr("sa div n_origins").as("mape_ppm"))
      .orderBy($"model".asc_nulls_first, $"horizon".asc_nulls_first)
  }

  private val tsBacktestOracle: String = {
    val cells = BacktestHorizons.flatMap { h =>
      Seq(
        ("naive", s"l$h"),
        ("snaive", "l7"),
        ("drift",
          s"l$h + ($h * l$h + $h * y0 * (idx - $h - 2)) // (idx - $h - 1)" +
            s" - $h * y0"))
        .map { case (m, f) =>
          s"""SELECT '$m' AS model, CAST($h AS BIGINT) AS horizon,
            cents, $f AS fc FROM feat WHERE idx > 7 + $h"""
        }
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
          AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    feat AS (
      SELECT cents,
        row_number() OVER (ORDER BY day ASC) AS idx,
        lag(cents, 1) OVER (ORDER BY day ASC) AS l1,
        lag(cents, 3) OVER (ORDER BY day ASC) AS l3,
        lag(cents, 7) OVER (ORDER BY day ASC) AS l7,
        first_value(cents) OVER (ORDER BY day ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y0
      FROM daily),
    scored AS (
      $cells)
    SELECT model, horizon, CAST(count(*) AS BIGINT) AS n_origins,
      CAST(CAST(sum(abs(cents - fc)) AS BIGINT) // count(*) AS BIGINT)
        AS mae_cents,
      CAST(CAST(sum((abs(cents - fc) * 1000000) // cents) AS BIGINT)
        // count(*) AS BIGINT) AS mape_ppm
    FROM scored
    GROUP BY model, horizon
    ORDER BY model ASC NULLS FIRST, horizon ASC NULLS FIRST"""
  }

  /** Interval-UNION coverage (added round 10 close): each event claims
    * [ts, ts + 15 min); per user, the union's total covered time, merged
    * block count, and longest block — the sweep-line primitive under SLA
    * uptime, ad-exposure and device-activity metrics, where naive
    * Σ durations double-counts every overlap. Sweep: a block starts where
    * an interval's start clears the running max of all previous ends
    * (lag-frame window), block id = running sum of starts, then coverage
    * per block is exactly (max end − min start) — pure integer micros
    * end-to-end, no floats anywhere.
    *
    * Scale: one hash shuffle on user_id for the two stacked windows (the
    * block agg and user rollup reuse the same partitioning — grouping
    * keys extend user_id), fan-out 1:1 with events.
    */
  private def winIntervalUnion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val iv = Catalog.load(spark, sfDir, "events")
      .select($"user_id", $"event_id",
        unix_micros($"ts").as("s_us"),
        (unix_micros($"ts") + lit(900000000L)).as("e_us"))
    val wOrd = Window.partitionBy($"user_id")
      .orderBy($"s_us".asc, $"event_id".asc)
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blocks = iv
      .withColumn("run_end", max($"e_us").over(wPrev))
      .withColumn("is_new",
        when($"run_end".isNull || $"s_us" >= $"run_end", 1L).otherwise(0L))
      .withColumn("block_id", sum($"is_new").over(wRun))
      .groupBy($"user_id", $"block_id")
      .agg(min($"s_us").as("b_start"), max($"e_us").as("b_end"),
        count(lit(1)).as("n_iv"))
    blocks.groupBy($"user_id")
      .agg(
        sum($"n_iv").as("n_events"),
        count(lit(1)).as("n_blocks"),
        sum($"b_end" - $"b_start").as("covered_us"),
        max($"b_end" - $"b_start").as("max_block_us"))
      .orderBy($"user_id".asc_nulls_first)
  }

  private val winIntervalUnionOracle = """
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s_us,
        epoch_us(ts) + 900000000 AS e_us
      FROM events),
    r AS (
      SELECT *, max(e_us) OVER
        (PARTITION BY user_id ORDER BY s_us ASC, event_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_end
      FROM iv),
    f AS (
      SELECT *, CASE WHEN run_end IS NULL OR s_us >= run_end
        THEN 1 ELSE 0 END AS is_new
      FROM r),
    b AS (
      SELECT *, CAST(sum(is_new) OVER
        (PARTITION BY user_id ORDER BY s_us ASC, event_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS block_id
      FROM f),
    blocks AS (
      SELECT user_id, block_id, min(s_us) AS b_start, max(e_us) AS b_end,
        count(*) AS n_iv
      FROM b GROUP BY user_id, block_id)
    SELECT user_id,
      CAST(sum(n_iv) AS BIGINT) AS n_events,
      count(*) AS n_blocks,
      CAST(sum(b_end - b_start) AS BIGINT) AS covered_us,
      CAST(max(b_end - b_start) AS BIGINT) AS max_block_us
    FROM blocks GROUP BY user_id
    ORDER BY user_id ASC NULLS FIRST"""

  /** CUSUM changepoint detection over the daily revenue series (added round
    * 10). The page-Hinkley-style recursion S_t = max(0, S_{t-1} + x_t) is
    * NOT window-expressible directly, but has the closed form
    * S_t = P_t - min(0, min_{j<=t} P_j) with P the prefix sum of x — two
    * stacked cumulative windows, no recursion, no UDF. Deviations are kept
    * EXACT by scaling instead of dividing: x_t = rev_cents·n − total_cents
    * (BIGINT, ≡ n·(rev − mean) in cents) so the statistic is integer
    * arithmetic end-to-end and the argmax (the classic CUSUM changepoint
    * estimate, flagged as `is_peak`) cannot flip on a float ulp between
    * engines. The windows run over the |days|-row pre-aggregated series
    * (bounded at any scale — TimeSeries pack preamble); a per-series
    * deployment adds the series key to partitionBy and the corpus scales
    * with |series|·|days|, never raw rows.
    */
  private def tsChangepoint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(sum(($"o_totalprice".cast("decimal(18,6)") * 100).cast("bigint"))
        .as("rev_cents"))
    val wCum = Window.orderBy($"day".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy($"day".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // Totals via the same whole-frame window as the peak flag — NOT a
    // separate agg + cross join, which would scan and aggregate the daily
    // series twice (seen in the executed plan); every window here shares
    // the one sorted single partition of the bounded |days| series.
    daily
      .withColumn("total_cents", sum($"rev_cents").over(wAll))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("x", $"rev_cents" * $"n_days" - $"total_cents")
      .withColumn("p", sum($"x").over(wCum))
      .withColumn("cusum_pos", $"p" - least(lit(0L), min($"p").over(wCum)))
      .withColumn("cusum_neg", greatest(lit(0L), max($"p").over(wCum)) - $"p")
      .withColumn("is_peak", $"cusum_pos" === max($"cusum_pos").over(wAll))
      .select($"day", $"rev_cents", $"cusum_pos", $"cusum_neg", $"is_peak")
      .orderBy($"day".asc_nulls_first)
  }

  private val tsChangepointOracle = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
             AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1),
    tot AS (
      SELECT CAST(sum(rev_cents) AS BIGINT) AS total_cents,
        count(*) AS n_days FROM daily),
    dev AS (
      SELECT day, rev_cents, rev_cents * n_days - total_cents AS x
      FROM daily CROSS JOIN tot),
    pre AS (
      SELECT day, rev_cents,
        CAST(sum(x) OVER (ORDER BY day ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
      FROM dev),
    cus AS (
      SELECT day, rev_cents,
        p - least(CAST(0 AS BIGINT), min(p) OVER (ORDER BY day ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum_pos,
        greatest(CAST(0 AS BIGINT), max(p) OVER (ORDER BY day ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - p AS cusum_neg
      FROM pre)
    SELECT day, rev_cents, cusum_pos, cusum_neg,
      cusum_pos = max(cusum_pos) OVER () AS is_peak
    FROM cus
    ORDER BY day ASC NULLS FIRST"""

  private val acfLags = Seq(1, 2, 3, 7)
  private val xcorrLags = Seq(0, 1, 2, 3, 7)

  /** Lagged CROSS-correlation between two segments' daily revenue series
    * (added round 11; the two-series sibling of q_ts_acf): does BUILDING
    * revenue lead MACHINERY revenue? corr(x_t, y_{t−k}) for k = 0..7
    * over the shared day grid (conditional sums per day — a day absent
    * from orders is absent from BOTH series identically cross-engine).
    * Same determinism machinery as ACF: exact decimal base sums routed
    * to double, per-lag Pearson from one wide moment row, identical
    * expression trees both engines.
    *
    * Scale: one conditional-sum pass over the fact → |days| rows; lags
    * and moments over the bounded calendar series.
    */
  private def tsXcorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .join(broadcast(Catalog.load(spark, sfDir, "customer")
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(
        sum(when($"c_mktsegment" === "BUILDING",
          $"o_totalprice".cast("decimal(18,6)")).otherwise(lit(0).cast("decimal(18,6)")))
          .cast("decimal(18,2)").as("x"),
        sum(when($"c_mktsegment" === "MACHINERY",
          $"o_totalprice".cast("decimal(18,6)")).otherwise(lit(0).cast("decimal(18,6)")))
          .cast("decimal(18,2)").as("y"))
    val w = Window.orderBy($"day".asc)
    val withLags = daily.select($"day" +: $"x" +:
      xcorrLags.map(k => lag($"y", k).over(w).as(s"l$k")): _*)
    val moments = xcorrLags.flatMap { k =>
      val lk = col(s"l$k")
      Seq(
        count(lk).as(s"n_$k"),
        sum(when(lk.isNotNull, $"x")).cast("double").as(s"sx_$k"),
        sum(lk).cast("double").as(s"sy_$k"),
        sum(when(lk.isNotNull, $"x" * $"x")).cast("double").as(s"sxx_$k"),
        sum(lk * lk).cast("double").as(s"syy_$k"),
        sum($"x" * lk).cast("double").as(s"sxy_$k"))
    }
    val agg = withLags.agg(moments.head, moments.tail: _*)
    val rows = xcorrLags.map { k =>
      val n = col(s"n_$k").cast("double")
      val (sx, sy) = (col(s"sx_$k"), col(s"sy_$k"))
      val (sxx, syy, sxy) = (col(s"sxx_$k"), col(s"syy_$k"), col(s"sxy_$k"))
      struct(lit(k).as("lag"), col(s"n_$k").as("n_pairs"),
        ((n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("xcorr"))
    }
    agg.select(inline(array(rows: _*))).orderBy($"lag".asc_nulls_first)
  }

  private val tsXcorrOracle: String = {
    def msum(e: String) = s"CAST(CAST(sum($e) AS VARCHAR) AS DOUBLE)"
    val moments = xcorrLags.map { k =>
      s"""count(l$k) AS n_$k,
        ${msum(s"CASE WHEN l$k IS NOT NULL THEN x END")} AS sx_$k,
        ${msum(s"l$k")} AS sy_$k,
        ${msum(s"CASE WHEN l$k IS NOT NULL THEN x * x END")} AS sxx_$k,
        ${msum(s"l$k * l$k")} AS syy_$k,
        ${msum(s"x * l$k")} AS sxy_$k"""
    }.mkString(",\n        ")
    val selects = xcorrLags.map { k =>
      val n = s"CAST(n_$k AS DOUBLE)"
      s"""SELECT $k AS lag, n_$k AS n_pairs,
        ($n * sxy_$k - sx_$k * sy_$k) /
        (sqrt($n * sxx_$k - sx_$k * sx_$k) * sqrt($n * syy_$k - sy_$k * sy_$k)) AS xcorr
      FROM m"""
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH daily AS (
      -- DECIMAL(19,2) for the same int128-path reason as q_ts_acf's
      -- oracle; the VALUES equal Spark's (18,2) — both exact.
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'
          THEN CAST(o_totalprice AS DECIMAL(18,6))
          ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(19,2)) AS x,
        CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY'
          THEN CAST(o_totalprice AS DECIMAL(18,6))
          ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(19,2)) AS y
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1),
    s AS (
      SELECT x,
        ${xcorrLags.map(k => s"lag(y, $k) OVER (ORDER BY day ASC) AS l$k").mkString(",\n        ")}
      FROM daily),
    m AS (
      SELECT
        $moments
      FROM s)
    SELECT * FROM (
      $selects)
    ORDER BY lag ASC NULLS FIRST"""
  }

  /** Sample autocorrelation of the daily-revenue series at lags 1/2/3/7
    * (added round 10) — the seasonality probe run before choosing a
    * forecasting model (lag-7 confirms the weekly cycle q_ts_forecast_snaive
    * exploits; an index-lag over observed days, like every window op on
    * this near-complete spine). BIT-exact, no rounding tolerance: daily
    * revenue stays DECIMAL end-to-end ((18,2) — exact for 2-decimal money),
    * the per-lag sufficient statistics are decimal sums of exact (37,4)
    * products conditioned on the lag existing, and the Pearson formula is
    * the same IEEE expression on both engines over correctly-rounded
    * decimal→double casts (oracle routes them via VARCHAR — the scale-4
    * sums exceed 2^53; see q_stat_corr).
    *
    * Scale: the windows/moments run on the |days|-bounded daily aggregate
    * (~2.4k rows at ANY scale factor — the global-series exception
    * documented at q_ts_decompose); the raw table is touched once by the
    * map-side-combined daily aggregation.
    */
  private def tsAcf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(sum($"o_totalprice".cast("decimal(18,6)"))
        .cast("decimal(18,2)").as("rev"))
    val w = Window.orderBy($"day".asc)
    val withLags = daily.select($"day" +: $"rev" +:
      acfLags.map(k => lag($"rev", k).over(w).as(s"l$k")): _*)
    val moments = acfLags.flatMap { k =>
      val lk = col(s"l$k")
      Seq(
        count(lk).as(s"n_$k"),
        sum(when(lk.isNotNull, $"rev")).cast("double").as(s"sx_$k"),
        sum(lk).cast("double").as(s"sy_$k"),
        sum(when(lk.isNotNull, $"rev" * $"rev")).cast("double").as(s"sxx_$k"),
        sum(lk * lk).cast("double").as(s"syy_$k"),
        sum($"rev" * lk).cast("double").as(s"sxy_$k"))
    }
    val agg = withLags.agg(moments.head, moments.tail: _*)
    val rows = acfLags.map { k =>
      val n = col(s"n_$k").cast("double")
      val (sx, sy) = (col(s"sx_$k"), col(s"sy_$k"))
      val (sxx, syy, sxy) = (col(s"sxx_$k"), col(s"syy_$k"), col(s"sxy_$k"))
      struct(lit(k).as("lag"), col(s"n_$k").as("n_pairs"),
        ((n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("acf"))
    }
    agg.select(inline(array(rows: _*))).orderBy($"lag".asc_nulls_first)
  }

  private val tsAcfOracle: String = {
    def msum(e: String) = s"CAST(CAST(sum($e) AS VARCHAR) AS DOUBLE)"
    val moments = acfLags.map { k =>
      s"""count(l$k) AS n_$k,
        ${msum(s"CASE WHEN l$k IS NOT NULL THEN rev END")} AS sx_$k,
        ${msum(s"l$k")} AS sy_$k,
        ${msum(s"CASE WHEN l$k IS NOT NULL THEN rev * rev END")} AS sxx_$k,
        ${msum(s"l$k * l$k")} AS syy_$k,
        ${msum(s"rev * l$k")} AS sxy_$k"""
    }.mkString(",\n        ")
    val selects = acfLags.map { k =>
      val n = s"CAST(n_$k AS DOUBLE)"
      s"""SELECT $k AS lag, n_$k AS n_pairs,
        ($n * sxy_$k - sx_$k * sy_$k) /
        (sqrt($n * sxx_$k - sx_$k * sx_$k) * sqrt($n * syy_$k - sy_$k * sy_$k)) AS acf
      FROM m"""
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH daily AS (
      -- DECIMAL(19,2), not (18,2): DuckDB multiplies (18,x) significands in
      -- int64 and overflows on sf0.1 daily revenues; 19 digits forces the
      -- int128 path. The VALUE is identical to Spark's (18,2) — both exact.
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(19,2)) AS rev
      FROM orders GROUP BY 1),
    s AS (
      SELECT rev,
        ${acfLags.map(k => s"lag(rev, $k) OVER (ORDER BY day ASC) AS l$k").mkString(",\n        ")}
      FROM daily),
    m AS (
      SELECT
        $moments
      FROM s)
    SELECT * FROM (
      $selects)
    ORDER BY lag ASC NULLS FIRST"""
  }

  /** Holt linear-trend exponential smoothing per market segment (added
    * round 10 batch 2): level+trend state folded through each segment's
    * daily-revenue series (α=0.3, β=0.1; init l₂=y₂, b₂=y₂−y₁), reporting
    * the end-of-series level/trend and the 7-day-ahead forecast. The
    * recurrence couples l and b, so no finite window rewrite exists
    * (unlike q_ts_ewma's truncated convolution) — this is the genuinely
    * SEQUENTIAL per-series computation, implemented on the typed surface
    * (`groupByKey(segment).flatMapGroups` imperative fold), the documented
    * (d)-tier escape reserved for exactly this shape.
    *
    * Determinism: fold order is the day order (unique per group); every
    * step is the same IEEE expression with the same literal constants both
    * engines (0.3/0.7/0.1/0.9 written literally — `1.0-0.3` is a DIFFERENT
    * double than the literal 0.7), so level/trend/forecast are
    * bit-identical to the oracle's recursive-CTE fold.
    *
    * Scale: ONE shuffle on the series key; in-group state is O(1) beyond
    * the |days|-bounded sort buffer. The 100 TB shape is per-entity
    * (customer/SKU) forecasting where groups are numerous and small —
    * this plan parallelizes across entities with no global pass.
    */
  /** Holt-Winters ADDITIVE SEASONAL smoothing (added round 11; the
    * seasonal extension of q_ts_holt, period 7 = day-of-week): per
    * segment, classic init — level = week-1 mean, trend = (week-2 mean −
    * week-1 mean)/7, seasonals = week-1 residuals — then the three-way
    * recursion (α=0.3, β=0.1, γ=0.2) over the remaining days, forecast
    * h=7 re-using the matching seasonal slot. Same execution/oracle
    * pattern as Holt: the recursion is INHERENTLY sequential per group,
    * so it runs in one typed flatMapGroups over the pre-aggregated daily
    * series (|days| rows per group — bounded by calendar, not data), and
    * the oracle replays the identical IEEE arithmetic in a DuckDB
    * recursive CTE carrying the 7-slot seasonal state as a LIST, every
    * intermediate inlined so both engines evaluate the same expression
    * tree. Means are fixed left-to-right folds both sides.
    */
  private def tsHoltWinters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .join(broadcast(Catalog.load(spark, sfDir, "customer")
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", date_trunc("day", $"o_orderdate").as("day"))
      .agg(dsum($"o_totalprice").as("y"))
    daily.select($"c_mktsegment", $"day", $"y")
      .as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (seg: String, it: Iterator[(String, java.sql.Timestamp, Double)]) =>
        val ys = it.toArray.sortBy(_._2.getTime).map(_._3)
        val n = ys.length
        if (n < 15) Iterator.empty
        else {
          // Left-to-right folds, mirrored token-for-token in the oracle.
          def mean7(off: Int): Double =
            ((((((ys(off) + ys(off + 1)) + ys(off + 2)) + ys(off + 3)) +
              ys(off + 4)) + ys(off + 5)) + ys(off + 6)) / 7.0
          var l = mean7(0)
          var b = (mean7(7) - mean7(0)) / 7.0
          val s = Array.tabulate(7)(i => ys(i) - l)
          var t = 7
          while (t < n) {
            val sOld = s(t % 7)
            val lNew = 0.3 * (ys(t) - sOld) + 0.7 * (l + b)
            b = 0.1 * (lNew - l) + 0.9 * b
            s(t % 7) = 0.2 * (ys(t) - lNew) + 0.8 * sOld
            l = lNew
            t += 1
          }
          val season = s((n - 1) % 7)
          Iterator((seg, n.toLong, l, b, season, l + 7.0 * b + season))
        }
      }
      .toDF("c_mktsegment", "n_days", "level", "trend", "season",
        "forecast_7")
      .orderBy($"c_mktsegment".asc_nulls_first)
  }

  private val tsHoltWintersOracle = s"""
    WITH RECURSIVE daily AS (
      SELECT c_mktsegment AS seg,
        CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        ${Oracle.dsum("o_totalprice")} AS y
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    idx AS (
      SELECT seg, y,
        row_number() OVER (PARTITION BY seg ORDER BY day ASC) AS i,
        count(*) OVER (PARTITION BY seg) AS n
      FROM daily),
    piv AS (
      SELECT seg,
        sum(CASE WHEN i = 1 THEN y END) AS y1,
        sum(CASE WHEN i = 2 THEN y END) AS y2,
        sum(CASE WHEN i = 3 THEN y END) AS y3,
        sum(CASE WHEN i = 4 THEN y END) AS y4,
        sum(CASE WHEN i = 5 THEN y END) AS y5,
        sum(CASE WHEN i = 6 THEN y END) AS y6,
        sum(CASE WHEN i = 7 THEN y END) AS y7,
        sum(CASE WHEN i = 8 THEN y END) AS y8,
        sum(CASE WHEN i = 9 THEN y END) AS y9,
        sum(CASE WHEN i = 10 THEN y END) AS y10,
        sum(CASE WHEN i = 11 THEN y END) AS y11,
        sum(CASE WHEN i = 12 THEN y END) AS y12,
        sum(CASE WHEN i = 13 THEN y END) AS y13,
        sum(CASE WHEN i = 14 THEN y END) AS y14
      FROM idx WHERE i <= 14 GROUP BY seg),
    init AS (
      SELECT seg,
        ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0 AS l0,
        (((((((y8 + y9) + y10) + y11) + y12) + y13) + y14) / 7.0
          - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0) / 7.0 AS b0,
        [y1 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0,
         y2 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0,
         y3 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0,
         y4 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0,
         y5 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0,
         y6 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0,
         y7 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0] AS s0
      FROM piv),
    rec AS (
      SELECT seg, CAST(7 AS BIGINT) AS i, l0 AS l, b0 AS b, s0 AS s
      FROM init
      UNION ALL
      SELECT r.seg, r.i + 1,
        0.3 * (x.y - r.s[(r.i % 7) + 1]) + 0.7 * (r.l + r.b) AS l,
        0.1 * ((0.3 * (x.y - r.s[(r.i % 7) + 1]) + 0.7 * (r.l + r.b))
          - r.l) + 0.9 * r.b AS b,
        list_transform(range(1, 8), k -> CASE WHEN k = (r.i % 7) + 1
          THEN 0.2 * (x.y
            - (0.3 * (x.y - r.s[(r.i % 7) + 1]) + 0.7 * (r.l + r.b)))
            + 0.8 * r.s[(r.i % 7) + 1]
          ELSE r.s[k] END) AS s
      FROM rec r JOIN idx x ON x.seg = r.seg AND x.i = r.i + 1)
    SELECT r.seg AS c_mktsegment, r.i AS n_days, r.l AS level, r.b AS trend,
      r.s[((r.i - 1) % 7) + 1] AS season,
      r.l + 7.0 * r.b + r.s[((r.i - 1) % 7) + 1] AS forecast_7
    FROM rec r
    JOIN (SELECT seg, max(n) AS n FROM idx GROUP BY seg) t
      ON r.seg = t.seg AND r.i = t.n
    WHERE t.n >= 15
    ORDER BY c_mktsegment ASC NULLS FIRST"""

  private def tsHolt(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .join(broadcast(Catalog.load(spark, sfDir, "customer")
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", date_trunc("day", $"o_orderdate").as("day"))
      .agg(dsum($"o_totalprice").as("y"))
    daily.select($"c_mktsegment", $"day", $"y")
      .as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (seg: String, it: Iterator[(String, java.sql.Timestamp, Double)]) =>
        val ys = it.toArray.sortBy(_._2.getTime).map(_._3)
        if (ys.length < 2) Iterator.empty
        else {
          var l = ys(1)
          var b = ys(1) - ys(0)
          var t = 2
          while (t < ys.length) {
            val y = ys(t)
            val lNew = 0.3 * y + 0.7 * (l + b)
            b = 0.1 * (lNew - l) + 0.9 * b
            l = lNew
            t += 1
          }
          Iterator((seg, ys.length.toLong, l, b, l + 7.0 * b))
        }
      }
      .toDF("c_mktsegment", "n_days", "level", "trend", "forecast_7")
      .orderBy($"c_mktsegment".asc_nulls_first)
  }

  private val tsHoltOracle = s"""
    WITH RECURSIVE daily AS (
      SELECT c_mktsegment AS seg,
        CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        ${Oracle.dsum("o_totalprice")} AS y
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    idx AS (
      SELECT seg, y,
        row_number() OVER (PARTITION BY seg ORDER BY day ASC) AS i,
        count(*) OVER (PARTITION BY seg) AS n
      FROM daily),
    rec AS (
      SELECT i2.seg, CAST(2 AS BIGINT) AS i, i2.y AS l, i2.y - i1.y AS b
      FROM idx i1 JOIN idx i2 ON i1.seg = i2.seg AND i1.i = 1 AND i2.i = 2
      UNION ALL
      SELECT r.seg, r.i + 1,
        0.3 * x.y + 0.7 * (r.l + r.b) AS l,
        0.1 * ((0.3 * x.y + 0.7 * (r.l + r.b)) - r.l) + 0.9 * r.b AS b
      FROM rec r JOIN idx x ON x.seg = r.seg AND x.i = r.i + 1)
    SELECT r.seg AS c_mktsegment, r.i AS n_days, r.l AS level, r.b AS trend,
      r.l + 7.0 * r.b AS forecast_7
    FROM rec r
    JOIN (SELECT seg, max(n) AS n FROM idx GROUP BY seg) t
      ON r.seg = t.seg AND r.i = t.n
    ORDER BY c_mktsegment ASC NULLS FIRST"""

  /** Month-over-month and year-over-year revenue growth (added round 10
    * batch 2): the first dashboard every revenue pipeline ships. Monthly
    * sums are decimal-exact doubles; growth ratios are the same two-double
    * division both engines, emitted raw; the first month / first year rows
    * keep NULL growth (no fabricated zeros). Index-lag over observed
    * months — the fixture month spine is complete, and the oracle uses the
    * identical formulation either way.
    *
    * Scale: map-side-combined monthly agg, then windows over the
    * |months|-bounded series (~80 rows at any SF).
    */
  private def tsMomGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val monthly = Catalog.load(spark, sfDir, "orders")
      .groupBy(date_trunc("month", $"o_orderdate").as("month"))
      .agg(dsum($"o_totalprice").as("revenue"))
    val w = Window.orderBy($"month".asc)
    monthly
      .withColumn("prev_m", lag($"revenue", 1).over(w))
      .withColumn("prev_y", lag($"revenue", 12).over(w))
      .select($"month", $"revenue",
        (($"revenue" - $"prev_m") * lit(100.0) / $"prev_m").as("mom_pct"),
        (($"revenue" - $"prev_y") * lit(100.0) / $"prev_y").as("yoy_pct"))
      .orderBy($"month".asc_nulls_first)
  }

  private val tsMomGrowthOracle = s"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        ${Oracle.dsum("o_totalprice")} AS revenue
      FROM orders GROUP BY 1),
    lagged AS (
      SELECT month, revenue,
        lag(revenue, 1) OVER (ORDER BY month ASC) AS prev_m,
        lag(revenue, 12) OVER (ORDER BY month ASC) AS prev_y
      FROM monthly)
    SELECT month, revenue,
      (revenue - prev_m) * 100.0 / prev_m AS mom_pct,
      (revenue - prev_y) * 100.0 / prev_y AS yoy_pct
    FROM lagged
    ORDER BY month ASC NULLS FIRST"""

  /** Trailing 7-day distinct users via MERGEABLE per-day HLL sketches —
    * the sketch twin of [[rollingDistinct]] (whose scaladoc names this as
    * the 100 TB answer when exactness is negotiable). Capability-only:
    * sketch estimates are engine-specific, so correctness is a unit-spec
    * error bound against the exact twin, not a DuckDB hash.
    *
    * Scale shape: raw rows are touched ONCE — a per-day `hll_sketch_agg`
    * (map-side partial, constant bytes per day) collapses the corpus to a
    * |days|-row sketch table; the trailing window is then a RANGE-framed
    * `hll_union_agg` over that bounded table (calendar-correct across
    * gap days, same frame semantics as the exact twin's day expansion).
    * Where the exact form shuffles O(|pairs| × 7) expanded rows, this
    * shuffles |days| sketches — the reaggregation property that makes
    * sliding distinct counts tractable at 100 TB: stored per-day sketches
    * answer ANY trailing horizon (7, 28, 90 days) without re-scanning.
    */
  private def rollingDistinctSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perDay = Catalog.load(spark, sfDir, "events")
      .select(datediff(to_date($"ts"), to_date(lit("1970-01-01")))
        .cast("long").as("di"), $"user_id")
      .groupBy($"di")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    // Ordered-only window over the BOUNDED |days| sketch table (the §2.N
    // calendar rule), RANGE frame so calendar gaps shrink the union set
    // exactly like the exact twin's day expansion.
    val w = Window.orderBy($"di").rangeBetween(-6, 0)
    perDay
      .withColumn("usk", expr("hll_union_agg(sk)").over(w))
      .withColumn("est_wau", expr("hll_sketch_estimate(usk)").cast("long"))
      .select(
        to_timestamp(date_add(to_date(lit("1970-01-01")), $"di".cast("int")))
          .as("day"),
        $"est_wau")
      .orderBy($"day".asc_nulls_first)
  }

  /** Running-peak drawdown of the per-priority daily-revenue series (added
    * round 10 batch 4) — the finance-style "decline from high-water mark"
    * window: peak = running max of daily revenue, drawdown = peak − today.
    * Every input is the decimal-exact daily sum, and max/subtract on
    * decimals are exact, so the whole series is bit-identical cross-engine
    * with zero rounding.
    *
    * Scale: the window runs over the pre-aggregated (priority × day) table
    * — bounded by the calendar, never the raw fact (q_ts_ewma rule); the
    * only raw-row pass is the map-side-combined daily aggregation.
    */
  private def winDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .groupBy($"o_orderpriority",
        date_trunc("day", $"o_orderdate").as("day"))
      .agg(sum($"o_totalprice".cast("decimal(18,6)")).as("rev_d"))
    val w = Window.partitionBy($"o_orderpriority").orderBy($"day".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(
        $"o_orderpriority", $"day",
        $"rev_d".cast("double").as("revenue"),
        max($"rev_d").over(w).cast("double").as("peak"),
        (max($"rev_d").over(w) - $"rev_d").cast("double").as("drawdown"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"day".asc_nulls_first)
  }

  private val winDrawdownOracle = """
    WITH daily AS (
      SELECT o_orderpriority,
        CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_d
      FROM orders GROUP BY 1, 2)
    SELECT o_orderpriority, day,
      CAST(rev_d AS DOUBLE) AS revenue,
      CAST(max(rev_d) OVER w AS DOUBLE) AS peak,
      CAST(max(rev_d) OVER w - rev_d AS DOUBLE) AS drawdown
    FROM daily
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_orderpriority ASC NULLS FIRST, day ASC NULLS FIRST"""

  /** ROLLING OLS TREND SLOPE (round 13) — the local-trend feature a
    * forecasting pipeline computes per series point (pandas
    * `rolling().apply(ols)`, Flink's over-window regression): over each
    * trailing 7-observed-day window of the URGENT daily-revenue series,
    * the least-squares slope against the epoch-day index. Emitted as the
    * EXACT integer numerator/denominator pair
    * num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)² (n = 7) — revenue in
    * cents and x an epoch day keep every term integral, so the pair is
    * bit-equal cross-engine where the divided float slope would wobble;
    * den > 0 whenever the 7 days are distinct (guaranteed — the series
    * is grouped by day). Bounds: Σxy ≤ 7·10⁴·(daily cents); int64-safe
    * while daily revenue < 10¹³ cents, with a loud raise_error beyond
    * (the gini guard pattern).
    *
    * Scale: map-side-combined daily agg → ONE ordered window pass with
    * four trailing-frame sums over the |days|-bounded series (the
    * q_win_moving_avg single-series justification); per-key series
    * would partition the same window by the key.
    */
  private def tsRollingSlope(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(sum(($"o_totalprice".cast("decimal(14,2)") * 100).cast("long"))
        .as("y"))
      .select($"day",
        when($"y" >= 10000000000000L, raise_error(lit(
          "graft q_ts_rolling_slope: daily cents >= 1e13 overflows the " +
            "rolling Sxy bound; rescale y")))
          .otherwise($"y").as("y"),
        datediff($"day", lit("1970-01-01").cast("date")).cast("long").as("x"))
    val w = Window.orderBy($"day".asc).rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sx", sum($"x").over(w))
      .withColumn("sy", sum($"y").over(w))
      .withColumn("sxy", sum($"x" * $"y").over(w))
      .withColumn("sxx", sum($"x" * $"x").over(w))
      .filter($"cnt" === 7)
      .select($"day", $"x", $"y",
        (lit(7L) * $"sxy" - $"sx" * $"sy").as("slope_num"),
        (lit(7L) * $"sxx" - $"sx" * $"sx").as("slope_den"))
      .orderBy($"day".asc_nulls_first)
  }

  private val tsRollingSlopeOracle = """
    WITH daily0 AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
          AS BIGINT) AS y
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1),
    daily AS (
      SELECT day,
        CASE WHEN y >= 10000000000000 THEN error(
          'graft q_ts_rolling_slope: overflow') ELSE y END AS y,
        CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS x
      FROM daily0),
    r AS (
      SELECT day, x, y,
        count(*) OVER w AS cnt,
        CAST(sum(x) OVER w AS BIGINT) AS sx,
        CAST(sum(y) OVER w AS BIGINT) AS sy,
        CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
        CAST(sum(x * x) OVER w AS BIGINT) AS sxx
      FROM daily
      WINDOW w AS (ORDER BY day ASC
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT day, x, y,
      7 * sxy - sx * sy AS slope_num,
      7 * sxx - sx * sx AS slope_den
    FROM r WHERE cnt = 7
    ORDER BY day ASC NULLS FIRST"""

  private val SaxSegments = 8

  /** SAX — SYMBOLIC AGGREGATE APPROXIMATION (round 16): the classic
    * time-series symbolization (Lin/Keogh): z-normalize the daily-revenue
    * series against its own mean/std, PAA-compress into [[SaxSegments]]
    * equal-width segments (segment mean of z-scores), and map each
    * segment to a 4-letter alphabet by the N(0,1) quartile breakpoints
    * ±0.6745 and 0 — the representation under SAX-indexed motif/anomaly
    * search. Determinism: the series is the exact decimal daily sum; μ
    * comes from the exact decimal total and σ from the exact decimal
    * sum-of-squares (rev is 2-decimal so rev² is an exact 4-decimal
    * rational), both cast to double once — so every z and PAA value is a
    * fixed IEEE expression over identical inputs on both engines; the
    * breakpoint CASE has measure-zero tie risk (continuous PAA values vs
    * the irrational-ish .6745 grid) and the emitted PAA rounds at 4dp.
    *
    * Scale: the daily aggregation is the only corpus-touching pass
    * (map-side-combined); positions/segments come from a row_number over
    * the CALENDAR-BOUNDED daily table (~2.4k rows at any SF — the
    * q_ts_acf ordered-window justification), and the PAA/letter fold is
    * |segments| rows. Per-key symbolization at scale would partition the
    * same windows by series key.
    */
  private def tsSax(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(sum($"o_totalprice".cast("decimal(18,6)"))
        .cast("decimal(18,2)").as("rev"))
    val w = Window.orderBy($"day".asc)
    val pos = daily.withColumn("i", row_number().over(w).cast("long") - 1L)
    val m = pos.agg(count(lit(1)).as("n"),
      sum($"rev".cast("decimal(18,6)")).cast("double").as("sx"),
      sum(($"rev" * $"rev").cast("decimal(38,6)")).cast("double").as("sxx"))
    val seg = pos.crossJoin(broadcast(m))
      .select(expr(s"i * $SaxSegments div n").as("segment"),
        $"rev", $"n", $"sx", $"sxx")
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_days"),
        sum($"rev".cast("decimal(18,6)")).cast("double").as("segsum"),
        first($"n").as("n"), first($"sx").as("sx"), first($"sxx").as("sxx"))
    val mu = $"sx" / $"n".cast("double")
    val sigma = sqrt($"sxx" / $"n".cast("double") - mu * mu)
    val paa = ($"segsum" / $"n_days".cast("double") - mu) / sigma
    seg.select($"segment", $"n_days", round(paa, 4).as("paa_z"),
        when(paa < -0.6745, "a").when(paa < 0.0, "b")
          .when(paa < 0.6745, "c").otherwise("d").as("symbol"))
      .orderBy($"segment".asc_nulls_first)
  }

  private val tsSaxOracle = s"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1),
    pos AS (
      SELECT rev, row_number() OVER (ORDER BY day ASC) - 1 AS i FROM daily),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        CAST(sum(CAST(CAST(rev AS DECIMAL(28,4)) * rev AS DECIMAL(38,6)))
             AS DOUBLE) AS sxx
      FROM pos),
    seg AS (
      SELECT (i * $SaxSegments) // n AS segment,
        CAST(count(*) AS BIGINT) AS n_days,
        CAST(sum(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS segsum,
        max(n) AS n, max(sx) AS sx, max(sxx) AS sxx
      FROM pos CROSS JOIN m GROUP BY 1)
    SELECT segment, n_days,
      round((segsum / n_days - sx / n)
            / sqrt(sxx / n - (sx / n) * (sx / n)), 4) AS paa_z,
      CASE WHEN (segsum / n_days - sx / n)
                / sqrt(sxx / n - (sx / n) * (sx / n)) < -0.6745 THEN 'a'
           WHEN (segsum / n_days - sx / n)
                / sqrt(sxx / n - (sx / n) * (sx / n)) < 0.0 THEN 'b'
           WHEN (segsum / n_days - sx / n)
                / sqrt(sxx / n - (sx / n) * (sx / n)) < 0.6745 THEN 'c'
           ELSE 'd' END AS symbol
    FROM seg ORDER BY segment ASC NULLS FIRST"""

  /** V-SHAPE PATTERN MATCH (round 16) — the MATCH_RECOGNIZE-flavor
    * sequence pattern over partitioned series: per supplier, count the
    * days whose daily-revenue sequence forms a strict V (two falling then
    * two rising steps centered on the day: v₋₂>v₋₁>v₀<v₊₁<v₊₂ — the
    * local-minimum "dip-and-recover" motif), emit the top 20 suppliers.
    * Pattern predicates compare EXACT DECIMAL daily sums (no float
    * wobble can flip a strict inequality), and missing neighbors (series
    * edges) fail the strict comparison with null semantics — exactly the
    * SQL lag/lead behavior the oracle mirrors.
    *
    * Scale: MATCH_RECOGNIZE-style patterns with BOUNDED lookaround
    * compile to lag/lead windows partitioned by the series key — one
    * hash shuffle on supplier, per-key frames stream through Spark's
    * window machinery, no self-join, no cross-day blowup; the top-20 is
    * TakeOrdered. Unbounded-quantifier patterns (A+ B+) take the
    * q_streak_islands gaps-and-islands form instead.
    */
  private def winPatternVshape(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "lineitem")
      .groupBy($"l_suppkey",
        date_trunc("day", $"l_shipdate").as("day"))
      .agg(sum($"l_extendedprice".cast("decimal(18,6)"))
        .cast("decimal(18,2)").as("rev"))
    val w = Window.partitionBy($"l_suppkey").orderBy($"day".asc)
    val v = daily
      .withColumn("p2", lag($"rev", 2).over(w))
      .withColumn("p1", lag($"rev", 1).over(w))
      .withColumn("f1", lead($"rev", 1).over(w))
      .withColumn("f2", lead($"rev", 2).over(w))
    v.withColumn("is_v",
        ($"p2" > $"p1" && $"p1" > $"rev" && $"rev" < $"f1" && $"f1" < $"f2")
          .cast("long"))
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_days"),
        coalesce(sum($"is_v"), lit(0L)).as("n_vshapes"))
      .orderBy($"n_vshapes".desc, $"l_suppkey".asc_nulls_first)
      .limit(20)
  }

  private val winPatternVshapeOracle = """
    WITH daily AS (
      SELECT l_suppkey, date_trunc('day', l_shipdate) AS day,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
             AS DECIMAL(18,2)) AS rev
      FROM lineitem GROUP BY 1, 2),
    v AS (
      SELECT l_suppkey,
        CASE WHEN lag(rev, 2) OVER w > lag(rev, 1) OVER w
              AND lag(rev, 1) OVER w > rev
              AND rev < lead(rev, 1) OVER w
              AND lead(rev, 1) OVER w < lead(rev, 2) OVER w
             THEN 1 ELSE 0 END AS is_v
      FROM daily
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY day ASC))
    SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_days,
      CAST(sum(is_v) AS BIGINT) AS n_vshapes
    FROM v GROUP BY 1
    ORDER BY n_vshapes DESC, l_suppkey ASC NULLS FIRST
    LIMIT 20"""

  /** SEASONAL / TREND STRENGTH (round 16, the Hyndman `feasts` scalars)
    * over the [[decomposed]] frame: F_trend = max(0, 1 − Var(R)/Var(T+R))
    * with T+R = revenue − seasonal (deseasonalized), F_seas = max(0,
    * 1 − Var(R)/Var(S+R)) with S+R = detrended — the two numbers a
    * forecasting pipeline uses to pick model class (strength near 0 ⇒
    * drop that component) and the monitoring scalar next to
    * q_ts_decompose's full frame. Determinism: the component series are
    * per-row IEEE expressions over identical inputs; variance moments
    * route each value through DECIMAL(18,6) (the dsum rule — residuals
    * are continuous sums/differences, not boundary-heavy, the r4
    * precedent) and squares kept exact at DECIMAL(38,12), so Σ and Σ² are
    * exact and order-free; the final ratios are fixed scalar IEEE
    * expressions rounded at 4dp.
    *
    * Scale: everything after the daily aggregate runs on the
    * calendar-bounded frame ([[tsDecompose]]'s argument); the strength
    * fold is a 1-row aggregate.
    */
  private def tsSeasonalStrength(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d6 = (c: Column) => c.cast("decimal(18,6)")
    val sq = (c: Column) => (d6(c) * d6(c)).cast("decimal(38,12)")
    val m = decomposed(spark, sfDir)
      .filter($"residual".isNotNull)
      .select($"residual".as("r"),
        ($"revenue" - $"seasonal").as("tr"),
        // detrended = revenue − trend, recomputed as the same per-row
        // IEEE expression the frame's residual was derived from (the
        // frame itself only emits the residual).
        ($"revenue" - $"trend").as("sr"))
      .agg(count(lit(1)).as("n"),
        sum(d6($"r")).cast("double").as("s_r"),
        sum(sq($"r")).cast("double").as("ss_r"),
        sum(d6($"tr")).cast("double").as("s_tr"),
        sum(sq($"tr")).cast("double").as("ss_tr"),
        sum(d6($"sr")).cast("double").as("s_sr"),
        sum(sq($"sr")).cast("double").as("ss_sr"))
    def v(s: Column, ss: Column): Column = {
      val n = col("n").cast("double")
      ss / n - (s / n) * (s / n)
    }
    m.select($"n",
      round(greatest(lit(0.0),
        lit(1.0) - v($"s_r", $"ss_r") / v($"s_tr", $"ss_tr")), 4)
        .as("f_trend"),
      round(greatest(lit(0.0),
        lit(1.0) - v($"s_r", $"ss_r") / v($"s_sr", $"ss_sr")), 4)
        .as("f_seasonal"))
  }

  private val tsSeasonalStrengthOracle = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_d
      FROM orders GROUP BY 1),
    t AS (
      SELECT day,
        CAST(rev_d AS DOUBLE) AS revenue,
        CASE WHEN count(*) OVER w = 7
          THEN CAST(sum(rev_d) OVER w AS DOUBLE) / 7 END AS trend,
        CAST(dayofweek(day) AS BIGINT) AS dow
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    t2 AS (SELECT *, revenue - trend AS detrended FROM t),
    seas AS (
      SELECT dow,
        round(CAST(sum(CAST(detrended AS DECIMAL(18,6))) AS DOUBLE)
          / count(detrended), 4) AS seasonal
      FROM t2 WHERE detrended IS NOT NULL GROUP BY dow),
    comp AS (
      SELECT t2.detrended - s.seasonal AS r,
        t2.revenue - s.seasonal AS tr,
        t2.detrended AS sr
      FROM t2 JOIN seas s USING (dow)
      WHERE t2.detrended IS NOT NULL),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(CAST(sum(CAST(r AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s_r,
        CAST(CAST(sum(CAST(CAST(r AS DECIMAL(28,6)) * CAST(r AS DECIMAL(18,6))
          AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS ss_r,
        CAST(CAST(sum(CAST(tr AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s_tr,
        CAST(CAST(sum(CAST(CAST(tr AS DECIMAL(28,6)) * CAST(tr AS DECIMAL(18,6))
          AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS ss_tr,
        CAST(CAST(sum(CAST(sr AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s_sr,
        CAST(CAST(sum(CAST(CAST(sr AS DECIMAL(28,6)) * CAST(sr AS DECIMAL(18,6))
          AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS ss_sr
      FROM comp)
    SELECT n,
      round(greatest(0.0, 1.0 - (ss_r / n - (s_r / n) * (s_r / n))
        / (ss_tr / n - (s_tr / n) * (s_tr / n))), 4) AS f_trend,
      round(greatest(0.0, 1.0 - (ss_r / n - (s_r / n) * (s_r / n))
        / (ss_sr / n - (s_sr / n) * (s_sr / n))), 4) AS f_seasonal
    FROM m"""

  private val DtwSegs = 10
  private val DtwBand = 2

  /** Banded-DTW argument contract, spec-pinned (r16 VERDICT task 3):
    * UNDER-band (band < |n−m|) means no monotone warping path can connect
    * (1,1) to (n,m) — every cell past the gap is unreachable and the
    * distance is vacuously undefined, so refuse loudly; OVER-band covers
    * the whole matrix — that is full DTW wearing a band, and silently
    * paying the full O(n·m) a caller asked to avoid is the bug, so demand
    * the explicit full form instead. The degeneracy boundary is exact
    * (round-18 ADVICE fix): over cells (i,j) ∈ [1,n]×[1,m] the widest
    * reachable offset is |n−1| at (n,1) or |m−1| at (1,m), i.e.
    * max(n,m)−1 — so band = max(n,m)−1 ALREADY admits every cell (the
    * silent full-DTW case the old `band < max(n,m)` guard let through),
    * and the first genuinely banded setting is max(n,m)−2. */
  private[graft] def dtwBandCheck(n: Int, m: Int, band: Int): Unit = {
    require(band >= math.abs(n - m),
      s"graft dtw: band $band is narrower than the length gap |$n-$m| = " +
        s"${math.abs(n - m)} — no monotone warping path can connect (1,1) " +
        s"to ($n,$m); widen the band or re-segment the series")
    require(band < math.max(n, m) - 1,
      s"graft dtw: band $band covers the whole $n x $m matrix (every " +
        s"cell has |i-j| <= ${math.max(n, m) - 1}) — banded DTW " +
        "degenerates to full DTW; drop the band and say so explicitly")
  }

  /** SAKOE-CHIBA-BANDED DYNAMIC TIME WARPING (round 17; r16 VERDICT task
    * 3) — the elastic-distance primitive the time-series pack lacked:
    * DTW(X, Y) = D(n,m) with D(i,j) = |x_i − y_j| + min(D(i−1,j),
    * D(i,j−1), D(i−1,j−1)) restricted to the |i−j| ≤ band corridor, the
    * alignment-tolerant similarity under motif/anomaly work that plain
    * lockstep distance (and the pack's SAX symbols) cannot express.
    * Series: each order priority's daily cents, PAA-compressed to
    * [[DtwSegs]] integer segments (segment mean via integral `div` — the
    * q_ts_sax day-index grid), compared across all 10 priority pairs.
    * ALL-INTEGER arithmetic end to end, so costs, mins and sums are
    * engine-exact with no rounding contract.
    *
    * The DP is evaluated as a PER-PAIR HIGHER-ORDER-FUNCTION FOLD: each
    * pair's two PAA series are bounded arrays ([[DtwSegs]] elements by
    * construction — the collect is the documented k-bounded kind), and
    * the recurrence folds row by row inside one `aggregate` expression
    * (inner fold over j carries the in-row D(i,j−1) dependency) — the
    * whole DP is ONE shuffle-free projection after the PAA aggregate, no
    * per-diagonal job scheduling. Out-of-band cells hold an INF sentinel
    * (min-then-guard, never INF+c), which is exactly the "min over the
    * predecessors that exist" banded semantics. The ORACLE evaluates the
    * same recurrence as an anti-diagonal WAVEFRONT — 2·[[DtwSegs]]−2
    * chained materialized CTEs (the q_graph_kcore peel precedent), the
    * form a pure-relational engine would use — so the two independent
    * evaluation orders grading equal is itself evidence the DP is right.
    * (A first cut ran the wavefront Spark-side too: 18 synchronized
    * ~50-row rounds cost 3.8 s steady in pure job scheduling; the fold
    * is the Spark-first shape for band-bounded series.)
    *
    * Scale: the PAA pass is one hash shuffle on the series key over raw
    * rows; the fold then runs embarrassingly parallel per pair — at
    * 100 TB with millions of series pairs the DP is a map-side
    * expression over the pair join, linear in series length via the
    * band, never O(n·m) and never a cross-cluster iteration barrier.
    * The wavefront form stays the right answer only when ONE series is
    * too long for an executor row — re-segment (PAA) first. */
  private[graft] def dtwPlan(spark: SparkSession, sfDir: String,
                             band: Int): DataFrame = {
    import spark.implicits._
    dtwBandCheck(DtwSegs, DtwSegs, band)
    val daily = Catalog.load(spark, sfDir, "orders")
      .groupBy($"o_orderpriority".as("p"),
        date_trunc("day", $"o_orderdate").as("day"))
      .agg(sum(($"o_totalprice".cast("decimal(14,2)") * 100).cast("long"))
        .as("cents"))
    val w = Window.partitionBy($"p").orderBy($"day".asc)
    val pos = daily.select($"p", $"cents",
      (row_number().over(w) - 1).cast("long").as("idx"),
      count(lit(1)).over(Window.partitionBy($"p")).as("n"))
    val seg = pos
      .groupBy($"p", expr(s"idx * $DtwSegs div n").as("s"))
      .agg(expr("sum(cents) div count(1)").as("x"))
    // Bounded collect: exactly DtwSegs elements per key by construction.
    val series = seg.groupBy($"p")
      .agg(array_sort(collect_list(struct($"s", $"x"))).as("sx"))
      .select($"p", transform($"sx", e => e("x")).as("xs"))
    val n = DtwSegs
    val inf = lit(Long.MaxValue / 4)
    // prev holds [D(i-1,0) .. D(i-1,n)]; acc inside the inner fold holds
    // [D(i,0) .. D(i,j-1)] so element_at(acc, j) IS the in-row D(i,j-1).
    val initRow = concat(array(lit(0L)),
      transform(sequence(lit(1), lit(n)), _ => inf))
    val dp = aggregate(
      sequence(lit(1), lit(n)),
      initRow,
      (prev, i) => aggregate(
        sequence(lit(1), lit(n)),
        array(inf),
        (acc, j) => {
          val m = least(element_at(prev, (j + 1).cast("int")),
            element_at(prev, j.cast("int")),
            element_at(acc, j.cast("int")))
          val c = abs(element_at($"xa", i.cast("int")) -
            element_at($"xb", j.cast("int")))
          val v = when(abs(i - j) > band, inf)
            .when(m >= inf, inf)
            .otherwise(c + m)
          concat(acc, array(v))
        }),
      row => element_at(row, n + 1))
    series.select($"p".as("pa"), $"xs".as("xa"))
      .join(series.select($"p".as("pb"), $"xs".as("xb")), $"pa" < $"pb")
      .select($"pa", $"pb", dp.as("dtw"))
      .orderBy($"pa".asc_nulls_first, $"pb".asc_nulls_first)
  }

  private def tsDtwBanded(spark: SparkSession, sfDir: String): DataFrame =
    dtwPlan(spark, sfDir, DtwBand)

  private val MpLen = 7 // subsequence window length (one week of days)

  /** MATRIX PROFILE (round 17; named beside banded DTW in the r16
    * VERDICT's elastic-distance gap) — per window start i over the
    * year-2000 daily-cents series: the L1 distance to its NEAREST
    * NON-TRIVIAL neighbor window (|i−j| ≥ [[MpLen]], the standard
    * exclusion zone) and that neighbor's index — the profile whose
    * minima are the series' MOTIFS and maxima its DISCORDS. The
    * non-normalized integer-L1 variant keeps every distance an exact
    * BIGINT (daily cents are exact), so the argmin and its (dist, j)
    * tie-break are engine-exact — the z-normalized Euclidean variant
    * would put a float ulp under every comparison.
    *
    * Windows are built with [[MpLen]] stacked leads over the BOUNDED
    * one-year daily table (the q_ts_decompose global-series exception),
    * and the all-pairs scoring is a ~360-row self-join — bounded by the
    * calendar, not the corpus; the only corpus pass is the daily
    * pre-aggregation. At 100 TB (long/many series) production swaps the
    * all-pairs for MASS-style FFT scoring or a SAX-word prefilter
    * (q_ts_sax is the pack's representation for exactly that); this
    * exact form is the baseline those approximations verify against. */
  private def tsMatrixProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Catalog.load(spark, sfDir, "orders")
      .filter(year($"o_orderdate") === 2000)
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(sum(($"o_totalprice".cast("decimal(14,2)") * 100).cast("long"))
        .as("cents"))
    val w = Window.orderBy($"day".asc)
    val win = daily
      .select((row_number().over(w) - 1).cast("long").as("i"),
        array((0 until MpLen).map(k => lead($"cents", k).over(w)): _*)
          .as("wv"))
      .filter(!array_contains(transform($"wv", _.isNull), true))
    val dist = aggregate(
      zip_with($"wa", $"wb", (x, y) => abs(x - y)), lit(0L), _ + _)
    val prof = win.select($"i", $"wv".as("wa"))
      .join(win.select($"i".as("j"), $"wv".as("wb")),
        abs($"i" - $"j") >= MpLen)
      .select($"i", $"j", dist.as("d"))
    prof.groupBy($"i")
      .agg(min(struct($"d", $"j")).as("nn"))
      .select($"i", $"nn.d".as("nn_dist"), $"nn.j".as("nn_j"))
      .orderBy($"i".asc_nulls_first)
  }

  private val tsMatrixProfileOracle = s"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
          AS BIGINT) AS cents
      FROM orders WHERE year(o_orderdate) = 2000 GROUP BY 1),
    win0 AS (
      SELECT row_number() OVER (ORDER BY day ASC) - 1 AS i,
        ${(0 until MpLen).map(k =>
          s"lead(cents, $k) OVER (ORDER BY day ASC) AS c$k")
          .mkString(", ")}
      FROM daily),
    win AS (
      SELECT i, [${(0 until MpLen).map(k => s"c$k").mkString(", ")}] AS wv
      FROM win0
      WHERE ${(0 until MpLen).map(k => s"c$k IS NOT NULL")
        .mkString(" AND ")}),
    prof AS (
      SELECT a.i, b.i AS j,
        CAST((SELECT sum(abs(r[1] - r[2]))
              FROM (SELECT unnest(list_zip(a.wv, b.wv)) AS r)) AS BIGINT)
          AS d
      FROM win a JOIN win b ON abs(a.i - b.i) >= $MpLen),
    nn AS (
      SELECT i, d AS nn_dist, j AS nn_j, row_number() OVER (
        PARTITION BY i ORDER BY d ASC, j ASC) AS rn
      FROM prof)
    SELECT i, nn_dist, nn_j FROM nn WHERE rn = 1
    ORDER BY i ASC NULLS FIRST"""

  private val tsDtwBandedOracle: String = {
    val rounds = (3 to 2 * DtwSegs).map { d =>
      val prev =
        if (d == 3) "d2"
        else s"(SELECT * FROM d${d - 1} UNION ALL SELECT * FROM d${d - 2})"
      s"""d$d AS MATERIALIZED (
      SELECT c.pa, c.pb, c.i, c.j, c.c + min(p.cost) AS cost
      FROM cells c JOIN $prev p
        ON p.pa = c.pa AND p.pb = c.pb
       AND ((p.i = c.i - 1 AND p.j = c.j) OR (p.i = c.i AND p.j = c.j - 1)
            OR (p.i = c.i - 1 AND p.j = c.j - 1))
      WHERE c.i + c.j = $d
      GROUP BY c.pa, c.pb, c.i, c.j, c.c)"""
    }.mkString(",\n    ")
    s"""
    WITH daily AS (
      SELECT o_orderpriority AS p, date_trunc('day', o_orderdate) AS day,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
          AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2),
    pos AS (
      SELECT p, cents,
        row_number() OVER (PARTITION BY p ORDER BY day ASC) - 1 AS idx,
        count(*) OVER (PARTITION BY p) AS n
      FROM daily),
    seg AS (
      SELECT p, (idx * $DtwSegs) // n AS s,
        CAST(sum(cents) // count(*) AS BIGINT) AS x
      FROM pos GROUP BY 1, 2),
    cells AS MATERIALIZED (
      SELECT a.p AS pa, b.p AS pb, a.s + 1 AS i, b.s + 1 AS j,
        abs(a.x - b.x) AS c
      FROM seg a JOIN seg b
        ON a.p < b.p AND abs(a.s - b.s) <= $DtwBand),
    d2 AS MATERIALIZED (
      SELECT pa, pb, i, j, c AS cost FROM cells WHERE i = 1 AND j = 1),
    $rounds
    SELECT pa, pb, CAST(cost AS BIGINT) AS dtw FROM d${2 * DtwSegs}
    WHERE i = $DtwSegs AND j = $DtwSegs
    ORDER BY pa ASC NULLS FIRST, pb ASC NULLS FIRST"""
  }

  override val queries: Vector[Q] = Vector(
    Q("q_ts_dtw_banded", tsDtwBanded, Some(tsDtwBandedOracle)),
    Q("q_ts_matrix_profile", tsMatrixProfile, Some(tsMatrixProfileOracle)),
    Q("q_ts_sax", tsSax, Some(tsSaxOracle)),
    Q("q_ts_seasonal_strength", tsSeasonalStrength,
      Some(tsSeasonalStrengthOracle)),
    Q("q_win_pattern_vshape", winPatternVshape, Some(winPatternVshapeOracle)),
    Q("q_ts_rolling_slope", tsRollingSlope, Some(tsRollingSlopeOracle)),
    Q("q_win_drawdown", winDrawdown, Some(winDrawdownOracle)),
    Q("q_win_rolling_distinct_sketch", rollingDistinctSketch, None),
    Q("q_ts_acf", tsAcf, Some(tsAcfOracle)),
    Q("q_ts_holt", tsHolt, Some(tsHoltOracle)),
    Q("q_ts_holt_winters", tsHoltWinters, Some(tsHoltWintersOracle)),
    Q("q_ts_xcorr", tsXcorr, Some(tsXcorrOracle)),
    Q("q_ts_mom_growth", tsMomGrowth, Some(tsMomGrowthOracle)),
    Q("q_ts_changepoint", tsChangepoint, Some(tsChangepointOracle)),
    Q("q_ts_gapfill", gapfill, Some(gapfillOracle)),
    Q("q_ts_forecast_snaive", tsForecastSnaive, Some(tsForecastSnaiveOracle)),
    Q("q_ts_backtest", tsBacktest, Some(tsBacktestOracle)),
    Q("q_win_interval_union", winIntervalUnion, Some(winIntervalUnionOracle)),
    Q("q_ts_decompose", tsDecompose, Some(tsDecomposeOracle)),
    Q("q_ts_downsample_ohlc", downsampleOhlc, Some(downsampleOhlcOracle)),
    Q("q_ts_interpolate", interpolate, Some(interpolateOracle)),
    Q("q_win_range_frame", rangeFrame, Some(rangeFrameOracle)),
    Q("q_ts_ewma", ewma, Some(ewmaOracle)),
    Q("q_ts_anomaly", anomaly, Some(anomalyOracle)),
    Q("q_ts_outlier_mad", outlierMad, Some(outlierMadOracle)),
    Q("q_win_rolling_distinct", rollingDistinct, Some(rollingDistinctOracle)),
    Q("q_win_cumulative_distinct", cumulativeDistinct,
      Some(cumulativeDistinctOracle)),
  )


}
