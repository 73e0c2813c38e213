package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryPack}
import graft.Dsl._

/** SURVEY.md §2.S — Feature engineering (added round 10 batch 3): the
  * standard tabular-ML encoding/scaling toolkit a training-data pipeline
  * runs just before materializing feature tables. Every operator is
  * deterministic and oracle-paired; none uses `rand()` or engine-specific
  * hashing (the bucket hash is the repo's masked Knuth multiplicative hash,
  * exact in int64 on both engines).
  *
  * Scale posture (100 TB):
  *  - Encodings that need GROUP STATISTICS (min-max, z-score, target, WoE,
  *    frequency) are all built the same way: ONE map-side-combined hash
  *    aggregation down to the category-domain cardinality (5-125 rows
  *    here; bounded by the domain, not the corpus), then a BROADCAST join
  *    back onto the rows. Never a whole-partition window over raw rows —
  *    `Window.partitionBy(segment)` would put every segment's full row set
  *    into one task at 100 TB.
  *  - Global statistics (the target prior, WoE class totals) ride an
  *    unpartitioned window over the already-aggregated domain table — the
  *    single-task window touches ≤|domain| rows, never the corpus (same
  *    rule as q_profile_entropy).
  *  - Quantile binning reuses `DistributedRank.ntileExact` (range-bucketed
  *    exact global ntile — no single-partition sort; SURVEY §4.3).
  *  - One-hot and hash encodings are stateless projections: pure codegen,
  *    no shuffle beyond the deterministic output ordering.
  */
object FeatureEng extends QueryPack {

  /** TIME-SAFE (leakage-free) TARGET ENCODING (round 17) — the temporal
    * counterpart to q_feat_target_encode_cv's fold-out-of-fold contract:
    * a feature computed AT time t may only see data STRICTLY BEFORE t,
    * the rule every production feature store enforces (an expanding-mean
    * encode that includes the current row leaks the label; one that
    * includes later rows is a time machine). Per order: the customer's
    * count of PAST orders and their integral-mean past cents — an
    * expanding window to row −1 ordered by (date, orderkey) so date ties
    * resolve deterministically; a customer's first order encodes NULL
    * (the honest cold-start marker — fabricating a prior from the full
    * table would itself leak).
    *
    * Exactness: all integer (cents sums, integral `div` ↔ `//`). Scale:
    * ONE hash shuffle on the entity key; the expanding frame streams
    * per-partition — the same shape at any history length, never a
    * self-join on time ranges.
    */
  private def featTargetEncodeTime(spark: SparkSession,
                                   sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    table(spark, sfDir)("orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate",
        ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long")
          .as("cents"))
      .select($"o_orderkey",
        count(lit(1)).over(w).as("past_n"),
        sum($"cents").over(w).as("past_sum"))
      .select($"o_orderkey", $"past_n",
        when($"past_n" > 0, expr("past_sum div past_n"))
          .as("past_avg_cents"))
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  private val featTargetEncodeTimeOracle = """
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_orderdate,
        CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    enc AS (
      SELECT o_orderkey,
        CAST(count(*) OVER w AS BIGINT) AS past_n,
        CAST(sum(cents) OVER w AS BIGINT) AS past_sum
      FROM o
      WINDOW w AS (PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT o_orderkey, past_n,
      CASE WHEN past_n > 0 THEN CAST(past_sum // past_n AS BIGINT) END
        AS past_avg_cents
    FROM enc
    ORDER BY o_orderkey ASC NULLS FIRST"""

  /** One-hot encoding of c_mktsegment into a fixed indicator-column set.
    * The domain is enumerated in the plan (5 literal arms), NOT discovered
    * at runtime — discovery would make the output schema data-dependent,
    * which neither a feature store nor the column-sorted differ tolerates.
    * Stateless projection: whole-stage codegen, zero shuffles before the
    * output ordering.
    */
  private def featOnehot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val inds = segs.map(s =>
      when($"c_mktsegment" === s, 1L).otherwise(0L)
        .as(s"is_${s.toLowerCase}"))
    table(spark, sfDir)("customer")
      .select($"c_custkey" +: inds: _*)
      .orderBy($"c_custkey".asc)
  }

  private val featOnehotOracle = """
    SELECT c_custkey,
      CAST(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS BIGINT) AS is_automobile,
      CAST(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END AS BIGINT) AS is_building,
      CAST(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END AS BIGINT) AS is_furniture,
      CAST(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END AS BIGINT) AS is_household,
      CAST(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 ELSE 0 END AS BIGINT) AS is_machinery
    FROM customer
    ORDER BY c_custkey ASC"""

  /** The hashing trick: map a (numeric-keyed) feature into a fixed 64-slot
    * space with the repo's masked Knuth multiplicative hash — 31-bit mask
    * before the multiply so the product never overflows int64 (the
    * ADVICE-round fix), making the bucket assignment EXACT on both engines
    * where engine hash builtins (xxhash64 vs DuckDB's hash) never agree.
    * Collisions are the feature-hashing contract, not a bug: the graded
    * output is per-bucket cardinality + mass, what a downstream model sees.
    */
  private def featHashBucket(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = ($"c_custkey".bitwiseAND(lit(2147483647L)) * lit(2654435761L)) %
      lit(4294967296L) % lit(64L)
    table(spark, sfDir)("customer")
      .groupBy(h.as("bucket"))
      .agg(count(lit(1)).as("n"), dsum($"c_acctbal").as("bal_mass"))
      .orderBy($"bucket".asc)
  }

  private val featHashBucketOracle = s"""
    SELECT ((c_custkey & 2147483647) * 2654435761) % 4294967296 % 64 AS bucket,
      count(*) AS n,
      ${graft.Oracle.dsum("c_acctbal")} AS bal_mass
    FROM customer
    GROUP BY 1
    ORDER BY bucket ASC"""

  /** Per-segment min-max scaling of account balance. The group stats come
    * from one hash aggregation down to the 5-row segment domain, broadcast
    * back — NOT `Window.partitionBy(segment)`, which would funnel each
    * segment's entire row set through one task at scale. The scaled value
    * is raw per-row IEEE arithmetic on exactly-agreed inputs (min/max are
    * data values; subtraction/division identical cross-engine), with the
    * degenerate one-value group pinned to 0.5 explicitly.
    */
  private def featMinmax(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = table(spark, sfDir)("customer")
    val stats = cust.groupBy($"c_mktsegment".as("seg"))
      .agg(min($"c_acctbal").as("mn"), max($"c_acctbal").as("mx"))
    cust.join(broadcast(stats), $"c_mktsegment" === $"seg")
      .select($"c_custkey", $"c_mktsegment",
        when($"mx" > $"mn", ($"c_acctbal" - $"mn") / ($"mx" - $"mn"))
          .otherwise(lit(0.5)).as("acctbal_scaled"))
      .orderBy($"c_custkey".asc)
  }

  private val featMinmaxOracle = """
    WITH stats AS (
      SELECT c_mktsegment AS seg, min(c_acctbal) AS mn, max(c_acctbal) AS mx
      FROM customer GROUP BY 1)
    SELECT c_custkey, c_mktsegment,
      CASE WHEN mx > mn THEN (c_acctbal - mn) / (mx - mn) ELSE 0.5 END
        AS acctbal_scaled
    FROM customer JOIN stats ON c_mktsegment = seg
    ORDER BY c_custkey ASC"""

  /** Per-priority z-score of order value: same agg-then-broadcast shape as
    * min-max. The mean is exact (decimal sum over count); stddev_samp is
    * merge-order-dependent in its last ulps on BOTH engines, so the z-score
    * is rounded to 4 decimals (`r4` rule: continuous inputs, rounding
    * resolution ≫ the drift — the q_agg_stats precedent).
    */
  private def featZscore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = table(spark, sfDir)("orders")
    val stats = orders.groupBy($"o_orderpriority".as("prio"))
      .agg((sum($"o_totalprice".cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("mu"),
        stddev_samp($"o_totalprice").as("sd"))
    orders.join(broadcast(stats), $"o_orderpriority" === $"prio")
      .select($"o_orderkey", $"o_orderpriority",
        // Degenerate guard: a single-row or constant group has sd = 0 (or
        // null for n = 1); emit NULL instead of ±Infinity so the encoding
        // stays join-safe. Mirrored in the oracle.
        when($"sd" > 0.0,
          round(($"o_totalprice" - $"mu") / $"sd", 4)).as("price_z"))
      .orderBy($"o_orderkey".asc)
  }

  private val featZscoreOracle = """
    WITH stats AS (
      SELECT o_orderpriority AS prio,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*)
          AS mu,
        stddev_samp(o_totalprice) AS sd
      FROM orders GROUP BY 1)
    SELECT o_orderkey, o_orderpriority,
      CASE WHEN sd > 0.0
        THEN round((o_totalprice - mu) / sd, 4) END AS price_z
    FROM orders JOIN stats ON o_orderpriority = prio
    ORDER BY o_orderkey ASC"""

  /** Decile binning of order value with exact global ntile semantics —
    * `DistributedRank.ntileExact` (range-bucketed rank + broadcast offsets,
    * SURVEY §4.3) instead of the single-partition `ntile() OVER (ORDER BY
    * …)` window, with the unique orderkey as tiebreak. Graded output is
    * the per-bin profile (count, bounds, mass) a binned-feature audit
    * reads.
    */
  private def featBinQuantile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val binned = DistributedRank.ntileExact(
      table(spark, sfDir)("orders").select($"o_orderkey", $"o_totalprice"),
      10, "o_totalprice", ascending = true, "o_orderkey", "bin")
    binned.groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        min($"o_totalprice").as("lo"),
        max($"o_totalprice").as("hi"),
        dsum($"o_totalprice").as("mass"))
      .orderBy($"bin".asc)
  }

  private val featBinQuantileOracle = s"""
    WITH b AS (
      SELECT o_totalprice,
        ntile(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS bin
      FROM orders)
    SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n,
      min(o_totalprice) AS lo, max(o_totalprice) AS hi,
      ${graft.Oracle.dsum("o_totalprice")} AS mass
    FROM b
    GROUP BY bin
    ORDER BY bin ASC"""

  /** Smoothed target encoding of mktsegment against the "large order" rate
    * (o_totalprice > 300000): enc = (k + m·prior) / (n + m), m = 20. Both
    * k/n and the global prior are integer counts, so the encoding is the
    * same double expression on both engines — no rounding needed. The
    * prior rides an unpartitioned window over the 5-row segment table
    * (bounded by the domain), and the fact-side join keys on the customer
    * dim broadcast.
    */
  private def featTargetEncode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = table(spark, sfDir) _
    val perSeg = t("orders")
      .join(broadcast(t("customer").select($"c_custkey", $"c_mktsegment")),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(when($"o_totalprice" > 300000.0, 1L).otherwise(0L)).as("k"))
    perSeg
      .withColumn("n_tot", sum($"n").over())
      .withColumn("k_tot", sum($"k").over())
      .select($"c_mktsegment", $"n", $"k",
        (($"k" + lit(20.0) * ($"k_tot".cast("double") / $"n_tot")) /
          ($"n" + lit(20.0))).as("target_enc"))
      .orderBy($"c_mktsegment".asc_nulls_first)
  }

  private val featTargetEncodeOracle = """
    WITH per_seg AS (
      SELECT c_mktsegment, count(*) AS n,
        CAST(sum(CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END)
          AS BIGINT) AS k
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1)
    SELECT c_mktsegment, n, k,
      (k + 20.0 * (CAST((SELECT sum(k) FROM per_seg) AS DOUBLE)
        / (SELECT sum(n) FROM per_seg))) / (n + 20.0) AS target_enc
    FROM per_seg
    ORDER BY c_mktsegment ASC NULLS FIRST"""

  /** K-fold OUT-OF-FOLD target encoding (round 13) — the leakage-safe
    * variant every competition/production pipeline actually ships:
    * a row's own fold is EXCLUDED from the category statistics that
    * encode it, so the feature never memorizes its own label
    * (plain [[featTargetEncode]] leaks at small category counts).
    * Folds are deterministic (`o_custkey % 5`); for cell (nation, fold):
    * enc = (k_c − k_cf + m·prior_oof) / (n_c − n_cf + m) with m = 20 and
    * prior_oof = (K − k_f)/(N − n_f) — the global rate also excludes the
    * fold. Every input is an exact integer count, and the encoding is
    * the same two-division double chain on both engines (per-row IEEE is
    * order-free — the [[featTargetEncode]] precedent); the +m in the
    * denominator makes division-by-zero impossible by construction.
    *
    * Scale: ONE map-side-combined (category × fold) aggregation over the
    * fact join — the cell table is bounded by |categories|·|folds|
    * (125 rows), and every marginal (per-category, per-fold, global)
    * is a window over those bounded rows, not a corpus re-scan; the
    * encode table then broadcasts back onto the corpus for serving.
    */
  private def featTargetEncodeCv(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = table(spark, sfDir) _
    val cell = t("orders")
      .join(broadcast(t("customer").select($"c_custkey", $"c_nationkey")),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey", ($"o_custkey" % 5).as("fold"))
      .agg(count(lit(1)).as("n"),
        sum(when($"o_totalprice" > 300000.0, 1L).otherwise(0L)).as("k"))
    cell
      .withColumn("n_c", sum($"n").over(Window.partitionBy($"c_nationkey")))
      .withColumn("k_c", sum($"k").over(Window.partitionBy($"c_nationkey")))
      .withColumn("n_f", sum($"n").over(Window.partitionBy($"fold")))
      .withColumn("k_f", sum($"k").over(Window.partitionBy($"fold")))
      .withColumn("n_tot", sum($"n").over())
      .withColumn("k_tot", sum($"k").over())
      .select($"c_nationkey", $"fold",
        ($"n_c" - $"n").as("n_oof"), ($"k_c" - $"k").as("k_oof"),
        ((($"k_c" - $"k") + lit(20.0) *
          (($"k_tot" - $"k_f").cast("double") / ($"n_tot" - $"n_f"))) /
          (($"n_c" - $"n") + lit(20.0))).as("enc_oof"))
      .orderBy($"c_nationkey".asc_nulls_first, $"fold".asc_nulls_first)
  }

  private val featTargetEncodeCvOracle = """
    WITH cell AS (
      SELECT c_nationkey, o_custkey % 5 AS fold, count(*) AS n,
        CAST(sum(CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END)
          AS BIGINT) AS k
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    m AS (
      SELECT c_nationkey, fold, n, k,
        CAST(sum(n) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_c,
        CAST(sum(k) OVER (PARTITION BY c_nationkey) AS BIGINT) AS k_c,
        CAST(sum(n) OVER (PARTITION BY fold) AS BIGINT) AS n_f,
        CAST(sum(k) OVER (PARTITION BY fold) AS BIGINT) AS k_f,
        CAST(sum(n) OVER () AS BIGINT) AS n_tot,
        CAST(sum(k) OVER () AS BIGINT) AS k_tot
      FROM cell)
    SELECT c_nationkey, fold, n_c - n AS n_oof, k_c - k AS k_oof,
      ((k_c - k) + 20.0 * (CAST(k_tot - k_f AS DOUBLE) / (n_tot - n_f)))
        / ((n_c - n) + 20.0) AS enc_oof
    FROM m
    ORDER BY c_nationkey ASC NULLS FIRST, fold ASC NULLS FIRST"""

  /** Frequency encoding of the crossed (nation × segment) categorical:
    * the cross-domain count table (≤125 rows, bounded by |nations|·|segs|)
    * is aggregated once, given its total via an unpartitioned window over
    * those bounded rows, and broadcast back onto customers. Counts are
    * integers; the relative frequency is one identical double division.
    */
  private def featFreqEncode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = table(spark, sfDir)("customer")
    val cross = cust.groupBy($"c_nationkey".as("nk"), $"c_mktsegment".as("seg"))
      .agg(count(lit(1)).as("xfreq"))
      .withColumn("tot", sum($"xfreq").over())
    cust.join(broadcast(cross),
        $"c_nationkey" === $"nk" && $"c_mktsegment" === $"seg")
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment", $"xfreq",
        ($"xfreq".cast("double") / $"tot").as("xfreq_rel"))
      .orderBy($"c_custkey".asc)
  }

  private val featFreqEncodeOracle = """
    WITH cross_tab AS (
      SELECT c_nationkey AS nk, c_mktsegment AS seg, count(*) AS xfreq
      FROM customer GROUP BY 1, 2)
    SELECT c_custkey, c_nationkey, c_mktsegment, xfreq,
      CAST(xfreq AS DOUBLE) / (SELECT sum(xfreq) FROM cross_tab) AS xfreq_rel
    FROM customer JOIN cross_tab
      ON c_nationkey = nk AND c_mktsegment = seg
    ORDER BY c_custkey ASC"""

  /** Weight-of-evidence encoding of mktsegment for the binary
    * urgent-order target: woe = ln((hi_s/hi_tot)/(lo_s/lo_tot)) per
    * segment. Counts are exact; ln's last-ulp may differ cross-engine, so
    * woe is rounded to 4 decimals (the q_profile_entropy precedent for
    * log-based measures). Class totals ride the unpartitioned window over
    * the 5-row domain table.
    */
  private def featWoe(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = table(spark, sfDir) _
    val hi = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    val perSeg = t("orders")
      .join(broadcast(t("customer").select($"c_custkey", $"c_mktsegment")),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(sum(when(hi, 1L).otherwise(0L)).as("hi_n"),
        sum(when(hi, 0L).otherwise(1L)).as("lo_n"))
    perSeg
      .withColumn("hi_tot", sum($"hi_n").over())
      .withColumn("lo_tot", sum($"lo_n").over())
      .select($"c_mktsegment", $"hi_n", $"lo_n",
        // Degenerate guard: a class empty within a segment makes the odds
        // ratio 0 or ∞ (woe ±Infinity); emit NULL — the convention WoE
        // libraries use before their smoothing step. Mirrored in the
        // oracle.
        when($"hi_n" > 0L && $"lo_n" > 0L,
          round(log(($"hi_n".cast("double") / $"hi_tot") /
            ($"lo_n".cast("double") / $"lo_tot")), 4)).as("woe"))
      .orderBy($"c_mktsegment".asc_nulls_first)
  }

  private val featWoeOracle = """
    WITH per_seg AS (
      SELECT c_mktsegment,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS hi_n,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 0 ELSE 1 END) AS BIGINT) AS lo_n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1)
    SELECT c_mktsegment, hi_n, lo_n,
      CASE WHEN hi_n > 0 AND lo_n > 0 THEN
        round(ln((CAST(hi_n AS DOUBLE) / (SELECT sum(hi_n) FROM per_seg))
          / (CAST(lo_n AS DOUBLE) / (SELECT sum(lo_n) FROM per_seg))), 4)
      END AS woe
    FROM per_seg
    ORDER BY c_mktsegment ASC NULLS FIRST"""

  /** Robust (median/IQR) scaling stats + outlier audit (added round 11) —
    * the outlier-resistant sibling of q_feat_minmax/q_feat_zscore: per
    * order priority, the exact quartiles of order value (Spark
    * `percentile` ↔ DuckDB `quantile_cont`, r4 rule), the IQR, and the
    * count outside the Tukey fences q1−1.5·IQR / q3+1.5·IQR — the stats
    * a robust scaler persists and the pre-training outlier report in one
    * pass. Fences are computed from the ROUNDED quartiles with one fixed
    * expression tree, so the fence doubles — and hence every comparison —
    * are bit-identical cross-engine.
    *
    * Scale: quartiles per group via one agg over the fact, fences
    * broadcast back for a map-side-combined conditional count — two
    * passes, no window over raw rows.
    */
  private def featRobustScale(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = table(spark, sfDir)("orders")
    val qs = orders.groupBy($"o_orderpriority".as("prio"))
      .agg(
        r4(percentile($"o_totalprice", lit(0.25))).as("q1"),
        r4(percentile($"o_totalprice", lit(0.5))).as("median"),
        r4(percentile($"o_totalprice", lit(0.75))).as("q3"))
      .withColumn("iqr", $"q3" - $"q1")
      .withColumn("lo_fence", $"q1" - lit(1.5) * $"iqr")
      .withColumn("hi_fence", $"q3" + lit(1.5) * $"iqr")
    orders.join(broadcast(qs), $"o_orderpriority" === $"prio")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        max($"q1").as("q1"), max($"median").as("median"),
        max($"q3").as("q3"), r4(max($"iqr")).as("iqr"),
        sum(when($"o_totalprice" < $"lo_fence" ||
          $"o_totalprice" > $"hi_fence", 1L).otherwise(0L)).as("n_outliers"))
      .orderBy($"o_orderpriority".asc_nulls_first)
  }

  private val featRobustScaleOracle = """
    WITH qs AS (
      SELECT o_orderpriority AS prio,
        round(quantile_cont(o_totalprice, 0.25), 4) AS q1,
        round(quantile_cont(o_totalprice, 0.5), 4) AS median,
        round(quantile_cont(o_totalprice, 0.75), 4) AS q3
      FROM orders GROUP BY 1),
    f AS (
      SELECT prio, q1, median, q3, q3 - q1 AS iqr,
        q1 - 1.5 * (q3 - q1) AS lo_fence,
        q3 + 1.5 * (q3 - q1) AS hi_fence
      FROM qs)
    SELECT o_orderpriority, count(*) AS n_orders,
      max(q1) AS q1, max(median) AS median, max(q3) AS q3,
      round(max(iqr), 4) AS iqr,
      CAST(sum(CASE WHEN o_totalprice < lo_fence
                      OR o_totalprice > hi_fence THEN 1 ELSE 0 END)
        AS BIGINT) AS n_outliers
    FROM orders JOIN f ON o_orderpriority = prio
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC NULLS FIRST"""

  /** HASHED FEATURE CROSSES (round 13): the cross of two categorical
    * columns (customer market segment × nation) hashed into 64 buckets —
    * the wide-and-deep / FM "crossed column" a feature pipeline
    * materializes when the raw cross product would blow up the embedding
    * table (here 5×25 = 125 crosses stand in for the 10^8-cross case that
    * motivates hashing). Output is the bucket table an offline audit
    * reads: per bucket the row count, the number of DISTINCT crosses
    * sharing it (the collision diagnostic — hashed crosses trade
    * collisions for memory, and this is the measurement), and exact count
    * mass.
    *
    * The string halves enter the hash as their ASCII code-point sums (the
    * q_udf_scalar mirror trick — Spark `aggregate(transform(split(…)))`
    * ≡ DuckDB `list_aggregate(list_transform(string_split(…)))`), mixed
    * asymmetrically (seg·31 + nat) then through the house masked Knuth
    * multiplicative hash mod 64 — all int64-exact in both engines; the
    * ascii sums are ≤ ~10^3·len, nowhere near the 31-bit mask.
    *
    * Scale: the cross + hash is a stateless scan-side projection; ONE
    * map-side-combined aggregation keyed by bucket (≤64 groups) with the
    * distinct-cross count riding the same shuffle family. The nation name
    * arrives via a 25-row broadcast dim join.
    */
  private def featCrossed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def asciiSum(c: String): org.apache.spark.sql.Column =
      expr(s"aggregate(transform(split($c, ''), ch -> ascii(ch)), 0, (a, b) -> a + b)")
    val nat = table(spark, sfDir)("nation")
      .select($"n_nationkey", $"n_name")
    val crossed = table(spark, sfDir)("customer")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"c_mktsegment", $"n_name",
        ((asciiSum("c_mktsegment").cast("long") * 31L +
          asciiSum("n_name").cast("long")).bitwiseAND(lit(2147483647L))
          * 2654435761L % 4294967296L % 64L).as("bucket"))
    crossed.groupBy($"bucket")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"c_mktsegment", $"n_name").as("n_crosses"))
      .orderBy($"bucket".asc_nulls_first)
  }

  private val featCrossedOracle = """
    WITH c AS (
      SELECT c_mktsegment, n_name,
        ((list_aggregate(list_transform(string_split(c_mktsegment, ''), ch -> ascii(ch)), 'sum') * 31
          + list_aggregate(list_transform(string_split(n_name, ''), ch -> ascii(ch)), 'sum'))
         & 2147483647) * 2654435761 % 4294967296 % 64 AS bucket_h
      FROM customer JOIN nation ON c_nationkey = n_nationkey)
    SELECT CAST(bucket_h AS BIGINT) AS bucket, count(*) AS n_rows,
      count(DISTINCT (c_mktsegment, n_name)) AS n_crosses
    FROM c GROUP BY bucket_h
    ORDER BY bucket ASC NULLS FIRST"""

  override val queries: Vector[Q] = Vector(
    Q("q_feat_crossed", featCrossed, Some(featCrossedOracle)),
    Q("q_feat_robust_scale", featRobustScale, Some(featRobustScaleOracle)),
    Q("q_feat_onehot", featOnehot, Some(featOnehotOracle)),
    Q("q_feat_target_encode_time", featTargetEncodeTime,
      Some(featTargetEncodeTimeOracle)),
    Q("q_feat_hash_bucket", featHashBucket, Some(featHashBucketOracle)),
    Q("q_feat_minmax", featMinmax, Some(featMinmaxOracle)),
    Q("q_feat_zscore", featZscore, Some(featZscoreOracle)),
    Q("q_feat_bin_quantile", featBinQuantile, Some(featBinQuantileOracle)),
    Q("q_feat_target_encode", featTargetEncode, Some(featTargetEncodeOracle)),
    Q("q_feat_target_encode_cv", featTargetEncodeCv,
      Some(featTargetEncodeCvOracle)),
    Q("q_feat_freq_encode", featFreqEncode, Some(featFreqEncodeOracle)),
    Q("q_feat_woe", featWoe, Some(featWoeOracle)),
  )
}
