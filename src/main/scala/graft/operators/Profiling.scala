package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Catalog, Q, QueryPack}
import graft.Dsl.dsum

/** SURVEY.md §2.P — data profiling / statistics (added round 5): the
  * data-quality layer a training-data pipeline runs before anything else.
  *
  * Scale notes (100 TB posture):
  *  - The column profiler runs one TWO-PHASE pass per column: groupBy(value)
  *    hash aggregation over a narrow column-pruned scan, then a tiny final
  *    agg over the distinct values. This keeps every stage HashAggregate —
  *    the tempting single agg with multi-column `countDistinct` + string
  *    min/max compiles to SortAggregate over a 6x Expand (string aggregation
  *    buffers disable hash aggregation) and measured 5x slower. At 100 TB
  *    swap `approx_count_distinct` in for a one-pass no-shuffle-per-column
  *    variant.
  *  - The histogram is two passes: a min/max bounds pass (broadcast back as
  *    a 1-row build side), then a per-row bin computation that pushes into
  *    the scan and one |bins|-cell hash aggregation.
  *  - The correlation matrix computes ALL pairwise moments in one
  *    map-side-combined pass (15 aggregates over 4 columns), then derives
  *    corr/covariance/slope from the moments in plain column arithmetic.
  *    Decimal moment sums make the result BIT-EXACT and order-independent:
  *    fixture values are 2-decimal rationals, so x·y and x² are exact
  *    4-decimal rationals, decimal addition is associative, and the final
  *    double arithmetic is the same IEEE expression on both engines — no
  *    `corr()` builtin (whose one-pass update order is engine-specific), no
  *    rounding tolerance needed.
  */
object Profiling extends QueryPack {

  /** One-pass profile of five `orders` columns: row/null/distinct counts,
    * numeric min/max (as double), string min/max — long form, one row per
    * column.
    */
  private def profileSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Per-column TWO-PHASE profile: groupBy(value) hash-agg (map-side
    // combined, narrow column-pruned scan), then a tiny final agg over the
    // distinct values. A single multi-countDistinct agg with string min/max
    // compiles to SortAggregate over the 6x Expand (string buffers disable
    // HashAggregate) and measured 2.7 s at sf0.1; this form is all
    // HashAggregate.
    val orders = Catalog.load(spark, sfDir, "orders")
    val dNull = lit(null).cast("double")
    val sNull = lit(null).cast("string")
    def base(colName: String) =
      orders.groupBy(col(colName).as("v")).agg(count(lit(1)).as("cnt"))
    def num(colName: String) = base(colName).agg(
        sum($"cnt").as("n_rows"),
        coalesce(sum(when($"v".isNull, $"cnt")), lit(0L)).as("n_nulls"),
        count($"v").as("n_distinct"),
        min($"v").cast("double").as("min_v"),
        max($"v").cast("double").as("max_v"))
      .select(lit(colName).as("col_name"), $"n_rows", $"n_nulls",
        $"n_distinct", $"min_v", $"max_v", sNull.as("min_s"), sNull.as("max_s"))
    def str(colName: String) = base(colName).agg(
        sum($"cnt").as("n_rows"),
        coalesce(sum(when($"v".isNull, $"cnt")), lit(0L)).as("n_nulls"),
        count($"v").as("n_distinct"),
        min($"v").as("min_s"),
        max($"v").as("max_s"))
      .select(lit(colName).as("col_name"), $"n_rows", $"n_nulls",
        $"n_distinct", dNull.as("min_v"), dNull.as("max_v"), $"min_s", $"max_s")
    num("o_orderkey")
      .union(num("o_custkey"))
      .union(num("o_totalprice"))
      .union(str("o_orderstatus"))
      .union(str("o_orderpriority"))
      .orderBy($"col_name".asc_nulls_first)
  }

  private val profileSummaryOracle = """
    WITH a AS (SELECT
        count(*) AS n_rows,
        count(o_orderkey) AS nn_okey, count(DISTINCT o_orderkey) AS nd_okey,
        min(o_orderkey) AS mn_okey, max(o_orderkey) AS mx_okey,
        count(o_custkey) AS nn_ckey, count(DISTINCT o_custkey) AS nd_ckey,
        min(o_custkey) AS mn_ckey, max(o_custkey) AS mx_ckey,
        count(o_totalprice) AS nn_tp, count(DISTINCT o_totalprice) AS nd_tp,
        min(o_totalprice) AS mn_tp, max(o_totalprice) AS mx_tp,
        count(o_orderstatus) AS nn_os, count(DISTINCT o_orderstatus) AS nd_os,
        min(o_orderstatus) AS mn_os, max(o_orderstatus) AS mx_os,
        count(o_orderpriority) AS nn_op, count(DISTINCT o_orderpriority) AS nd_op,
        min(o_orderpriority) AS mn_op, max(o_orderpriority) AS mx_op
      FROM orders)
    SELECT * FROM (
      SELECT 'o_orderkey' AS col_name, n_rows, n_rows - nn_okey AS n_nulls,
        nd_okey AS n_distinct, CAST(mn_okey AS DOUBLE) AS min_v,
        CAST(mx_okey AS DOUBLE) AS max_v,
        CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s FROM a
      UNION ALL
      SELECT 'o_custkey', n_rows, n_rows - nn_ckey, nd_ckey,
        CAST(mn_ckey AS DOUBLE), CAST(mx_ckey AS DOUBLE), NULL, NULL FROM a
      UNION ALL
      SELECT 'o_totalprice', n_rows, n_rows - nn_tp, nd_tp,
        mn_tp, mx_tp, NULL, NULL FROM a
      UNION ALL
      SELECT 'o_orderstatus', n_rows, n_rows - nn_os, nd_os,
        CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_os, mx_os FROM a
      UNION ALL
      SELECT 'o_orderpriority', n_rows, n_rows - nn_op, nd_op,
        CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_op, mx_op FROM a)
    ORDER BY col_name ASC NULLS FIRST"""

  /** 20-bin equi-width histogram of o_totalprice between the observed
    * min/max; identical bin/edge arithmetic on both engines.
    */
  /** 2-D histogram profile (added round 10): the JOINT distribution of
    * events over hour-of-day × value bucket — the heatmap behind
    * "when do the big ones happen", and the first check for independence
    * between a time dimension and a measure. One map-side-combined hash
    * aggregation over at most 24 × |value buckets| cells; counts are
    * integers and the bucket edges (floor(value/10)) are exact IEEE ops,
    * so the cell table hashes identically cross-engine. Share is computed
    * against the integer total via ppm `div` — no float division.
    */
  private def histogram2d(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Catalog.load(spark, sfDir, "events")
      .select(hour($"ts").cast("long").as("hour_of_day"),
        floor($"value" / 10.0d).cast("long").as("value_bucket"))
      .groupBy($"hour_of_day", $"value_bucket")
      .agg(count(lit(1)).as("n"))
    cells
      .withColumn("share_ppm",
        expr("n * 1000000 div sum(n) OVER ()"))
      .orderBy($"hour_of_day".asc_nulls_first, $"value_bucket".asc_nulls_first)
  }

  private val histogram2dOracle = """
    WITH cells AS (
      SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
        CAST(floor(value / 10.0) AS BIGINT) AS value_bucket,
        count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT hour_of_day, value_bucket, n,
      CAST((n * 1000000) // sum(n) OVER () AS BIGINT) AS share_ppm
    FROM cells
    ORDER BY hour_of_day ASC NULLS FIRST, value_bucket ASC NULLS FIRST"""

  private def histogram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Catalog.load(spark, sfDir, "orders").select($"o_totalprice")
    val b = o.agg(min($"o_totalprice").as("mn"), max($"o_totalprice").as("mx"))
    val bin = least(floor(($"o_totalprice" - $"mn") * lit(20.0) / ($"mx" - $"mn")),
      lit(19.0)).cast("long")
    o.crossJoin(broadcast(b))
      .select(bin.as("bin"), $"mn", $"mx")
      .groupBy($"bin", $"mn", $"mx")
      .agg(count(lit(1)).as("n"))
      .select($"bin",
        ($"mn" + $"bin".cast("double") * (($"mx" - $"mn") / lit(20.0))).as("lo"),
        ($"mn" + ($"bin" + lit(1L)).cast("double") * (($"mx" - $"mn") / lit(20.0))).as("hi"),
        $"n",
        ($"n".cast("double") / sum($"n").over(Window.partitionBy())).as("share"))
      .orderBy($"bin".asc_nulls_first)
  }

  private val histogramOracle = """
    WITH b AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
    binned AS (
      SELECT CAST(least(floor((o_totalprice - mn) * 20.0 / (mx - mn)), 19.0) AS BIGINT) AS bin,
             mn, mx
      FROM orders CROSS JOIN b),
    g AS (SELECT bin, mn, mx, count(*) AS n FROM binned GROUP BY bin, mn, mx)
    SELECT bin,
      mn + CAST(bin AS DOUBLE) * ((mx - mn) / 20.0) AS lo,
      mn + CAST(bin + 1 AS DOUBLE) * ((mx - mn) / 20.0) AS hi,
      n,
      CAST(n AS DOUBLE) / CAST(CAST(sum(n) OVER () AS BIGINT) AS DOUBLE) AS share
    FROM g
    ORDER BY bin ASC NULLS FIRST"""

  /** Exact top-5 most frequent values of three categorical columns (from
    * three different tables), with frequency share. Ties broken by value.
    */
  private def freqValues(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def counted(df: DataFrame, colName: String): DataFrame =
      df.groupBy(col(colName).as("value"))
        .agg(count(lit(1)).as("n"))
        .select(lit(colName).as("col_name"), $"value", $"n")
    val all =
      counted(Catalog.load(spark, sfDir, "orders"), "o_orderpriority")
        .union(counted(Catalog.load(spark, sfDir, "customer"), "c_mktsegment"))
        .union(counted(Catalog.load(spark, sfDir, "part"), "p_brand"))
    val w = Window.partitionBy($"col_name")
      .orderBy($"n".desc, $"value".asc_nulls_first)
    val wTot = Window.partitionBy($"col_name")
    all
      .withColumn("share", $"n".cast("double") / sum($"n").over(wTot).cast("double"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 5)
      .select($"col_name", $"value", $"n", $"share", $"rk")
      .orderBy($"col_name".asc_nulls_first, $"rk".asc_nulls_first)
  }

  private val freqValuesOracle = """
    WITH counted AS (
      SELECT 'o_orderpriority' AS col_name, o_orderpriority AS value, count(*) AS n
      FROM orders GROUP BY 2
      UNION ALL
      SELECT 'c_mktsegment', c_mktsegment, count(*) FROM customer GROUP BY 2
      UNION ALL
      SELECT 'p_brand', p_brand, count(*) FROM part GROUP BY 2),
    ranked AS (
      SELECT col_name, value, n,
        CAST(n AS DOUBLE) /
          CAST(CAST(sum(n) OVER (PARTITION BY col_name) AS BIGINT) AS DOUBLE) AS share,
        row_number() OVER (PARTITION BY col_name
                           ORDER BY n DESC, value ASC NULLS FIRST) AS rk
      FROM counted)
    SELECT col_name, value, n, share, rk FROM ranked WHERE rk <= 5
    ORDER BY col_name ASC NULLS FIRST, rk ASC NULLS FIRST"""

  private val corrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Pairwise Pearson correlation / population covariance / regression slope
    * over four lineitem measures, from one pass of exact decimal moments.
    */
  private def corrMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = for {
      i <- corrCols.indices; j <- corrCols.indices if i < j
    } yield (corrCols(i), corrCols(j))
    // Exactness strategy (same rationals as before, different arithmetic):
    // the 2-decimal money values are exactly recovered by the decimal(14,2)
    // cast, so ×100 + cast long gives exact integer CENTS, and every product
    // and partial sum below is plain codegen'd LONG arithmetic — the
    // previous single-pass decimal(38,4) sums ran interpreted BigDecimal
    // per row, which made this the most contention-fragile plan in the
    // suite (23.3 s in the loaded r7 driver bench vs 1.5-2.0 s quiet).
    // Long partials are exact but can overflow, so the sums are TWO-level:
    // rows are salted into groups sized so a group's sum stays far under
    // Long.Max (max per-row term is price_cents² ≈ 1.2e14; ~5e3 expected
    // rows per group → ~6e17 worst-case group sum, 15× under Long.Max —
    // and xxhash64 group sizes concentrate tightly around the mean, so a
    // 15× excursion cannot occur in practice), then the per-group
    // partials — thousands of rows, not millions — are summed in decimal.
    // Spark 4's default ANSI mode makes any sizing violation a loud
    // ArithmeticException, never a silent wrap. Salt cardinality derives
    // from one bounded driver action (a count scalar, the accepted
    // approxQuantile-class pattern), so the plan stays sized at any SF.
    val li = Catalog.load(spark, sfDir, "lineitem")
    val nRows = li.count()
    val g = math.max(64L, nRows / 5000L + 1L)
    val cents = corrCols.map(c =>
      (col(c).cast("decimal(14,2)") * 100).cast("long").as(c))
    val keyed = li.select(
      pmod(xxhash64($"l_orderkey", $"l_linenumber"), lit(g)).as("__g") +: cents: _*)
    val partials =
      corrCols.map(c => sum(col(c)).as(s"s_$c")) ++
      corrCols.map(c => sum(col(c) * col(c)).as(s"ss_$c")) ++
      pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_$b") }
    val lvl1 = keyed.groupBy($"__g").agg(count(lit(1)).as("cnt"), partials: _*)
    // Final decimal pass over |g| partial rows: /100 (cents) or /10000
    // (cents²) is exact at scale >= 4, and the decimal(38,4) cast pins the
    // SAME value+scale the old single-pass sums produced, so the
    // correctly-rounded double conversion is bit-identical to before (and
    // to the oracle's VARCHAR-routed conversion).
    def fin(name: String, div: Int): Column =
      (sum(col(name).cast("decimal(38,0)")) / lit(div))
        .cast("decimal(38,4)").cast("double").as(name)
    val finals =
      corrCols.map(c => fin(s"s_$c", 100)) ++
      corrCols.map(c => fin(s"ss_$c", 10000)) ++
      pairs.map { case (a, b) => fin(s"sp_${a}_$b", 10000) }
    val agg = lvl1.agg(sum($"cnt").cast("double").as("n"), finals: _*)
    val rows = pairs.map { case (a, b) =>
      val mx = col(s"s_$a") / $"n"
      val my = col(s"s_$b") / $"n"
      val cov = col(s"sp_${a}_$b") / $"n" - mx * my
      val vx = col(s"ss_$a") / $"n" - mx * mx
      val vy = col(s"ss_$b") / $"n" - my * my
      struct(lit(s"$a~$b").as("pair"), $"n".cast("long").as("n_rows"),
        cov.as("cov_pop"), (cov / (sqrt(vx) * sqrt(vy))).as("pearson_r"),
        (cov / vx).as("slope"))
    }
    agg.select(inline(array(rows: _*))).orderBy($"pair".asc_nulls_first)
  }

  private val corrMatrixOracle: String = {
    val pairs = for {
      i <- corrCols.indices; j <- corrCols.indices if i < j
    } yield (corrCols(i), corrCols(j))
    // DuckDB's direct DECIMAL→DOUBLE cast is not correctly rounded once the
    // significand exceeds 2^53 (measured: ...123.1690 → ...123.0, off by one
    // ulp from the correctly-rounded ...123.25 that Spark's BigDecimal cast
    // and strtod produce). Route through VARCHAR: decimal→text is exact and
    // text→double is correctly rounded on both engines.
    def dec(c: String) = s"CAST($c AS DECIMAL(14,2))"
    def msum(e: String) = s"CAST(CAST(sum($e) AS VARCHAR) AS DOUBLE)"
    val moments =
      (corrCols.map(c => s"${msum(dec(c))} AS s_$c") ++
       corrCols.map(c => s"${msum(s"${dec(c)} * ${dec(c)}")} AS ss_$c") ++
       pairs.map { case (a, b) => s"${msum(s"${dec(a)} * ${dec(b)}")} AS sp_${a}_$b" })
        .mkString(",\n        ")
    val selects = pairs.map { case (a, b) =>
      val mx = s"(s_$a / n)"
      val my = s"(s_$b / n)"
      val cov = s"(sp_${a}_$b / n - $mx * $my)"
      val vx = s"(ss_$a / n - $mx * $mx)"
      val vy = s"(ss_$b / n - $my * $my)"
      s"""SELECT '$a~$b' AS pair, CAST(n AS BIGINT) AS n_rows, $cov AS cov_pop,
        $cov / (sqrt($vx) * sqrt($vy)) AS pearson_r, $cov / $vx AS slope FROM m"""
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
        $moments
      FROM lineitem)
    SELECT * FROM (
      $selects)
    ORDER BY pair ASC NULLS FIRST"""
  }

  /** Referential-integrity audit across every FK edge of the star schema:
    * per edge the row count, distinct key count, and orphan count
    * (child keys with no parent — left-anti semantics via a left join on
    * the DISTINCT child keys, so each parent table is probed once with a
    * key set, not once per child row). All integers; fixtures are
    * orphan-free by construction (FIXTURES.md invariant 2), which is
    * exactly what an audit should report.
    */
  private def auditReferential(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def edge(name: String, child: DataFrame, key: String,
             parent: DataFrame, pkey: String): DataFrame = {
      val keys = child.select(col(key).as("k"))
      val dk = keys.distinct()
      val orphans = dk.join(parent.select(col(pkey).as("k"), lit(1).as("hit")),
          Seq("k"), "left")
        .agg(coalesce(sum(when($"hit".isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_orphan_keys"))
      keys.agg(count(lit(1)).as("n_rows"), countDistinct($"k").as("n_keys"))
        .crossJoin(orphans)
        .select(lit(name).as("fk_edge"), $"n_rows", $"n_keys", $"n_orphan_keys")
    }
    val li = Catalog.load(spark, sfDir, "lineitem")
    val o = Catalog.load(spark, sfDir, "orders")
    val c = Catalog.load(spark, sfDir, "customer")
    val p = Catalog.load(spark, sfDir, "part")
    val s = Catalog.load(spark, sfDir, "supplier")
    val n = Catalog.load(spark, sfDir, "nation")
    edge("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey")
      .union(edge("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"))
      .union(edge("lineitem.l_suppkey->supplier", li, "l_suppkey", s, "s_suppkey"))
      .union(edge("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"))
      .union(edge("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"))
      .orderBy($"fk_edge".asc_nulls_first)
  }

  private val auditReferentialOracle = """
    WITH e AS (
      SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
        (SELECT count(*) FROM lineitem) AS n_rows,
        (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS n_keys,
        (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem) k
          LEFT JOIN orders ON k.l_orderkey = o_orderkey
          WHERE o_orderkey IS NULL) AS n_orphan_keys
      UNION ALL
      SELECT 'lineitem.l_partkey->part',
        (SELECT count(*) FROM lineitem),
        (SELECT count(DISTINCT l_partkey) FROM lineitem),
        (SELECT count(*) FROM (SELECT DISTINCT l_partkey FROM lineitem) k
          LEFT JOIN part ON k.l_partkey = p_partkey WHERE p_partkey IS NULL)
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier',
        (SELECT count(*) FROM lineitem),
        (SELECT count(DISTINCT l_suppkey) FROM lineitem),
        (SELECT count(*) FROM (SELECT DISTINCT l_suppkey FROM lineitem) k
          LEFT JOIN supplier ON k.l_suppkey = s_suppkey WHERE s_suppkey IS NULL)
      UNION ALL
      SELECT 'orders.o_custkey->customer',
        (SELECT count(*) FROM orders),
        (SELECT count(DISTINCT o_custkey) FROM orders),
        (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders) k
          LEFT JOIN customer ON k.o_custkey = c_custkey WHERE c_custkey IS NULL)
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
        (SELECT count(*) FROM customer),
        (SELECT count(DISTINCT c_nationkey) FROM customer),
        (SELECT count(*) FROM (SELECT DISTINCT c_nationkey FROM customer) k
          LEFT JOIN nation ON k.c_nationkey = n_nationkey WHERE n_nationkey IS NULL))
    SELECT fk_edge, n_rows, n_keys, n_orphan_keys FROM e
    ORDER BY fk_edge ASC NULLS FIRST"""

  /** Equi-DEPTH histogram of o_totalprice (20 tiles, ~equal row counts) —
    * the quantile twin of q_profile_histogram's equi-width bins, and the
    * user-facing face of [[DistributedRank.ntileExact]]: exact global
    * ntile without a single-partition window (literal range boundaries →
    * per-bucket rank → broadcast offsets), so the plan survives any scale
    * where `ntile(20) OVER (ORDER BY …)` would funnel every row through one
    * task. The oracle IS that single-partition form — the two formulations
    * verify each other (the q_skyline_pareto pattern). Added round 7.
    */
  private def histogramEqdepth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Catalog.load(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    DistributedRank
      .ntileExact(base, 20, "o_totalprice", ascending = true,
        tieCol = "o_orderkey", out = "tile")
      .groupBy($"tile")
      .agg(
        count(lit(1)).as("n_rows"),
        min($"o_totalprice").as("lo"),
        max($"o_totalprice").as("hi"),
        dsum($"o_totalprice").as("sum_price"))
      .orderBy($"tile".asc_nulls_first)
  }

  private val histogramEqdepthOracle = s"""
    WITH t AS (
      SELECT o_totalprice,
        CAST(ntile(20) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS BIGINT) AS tile
      FROM orders)
    SELECT tile, count(*) AS n_rows, min(o_totalprice) AS lo,
      max(o_totalprice) AS hi, ${graft.Oracle.dsum("o_totalprice")} AS sum_price
    FROM t GROUP BY tile
    ORDER BY tile ASC NULLS FIRST"""

  /** Column-entropy profile (added round 9 close): Shannon entropy in bits,
    * distinct-value count and population for the low-cardinality categorical
    * columns a profiler ranks by information content (uniformity check /
    * key-candidate triage). Per column: one map-side-combined value-count
    * aggregate (|values| rows out of the scan), then the |values|-row
    * entropy fold over the bounded count table — the corpus is never
    * shuffled, only counted. Counts stay exact longs; only the final
    * p·log2(p) fold is double, rounded 4dp on both engines.
    */
  /** MUTUAL INFORMATION between categorical column pairs (round 16) — the
    * dependence measure next to [[profileEntropy]]'s per-column
    * information content: I(X;Y) = Σ p(x,y)·log2(p(x,y)/(p(x)p(y))),
    * the profiler's screen for redundant columns (I ≈ min(H)) and for
    * feature/target relevance (I ≈ 0 ⇒ the column cannot predict the
    * target). Same determinism doctrine as entropy: joint and marginal
    * counts stay exact longs off ONE map-side-combined (x, y) aggregate
    * per pair (marginals are rollups of the joint — the corpus is scanned
    * once per pair, never re-counted), and only the final |X|·|Y|-cell
    * log2 fold is double, rounded 4dp on both engines.
    *
    * Scale: the only corpus-touching pass per pair is the joint count
    * (bounded at |X|·|Y| output rows); marginal joins run on that bounded
    * cell table via broadcast. Columns with unbounded domains take a
    * bucketize/top-k front first (q_feat_bin_quantile / q_profile_freq).
    */
  private def statMutualInfo(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def pairMi(label: String, pairs: DataFrame): DataFrame = {
      val joint = pairs.groupBy($"x", $"y").agg(count(lit(1)).as("nxy"))
      val mx = joint.groupBy($"x").agg(sum($"nxy").as("nx"))
      val my = joint.groupBy($"y").agg(sum($"nxy").as("ny"))
      val tot = joint.agg(sum($"nxy").as("n"))
      val p = $"nxy".cast("double") / $"n".cast("double")
      val lift = ($"nxy".cast("double") * $"n".cast("double")) /
        ($"nx".cast("double") * $"ny".cast("double"))
      joint.join(broadcast(mx), Seq("x")).join(broadcast(my), Seq("y"))
        .crossJoin(broadcast(tot))
        .agg(lit(label).as("pair"),
          count(lit(1)).as("n_cells"),
          sum($"nxy").as("n_rows"),
          round(sum(p * log2(lift)), 4).as("mi_bits"))
    }
    val orders = Catalog.load(spark, sfDir, "orders")
    // Two independently-generated pairs (the I ≈ 0 baseline the profiler
    // screens against) plus the LEAKAGE PROBE: a bucketed feature that
    // functionally encodes the label (price band vs the high-value flag
    // cut inside band 3) — MI ≈ H(label), the signature of a feature that
    // leaks its target, which is exactly what an MI screen exists to
    // catch before training.
    pairMi("orders.o_orderpriority|o_orderstatus",
        orders.select($"o_orderpriority".as("x"), $"o_orderstatus".as("y")))
      .unionAll(pairMi("customer.c_mktsegment|c_nationkey",
        Catalog.load(spark, sfDir, "customer")
          .select($"c_mktsegment".as("x"), $"c_nationkey".as("y"))))
      .unionAll(pairMi("orders.price_band|high_value",
        orders.select(
          // exact cents (the q_eval_auc score route) div 5M = 50k bands —
          // no double→int cast, whose truncate-vs-round semantics differ
          // across engines
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)" +
            " div 5000000").as("x"),
          ($"o_totalprice" > 150000).cast("long").as("y"))))
      .orderBy($"pair".asc_nulls_first)
  }

  private val statMutualInfoOracle = {
    def pairSql(label: String, table: String, xe: String, ye: String) = s"""
      SELECT '$label' AS pair,
        CAST(count(*) AS BIGINT) AS n_cells,
        CAST(sum(nxy) AS BIGINT) AS n_rows,
        round(sum((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
          * log2((CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE))
                 / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))), 4) AS mi_bits
      FROM (
        SELECT j.x, j.y, j.nxy,
          sum(j.nxy) OVER (PARTITION BY j.x) AS nx,
          sum(j.nxy) OVER (PARTITION BY j.y) AS ny,
          sum(j.nxy) OVER () AS n
        FROM (SELECT $xe AS x, $ye AS y, count(*) AS nxy
              FROM $table GROUP BY 1, 2) j) c"""
    s"""${pairSql("orders.o_orderpriority|o_orderstatus", "orders",
        "o_orderpriority", "o_orderstatus")}
    UNION ALL${pairSql("customer.c_mktsegment|c_nationkey", "customer",
        "c_mktsegment", "c_nationkey")}
    UNION ALL${pairSql("orders.price_band|high_value", "orders",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 5000000",
        "CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END")}
    ORDER BY pair ASC NULLS FIRST"""
  }

  private def profileEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def colEntropy(table: String, column: String): DataFrame = {
      val counts = Catalog.load(spark, sfDir, table)
        .groupBy(col(column).as("v")).agg(count(lit(1)).as("n"))
      // The unpartitioned total window runs over the BOUNDED |values| count
      // table (a handful of rows), never the corpus.
      val p = $"n".cast("double") / $"tot".cast("double")
      counts.withColumn("tot", sum($"n").over())
        .agg(
          lit(s"$table.$column").as("column_name"),
          count(lit(1)).as("n_distinct"),
          sum($"n").as("n_rows"),
          round(-sum(p * log2(p)), 4).as("entropy_bits"))
    }
    colEntropy("orders", "o_orderpriority")
      .unionAll(colEntropy("customer", "c_mktsegment"))
      .unionAll(colEntropy("lineitem", "l_returnflag"))
      .orderBy($"column_name".asc_nulls_first)
  }

  private val profileEntropyOracle = """
    WITH
    c1 AS (SELECT o_orderpriority AS v, count(*) AS n FROM orders GROUP BY 1),
    c2 AS (SELECT c_mktsegment AS v, count(*) AS n FROM customer GROUP BY 1),
    c3 AS (SELECT l_returnflag AS v, count(*) AS n FROM lineitem GROUP BY 1),
    e AS (
      SELECT 'orders.o_orderpriority' AS column_name, count(*) AS n_distinct,
        CAST(sum(n) AS BIGINT) AS n_rows,
        round(-sum((CAST(n AS DOUBLE) / (SELECT sum(n) FROM c1))
          * log2(CAST(n AS DOUBLE) / (SELECT sum(n) FROM c1))), 4) AS entropy_bits
      FROM c1
      UNION ALL
      SELECT 'customer.c_mktsegment', count(*),
        CAST(sum(n) AS BIGINT),
        round(-sum((CAST(n AS DOUBLE) / (SELECT sum(n) FROM c2))
          * log2(CAST(n AS DOUBLE) / (SELECT sum(n) FROM c2))), 4)
      FROM c2
      UNION ALL
      SELECT 'lineitem.l_returnflag', count(*),
        CAST(sum(n) AS BIGINT),
        round(-sum((CAST(n AS DOUBLE) / (SELECT sum(n) FROM c3))
          * log2(CAST(n AS DOUBLE) / (SELECT sum(n) FROM c3))), 4)
      FROM c3)
    SELECT * FROM e ORDER BY column_name ASC NULLS FIRST"""

  /** Per-GROUP least-squares regression (added round 10): slope, intercept
    * and R² of extendedprice on quantity within each return flag — the
    * grouped sibling of q_stat_corr's global moment matrix (that one has no
    * grouping dimension and no R²). Same exactness strategy: quantity is an
    * exact small integer, price an exact cents long, so all five moments
    * accumulate as codegen'd LONG arithmetic inside salt groups sized from
    * one bounded count action (Σy² per ~5e3-row salt group ≈ 6e17, 15×
    * under Long.Max; ANSI mode turns any sizing violation into a loud
    * error), then |groups|·|salts| partials — never raw rows — sum exactly
    * in decimal. The closed-form fit runs as identical IEEE double
    * expressions on both engines over those bit-identical moments.
    *
    * Scale: one two-phase hash aggregation keyed (flag, salt) then (flag) —
    * both map-side combined, no window, no second scan; the same shape at
    * any SF with only the salt cardinality growing.
    */
  private def statRegression(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Catalog.load(spark, sfDir, "lineitem")
    val nRows = li.count()
    val g = math.max(64L, nRows / 5000L + 1L)
    val base = li.select(
      $"l_returnflag",
      pmod(xxhash64($"l_orderkey", $"l_linenumber"), lit(g)).as("__g"),
      $"l_quantity".cast("long").as("x"),
      ($"l_extendedprice".cast("decimal(14,2)") * 100).cast("long").as("y"))
    val lvl1 = base.groupBy($"l_returnflag", $"__g").agg(
      count(lit(1)).as("cnt"),
      sum($"x").as("sx"), sum($"x" * $"x").as("sxx"),
      sum($"y").as("sy"), sum($"y" * $"y").as("syy"),
      sum($"x" * $"y").as("sxy"))
    def fin(name: String): Column =
      sum(col(name).cast("decimal(38,0)")).cast("double").as(name)
    val m = lvl1.groupBy($"l_returnflag").agg(
      sum($"cnt").cast("double").as("n"),
      fin("sx"), fin("sxx"), fin("sy"), fin("syy"), fin("sxy"))
    // Identical IEEE expression trees on both engines (oracle mirrors the
    // association order verbatim); cents scale cancels in r2, /100 maps
    // slope and intercept back to dollars.
    val num = $"n" * $"sxy" - $"sx" * $"sy"
    val den = $"n" * $"sxx" - $"sx" * $"sx"
    val slope = num / den / lit(100.0)
    m.select(
        $"l_returnflag",
        $"n".cast("long").as("n_rows"),
        round(slope, 6).as("slope"),
        round(($"sy" / lit(100.0) - num / den / lit(100.0) * $"sx") / $"n", 6)
          .as("intercept"),
        round(num * num / (den * ($"n" * $"syy" - $"sy" * $"sy")), 6).as("r2"))
      .orderBy($"l_returnflag".asc_nulls_first)
  }

  private val statRegressionOracle = """
    WITH b AS (
      SELECT l_returnflag,
        CAST(l_quantity AS BIGINT) AS x,
        CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y
      FROM lineitem),
    m AS (
      SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
        CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx,
        CAST(CAST(sum(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
        CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
        CAST(CAST(sum(y * y) AS VARCHAR) AS DOUBLE) AS syy,
        CAST(CAST(sum(x * y) AS VARCHAR) AS DOUBLE) AS sxy
      FROM b GROUP BY l_returnflag)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      round((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0, 6) AS slope,
      round((sy / 100.0 - (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0 * sx) / n, 6)
        AS intercept,
      round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM m ORDER BY l_returnflag ASC NULLS FIRST"""

  /** Cross-table reconciliation audit (added round 10 close): order-header
    * total vs the lineitem rollup Σ extprice·(1−disc)·(1+tax), binned by
    * absolute-discrepancy band — the financial-close control every revenue
    * pipeline runs between a summary table and its detail table. The
    * fixtures' header totals are synthetic-independent of the rollup and
    * 257 orders (sf0.01) ship no lines at all, so the discrepancy bands
    * and the headers-without-detail band genuinely populate (no header
    * reconciles exactly — which is itself the audit's finding; the exact
    * and within-1 bands sit empty, proving the binning, not the data).
    * All arithmetic is exact: 2-decimal money recovers exactly in
    * decimal(18,2), the 3-factor product is an exact 6-decimal rational,
    * and discrepancies aggregate as integer MICROS (bigint), so the band
    * boundaries cannot flip cross-engine.
    *
    * Scale: one map-side-combined rollup keyed l_orderkey, one equi-join
    * to headers on the same key, one |bands|-row agg — the same two-shuffle
    * shape at any SF.
    */
  private def auditReconciliation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val actual = Catalog.load(spark, sfDir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)")
        * (lit(1) - $"l_discount".cast("decimal(8,2)"))
        * (lit(1) + $"l_tax".cast("decimal(8,2)"))).as("actual"))
    Catalog.load(spark, sfDir, "orders")
      .join(actual, $"o_orderkey" === $"l_orderkey", "left")
      .select(
        when($"actual".isNull, lit(null).cast("long"))
          .otherwise(abs(($"o_totalprice".cast("decimal(18,6)") - $"actual")
            * 1000000).cast("long")).as("abs_us"))
      .select(
        when($"abs_us".isNull, "no_lines")
          .when($"abs_us" === 0L, "exact")
          .when($"abs_us" <= 1000000L, "within_1")
          .when($"abs_us" <= 1000000000L, "within_1k")
          .when($"abs_us" <= 100000000000L, "within_100k")
          .otherwise("over_100k").as("band"),
        coalesce($"abs_us", lit(0L)).as("abs_us"))
      .groupBy($"band")
      .agg(count(lit(1)).as("n_orders"), sum($"abs_us").as("sum_abs_us"))
      .orderBy($"band".asc_nulls_first)
  }

  private val auditReconciliationOracle = """
    WITH la AS (
      SELECT l_orderkey,
        sum(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(8,2)))
          * (1 + CAST(l_tax AS DECIMAL(8,2)))) AS actual
      FROM lineitem GROUP BY 1),
    d AS (
      SELECT CASE WHEN actual IS NULL THEN NULL
        ELSE CAST(abs((CAST(o_totalprice AS DECIMAL(18,6)) - actual)
          * 1000000) AS BIGINT) END AS abs_us
      FROM orders LEFT JOIN la ON o_orderkey = l_orderkey),
    banded AS (
      SELECT CASE WHEN abs_us IS NULL THEN 'no_lines'
                  WHEN abs_us = 0 THEN 'exact'
                  WHEN abs_us <= 1000000 THEN 'within_1'
                  WHEN abs_us <= 1000000000 THEN 'within_1k'
                  WHEN abs_us <= 100000000000 THEN 'within_100k'
                  ELSE 'over_100k' END AS band,
        coalesce(abs_us, 0) AS abs_us
      FROM d)
    SELECT band, count(*) AS n_orders,
      CAST(sum(abs_us) AS BIGINT) AS sum_abs_us
    FROM banded GROUP BY band
    ORDER BY band ASC NULLS FIRST"""

  /** Chi-square test of independence over the (c_mktsegment ×
    * o_orderpriority) contingency table — "does a customer's segment change
    * its order-priority mix?" — plus Cramér's V effect size (added round
    * 10). Exactness: observed counts and both margins are exact integers
    * (window sums over the ≤ r·c cell table); each cell's expected count
    * e = rt·ct/n and term (o−e)²/e are the SAME IEEE expression on both
    * engines, and the cross-cell reduction quantizes each term to
    * DECIMAL(28,10) before the (exact, order-free) decimal sum — a tie at
    * the 10th decimal would need the double's dyadic expansion to
    * terminate mid-boundary, which it cannot.
    *
    * Scale: one broadcast customer join + one map-side-combined hash agg
    * to the r·c cell table (25 rows here; bounded by the two
    * cardinalities, not data volume); margins/window/final agg all run on
    * that tiny table.
    */
  private def statChisq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = graft.Dsl.table(spark, sfDir) _
    val obs = t("orders").select($"o_custkey", $"o_orderpriority")
      .join(broadcast(t("customer").select($"c_custkey", $"c_mktsegment")),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_orderpriority")
      .agg(count(lit(1)).as("o"))
    val cells = obs
      .withColumn("rt", sum($"o").over(Window.partitionBy($"c_mktsegment")))
      .withColumn("ct", sum($"o").over(Window.partitionBy($"o_orderpriority")))
      .withColumn("nn", sum($"o").over(Window.partitionBy()))
    val e = ($"rt" * $"ct").cast("double") / $"nn".cast("double")
    val term = ($"o".cast("double") - e) * ($"o".cast("double") - e) / e
    cells
      .agg(
        max($"nn").as("nraw"),
        countDistinct($"c_mktsegment").as("r"),
        countDistinct($"o_orderpriority").as("c"),
        sum(term.cast("decimal(28,10)")).cast("double").as("chi2raw"))
      .select(
        $"nraw".as("n"),
        (($"r" - 1) * ($"c" - 1)).as("dof"),
        $"chi2raw".as("chi2"),
        sqrt($"chi2raw" / ($"nraw".cast("double") *
          least($"r" - 1, $"c" - 1).cast("double"))).as("cramers_v"))
  }

  private val statChisqOracle = """
    WITH obs AS (
      SELECT c_mktsegment, o_orderpriority, count(*) AS o
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderpriority),
    cells AS (
      SELECT o, c_mktsegment, o_orderpriority,
        CAST(sum(o) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS rt,
        CAST(sum(o) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS ct,
        CAST(sum(o) OVER () AS BIGINT) AS nn
      FROM obs),
    terms AS (
      SELECT o, c_mktsegment, o_orderpriority, nn,
        (CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(nn AS DOUBLE))
          * (CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(nn AS DOUBLE))
          / (CAST(rt * ct AS DOUBLE) / CAST(nn AS DOUBLE)) AS term
      FROM cells),
    agg AS (
      SELECT CAST(max(nn) AS BIGINT) AS nraw,
        count(DISTINCT c_mktsegment) AS r,
        count(DISTINCT o_orderpriority) AS c,
        CAST(sum(CAST(term AS DECIMAL(28,10))) AS DOUBLE) AS chi2raw
      FROM terms)
    SELECT nraw AS n,
      CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
      chi2raw AS chi2,
      sqrt(chi2raw / (CAST(nraw AS DOUBLE)
        * CAST(least(r - 1, c - 1) AS DOUBLE))) AS cramers_v
    FROM agg"""

  /** Welch's unequal-variance t-test: do purchase events carry a different
    * mean value than click events? (added round 10). The A/B-test primitive
    * every experimentation pipeline needs. Exactness: the six sufficient
    * statistics (two counts, two decimal sums, two decimal sums of
    * DECIMAL-exact squares — (18,6)·(18,6) → scale-12 products, no
    * post-multiply rounding) come from ONE map-side-combined conditional
    * pass; every derived double (means, variances, t, Welch–Satterthwaite
    * df) is the same IEEE expression tree on both engines over
    * correctly-rounded casts of identical decimals, so everything is
    * emitted raw. The oracle routes the scale-12 sums through VARCHAR
    * (DuckDB's decimal→double cast is not correctly rounded past 2^53 —
    * see q_stat_corr).
    *
    * Scale: a two-branch filter pushed to the scan + a single 1-row
    * aggregate; nothing downstream touches more than one row.
    */
  /** Functional-dependency discovery audit (added round 11) — the
    * profiling step schema-inference and data-contract tools run: for
    * each candidate determinant→dependent pair, does every determinant
    * group map to exactly ONE dependent value? Reports group and
    * violating-group counts plus the verdict — the evidence table for
    * declaring (or rejecting) a dependency in a contract. Three
    * candidates over orders: the key FD (orderkey→priority, holds by
    * uniqueness), and two plausible-but-false business FDs.
    *
    * Scale: each candidate is one two-level aggregation
    * (det → countDistinct(dep), then a 1-row fold), all map-side
    * combined; candidates are independent branches of one union.
    */
  private def profileFd(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Catalog.load(spark, sfDir, "orders")
    def check(label: String, det: String, dep: String): DataFrame =
      o.groupBy(col(det).as("d"))
        .agg(countDistinct(col(dep)).as("nd"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when($"nd" > 1, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(label).as("fd"), $"n_groups", $"n_violations",
          ($"n_violations" === 0L).as("holds"))
    check("o_orderkey->o_orderpriority", "o_orderkey", "o_orderpriority")
      .unionAll(check("o_custkey->o_orderpriority",
        "o_custkey", "o_orderpriority"))
      .unionAll(check("o_orderpriority->o_orderstatus",
        "o_orderpriority", "o_orderstatus"))
      .orderBy($"fd".asc_nulls_first)
  }

  private val profileFdOracle = """
    WITH c1 AS (
      SELECT 'o_orderkey->o_orderpriority' AS fd,
        count(*) AS n_groups,
        CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_violations
      FROM (SELECT o_orderkey, count(DISTINCT o_orderpriority) AS nd
            FROM orders GROUP BY 1)),
    c2 AS (
      SELECT 'o_custkey->o_orderpriority' AS fd,
        count(*) AS n_groups,
        CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_violations
      FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
            FROM orders GROUP BY 1)),
    c3 AS (
      SELECT 'o_orderpriority->o_orderstatus' AS fd,
        count(*) AS n_groups,
        CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_violations
      FROM (SELECT o_orderpriority, count(DISTINCT o_orderstatus) AS nd
            FROM orders GROUP BY 1)),
    u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
          UNION ALL SELECT * FROM c3)
    SELECT fd, n_groups, n_violations, n_violations = 0 AS holds
    FROM u ORDER BY fd ASC NULLS FIRST"""

  /** Gini coefficient of customer spend concentration (added round 11) —
    * the inequality measure every marketing/revenue profile reports
    * ("what share of revenue do the top customers carry"), computed
    * EXACTLY: G = ((n+1)·S − 2·ΣC) / (n·S) over per-customer cents
    * totals sorted ascending, where C is the exact running sum — all
    * integer arithmetic in int64 until one final division (identical
    * long→double conversion both engines; the n·S products stay under
    * 2^63 by orders of magnitude at any plausible per-entity scale).
    *
    * Scale: the global running sum goes through
    * [[DistributedRank.cumsumExact]] (bucketed two-level cumsum — no
    * single-partition window); the order key is the UNIQUE composite
    * spend·10^6 + custkey, which reproduces the oracle's
    * (x ASC, custkey ASC) tie order exactly. The key-domain assumptions
    * are ENFORCED at runtime with raise_error branches (the
    * ntileExactMulti precedent): custkey < 10^6 and x·10^6 < 2^63 per
    * row, and (n+1)·total_cents < 2^63 at the final fold — a violating
    * SF fails loudly instead of silently mis-sorting/overflowing. Tie
    * invariance also holds mathematically — equal spends contribute the
    * same ΣC under any permutation — so the tie-break is belt and braces.
    */
  private def statGini(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cents = ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long")
    val pc = Catalog.load(spark, sfDir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(cents).as("x"))
    val keyed = pc
      .withColumn("__ord",
        when($"o_custkey" >= 1000000L || $"o_custkey" < 0L, raise_error(lit(
          "graft q_stat_gini: o_custkey outside [0, 1e6) — composite " +
            "order key x*1e6+custkey is no longer order-preserving; " +
            "widen the multiplier with the id domain")))
          .when($"x" > (Long.MaxValue - 999999L) / 1000000L, raise_error(lit(
            "graft q_stat_gini: per-customer cents total too large — " +
              "x*1e6 would overflow int64; widen the order-key encoding")))
          .otherwise($"x" * 1000000L + $"o_custkey"))
    val withCum = graft.operators.DistributedRank
      .cumsumExact(keyed, "x", "__ord", "cum")
    withCum.agg(
        count(lit(1)).as("n_customers"),
        sum($"x").as("total_cents"),
        sum($"cum").as("c"))
      .select($"n_customers", $"total_cents",
        when($"total_cents" > lit(Long.MaxValue) / ($"n_customers" + 1L),
          raise_error(lit(
            "graft q_stat_gini: (n+1)*total_cents overflows int64; " +
              "widen the final fold arithmetic")))
          .otherwise(round(
            (($"n_customers" + 1L) * $"total_cents" - lit(2L) * $"c")
              .cast("double") /
            ($"n_customers" * $"total_cents").cast("double"), 6))
          .as("gini"))
  }

  private val statGiniOracle = """
    WITH pc AS (
      SELECT o_custkey,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
          AS BIGINT) AS x
      FROM orders GROUP BY o_custkey),
    c AS (
      SELECT x, CAST(sum(x) OVER (ORDER BY x ASC, o_custkey ASC
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM pc),
    a AS (
      SELECT count(*) AS n_customers,
        CAST(sum(x) AS BIGINT) AS total_cents,
        CAST(sum(cum) AS BIGINT) AS c
      FROM c)
    SELECT n_customers, total_cents,
      round(CAST((n_customers + 1) * total_cents - 2 * c AS DOUBLE)
        / CAST(n_customers * total_cents AS DOUBLE), 6) AS gini
    FROM a"""

  /** One-way ANOVA F-test across the five order priorities (added round
    * 11) — does priority shift mean order value? Completes the
    * two-sample tests (Welch t, Mann-Whitney, KS) with the k-group
    * parametric test. The q_stat_ttest_welch determinism pattern
    * generalized to k groups: ALL per-group moments (n_i, Σx, Σx²) land
    * in ONE row as conditional sums over exact DECIMALs (the priority
    * domain is the fixed 5-value dictionary, so the "wide row" is the
    * natural shape), then SSB = Σ s_i²/n_i − S²/n and SSW = ΣQ − Σ
    * s_i²/n_i are SCALAR double expressions with one fixed left-to-right
    * association mirrored token-for-token in the oracle — no cross-row
    * double summation anywhere, so the F statistic is bit-deterministic
    * cross-engine without rounding.
    *
    * Scale: one map-side-combined pass over orders; everything after the
    * 1-row agg is constant work.
    */
  private def statAnova(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    // decimal(14,2): o_totalprice carries 2 decimals, so this is lossless
    // and the vd*vd product stays inside DuckDB's int128 decimal kernel
    // (DECIMAL(18,6) squares overflowed its multiplication there).
    val vd = $"o_totalprice".cast("decimal(14,2)")
    val aggs = prios.zipWithIndex.flatMap { case (p, i) =>
      val is = $"o_orderpriority" === p
      Seq(
        sum(when(is, 1L).otherwise(0L)).as(s"n$i"),
        sum(when(is, vd)).cast("double").as(s"s$i"),
        sum(when(is, vd * vd)).cast("double").as(s"q$i"))
    }
    val g = Catalog.load(spark, sfDir, "orders").agg(aggs.head, aggs.tail: _*)
    val nTot = (0 until 5).map(i => col(s"n$i")).reduce(_ + _)
    def nd(i: Int) = col(s"n$i").cast("double")
    val sTot = (0 until 5).map(i => col(s"s$i")).reduce(_ + _)
    val qTot = (0 until 5).map(i => col(s"q$i")).reduce(_ + _)
    val bTot = (0 until 5)
      .map(i => col(s"s$i") * col(s"s$i") / nd(i)).reduce(_ + _)
    g.select(
        nTot.as("n_total"),
        (bTot - sTot * sTot / nTot.cast("double")).as("ss_between"),
        (qTot - bTot).as("ss_within"),
        nTot.cast("double").as("ndt"), bTot.as("bt"), sTot.as("st"),
        qTot.as("qt"))
      .select($"n_total",
        $"ss_between", $"ss_within",
        (($"ss_between" / lit(4.0)) /
          ($"ss_within" / ($"ndt" - lit(5.0)))).as("f_stat"))
  }

  private val statAnovaOracle = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val conds = prios.zipWithIndex.map { case (p, i) =>
      s"""CAST(sum(CASE WHEN o_orderpriority = '$p' THEN 1 ELSE 0 END)
           AS BIGINT) AS n$i,
         CAST(CAST(sum(CASE WHEN o_orderpriority = '$p'
           THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS VARCHAR)
           AS DOUBLE) AS s$i,
         CAST(CAST(sum(CASE WHEN o_orderpriority = '$p'
           THEN CAST(o_totalprice AS DECIMAL(14,2))
                * CAST(o_totalprice AS DECIMAL(14,2)) END) AS VARCHAR)
           AS DOUBLE) AS q$i"""
    }.mkString(",\n")
    val nTot = (0 until 5).map(i => s"n$i").mkString(" + ")
    val sTot = (0 until 5).map(i => s"s$i").mkString(" + ")
    val qTot = (0 until 5).map(i => s"q$i").mkString(" + ")
    val bTot = (0 until 5).map(i => s"s$i * s$i / CAST(n$i AS DOUBLE)")
      .mkString(" + ")
    s"""
    WITH g AS (SELECT $conds FROM orders),
    m AS (
      SELECT $nTot AS n_total,
        (($bTot) - ($sTot) * ($sTot) / CAST($nTot AS DOUBLE)) AS ss_between,
        (($qTot) - ($bTot)) AS ss_within,
        CAST($nTot AS DOUBLE) AS ndt
      FROM g)
    SELECT n_total, ss_between, ss_within,
      ((ss_between / 4.0) / (ss_within / (ndt - 5.0))) AS f_stat
    FROM m"""
  }

  private def statTtestWelch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vd = $"value".cast("decimal(18,6)")
    val isP = $"event_type" === "purchase"
    val g = graft.Dsl.table(spark, sfDir)("events")
      .filter($"event_type".isin("purchase", "click"))
      .agg(
        sum(when(isP, 1L).otherwise(0L)).as("n1"),
        sum(when(!isP, 1L).otherwise(0L)).as("n2"),
        sum(when(isP, vd)).cast("double").as("s1"),
        sum(when(!isP, vd)).cast("double").as("s2"),
        sum(when(isP, vd * vd)).cast("double").as("q1"),
        sum(when(!isP, vd * vd)).cast("double").as("q2"))
    val d = g.select($"n1", $"n2", $"s1", $"s2", $"q1", $"q2",
      $"n1".cast("double").as("nd1"), $"n2".cast("double").as("nd2"))
    val m = d.select($"n1", $"n2", $"nd1", $"nd2",
      ($"s1" / $"nd1").as("m1"), ($"s2" / $"nd2").as("m2"),
      (($"q1" - $"s1" * $"s1" / $"nd1") / ($"nd1" - lit(1.0))).as("v1"),
      (($"q2" - $"s2" * $"s2" / $"nd2") / ($"nd2" - lit(1.0))).as("v2"))
    val ab = m.select($"n1", $"n2", $"nd1", $"nd2", $"m1", $"m2", $"v1", $"v2",
      ($"v1" / $"nd1").as("a"), ($"v2" / $"nd2").as("b"))
    ab.select(
      $"n1".as("n_purchase"), $"n2".as("n_click"),
      $"m1".as("mean_purchase"), $"m2".as("mean_click"),
      $"v1".as("var_purchase"), $"v2".as("var_click"),
      (($"m1" - $"m2") / sqrt($"a" + $"b")).as("t_stat"),
      (($"a" + $"b") * ($"a" + $"b") /
        ($"a" * $"a" / ($"nd1" - lit(1.0)) +
         $"b" * $"b" / ($"nd2" - lit(1.0)))).as("df"))
  }

  private val statTtestWelchOracle = """
    WITH g AS (
      SELECT
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(CAST(sum(CASE WHEN event_type = 'purchase'
          THEN CAST(value AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE) AS s1,
        CAST(CAST(sum(CASE WHEN event_type <> 'purchase'
          THEN CAST(value AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE) AS s2,
        CAST(CAST(sum(CASE WHEN event_type = 'purchase'
          THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE) AS q1,
        CAST(CAST(sum(CASE WHEN event_type <> 'purchase'
          THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE) AS q2
      FROM events
      WHERE event_type IN ('purchase', 'click')),
    d AS (
      SELECT n1, n2, s1, s2, q1, q2,
        CAST(n1 AS DOUBLE) AS nd1, CAST(n2 AS DOUBLE) AS nd2
      FROM g),
    m AS (
      SELECT n1, n2, nd1, nd2,
        s1 / nd1 AS m1, s2 / nd2 AS m2,
        (q1 - s1 * s1 / nd1) / (nd1 - 1.0) AS v1,
        (q2 - s2 * s2 / nd2) / (nd2 - 1.0) AS v2
      FROM d),
    ab AS (
      SELECT n1, n2, nd1, nd2, m1, m2, v1, v2,
        v1 / nd1 AS a, v2 / nd2 AS b
      FROM m)
    SELECT n1 AS n_purchase, n2 AS n_click,
      m1 AS mean_purchase, m2 AS mean_click,
      v1 AS var_purchase, v2 AS var_click,
      (m1 - m2) / sqrt(a + b) AS t_stat,
      (a + b) * (a + b) / (a * a / (nd1 - 1.0) + b * b / (nd2 - 1.0)) AS df
    FROM ab"""

  /** Benford's-law screen on o_totalprice leading digits (added round 10):
    * the classic anomaly/fabrication detector a data-quality layer runs on
    * money columns. The leading digit is taken from the DECIMAL(18,2)
    * rendering (plain notation on both engines, values all positive) —
    * never from log10 of the value, whose libm last-ulp can flip the digit
    * at exact powers of ten. Expected shares are round(100·log10(1+1/d),4);
    * all nine constants sit ≥ 9e-7 from a rounding boundary, far beyond
    * cross-libm ulp drift. Observed share is the same two-double division
    * on both engines, emitted raw.
    *
    * Scale: digit extraction is scan-side string arithmetic; one 9-cell
    * hash agg; the margin window runs on those 9 rows.
    */
  private def profileBenford(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val digit = substring($"o_totalprice".cast("decimal(18,2)")
      .cast("string"), 1, 1).cast("int")
    graft.Dsl.table(spark, sfDir)("orders")
      .select(digit.as("leading_digit"))
      .groupBy($"leading_digit").agg(count(lit(1)).as("n"))
      .withColumn("total", sum($"n").over(Window.partitionBy()))
      .select($"leading_digit", $"n",
        ($"n".cast("double") * lit(100.0) / $"total".cast("double"))
          .as("observed_pct"),
        round(log10(lit(1.0) + lit(1.0) / $"leading_digit".cast("double"))
          * lit(100.0), 4).as("benford_pct"))
      .orderBy($"leading_digit".asc_nulls_first)
  }

  private val profileBenfordOracle = """
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS INTEGER) AS leading_digit
      FROM orders),
    g AS (
      SELECT leading_digit, count(*) AS n FROM d GROUP BY leading_digit),
    w AS (
      SELECT leading_digit, n, CAST(sum(n) OVER () AS BIGINT) AS total FROM g)
    SELECT leading_digit, n,
      CAST(n AS DOUBLE) * 100.0 / CAST(total AS DOUBLE) AS observed_pct,
      round(log10(1.0 + 1.0 / CAST(leading_digit AS DOUBLE)) * 100.0, 4) AS benford_pct
    FROM w
    ORDER BY leading_digit ASC NULLS FIRST"""

  /** Two-sample Kolmogorov–Smirnov test on cent-quantized event values,
    * purchase vs click (added round 10 batch 2) — the distribution-drift
    * detector (training-vs-serving skew, A/B sanity) that needs no
    * distributional assumption. EXACT INTEGER arithmetic end-to-end: the
    * ECDF gap is maximized as D_scaled = max|c₁·n₂ − c₂·n₁| over the
    * pooled quantized support (cumulative counts via one ordered window),
    * and only the final D = D_scaled/(n₁·n₂) and the α=0.05 threshold
    * touch doubles — identical expressions both engines, so even the
    * reject boolean cannot drift. Quantization (`floor(value·100)`) is the
    * same double op both engines; it defines the graded statistic (KS of
    * the cent-binned distributions).
    *
    * Scale: one map-side-combined agg to the ≤|cent domain| support table
    * (49k cells max — bounded by the VALUE DOMAIN, not data volume); the
    * cumulative window runs on that bounded table. c·n products stay far
    * under int64 at any SF (n₁·n₂ ≤ 4e16 at sf1000).
    */
  private def statKsTest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val isP = $"event_type" === "purchase"
    val support = graft.Dsl.table(spark, sfDir)("events")
      .filter($"event_type".isin("purchase", "click"))
      .select(floor($"value" * lit(100.0)).cast("long").as("q"), isP.as("p"))
      .groupBy($"q")
      .agg(sum(when($"p", 1L).otherwise(0L)).as("d1"),
           sum(when(!$"p", 1L).otherwise(0L)).as("d2"))
    val w = Window.orderBy($"q".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = support
      .withColumn("c1", sum($"d1").over(w))
      .withColumn("c2", sum($"d2").over(w))
      .withColumn("n1", sum($"d1").over(Window.partitionBy()))
      .withColumn("n2", sum($"d2").over(Window.partitionBy()))
    cum
      .agg(max($"n1").as("n1"), max($"n2").as("n2"),
        max(abs($"c1" * $"n2" - $"c2" * $"n1")).as("d_scaled"))
      .select($"n1", $"n2", $"d_scaled",
        ($"d_scaled".cast("double") /
          ($"n1".cast("double") * $"n2".cast("double"))).as("d_stat"),
        (lit(1.358) * sqrt(($"n1".cast("double") + $"n2".cast("double")) /
          ($"n1".cast("double") * $"n2".cast("double")))).as("crit_05"))
      .withColumn("reject_05", $"d_stat" > $"crit_05")
  }

  private val statKsTestOracle = """
    WITH support AS (
      SELECT CAST(floor(value * 100.0) AS BIGINT) AS q,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        CAST(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS d2
      FROM events
      WHERE event_type IN ('purchase', 'click')
      GROUP BY 1),
    cum AS (
      SELECT q,
        CAST(sum(d1) OVER (ORDER BY q ASC ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS BIGINT) AS c1,
        CAST(sum(d2) OVER (ORDER BY q ASC ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS BIGINT) AS c2,
        CAST(sum(d1) OVER () AS BIGINT) AS n1,
        CAST(sum(d2) OVER () AS BIGINT) AS n2
      FROM support),
    agg AS (
      SELECT max(n1) AS n1, max(n2) AS n2,
        max(abs(c1 * n2 - c2 * n1)) AS d_scaled
      FROM cum)
    SELECT n1, n2, d_scaled,
      CAST(d_scaled AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS d_stat,
      1.358 * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) /
        (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) AS crit_05,
      CAST(d_scaled AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) >
        1.358 * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) /
          (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) AS reject_05
    FROM agg"""

  /** Heavy-key skew profile (added round 10 batch 5): the diagnostic run
    * BEFORE choosing a join/agg strategy at scale — top-20 heaviest
    * o_custkey keys with row count, share of total, and cumulative share.
    * This is the measurement side of the mitigation queries
    * (q_join_skew_salted / q_agg_salted_skew apply the fix; this finds the
    * keys that need it). Shares are one integer/integer double division
    * each (raw, q_sql_tpch_q14 precedent); cumulative share sums exact
    * integer counts BEFORE the single division, so it cannot drift.
    *
    * Scale: per-key counts are one map-side-combined hash agg; top-20 via
    * TakeOrderedAndProject; the total is a 1-row broadcast; the ranking
    * window runs over the 20-row result only.
    */
  private def profileSkew(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Catalog.load(spark, sfDir, "orders")
    val top = orders.groupBy($"o_custkey").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"o_custkey".asc)
      .limit(20)
    val total = orders.agg(count(lit(1)).as("total"))
    val wRank = Window.orderBy($"cnt".desc, $"o_custkey".asc)
    top.crossJoin(broadcast(total))
      .withColumn("rnk", row_number().over(wRank))
      .withColumn("cum_cnt",
        sum($"cnt").over(wRank.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .select($"rnk", $"o_custkey".as("key"), $"cnt",
        ($"cnt".cast("double") / $"total".cast("double")).as("share"),
        ($"cum_cnt".cast("double") / $"total".cast("double"))
          .as("cum_share"))
      .orderBy($"rnk".asc)
  }

  private val profileSkewOracle = """
    WITH c AS (
      SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
      ORDER BY cnt DESC, o_custkey ASC LIMIT 20),
    t AS (SELECT count(*) AS total FROM orders)
    SELECT
      CAST(row_number() OVER (ORDER BY cnt DESC, o_custkey ASC) AS INT)
        AS rnk,
      o_custkey AS key, cnt,
      CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share,
      CAST(sum(cnt) OVER (ORDER BY cnt DESC, o_custkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        / CAST(total AS DOUBLE) AS cum_share
    FROM c, t
    ORDER BY rnk ASC"""

  /** CUPED variance reduction (added round 10 batch 5) — the standard
    * experiment-analysis adjustment: per-variant mean of the metric (1996
    * revenue) and of the CUPED-adjusted metric y − θ·(x − x̄) using the
    * pre-period covariate x (1995 revenue), θ = cov(x,y)/var(x) from
    * GLOBAL moments. All base quantities are exact cents integers
    * (q_stat_regression convention: per-row products stay < 2^63 — the
    * sf0.1 max x·y is 6.4e16, two decades of headroom, and per-customer
    * yearly revenue does not grow with corpus size); sums are exact
    * decimal(38,0); θ and the per-row adjustment are identical IEEE trees
    * both engines (oracle VARCHAR-routes the decimal→double casts);
    * adjusted sums re-enter exact decimal(18,6) before the single
    * rounded division. Variant assignment is the masked Knuth hash
    * (q_split_train_test convention, 50/50) — no rand(), retry-stable.
    *
    * Scale: one conditional-sum pass over orders → per-customer frame;
    * moments = ONE 1-row broadcast agg; adjustment is a stateless
    * projection; the final agg is 2 groups. No window over raw rows.
    */
  private def statCuped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cents = ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long")
    val perCust = Catalog.load(spark, sfDir, "orders")
      .filter(year($"o_orderdate").isin(1995, 1996))
      .groupBy($"o_custkey")
      .agg(
        sum(when(year($"o_orderdate") === 1995, cents).otherwise(0L)).as("x"),
        sum(when(year($"o_orderdate") === 1996, cents).otherwise(0L)).as("y"))
      // Shared by the moments agg and the adjusted scan: without it the
      // whole orders conditional-sum pass runs twice (plan-audited) — the
      // cache makes "ONE pass over orders" literally true; the cheap
      // broadcast join back onto customers replays per consumer.
      .cache()
    val rows = Catalog.load(spark, sfDir, "customer")
      .select($"c_custkey",
        when((($"c_custkey".bitwiseAND(lit(2147483647L)) * lit(2654435761L))
          % lit(4294967296L)) < lit(2147483648L), "A").otherwise("B")
          .as("variant"))
      .join(perCust, $"c_custkey" === $"o_custkey", "left")
      .select($"variant",
        coalesce($"x", lit(0L)).as("x"), coalesce($"y", lit(0L)).as("y"))
    def exact(c: Column): Column = sum(c.cast("decimal(38,0)")).cast("double")
    val m = rows.agg(
      count(lit(1)).cast("double").as("n"),
      exact($"x").as("sx"), exact($"y").as("sy"),
      exact($"x" * $"x").as("sxx"), exact($"x" * $"y").as("sxy"))
    // Zero pre-period variance (all x equal — e.g. a filter leaving no
    // 1995 orders) would make the OLS slope 0/0 = NaN and poison every
    // adjusted mean; θ degrades to 0 = the plain difference-in-means
    // estimator (oracle carries the same CASE so parity is exact).
    val thetaDenom = $"n" * $"sxx" - $"sx" * $"sx"
    val theta = when(thetaDenom === 0.0, 0.0)
      .otherwise(($"n" * $"sxy" - $"sx" * $"sy") / thetaDenom)
    rows.crossJoin(broadcast(m))
      .withColumn("theta", theta)
      .withColumn("adj",
        $"y".cast("double") - $"theta" * ($"x".cast("double") - $"sx" / $"n"))
      .groupBy($"variant")
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum($"y".cast("decimal(38,0)")).cast("double") / count(lit(1))
          / lit(100.0), 4).as("mean_y"),
        round(sum($"adj".cast("decimal(18,6)")).cast("double") / count(lit(1))
          / lit(100.0), 4).as("mean_y_adj"),
        round(max($"theta"), 6).as("theta"))
      .orderBy($"variant".asc_nulls_first)
  }

  private val statCupedOracle = """
    WITH pc AS (
      SELECT o_custkey,
        sum(CASE WHEN year(o_orderdate) = 1995
          THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
          ELSE 0 END) AS x,
        sum(CASE WHEN year(o_orderdate) = 1996
          THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
          ELSE 0 END) AS y
      FROM orders WHERE year(o_orderdate) IN (1995, 1996)
      GROUP BY o_custkey),
    r AS (
      SELECT
        CASE WHEN ((c_custkey & 2147483647) * 2654435761) % 4294967296
          < 2147483648 THEN 'A' ELSE 'B' END AS variant,
        COALESCE(x, 0) AS x, COALESCE(y, 0) AS y
      FROM customer LEFT JOIN pc ON c_custkey = o_custkey),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
        CAST(CAST(sum(CAST(x AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sx,
        CAST(CAST(sum(CAST(y AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sy,
        CAST(CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
          AS sxx,
        CAST(CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
          AS sxy
      FROM r),
    a AS (
      SELECT variant, y,
        CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
          ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS theta,
        CAST(y AS DOUBLE)
          - (CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
              ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END)
          * (CAST(x AS DOUBLE) - sx / n) AS adj
      FROM r, m)
    SELECT variant, count(*) AS n_customers,
      round(CAST(CAST(sum(CAST(y AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
        / count(*) / 100.0, 4) AS mean_y,
      round(CAST(CAST(sum(CAST(adj AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        / count(*) / 100.0, 4) AS mean_y_adj,
      round(max(theta), 6) AS theta
    FROM a GROUP BY variant
    ORDER BY variant ASC NULLS FIRST"""

  /** Exact Mann-Whitney U rank-sum test (added round 10 batch 5) — the
    * nonparametric two-sample location test next to the parametric Welch t
    * (q_stat_ttest_welch) and distributional KS (q_stat_ks_test): do
    * URGENT and LOW orders draw o_totalprice from the same distribution?
    * Ranks are EXACT with midrank tie handling, computed scale-safe: the
    * pooled sample collapses to a distinct-VALUE table (cents integers)
    * with per-value group counts, the rank prefix comes from
    * `DistributedRank.cumsumExact` over that table (range buckets +
    * broadcast offsets — no single-partition window over raw rows), and
    * 2·R₁ = Σ n1ᵥ·(2·before + nᵥ + 1) stays in exact integers through a
    * decimal(38,0) sum (as does the tie-correction Σ(t³−t)). U, μ, σ and
    * the tie-corrected z are then identical IEEE trees both engines
    * (oracle VARCHAR-routes the decimal→double casts); z rounded r6.
    */
  private def statMannWhitney(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Catalog.load(spark, sfDir, "orders")
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .select(
        ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long").as("v"),
        when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L).as("is1"))
    val vals = base.groupBy($"v")
      .agg(count(lit(1)).as("nv"), sum($"is1").as("n1v"))
    val withCum = DistributedRank.cumsumExact(vals, "nv", "v", "cum")
    def exact(c: Column): Column = sum(c.cast("decimal(38,0)")).cast("double")
    val m = withCum.agg(
      sum($"n1v").as("n1l"), sum($"nv").as("nl"),
      exact($"n1v" * (lit(2L) * ($"cum" - $"nv") + $"nv" + lit(1L)))
        .as("r1x2"),
      exact($"nv" * $"nv" * $"nv" - $"nv").as("tiesum"))
    val n1 = $"n1l".cast("double")
    val n = $"nl".cast("double")
    val n2 = n - n1
    val u1 = ($"r1x2" - n1 * (n1 + 1)) / 2.0
    val mu = n1 * n2 / 2.0
    val sigma2 = n1 * n2 / 12.0 *
      ((n + 1) - $"tiesum" / (n * (n - 1)))
    m.select(
      $"n1l".as("n_urgent"),
      ($"nl" - $"n1l").as("n_low"),
      u1.as("u_stat"),
      round((u1 - mu) / sqrt(sigma2), 6).as("z"))
  }

  private val statMannWhitneyOracle = """
    WITH base AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v,
        CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is1
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    vals AS (
      SELECT v, count(*) AS nv, sum(is1) AS n1v FROM base GROUP BY v),
    c AS (
      SELECT v, nv, n1v,
        sum(nv) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum
      FROM vals),
    m AS (
      SELECT sum(n1v) AS n1l, sum(nv) AS nl,
        CAST(CAST(sum(CAST(n1v * (2 * (cum - nv) + nv + 1)
          AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS r1x2,
        CAST(CAST(sum(CAST(nv * nv * nv - nv AS DECIMAL(38,0)))
          AS VARCHAR) AS DOUBLE) AS tiesum
      FROM c)
    SELECT CAST(n1l AS BIGINT) AS n_urgent,
      CAST(nl - n1l AS BIGINT) AS n_low,
      (r1x2 - CAST(n1l AS DOUBLE) * (CAST(n1l AS DOUBLE) + 1)) / 2.0
        AS u_stat,
      round(((r1x2 - CAST(n1l AS DOUBLE) * (CAST(n1l AS DOUBLE) + 1)) / 2.0
          - CAST(n1l AS DOUBLE) * (CAST(nl AS DOUBLE) - CAST(n1l AS DOUBLE))
            / 2.0)
        / sqrt(CAST(n1l AS DOUBLE) * (CAST(nl AS DOUBLE)
            - CAST(n1l AS DOUBLE)) / 12.0
          * ((CAST(nl AS DOUBLE) + 1)
            - tiesum / (CAST(nl AS DOUBLE) * (CAST(nl AS DOUBLE) - 1)))),
        6) AS z
    FROM m"""

  /** Half-sample replication confidence interval (added round 10 batch 5)
    * — the rand()-free bootstrap: when a metric has no closed-form
    * variance (or you don't trust the closed form), resample. 32
    * replicates, replicate r containing each order iff BIT r of the
    * order's masked Knuth hash is set (~half each, deterministic and
    * retry-stable on both engines — no rand(), the repo's sampling rule);
    * SE = √(mean squared deviation of replicate means around the full
    * mean), CI = mean ± 1.96·SE. Replicate means are exact decimal-cents
    * sums over exact counts (identical doubles), squared deviations
    * re-enter decimal(28,6) before the 32-row sum (cents² needs the width) so summation order
    * cannot drift.
    *
    * Scale: the replicate fan-out is explode(0..31) on (hash, cents) —
    * constant 32× on two longs, immediately map-side combined down to 32
    * rows; the stats ride that bounded frame. One pass over the fact.
    */
  private def statBootstrapCi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Catalog.load(spark, sfDir, "orders")
      .select(
        ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long").as("cents"),
        (($"o_orderkey".bitwiseAND(lit(2147483647L)) * lit(2654435761L))
          % lit(4294967296L)).as("h"))
      .cache() // shared by the full-sample mean and the replicate fan-out
    val full = base.agg(
      count(lit(1)).as("n"),
      (sum($"cents".cast("decimal(38,0)")).cast("double") / count(lit(1)))
        .as("mean_cents"))
    val reps = base
      .select($"cents", $"h", explode(sequence(lit(0), lit(31))).as("r"))
      .filter(expr("shiftright(h, CAST(r AS INT))").bitwiseAND(lit(1L)) === 1L)
      .groupBy($"r")
      .agg((sum($"cents".cast("decimal(38,0)")).cast("double")
        / count(lit(1))).as("rep_mean"))
    val dev = $"rep_mean" - $"mean_cents"
    reps.crossJoin(broadcast(full))
      .select($"n", $"mean_cents", (dev * dev).as("dev2"))
      .groupBy($"n", $"mean_cents")
      .agg((sum($"dev2".cast("decimal(28,6)")).cast("double") / 32.0)
        .as("var_cents"))
      .select(
        $"n".as("n_orders"),
        round($"mean_cents" / 100.0, 4).as("mean_total"),
        round(sqrt($"var_cents") / 100.0, 6).as("se"),
        round(($"mean_cents" - lit(1.96) * sqrt($"var_cents")) / 100.0, 4)
          .as("ci_low"),
        round(($"mean_cents" + lit(1.96) * sqrt($"var_cents")) / 100.0, 4)
          .as("ci_high"))
  }

  private val statBootstrapCiOracle = """
    WITH base AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
          AS cents,
        ((o_orderkey & 2147483647) * 2654435761) % 4294967296 AS h
      FROM orders),
    full_m AS (
      SELECT count(*) AS n,
        CAST(CAST(sum(CAST(cents AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
          / count(*) AS mean_cents
      FROM base),
    reps AS (
      SELECT r.r,
        CAST(CAST(sum(CAST(cents AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
          / count(*) AS rep_mean
      FROM base, range(0, 32) r(r)
      WHERE ((h >> CAST(r.r AS INT)) & 1) = 1
      GROUP BY r.r),
    v AS (
      SELECT n, mean_cents,
        CAST(CAST(sum(CAST((rep_mean - mean_cents) * (rep_mean - mean_cents)
          AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / 32.0 AS var_cents
      FROM reps, full_m
      GROUP BY n, mean_cents)
    SELECT CAST(n AS BIGINT) AS n_orders,
      round(mean_cents / 100.0, 4) AS mean_total,
      round(sqrt(var_cents) / 100.0, 6) AS se,
      round((mean_cents - 1.96 * sqrt(var_cents)) / 100.0, 4) AS ci_low,
      round((mean_cents + 1.96 * sqrt(var_cents)) / 100.0, 4) AS ci_high
    FROM v"""

  /** OBSERVED-METRICS audit (added round 12 batch 9) — the
    * `Dataset.observe` / `CollectMetrics` surface: audit aggregates that
    * RIDE an existing job instead of paying a second scan. The pipeline
    * job here is a real count over the pruned lineitem projection; the
    * observation attaches (row count, exact integer quantity total,
    * shipdate bounds, null-key violations) to that same pass, and the
    * graded output is the metrics row the job delivered. At 100 TB this
    * is the difference between auditing for free and re-reading the
    * table: expectations checks (q_quality_expectations) answer "is the
    * data valid" as their OWN job; observe answers it as a side-channel
    * of the job you were already running. Only order-independent metrics
    * are observed (count / integer sum / min / max — a float sum's
    * accumulation order would be run-dependent), so the row is
    * engine-exact.
    */
  private def observeMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val obs = org.apache.spark.sql.Observation()
    val base = Catalog.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_shipdate")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("long")).as("sum_qty"),
        min($"l_shipdate").as("min_ship"),
        max($"l_shipdate").as("max_ship"),
        sum(when($"l_orderkey".isNull, 1L).otherwise(0L)).as("null_keys"))
    base.count() // the pipeline job the metrics ride
    val m = obs.get
    Seq((m("n_rows").asInstanceOf[Long], m("sum_qty").asInstanceOf[Long],
      m("min_ship").asInstanceOf[java.sql.Timestamp],
      m("max_ship").asInstanceOf[java.sql.Timestamp],
      m("null_keys").asInstanceOf[Long]))
      .toDF("n_rows", "sum_qty", "min_ship", "max_ship", "null_keys")
  }

  private val observeMetricsOracle = """
    SELECT count(*) AS n_rows,
      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
      CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS null_keys
    FROM lineitem"""

  private val SkewBuckets = 32L

  /** SHUFFLE-BUCKET SKEW DIAGNOSTIC (round 13): how evenly would
    * lineitem hash-partition on l_suppkey across [[SkewBuckets]] reducers?
    * The pre-flight every 100-TB join/agg plan deserves: per bucket the
    * row count, distinct-key count, and the load ratio vs the ideal even
    * share (ppm) — the table that tells an operator whether the shuffle
    * needs salting (q_join_skew_salted / q_agg_salted_skew are the cures;
    * this is the diagnosis). [[profileSkew]] reports VALUE skew of a
    * numeric column's distribution; this reports PARTITION skew of a
    * shuffle key — different failure, different fix.
    *
    * The bucket function is the house Knuth multiplicative hash
    * ((key & (2^31−1))·2654435761 mod 2^31) mod buckets — mirrorable in
    * DuckDB (Spark's own `hash()` is Murmur3 with engine-private seeding,
    * fine for real shuffles, unusable for an oracle) and the same
    * family the corpus samplers use, so the diagnostic measures what a
    * multiplicative-family partitioner would see: a proxy with the same
    * collision statistics, not Spark's literal partition assignment.
    *
    * Scale: ONE map-side-combined aggregate keyed by (bucket) with an
    * exact count-distinct expand — output is |buckets| rows; nothing else
    * leaves the scan.
    */
  private def profilePartitionSkew(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n = SkewBuckets
    Catalog.load(spark, sfDir, "lineitem")
      .select($"l_suppkey",
        (pmod(($"l_suppkey".bitwiseAND(2147483647L)) * 2654435761L,
          lit(2147483648L)) % n).as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"l_suppkey").as("n_keys"))
      // load_ppm = bucket rows / ideal even share, in ppm: 1e6 = perfectly
      // even. total = sum over buckets rides a 1-row broadcast dim.
      .crossJoin(broadcast(
        Catalog.load(spark, sfDir, "lineitem").agg(count(lit(1)).as("__t"))))
      .select($"bucket", $"n_rows", $"n_keys",
        expr(s"n_rows * $n * 1000000 div __t").as("load_ppm"))
      .orderBy($"bucket".asc_nulls_first)
  }

  private val profilePartitionSkewOracle = s"""
    WITH b AS (
      SELECT ((l_suppkey & 2147483647) * 2654435761) % 2147483648
               % $SkewBuckets AS bucket,
        l_suppkey
      FROM lineitem),
    t AS (SELECT count(*) AS tot FROM lineitem)
    SELECT bucket, count(*) AS n_rows,
      count(DISTINCT l_suppkey) AS n_keys,
      CAST(count(*) * $SkewBuckets * 1000000 // tot AS BIGINT) AS load_ppm
    FROM b CROSS JOIN t
    GROUP BY bucket, tot
    ORDER BY bucket ASC NULLS FIRST"""

  override val queries: Vector[Q] = Vector(
    Q("q_profile_partition_skew", profilePartitionSkew,
      Some(profilePartitionSkewOracle)),
    Q("q_observe_metrics", observeMetrics, Some(observeMetricsOracle)),
    Q("q_stat_bootstrap_ci", statBootstrapCi, Some(statBootstrapCiOracle)),
    Q("q_stat_mannwhitney", statMannWhitney, Some(statMannWhitneyOracle)),
    Q("q_profile_skew", profileSkew, Some(profileSkewOracle)),
    Q("q_stat_cuped", statCuped, Some(statCupedOracle)),
    Q("q_profile_entropy", profileEntropy, Some(profileEntropyOracle)),
    Q("q_stat_mutual_info", statMutualInfo, Some(statMutualInfoOracle)),
    Q("q_stat_chisq", statChisq, Some(statChisqOracle)),
    Q("q_stat_ks_test", statKsTest, Some(statKsTestOracle)),
    Q("q_stat_ttest_welch", statTtestWelch, Some(statTtestWelchOracle)),
    Q("q_stat_anova", statAnova, Some(statAnovaOracle)),
    Q("q_stat_gini", statGini, Some(statGiniOracle)),
    Q("q_profile_fd", profileFd, Some(profileFdOracle)),
    Q("q_profile_benford", profileBenford, Some(profileBenfordOracle)),
    Q("q_stat_regression", statRegression, Some(statRegressionOracle)),
    Q("q_audit_reconciliation", auditReconciliation,
      Some(auditReconciliationOracle)),
    Q("q_profile_summary", profileSummary, Some(profileSummaryOracle)),
    Q("q_profile_histogram_eqdepth", histogramEqdepth, Some(histogramEqdepthOracle)),
    Q("q_profile_histogram", histogram, Some(histogramOracle)),
    Q("q_profile_histogram2d", histogram2d, Some(histogram2dOracle)),
    Q("q_profile_freq", freqValues, Some(freqValuesOracle)),
    Q("q_stat_corr", corrMatrix, Some(corrMatrixOracle)),
    Q("q_audit_referential", auditReferential, Some(auditReferentialOracle)),
  )
}
