package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Catalog, Q, QueryPack}

/** SURVEY.md §2.P/§2.J2 — AUDIT & ASSOCIATION DEPTH (round 13 batch 6):
  * the cross-environment reconciliation fingerprint, rank correlation,
  * market-concentration screening, and vocabulary-richness profiling.
  *
  * Determinism doctrine (SURVEY §2.0): the checksum is an ORDER-
  * INDEPENDENT sum of md5-derived 48-bit integers (md5 is bit-identical
  * cross-engine; the hex→int fold is ONE shared SQL fragment evaluated
  * by both engines); Spearman keeps doubled midranks exact-integral and
  * combines through decimal(38,0), emitting the final ρ as a single
  * fixed-association IEEE expression (the q_stat_anova scalar-double
  * pattern); HHI and hapax are pure scaled-integer arithmetic.
  */
object AuditStats extends QueryPack {

  /** Shared Spark/DuckDB SQL fragment: the first 12 hex chars of
    * md5(`col`) as a 48-bit integer — position() is ANSI and both
    * engines return 1-based (0 for a miss never happens on hex). */
  private def hex48(col: String): String =
    (1 to 12).map { k =>
      s"(position(substring(md5($col), $k, 1) IN '0123456789abcdef') - 1)" +
        s" * cast(${1L << (4 * (12 - k))} as bigint)"
    }.mkString("(", " + ", ")")

  /** ROW-CONTENT RENDERING for the checksum — every column through a
    * type-stable string form (decimal cents, ISO date) so both engines
    * render identical bytes. */
  private val auditRowSql =
    "concat_ws('|', cast(o_orderkey as string), cast(o_custkey as string)," +
      " cast(cast(o_totalprice as decimal(14,2)) as string)," +
      " cast(cast(o_orderdate as date) as string), o_orderstatus)"
  private val auditRowDuck =
    "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR)," +
      " CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR)," +
      " CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderstatus)"

  private val ChecksumMod = 2305843009213693951L // 2^61 - 1

  /** ORDER-INDEPENDENT TABLE CHECKSUM — the cross-environment
    * reconciliation fingerprint: per order priority, the row count and
    * the sum (mod 2⁶¹−1) of a 48-bit md5-derived digest of each row's
    * canonical rendering. Two environments (a migration's source and
    * target, yesterday's snapshot and today's replay) compare k small
    * (group, n, checksum) rows instead of joining 10¹² rows —
    * `q_audit_reconciliation` diffs values; this certifies byte-level
    * row identity, commutatively, so partitioning/order differences
    * between environments cannot matter.
    *
    * Scale: ONE scan, md5 + the hex fold are per-row codegen'd
    * expressions, the agg is map-side combined to |priorities| rows;
    * 48-bit addends through decimal(38,0) keep the sum exact to 10²³
    * rows before the final mod — no overflow lever needed at any SF.
    */
  private def auditChecksum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .select($"o_orderpriority",
        expr(hex48(auditRowSql)).cast("decimal(38,0)").as("v"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        (sum($"v") % ChecksumMod).cast("long").as("checksum"))
      .orderBy($"o_orderpriority".asc_nulls_first)
  }

  private val auditChecksumOracle = s"""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(${hex48(auditRowDuck)} AS HUGEINT)) % $ChecksumMod
        AS BIGINT) AS checksum
    FROM orders
    GROUP BY 1
    ORDER BY o_orderpriority ASC NULLS FIRST"""

  /** SPEARMAN RANK CORRELATION (quantity vs discount over lineitem) —
    * the monotone-association screen run during profiling: ρ = Pearson
    * over midranks, with EVERY rank moment exact. Both variables live
    * on tiny generator domains (quantity 1..50, discount 0..10 cents),
    * so ranks are functions of the VALUE: one (qty, disc) contingency
    * agg (≤ 561 cells) + two margin rollups give doubled midranks
    * 2r = 2·cum_below + cnt + 1 as exact integers; all six moments are
    * Σ over cells of cnt·f(2rx, 2ry) through decimal(38,0) (4n⁴ < 10³⁸
    * to beyond 10⁸ rows). The final ρ is emitted as ONE fixed
    * left-to-right IEEE expression over the exact moments (the
    * q_stat_anova scalar-double pattern — bit-deterministic without
    * rounding), alongside the exact decimal-free n.
    *
    * Scale: the raw pass is one map-side-combined agg to the bounded
    * cell table; everything after is arithmetic over ≤ 561 rows.
    */
  private def statSpearman(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Catalog.load(spark, sfDir, "lineitem")
      .select($"l_quantity".cast("decimal(12,2)").cast("long").as("x"),
        ($"l_discount".cast("decimal(12,2)") * 100).cast("long").as("y"))
      .groupBy($"x", $"y").agg(count(lit(1)).as("cnt"))
    def margin(key: String) = {
      val m = cells.groupBy(col(key)).agg(sum($"cnt").as("mn"))
      val w = Window.orderBy(col(key).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      m.withColumn("cum", sum($"mn").over(w))
        .select(col(key),
          (lit(2L) * ($"cum" - $"mn") + $"mn" + 1L).as(s"r$key"))
    }
    val joined = cells
      .join(margin("x"), Seq("x")).join(margin("y"), Seq("y"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    joined.agg(
        sum($"cnt").as("n"),
        sum(d($"cnt") * $"rx").as("sx"), sum(d($"cnt") * $"ry").as("sy"),
        sum(d($"cnt") * $"rx" * $"ry").as("sxy"),
        sum(d($"cnt") * $"rx" * $"rx").as("sxx"),
        sum(d($"cnt") * $"ry" * $"ry").as("syy"))
      .select($"n",
        (d($"n") * $"sxy" - $"sx" * $"sy").cast("double").as("num"),
        (d($"n") * $"sxx" - $"sx" * $"sx").cast("double").as("denx"),
        (d($"n") * $"syy" - $"sy" * $"sy").cast("double").as("deny"))
      .select($"n", $"num", $"denx", $"deny",
        ($"num" / sqrt($"denx" * $"deny")).as("rho"))
  }

  private val statSpearmanOracle = """
    WITH cells AS (
      SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS x,
        CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS y,
        CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2),
    mx AS (
      SELECT x, 2 * (CAST(sum(mn) OVER (ORDER BY x ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - mn)
          + mn + 1 AS rx
      FROM (SELECT x, CAST(sum(cnt) AS BIGINT) AS mn FROM cells GROUP BY 1)),
    my AS (
      SELECT y, 2 * (CAST(sum(mn) OVER (ORDER BY y ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - mn)
          + mn + 1 AS ry
      FROM (SELECT y, CAST(sum(cnt) AS BIGINT) AS mn FROM cells GROUP BY 1)),
    m AS (
      SELECT CAST(sum(cnt) AS HUGEINT) AS n,
        CAST(sum(CAST(cnt AS HUGEINT) * rx) AS HUGEINT) AS sx,
        CAST(sum(CAST(cnt AS HUGEINT) * ry) AS HUGEINT) AS sy,
        CAST(sum(CAST(cnt AS HUGEINT) * rx * ry) AS HUGEINT) AS sxy,
        CAST(sum(CAST(cnt AS HUGEINT) * rx * rx) AS HUGEINT) AS sxx,
        CAST(sum(CAST(cnt AS HUGEINT) * ry * ry) AS HUGEINT) AS syy
      FROM cells JOIN mx USING (x) JOIN my USING (y))
    SELECT CAST(n AS BIGINT) AS n,
      CAST(n * sxy - sx * sy AS DOUBLE) AS num,
      CAST(n * sxx - sx * sx AS DOUBLE) AS denx,
      CAST(n * syy - sy * sy AS DOUBLE) AS deny,
      CAST(n * sxy - sx * sy AS DOUBLE)
        / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
          * CAST(n * syy - sy * sy AS DOUBLE)) AS rho
    FROM m"""

  /** HERFINDAHL-HIRSCHMAN CONCENTRATION INDEX — per nation, how
    * concentrated supplier revenue is: share_ppm = supplier cents ·10⁶
    * div nation total (exact, non-negative), HHI = Σ share² div 10⁶
    * (10⁴ ≈ a 1%-share-square unit · 100; monopoly → 10⁶). The screen
    * a marketplace/risk pipeline runs per category; `q_stat_gini`
    * measures inequality of the distribution, HHI measures dominance
    * of the head. share·10⁶ is int64-safe while a nation's revenue
    * stays under 9.2·10¹² cents (≈ $92 B), loudly guarded beyond.
    *
    * Scale: one map-side-combined (nation, supplier) cents agg; the
    * share/HHI arithmetic runs over the supplier-count-bounded
    * aggregate with a broadcast nation-total rollup.
    */
  private def statHhi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rev = Catalog.load(spark, sfDir, "lineitem")
      .join(Catalog.load(spark, sfDir, "supplier"),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_nationkey".cast("long").as("nationkey"), $"s_suppkey")
      .agg(sum(($"l_extendedprice".cast("decimal(14,2)") * 100)
        .cast("long")).as("cents"))
    val tot = rev.groupBy($"nationkey")
      .agg(sum($"cents").as("total"), count(lit(1)).as("n_suppliers"))
    rev.join(broadcast(tot), Seq("nationkey"))
      .select($"nationkey", $"n_suppliers", $"total",
        when($"total" > 9200000000000L, raise_error(lit(
          "graft q_stat_hhi: share*1e6 overflows int64 beyond 9.2e12 " +
            "cents per nation; rescale to dollars")))
          .otherwise(expr("cents * 1000000 div total")).as("share_ppm"))
      .groupBy($"nationkey")
      .agg(first($"n_suppliers").as("n_suppliers"),
        first($"total").as("total_cents"),
        expr("cast(sum(share_ppm * share_ppm) div 1000000 as bigint)")
          .as("hhi_ppm"),
        max($"share_ppm").as("top_share_ppm"))
      .orderBy($"nationkey".asc_nulls_first)
  }

  private val statHhiOracle = """
    WITH rev AS (
      SELECT CAST(s_nationkey AS BIGINT) AS nationkey, s_suppkey,
        CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
          AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2),
    tot AS (
      SELECT nationkey, CAST(sum(cents) AS BIGINT) AS total,
        CAST(count(*) AS BIGINT) AS n_suppliers
      FROM rev GROUP BY 1),
    shares AS (
      SELECT r.nationkey, t.n_suppliers, t.total,
        CASE WHEN t.total > 9200000000000 THEN error(
          'graft q_stat_hhi: share*1e6 overflows int64 beyond 9.2e12 cents per nation; rescale to dollars')
        ELSE r.cents * 1000000 // t.total END AS share_ppm
      FROM rev r JOIN tot t USING (nationkey))
    SELECT nationkey, CAST(min(n_suppliers) AS BIGINT) AS n_suppliers,
      CAST(min(total) AS BIGINT) AS total_cents,
      CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm,
      CAST(max(share_ppm) AS BIGINT) AS top_share_ppm
    FROM shares
    GROUP BY 1
    ORDER BY nationkey ASC NULLS FIRST"""

  /** VOCABULARY RICHNESS PROFILE (hapax / type-token) — per source:
    * token count, type count, hapax legomena (types seen once), and the
    * exact ppm type-token + hapax ratios. The corpus-health panel a
    * curation run reads next to `q_text_quality`: template-generated or
    * deduplicate-worthy sources show depressed TTR and hapax share,
    * while OCR noise inflates both.
    *
    * Scale: one (source, token) map-side-combined agg (vocabulary-
    * bounded), then a per-source rollup of counts — the corpus is
    * touched once.
    */
  private def textHapax(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "documents")
      .select($"source", explode(split($"text", " ")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(sum($"c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when($"c" === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select($"source", $"n_tokens", $"n_types", $"n_hapax",
        expr("n_types * 1000000 div n_tokens").as("ttr_ppm"),
        expr("n_hapax * 1000000 div n_types").as("hapax_ppm"))
      .orderBy($"source".asc_nulls_first)
  }

  private val textHapaxOracle = """
    WITH cnt AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY 1, 2),
    agg AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        CAST(count(*) AS BIGINT) AS n_types,
        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      FROM cnt GROUP BY 1)
    SELECT source, n_tokens, n_types, n_hapax,
      CAST(n_types * 1000000 // n_tokens AS BIGINT) AS ttr_ppm,
      CAST(n_hapax * 1000000 // n_types AS BIGINT) AS hapax_ppm
    FROM agg
    ORDER BY source ASC NULLS FIRST"""

  /** ONE-PASS CORRELATION MATRIX — all 6 Pearson pairs over lineitem's
    * four numeric columns (quantity units, price cents, discount cents,
    * tax cents) from ONE aggregation of 15 exact moments; the matrix
    * form of `q_stat_corr` (one pair) the profiling stage actually
    * wants. Per pair: exact integer num/denx/deny (decimal(38,0)
    * combination — n·Σxy − ΣxΣy stays under 10³⁸ beyond 10⁸ rows) and
    * ρ as ONE fixed-association IEEE expression (the q_stat_spearman
    * output contract).
    *
    * Scale: the corpus is touched ONCE — a single map-side-combined
    * 15-aggregate pass; the 6-row matrix is a stack over the 1-row
    * moment frame. Never 6 scans, never a shuffle per pair.
    */
  private def statCorrMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Catalog.load(spark, sfDir, "lineitem").select(
      $"l_quantity".cast("decimal(12,2)").cast("long").as("q"),
      ($"l_extendedprice".cast("decimal(14,2)") * 100).cast("long").as("p"),
      ($"l_discount".cast("decimal(12,2)") * 100).cast("long").as("d"),
      ($"l_tax".cast("decimal(12,2)") * 100).cast("long").as("t"))
    val dd = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cols = Seq("q", "p", "d", "t")
    val moments = base.agg(
      count(lit(1)).as("n"),
      cols.flatMap(x => Seq(sum(dd(col(x))).as(s"s_$x"),
        sum(dd(col(x)) * col(x)).as(s"s_${x}_$x"))) ++
        cols.combinations(2).map { case Seq(x, y) =>
          sum(dd(col(x)) * col(y)).as(s"s_${x}_$y") }: _*)
    val pairExprs = cols.combinations(2).map { case Seq(x, y) =>
      s"'${x}_$y', cast(n * s_${x}_$y - s_$x * s_$y as double), " +
        s"cast(n * s_${x}_$x - s_$x * s_$x as double), " +
        s"cast(n * s_${y}_$y - s_$y * s_$y as double)"
    }.mkString(", ")
    moments
      .selectExpr(s"stack(6, $pairExprs) as (pair, num, denx, deny)")
      .select($"pair", $"num", $"denx", $"deny",
        ($"num" / sqrt($"denx" * $"deny")).as("corr"))
      .orderBy($"pair".asc_nulls_first)
  }

  private val statCorrMatrixOracle = {
    val cols = Seq("q", "p", "d", "t")
    val pairSelects = cols.combinations(2).map { case Seq(x, y) =>
      s"""SELECT '${x}_$y' AS pair,
        CAST(n * s_${x}_$y - s_$x * s_$y AS DOUBLE) AS num,
        CAST(n * s_${x}_$x - s_$x * s_$x AS DOUBLE) AS denx,
        CAST(n * s_${y}_$y - s_$y * s_$y AS DOUBLE) AS deny,
        CAST(n * s_${x}_$y - s_$x * s_$y AS DOUBLE)
          / sqrt(CAST(n * s_${x}_$x - s_$x * s_$x AS DOUBLE)
            * CAST(n * s_${y}_$y - s_$y * s_$y AS DOUBLE)) AS corr
      FROM m"""
    }.mkString(" UNION ALL ")
    val sums = cols.flatMap(x => Seq(
      s"CAST(sum(CAST($x AS HUGEINT)) AS HUGEINT) AS s_$x",
      s"CAST(sum(CAST($x AS HUGEINT) * $x) AS HUGEINT) AS s_${x}_$x")) ++
      cols.combinations(2).map { case Seq(x, y) =>
        s"CAST(sum(CAST($x AS HUGEINT) * $y) AS HUGEINT) AS s_${x}_$y" }
    s"""
    WITH base AS (
      SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS q,
        CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p,
        CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS d,
        CAST(CAST(l_tax AS DECIMAL(12,2)) * 100 AS BIGINT) AS t
      FROM lineitem),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, ${sums.mkString(", ")}
      FROM base)
    SELECT * FROM ($pairSelects)
    ORDER BY pair ASC NULLS FIRST"""
  }

  /** JOIN-KEY DISCOVERY PROFILE (round 13 batch 12) — the data-catalog
    * pass that finds joinable columns across tables nobody documented:
    * for every ORDERED pair of candidate key columns, the INCLUSION
    * coefficient |dv(A) ∩ dv(B)| / |dv(A)| over distinct value sets — the
    * score FK discovery ranks by (A ⊆ B at 10⁶ ppm ⇒ A is a foreign key
    * into B; the symmetric pair of inclusions recovers Jaccard). Seven
    * key-shaped columns across six tables; exact integer ppm via one
    * integral division (non-negative dividends, the house `div` ↔ `//`
    * contract).
    *
    * Scale: one DISTINCT per column (map-side combined, each a single
    * shuffle on the value), ONE value-keyed equi self-join over the
    * tagged union — candidate pairs emerge from shared values, never
    * from an all-pairs column product — and a ≤|cols|² aggregate; the
    * per-column cardinalities ride in on a broadcast 7-row frame. This
    * is exactly the shape that scales to thousands of columns: value-
    * keyed, df-cappable, never quadratic in rows.
    */
  private def profileJoinDiscovery(spark: SparkSession,
                                   sfDir: String): DataFrame = {
    import spark.implicits._
    val cols = Seq(
      ("customer.c_custkey", "customer", "c_custkey"),
      ("orders.o_custkey", "orders", "o_custkey"),
      ("nation.n_nationkey", "nation", "n_nationkey"),
      ("customer.c_nationkey", "customer", "c_nationkey"),
      ("supplier.s_nationkey", "supplier", "s_nationkey"),
      ("part.p_partkey", "part", "p_partkey"),
      ("lineitem.l_partkey", "lineitem", "l_partkey"))
    val dv = cols.map { case (tag, t, c) =>
      Catalog.load(spark, sfDir, t)
        .select(col(c).cast("long").as("v")).distinct()
        .select(lit(tag).as("col_name"), $"v")
    }.reduce(_.unionByName(_)).cache()
    val counts = dv.groupBy($"col_name").agg(count(lit(1)).as("n_dv"))
    dv.select($"col_name".as("col_a"), $"v")
      .join(dv.select($"col_name".as("col_b"), $"v"), Seq("v"))
      .filter($"col_a" =!= $"col_b")
      .groupBy($"col_a", $"col_b").agg(count(lit(1)).as("n_common"))
      .join(broadcast(counts.select($"col_name".as("col_a"),
        $"n_dv".as("n_a"))), Seq("col_a"))
      .join(broadcast(counts.select($"col_name".as("col_b"),
        $"n_dv".as("n_b"))), Seq("col_b"))
      .select($"col_a", $"col_b", $"n_a", $"n_b", $"n_common",
        expr("n_common * 1000000 div n_a").as("incl_ppm"))
      .orderBy($"incl_ppm".desc, $"col_a".asc_nulls_first,
        $"col_b".asc_nulls_first)
  }

  private val profileJoinDiscoveryOracle = """
    WITH dv AS (
      SELECT 'customer.c_custkey' AS col_name,
        CAST(c_custkey AS BIGINT) AS v FROM customer GROUP BY 2
      UNION ALL SELECT 'orders.o_custkey', CAST(o_custkey AS BIGINT)
        FROM orders GROUP BY 2
      UNION ALL SELECT 'nation.n_nationkey', CAST(n_nationkey AS BIGINT)
        FROM nation GROUP BY 2
      UNION ALL SELECT 'customer.c_nationkey', CAST(c_nationkey AS BIGINT)
        FROM customer GROUP BY 2
      UNION ALL SELECT 'supplier.s_nationkey', CAST(s_nationkey AS BIGINT)
        FROM supplier GROUP BY 2
      UNION ALL SELECT 'part.p_partkey', CAST(p_partkey AS BIGINT)
        FROM part GROUP BY 2
      UNION ALL SELECT 'lineitem.l_partkey', CAST(l_partkey AS BIGINT)
        FROM lineitem GROUP BY 2),
    counts AS (SELECT col_name, count(*) AS n_dv FROM dv GROUP BY 1),
    pairs AS (
      SELECT a.col_name AS col_a, b.col_name AS col_b,
        count(*) AS n_common
      FROM dv a JOIN dv b ON a.v = b.v AND a.col_name <> b.col_name
      GROUP BY 1, 2)
    SELECT p.col_a, p.col_b, ca.n_dv AS n_a, cb.n_dv AS n_b, p.n_common,
      CAST(p.n_common * 1000000 // ca.n_dv AS BIGINT) AS incl_ppm
    FROM pairs p
    JOIN counts ca ON ca.col_name = p.col_a
    JOIN counts cb ON cb.col_name = p.col_b
    ORDER BY incl_ppm DESC, col_a ASC NULLS FIRST, col_b ASC NULLS FIRST"""

  private val KmvK = 256

  /** KMV (k-minimum-values) DISTINCT-COUNT SKETCH (round 16) — the
    * bottom-k sketch underlying the Theta family, graded EXACTLY: unlike
    * the HLL/Theta cap-only entries (engine-specific hash), the hash here
    * is the Knuth multiplicative mix in plain int64 arithmetic (the
    * q_sample_hash precedent — a bijection mod 2³¹, engine-independent),
    * so the k-th minimum, the estimate, and the hash itself are
    * oracle-checkable to the bit. Estimator: with k minima over hashes
    * uniform on [0, 2³¹), E[distinct] ≈ (k−1)·2³¹ / h_k; when the domain
    * has fewer than k distinct hashes the sketch IS the exact count.
    *
    * Scale: this is the textbook mergeable sketch — per-partition
    * bottom-k sets union-merge to the global bottom-k, which is exactly
    * how Spark executes `orderBy(h).limit(k)` (TakeOrdered: partial
    * top-k per partition, k·P rows to one merge, never a global sort);
    * the distinct-on-hash upstream is map-side combined. One sketch
    * answers distinct-count at any accuracy ∝ 1/√k with k·8 bytes of
    * state — the 100-TB cardinality profiler.
    */
  private def statKmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Catalog.load(spark, sfDir, "orders")
    val h = pmod(($"o_custkey".bitwiseAND(2147483647L)) * lit(2654435761L),
      lit(2147483648L))
    val bottom = orders.select(h.as("h")).distinct()
      .orderBy($"h".asc).limit(KmvK)
    val sk = bottom.agg(count(lit(1)).as("k"), max($"h").as("kth_hash"))
    val truth = orders.agg(countDistinct($"o_custkey").as("true_distinct"))
    sk.crossJoin(truth).select(
      $"k", $"kth_hash",
      when($"k" < KmvK, $"k".cast("double"))
        .otherwise(round(lit((KmvK - 1).toDouble) * lit(2147483648.0)
          / $"kth_hash".cast("double"), 4))
        .as("est_distinct"),
      $"true_distinct")
  }

  private val statKmvDistinctOracle = s"""
    WITH hs AS (
      SELECT DISTINCT ((o_custkey & 2147483647) * 2654435761)
                      % 2147483648 AS h
      FROM orders),
    bottom AS (SELECT h FROM hs ORDER BY h ASC LIMIT $KmvK),
    sk AS (SELECT CAST(count(*) AS BIGINT) AS k, max(h) AS kth_hash
           FROM bottom),
    t AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS true_distinct
          FROM orders)
    SELECT k, kth_hash,
      CASE WHEN k < $KmvK THEN CAST(k AS DOUBLE)
           ELSE round(${(KmvK - 1).toDouble} * 2147483648.0
                      / CAST(kth_hash AS DOUBLE), 4) END AS est_distinct,
      true_distinct
    FROM sk CROSS JOIN t"""

  private val CmW = 65536
  /** Four public odd mixers (Knuth + xxhash/murmur primes) — odd ⇒ each
    * is a bijection mod 2³¹ before the width fold, and all are plain
    * int64 arithmetic, engine-independent. */
  private val CmMults =
    Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)

  /** COUNT-MIN FREQUENCY SKETCH (round 16) — the point-query frequency
    * sketch, graded EXACTLY like [[statKmvDistinct]]: depth-4 ×
    * width-[[CmW]] counters over engine-independent odd-multiplier
    * hashes, estimate(k) = min over rows of counter[h_i(k)] — always an
    * OVERCOUNT (collisions only add), never an undercount, which the
    * emitted overcount column exhibits per probe and the spec pins as an
    * invariant. The cap-only q_agg_sketch_freq twin keeps the
    * engine-specific-hash variant; this one is hash-checked to the bit
    * against DuckDB.
    *
    * Scale: the sketch IS one map-side-combined (row, bucket) aggregate
    * bounded at d·w counters regardless of corpus size — mergeable by
    * counter addition (the streaming/MapReduce frequency standard);
    * probe lookups broadcast-join the bounded counter table.
    */
  private def aggSketchCm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Catalog.load(spark, sfDir, "orders")
    val rows = array(CmMults.zipWithIndex.map { case (m, i) =>
      struct(lit(i).as("i"), lit(m).as("m"))
    }: _*)
    def bucket(key: Column, m: Column): Column =
      pmod(pmod(key.bitwiseAND(2147483647L) * m, lit(2147483648L)), lit(CmW.toLong))
    val counters = orders
      .select($"o_custkey", explode(rows).as("r"))
      .select($"r.i".as("i"), bucket($"o_custkey", $"r.m").as("b"))
      .groupBy($"i", $"b").agg(count(lit(1)).as("cnt"))
    val probes = orders.filter($"o_custkey" < 10)
      .groupBy($"o_custkey").agg(count(lit(1)).as("true_count"))
    probes
      .select($"o_custkey", $"true_count", explode(rows).as("r"))
      .select($"o_custkey", $"true_count", $"r.i".as("i"),
        bucket($"o_custkey", $"r.m").as("b"))
      .join(broadcast(counters), Seq("i", "b"))
      .groupBy($"o_custkey", $"true_count")
      .agg(min($"cnt").as("cm_estimate"))
      .select($"o_custkey", $"true_count", $"cm_estimate",
        ($"cm_estimate" - $"true_count").as("overcount"))
      .orderBy($"o_custkey".asc_nulls_first)
  }

  private val aggSketchCmOracle = {
    val rows = CmMults.zipWithIndex.map { case (m, i) =>
      s"SELECT $i AS i, CAST($m AS BIGINT) AS m"
    }.mkString(" UNION ALL ")
    s"""
    WITH hs AS ($rows),
    counters AS (
      SELECT i, ((o_custkey & 2147483647) * m) % 2147483648 % $CmW AS b,
        CAST(count(*) AS BIGINT) AS cnt
      FROM orders CROSS JOIN hs GROUP BY 1, 2),
    probes AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS true_count
      FROM orders WHERE o_custkey < 10 GROUP BY 1),
    est AS (
      SELECT p.o_custkey, p.true_count, min(c.cnt) AS cm_estimate
      FROM probes p CROSS JOIN hs
      JOIN counters c
        ON c.i = hs.i
        AND c.b = ((p.o_custkey & 2147483647) * hs.m) % 2147483648 % $CmW
      GROUP BY 1, 2)
    SELECT o_custkey, true_count, cm_estimate,
      cm_estimate - true_count AS overcount
    FROM est ORDER BY o_custkey ASC NULLS FIRST"""
  }

  override val queries: Vector[Q] = Vector(
    Q("q_agg_sketch_cm", aggSketchCm, Some(aggSketchCmOracle)),
    Q("q_stat_kmv_distinct", statKmvDistinct, Some(statKmvDistinctOracle)),
    Q("q_profile_join_discovery", profileJoinDiscovery,
      Some(profileJoinDiscoveryOracle)),
    Q("q_audit_checksum", auditChecksum, Some(auditChecksumOracle)),
    Q("q_stat_corr_matrix", statCorrMatrix, Some(statCorrMatrixOracle)),
    Q("q_stat_spearman", statSpearman, Some(statSpearmanOracle)),
    Q("q_stat_hhi", statHhi, Some(statHhiOracle)),
    Q("q_text_hapax", textHapax, Some(textHapaxOracle)),
  )
}
