package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Catalog, Oracle, Q, QueryPack}
import graft.Dsl._

/** SURVEY.md §2.Q — data governance (added round 5): PII
  * masking/pseudonymization and stratified sampling — the compliance and
  * downsampling stages of a training-data pipeline.
  *
  * Scale notes (100 TB posture):
  *  - Masking is pure per-row column arithmetic (hash, substring, pad) —
  *    fully pushed into the scan projection, no shuffle at all, trivially
  *    parallel. sha2 is a codegen'd built-in, not a UDF.
  *  - Stratified sampling is a per-row deterministic hash filter with a
  *    per-stratum threshold (CASE on the stratum column) — pushes into the
  *    scan, samples every partition independently, no RNG state, no global
  *    pass, reproducible across engines/runs/retries (exactly-once-friendly:
  *    a re-read of the same row makes the same keep/drop decision). The
  *    only shuffle is the final per-stratum audit aggregation.
  */
object Governance extends QueryPack {

  /** Pseudonymize customers: synthesized email (fixtures carry no real PII),
    * masked email local-part, SHA-256 name digest, last-4-visible key mask,
    * and a coarse balance bucket — the typical outbound "safe view".
    */
  private def piiMask(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val email = concat(lower(regexp_replace($"c_name", "#", ".")),
      lit("@example.com"))
    Catalog.load(spark, sfDir, "customer")
      .select($"c_custkey", email.as("email"))
      .select(
        $"c_custkey",
        $"email",
        concat(substring($"email", 1, 1), lit("***@"),
          substring_index($"email", "@", -1)).as("masked_email"),
        sha2(concat(lit("graft_salt:"),
          lpad($"c_custkey".cast("string"), 12, "0")), 256).as("key_digest"),
        concat(lit("****"),
          substring(lpad($"c_custkey".cast("string"), 9, "0"), 6, 4))
          .as("key_mask"))
      .orderBy($"c_custkey".asc_nulls_first)
  }

  private val piiMaskOracle = """
    WITH e AS (
      SELECT c_custkey,
             lower(regexp_replace(c_name, '#', '.')) || '@example.com' AS email
      FROM customer)
    SELECT c_custkey, email,
      substring(email, 1, 1) || '***@' ||
        split_part(email, '@', 2) AS masked_email,
      sha256('graft_salt:' || lpad(CAST(c_custkey AS VARCHAR), 12, '0'))
        AS key_digest,
      '****' || substring(lpad(CAST(c_custkey AS VARCHAR), 9, '0'), 6, 4)
        AS key_mask
    FROM e
    ORDER BY c_custkey ASC NULLS FIRST"""

  /** Deterministic stratified sample of orders with per-stratum rates
    * (URGENT 20%, HIGH 10%, rest 5%) via the Knuth multiplicative hash on
    * the row key; output is the per-stratum sampling audit.
    *
    * The key is masked to its low 31 bits before the multiply: the product
    * then tops out at 2³¹·K ≈ 5.7e18 < Long.MaxValue, so the arithmetic is
    * exact-and-identical in Spark (which would silently wrap) and DuckDB
    * (which would raise) for ANY bigint key — without the mask, keys above
    * ~3.47e9 (reached by TPC-H orderkeys near sf600) wrap negative in Spark
    * and every such row lands in-sample, silently diverging cross-engine.
    */
  private def sampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val threshold = when($"o_orderpriority" === "1-URGENT", lit(858993459L))
      .when($"o_orderpriority" === "2-HIGH", lit(429496730L))
      .otherwise(lit(214748365L))
    val inSample =
      ($"o_orderkey".bitwiseAND(lit(2147483647L)) * lit(2654435761L)) %
        lit(4294967296L) < threshold
    Catalog.load(spark, sfDir, "orders")
      .withColumn("in_sample", inSample)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_pop"),
        sum(when($"in_sample", 1L).otherwise(0L)).as("n_sample"),
        dsum(when($"in_sample", $"o_totalprice")).as("sampled_revenue"))
      .withColumn("rate", $"n_sample".cast("double") / $"n_pop".cast("double"))
      .select($"o_orderpriority", $"n_pop", $"n_sample", $"rate",
        $"sampled_revenue")
      .orderBy($"o_orderpriority".asc_nulls_first)
  }

  private val sampleStratifiedOracle = s"""
    WITH s AS (
      SELECT o_orderpriority, o_totalprice,
        (((o_orderkey & 2147483647) * 2654435761) % 4294967296) <
          (CASE o_orderpriority WHEN '1-URGENT' THEN 858993459
                                WHEN '2-HIGH' THEN 429496730
                                ELSE 214748365 END) AS in_sample
      FROM orders)
    SELECT o_orderpriority,
      count(*) AS n_pop,
      CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT) AS n_sample,
      CAST(CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) /
        CAST(count(*) AS DOUBLE) AS rate,
      ${Oracle.dsum("CASE WHEN in_sample THEN o_totalprice END")} AS sampled_revenue
    FROM s
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC NULLS FIRST"""

  /** Deterministic train/val/test split of the document corpus (added
    * round 9): the Knuth multiplicative hash of doc_id (masked to 31 bits
    * so the product stays within int64 for any key — see
    * [[sampleStratified]]'s overflow note) buckets every document into
    * 80/10/10 (thresholds are the exact integers
    * floor(0.8·2³²) and floor(0.9·2³²)); output is the split audit —
    * docs, characters, exact ppm share per split. The assignment every
    * training pipeline needs to be STABLE: hash of the key, never rand()
    * (reproducible across engines, runs, and task retries, and a document
    * can never migrate between splits as the corpus grows).
    *
    * Scale: the split tag is pure scan-side arithmetic; one 3-row
    * aggregate; the share join is a broadcast of a 1-row total.
    */
  private def splitTrainTest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = ($"doc_id".bitwiseAND(lit(2147483647L)) * lit(2654435761L)) %
      lit(4294967296L)
    val agg = Catalog.load(spark, sfDir, "documents")
      .select($"doc_id", $"n_chars",
        when(h < 3435973836L, "train")
          .when(h < 3865470566L, "val")
          .otherwise("test").as("split"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .cache() // referenced twice: output spine + the 1-row total
    agg.crossJoin(broadcast(agg.agg(sum($"n_docs").as("total"))))
      .select($"split", $"n_docs", $"sum_chars",
        expr("n_docs * 1000000 div total").as("share_ppm"))
      .orderBy($"split".asc_nulls_first)
  }

  private val splitTrainTestOracle = """
    WITH a AS (
      SELECT CASE WHEN ((doc_id & 2147483647) * 2654435761) % 4294967296 < 3435973836
                  THEN 'train'
                  WHEN ((doc_id & 2147483647) * 2654435761) % 4294967296 < 3865470566
                  THEN 'val' ELSE 'test' END AS split,
        count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY 1)
    SELECT split, n_docs, sum_chars,
      CAST(n_docs * 1000000
        // CAST((SELECT sum(n_docs) FROM a) AS BIGINT) AS BIGINT) AS share_ppm
    FROM a ORDER BY split ASC NULLS FIRST"""

  /** Declarative data-quality expectations audit (added round 10): six
    * named checks over orders — not-null key, key uniqueness, value range,
    * accepted domain, date range, referential integrity — each reported as
    * (checked, violations, pass). Mixed by design: the range and date
    * checks FIRE on the fixtures (thresholds inside the observed value
    * range) so the violation counting is exercised, the structural checks
    * hold at zero. The contract-enforcement front door of a pipeline: run
    * this, gate the load on `pass`.
    *
    * Scale: the five single-table checks are ONE aggregation pass over the
    * scan (conditional sums + a two-phase distinct), unpivoted with
    * `stack` — adding a check adds a column, not a scan; the referential
    * check probes the parent with the DISTINCT child keys (bounded by
    * |customers|), same shape as q_audit_referential.
    */
  private def qualityExpectations(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Catalog.load(spark, sfDir, "orders")
    val single = o.agg(
        count(lit(1)).as("n_rows"),
        sum(when($"o_orderkey".isNull, 1L).otherwise(0L)).as("v_null"),
        (count(lit(1)) - countDistinct($"o_orderkey")).as("v_unique"),
        sum(when($"o_totalprice" < 0.0 || $"o_totalprice" > 400000.0, 1L)
          .otherwise(0L)).as("v_range"),
        sum(when(!$"o_orderpriority".isin(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"), 1L)
          .otherwise(0L)).as("v_domain"),
        sum(when($"o_orderdate" < lit("1995-01-01").cast("timestamp") ||
            $"o_orderdate" > lit("2001-06-30").cast("timestamp"), 1L)
          .otherwise(0L)).as("v_dates"))
      .select(expr("""stack(5,
        'orders.o_orderkey not_null', n_rows, v_null,
        'orders.o_orderkey unique', n_rows, v_unique,
        'orders.o_totalprice range[0,400000]', n_rows, v_range,
        'orders.o_orderpriority domain', n_rows, v_domain,
        'orders.o_orderdate range[1995-01-01,2001-06-30]', n_rows, v_dates)
        AS (check_name, n_checked, n_violations)"""))
    val referential = o.select($"o_custkey").distinct()
      .join(Catalog.load(spark, sfDir, "customer").select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left")
      .agg(
        lit("orders.o_custkey referential customer").as("check_name"),
        count(lit(1)).as("n_checked"),
        sum(when($"c_custkey".isNull, 1L).otherwise(0L)).as("n_violations"))
    single.unionAll(referential)
      .withColumn("pass", $"n_violations" === 0L)
      .orderBy($"check_name".asc_nulls_first)
  }

  private val qualityExpectationsOracle = """
    WITH a AS (
      SELECT count(*) AS n_rows,
        CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
        count(*) - count(DISTINCT o_orderkey) AS v_unique,
        CAST(sum(CASE WHEN o_totalprice < 0.0 OR o_totalprice > 400000.0
          THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
        CAST(sum(CASE WHEN o_orderpriority NOT IN
          ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
          THEN 1 ELSE 0 END) AS BIGINT) AS v_domain,
        CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
          OR o_orderdate > TIMESTAMP '2001-06-30 00:00:00'
          THEN 1 ELSE 0 END) AS BIGINT) AS v_dates
      FROM orders),
    r AS (
      SELECT count(*) AS n_checked,
        CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viol
      FROM (SELECT DISTINCT o_custkey FROM orders) k
      LEFT JOIN customer ON o_custkey = c_custkey),
    u AS (
      SELECT 'orders.o_orderkey not_null' AS check_name,
        n_rows AS n_checked, v_null AS n_violations FROM a
      UNION ALL SELECT 'orders.o_orderkey unique', n_rows, v_unique FROM a
      UNION ALL SELECT 'orders.o_totalprice range[0,400000]', n_rows, v_range FROM a
      UNION ALL SELECT 'orders.o_orderpriority domain', n_rows, v_domain FROM a
      UNION ALL SELECT 'orders.o_orderdate range[1995-01-01,2001-06-30]',
        n_rows, v_dates FROM a
      UNION ALL SELECT 'orders.o_custkey referential customer',
        n_checked, n_viol FROM r)
    SELECT check_name, n_checked, n_violations, n_violations = 0 AS pass
    FROM u ORDER BY check_name ASC NULLS FIRST"""

  /** Right-to-be-forgotten cascade audit (added round 10): given a
    * deterministic forget-set (~5% of customers — the Knuth multiplicative
    * hash of the key below floor(2³²/20); a real run would read a consent
    * table, the CASCADE is what's being exercised), report per table how
    * many rows a purge would remove: customers themselves, their orders,
    * those orders' lineitems, and their event streams. The four counts are
    * exactly what a deletion job must reconcile before and after.
    *
    * Scale: customer/orders/events decide membership by pure SCAN-SIDE
    * ARITHMETIC on their own key column — the forget rule is a hash
    * predicate, so there is NO join against a forget-key list for any
    * table that carries the key (at 100 TB that list itself would be
    * millions of rows — shipping the rule beats shipping the set).
    * Only lineitem, which doesn't carry custkey, pays a join — on
    * orderkey against the (pruned-column) orders table, the same single
    * fact-fact shuffle every lineitem-orders query pays. Union of four
    * 1-row aggregates; ppm share is exact integer arithmetic.
    */
  private def gdprForget(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def forgotten(key: org.apache.spark.sql.Column) =
      (key.bitwiseAND(lit(2147483647L)) * lit(2654435761L)) %
        lit(4294967296L) < lit(214748364L)
    val t = table(spark, sfDir) _
    def audit(name: String, df: DataFrame, purged: org.apache.spark.sql.Column) =
      df.agg(
        lit(name).as("table_name"),
        count(lit(1)).as("rows_total"),
        sum(when(purged, 1L).otherwise(0L)).as("rows_purged"))
    val li = t("lineitem").select($"l_orderkey")
      .join(t("orders").select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
    audit("customer", t("customer"), forgotten($"c_custkey"))
      .unionAll(audit("orders", t("orders"), forgotten($"o_custkey")))
      .unionAll(audit("lineitem", li, forgotten($"o_custkey")))
      .unionAll(audit("events", t("events"), forgotten($"user_id")))
      .select($"table_name", $"rows_total", $"rows_purged",
        ($"rows_total" - $"rows_purged").as("rows_retained"),
        expr("rows_purged * 1000000 div rows_total").as("purge_ppm"))
      .orderBy($"table_name".asc_nulls_first)
  }

  private val gdprForgetOracle = """
    WITH c AS (
      SELECT 'customer' AS table_name, count(*) AS rows_total,
        CAST(sum(CASE WHEN ((c_custkey & 2147483647) * 2654435761) % 4294967296
          < 214748364 THEN 1 ELSE 0 END) AS BIGINT) AS rows_purged
      FROM customer),
    o AS (
      SELECT 'orders', count(*),
        CAST(sum(CASE WHEN ((o_custkey & 2147483647) * 2654435761) % 4294967296
          < 214748364 THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders),
    l AS (
      SELECT 'lineitem', count(*),
        CAST(sum(CASE WHEN ((o_custkey & 2147483647) * 2654435761) % 4294967296
          < 214748364 THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    e AS (
      SELECT 'events', count(*),
        CAST(sum(CASE WHEN ((user_id & 2147483647) * 2654435761) % 4294967296
          < 214748364 THEN 1 ELSE 0 END) AS BIGINT)
      FROM events),
    u AS (
      SELECT * FROM c UNION ALL SELECT * FROM o
      UNION ALL SELECT * FROM l UNION ALL SELECT * FROM e)
    SELECT table_name, rows_total, rows_purged,
      rows_total - rows_purged AS rows_retained,
      rows_purged * 1000000 // rows_total AS purge_ppm
    FROM u ORDER BY table_name ASC NULLS FIRST"""

  /** K-anonymity audit (added round 11) — the re-identification check a
    * governance pipeline runs BEFORE releasing a "de-identified" extract:
    * group the table by its quasi-identifier tuple (here segment ×
    * nation × account-balance band — the attributes an adversary can
    * link from outside) and report every equivalence class smaller than
    * k = 5: those customers are re-identifiable even with names/phones
    * masked (q_pii_mask handles the direct identifiers; this catches the
    * indirect ones). Output = the violating classes with their sizes,
    * smallest (most identifiable) first — the worklist a generalization
    * pass (coarser bands, suppressed cells) would consume.
    *
    * Scale: ONE map-side-combined aggregation over the extract + a
    * filter — the audit costs a groupBy no matter the table size, and
    * the violating-class report is bounded by the QI domain, not rows.
    */
  private def piiKanonymity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "customer")
      .select($"c_mktsegment", $"c_nationkey",
        floor($"c_acctbal" / 1000.0).cast("long").as("bal_band"))
      .groupBy($"c_mktsegment", $"c_nationkey", $"bal_band")
      .agg(count(lit(1)).as("class_size"))
      .filter($"class_size" < 5)
      .orderBy($"class_size".asc_nulls_first,
        $"c_mktsegment".asc_nulls_first, $"c_nationkey".asc_nulls_first,
        $"bal_band".asc_nulls_first)
  }

  private val piiKanonymityOracle = """
    SELECT c_mktsegment, c_nationkey,
      CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
      count(*) AS class_size
    FROM customer
    GROUP BY 1, 2, 3
    HAVING count(*) < 5
    ORDER BY class_size ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST,
      c_nationkey ASC NULLS FIRST, bal_band ASC NULLS FIRST"""

  /** L-diversity audit (round 13) — k-anonymity's stronger sibling: a
    * QI class of size ≥ k is STILL disclosive if everyone in it shares
    * the same sensitive value (the homogeneity attack — "all 7 patients
    * in that class have the flu"). Over the released order extract, the
    * quasi-identifier tuple is (customer nation, order year-month,
    * market segment) and the sensitive attribute is the order priority;
    * report
    * every class whose distinct-sensitive-value count l < 3, most
    * homogeneous first — the suppression worklist l-diversity
    * enforcement consumes.
    *
    * Scale: ONE map-side-combined aggregation (count + exact distinct
    * over a 5-value sensitive domain — the two-phase distinct rewrite
    * keeps it combiner-friendly); the report is bounded by the QI
    * domain (≤ 25·84·5 classes), never by corpus rows — the year-month
    * QI keeps classes order-of-tens at any SF, so the audit stays
    * non-degenerate as the corpus grows.
    */
  private def piiLdiversity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .join(Catalog.load(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey",
        (year($"o_orderdate") * 100 + month($"o_orderdate")).cast("long")
          .as("o_ym"),
        $"c_mktsegment", $"o_orderpriority")
      .groupBy($"c_nationkey", $"o_ym", $"c_mktsegment")
      .agg(count(lit(1)).as("class_size"),
        countDistinct($"o_orderpriority").as("l_div"))
      .filter($"l_div" < 3)
      .orderBy($"l_div".asc_nulls_first, $"class_size".asc_nulls_first,
        $"c_nationkey".asc_nulls_first, $"o_ym".asc_nulls_first,
        $"c_mktsegment".asc_nulls_first)
  }

  private val piiLdiversityOracle = """
    SELECT c_nationkey,
      CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS o_ym,
      c_mktsegment, count(*) AS class_size,
      count(DISTINCT o_orderpriority) AS l_div
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2, 3
    HAVING count(DISTINCT o_orderpriority) < 3
    ORDER BY l_div ASC NULLS FIRST, class_size ASC NULLS FIRST,
      c_nationkey ASC NULLS FIRST, o_ym ASC NULLS FIRST,
      c_mktsegment ASC NULLS FIRST"""

  /** Population-Stability-Index drift report (added round 11) — the
    * standard ML-ops monitor for "did this feature's distribution move
    * between training and serving": order values bucketed into ten fixed
    * bands, 1995 as the reference period vs 1996 as the comparison, with
    * Laplace smoothing ((n+1)/(N+10)) so empty bands stay finite. The
    * per-band term (p−q)·ln(p/q) follows the q_math_funcs transcendental
    * rule — ln rounded to 4dp first (ulp wobble cannot cross the 1e-4
    * grid), term rounded to 6dp — so every row is bit-deterministic
    * cross-engine; consumers sum the column for the headline PSI (> 0.2
    * = actionable drift by the usual rule of thumb).
    *
    * Scale: one conditional-count pass over the fact + a 1-row totals
    * broadcast — the drift monitor costs a groupBy at any size.
    */
  private def qualityDriftPsi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Catalog.load(spark, sfDir, "orders")
      .filter(year($"o_orderdate").isin(1995, 1996))
      .select(year($"o_orderdate").as("y"),
        least(floor($"o_totalprice" / 50000.0), lit(9.0)).cast("long")
          .as("band"))
    val counts = o.groupBy($"band")
      .agg(
        sum(when($"y" === 1995, 1L).otherwise(0L)).as("n_1995"),
        sum(when($"y" === 1996, 1L).otherwise(0L)).as("n_1996"))
    val totals = counts.agg(
      sum($"n_1995").as("t95"), sum($"n_1996").as("t96"))
    counts.crossJoin(broadcast(totals))
      .withColumn("p",
        ($"n_1995" + 1L).cast("double") / ($"t95" + 10L).cast("double"))
      .withColumn("q",
        ($"n_1996" + 1L).cast("double") / ($"t96" + 10L).cast("double"))
      .select($"band", $"n_1995", $"n_1996",
        round(($"p" - $"q") * round(log($"p" / $"q"), 4), 6).as("psi_term"))
      .orderBy($"band".asc_nulls_first)
  }

  private val qualityDriftPsiOracle = """
    WITH o AS (
      SELECT year(o_orderdate) AS y,
        CAST(least(floor(o_totalprice / 50000.0), 9.0) AS BIGINT) AS band
      FROM orders WHERE year(o_orderdate) IN (1995, 1996)),
    counts AS (
      SELECT band,
        CAST(sum(CASE WHEN y = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS n_1995,
        CAST(sum(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS n_1996
      FROM o GROUP BY band),
    totals AS (
      SELECT CAST(sum(n_1995) AS BIGINT) AS t95,
        CAST(sum(n_1996) AS BIGINT) AS t96
      FROM counts),
    pq AS (
      SELECT band, n_1995, n_1996,
        CAST(n_1995 + 1 AS DOUBLE) / CAST(t95 + 10 AS DOUBLE) AS p,
        CAST(n_1996 + 1 AS DOUBLE) / CAST(t96 + 10 AS DOUBLE) AS q
      FROM counts, totals)
    SELECT band, n_1995, n_1996,
      round((p - q) * round(ln(p / q), 4), 6) AS psi_term
    FROM pq
    ORDER BY band ASC NULLS FIRST"""

  private val SampleTicks = 1000L

  /** WEIGHTED SAMPLING — systematic probability-proportional-to-size
    * (added round 12): draw ~[[SampleTicks]] orders with inclusion
    * probability proportional to o_totalprice, the downsampling shape a
    * 100-TB corpus uses when rows carry importance weights (quality
    * scores, dedup multiplicities). Deterministic systematic PPS: lay
    * [[SampleTicks]] equally-spaced ticks (phase = step/2) along the
    * cumulative-weight axis ordered by o_orderkey; an order is selected
    * iff a tick lands inside its weight interval, with multiplicity = the
    * number of captured ticks (heavy rows can capture several — the
    * with-replacement multiplicity PPS reports rather than hides).
    *
    * Everything is exact integer cents, so the oracle is bit-equal: no
    * RNG, no float thresholds — rerunning a failed task re-derives the
    * same sample (exactly-once-friendly, like q_sample_stratified's hash
    * filter, but for WEIGHTED inclusion which a per-row hash cannot do).
    *
    * Scale: the global cumulative weight runs through
    * [[DistributedRank.cumsumExact]] (bucketed two-level cumsum — no
    * single-partition window anywhere); the (step, phase) pair is a 1-row
    * broadcast dim; selection is then a pure per-row integer predicate.
    * Two passes over the weights, zero corpus shuffles beyond the cumsum's
    * own bucketing.
    */
  private def sampleWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Catalog.load(spark, sfDir, "orders")
      .select($"o_orderkey",
        ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long").as("w"))
    val cum = DistributedRank.cumsumExact(w, "w", "o_orderkey", "cw")
    // Domain guard (the q_stat_gini raise_error pattern): total weight
    // under SampleTicks cents makes step = 0 and the multiplicity
    // expression divides by zero — an ENGINE-DIVERGENT error (Spark ANSI
    // raises, DuckDB errors differently). Fail loudly with the query name
    // instead; a corpus with < 1 cent of weight per requested tick has no
    // meaningful PPS sample at this tick count.
    val params = w.agg(sum($"w").as("tot"))
      .select(when(expr(s"tot div $SampleTicks") < 1L, raise_error(lit(
          s"graft q_sample_weighted: total weight < $SampleTicks cents — " +
            "step would be 0; lower SampleTicks or supply more weight")))
        .otherwise(expr(s"tot div $SampleTicks")).as("step"))
      .select($"step", expr("step div 2").as("phase"))
    cum.crossJoin(broadcast(params))
      .withColumn("m", expr(
        "(cw + step - phase) div step - (cw - w + step - phase) div step"))
      .filter($"m" >= 1L)
      .select($"o_orderkey", $"w", $"cw", $"m")
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  private val sampleWeightedOracle = s"""
    WITH w AS (
      SELECT o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS w
      FROM orders),
    c AS (
      SELECT o_orderkey, w,
        CAST(sum(w) OVER (ORDER BY o_orderkey) AS BIGINT) AS cw
      FROM w),
    p AS (
      SELECT CAST(sum(w) // $SampleTicks AS BIGINT) AS step,
        CAST((sum(w) // $SampleTicks) // 2 AS BIGINT) AS phase
      FROM w)
    SELECT o_orderkey, w, cw,
      (cw + step - phase) // step - (cw - w + step - phase) // step AS m
    FROM c CROSS JOIN p
    WHERE (cw + step - phase) // step - (cw - w + step - phase) // step >= 1
    ORDER BY o_orderkey ASC NULLS FIRST"""

  /** T-CLOSENESS AUDIT (round 13 batch 10) — the third rung of the
    * anonymity ladder after [[piiKanonymity]] (class size) and
    * [[piiLdiversity]] (distinct sensitive values): how far each
    * quasi-identifier class's SENSITIVE-ATTRIBUTE DISTRIBUTION sits from
    * the table-wide distribution, as total-variation distance (the
    * equal-ground-distance Earth-Mover's form of Li et al.'s t). QI
    * classes = (nation, market segment); sensitive = order priority.
    * Everything is exact integers: per class g and sensitive value s,
    * |p_gs − q_s| = |c_gs·N − c_s·n_g| / (n_g·N), so
    * tv_ppm = (Σ_s |c_gs·N − c_s·n_g| · 500000) div (n_g·N) — one
    * integral division at the very end (the q_stat_hhi share pattern),
    * products through decimal(38,0)/HUGEINT (c_gs·N ≤ N² needs >int64
    * past SF~600). Missing (class, s) cells contribute c_s·n_g, made
    * explicit by a bounded scaffold join (|classes|×|priorities| ≤ 625
    * rows) — never a fact-sized fill.
    *
    * Scale: ONE map-side-combined pass over the joined fact builds the
    * (class, s) cell counts; every later frame (class totals, global
    * totals, scaffold, TV rollup) is bounded by the QI/sensitive domains.
    * The audit costs a groupBy at any size.
    */
  private def piiTcloseness(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dd = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cell = Catalog.load(spark, sfDir, "orders")
      .join(Catalog.load(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long").as("nation"),
        $"c_mktsegment".as("seg"), $"o_orderpriority".as("s"))
      .groupBy($"nation", $"seg", $"s").agg(count(lit(1)).as("c_gs"))
    val cls = cell.groupBy($"nation", $"seg").agg(sum($"c_gs").as("n_g"))
    val glob = cell.groupBy($"s").agg(sum($"c_gs").as("c_s"))
    val tot = glob.agg(sum($"c_s").as("n"))
    cls.crossJoin(broadcast(glob))
      .join(cell, Seq("nation", "seg", "s"), "left_outer")
      .select($"nation", $"seg", $"n_g", $"c_s",
        coalesce($"c_gs", lit(0L)).as("c_gs"))
      .crossJoin(broadcast(tot))
      .groupBy($"nation", $"seg", $"n_g", $"n")
      .agg(sum(abs(dd($"c_gs") * $"n" - dd($"c_s") * $"n_g")).as("tv_num"))
      .select($"nation", $"seg", $"n_g".as("class_size"),
        expr("(tv_num * 500000) div (CAST(n_g AS DECIMAL(38,0)) * n)")
          .as("tv_ppm"))
      .orderBy($"tv_ppm".desc, $"nation".asc_nulls_first,
        $"seg".asc_nulls_first)
  }

  private val piiTclosenessOracle = """
    WITH cell AS (
      SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS seg,
        o_orderpriority AS s, CAST(count(*) AS HUGEINT) AS c_gs
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2, 3),
    cls AS (SELECT nation, seg, sum(c_gs) AS n_g FROM cell GROUP BY 1, 2),
    gl AS (SELECT s, sum(c_gs) AS c_s FROM cell GROUP BY 1),
    tot AS (SELECT sum(c_s) AS n FROM gl),
    filled AS (
      SELECT cls.nation, cls.seg, cls.n_g, gl.c_s,
        COALESCE(cell.c_gs, 0) AS c_gs
      FROM cls CROSS JOIN gl
      LEFT JOIN cell ON cell.nation = cls.nation AND cell.seg = cls.seg
        AND cell.s = gl.s)
    SELECT nation, seg, CAST(n_g AS BIGINT) AS class_size,
      CAST((sum(abs(c_gs * n - c_s * n_g)) * 500000) // (n_g * n)
        AS BIGINT) AS tv_ppm
    FROM filled CROSS JOIN tot
    GROUP BY nation, seg, n_g, n
    ORDER BY tv_ppm DESC, nation ASC NULLS FIRST, seg ASC NULLS FIRST"""

  /** PII TOKENIZATION VAULT (round 16) — consistent pseudonymization by
    * surrogate key: every distinct sensitive value maps to one stable
    * opaque token (`tok_00000042`), so downstream joins and group-bys on
    * the tokenized column still line up across tables and runs while the
    * raw value never leaves the vault — the classic
    * tokenization-service semantics, distinct from [[piiMask]]'s one-way
    * hashing (tokens are compact, dictionary-reversible for authorized
    * re-identification, and leak nothing about the value's length or
    * content). The sensitive value is a synthesized email (fixtures carry
    * no real PII) whose local part is the Knuth multiplicative hash of
    * the key — a bijection mod 2³¹, so emails are distinct and their SORT
    * ORDER is hash-scrambled, not key order: the graded token assignment
    * cannot be faked by ranking the key itself.
    *
    * Scale: the dictionary is `distinct` on the value (map-side-combined
    * shuffle); token numbers come from [[DistributedRank.cumsumExact]]'s
    * literal-boundary bucketed rank (one bounded approxQuantile action +
    * per-bucket window + broadcast offsets — NEVER a single-partition
    * global window); the value→token join back to the fact is a plain
    * equi shuffle that AQE broadcasts when the dictionary is small. New
    * values in a later batch extend the vault by ranking only the
    * anti-joined novelty above the stored max token — the same machinery.
    */
  /** Spec hook: the full (c_custkey, token) vault assignment. */
  private[graft] def tokenizeFull(spark: SparkSession,
                                  sfDir: String): DataFrame = {
    import spark.implicits._
    val h = pmod(($"c_custkey".bitwiseAND(2147483647L)) * lit(2654435761L),
      lit(2147483648L))
    val cust = table(spark, sfDir)("customer").select($"c_custkey",
      concat(lit("u"), lpad(h.cast("string"), 10, "0"), lit("@"),
        lower($"c_mktsegment"), lit(".example")).as("email"))
    // Fixed-width digit local part ⇒ email lexicographic order ≡ numeric
    // order of the local part; the numeric proxy feeds the bucketed rank
    // (approxQuantile needs a numeric column — any fixed-width digit
    // surrogate admits one).
    val dict = cust.select($"email").distinct()
      .withColumn("__proxy", substring($"email", 2, 10).cast("long"))
      .withColumn("__one", lit(1L))
    val tokens = DistributedRank
      .cumsumExact(dict, "__one", "__proxy", "__rank")
      .select($"email",
        concat(lit("tok_"), lpad($"__rank".cast("string"), 8, "0"))
          .as("token"))
    cust.join(tokens, Seq("email"))
      .select($"c_custkey", $"token")
  }

  private def piiTokenize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    tokenizeFull(spark, sfDir)
      .filter($"c_custkey" % 97 === 0)
      .orderBy($"c_custkey".asc)
  }

  private val piiTokenizeOracle = """
    WITH cust AS (
      SELECT c_custkey,
        'u' || lpad(CAST(((c_custkey & 2147483647) * 2654435761)
                         % 2147483648 AS VARCHAR), 10, '0')
            || '@' || lower(c_mktsegment) || '.example' AS email
      FROM customer),
    dict AS (
      SELECT email, row_number() OVER (ORDER BY email) AS rnk
      FROM (SELECT DISTINCT email FROM cust) d)
    SELECT c.c_custkey,
      'tok_' || lpad(CAST(d.rnk AS VARCHAR), 8, '0') AS token
    FROM cust c JOIN dict d USING (email)
    WHERE c_custkey % 97 = 0
    ORDER BY c_custkey ASC"""

  /** DIFFERENTIALLY-PRIVATE ROLLUP EXPORT (round 18; r17 VERDICT task 5)
    * — the noisy-aggregate surface the governance pack lacked beside
    * k-anonymity/l-diversity/t-closeness/masking: per-priority order
    * counts released under a DISCRETE LAPLACE (two-sided geometric)
    * mechanism with ratio α = 1/2, i.e. ε = ln 2 per count — and since
    * the groups partition the rows, parallel composition keeps the whole
    * release at ε = ln 2. The noise is drawn by INVERSE-CDF over exact
    * integer weights W(k) = 2^(B−|k|), k ∈ [−B, B], B = [[DpB]] (total
    * mass [[DpTotal]]; truncation beyond ±B contributes δ < 2^−(B−1),
    * making the release (ln 2, 2^−15)-DP), from the suite LCG seeded by
    * the GROUP KEY's leading digit — deterministic given the seed, so
    * the oracle replays the noise EXACTLY (a production export would
    * draw the seed from a secret; determinism here is the pack's
    * oracle-exactness discipline, not a DP requirement). The inverse-CDF
    * is ONE literal CASE expression generated from the weights and
    * embedded as the SAME SQL text in both engines — zero parity risk.
    * The graded frame carries n_true and noise beside n_noisy as grading
    * instrumentation; the production export is the n_noisy column alone.
    *
    * Scale: one map-side-combined count per group + O(groups) scalar
    * arithmetic; the mechanism adds nothing data-sized. */
  private val DpB = 16
  private val dpWeights: Seq[(Int, Long)] =
    (-DpB to DpB).map(k => k -> (1L << (DpB - math.abs(k))))
  private val DpTotal = dpWeights.map(_._2).sum // 196606
  private val dpCaseSql: String = {
    val cums = dpWeights.map(_._2).scanLeft(0L)(_ + _).tail
    val branches = dpWeights.map(_._1).zip(cums).dropRight(1)
      .map { case (k, c) => s"WHEN u < $c THEN $k" }
    s"CASE ${branches.mkString(" ")} ELSE $DpB END"
  }

  /** In-memory twin of the LCG + inverse-CDF draw, for the spec. */
  private[graft] def dpNoiseOf(seed: Long): Long = {
    val u = ((1103515245L * seed + 12345L) % 2147483648L) % DpTotal
    val cums = dpWeights.map(_._2).scanLeft(0L)(_ + _).tail
    dpWeights.map(_._1).zip(cums).collectFirst {
      case (k, c) if u < c => k.toLong
    }.getOrElse(DpB.toLong)
  }

  private def gdprDpRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .groupBy($"o_orderpriority".as("priority"))
      .agg(count(lit(1)).as("n_true"))
      .select($"priority", $"n_true",
        expr("((1103515245 * CAST(substring(priority, 1, 1) AS BIGINT) " +
          s"+ 12345) % 2147483648) % $DpTotal").as("u"))
      .select($"priority", $"n_true",
        expr(s"CAST($dpCaseSql AS BIGINT)").as("noise"))
      .withColumn("n_noisy", $"n_true" + $"noise")
      .orderBy($"priority".asc_nulls_first)
  }

  private val gdprDpRollupOracle = s"""
    WITH agg AS (
      SELECT o_orderpriority AS priority, count(*) AS n_true
      FROM orders GROUP BY 1),
    seeded AS (
      SELECT priority, n_true,
        ((1103515245 * CAST(substring(priority, 1, 1) AS BIGINT)
          + 12345) % 2147483648) % $DpTotal AS u
      FROM agg)
    SELECT priority, CAST(n_true AS BIGINT) AS n_true,
      CAST($dpCaseSql AS BIGINT) AS noise,
      CAST(n_true + CAST($dpCaseSql AS BIGINT) AS BIGINT) AS n_noisy
    FROM seeded
    ORDER BY priority ASC NULLS FIRST"""

  /** DIFFERENTIALLY-PRIVATE CLIPPED SUM (round 18) — the other DP
    * release primitive beside [[gdprDpRollup]]'s counts: per-priority
    * revenue sums in integer cents, each row's contribution CLIPPED at
    * [[DpClipC]] (the bounded-contribution step every DP sum needs —
    * unbounded values have unbounded sensitivity; the bias it introduces
    * is the standard utility/privacy trade and is visible in the graded
    * n_over_clip column), then noised with the SAME discrete-Laplace
    * inverse-CDF table SCALED by the sensitivity: noise = C·k releases
    * the sum at ε = ln 2 (a one-row change moves the clipped sum by at
    * most C, and C-scaled two-sided-geometric noise gives a C-sensitive
    * statistic exactly the ε the unit table gives a 1-sensitive one).
    * Seeded by the group key through the SECOND suite LCG (69069 ·
    * seed + 362437) so the count and sum draws are decorrelated.
    * Deterministic given the seed — oracle replays exactly.
    *
    * Scale: one map-side-combined sum/count per group; the mechanism is
    * O(groups) scalar arithmetic. */
  private val DpClipC = 1000000L // clip at $10k per row, in cents

  private def gdprDpSum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .select($"o_orderpriority".as("priority"),
        ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long")
          .as("cents"))
      .groupBy($"priority")
      .agg(sum(least($"cents", lit(DpClipC))).as("sum_clipped"),
        sum(when($"cents" > DpClipC, 1L).otherwise(0L)).as("n_over_clip"))
      .select($"priority", $"sum_clipped", $"n_over_clip",
        expr("((69069 * CAST(substring(priority, 1, 1) AS BIGINT) " +
          s"+ 362437) % 2147483648) % $DpTotal").as("u"))
      .select($"priority", $"sum_clipped", $"n_over_clip",
        (lit(DpClipC) * expr(s"CAST($dpCaseSql AS BIGINT)")).as("noise_cents"))
      .withColumn("sum_noisy", $"sum_clipped" + $"noise_cents")
      .orderBy($"priority".asc_nulls_first)
  }

  private val gdprDpSumOracle = s"""
    WITH agg AS (
      SELECT o_orderpriority AS priority,
        CAST(sum(least(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
          AS BIGINT), $DpClipC)) AS BIGINT) AS sum_clipped,
        CAST(sum(CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
          AS BIGINT) > $DpClipC THEN 1 ELSE 0 END) AS BIGINT) AS n_over_clip
      FROM orders GROUP BY 1),
    seeded AS (
      SELECT priority, sum_clipped, n_over_clip,
        ((69069 * CAST(substring(priority, 1, 1) AS BIGINT)
          + 362437) % 2147483648) % $DpTotal AS u
      FROM agg)
    SELECT priority, sum_clipped, n_over_clip,
      CAST($DpClipC * ($dpCaseSql) AS BIGINT) AS noise_cents,
      CAST(sum_clipped + $DpClipC * ($dpCaseSql) AS BIGINT) AS sum_noisy
    FROM seeded
    ORDER BY priority ASC NULLS FIRST"""

  /** In-memory twin of the sum draw, for the spec. */
  private[graft] def dpSumNoiseOf(seed: Long): Long = {
    val u = ((69069L * seed + 362437L) % 2147483648L) % DpTotal
    val cums = dpWeights.map(_._2).scanLeft(0L)(_ + _).tail
    DpClipC * dpWeights.map(_._1).zip(cums).collectFirst {
      case (k, c) if u < c => k.toLong
    }.getOrElse(DpB.toLong)
  }

  override val queries: Vector[Q] = Vector(
    Q("q_gdpr_dp_rollup", gdprDpRollup, Some(gdprDpRollupOracle)),
    Q("q_gdpr_dp_sum", gdprDpSum, Some(gdprDpSumOracle)),
    Q("q_pii_tokenize", piiTokenize, Some(piiTokenizeOracle)),
    Q("q_sample_weighted", sampleWeighted, Some(sampleWeightedOracle)),
    Q("q_pii_tcloseness", piiTcloseness, Some(piiTclosenessOracle)),
    Q("q_quality_drift_psi", qualityDriftPsi, Some(qualityDriftPsiOracle)),
    Q("q_pii_kanonymity", piiKanonymity, Some(piiKanonymityOracle)),
    Q("q_pii_ldiversity", piiLdiversity, Some(piiLdiversityOracle)),
    Q("q_gdpr_forget", gdprForget, Some(gdprForgetOracle)),
    Q("q_pii_mask", piiMask, Some(piiMaskOracle)),
    Q("q_quality_expectations", qualityExpectations, Some(qualityExpectationsOracle)),
    Q("q_sample_stratified", sampleStratified, Some(sampleStratifiedOracle)),
    Q("q_split_train_test", splitTrainTest, Some(splitTrainTestOracle)),
  )
}
