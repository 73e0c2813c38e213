package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Catalog, Q, QueryPack}
import graft.Dsl._

/** SURVEY.md §2.H — scalar function surface (string / date / math / array /
  * map / JSON). Every query here is pure per-row computation: it stays
  * inside whole-stage codegen with no shuffle except the final order.
  *
  * Dialect notes baked into the oracle pairs (probed against DuckDB 1.0):
  *  - Spark `length`/`size`/`year`/... return INT, DuckDB BIGINT → Spark
  *    side casts to long.
  *  - Spark `dayofweek` is 1=Sunday, DuckDB 0=Sunday → Spark emits -1.
  *  - DuckDB `date_trunc` yields DATE for day-or-coarser units → oracle
  *    casts back to TIMESTAMP where Spark yields timestamps.
  *  - DuckDB `regexp_replace` is first-match unless the 'g' flag is given.
  *  - DuckDB `list_distinct` has unspecified order → both sides sort.
  *  - Transcendentals (ln/log10) may differ 1 ulp across libm
  *    implementations → rounded to 4dp; sqrt is IEEE-exact → raw.
  */
object Scalars extends QueryPack {

  private def strFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "customer")
      .select(
        $"c_custkey",
        upper($"c_name").as("up"),
        lower($"c_mktsegment").as("lo"),
        substring($"c_name", 10, 9).as("sub"),
        concat($"c_name", lit(":"), $"c_mktsegment").as("cat"),
        lpad($"c_custkey".cast("string"), 10, "0").as("pad"),
        length($"c_name").cast("long").as("len"),
        expr("replace(c_name, 'Customer', 'Cust')").as("rep"),
        trim(concat(lit("  "), $"c_name", lit("  "))).as("trimmed"),
        // Arrays are serialized to strings in every graded output: the
        // driver's differ cannot hash array cells (round-1 finding).
        concat_ws(",", split($"c_name", "#")).as("parts"))
      .orderBy($"c_custkey".asc_nulls_first)
  }

  private def strRegexp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "part")
      .select(
        $"p_partkey",
        regexp_extract($"p_brand", "#(\\d+)", 1).cast("int").as("brand_num"),
        regexp_replace($"p_name", " ", "_").as("name_snake"),
        $"p_name".rlike("^(hot|cold)").as("is_temp"))
      .orderBy($"p_partkey".asc_nulls_first)
  }

  private def strLevenshtein(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n = Catalog.load(spark, sfDir, "nation")
    val r = Catalog.load(spark, sfDir, "region")
    n.crossJoin(r)
      .select(
        $"n_nationkey", $"r_regionkey",
        levenshtein($"n_name", $"r_name").cast("long").as("lev"))
      .orderBy($"n_nationkey".asc_nulls_first, $"r_regionkey".asc_nulls_first)
  }

  private def dateFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("y"),
        month($"o_orderdate").cast("long").as("m"),
        dayofmonth($"o_orderdate").cast("long").as("d"),
        quarter($"o_orderdate").cast("long").as("q"),
        (dayofweek($"o_orderdate") - 1).cast("long").as("dow0"),
        date_trunc("week", $"o_orderdate").as("week_start"),
        datediff(lit("2001-09-01").cast("date"), $"o_orderdate".cast("date"))
          .cast("long").as("days_to_ref"),
        ((lit(2001) - year($"o_orderdate")) * 12 + (lit(9) - month($"o_orderdate")))
          .cast("long").as("months_to_ref"),
        unix_timestamp($"o_orderdate").as("epoch_s"))
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  private def mathFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "lineitem")
      .select(
        $"l_orderkey", $"l_linenumber",
        abs($"l_extendedprice" - 50000.0).as("abs_diff"),
        ceil($"l_quantity" / 7.0).as("ceil_q"),
        floor($"l_quantity" / 7.0).as("floor_q"),
        ($"l_quantity" * $"l_quantity").as("sq"),
        sqrt($"l_extendedprice").as("sqrt_p"),
        r4(log($"l_extendedprice")).as("ln_p"),
        r4(log10($"l_extendedprice")).as("log10_p"),
        ($"l_quantity" % 7.0).as("mod7"),
        signum($"l_extendedprice" - 50000.0).as("sgn"))
      // (l_orderkey, l_linenumber) is not unique in the fixture; (abs_diff,
      // sgn) pins l_extendedprice and sq pins l_quantity, so these three
      // tiebreakers fully determine every derived output column.
      .orderBy($"l_orderkey".asc_nulls_first, $"l_linenumber".asc_nulls_first,
        $"abs_diff".asc_nulls_first, $"sgn".asc_nulls_first,
        $"sq".asc_nulls_first)
  }

  private def castMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .select(
        $"o_orderkey",
        $"o_custkey".cast("int").as("k_int"),
        $"o_custkey".cast("double").as("k_dbl"),
        $"o_orderkey".cast("string").as("k_str"),
        $"o_orderkey".cast("string").cast("long").as("k_rt"),
        // The DECIMAL(14,2) round-trip is still exercised, but the OUTPUT is
        // double: a decimal-typed result column is the one type the driver's
        // differ materializes asymmetrically (decimal.Decimal vs float64 —
        // r2's only non-HUGEINT hash fail), so no decimal may reach it.
        $"o_totalprice".cast("decimal(14,2)").cast("double").as("price_dec"),
        $"o_totalprice".cast("string").as("price_str"),
        $"o_orderdate".cast("date").as("date_d"),
        $"o_orderdate".cast("date").cast("string").as("date_str"),
        $"o_orderdate".cast("date").cast("timestamp").as("back_ts"),
        (($"o_orderkey" % 2) === 0).as("flag_b"),
        (($"o_orderkey" % 2) === 0).cast("int").as("flag_i"))
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  private def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .select(
        $"doc_id",
        size($"toks").cast("long").as("n_toks"),
        array_contains($"toks", "spark").as("has_spark"),
        concat_ws(",", slice($"toks", 1, 5)).as("first5"),
        concat_ws(",", sort_array(array_distinct($"toks"))).as("vocab"),
        concat_ws(",", flatten(array(slice($"toks", 1, 2), slice($"toks", 3, 2)))).as("first4"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  private def arrayHigherOrder(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .select(
        $"doc_id",
        concat_ws(",", transform($"toks", t => length(t).cast("string"))).as("tok_lens"),
        concat_ws(",", filter($"toks", t => length(t) > 4)).as("long_toks"),
        aggregate($"toks", lit(0L), (acc, t) => acc + length(t)).as("total_chars"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  private def explodeTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "documents")
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc_nulls_last, $"token".asc_nulls_first)
      .limit(20)
  }

  private def mapFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perType = Catalog.load(spark, sfDir, "events")
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("cnt"))
    perType
      .groupBy($"user_id")
      .agg(array_sort(collect_list(struct($"event_type".as("k"), $"cnt".as("v"))))
        .as("entries"))
      .select(
        $"user_id",
        concat_ws(",",
          transform($"entries", e => concat(e("k"), lit(":"), e("v").cast("string"))))
          .as("type_counts"),
        concat_ws(",", map_keys(map_from_entries($"entries"))).as("keys"),
        size(map_from_entries($"entries")).cast("long").as("n_types"))
      .orderBy($"user_id".asc_nulls_first)
  }

  /** Bitwise scalar surface (added round 9): AND/OR/XOR/NOT, shifts, and
    * popcount over the part key — the primitives behind bitmap indexes,
    * bloom-filter probes and the repo's own SimHash/Z-order operators. All
    * BIGINT-exact; pure narrow map over the scan.
    */
  private def bitwiseFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "part")
      .select(
        $"p_partkey",
        $"p_partkey".bitwiseAND(lit(255L)).as("band"),
        $"p_partkey".bitwiseOR(lit(4096L)).as("bor"),
        $"p_partkey".bitwiseXOR(lit(21845L)).as("bxor"),
        bitwise_not($"p_partkey").as("bnot"),
        shiftleft($"p_partkey", 3).as("shl3"),
        shiftright($"p_partkey", 2).as("shr2"),
        bit_count($"p_partkey").cast("long").as("popcount"))
      .orderBy($"p_partkey".asc_nulls_first)
  }

  private def jsonExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "events")
      .select($"event_type",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"event_type")
      .agg(
        count($"k").as("n"),
        min($"k").as("min_k"),
        max($"k").as("max_k"),
        round(sum($"k").cast("double") / count($"k"), 4).as("avg_k"))
      .orderBy($"event_type".asc_nulls_first)
  }

  /** URL parsing surface (added round 10 batch 2): every clickstream /
    * crawl pipeline decomposes URLs; Spark's `parse_url` (HOST / PATH /
    * QUERY key) is graded against an independent regexp reconstruction in
    * the oracle (DuckDB has no parse_url) over deterministic URLs
    * synthesized from document attributes. Pure scan-side projection —
    * no shuffle except the output sort.
    */
  private def strUrl(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "documents")
      .filter($"doc_id" < 200)
      .select($"doc_id",
        concat(lit("https://"), $"source", lit(".example.com/docs/"),
          $"doc_id", lit("?lang="), $"lang").as("url"))
      .select($"doc_id", $"url",
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'lang')").as("lang_param"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  private val strUrlOracle = """
    WITH u AS (
      SELECT doc_id,
        'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
          || '?lang=' || lang AS url
      FROM documents WHERE doc_id < 200)
    SELECT doc_id, url,
      regexp_extract(url, 'https://([^/]+)/', 1) AS host,
      regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
      regexp_extract(url, 'lang=([^&]+)$', 1) AS lang_param
    FROM u
    ORDER BY doc_id ASC NULLS FIRST"""

  /** VARIANT TYPE SURFACE (round 13 batch 7; Spark 4's semi-structured
    * column type): a nested JSON document per order — object + array —
    * is parsed ONCE into a `variant` value (binary-encoded, typed
    * navigation; vs `q_json_extract`'s per-path string re-parse of
    * `get_json_object`) and fields come out through `variant_get` with
    * target types. The graded shape is the semi-structured ingest path
    * at 100 TB: parse on ingest, store the variant, navigate it typed —
    * not N string re-parses per row. Oracle = DuckDB JSON navigation
    * over the SAME constructed string, so the whole parse→navigate→agg
    * chain is value-graded.
    */
  private def jsonVariant(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .select(concat(
        lit("{\"o\":{\"key\":"), $"o_orderkey",
        lit(",\"cents\":"),
        ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long"),
        lit("},\"tags\":[\""), $"o_orderstatus",
        lit("\",\""), $"o_orderpriority", lit("\"]}")).as("js"))
      .select(parse_json($"js").as("v"))
      .select(
        expr("variant_get(v, '$.tags[1]', 'string')").as("priority"),
        expr("variant_get(v, '$.tags[0]', 'string')").as("status"),
        expr("variant_get(v, '$.o.cents', 'bigint')").as("cents"))
      .groupBy($"priority", $"status")
      .agg(count(lit(1)).as("n"), sum($"cents").as("total_cents"),
        min($"cents").as("min_cents"), max($"cents").as("max_cents"))
      .orderBy($"priority".asc_nulls_first, $"status".asc_nulls_first)
  }

  private val jsonVariantOracle = """
    WITH j AS (
      SELECT '{"o":{"key":' || o_orderkey || ',"cents":'
        || CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        || '},"tags":["' || o_orderstatus || '","' || o_orderpriority
        || '"]}' AS js
      FROM orders)
    SELECT json_extract_string(js, '$.tags[1]') AS priority,
      json_extract_string(js, '$.tags[0]') AS status,
      CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(json_extract_string(js, '$.o.cents') AS BIGINT))
        AS BIGINT) AS total_cents,
      CAST(min(CAST(json_extract_string(js, '$.o.cents') AS BIGINT))
        AS BIGINT) AS min_cents,
      CAST(max(CAST(json_extract_string(js, '$.o.cents') AS BIGINT))
        AS BIGINT) AS max_cents
    FROM j
    GROUP BY 1, 2
    ORDER BY priority ASC NULLS FIRST, status ASC NULLS FIRST"""

  /** COLLATION SURFACE (round 13 batch 7; Spark 4 string collations):
    * case-insensitive comparison as a COLUMN PROPERTY rather than a
    * lower() rewrite — distinct counts, equality, and counting under
    * `UTF8_LCASE` over a deterministically mixed-cased segment column
    * (even custkeys upper, odd lower). The engine-property difference
    * matters at scale: a collated comparison keeps the ORIGINAL bytes
    * (no derived column to materialize) and hashes/compares via the
    * collation key. Output is collation-free scalars (counts), so the
    * oracle mirrors with lower() — the classic rewrite the feature
    * replaces.
    */
  private def strCollation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "customer")
      .select($"c_custkey",
        when(pmod($"c_custkey", lit(2)) === 0, upper($"c_mktsegment"))
          .otherwise(lower($"c_mktsegment")).as("seg"))
      .agg(
        countDistinct($"seg").as("n_raw_distinct"),
        countDistinct(expr("collate(seg, 'UTF8_LCASE')"))
          .as("n_ci_distinct"),
        sum(when(expr("collate(seg, 'UTF8_LCASE')") ===
          lit("building"), 1L).otherwise(0L)).as("n_building"),
        sum(when($"seg" === "BUILDING", 1L).otherwise(0L))
          .as("n_building_upper"))
  }

  private val strCollationOracle = """
    WITH m AS (
      SELECT c_custkey,
        CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
             ELSE lower(c_mktsegment) END AS seg
      FROM customer)
    SELECT CAST(count(DISTINCT seg) AS BIGINT) AS n_raw_distinct,
      CAST(count(DISTINCT lower(seg)) AS BIGINT) AS n_ci_distinct,
      CAST(sum(CASE WHEN lower(seg) = 'building' THEN 1 ELSE 0 END)
        AS BIGINT) AS n_building,
      CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_building_upper
    FROM m"""

  /** ANSI-SAFE ERROR HANDLING (round 13 batch 22) — the `try_` family a
    * landing pipeline runs instead of letting one bad row kill the job:
    * try_divide (NULL on zero divisor), try_to_timestamp (NULL on a
    * malformed literal), try_element_at (NULL past the end), and
    * try_add's overflow guard on a deliberately saturating branch — each
    * exercised per-row over orders with a deterministic bad-row rule,
    * audited as null counts + the surviving aggregate. Doubles round to
    * 4dp per row before the decimal sum (the q_math_funcs rule); the
    * oracle states each guard as an explicit CASE, so the `try_`
    * semantics are value-graded. Per-row scan arithmetic, one
    * map-side-combined audit — no shuffle before the 1-row result.
    */
  private def sqlTryFunctions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .select($"o_orderkey",
        expr("""try_divide(cast(o_orderkey as double),
                 cast(o_orderkey % 7 as double))""").as("d"),
        expr("""try_to_timestamp(CASE WHEN o_orderkey % 3 = 0
                 THEN 'not-a-date' ELSE '2024-01-01 00:00:00' END)""")
          .as("ts"),
        // index 1..4 of a 2-element array: 3 and 4 are past the end
        // (NULL under try); index 0 would be INVALID_INDEX_OF_ZERO,
        // which try_element_at deliberately does NOT catch.
        expr("""try_element_at(array(o_orderkey, o_orderkey * 2),
                 cast(1 + o_orderkey % 4 as int))""").as("el"),
        expr("""try_add(CASE WHEN o_orderkey % 5 = 0
                 THEN 9223372036854775807 ELSE o_orderkey END,
                 1 + o_orderkey % 5)""").as("ad"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when($"d".isNull, 1L).otherwise(0L)).as("n_div_null"),
        dsum(round($"d", 4)).as("sum_div"),
        sum(when($"ts".isNull, 1L).otherwise(0L)).as("n_ts_null"),
        sum(when($"el".isNull, 1L).otherwise(0L)).as("n_el_null"),
        sum($"el").cast("long").as("sum_el"),
        sum(when($"ad".isNull, 1L).otherwise(0L)).as("n_add_null"))
  }

  private val sqlTryFunctionsOracle = s"""
    WITH t AS (
      SELECT o_orderkey,
        CASE WHEN o_orderkey % 7 = 0 THEN NULL
             ELSE CAST(o_orderkey AS DOUBLE) / (o_orderkey % 7) END AS d,
        TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-date'
                      ELSE '2024-01-01 00:00:00' END AS TIMESTAMP) AS ts,
        CASE WHEN o_orderkey % 4 IN (0, 1)
             THEN (CASE o_orderkey % 4 WHEN 0 THEN o_orderkey
                   ELSE o_orderkey * 2 END) END AS el,
        CASE WHEN o_orderkey % 5 = 0 THEN NULL
             ELSE o_orderkey + 1 + o_orderkey % 5 END AS ad
      FROM orders)
    SELECT count(*) AS n_rows,
      CAST(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_div_null,
      ${graft.Oracle.dsum("round(d, 4)")} AS sum_div,
      CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_ts_null,
      CAST(sum(CASE WHEN el IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_el_null,
      CAST(sum(el) AS BIGINT) AS sum_el,
      CAST(sum(CASE WHEN ad IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_add_null
    FROM t"""

  override val queries: Vector[Q] = Vector(
    Q("q_sql_try_functions", sqlTryFunctions, Some(sqlTryFunctionsOracle)),
    Q("q_json_variant", jsonVariant, Some(jsonVariantOracle)),
    Q("q_str_collation", strCollation, Some(strCollationOracle)),
    Q("q_str_url", strUrl, Some(strUrlOracle)),
    Q("q_str_funcs", strFuncs, Some("""
      SELECT c_custkey,
        upper(c_name) AS up, lower(c_mktsegment) AS lo,
        substring(c_name, 10, 9) AS sub,
        concat(c_name, ':', c_mktsegment) AS cat,
        lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS pad,
        CAST(length(c_name) AS BIGINT) AS len,
        replace(c_name, 'Customer', 'Cust') AS rep,
        trim(concat('  ', c_name, '  ')) AS trimmed,
        array_to_string(string_split(c_name, '#'), ',') AS parts
      FROM customer ORDER BY c_custkey ASC NULLS FIRST""")),
    Q("q_str_regexp", strRegexp, Some("""
      SELECT p_partkey,
        CAST(regexp_extract(p_brand, '#(\d+)', 1) AS INTEGER) AS brand_num,
        regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
        regexp_matches(p_name, '^(hot|cold)') AS is_temp
      FROM part ORDER BY p_partkey ASC NULLS FIRST""")),
    Q("q_str_levenshtein", strLevenshtein, Some("""
      SELECT n_nationkey, r_regionkey,
        CAST(levenshtein(n_name, r_name) AS BIGINT) AS lev
      FROM nation CROSS JOIN region
      ORDER BY n_nationkey ASC NULLS FIRST, r_regionkey ASC NULLS FIRST""")),
    Q("q_date_funcs", dateFuncs, Some("""
      SELECT o_orderkey,
        year(o_orderdate) AS y, month(o_orderdate) AS m,
        day(o_orderdate) AS d, quarter(o_orderdate) AS q,
        CAST(dayofweek(o_orderdate) AS BIGINT) AS dow0,
        CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
        datediff('day', CAST(o_orderdate AS DATE), DATE '2001-09-01') AS days_to_ref,
        (2001 - year(o_orderdate)) * 12 + (9 - month(o_orderdate)) AS months_to_ref,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      FROM orders ORDER BY o_orderkey ASC NULLS FIRST""")),
    Q("q_math_funcs", mathFuncs, Some("""
      SELECT l_orderkey, l_linenumber,
        abs(l_extendedprice - 50000.0) AS abs_diff,
        CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil_q,
        CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor_q,
        l_quantity * l_quantity AS sq,
        sqrt(l_extendedprice) AS sqrt_p,
        round(ln(l_extendedprice), 4) AS ln_p,
        round(log10(l_extendedprice), 4) AS log10_p,
        mod(l_quantity, 7.0) AS mod7,
        CAST(sign(l_extendedprice - 50000.0) AS DOUBLE) AS sgn
      FROM lineitem
      ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        abs_diff ASC NULLS FIRST, sgn ASC NULLS FIRST, sq ASC NULLS FIRST""")),
    Q("q_cast_matrix", castMatrix, Some("""
      SELECT o_orderkey,
        CAST(o_custkey AS INTEGER) AS k_int,
        CAST(o_custkey AS DOUBLE) AS k_dbl,
        CAST(o_orderkey AS VARCHAR) AS k_str,
        CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS k_rt,
        CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE) AS price_dec,
        CAST(o_totalprice AS VARCHAR) AS price_str,
        CAST(o_orderdate AS DATE) AS date_d,
        CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
        CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS back_ts,
        o_orderkey % 2 = 0 AS flag_b,
        CAST(o_orderkey % 2 = 0 AS INTEGER) AS flag_i
      FROM orders ORDER BY o_orderkey ASC NULLS FIRST""")),
    Q("q_array_funcs", arrayFuncs, Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_toks,
        list_contains(toks, 'spark') AS has_spark,
        array_to_string(toks[1:5], ',') AS first5,
        array_to_string(list_sort(list_distinct(toks)), ',') AS vocab,
        array_to_string(flatten([toks[1:2], toks[3:4]]), ',') AS first4
      FROM d ORDER BY doc_id ASC NULLS FIRST""")),
    Q("q_array_higher_order", arrayHigherOrder, Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      SELECT doc_id,
        array_to_string(list_transform(toks, t -> CAST(length(t) AS VARCHAR)), ',') AS tok_lens,
        array_to_string(list_filter(toks, t -> length(t) > 4), ',') AS long_toks,
        CAST(list_aggregate(list_transform(toks, t -> CAST(length(t) AS BIGINT)), 'sum') AS BIGINT) AS total_chars
      FROM d ORDER BY doc_id ASC NULLS FIRST""")),
    Q("q_explode_tokens", explodeTokens, Some("""
      SELECT token, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token
      ORDER BY cnt DESC NULLS LAST, token ASC NULLS FIRST
      LIMIT 20""")),
    Q("q_map_funcs", mapFuncs, Some("""
      WITH pc AS (
        SELECT user_id, event_type, count(*) AS cnt
        FROM events GROUP BY user_id, event_type)
      SELECT user_id,
        array_to_string(list_transform(list_sort(list({'k': event_type, 'v': cnt})),
          e -> concat(e.k, ':', CAST(e.v AS VARCHAR))), ',') AS type_counts,
        array_to_string(list_transform(list_sort(list({'k': event_type, 'v': cnt})),
          e -> e.k), ',') AS keys,
        CAST(count(*) AS BIGINT) AS n_types
      FROM pc GROUP BY user_id ORDER BY user_id ASC NULLS FIRST""")),
    Q("q_bitwise_funcs", bitwiseFuncs, Some("""
      SELECT p_partkey,
        p_partkey & 255 AS band,
        p_partkey | 4096 AS bor,
        xor(p_partkey, 21845) AS bxor,
        ~p_partkey AS bnot,
        p_partkey << 3 AS shl3,
        p_partkey >> 2 AS shr2,
        CAST(bit_count(p_partkey) AS BIGINT) AS popcount
      FROM part ORDER BY p_partkey ASC NULLS FIRST""")),
    Q("q_json_extract", jsonExtract, Some("""
      WITH e AS (
        SELECT event_type,
          CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events)
      SELECT event_type, count(k) AS n, min(k) AS min_k, max(k) AS max_k,
        round(CAST(sum(k) AS DOUBLE) / count(k), 4) AS avg_k
      FROM e GROUP BY event_type ORDER BY event_type ASC NULLS FIRST""")),
  )
}
