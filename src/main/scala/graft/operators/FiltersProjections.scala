package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Catalog, Q, QueryPack}

/** SURVEY.md §2.B — projections, filters, predicates.
  *
  * Derived doubles are emitted RAW (per-row IEEE arithmetic is bit-identical
  * across engines); see Dsl.scala for why rounding them would break parity.
  */
object FiltersProjections extends QueryPack {

  private def projectCompute(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "lineitem")
      .select(
        $"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        ($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("charge"),
        ($"l_discount" > 0.05).as("high_disc"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixture (no PK);
      // every output column joins the sort so tie order is fully determined
      // — an underspecified ORDER BY only hash-matched the oracle while
      // both engines happened to scan the same single file in file order.
      .orderBy($"l_orderkey".asc_nulls_first, $"l_linenumber".asc_nulls_first,
        $"revenue".asc_nulls_first, $"charge".asc_nulls_first,
        $"high_disc".asc_nulls_first)
  }

  private def filterBasic(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .filter(($"o_totalprice" > 100000.0 && $"o_orderstatus" === "F") ||
              ($"o_orderpriority" === "1-URGENT" && !($"o_orderstatus" === "O")))
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  private def filterInBetweenLike(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "part")
      .filter($"p_type".like("PROMO%") &&
              $"p_size".isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50) &&
              $"p_retailprice".between(900.0, 1800.0))
      .orderBy($"p_partkey".asc_nulls_first)
  }

  private def filterNullSemantics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .select(
        $"o_orderkey",
        nullif($"o_orderstatus", lit("O")).as("st"),
        nullif($"o_orderpriority", lit("1-URGENT")).as("pr"))
      .filter($"st".isNull || ($"st" <=> "F"))
      .select(
        $"o_orderkey",
        coalesce($"st", lit("open")).as("st_or_open"),
        $"pr".isNull.as("pr_is_null"),
        ($"pr" <=> lit(null)).as("pr_null_safe_eq_null"))
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  private def filterConditional(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "customer")
      .select(
        $"c_custkey",
        when($"c_acctbal" < 0.0, "negative")
          .when($"c_acctbal" < 5000.0, "low")
          .otherwise("high").as("bal_band"),
        greatest($"c_acctbal", lit(0.0)).as("bal_floor0"),
        least($"c_acctbal", lit(5000.0)).as("bal_cap5k"))
      .orderBy($"c_custkey".asc_nulls_first)
  }

  override val queries: Vector[Q] = Vector(
    Q("q_project_compute", projectCompute, Some("""
      SELECT l_orderkey, l_linenumber,
        l_extendedprice * (1.0 - l_discount) AS revenue,
        l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
        l_discount > 0.05 AS high_disc
      FROM lineitem
      ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        revenue ASC NULLS FIRST, charge ASC NULLS FIRST,
        high_disc ASC NULLS FIRST""")),
    Q("q_filter_basic", filterBasic, Some("""
      SELECT * FROM orders
      WHERE (o_totalprice > 100000.0 AND o_orderstatus = 'F')
         OR (o_orderpriority = '1-URGENT' AND NOT o_orderstatus = 'O')
      ORDER BY o_orderkey ASC NULLS FIRST""")),
    Q("q_filter_in_between_like", filterInBetweenLike, Some("""
      SELECT * FROM part
      WHERE p_type LIKE 'PROMO%'
        AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
        AND p_retailprice BETWEEN 900.0 AND 1800.0
      ORDER BY p_partkey ASC NULLS FIRST""")),
    Q("q_filter_null_semantics", filterNullSemantics, Some("""
      WITH d AS (
        SELECT o_orderkey,
          nullif(o_orderstatus, 'O') AS st,
          nullif(o_orderpriority, '1-URGENT') AS pr
        FROM orders)
      SELECT o_orderkey,
        coalesce(st, 'open') AS st_or_open,
        pr IS NULL AS pr_is_null,
        pr IS NOT DISTINCT FROM NULL AS pr_null_safe_eq_null
      FROM d
      WHERE st IS NULL OR st IS NOT DISTINCT FROM 'F'
      ORDER BY o_orderkey ASC NULLS FIRST""")),
    Q("q_filter_conditional", filterConditional, Some("""
      SELECT c_custkey,
        CASE WHEN c_acctbal < 0.0 THEN 'negative'
             WHEN c_acctbal < 5000.0 THEN 'low'
             ELSE 'high' END AS bal_band,
        greatest(c_acctbal, 0.0) AS bal_floor0,
        least(c_acctbal, 5000.0) AS bal_cap5k
      FROM customer ORDER BY c_custkey ASC NULLS FIRST""")),
  )
}
