package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Catalog, Q, QueryPack}

/** SURVEY.md §2.F (sorts / limits / top-k) and §2.G (set operations).
  *
  * Scale notes: global top-k compiles to TakeOrderedAndProject (per-partition
  * heap + driver merge of k rows — never a full sort). The full multikey sort
  * is a range-partitioned TungstenSort, the one genuinely global-order
  * operator in the inventory. Set ops are hash shuffles on the projected key.
  */
object SortsSetOps extends QueryPack {

  private def sortMultikey(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .orderBy($"o_orderpriority".asc_nulls_first,
               $"o_totalprice".desc_nulls_last,
               $"o_orderkey".asc_nulls_first)
  }

  private def topkGlobal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .orderBy($"o_totalprice".desc_nulls_last, $"o_orderkey".asc_nulls_first)
      .limit(10)
  }

  private def limitOffset(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .orderBy($"o_orderkey".asc_nulls_first)
      .offset(10)
      .limit(10)
  }

  private def ordersIn(spark: SparkSession, sfDir: String, year: Int): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit(s"$year-01-01").cast("timestamp") &&
              $"o_orderdate" < lit(s"${year + 1}-01-01").cast("timestamp"))
  }

  private def setUnionAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    ordersIn(spark, sfDir, 1997).select($"o_custkey")
      .unionAll(ordersIn(spark, sfDir, 1998).select($"o_custkey"))
      .orderBy($"o_custkey".asc_nulls_first)
  }

  private def setUnionDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Catalog.load(spark, sfDir, "customer")
    c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      .union(c.filter($"c_mktsegment" === "MACHINERY").select($"c_custkey"))
      .distinct()
      .orderBy($"c_custkey".asc_nulls_first)
  }

  private def setIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    ordersIn(spark, sfDir, 1997).select($"o_custkey")
      .intersect(ordersIn(spark, sfDir, 1998).select($"o_custkey"))
      .orderBy($"o_custkey".asc_nulls_first)
  }

  private def setExcept(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    ordersIn(spark, sfDir, 1997).select($"o_custkey")
      .except(ordersIn(spark, sfDir, 1998).select($"o_custkey"))
      .orderBy($"o_custkey".asc_nulls_first)
  }

  private def halfYear(spark: SparkSession, sfDir: String, from: String, to: String): DataFrame = {
    import spark.implicits._
    Catalog.load(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit(from).cast("timestamp") &&
              $"o_orderdate" < lit(to).cast("timestamp"))
      .select($"o_custkey")
  }

  private def setIntersectAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    halfYear(spark, sfDir, "1997-01-01", "1997-07-01")
      .intersectAll(halfYear(spark, sfDir, "1997-07-01", "1998-01-01"))
      .orderBy($"o_custkey".asc_nulls_first)
  }

  private def setExceptAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    halfYear(spark, sfDir, "1997-01-01", "1997-07-01")
      .exceptAll(halfYear(spark, sfDir, "1997-07-01", "1998-01-01"))
      .orderBy($"o_custkey".asc_nulls_first)
  }

  /** Schema-drift union via `unionByName(allowMissingColumns = true)` (added
    * round 10 batch 2) — the relational-level sibling of
    * `q_source_schema_evolution`'s scan-level merge: two feed generations
    * (v1 lacks the priority column, v2 carries it plus a feed tag) align BY
    * NAME, absent columns NULL-fill, and positional drift cannot silently
    * swap columns the way plain `union` would. Output = the per-generation,
    * per-priority reconciliation rollup.
    *
    * Scale: the union is a zero-shuffle plan glue (both children stay
    * independently partitioned); only the final rollup shuffles its
    * bounded group keys.
    */
  private def setUnionByName(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Catalog.load(spark, sfDir, "orders")
    val v1 = orders.filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_totalprice")
      .withColumn("feed", lit("v1"))
    val v2 = orders.filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
      .withColumn("feed", lit("v2"))
    v1.unionByName(v2, allowMissingColumns = true)
      .groupBy($"feed", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        graft.Dsl.dsum($"o_totalprice").as("revenue"))
      .orderBy($"feed".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  private val setUnionByNameOracle = s"""
    WITH u AS (
      SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority,
        'v1' AS feed
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderpriority, 'v2' AS feed
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
    SELECT feed, o_orderpriority, count(*) AS n_orders,
      ${graft.Oracle.dsum("o_totalprice")} AS revenue
    FROM u
    GROUP BY feed, o_orderpriority
    ORDER BY feed ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""

  override val queries: Vector[Q] = Vector(
    Q("q_set_union_byname", setUnionByName, Some(setUnionByNameOracle)),
    Q("q_sort_multikey", sortMultikey, Some("""
      SELECT * FROM orders
      ORDER BY o_orderpriority ASC NULLS FIRST, o_totalprice DESC NULLS LAST,
               o_orderkey ASC NULLS FIRST""")),
    Q("q_topk_global", topkGlobal, Some("""
      SELECT * FROM orders
      ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
      LIMIT 10""")),
    Q("q_limit_offset", limitOffset, Some("""
      SELECT * FROM orders ORDER BY o_orderkey ASC NULLS FIRST
      LIMIT 10 OFFSET 10""")),
    Q("q_set_union_all", setUnionAll, Some("""
      SELECT o_custkey FROM (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        UNION ALL
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01')
      ORDER BY o_custkey ASC NULLS FIRST""")),
    Q("q_set_union_distinct", setUnionDistinct, Some("""
      SELECT c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      ORDER BY c_custkey ASC NULLS FIRST""")),
    Q("q_set_intersect", setIntersect, Some("""
      SELECT o_custkey FROM (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01')
      ORDER BY o_custkey ASC NULLS FIRST""")),
    Q("q_set_except", setExcept, Some("""
      SELECT o_custkey FROM (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01')
      ORDER BY o_custkey ASC NULLS FIRST""")),
    Q("q_set_intersect_all", setIntersectAll, Some("""
      SELECT o_custkey FROM (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
        INTERSECT ALL
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1998-01-01')
      ORDER BY o_custkey ASC NULLS FIRST""")),
    Q("q_set_except_all", setExceptAll, Some("""
      SELECT o_custkey FROM (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
        EXCEPT ALL
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1998-01-01')
      ORDER BY o_custkey ASC NULLS FIRST""")),
  )
}
