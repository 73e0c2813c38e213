package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QueryPack}
import graft.Dsl._

/** SURVEY.md §2.D (bitmap-distinct additions, round 10 batch 4): EXACT
  * mergeable distinct counting via Roaring bitmaps
  * (plans/BitmapDistinct.scala — `graft_bitmap_agg` / `graft_bitmap_merge_agg`
  * / `graft_bitmap_card` / `graft_bitmap_and_card`, injected through
  * GraftExtensions over the RoaringBitmap library Spark ships).
  *
  * This closes the sketch-family gap from the exactness side: HLL/theta
  * answer rollups approximately in constant space; a bitmap keyed by a
  * 32-bit dictionary id answers them EXACTLY in id-range-proportional
  * (run-compressed) space. Both queries therefore grade against plain
  * `count(DISTINCT …)` DuckDB oracles — no error-bound escape hatch.
  *
  * 100-TB posture: `graft_bitmap_agg` is a TypedImperativeAggregate, so
  * map-side partials build per-partition bitmaps and the shuffle carries
  * run-optimized bitmap bytes, not rows — the same partial/final shape as
  * any hash agg. The rollup query reaggregates STORED per-(status, year)
  * bitmaps (OR + cardinality) without re-touching raw orders: at scale the
  * fine-grained bitmap frame is written once and every coarser distinct
  * count — and every overlap/set-algebra question — is answered from it.
  */
object BitmapOps extends QueryPack {

  /** Exact distinct customers per order status + an ALL row, BOTH derived
    * by reaggregating the stored per-(status, year) bitmap frame — the
    * rollup-without-rescan shape `q_agg_sketch_hll` can only estimate.
    */
  private def aggBitmapDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perYear = table(spark, sfDir)("orders")
      .groupBy($"o_orderstatus", year($"o_orderdate") as "yr")
      .agg(expr("graft_bitmap_agg(o_custkey)") as "bm")
      .cache() // the stored fine-grained bitmap frame; both rollups read it
    val card = expr("graft_bitmap_card(graft_bitmap_merge_agg(bm))")
    val perStatus = perYear.groupBy($"o_orderstatus")
      .agg(card as "distinct_customers")
    val allRow = perYear.agg(card as "distinct_customers")
      .select(lit("ALL") as "o_orderstatus", $"distinct_customers")
    perStatus.unionByName(allRow)
      .orderBy($"o_orderstatus".asc_nulls_first)
  }

  private val aggBitmapDistinctOracle = """
    SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT)
      AS distinct_customers
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'ALL' AS o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT)
    FROM orders
    ORDER BY o_orderstatus ASC NULLS FIRST"""

  /** Exact repeat-customer overlap between two years — |1995 ∩ 1996| by
    * bitmap AND, the set operation the theta sketch (q_agg_sketch_theta)
    * only estimates. ONE pass over orders builds both year bitmaps as
    * conditional aggregates (NULL keys are skipped, so the CASE arms
    * partition the scan); the intersection is a single per-result
    * `graft_bitmap_and_card` call, never a join.
    */
  private def aggBitmapIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    table(spark, sfDir)("orders")
      .agg(
        expr("graft_bitmap_agg(CASE WHEN year(o_orderdate) = 1995 THEN o_custkey END)")
          .as("bm95"),
        expr("graft_bitmap_agg(CASE WHEN year(o_orderdate) = 1996 THEN o_custkey END)")
          .as("bm96"))
      .select(
        expr("graft_bitmap_card(bm95)").as("customers_1995"),
        expr("graft_bitmap_card(bm96)").as("customers_1996"),
        expr("graft_bitmap_and_card(bm95, bm96)").as("repeat_customers"))
  }

  private val aggBitmapIntersectOracle = """
    SELECT
      CAST(count(DISTINCT CASE WHEN year(o_orderdate) = 1995
        THEN o_custkey END) AS BIGINT) AS customers_1995,
      CAST(count(DISTINCT CASE WHEN year(o_orderdate) = 1996
        THEN o_custkey END) AS BIGINT) AS customers_1996,
      CAST((SELECT count(*) FROM
        (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         INTERSECT
         SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        t) AS BIGINT) AS repeat_customers
    FROM orders"""

  override val queries: Vector[Q] = Vector(
    Q("q_agg_bitmap_distinct", aggBitmapDistinct, Some(aggBitmapDistinctOracle)),
    Q("q_agg_bitmap_intersect", aggBitmapIntersect, Some(aggBitmapIntersectOracle)),
  )
}
