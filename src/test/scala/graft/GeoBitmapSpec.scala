package graft

import org.apache.spark.sql.functions._

/** Round-10 batch-4 packs: geospatial grid-cell joins and exact bitmap
  * distinct counting. Invariants beyond the oracle hash: neighborhood
  * completeness vs brute force, no-cross-join plan shape, bitmap
  * reaggregation invariance, and the 32-bit key-domain contract.
  */
class GeoBitmapSpec extends SparkTestBase {
  import spark.implicits._

  test("pack registration: geo + bitmap ids, all with oracles") {
    assert(operators.GeoOps.queries.map(_.id) ==
      Vector("q_geo_region_join", "q_geo_geohash_cover",
        "q_geo_cell_join", "q_geo_knn", "q_geo_haversine",
        "q_geo_dbscan", "q_geo_point_in_polygon"))
    assert(operators.BitmapOps.queries.map(_.id) ==
      Vector("q_agg_bitmap_distinct", "q_agg_bitmap_intersect"))
    assert((operators.GeoOps.queries ++ operators.BitmapOps.queries)
      .forall(_.oracle.isDefined))
  }

  test("geo cell join: equals the brute-force radius join") {
    // The 3x3 neighborhood must lose NOTHING vs the cross-join ground
    // truth — this is the completeness proof executed, not argued.
    val cellResult = SparkEntry.queries("q_geo_cell_join")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val c = Catalog.load(spark, sf0001, "customer").select(
      $"c_custkey",
      (($"c_custkey" * 37 % 160) - 80).cast("double") + lit(0.25) as "clat",
      (($"c_custkey" * 101 % 360) - 180).cast("double") + lit(0.25) as "clon")
    val s = Catalog.load(spark, sf0001, "supplier").select(
      $"s_suppkey",
      (($"s_suppkey" * 53 % 160) - 80).cast("double") + lit(0.75) as "slat",
      (($"s_suppkey" * 89 % 360) - 180).cast("double") + lit(0.75) as "slon")
    val d2 = ($"clat" - $"slat") * ($"clat" - $"slat") +
      ($"clon" - $"slon") * ($"clon" - $"slon")
    val brute = c.crossJoin(s).withColumn("dist2", d2)
      .filter($"dist2" <= 25.0)
      .select($"c_custkey", $"s_suppkey", $"dist2")
      .orderBy($"dist2".asc, $"c_custkey".asc, $"s_suppkey".asc)
      .limit(100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cellResult.nonEmpty && cellResult.sameElements(brute))
  }

  test("geo cell join plan: candidate generation is an equi-join, no cross join") {
    val plan = SparkEntry.queries("q_geo_cell_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"))
  }

  test("geo knn: one row per matched customer, all within R") {
    val df = SparkEntry.queries("q_geo_knn")(spark, sf0001).cache()
    assert(df.groupBy($"c_custkey").count().filter($"count" > 1).count() == 0)
    assert(df.filter($"dist2" > 25.0).count() == 0)
    df.unpersist()
  }

  test("geo haversine: per-nation stats bounded by half the great circle") {
    val df = SparkEntry.queries("q_geo_haversine")(spark, sf0001)
    // max possible great-circle distance = pi * 6371 km ~ 20015.1
    assert(df.filter($"max_km" > 20016.0 || $"min_km" < 0.0).count() == 0)
    assert(df.count() > 0)
  }

  test("bitmap distinct: matches exact countDistinct, including the ALL rollup") {
    val got = SparkEntry.queries("q_agg_bitmap_distinct")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = Catalog.load(spark, sf0001, "orders")
    val exact = orders.groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey") as "d")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = orders.select(countDistinct($"o_custkey")).head().getLong(0)
    assert(got == exact + ("ALL" -> all))
  }

  test("bitmap reaggregation invariance: merged fine bitmaps == one coarse bitmap") {
    val orders = Catalog.load(spark, sf0001, "orders")
    val viaRollup = orders
      .groupBy($"o_orderstatus", month($"o_orderdate") as "m")
      .agg(expr("graft_bitmap_agg(o_custkey)") as "bm")
      .agg(expr("graft_bitmap_card(graft_bitmap_merge_agg(bm))"))
      .head().getLong(0)
    val direct = orders
      .agg(expr("graft_bitmap_card(graft_bitmap_agg(o_custkey))"))
      .head().getLong(0)
    assert(viaRollup == direct)
  }

  test("bitmap intersect: overlap bounded by both year cardinalities") {
    val r = SparkEntry.queries("q_agg_bitmap_intersect")(spark, sf0001).head()
    val (c95, c96, both) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(both <= math.min(c95, c96) && c95 > 0 && c96 > 0)
  }

  test("bitmap agg: narrower integral key types widen instead of failing") {
    // Dictionary ids commonly arrive as INT; analysis must accept any
    // integral type and widen in update(), matching long-key results.
    val viaInt = Seq(1, 2, 2, 7).toDF("k")
      .agg(expr("graft_bitmap_card(graft_bitmap_agg(k))")).head().getLong(0)
    val viaShort = Seq(1, 2, 2, 7).toDF("k")
      .select($"k".cast("smallint") as "k")
      .agg(expr("graft_bitmap_card(graft_bitmap_agg(k))")).head().getLong(0)
    assert(viaInt == 3L && viaShort == 3L)
  }

  test("bitmap agg: keys outside the 32-bit dictionary domain fail loudly") {
    val ex = intercept[Exception] {
      Seq(1L, Int.MaxValue.toLong + 1).toDF("k")
        .agg(expr("graft_bitmap_card(graft_bitmap_agg(k))")).head()
    }
    assert(ex.getMessage != null)
  }

  test("drawdown: nonnegative, peak monotone per priority") {
    val df = SparkEntry.queries("q_win_drawdown")(spark, sf0001).cache()
    assert(df.filter($"drawdown" < 0.0).count() == 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_orderpriority").orderBy($"day".asc)
    val nonMonotone = df
      .withColumn("prev_peak", lag($"peak", 1).over(w))
      .filter($"prev_peak".isNotNull && $"peak" < $"prev_peak")
    assert(nonMonotone.count() == 0)
    df.unpersist()
  }
}
