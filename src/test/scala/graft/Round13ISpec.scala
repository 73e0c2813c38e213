package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-9 invariants: CDF netting semantics and the join-view
  * delta rule's plan/value contract.
  */
class Round13ISpec extends SparkTestBase {
  import spark.implicits._

  test("q_lake_cdc: v2 is pure insert, v3 nets the rewrite to non-F deletes") {
    val out = SparkEntry.queries("q_lake_cdc")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == Set(2L, 3L))
    val orders = Catalog.load(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_orderstatus")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // v2 appended fileB: every 3 <= k%10 < 6 row inserted, nothing deleted.
    val b = orders.filter(r => r._1 % 10 >= 3 && r._1 % 10 < 6)
    assert(out(2L) == ((b.length.toLong, b.map(_._1).sum, 0L, 0L)))
    // v3 rewrote A -> C (only A's F rows survive): the carried-over F rows
    // must NOT appear as changes; deletes are exactly A's non-F rows.
    val del = orders.filter(r => r._1 % 10 < 3 && r._2 != "F")
    assert(out(3L) == ((0L, 0L, del.length.toLong, del.map(_._1).sum)))
  }

  test("q_mv_join_incremental: stale leaf present, no old-x-old recompute") {
    val df = SparkEntry.queries("q_mv_join_incremental")(spark, sf0001)
    val plan = df.queryExecution.optimizedPlan.toString
    // The stale view arrives as a checkpoint leaf, not a recomputed join.
    assert(plan.contains("LogicalRDD"), plan.take(1500))
    // Delta terms only: the orders relation is scanned at most 3 times
    // (dO x oldC, oldO x dC, dO x dC) - a 4th scan would mean the old
    // join was recomputed.
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans <= 3, s"orders scanned $ordersScans times:\n" +
      plan.take(1500))
    // Values equal the full recompute done directly.
    val cents = ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long")
    val full = Catalog.load(spark, sf0001, "orders")
      .join(Catalog.load(spark, sf0001, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".cast("long").as("nation"))
      .agg(count(lit(1)).as("n_rows"), sum(cents).cast("long").as("cents"))
      .orderBy($"nation".asc_nulls_first)
    assert(df.collect().toSeq == full.collect().toSeq)
  }
}
