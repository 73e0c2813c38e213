package graft

/** Plan-shape regressions: the properties that make these plans right at
  * 100 TB, asserted on the executed plan so a refactor can't silently lose
  * them (a correct-but-unpushed scan would still pass every value check).
  */
class PlanPropertiesSpec extends SparkTestBase {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf0001).queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan") {
    val p = plan("q_scan_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"ship-date predicate must be pushed to the reader:\n$p")
  }

  test("projection pushdown prunes the read schema to the selected columns") {
    val p = plan("q_scan_projection_pushdown")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int>"),
      s"scan must read exactly the two projected columns:\n$p")
  }

  test("flagship aggregation is two-phase (map-side partials)") {
    val p = plan("q_agg_pricing_summary")
    assert(p.contains("partial_sum") && p.contains("partial_count"),
      s"aggregate must combine map-side before the exchange:\n$p")
  }

  test("broadcast-join demo broadcasts the dimension side") {
    val p = plan("q_join_broadcast_inner")
    assert(p.contains("BroadcastHashJoin"), s"expected a broadcast hash join:\n$p")
  }

  test("sort-merge demo keeps the fact-fact join shuffled, not broadcast") {
    val p = plan("q_join_sortmerge_inner")
    assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
  }

  test("top-k compiles to TakeOrderedAndProject, not global sort + limit") {
    val p = plan("q_topk_global")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("RFM scoring contains no unpartitioned window") {
    // A bare Window.orderBy funnels all rows through one task; ntileExact
    // must keep every per-row window partitioned (the only ordered-only
    // window allowed is over the ~32-row bucket-count table).
    val p = plan("q_agg_rfm")
    assert(p.contains("__bkt"), s"expected bucket-partitioned ranking windows:\n$p")
    assert(!p.contains("ntile"), s"the single-partition ntile must be gone:\n$p")
  }

  test("partitioned roundtrip prunes to the selected partition") {
    val p = plan("q_source_partitioned_roundtrip")
    assert(p.contains("PartitionFilters") && p.contains("o_year"),
      s"expected a partition filter on o_year:\n$p")
  }

  test("runtime-derived year dim triggers dynamic partition pruning") {
    val p = plan("q_scan_partition_pruning_dynamic")
    // The qualifying years come from a lineitem filter at execution time, so
    // the fact scan must carry a dynamicpruning subquery in its partition
    // filters — not a static literal, not an unpruned full scan.
    assert(p.contains("dynamicpruning"),
      s"expected a dynamicpruningexpression on the o_year scan:\n$p")
  }
}
