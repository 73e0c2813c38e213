package graft

import org.apache.spark.sql.functions._

import graft.operators.RelationalExtras

/** Plan-shape and semantic checks for the relational-depth pack (SURVEY
  * §2.M). The scale claims these queries exist to demonstrate — zero
  * exchanges on the bucketed join, decorrelated (non-reexecuted) subqueries,
  * per-partition pushable sampling — are asserted on the EXECUTED plan, not
  * just prose.
  */
class RelationalExtrasSpec extends SparkTestBase {
  import spark.implicits._

  private def q(id: String) =
    SparkEntry.queries(id)(spark, sf0001)

  test("q_join_bucketed: sort-merge join with zero exchanges below the agg") {
    val df = q("q_join_bucketed")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    // Exchanges exist only ABOVE the join (final agg + orderBy); the join's
    // own subtree reads co-located buckets with no shuffle. Everything from
    // the SortMergeJoin line down is its input subtree.
    val belowJoin = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!belowJoin.contains("Exchange"),
      s"expected no exchange below the bucketed join:\n$plan")
    assert(belowJoin.contains("Bucketed: true"),
      s"expected bucketed scans:\n$plan")
    assert(df.count() == 5)
  }

  test("q_subquery_suite: all three subqueries decorrelate to joins") {
    val df = q("q_subquery_suite")
    val plan = df.queryExecution.optimizedPlan.toString
    // Catalyst rewrote IN and EXISTS into semi-joins and the correlated
    // scalar count into an aggregate+join — nothing remains that would
    // re-execute per outer row.
    assert(!plan.contains("exists#") || !plan.contains("InSubquery"),
      s"subquery left undecorrelated:\n$plan")
    assert(plan.contains("LeftSemi"), s"expected semi-join rewrite:\n$plan")
    // Cross-check the rows against a hand-decorrelated equivalent.
    val o = Catalog.load(spark, sf0001, "orders")
    val building = Catalog.load(spark, sf0001, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val returned = Catalog.load(spark, sf0001, "lineitem")
      .filter($"l_returnflag" === "R").select($"l_orderkey").distinct()
    val busy = o.groupBy($"o_custkey".as("k")).count().filter($"count" > 12)
    val expected = o
      .join(building, $"o_custkey" === $"c_custkey", "left_semi")
      .join(returned, $"o_orderkey" === $"l_orderkey", "left_semi")
      .join(busy, $"o_custkey" === $"k", "left_semi")
      .count()
    assert(df.count() == expected)
  }

  test("q_win_distribution: rank identities hold within every partition") {
    val d = q("q_win_distribution").cache()
    // percent_rank in [0,1]; cume_dist in (0,1]; both 1 at the partition max.
    assert(d.filter($"pct_rank" < 0 || $"pct_rank" > 1).count() == 0)
    assert(d.filter($"cume" <= 0 || $"cume" > 1).count() == 0)
    val perNation = d.groupBy($"c_nationkey")
      .agg(max($"cume").as("mx"), count(lit(1)).as("n"))
    assert(perNation.filter($"mx" =!= 1.0).count() == 0)
    // second_poorest is constant within a nation and NULL only for
    // single-customer nations.
    val distinctSecond = d.groupBy($"c_nationkey")
      .agg(countDistinct($"second_poorest").as("k"), count(lit(1)).as("n"))
    assert(distinctSecond.filter($"n" >= 2 && $"k" =!= 1).count() == 0)
    assert(distinctSecond.filter($"n" === 1 && $"k" =!= 0).count() == 0)
    d.unpersist()
  }

  test("q_sample_hash: deterministic across runs, rate near 10%") {
    val a = q("q_sample_hash").collect()
    val b = q("q_sample_hash").collect()
    assert(a.sameElements(b))
    // Aggregate rate across types lands near the 10% design point (the
    // multiplicative hash equidistributes sequential ids; wide tolerance —
    // sf0.001 has only ~6k events).
    val (tot, samp) = a.foldLeft((0L, 0L)) { case ((t, s), r) =>
      (t + r.getAs[Long]("n_total"), s + r.getAs[Long]("n_sample"))
    }
    val rate = samp.toDouble / tot
    assert(rate > 0.05 && rate < 0.15, s"rate $rate out of band")
  }

  test("pack registration: 14 queries, all with oracles") {
    assert(RelationalExtras.queries.map(_.id).toSet == Set(
      "q_join_bucketed", "q_join_cbo_reorder", "q_subquery_suite",
      "q_win_distribution", "q_sample_hash", "q_skyline_pareto",
      "q_er_blocking", "q_er_score", "q_er_sorted_neighborhood",
      "q_er_jaro_winkler", "q_join_lateral_topk", "q_sql_recursive_cte",
      "q_join_null_aware_anti", "q_join_hint_matrix"))
    assert(RelationalExtras.queries.forall(_.oracle.isDefined))
  }

  test("skyline members are mutually non-dominating and non-members are dominated") {
    val s = SparkEntry.queries("q_skyline_pareto")(spark, sf0001).cache()
    val all = Catalog.load(spark, sf0001, "part")
      .filter($"p_brand" === "Brand#1")
      .select($"p_partkey", $"p_retailprice", $"p_size").cache()
    // No skyline member dominates another.
    val dom = s.as("a").join(s.as("b"),
      $"a.p_retailprice" <= $"b.p_retailprice" && $"a.p_size" >= $"b.p_size" &&
        ($"a.p_retailprice" < $"b.p_retailprice" || $"a.p_size" > $"b.p_size"))
    assert(dom.count() == 0)
    // Every non-member has a dominator inside the skyline.
    val nonMembers = all.join(s.select($"p_partkey"), Seq("p_partkey"), "left_anti")
    val undominated = nonMembers.as("n").join(s.as("k"),
        $"k.p_retailprice" <= $"n.p_retailprice" && $"k.p_size" >= $"n.p_size" &&
          ($"k.p_retailprice" < $"n.p_retailprice" || $"k.p_size" > $"n.p_size"),
        "left_anti")
    assert(undominated.count() == 0)
  }
}
