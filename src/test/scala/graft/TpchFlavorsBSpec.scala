package graft

import org.apache.spark.sql.functions._

/** Round-10 batch-3 TPC-H completion pack (SqlFlavorsB): semantic invariants
  * beyond the oracle hash — each test pins the property that makes the
  * flavor's plan shape correct, not just its output stable.
  */
class TpchFlavorsBSpec extends SparkTestBase {
  import spark.implicits._

  test("pack registration: 19 queries, all with oracles") {
    assert(operators.SqlFlavorsB.queries.map(_.id).toSet == Set(
      "q_sql_tpch_q7_flavor", "q_sql_tpch_q9_flavor", "q_sql_tpch_q11_flavor",
      "q_sql_tpch_q13_flavor", "q_sql_tpch_q15_flavor",
      "q_sql_tpch_q16_flavor", "q_sql_tpch_q18_flavor",
      "q_sql_tpch_q20_flavor", "q_sql_tpch_q21_flavor",
      "q_sql_tpcds_q67_flavor", "q_sql_tpcds_q51_flavor",
      "q_sql_tpcds_q88_flavor", "q_sql_tpcds_q97_flavor",
      "q_sql_tpcds_q36_flavor", "q_sql_tpcds_q14_flavor",
      "q_sql_tpcds_q86_flavor", "q_sql_tpcds_q89_flavor",
      "q_sql_tpcds_q23_flavor", "q_sql_tpcds_q74_flavor"))
    assert(operators.SqlFlavorsB.queries.forall(_.oracle.isDefined))
  }

  test("q7: only the two focal nations appear, in both directions") {
    val rows = SparkEntry.queries("q_sql_tpch_q7_flavor")(spark, sf0001)
      .select($"supp_nation", $"cust_nation").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.nonEmpty)
    assert(rows.subsetOf(
      Set(("NATION_18", "NATION_19"), ("NATION_19", "NATION_18"))))
  }

  test("q13: the histogram accounts for every customer, including zero-order ones") {
    val hist = SparkEntry.queries("q_sql_tpch_q13_flavor")(spark, sf0001)
    val total = hist.agg(sum($"custdist")).collect()(0).getLong(0)
    val nCust = Catalog.load(spark, sf0001, "customer").count()
    assert(total == nCust)
  }

  test("q15: every returned supplier holds exactly the maximum revenue") {
    val top = SparkEntry.queries("q_sql_tpch_q15_flavor")(spark, sf0001)
      .select($"total_revenue").distinct().collect()
    assert(top.length == 1)
  }

  test("q16: complaint (negative-balance) suppliers never contribute") {
    // Recompute WITHOUT the anti join; the delta must be exactly the
    // contribution of negative-balance suppliers (possibly zero at sf0.001).
    val bad = Catalog.load(spark, sf0001, "supplier")
      .filter($"s_acctbal" < 0.0).select($"s_suppkey")
      .as[Long].collect().toSet
    val withBad = Catalog.load(spark, sf0001, "lineitem")
      .join(Catalog.load(spark, sf0001, "part")
        .filter($"p_brand" =!= "Brand#1" && $"p_type" =!= "PROMO" &&
          $"p_size".isin(1, 4, 9, 14, 19, 23, 36, 45)),
        $"l_partkey" === $"p_partkey")
      .filter(!$"l_suppkey".isin(bad.toSeq: _*))
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
    val got = SparkEntry.queries("q_sql_tpch_q16_flavor")(spark, sf0001)
    assert(got.count() == withBad.count())
    assert(got.join(withBad, Seq("p_brand", "p_type", "p_size"))
      .filter(got("supplier_cnt") =!= withBad("supplier_cnt")).count() == 0)
  }

  test("q18: every reported order exceeds the 300-quantity threshold") {
    val got = SparkEntry.queries("q_sql_tpch_q18_flavor")(spark, sf0001)
    assert(got.filter($"total_qty" <= 300.0).count() == 0)
    assert(got.count() > 0)
  }

  test("q21: counted orders are multi-supplier with a unique late supplier") {
    // Rebuild the lateness slice and check each reported supplier's count
    // against a direct computation.
    val l = Catalog.load(spark, sf0001, "lineitem")
      .join(Catalog.load(spark, sf0001, "orders")
        .filter($"o_orderstatus" === "F"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAY"))
          .as("is_late"))
      .cache()
    val perOrder = l.groupBy($"l_orderkey").agg(
      countDistinct($"l_suppkey").as("n_supp"),
      countDistinct(when($"is_late", $"l_suppkey")).as("n_late"))
    val soloLate = l.filter($"is_late")
      .select($"l_orderkey", $"l_suppkey").distinct()
      .join(perOrder.filter($"n_supp" >= 2 && $"n_late" === 1), "l_orderkey")
    val focal = Catalog.load(spark, sf0001, "supplier")
      .join(Catalog.load(spark, sf0001, "nation")
        .filter($"n_name" === "NATION_1"),
        $"s_nationkey" === $"n_nationkey")
    val want = soloLate.join(focal, $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = SparkEntry.queries("q_sql_tpch_q21_flavor")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("tpcds q67: per-type ranks are 1..k<=10 and ordered by cents") {
    val rows = SparkEntry.queries("q_sql_tpcds_q67_flavor")(spark, sf0001)
      .select($"p_type", $"rk", $"sumsales_cents")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (tpe, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to g.length).toSeq,
        s"$tpe: ranks not consecutive")
      assert(g.length <= 10)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq,
        s"$tpe: rank order disagrees with cents order")
    }
    // The grand-total row (all group cols aggregated) competes too.
    assert(rows.exists(_._1.isEmpty))
  }

  test("tpcds q51: running totals are non-decreasing and web leads on every row") {
    val rows = SparkEntry.queries("q_sql_tpcds_q51_flavor")(spark, sf0001)
      .select($"mon", $"web_run", $"store_run")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, w, s) => assert(w > s) }
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
  }

  test("tpcds q88: band counts reconcile with direct filters") {
    val row = SparkEntry.queries("q_sql_tpcds_q88_flavor")(spark, sf0001).head()
    val li = Catalog.load(spark, sf0001, "lineitem")
    (0 until 8).foreach { i =>
      val lo = 1 + i * 6
      val want = li.filter($"l_quantity" >= lo && $"l_quantity" < (lo + 6) &&
        $"l_discount" >= 0.05).count()
      assert(row.getLong(i) == want, s"band $lo mismatch")
    }
  }

  test("tpcds q36: sibling ranks are dense within each parent") {
    val rows = SparkEntry.queries("q_sql_tpcds_q36_flavor")(spark, sf0001)
      .select($"p_type", $"lochierarchy", $"rank_within_parent")
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    // Leaves rank within their type; type totals rank among all types;
    // the grand total is rank 1 alone.
    rows.groupBy(t => (t._2, if (t._2 == 0L) t._1 else None)).foreach {
      case (parent, g) =>
        val ranks = g.map(_._3).sorted.toSeq
        assert(ranks == (1L to g.length).toSeq,
          s"parent $parent: ranks $ranks not dense")
    }
    assert(rows.count(_._2 == 2L) == 1)
  }

  test("tpcds q97: overlap partition sums to each channel's distinct keys") {
    val row = SparkEntry.queries("q_sql_tpcds_q97_flavor")(spark, sf0001).head()
    val (webOnly, storeOnly, both) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    val o = Catalog.load(spark, sf0001, "orders")
    val web = o.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct().count()
    val store = o.filter($"o_orderpriority" === "2-HIGH")
      .select($"o_custkey").distinct().count()
    assert(webOnly + both == web)
    assert(storeOnly + both == store)
    assert(both > 0)
  }
}
