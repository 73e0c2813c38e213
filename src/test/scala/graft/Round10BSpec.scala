package graft

import org.apache.spark.sql.functions._

/** Round-10 second batch: remaining TPC-H plan shapes (Q2/Q4/Q12/Q14/Q22
  * flavors), statistical tests (chi-square, Welch t), the Benford screen,
  * the GDPR forget cascade, and daily-revenue autocorrelation.
  */
class Round10BSpec extends SparkTestBase {
  import spark.implicits._

  test("q_sql_tpch_q2_flavor picks the true minimum price per part") {
    val got = SparkEntry.queries("q_sql_tpch_q2_flavor")(spark, sf0001)
    val rows = got.select("p_partkey", "best_price").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(rows.nonEmpty)
    // Recompute the per-part European minimum independently.
    val eu = Catalog.load(spark, sf0001, "supplier")
      .join(Catalog.load(spark, sf0001, "nation"),
        $"s_nationkey" === $"n_nationkey")
      .join(Catalog.load(spark, sf0001, "region").filter($"r_name" === "EUROPE"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey")
    val want = Catalog.load(spark, sf0001, "lineitem")
      .join(eu, $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey").agg(min($"l_extendedprice").as("mn"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    rows.foreach { case (pk, price) => assert(want(pk) == price,
      s"part $pk: got $price want ${want(pk)}") }
  }

  test("q_sql_tpch_q2_flavor emits one row per part (tie-break applied)") {
    val got = SparkEntry.queries("q_sql_tpch_q2_flavor")(spark, sf0001)
    val keys = got.select("p_partkey").collect().map(_.getLong(0))
    assert(keys.length == keys.distinct.length)
  }

  test("q_sql_tpch_q4_flavor decorrelates EXISTS to a semi join") {
    val df = SparkEntry.queries("q_sql_tpch_q4_flavor")(spark, sf0001)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected decorrelated semi join:\n$plan")
    assert(df.collect().map(_.getLong(1)).sum > 0)
  }

  test("q_sql_tpch_q12_flavor line counts partition the filtered join") {
    val rows = SparkEntry.queries("q_sql_tpch_q12_flavor")(spark, sf0001).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val want = Catalog.load(spark, sf0001, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .join(Catalog.load(spark, sf0001, "orders"),
        $"l_orderkey" === $"o_orderkey").count()
    assert(total == want)
  }

  test("q_sql_tpch_q14_flavor promo share is a valid percentage") {
    val r = SparkEntry.queries("q_sql_tpch_q14_flavor")(spark, sf0001).collect()(0)
    val (promo, total, pct) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(promo >= 0.0 && promo <= total)
    assert(pct >= 0.0 && pct <= 100.0)
    assert(math.abs(pct - 100.0 * promo / total) < 1e-9)
  }

  test("q_sql_tpch_q22_flavor screens by balance and inactivity") {
    val got = SparkEntry.queries("q_sql_tpch_q22_flavor")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getLong(1) > 0))
    // Inactive wealthy customers exist at sf0.001 (14 above any threshold).
    assert(got.map(_.getLong(1)).sum > 0)
  }

  test("q_stat_chisq matches a direct computation") {
    val r = SparkEntry.queries("q_stat_chisq")(spark, sf0001).collect()(0)
    val (n, dof, chi2, v) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val cells = Catalog.load(spark, sf0001, "orders")
      .join(Catalog.load(spark, sf0001, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_orderpriority").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val rt = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val nn = cells.map(_._2).sum
    val chi2Direct = cells.map { case ((s, p), o) =>
      val e = rt(s).toDouble * ct(p).toDouble / nn.toDouble
      (o - e) * (o - e) / e
    }.sum
    assert(n == nn)
    assert(dof == (rt.size - 1).toLong * (ct.size - 1).toLong)
    assert(math.abs(chi2 - chi2Direct) < 1e-6, s"$chi2 vs $chi2Direct")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q_stat_ttest_welch matches a direct two-sample computation") {
    val r = SparkEntry.queries("q_stat_ttest_welch")(spark, sf0001).collect()(0)
    val ev = Catalog.load(spark, sf0001, "events")
      .select($"event_type", $"value").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    def stats(t: String) = {
      val xs = ev.filter(_._1 == t).map(_._2)
      val n = xs.length.toDouble
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1.0)
      (n, m, v)
    }
    val (n1, m1, v1) = stats("purchase")
    val (n2, m2, v2) = stats("click")
    val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    assert(r.getLong(0) == n1.toLong && r.getLong(1) == n2.toLong)
    assert(math.abs(r.getDouble(2) - m1) < 1e-9)
    assert(math.abs(r.getDouble(6) - t) < 1e-6, s"${r.getDouble(6)} vs $t")
    val df = r.getDouble(7)
    assert(df >= math.min(n1, n2) - 1.0 && df <= n1 + n2 - 2.0)
  }

  test("q_profile_benford covers all orders with digits 1-9") {
    val rows = SparkEntry.queries("q_profile_benford")(spark, sf0001).collect()
    val digits = rows.map(_.getInt(0))
    assert(digits.forall(d => d >= 1 && d <= 9))
    val total = rows.map(_.getLong(1)).sum
    assert(total == Catalog.load(spark, sf0001, "orders").count())
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 31.0) // benford_pct
    }
  }

  test("q_gdpr_forget purge counts reconcile per table") {
    val rows = SparkEntry.queries("q_gdpr_forget")(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("customer", "events", "lineitem", "orders"))
    rows.foreach { r =>
      val (total, purged, retained) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(total == purged + retained)
      assert(purged >= 0 && purged < total)
    }
    // the orders purge must equal the rule applied independently
    val wantOrders = Catalog.load(spark, sf0001, "orders")
      .filter(($"o_custkey".bitwiseAND(lit(2147483647L)) * lit(2654435761L)) %
        lit(4294967296L) < lit(214748364L)).count()
    val gotOrders = rows.find(_.getString(0) == "orders").get.getLong(2)
    assert(gotOrders == wantOrders)
  }

  test("q_ts_holt equals a direct sequential fold per segment") {
    val got = SparkEntry.queries("q_ts_holt")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 5)
    val daily = Catalog.load(spark, sf0001, "orders")
      .join(Catalog.load(spark, sf0001, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", date_trunc("day", $"o_orderdate").as("day"))
      .agg(Dsl.dsum($"o_totalprice").as("y"))
      .orderBy($"c_mktsegment", $"day")
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    got.foreach { case (seg, nDays, level, trend) =>
      val ys = daily.filter(_._1 == seg).map(_._2)
      assert(nDays == ys.length)
      var l = ys(1); var b = ys(1) - ys(0)
      ys.drop(2).foreach { y =>
        val lNew = 0.3 * y + 0.7 * (l + b)
        b = 0.1 * (lNew - l) + 0.9 * b
        l = lNew
      }
      assert(level == l, s"$seg level: $level vs $l")
      assert(trend == b, s"$seg trend: $trend vs $b")
    }
  }

  test("q_ts_mom_growth ratios are consistent and first rows stay null") {
    val rows = SparkEntry.queries("q_ts_mom_growth")(spark, sf0001).collect()
    assert(rows.length > 24)
    assert(rows.head.isNullAt(2) && rows.head.isNullAt(3))
    assert(rows(12).isNullAt(3) == false)
    val (r0, r1) = (rows(0).getDouble(1), rows(1).getDouble(1))
    assert(math.abs(rows(1).getDouble(2) - (r1 - r0) * 100.0 / r0) < 1e-9)
  }

  test("q_stat_ks_test statistic matches a direct ECDF computation") {
    val r = SparkEntry.queries("q_stat_ks_test")(spark, sf0001).collect()(0)
    val ev = Catalog.load(spark, sf0001, "events")
      .filter($"event_type".isin("purchase", "click"))
      .select($"event_type", floor($"value" * 100.0).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val p = ev.filter(_._1 == "purchase").map(_._2).sorted
    val c = ev.filter(_._1 != "purchase").map(_._2).sorted
    val qs = (p ++ c).distinct.sorted
    val dScaled = qs.map { q =>
      math.abs(p.count(_ <= q).toLong * c.length - c.count(_ <= q).toLong * p.length)
    }.max
    assert(r.getLong(0) == p.length && r.getLong(1) == c.length)
    assert(r.getLong(2) == dScaled)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("q_agg_bool argmax decodes to the true max-price order per priority") {
    val rows = SparkEntry.queries("q_agg_bool")(spark, sf0001).collect()
    assert(rows.length == 5)
    val orders = Catalog.load(spark, sf0001, "orders")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { r =>
      val (prio, topOrder) = (r.getString(0), r.getLong(5))
      val grp = orders.filter(_._1 == prio)
      val maxPrice = grp.map(_._3).max
      val want = grp.filter(_._3 == maxPrice).map(_._2).max
      assert(topOrder == want, s"$prio: $topOrder vs $want")
      assert(r.getBoolean(3)) // all totalprice positive
      assert(r.getLong(2) == grp.count(_._3 > 150000.0))
    }
  }

  test("q_source_binaryfile manifest matches the documents it was cut from") {
    val rows = SparkEntry.queries("q_source_binaryfile")(spark, sf0001).collect()
    assert(rows.length == 20)
    val want = Catalog.load(spark, sf0001, "documents")
      .filter($"doc_id" < 20).select($"doc_id", $"text").collect()
      .map(r => (s"doc_${r.getLong(0)}.bin",
        r.getString(1).getBytes("UTF-8").length.toLong)).toMap
    rows.foreach { r =>
      assert(want(r.getString(0)) == r.getLong(1))
      assert(r.getString(2).matches("[0-9a-f]{32}"))
    }
  }

  test("q_set_union_byname null-fills the missing column and partitions orders") {
    val rows = SparkEntry.queries("q_set_union_byname")(spark, sf0001).collect()
    val v1 = rows.filter(_.getString(0) == "v1")
    assert(v1.length == 1 && v1.head.isNullAt(1)) // one NULL-priority rollup row
    val total = rows.map(_.getLong(2)).sum
    assert(total == Catalog.load(spark, sf0001, "orders").count())
  }

  test("q_sql_tpch_q6_flavor pushes all predicates to the scan") {
    val df = SparkEntry.queries("q_sql_tpch_q6_flavor")(spark, sf0001)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_discount"))
    val r = df.collect()(0)
    assert(r.getLong(0) > 0 && r.getDouble(1) > 0.0)
  }

  test("q_sql_tpch_q8_flavor share stays in [0,1] and revenues reconcile") {
    val rows = SparkEntry.queries("q_sql_tpch_q8_flavor")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(1)) {
        assert(r.getDouble(1) <= r.getDouble(2))
        assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      }
    }
  }

  test("q_sql_tpch_q19_flavor keeps the equi-join under the disjunction") {
    val df = SparkEntry.queries("q_sql_tpch_q19_flavor")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"OR arms must not degrade the partkey equi-join:\n$plan")
    assert(df.collect()(0).getLong(0) >= 0)
  }

  test("q_marketing_engagement_decay weights recent value above old value") {
    val rows = SparkEntry.queries("q_marketing_engagement_decay")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // decayed score can never exceed the user's raw value sum
    val raw = Catalog.load(spark, sf0001, "events")
      .groupBy($"user_id").agg(Dsl.dsum($"value").as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    rows.foreach(r => assert(r.getDouble(2) <= raw(r.getLong(0)) + 1e-6))
  }

  test("graft_topk_agg merges partial heaps exactly across many partitions") {
    val df = spark.range(0, 10000).toDF("v")
      .repartition(16) // force 16 partial buffers per group
      .withColumn("g", (col("v") % 4).cast("string"))
      .groupBy($"g").agg(expr("graft_topk_agg(v, 5)").as("tops"))
      .select($"g", $"tops")
    val got = df.collect().map(r => (r.getString(0),
      r.getSeq[Long](1).toList)).toMap
    (0 until 4).foreach { g =>
      val want = (0 until 10000).filter(_ % 4 == g).map(_.toLong)
        .sorted.reverse.take(5).toList
      assert(got(g.toString) == want, s"group $g: ${got(g.toString)}")
    }
  }

  test("graft_topk_agg handles k larger than the group") {
    val got = spark.range(0, 3).toDF("v")
      .agg(expr("graft_topk_agg(v, 10)").as("tops"))
      .collect()(0).getSeq[Long](0).toList
    assert(got == List(2L, 1L, 0L))
  }

  test("q_win_topn_agg equals the window formulation") {
    val got = SparkEntry.queries("q_win_topn_agg")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".desc)
    val want = Catalog.load(spark, sf0001, "orders")
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"o_orderpriority", $"rank".cast("long"),
        $"o_totalprice", $"o_orderkey")
      .orderBy($"o_orderpriority".asc_nulls_first, $"rank".asc_nulls_first)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_ts_acf values are valid autocorrelations over the daily series") {
    val rows = SparkEntry.queries("q_ts_acf")(spark, sf0001).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 7))
    val days = Catalog.load(spark, sf0001, "orders")
      .select(date_trunc("day", $"o_orderdate")).distinct().count()
    rows.foreach { r =>
      assert(r.getLong(1) == days - r.getInt(0)) // near-complete spine
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    }
  }
}
