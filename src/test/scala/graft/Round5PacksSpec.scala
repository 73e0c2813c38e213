package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-5 packs (SURVEY §2.N time-series, §2.O
  * graph, §2.P profiling, §2.Q governance, plus the graded stream join) on
  * the sf0.001 fixture — the DuckDB oracle covers value equality; these pin
  * the SEMANTICS (spine coverage, interpolation bracketing, component
  * consistency, triangle closure, audit arithmetic) independently.
  */
class Round5PacksSpec extends SparkTestBase {
  import spark.implicits._

  private def q(id: String) =
    SparkEntry.queries(id)(spark, sf0001).cache()

  test("gapfill covers the full day x priority grid and preserves totals") {
    val g = q("q_ts_gapfill")
    val orders = Catalog.load(spark, sf0001, "orders")
    val nDays = orders
      .select(datediff(max($"o_orderdate"), min($"o_orderdate"))).as[Int].head() + 1
    val nPrio = orders.select($"o_orderpriority").distinct().count()
    assert(g.count() == nDays.toLong * nPrio, "spine x dims grid is complete")
    assert(g.agg(sum($"n_orders")).as[Long].head() == orders.count(),
      "zero-filling preserves the order total")
    assert(g.filter($"n_orders" === 0 && $"revenue" =!= 0.0).count() == 0)
    assert(g.filter($"n_orders" === 0).count() > 0, "fixture has real gaps")
  }

  test("interpolated values are bracketed by their observed neighbors") {
    val i = q("q_ts_interpolate")
    val urgentDays = Catalog.load(spark, sf0001, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select(date_trunc("day", $"o_orderdate")).distinct().count()
    assert(i.filter($"fill_kind" === "actual").count() == urgentDays)
    assert(i.filter($"rev_filled".isNull).count() == 0)
    // An interpolated value lies strictly between (inclusive) the bracketing
    // observations: check against running min/max of observed values.
    val w = org.apache.spark.sql.expressions.Window.orderBy($"day".asc)
      .rowsBetween(Long.MinValue, -1)
    val wn = org.apache.spark.sql.expressions.Window.orderBy($"day".asc)
      .rowsBetween(1, Long.MaxValue)
    val bad = i
      .withColumn("prev", last(when($"fill_kind" === "actual", $"rev_filled"),
        ignoreNulls = true).over(w))
      .withColumn("next", first(when($"fill_kind" === "actual", $"rev_filled"),
        ignoreNulls = true).over(wn))
      .filter($"fill_kind" === "interp")
      .filter($"rev_filled" < least($"prev", $"next") ||
        $"rev_filled" > greatest($"prev", $"next"))
    assert(bad.count() == 0, "interpolation escapes its bracket")
  }

  test("range-frame trailing spend includes the current order and is monotone-safe") {
    val r = q("q_win_range_frame")
    val orders = Catalog.load(spark, sf0001, "orders")
    assert(r.count() == orders.count())
    assert(r.filter($"n_orders_90d" < 1).count() == 0,
      "every order is inside its own frame")
    val own = r.select($"o_orderkey".as("k"), $"spend_90d")
      .join(orders.select($"o_orderkey".as("k"), $"o_totalprice"), Seq("k"))
      .filter($"spend_90d" < $"o_totalprice" - 0.01)
    assert(own.count() == 0, "trailing spend can never be below the own order")
  }

  test("ewma equals the raw value on the first observation and stays in range") {
    val e = q("q_ts_ewma").orderBy($"day".asc)
    val first = e.limit(1).select($"rev", $"ewma").as[(Double, Double)].head()
    assert(first._1 == first._2, "one-term EWMA is the value itself")
    assert(e.filter($"ewma".isNull).count() == 0)
    // EWMA is a convex combination of the last 14 observations.
    val w = org.apache.spark.sql.expressions.Window.orderBy($"day".asc)
      .rowsBetween(-13, 0)
    val bad = e
      .withColumn("mn", min($"rev").over(w)).withColumn("mx", max($"rev").over(w))
      .filter($"ewma" < $"mn" - 1e-9 || $"ewma" > $"mx" + 1e-9)
    assert(bad.count() == 0, "EWMA escapes the convex hull of its window")
  }

  test("connected components: endpoints agree, labels are minimal, sizes consistent") {
    val c = q("q_graph_components")
    val docs = Catalog.load(spark, sf0001, "documents")
    assert(c.count() == docs.count(), "every document is assigned a component")
    assert(c.filter($"component_id" > $"doc_id").count() == 0,
      "component id is the minimum member")
    val pairs = SparkEntry.queries("q_dedup_near")(spark, sf0001)
      .select($"doc_a", $"doc_b")
    val lblA = c.select($"doc_id".as("doc_a"), $"component_id".as("ca"))
    val lblB = c.select($"doc_id".as("doc_b"), $"component_id".as("cb"))
    val disagree = pairs.join(lblA, Seq("doc_a")).join(lblB, Seq("doc_b"))
      .filter($"ca" =!= $"cb").count()
    assert(disagree == 0, "edge endpoints must share a component")
    // comp_size really is the component cardinality.
    val sizeBad = c.groupBy($"component_id", $"comp_size")
      .agg(count(lit(1)).as("n")).filter($"n" =!= $"comp_size").count()
    assert(sizeBad == 0)
    // Non-trivial: at least one multi-doc cluster exists in the fixture.
    assert(c.filter($"comp_size" > 1).count() > 0)
  }

  test("min-label propagation handles deep chains (diameter >> 1) exactly") {
    // A 15-node path 0-1-2-...-14 plus a disjoint 3-clique {20,21,22}:
    // propagation must walk the full chain, not just one hop.
    val path = (0L until 14L).map(i => (i, i + 1))
    val clique = Seq((20L, 21L), (20L, 22L), (21L, 22L))
    val edges = (path ++ clique).toDF("u", "v")
    val und = edges.union(edges.select($"v", $"u")).toDF("u", "v")
    val lbl = graft.operators.GraphOps.propagateMinLabels(spark, und)
      .as[(Long, Long)].collect().toMap
    (0L to 14L).foreach(n => assert(lbl(n) == 0L, s"node $n got ${lbl(n)}"))
    Seq(20L, 21L, 22L).foreach(n => assert(lbl(n) == 20L))
  }

  test("triangle counts: per-node sum is 3x the triangle total and closure holds") {
    val t = q("q_graph_triangles")
    val total = t.agg(sum($"n_triangles")).as[Long].head()
    assert(total % 3 == 0, "each triangle is counted at its 3 corners")
    assert(t.filter($"n_triangles" < 0).count() == 0)
  }

  test("dedup clusters partition the corpus and drop exactly the non-canonical members") {
    val c = q("q_dedup_clusters")
    val docs = Catalog.load(spark, sf0001, "documents")
    assert(c.agg(sum($"n_members")).as[Long].head() == docs.count(),
      "clusters partition the document set")
    assert(c.filter($"n_dropped" =!= $"n_members" - 1).count() == 0)
    assert(c.filter($"chars_kept".isNull).count() == 0,
      "every cluster keeps its canonical doc")
    assert(c.filter($"n_dropped" === 0 && $"chars_dropped" =!= 0).count() == 0)
    // Consistent with the component assignment query.
    val comp = q("q_graph_components")
    val compCount = comp.select($"component_id").distinct().count()
    assert(c.count() == compCount)
  }

  test("anomaly z-scores: warmup rows null, flags only past the history gate") {
    val a = q("q_ts_anomaly")
    assert(a.filter($"n_hist" < 8 && $"z".isNotNull).count() == 0)
    assert(a.filter($"is_anomaly" && $"z".isNull).count() == 0)
    assert(a.filter($"is_anomaly" && abs($"z") <= 2.0).count() == 0)
    assert(a.filter($"z".isNotNull).count() > 0, "fixture produces scored days")
  }

  test("integer pagerank: covers the edge-node set, respects the damping floor") {
    val pr = q("q_graph_pagerank")
    val tri = q("q_graph_triangles")
    assert(pr.count() == tri.count(), "same node universe as triangles")
    // (1-d) floor: every rank is at least 0.15 (scaled), and integer
    // truncation can only lose mass — total stays <= n * scale.
    assert(pr.filter($"pr" < 150000000L).count() == 0)
    val n = pr.count()
    assert(pr.agg(sum($"pr")).as[Long].head() <= n * 1000000000L)
  }

  test("profile summary matches direct recomputation") {
    val p = q("q_profile_summary")
    val orders = Catalog.load(spark, sf0001, "orders")
    assert(p.count() == 5)
    assert(p.filter($"n_rows" =!= orders.count()).count() == 0)
    assert(p.filter($"n_nulls" =!= 0).count() == 0, "fixtures are null-free")
    val okey = p.filter($"col_name" === "o_orderkey").head()
    assert(okey.getAs[Long]("n_distinct") == orders.count(), "o_orderkey unique")
  }

  test("histogram bins partition the rows and shares sum to one") {
    val h = q("q_profile_histogram")
    val orders = Catalog.load(spark, sf0001, "orders")
    assert(h.agg(sum($"n")).as[Long].head() == orders.count())
    assert(h.filter($"lo" >= $"hi").count() == 0)
    val shareSum = h.agg(sum($"share")).as[Double].head()
    assert(math.abs(shareSum - 1.0) < 1e-9)
  }

  test("frequent values are exact and correctly ranked") {
    val f = q("q_profile_freq")
    assert(f.groupBy($"col_name").count().filter($"count" =!= 5).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"col_name").orderBy($"rk".asc)
    assert(f.withColumn("pn", lag($"n", 1).over(w))
      .filter($"pn".isNotNull && $"n" > $"pn").count() == 0,
      "counts are non-increasing in rank")
    // Spot-check one cell against a direct count.
    val top = f.filter($"col_name" === "o_orderpriority" && $"rk" === 1)
      .select($"value", $"n").as[(String, Long)].head()
    val direct = Catalog.load(spark, sf0001, "orders")
      .groupBy($"o_orderpriority").count()
      .orderBy($"count".desc, $"o_orderpriority".asc)
      .as[(String, Long)].head()
    assert(top == direct)
  }

  test("correlation matrix is bounded and self-consistent") {
    val c = q("q_stat_corr")
    assert(c.count() == 6)
    assert(c.filter($"pearson_r" < -1.0 || $"pearson_r" > 1.0).count() == 0)
    val li = Catalog.load(spark, sf0001, "lineitem")
    assert(c.filter($"n_rows" =!= li.count()).count() == 0)
    // Sign consistency: r, covariance, and slope share a sign (slope and r
    // are covariance rescaled by positive variances).
    assert(c.filter(signum($"pearson_r") =!= signum($"cov_pop")).count() == 0)
    assert(c.filter(signum($"slope") =!= signum($"cov_pop")).count() == 0)
  }

  test("PII mask output leaks no raw name and digests are well-formed") {
    val m = q("q_pii_mask")
    assert(m.filter(length($"key_digest") =!= 64).count() == 0)
    assert(m.filter(!$"key_digest".rlike("^[0-9a-f]{64}$")).count() == 0)
    assert(m.filter(!$"masked_email".rlike("^.\\*\\*\\*@example\\.com$")).count() == 0)
    assert(m.filter(!$"key_mask".rlike("^\\*\\*\\*\\*[0-9]{4}$")).count() == 0)
  }

  test("stratified sample audit arithmetic is exact and rates ordered") {
    val s = q("q_sample_stratified").cache()
    assert(s.filter($"n_sample" > $"n_pop").count() == 0)
    assert(s.filter(
      $"rate" =!= $"n_sample".cast("double") / $"n_pop".cast("double")).count() == 0)
    val urgent = s.filter($"o_orderpriority" === "1-URGENT")
      .select($"rate").as[Double].head()
    assert(urgent > 0.1 && urgent < 0.3, s"urgent rate $urgent far from 20%")
  }

  test("frame sampling is strided, bounded, and per-frame digests are unique") {
    val f = q("q_multimodal_frames")
    val perDoc = f.groupBy($"doc_id").count()
    assert(perDoc.filter($"count" > 15).count() == 0,
      "stride bounds the per-doc fan-out")
    assert(f.filter($"frame_idx" < 0).count() == 0)
    assert(f.select($"doc_id", $"frame_md5").distinct().count() == f.count(),
      "per-frame digests must differ within a doc")
    val meta = q("q_multimodal_binary").select($"doc_id", $"n_frames")
    val over = f.join(meta, Seq("doc_id")).filter($"frame_idx" >= $"n_frames")
    assert(over.count() == 0, "sampled indices stay inside the clip")
  }

  test("rolling 7-day actives dominate daily actives and never exceed the universe") {
    val r = q("q_win_rolling_distinct")
    val ev = Catalog.load(spark, sf0001, "events")
    val daily = ev.select(date_trunc("day", $"ts").as("day"), $"user_id")
      .distinct().groupBy($"day").agg(count(lit(1)).as("dau"))
    val bad = r.join(daily, Seq("day")).filter($"wau" < $"dau").count()
    assert(bad == 0, "WAU >= DAU on every observed day")
    val users = ev.select($"user_id").distinct().count()
    assert(r.filter($"wau" > users).count() == 0)
  }

  test("collocation lift is exact integer arithmetic and respects min support") {
    val c = q("q_text_collocations")
    assert(c.count() <= 20)
    assert(c.filter($"n_ab" < 5).count() == 0)
    assert(c.filter($"lift_ppm" <= 0).count() == 0)
    // Spot-check one lift against a direct recount.
    val top = c.orderBy($"rk".asc).head()
    val (w1, w2, nab, lift) = (top.getAs[String]("w1"), top.getAs[String]("w2"),
      top.getAs[Long]("n_ab"), top.getAs[Long]("lift_ppm"))
    val toks = Catalog.load(spark, sf0001, "documents")
      .select(split($"text", " ").as("t")).filter(size($"t") >= 2)
    val bi = toks.select(explode(transform(sequence(lit(0), size($"t") - 2),
        i => struct(element_at($"t", i + 1).as("w1"),
          element_at($"t", i + 2).as("w2")))).as("b"))
      .select($"b.w1", $"b.w2").cache()
    val n = bi.count()
    val nab2 = bi.filter($"w1" === w1 && $"w2" === w2).count()
    val na = bi.filter($"w1" === w1).count()
    val nb = bi.filter($"w1" === w2).count()
    assert(nab2 == nab)
    assert(lift == nab2 * n * 1000000L / (na * nb))
  }

  test("stream join counts agree with the click-side formulation") {
    val j = q("q_stream_join")
    val ev = Catalog.load(spark, sf0001, "events")
    val nViews = ev.filter($"event_type" === "view").count()
    assert(j.count() == nViews, "zero-click views are kept")
    // Symmetric recount: per click, number of views in [click-30min, click).
    val views = ev.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"ts".as("v_ts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("c_ts"))
    val pairTotal = clicks.join(views,
        $"user_id" === $"v_user" &&
          $"v_ts" < $"c_ts" && $"v_ts" >= $"c_ts" - expr("INTERVAL 30 MINUTES"))
      .count()
    assert(j.agg(sum($"n_clicks_30m")).as[Long].head() == pairTotal)
  }
}
