package graft

import org.apache.spark.sql.functions._

/** Round-16 batch B: the four oracle-graded additions' contract tests —
  * matryoshka funnel recall, geofence containment exactness, tokenization
  * vault invariants, KMV sketch accuracy.
  */
class Round16BSpec extends SparkTestBase {
  import spark.implicits._

  // ---- q_sim_matryoshka ---------------------------------------------------

  for (sf <- Seq(sf0001, sf01)) {
    test(s"matryoshka funnel recall@5 >= 0.9 vs exact full-dim top-5 ($sf)") {
      val funnel = SparkEntry.queries("q_sim_matryoshka")(spark, sf)
        .select($"probe_id", $"cand_id")
      val truth = graft.operators.VectorServe.mrlGroundTruth(spark, sf)
      val nTruth = truth.count()
      val hit = funnel.join(truth, Seq("probe_id", "cand_id")).count()
      assert(nTruth > 0)
      val recall = hit.toDouble / nTruth
      assert(recall >= 0.9, s"funnel recall@5 $recall < 0.9 at $sf")
    }
  }

  test("matryoshka output shape: 5 ranked rows per probe, ranks 1..5") {
    val out = SparkEntry.queries("q_sim_matryoshka")(spark, sf0001)
    val per = out.groupBy($"probe_id")
      .agg(count(lit(1)).as("n"), min($"rank").as("lo"), max($"rank").as("hi"))
      .collect()
    assert(per.length == 10)
    assert(per.forall(r => r.getLong(1) == 5L && r.getLong(2) == 1L
      && r.getLong(3) == 5L))
  }

  // ---- q_geo_point_in_polygon ---------------------------------------------

  test("pip crossing rule: hand-checked inside/outside points") {
    // (clon, clat): origin-ish point deep inside the pentagon; far corner,
    // a point just outside the left edge, and one below the bottom edge.
    val pts = Seq(
      (0.25, 0.25, true),     // interior
      (179.25, 79.25, false), // far NE corner of the domain
      (-160.25, 0.25, false), // left of the (-150, 0) vertex
      (0.25, -79.75, false))  // south of the bottom edges
      .toDF("clon", "clat", "expect")
    val got = graft.operators.GeoOps.pipInside(pts)
      .filter($"inside" =!= $"expect").count()
    assert(got == 0L)
  }

  test("pip containment fraction matches the polygon/domain area ratio") {
    // Shoelace area of the pentagon = 22800; point domain = 360 x 160 =
    // 57600 -> a roughly uniform lattice should land ~40% inside. The wide
    // band guards the parity logic (an inverted even-odd rule would read
    // ~60%, a broken straddle test ~0% or ~100%).
    val out = SparkEntry.queries("q_geo_point_in_polygon")(spark, sf01)
      .agg(sum($"n_points").as("n"), sum($"n_inside").as("in"))
      .head()
    val frac = out.getLong(1).toDouble / out.getLong(0)
    assert(frac > 0.2 && frac < 0.6, s"inside fraction $frac")
  }

  // ---- q_pii_tokenize -----------------------------------------------------

  test("tokenize vault: tokens are dense, unique per value, stable") {
    // Recompute the full vault (not just the graded slice) and pin the
    // dictionary invariants: one token per distinct value, ranks dense
    // 1..n, and a re-invocation assigns identical tokens (stability is
    // the whole point of a vault).
    val full = graft.operators.Governance.tokenizeFull(spark, sf0001)
    val n = full.select($"token").distinct().count()
    val nCust = full.count()
    assert(n == nCust, "distinct customers must get distinct tokens")
    val ranks = full.select(substring($"token", 5, 8).cast("long").as("r"))
    val mm = ranks.agg(min($"r"), max($"r"), count(lit(1))).head()
    assert(mm.getLong(0) == 1L && mm.getLong(1) == mm.getLong(2),
      s"tokens must be dense 1..n, got ${mm}")
    val again = graft.operators.Governance.tokenizeFull(spark, sf0001)
    assert(full.join(again, Seq("c_custkey"))
      .filter(full("token") =!= again("token")).count() == 0L)
  }

  test("tokenize order is hash order, not key order") {
    // The Knuth local part scrambles sort order: if tokens simply followed
    // c_custkey the vault would be fake. Check the two orders disagree.
    val full = graft.operators.Governance.tokenizeFull(spark, sf0001)
      .select($"c_custkey", substring($"token", 5, 8).cast("long").as("r"))
    val inversions = full.as("a").join(full.as("b"),
      $"a.c_custkey" < $"b.c_custkey" && $"a.r" > $"b.r").count()
    assert(inversions > 0L, "token order must not equal key order")
  }

  // ---- q_ts_sax -----------------------------------------------------------

  test("sax: 8 segments, 4-letter alphabet, weighted z-mean ~ 0") {
    val out = SparkEntry.queries("q_ts_sax")(spark, sf01).collect()
    assert(out.map(_.getLong(0)).toSeq == (0L to 7L))
    assert(out.forall(r => Set("a", "b", "c", "d")(r.getString(3))))
    // PAA values are z-scores of segment means; their n_days-weighted mean
    // is the global z-mean = 0 by construction (up to 4dp rounding x 8).
    val wmean = out.map(r => r.getDouble(2) * r.getLong(1)).sum /
      out.map(_.getLong(1)).sum
    assert(math.abs(wmean) < 0.001, s"weighted PAA mean $wmean")
  }

  // ---- q_win_pattern_vshape -----------------------------------------------

  test("vshape: counts bounded by days and emitted in total order") {
    val out = SparkEntry.queries("q_win_pattern_vshape")(spark, sf01).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
    val counts = out.map(_.getLong(2)).toSeq
    assert(counts == counts.sorted.reverse, "must be count-descending")
    assert(counts.head > 0L, "top supplier should have at least one V")
  }

  // ---- q_stat_mutual_info -------------------------------------------------

  test("mutual info: non-negative, ~0 for independent pairs, high for leak") {
    val out = SparkEntry.queries("q_stat_mutual_info")(spark, sf01)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out.values.forall(_ >= -0.0001), s"MI must be >= 0: $out")
    // The fixture dims are independently generated - the I ~ 0 baseline.
    assert(out("customer.c_mktsegment|c_nationkey") < 0.05,
      s"independent pair should carry ~0 bits: $out")
    assert(out("orders.o_orderpriority|o_orderstatus") < 0.05,
      s"independent pair should carry ~0 bits: $out")
    // The price band functionally encodes the high-value label: the MI
    // screen must flag the leaked feature with ~H(label) bits.
    assert(out("orders.price_band|high_value") > 0.3,
      s"leakage probe should carry ~H(label) bits: $out")
  }

  // ---- q_eval_calibration -------------------------------------------------

  test("calibration: 10 bins partition the corpus, ppm in range") {
    val out = SparkEntry.queries("q_eval_calibration")(spark, sf0001).collect()
    assert(out.map(_.getLong(0)).toSeq == (0L to 9L))
    val nOrders = Catalog.load(spark, sf0001, "orders").count()
    assert(out.map(_.getLong(1)).sum == nOrders)
    assert(out.forall { r =>
      val (p, a) = (r.getLong(3), r.getLong(4))
      p >= 0L && p <= 1000000L && a >= 0L && a <= 1000000L
    })
    // Predicted confidence must rise with the bin by construction.
    val preds = out.map(_.getLong(3)).toSeq
    assert(preds == preds.sorted, "pred_ppm must be bin-monotonic")
  }

  // ---- q_lake_stats_only --------------------------------------------------

  test("lake stats-only: plan is metadata-only (LocalTableScan leaves)") {
    val df = SparkEntry.queries("q_lake_stats_only")(spark, sf0001)
    df.count() // let AQE finalize so the asserted plan is the executed one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected local rows:\n$plan")
    assert(!plan.contains("FileScan"),
      s"stats-only must not scan data files:\n$plan")
  }

  test("lake stats-only: catalog answer equals the scan answer") {
    val out = SparkEntry.queries("q_lake_stats_only")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val o = Catalog.load(spark, sf0001, "orders")
    val full = o.agg(count(lit(1)), min($"o_orderkey"), max($"o_orderkey"))
      .head()
    val part = o.filter($"o_orderkey" % 4 =!= 3)
      .agg(count(lit(1)), min($"o_orderkey"), max($"o_orderkey")).head()
    assert(out(4L) == ((full.getLong(0), full.getLong(1), full.getLong(2))))
    assert(out(5L) == ((part.getLong(0), part.getLong(1), part.getLong(2))))
  }

  test("lake stats-only: refuses DV-masked and stats-free files") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_stats_refuse_").toString
    def write(lines: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(base, "_log.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    write(Seq(
      """{"v":1,"op":"add","path":"fileA","min":0,"max":9,"rows":10}""",
      """{"v":2,"op":"dv","path":"fileA","dv":"dv1"}"""))
    val e1 = intercept[IllegalArgumentException](
      graft.operators.LakeOps.statsOnly(base, 2))
    assert(e1.getMessage.contains("deletion vectors"))
    write(Seq("""{"v":1,"op":"add","path":"fileB"}"""))
    val e2 = intercept[IllegalArgumentException](
      graft.operators.LakeOps.statsOnly(base, 1))
    assert(e2.getMessage.contains("without rows/zone stats"))
  }

  // ---- q_lake_stats_pruned ------------------------------------------------

  test("lake stats-pruned: hybrid answer equals the full-scan answer") {
    val out = SparkEntry.queries("q_lake_stats_pruned")(spark, sf0001).head()
    assert(out.getLong(0) == 2L && out.getLong(1) == 2L
      && out.getLong(2) == 4L, s"classification drifted: $out")
    val o = Catalog.load(spark, sf0001, "orders")
    val m = o.agg(max($"o_orderkey")).head().getLong(0) + 1L
    val expected = o.filter($"o_orderkey" <= (3L * m) / 8L).count()
    assert(out.getLong(3) == expected)
  }

  test("lake stats-pruned: DV-masked files demote to the scan set") {
    import graft.operators.LakeOps.{LakeState, statsPrunedSplit}
    val st = LakeState(
      live = Seq("inA", "inDv", "inNoRows", "straddle", "out"),
      dvs = Map("inDv" -> Seq("dv1")),
      zones = Map("inA" -> (0L, 9L), "inDv" -> (0L, 9L),
        "inNoRows" -> (0L, 9L), "straddle" -> (5L, 15L), "out" -> (20L, 30L)),
      rowCounts = Map("inA" -> 10L, "inDv" -> 10L, "straddle" -> 11L))
    val (meta, scan, skip) = statsPrunedSplit(st, 0L, 10L)
    assert(meta == Seq("inA"), s"meta=$meta")
    assert(scan.toSet == Set("inDv", "inNoRows", "straddle"), s"scan=$scan")
    assert(skip == Seq("out"), s"skip=$skip")
  }

  // ---- q_text_zipf ----------------------------------------------------

  test("zipf: slope is negative (frequencies fall with rank)") {
    val r = SparkEntry.queries("q_text_zipf")(spark, sf01).head()
    assert(r.getLong(0) > 10L, "need a non-trivial head to fit")
    assert(r.getDouble(1) < 0.0, s"zipf slope must be negative: $r")
    // intercept = ln(freq) extrapolated to rank 1 - must sit at or above
    // the top frequency's ln for a falling fit.
    assert(r.getDouble(2) > 0.0)
  }

  // ---- q_ts_seasonal_strength ---------------------------------------------

  test("seasonal strength: scalars in [0,1], residual variance reduces both") {
    val r = SparkEntry.queries("q_ts_seasonal_strength")(spark, sf01).head()
    val (ft, fs) = (r.getDouble(1), r.getDouble(2))
    assert(ft >= 0.0 && ft <= 1.0, s"f_trend out of range: $ft")
    assert(fs >= 0.0 && fs <= 1.0, s"f_seasonal out of range: $fs")
    // Removing a fitted component can only reduce variance on the data it
    // was fitted to, so at least one strength must be strictly positive
    // for a series with any structure at all.
    assert(ft > 0.0 || fs > 0.0)
  }

  // ---- q_graph_hits -------------------------------------------------------

  test("hits: orientation separates hubs from authorities") {
    val out = SparkEntry.queries("q_graph_hits")(spark, sf0001).collect()
    assert(out.nonEmpty)
    // The low->high orientation makes minimum-key nodes pure hubs (no
    // in-edges => auth 0) and maximum-key nodes pure authorities.
    val minNode = out.minBy(_.getLong(0))
    val maxNode = out.maxBy(_.getLong(0))
    assert(minNode.getLong(2) == 0L, s"min-key node must have auth 0: $minNode")
    assert(maxNode.getLong(1) == 0L, s"max-key node must have hub 0: $maxNode")
    // Normalization keeps every score in [0, ~Scale + slack].
    assert(out.forall(r => r.getLong(1) >= 0L && r.getLong(2) >= 0L))
    assert(out.exists(r => r.getLong(1) > 0L))
    assert(out.exists(r => r.getLong(2) > 0L))
  }

  // ---- q_dedup_url_canonical --------------------------------------------

  test("url canonical: variants collapse to exactly one URL per document") {
    val out = SparkEntry.queries("q_dedup_url_canonical")(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    // n_canonical == n_docs in every source: the canonicalizer neither
    // merges distinct documents nor leaves tracking variants apart.
    assert(out.forall(r => r.getLong(2) == r.getLong(3)),
      s"canonical/doc drift: ${out.mkString(";")}")
    // The messy-variant generator guarantees n_raw > n_docs somewhere.
    assert(out.exists(r => r.getLong(1) > r.getLong(3)))
  }

  // ---- q_agg_sketch_cm ------------------------------------------------

  test("count-min: estimates never undercount, exact when collision-free") {
    val out = SparkEntry.queries("q_agg_sketch_cm")(spark, sf01).collect()
    assert(out.length == 10)
    assert(out.forall(r => r.getLong(2) >= r.getLong(1)),
      "CM must only overcount")
    assert(out.forall(r => r.getLong(3) == r.getLong(2) - r.getLong(1)))
    // With 10^3-10^4 distinct keys over 4x65536 counters, per-row collision
    // probability is < 10^4/65536 ≈ 0.15 and the min over 4 independent
    // rows makes an inflated probe ~0.15^4 ≈ 5e-4 likely — essentially all
    // 10 probes should be exact; requiring at least half exact leaves slack
    // while still failing on a broken min/bucket fold (systematic inflation).
    assert(out.count(r => r.getLong(3) == 0L) >= 5, s"too much overcount")
  }

  // ---- q_stat_kmv_distinct ------------------------------------------------

  test("kmv: exact when domain < k (sf0.001)") {
    val r = SparkEntry.queries("q_stat_kmv_distinct")(spark, sf0001).head()
    val k = r.getLong(0)
    assert(k < 256L, "sf0.001 custkey domain should be under k")
    assert(r.getDouble(2) == k.toDouble)
    assert(r.getLong(3) == k)
  }

  test("kmv: estimate within 25% of exact at sf0.1") {
    val r = SparkEntry.queries("q_stat_kmv_distinct")(spark, sf01).head()
    val est = r.getDouble(2)
    val truth = r.getLong(3).toDouble
    assert(truth > 256.0, "sf0.1 domain should exceed k")
    assert(math.abs(est - truth) / truth <= 0.25,
      s"KMV est $est vs true $truth")
  }
}
