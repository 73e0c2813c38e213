package graft

import org.apache.spark.sql.functions._

/** Round-10 batch-5 operators: ER match scoring, Markov transitions, skew
  * profiling, CUPED. Semantic invariants beyond the oracle hash.
  */
class Batch5Spec extends SparkTestBase {
  import spark.implicits._

  test("er_score: classes consistent with thresholds, pairs canonical") {
    val df = SparkEntry.queries("q_er_score")(spark, sf0001).cache()
    assert(df.filter($"key_a" >= $"key_b").count() == 0)
    // weight bounds: min -7-4-12-3 = -26, max 18+11+25+8 = 62
    assert(df.filter($"score" < -26 || $"score" > 62).count() == 0)
    val bad = df.filter(
      ($"score" >= 40 && $"match_class" =!= "match") ||
      ($"score" >= 15 && $"score" < 40 && $"match_class" =!= "possible") ||
      ($"score" < 15 && $"match_class" =!= "non_match"))
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("path_transitions: each from-row's probabilities sum to 1") {
    val df = SparkEntry.queries("q_path_transitions")(spark, sf0001).cache()
    val sums = df.groupBy($"from_type").agg(sum($"p").as("sp"))
      .collect().map(_.getDouble(1))
    assert(sums.nonEmpty && sums.forall(s => math.abs(s - 1.0) < 1e-9))
    // bigram conservation: total transitions = events - active users
    val n = df.agg(sum($"n")).head().getLong(0)
    val e = Catalog.load(spark, sf0001, "events")
    val expected = e.count() - e.select(countDistinct($"user_id")).head().getLong(0)
    assert(n == expected)
    df.unpersist()
  }

  test("profile_skew: counts descending, cumulative share monotone to <=1") {
    val rows = SparkEntry.queries("q_profile_skew")(spark, sf0001)
      .collect()
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last <= 1.0 + 1e-12 && cums.head > 0.0)
  }

  test("mannwhitney: U matches a sequential midrank replay, bounded by n1*n2") {
    val r = SparkEntry.queries("q_stat_mannwhitney")(spark, sf0001).head()
    val (n1, n2, u) = (r.getAs[Long]("n_urgent"), r.getAs[Long]("n_low"),
      r.getAs[Double]("u_stat"))
    assert(u >= 0.0 && u <= n1.toDouble * n2)
    // Replay the definition sequentially on the fixture sample.
    val rows = Catalog.load(spark, sf0001, "orders")
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .select((($"o_totalprice".cast("decimal(14,2)") * 100).cast("long"))
        .as("v"), ($"o_orderpriority" === "1-URGENT").as("g1"))
      .collect().map(x => (x.getLong(0), x.getBoolean(1)))
    val sorted = rows.sortBy(_._1)
    var i = 0; var r1 = 0.0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val midrank = (i + 1 + j) / 2.0 // average of ranks i+1 .. j
      r1 += sorted.slice(i, j).count(_._2) * midrank
      i = j
    }
    val expectedU = r1 - n1.toDouble * (n1 + 1) / 2.0
    assert(u == expectedU)
  }

  test("cohort ltv: monotone nondecreasing per cohort, age starts at 0") {
    val df = SparkEntry.queries("q_cohort_ltv")(spark, sf0001).cache()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"cohort").orderBy($"age".asc)
    val drops = df.withColumn("prev", lag($"ltv_per_customer_e4", 1).over(w))
      .filter($"prev".isNotNull && $"ltv_per_customer_e4" < $"prev")
    assert(drops.count() == 0)
    // every cohort has its age-0 cell (the first order IS in the cohort month)
    val cohorts = df.select($"cohort").distinct().count()
    assert(df.filter($"age" === 0).count() == cohorts)
    df.unpersist()
  }

  test("stream outer join: emits both matched and watermark-finalized rows") {
    val df = SparkEntry.queries("q_stream_outer_join")(spark, sf0001).cache()
    val unmatched = df.filter($"click_id".isNull)
    assert(df.filter($"click_id".isNotNull).count() > 0)
    assert(unmatched.count() > 0)
    // every finalized-unmatched view's horizon lies below the final
    // global watermark (min of the two sides' maxima, ms-floored, -1s)
    val e = Catalog.load(spark, sf0001, "events")
    def sideMaxMs(t: String) = e.filter($"event_type" === t)
      .agg(max(expr("unix_micros(cast(ts as timestamp)) div 1000")))
      .head().getLong(0)
    val wmMs = math.min(sideMaxMs("view"), sideMaxMs("click")) - 1000L
    val violating = unmatched.filter(
      expr("unix_micros(view_ts) div 1000") + 1800000L >= wmMs)
    assert(violating.count() == 0)
    df.unpersist()
  }

  test("survival km: monotone nonincreasing in (0,1], at-risk telescopes") {
    val rows = SparkEntry.queries("q_survival_km")(spark, sf0001).collect()
    val s = rows.map(_.getAs[Double]("survival"))
    assert(s.head <= 1.0 && s.forall(x => x > 0.0 || x == 0.0))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a })
    // n_at_risk at the first time equals the full population
    assert(rows.head.getAs[Long]("n_at_risk") ==
      Catalog.load(spark, sf0001, "orders")
        .select(countDistinct($"o_custkey")).head().getLong(0))
    // churned never exceeds those ending at t (which never exceed at-risk)
    assert(rows.forall(r => r.getAs[Long]("churned") <=
      r.getAs[Long]("n_at_risk")))
  }

  test("text source: every order line parses back, no malformed rows") {
    val df = SparkEntry.queries("q_source_text_regex")(spark, sf0001).cache()
    assert(df.count() == Catalog.load(spark, sf0001, "orders").count())
    // regexp misses would surface as null keys or empty strings
    assert(df.filter($"o_key".isNull || $"prio" === "" ||
      $"total".isNull || $"log_date" === "").count() == 0)
    df.unpersist()
  }

  test("bootstrap ci: brackets the mean, se positive, replicates balanced") {
    val r = SparkEntry.queries("q_stat_bootstrap_ci")(spark, sf0001).head()
    val (m, se, lo, hi) = (r.getAs[Double]("mean_total"),
      r.getAs[Double]("se"), r.getAs[Double]("ci_low"),
      r.getAs[Double]("ci_high"))
    assert(se > 0.0 && lo < m && m < hi)
    // each replicate's membership hash keeps roughly half the orders
    val n = r.getAs[Long]("n_orders").toDouble
    val sizes = Catalog.load(spark, sf0001, "orders")
      .select(((($"o_orderkey".bitwiseAND(lit(2147483647L)) * lit(2654435761L))
        % lit(4294967296L))).as("h"))
      .select(org.apache.spark.sql.functions.explode(
        sequence(lit(0), lit(31))).as("r"), $"h")
      .filter(expr("shiftright(h, CAST(r AS INT))")
        .bitwiseAND(lit(1L)) === 1L)
      .groupBy($"r").count().collect().map(_.getLong(1))
    assert(sizes.length == 32 &&
      sizes.forall(s => s > n * 0.4 && s < n * 0.6))
  }

  test("cuped: theta global, populations partition customers, adjustment mean-preserving") {
    val rows = SparkEntry.queries("q_stat_cuped")(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("variant")).toSet == Set("A", "B"))
    val thetas = rows.map(_.getAs[Double]("theta")).distinct
    assert(thetas.length == 1) // same global theta on both rows
    val nTotal = rows.map(_.getAs[Long]("n_customers")).sum
    assert(nTotal == Catalog.load(spark, sf0001, "customer").count())
    // CUPED preserves the GLOBAL mean: sum over variants of n*mean_adj
    // equals sum of n*mean_y (the adjustment term has zero global sum).
    def wsum(col: String) =
      rows.map(r => r.getAs[Long]("n_customers") * r.getAs[Double](col)).sum
    assert(math.abs(wsum("mean_y_adj") - wsum("mean_y")) < 0.05 * nTotal)
  }
}
