package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-7 retrieval/layout pack (SURVEY §2.R) on
  * the sf0.001 fixture — the DuckDB oracle covers value equality; these pin
  * the SEMANTICS (index consistency, score monotonicity, quantization
  * bounds, Z-order locality, median membership) independently.
  */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def q(id: String) =
    SparkEntry.queries(id)(spark, sf0001).cache()

  test("inverted index: df <= cf, first_doc is a real posting, ranks dense") {
    val idx = q("q_text_inverted_index")
    assert(idx.count() == 25)
    assert(idx.filter($"df" > $"cf").count() == 0, "df cannot exceed cf")
    assert(idx.filter($"df" <= 0).count() == 0)
    val ranks = idx.select($"rank").as[Long].collect().sorted
    assert(ranks.sameElements(1L to 25L), "dense rank 1..25")
    // df is non-increasing in rank (the window's ordering key).
    val dfs = idx.orderBy($"rank").select($"df").as[Long].collect()
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b })
  }

  test("bm25: scores positive, non-increasing, hit counts within term set") {
    val r = q("q_text_bm25")
    assert(r.count() == 10)
    val scores = r.orderBy($"rank").select($"bm25_s").as[Long].collect()
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(r.filter($"n_terms_hit" < 1 || $"n_terms_hit" > 3).count() == 0)
  }

  test("tf-idf keywords: <=3 per doc, only sliced docs, tf consistent") {
    val k = q("q_text_keyword_tfidf")
    assert(k.filter($"doc_id" >= 50).count() == 0)
    val perDoc = k.groupBy($"doc_id").count()
    assert(perDoc.filter($"count" > 3).count() == 0)
    assert(k.filter($"tfidf_s" <= 0 || $"tf" <= 0).count() == 0)
  }

  test("quantized dot product: bounded by 255^2*dim, self excluded, top-3") {
    val s = q("q_sim_quantized")
    val dim = Catalog.load(spark, sf0001, "embeddings")
      .select(size($"embedding")).as[Int].head()
    assert(s.filter($"qdot" < 0 || $"qdot" > 255L * 255L * dim).count() == 0)
    assert(s.filter($"probe_id" === $"cand_id").count() == 0)
    val perProbe = s.groupBy($"probe_id").count()
    assert(perProbe.filter($"count" =!= 3).count() == 0)
    assert(perProbe.count() == 10)
  }

  test("z-order bins bound BOTH key spans below the global span") {
    val z = q("q_layout_zorder")
    // Populated bins only (sf0.001's key grid doesn't reach all 16).
    assert(z.count() >= 1 && z.count() <= 16)
    // Every Z-bin of 4096 cells covers a 64x64 tile of the 256x256 key grid
    // (top 4 z-bits = 2 from each dimension) — spans within a bin are < 64
    // wherever a linear sort would leave the trailing key unbounded (~255).
    assert(z.filter($"x_span" > 63 || $"y_span" > 63).count() == 0)
    val totalRows = Catalog.load(spark, sf0001, "orders").count()
    assert(z.agg(sum($"n_rows")).as[Long].head() == totalRows)
  }

  test("equi-depth histogram: tiles partition the table with ~equal counts") {
    val h = q("q_profile_histogram_eqdepth")
    val orders = Catalog.load(spark, sf0001, "orders")
    assert(h.count() == 20)
    assert(h.agg(sum($"n_rows")).as[Long].head() == orders.count())
    val counts = h.select($"n_rows").as[Long].collect()
    assert(counts.max - counts.min <= 1, "SQL-ntile equal-depth property")
    // Tile boundaries are non-decreasing: tile k's hi <= tile k+1's lo.
    val rows = h.orderBy($"tile").select($"lo", $"hi").as[(Double, Double)].collect()
    assert(rows.forall { case (lo, hi) => lo <= hi })
    assert(rows.zip(rows.tail).forall { case ((_, hi), (lo2, _)) => hi <= lo2 })
  }

  test("session stats: totals reconcile with the event table") {
    val s = q("q_session_stats")
    val events = Catalog.load(spark, sf0001, "events")
    assert(s.agg(sum($"n_events")).as[Long].head() == events.count(),
      "sessions partition the events")
    assert(s.filter($"duration_s" < 0).count() == 0)
    assert(s.filter($"n_types" < 1 || $"n_types" > 4).count() == 0)
    // Every (user, session) key is unique and sessions number from 1.
    assert(s.groupBy($"user_id", $"session_id").count()
      .filter($"count" > 1).count() == 0)
    assert(s.groupBy($"user_id").agg(min($"session_id").as("m"))
      .filter($"m" =!= 1).count() == 0)
  }

  test("banded interval join equals the naive theta join") {
    val banded = q("q_join_interval_banded")
    // Naive formulation (the oracle's shape) computed in Spark directly.
    val day = Catalog.load(spark, sf0001, "events")
      .filter($"ts" >= lit("2024-01-05").cast("timestamp") &&
              $"ts" < lit("2024-01-06").cast("timestamp"))
    val p = day.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
    val k = day.filter($"event_type" === "click")
      .select($"event_id".as("k_id"), $"user_id".as("k_user"), $"ts".as("k_ts"))
    val naive = p.join(k, $"k_user" =!= $"p_user" &&
      $"k_ts" > $"p_ts" && $"k_ts" <= $"p_ts" + expr("INTERVAL 5 MINUTE"))
    assert(banded.count() == naive.count())
    assert(banded.join(naive, Seq("p_id", "k_id"), "left_anti").count() == 0)
    // No pair appears twice (a pair matches exactly one exploded bucket).
    assert(banded.groupBy($"p_id", $"k_id").count()
      .filter($"count" > 1).count() == 0)
  }

  test("z-order WRITE: every tile bounds both axes; predicates reach the scan") {
    val dest = graft.operators.Layout.zorderedOrders(spark, sf0001)
    // Skipping proof against the written files themselves: each aligned
    // 64x64 tile bounds BOTH grid keys within span 63 — 4x tighter than
    // the 0..255 global span, on EITHER axis (a linear sort bounds only
    // its leading key).
    val spans = spark.read.parquet(dest)
      .groupBy($"tile")
      .agg(
        (max($"zx") - min($"zx")).as("xs"),
        (max($"zy") - min($"zy")).as("ys"))
      .collect()
    // 16 aligned tiles max; sparse grids at tiny SFs leave some empty.
    assert(spans.nonEmpty && spans.length <= 16)
    spans.foreach { r =>
      assert(r.getLong(1) <= 63 && r.getLong(2) <= 63, r.toString)
    }
    // The 2-D range predicate reaches the parquet scan (row-group min/max
    // stats can skip within files; the z-sort keeps them tight).
    val plan = SparkEntry.queries("q_layout_zorder_write")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("zx"), plan.take(1500))
  }

  test("moving median is a member of its 7-day frame") {
    val m = q("q_win_moving_median")
    // Odd frame count => the median is one of the frame's values; check it
    // lies within the frame's min/max and the output skips the 6-day rampup.
    val daily = Catalog.load(spark, sf0001, "orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(Dsl.dsum($"o_totalprice").as("rev"))
    assert(m.count() == daily.count() - 6)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"day".asc).rowsBetween(-6, 0)
    val framed = daily
      .withColumn("lo", min($"rev").over(w))
      .withColumn("hi", max($"rev").over(w))
      .select($"day", $"lo", $"hi")
    val bad = m.join(framed, Seq("day"))
      .filter($"med7" < $"lo" || $"med7" > $"hi")
    assert(bad.count() == 0)
  }
}
