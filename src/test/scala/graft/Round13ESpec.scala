package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-5 invariants: exact-AUC replay against a brute-force
  * pair count, MRR reciprocal-rank arithmetic, the multi-feature OLS
  * normal equations re-checked by substitution, and Naive-Bayes
  * probability mass consistency.
  */
class Round13ESpec extends SparkTestBase {
  import spark.implicits._

  test("q_eval_auc equals the brute-force concordant-pair count") {
    val out = SparkEntry.queries("q_eval_auc")(spark, sf0001).collect()
    assert(out.nonEmpty)
    val base = Catalog.load(spark, sf0001, "orders")
      .join(Catalog.load(spark, sf0001, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment",
        ($"c_acctbal".cast("decimal(12,2)") * 100).cast("long"),
        when($"o_totalprice" > 150000, 1L).otherwise(0L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.foreach { r =>
      val seg = r.getString(0)
      val rows = base.filter(_._1 == seg)
      val pos = rows.filter(_._3 == 1L).map(_._2)
      val neg = rows.filter(_._3 == 0L).map(_._2)
      assert(r.getLong(1) == pos.length.toLong)
      assert(r.getLong(2) == neg.length.toLong)
      // 2U = 2*concordant + ties (each pos-neg pair contributes 2, 1, 0).
      val twoU = (for (p <- pos; n <- neg) yield
        if (p > n) 2L else if (p == n) 1L else 0L).sum
      assert(r.getLong(3) == twoU)
      assert(r.getLong(4) == 2L * pos.length * neg.length)
      if (pos.nonEmpty && neg.nonEmpty)
        assert(r.getLong(5) == twoU * 1000000L / (2L * pos.length * neg.length))
    }
  }

  test("q_eval_mrr: rr is the exact scaled reciprocal of the first rank") {
    val out = SparkEntry.queries("q_eval_mrr")(spark, sf0001).collect()
    assert(out.length == 8)
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.getLong(2) == 0L)
      else {
        val rank = r.getLong(1)
        assert(rank >= 1L && rank <= 10L)
        assert(720720L % rank == 0L)
        assert(r.getLong(2) == 720720L / rank)
      }
    }
  }

  test("q_stat_regression_multi: Gram det >= 0 and normal equations hold") {
    val out = SparkEntry.queries("q_stat_regression_multi")(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    val base = Catalog.load(spark, sf0001, "orders")
      .join(Catalog.load(spark, sf0001, "customer"),
        $"o_custkey" === $"c_custkey")
      .selectExpr("cast(c_nationkey as long)",
        "cast(month(o_orderdate) as long)",
        "((cast(cast(c_acctbal as decimal(12,2)) * 100 as bigint)" +
          " + 1000000) div 100000) - 10",
        "cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)" +
          " div 100000")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    out.foreach { r =>
      val (nk, n) = (r.getLong(0), r.getLong(1))
      val g = base.filter(_._1 == nk)
      assert(n == g.length.toLong)
      // Gram determinant of [1 x1 x2] is non-negative.
      assert(r.getLong(2) >= 0L)
      // Cramer solution solves the first normal equation exactly:
      // d0*n + d1*sx1 + d2*sx2 == det*sy  (multiply through by det).
      val (sx1, sx2, sy) = (g.map(_._2).sum, g.map(_._3).sum, g.map(_._4).sum)
      assert(BigInt(r.getLong(3)) * n + BigInt(r.getLong(4)) * sx1 +
        BigInt(r.getLong(5)) * sx2 == BigInt(r.getLong(2)) * sy)
    }
  }

  test("q_feat_gini_gain: reconciles with the stump's cost units") {
    val out = SparkEntry.queries("q_feat_gini_gain")(spark, sf0001).collect()
    assert(out.map(_.getString(0)).toSet == Set("month", "nation", "balbin"))
    out.foreach { r =>
      // Multi-way child cost never exceeds the parent cost by more than
      // the per-bin truncation slack (1 unit per bin).
      assert(r.getLong(4) >= -r.getLong(1))
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
    }
    // Ordered by gain descending.
    val gains = out.map(_.getLong(4)).toSeq
    assert(gains == gains.sortBy(-_))
  }

  test("q_dedup_span_removal: islands are maximal, disjoint, in-range") {
    val out = SparkEntry.queries("q_dedup_span_removal")(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nSpans, removed, nToks, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // Each island covers >= 5 tokens; disjoint islands fit the doc.
      assert(nSpans >= 1L && removed >= 5L * nSpans && removed <= nToks)
      assert(kept == (nToks - removed) * 1000000L / nToks)
    }
    // Every reported doc really shares a 5-gram with another doc: replay
    // on the driver for the smallest fixture.
    val docs = Catalog.load(spark, sf0001, "documents")
      .select($"doc_id",
        split(org.apache.spark.sql.functions.trim(
          regexp_replace(regexp_replace(lower($"text"), "[^a-z0-9 ]", " "),
            " +", " ")), " ").as("toks"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val spanDocs = docs.flatMap { case (id, toks) =>
      toks.sliding(5).filter(_.size == 5).map(w => (w.mkString(" "), id))
    }
    val dupSpans = spanDocs.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.size >= 2).keySet
    val affected = spanDocs.filter(p => dupSpans(p._1)).map(_._2).distinct
    assert(out.map(_.getLong(0)).toSet == affected.toSet)
  }

  test("q_ml_naive_bayes: smoothing arithmetic and ordering") {
    val out = SparkEntry.queries("q_ml_naive_bayes")(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= 50)
    val toks = Catalog.load(spark, sf0001, "documents")
      .select($"lang", explode(split($"text", " ")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val v = toks.map(_._2).distinct.length.toLong
    val byClass = toks.groupBy(_._1).map { case (l, g) => l -> g.length.toLong }
    out.foreach { r =>
      val (lang, tok, c) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(toks.count(t => t._1 == lang && t._2 == tok).toLong == c)
      assert(r.getLong(3) == (c + 1L) * 1000000L / (byClass(lang) + v))
    }
    // Ranked by raw count descending.
    val cs = out.map(_.getLong(2)).toSeq
    assert(cs == cs.sortBy(-_))
  }
}
