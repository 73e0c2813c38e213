package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-3 invariants: depth-2 tree growth consistency with the
  * stump, an exact driver-side perceptron replay, out-of-fold encoding
  * algebra, l-diversity recompute, and ANN recall-eval recomposition from
  * its two already-graded constituent retrievals.
  */
class Round13CSpec extends SparkTestBase {
  import spark.implicits._

  test("depth2 root is the stump argmin; children partition the corpus") {
    val d2 = SparkEntry.queries("q_ml_tree_depth2")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(d2.map(_._1).sorted.toSeq == Seq("L", "R", "root"))
    val root = d2.find(_._1 == "root").get
    val stumpTop = SparkEntry.queries("q_ml_tree_stump")(spark, sf0001)
      .collect().head
    assert((root._2, root._3, root._8) ==
      (stumpTop.getString(0), stumpTop.getLong(1), stumpTop.getLong(6)))
    // Child populations partition the root's: nl+nr of L plus nl+nr of R
    // equals the root's total, and likewise for positives.
    val l = d2.find(_._1 == "L").get
    val r = d2.find(_._1 == "R").get
    assert(l._4 + l._6 + r._4 + r._6 == root._4 + root._6)
    assert(l._5 + l._7 + r._5 + r._7 == root._5 + root._7)
    // The routed left-child population is exactly the root's left count.
    assert(l._4 + l._6 == root._4)
  }

  test("perceptron epochs replay exactly driver-side") {
    val out = SparkEntry.queries("q_ml_perceptron")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val rows = Catalog.load(spark, sf0001, "orders")
      .join(Catalog.load(spark, sf0001, "customer"),
        $"o_custkey" === $"c_custkey")
      .select(
        when($"o_totalprice" > 150000, 1L).otherwise(-1L),
        month($"o_orderdate").cast("long"),
        $"c_nationkey".cast("long"),
        expr("(cast(c_acctbal * 100 as long) + 100000) div 75000"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    var w = Array(0L, 0L, 0L, 0L)
    val expect = (1 to 3).map { e =>
      val mis = rows.filter { case (y, x1, x2, x3) =>
        y * (w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3) <= 0
      }
      w = Array(
        w(0) + mis.map(_._1).sum,
        w(1) + mis.map(m => m._1 * m._2).sum,
        w(2) + mis.map(m => m._1 * m._3).sum,
        w(3) + mis.map(m => m._1 * m._4).sum)
      (e.toLong, w(0), w(1), w(2), w(3), mis.length.toLong)
    }
    assert(out.toSeq == expect)
    assert(out.head._6 == rows.length.toLong) // epoch 1: w=0 => all mis
  }

  test("oof target encoding: marginals close and fold exclusion holds") {
    val out = SparkEntry.queries("q_feat_target_encode_cv")(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.nonEmpty)
    val cells = Catalog.load(spark, sf0001, "orders")
      .join(Catalog.load(spark, sf0001, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long"), ($"o_custkey" % 5),
        when($"o_totalprice" > 300000.0, 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCat = cells.groupBy(_._1)
    val byFold = cells.groupBy(_._2)
    val (nTot, kTot) = (cells.length.toLong, cells.map(_._3).sum)
    out.foreach { case (cat, fold, nOof, kOof, enc) =>
      val cat_ = byCat(cat)
      val cell = cat_.filter(_._2 == fold)
      assert(nOof == cat_.length - cell.length)
      assert(kOof == cat_.map(_._3).sum - cell.map(_._3).sum)
      val nF = byFold(fold).length.toLong
      val kF = byFold(fold).map(_._3).sum
      val prior = (kTot - kF).toDouble / (nTot - nF)
      assert(enc == (kOof + 20.0 * prior) / (nOof + 20.0))
      assert(enc > 0.0 && enc < 1.0)
    }
  }

  test("l-diversity flags exactly the homogeneous classes") {
    val out = SparkEntry.queries("q_pii_ldiversity")(spark, sf0001).collect()
      .map(r => ((r.getInt(0).toLong, r.getLong(1), r.getString(2)),
        (r.getLong(3), r.getLong(4))))
    val groups = Catalog.load(spark, sf0001, "orders")
      .join(Catalog.load(spark, sf0001, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long"),
        (year($"o_orderdate") * 100 + month($"o_orderdate")).cast("long"),
        $"c_mktsegment", $"o_orderpriority")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getString(2)),
        r.getString(3)))
      .groupBy(_._1)
      .map { case (k, vs) =>
        k -> (vs.length.toLong, vs.map(_._2).distinct.length.toLong)
      }
    val expect = groups.filter(_._2._2 < 3)
    assert(out.toMap == expect)
    assert(out.length == expect.size)
  }

  test("recall eval recomposes from bruteforce@3 and the ivf probe") {
    val eval = SparkEntry.queries("q_sim_ann_recall_eval")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(eval.length == 10 && eval.map(_._1).toSeq == (0L until 10L))
    eval.foreach { case (_, nGt, nHit, ppm) =>
      assert(nGt == 3L && nHit >= 0L && nHit <= 3L)
      assert(ppm == nHit * 1000000L / 3L)
    }
    // Ground truth = the graded bruteforce top-5 cut to rank<=3; ANN =
    // the graded IVF probe. The eval must equal their per-probe overlap.
    val gt = SparkEntry.queries("q_sim_knn_bruteforce")(spark, sf0001)
      .collect().filter(_.getLong(3) <= 3L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SparkEntry.queries("q_sim_ann_ivf")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = gt.intersect(ann).groupBy(_._1).map { case (p, s) =>
      p -> s.size.toLong
    }
    eval.foreach { case (p, _, nHit, _) =>
      assert(nHit == overlap.getOrElse(p, 0L))
    }
  }

  test("rolling slope replays from a driver-side window walk") {
    val out = SparkEntry.queries("q_ts_rolling_slope")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    val daily = Catalog.load(spark, sf0001, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(sum(($"o_totalprice".cast("decimal(14,2)") * 100).cast("long"))
        .as("y"))
      .select(datediff($"day", lit("1970-01-01").cast("date")).cast("long"),
        $"y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val expect = daily.sliding(7).filter(_.length == 7).map { w =>
      val (sx, sy) = (w.map(_._1).sum, w.map(_._2).sum)
      val sxy = w.map(p => p._1 * p._2).sum
      val sxx = w.map(p => p._1 * p._1).sum
      (w.last._1, w.last._2, 7 * sxy - sx * sy, 7 * sxx - sx * sx)
    }.toSeq
    assert(out.toSeq == expect)
    out.foreach(r => assert(r._4 > 0L)) // distinct days => positive den
  }

  test("eigencentrality: s1 is degree, s2/s3 replay the matvec") {
    val out = SparkEntry.queries("q_graph_eigencentrality")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 20)
    assert(out.map(_._4).toSeq == out.map(_._4).sortBy(-_).toSeq)
    // Rebuild the co-purchase adjacency driver-side.
    val urgent = Catalog.load(spark, sf0001, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey", date_trunc("day", $"o_orderdate"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    val adj: Map[Long, Set[Long]] = urgent.toSeq.groupBy(_._2).values
      .flatMap { g =>
        val cs = g.map(_._1)
        for (a <- cs; b <- cs if a != b) yield (a, b)
      }.toSet[(Long, Long)]
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val s1 = adj.map { case (k, ns) => k -> ns.size.toLong }
    val s2 = adj.map { case (k, ns) => k -> ns.toSeq.map(s1).sum }
    val s3 = adj.map { case (k, ns) => k -> ns.toSeq.map(s2).sum }
    out.foreach { case (node, a, b, c) =>
      assert(a == s1(node) && b == s2(node) && c == s3(node))
    }
    // Top-20 selection is the true (s3 desc, node asc) cut.
    val expectTop = s3.toSeq.sortBy { case (n, v) => (-v, n) }.take(20)
    assert(out.map(r => (r._1, r._4)).toSeq == expectTop)
  }
}
