package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-4 invariants: assortativity moment replay, nprobe
  * recall-curve monotonicity + recomposition from the graded nprobe
  * query, and the simhash-eval confusion matrix reconciled against the
  * two graded dedup queries it compares.
  */
class Round13DSpec extends SparkTestBase {
  import spark.implicits._

  test("assortativity moments replay from the driver-side adjacency") {
    val out = SparkEntry.queries("q_graph_assortativity")(spark, sf0001)
      .collect()
    assert(out.length == 1)
    val r = out.head
    val urgent = Catalog.load(spark, sf0001, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey", date_trunc("day", $"o_orderdate"))
      .distinct().collect()
      .map(x => (x.getLong(0), x.getTimestamp(1)))
    val und = urgent.toSeq.groupBy(_._2).values.flatMap { g =>
      val cs = g.map(_._1)
      for (a <- cs; b <- cs if a != b) yield (a, b)
    }.toSet[(Long, Long)]
    val deg = und.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val m = und.size.toLong
    val sd = und.toSeq.map(e => deg(e._1)).sum
    val sdd = und.toSeq.map(e => deg(e._1) * deg(e._2)).sum
    val sd2 = und.toSeq.map(e => deg(e._1) * deg(e._1)).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (m, sd, sdd, sd2))
    assert(r.getLong(4) == m * sdd - sd * sd)
    assert(r.getLong(5) == m * sd2 - sd * sd)
    if (r.getLong(5) != 0L)
      assert(r.getDouble(6) == r.getLong(4).toDouble / r.getLong(5).toDouble)
  }

  test("recall curve is monotone and matches the graded nprobe=2 query") {
    val curve = SparkEntry.queries("q_sim_ann_recall_curve")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(curve.forall(_._2 == 30L))
    // Nested cells => recall can only grow with nprobe.
    assert(curve.map(_._3).toSeq == curve.map(_._3).sorted.toSeq)
    curve.foreach(r => assert(r._4 == r._3 * 1000000L / 30L))
    // The nprobe=2 point must equal the overlap of the graded
    // q_sim_ann_ivf_nprobe output (trained cells, nprobe=2, top-3) with
    // the exact bruteforce@3 ground truth.
    val ann2 = SparkEntry.queries("q_sim_ann_ivf_nprobe")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val gt = SparkEntry.queries("q_sim_knn_bruteforce")(spark, sf0001)
      .collect().filter(_.getLong(3) <= 3L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(curve.find(_._1 == 2L).get._3 == gt.intersect(ann2).size.toLong)
  }

  test("simhash eval reconciles with the two graded dedup queries") {
    val r = SparkEntry.queries("q_dedup_simhash_eval")(spark, sf0001)
      .collect().head
    val (n, tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(tp + fp + fn + tn == n)
    assert(n == Catalog.load(spark, sf0001, "documents").count())
    // Positives under simhash = is_dup flags of the graded simhash query.
    val simDups = SparkEntry.queries("q_dedup_simhash")(spark, sf0001)
      .collect().count(_.getBoolean(4)).toLong
    assert(tp + fp == simDups)
    // Positives under exact = sum over canonical classes of (size - 1),
    // from the graded exact-dedup query.
    val exactDups = SparkEntry.queries("q_dedup_exact")(spark, sf0001)
      .collect().map(_.getLong(2) - 1L).sum
    assert(tp + fn == exactDups)
    if (tp + fp > 0) assert(r.getLong(5) == tp * 1000000L / (tp + fp))
    if (tp + fn > 0) assert(r.getLong(6) == tp * 1000000L / (tp + fn))
  }
}
