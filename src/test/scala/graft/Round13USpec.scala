package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-22 invariants: the Borůvka forest equals an in-memory
  * Kruskal at two SFs, and the try_-family audit is internally coherent.
  */
class Round13USpec extends SparkTestBase {
  import spark.implicits._

  private def kruskal(sfDir: String): Map[Long, (Long, Long, Long)] = {
    val urgent = Catalog.load(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey", date_trunc("day", $"o_orderdate"))
      .distinct().collect()
      .map(x => (x.getLong(0), x.getTimestamp(1)))
    val edges = urgent.toSeq.groupBy(_._2).values.flatMap { g =>
      val cs = g.map(_._1)
      for (a <- cs; b <- cs if a < b) yield (a, b)
    }.toSet.toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.foreach(n => parent(n) = n)
    val byW = edges.map { case (u, v) =>
      val w = 1L + java.lang.Math.floorMod(u + v, 7L)
      ((w << 42) + (u << 21) + v, u, v, w)
    }.sortBy(_._1)
    val mst = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    byW.foreach { case (_, u, v, w) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; mst += ((u, v, w)) }
    }
    // Group by final component, labeled by its minimum node id.
    val comp = nodes.map(n => n -> find(n)).toMap
    val label = comp.groupBy(_._2).flatMap { case (_, ns) =>
      val m = ns.keys.min
      ns.keys.map(_ -> m)
    }
    val nNodes = label.groupBy(_._2).view.mapValues(_.size.toLong)
    val eStats = mst.groupBy(e => label(e._1)).view
      .mapValues(es => (es.size.toLong, es.map(_._3).sum))
    nNodes.map { case (c, n) =>
      val (ne, tw) = eStats.getOrElse(c, (0L, 0L))
      c -> ((n, ne, tw))
    }.toMap
  }

  test("q_graph_mst equals an in-memory Kruskal at two SFs") {
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val got = SparkEntry.queries("q_graph_mst")(spark, sf)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val want = kruskal(sf)
      assert(got == want, s"MSF mismatch at $sf: got ${got.size} comps, " +
        s"want ${want.size}")
      // Forest invariant: per component, edges = nodes - 1.
      got.foreach { case (c, (n, e, _)) =>
        assert(e == n - 1, s"component $c: $e edges for $n nodes")
      }
    }
  }

  test("q_sql_try_functions: null counts match the deterministic rules") {
    val r = SparkEntry.queries("q_sql_try_functions")(spark, sf0001).head()
    val keys = Catalog.load(spark, sf0001, "orders")
      .select($"o_orderkey").collect().map(_.getLong(0))
    assert(r.getLong(0) == keys.length)
    assert(r.getLong(1) == keys.count(_ % 7 == 0)) // div null
    assert(r.getLong(3) == keys.count(_ % 3 == 0)) // ts null
    assert(r.getLong(4) == keys.count(k => k % 4 == 2 || k % 4 == 3))
    assert(r.getLong(6) == keys.count(_ % 5 == 0)) // add overflow null
  }
}
