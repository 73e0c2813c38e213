package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-10 invariants: bounded-radius SSSP against an in-memory
  * Dijkstra, and t-closeness against an exact BigInt replay.
  */
class Round13JSpec extends SparkTestBase {
  import spark.implicits._

  private val cap = 12L

  private def adjacency(sfDir: String): Map[Long, Seq[(Long, Long)]] = {
    val urgent = Catalog.load(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey", date_trunc("day", $"o_orderdate"))
      .distinct().collect()
      .map(x => (x.getLong(0), x.getTimestamp(1)))
    urgent.toSeq.groupBy(_._2).values.flatMap { g =>
      val cs = g.map(_._1)
      for (a <- cs; b <- cs if a != b) yield (a, b)
    }.toSet[(Long, Long)].toSeq
      .map { case (u, v) => (u, (v, 1L + java.lang.Math.floorMod(u + v, 7L))) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  private def dijkstra(adj: Map[Long, Seq[(Long, Long)]]): Map[Long, Long] = {
    if (adj.isEmpty) return Map.empty
    val src = adj.keys.min
    val dist = scala.collection.mutable.Map(src -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, src))(
      Ordering.by(x => -x._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (dist(u) == d) adj.getOrElse(u, Nil).foreach { case (v, w) =>
        val nd = d + w
        if (nd <= cap && dist.get(v).forall(nd < _)) {
          dist(v) = nd; pq.enqueue((nd, v))
        }
      }
    }
    dist.toMap
  }

  test("q_graph_sssp equals an in-memory Dijkstra ball at two SFs") {
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val got = SparkEntry.queries("q_graph_sssp")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = dijkstra(adjacency(sf))
      assert(got == want, s"sssp mismatch at $sf: " +
        s"got ${got.size} nodes, want ${want.size}")
    }
  }

  test("q_pii_tcloseness equals an exact BigInt replay at sf0.001") {
    val got = SparkEntry.queries("q_pii_tcloseness")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val fact = Catalog.load(spark, sf0001, "orders")
      .join(Catalog.load(spark, sf0001, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long"), $"c_mktsegment",
        $"o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val n = BigInt(fact.length)
    val glob = fact.groupBy(_._3).view.mapValues(x => BigInt(x.length)).toMap
    val want = fact.groupBy(r => (r._1, r._2)).map { case (k, rows) =>
      val ng = BigInt(rows.length)
      val cell = rows.groupBy(_._3).view.mapValues(x => BigInt(x.length))
      val tvNum = glob.map { case (s, cs) =>
        (cell.getOrElse(s, BigInt(0)) * n - cs * ng).abs
      }.sum
      k -> ((rows.length.toLong, (tvNum * 500000 / (ng * n)).toLong))
    }
    assert(got == want)
    // TV distance is a probability-simplex distance: 0 <= tv <= 1.
    assert(got.values.forall(v => v._2 >= 0L && v._2 <= 1000000L))
  }
}
