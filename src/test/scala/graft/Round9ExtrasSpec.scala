package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the late-round-9 additions (CDC apply, bounded BFS,
  * HLL sketch pipeline): independent formulations / invariants on sf0.001.
  */
class Round9ExtrasSpec extends SparkTestBase {
  import spark.implicits._

  test("q_cdc_apply: matches a max_by formulation and tombstones deletes") {
    // Independent formulation: per-key max_by over the total (ts, event_id)
    // order instead of the query's row_number window.
    val log = Catalog.load(spark, sf0001, "events")
      .select($"user_id", $"ts", $"event_id", $"value",
        when($"event_type" === "signup", "I")
          .when($"event_type" === "error", "D")
          .otherwise("U").as("op"))
      .withColumn("ord", struct($"ts", $"event_id"))
    val expected = log.groupBy($"user_id")
      .agg(
        max_by($"op", $"ord").as("final_op"),
        max_by($"ts", $"ord").as("last_ts"),
        max_by($"value", $"ord").as("last_value"),
        count(lit(1)).as("n_changes"))
      .filter($"final_op" =!= "D")
      .orderBy($"user_id")
      .as[(Long, String, java.sql.Timestamp, Double, Long)].collect().toSeq

    val got = SparkEntry.queries("q_cdc_apply")(spark, sf0001)
      .as[(Long, String, java.sql.Timestamp, Double, Long)].collect().toSeq
    assert(got.nonEmpty && got == expected)
    // Tombstoned keys really are absent: every user whose LAST op is a
    // delete must not appear.
    assert(got.forall(_._2 != "D"))
  }

  test("q_graph_bfs: source at distance 0, neighbors at 1, edge-wise triangle inequality") {
    val urgent = Catalog.load(spark, sf0001, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c"), date_trunc("day", $"o_orderdate").as("day"))
      .distinct()
    val edges = urgent.as("x").join(urgent.as("y"), Seq("day"))
      .filter($"x.c" < $"y.c")
      .select($"x.c".as("a"), $"y.c".as("b")).distinct()
      .as[(Long, Long)].collect().toSeq
    val source = edges.flatMap(e => Seq(e._1, e._2)).min

    val got = SparkEntry.queries("q_graph_bfs")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got(source) == 0L, "source must be at distance 0")
    assert(got.values.forall(d => d >= 0 && d <= 6))
    // Every neighbor of the source is at distance exactly 1.
    val srcNbrs = edges.collect {
      case (a, b) if a == source => b
      case (a, b) if b == source => a
    }.toSet
    srcNbrs.foreach(n => assert(got(n) == 1L, s"neighbor $n of source"))
    // Triangle inequality over edges: reached endpoints differ by <= 1 hop
    // unless one side sits exactly on the horizon.
    edges.foreach { case (a, b) =>
      (got.get(a), got.get(b)) match {
        case (Some(da), Some(db)) => assert(math.abs(da - db) <= 1)
        case (Some(da), None) => assert(da == 6, s"unreached $b adjacent to d=$da")
        case (None, Some(db)) => assert(db == 6, s"unreached $a adjacent to d=$db")
        case _ => ()
      }
    }
  }

  test("q_agg_sketch_hll: estimates within 10% of exact distinct counts") {
    val exact = Catalog.load(spark, sf0001, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val exactAll = Catalog.load(spark, sf0001, "events")
      .select($"user_id").distinct().count()

    val got = SparkEntry.queries("q_agg_sketch_hll")(spark, sf0001)
      .as[(String, Long)].collect().toMap
    assert(got.keySet == exact.keySet + "ALL")
    (exact + ("ALL" -> exactAll)).foreach { case (k, n) =>
      val est = got(k)
      assert(math.abs(est - n) <= math.max(1, n / 10),
        s"$k: estimate $est vs exact $n")
    }
  }
}
