package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Dsl.dsum

/** Unit coverage for the three queries that landed in the round-8 snapshot
  * commit with oracle rows only (q_graph_degree_hist, q_join_skew_salted,
  * q_ts_downsample_ohlc): each is checked here against an INDEPENDENT
  * formulation of the same invariant, on sf0.001, so a refactor that breaks
  * one shows up before the driver's sf0.01 oracle run.
  */
class SnapshotQueriesSpec extends SparkTestBase {
  import spark.implicits._

  test("q_graph_degree_hist: degrees sum to 2|E| and nodes to |V| of an independently built graph") {
    // Rebuild the co-purchase edge set from scratch (urgent (custkey, day)
    // distinct → same-day pairs a<b distinct) — the oracle CTE's shape,
    // sharing no code with GraphOps.
    val urgent = Catalog.load(spark, sf0001, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c"), date_trunc("day", $"o_orderdate").as("day"))
      .distinct()
    val edges = urgent.as("x").join(urgent.as("y"), Seq("day"))
      .filter($"x.c" < $"y.c")
      .select($"x.c".as("a"), $"y.c".as("b"))
      .distinct()
    val nEdges = edges.count()
    val nNodes = edges.select($"a".as("n")).union(edges.select($"b")).distinct().count()
    assert(nEdges > 0, "fixture must produce a non-empty graph")

    val hist = SparkEntry.queries("q_graph_degree_hist")(spark, sf0001)
    val (degSum, nodeSum) = hist
      .agg(sum($"degree" * $"n_nodes").cast("long"), sum($"n_nodes").cast("long"))
      .as[(Long, Long)].head()
    assert(degSum == 2 * nEdges, s"handshake lemma: degree mass $degSum != 2*|E|=${2 * nEdges}")
    assert(nodeSum == nNodes, s"histogram covers $nodeSum nodes, graph has $nNodes")
  }

  test("q_join_skew_salted: exactly the plain unsalted join's result") {
    // The salting invariant the oracle enforces at sf0.01, locally: the
    // (key, salt) join with a replicated dim must reproduce the plain
    // equi-join bit-for-bit (count is integer, revenue is dsum-exact).
    val li = Catalog.load(spark, sf0001, "lineitem")
    val supp = Catalog.load(spark, sf0001, "supplier")
    val expected = li.select($"l_suppkey", $"l_extendedprice")
      .join(supp.select($"s_suppkey".as("l_suppkey"), $"s_nationkey"), Seq("l_suppkey"))
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_items"), dsum($"l_extendedprice").as("revenue"))
      .orderBy($"s_nationkey".asc_nulls_first)
      .as[(Long, Long, Double)].collect().toSeq

    val got = SparkEntry.queries("q_join_skew_salted")(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("q_ts_downsample_ohlc: open/close pick the week-boundary days, high/low the extrema") {
    // Independent formulation: first_value/last_value over a day-ordered
    // window per week (vs the query's min_by/max_by). `day` is unique after
    // the daily aggregation, so both are deterministic.
    val daily = Catalog.load(spark, sf0001, "orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(dsum($"o_totalprice").as("rev"))
      .withColumn("week", date_trunc("week", $"day"))
    val w = Window.partitionBy($"week").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val expected = daily
      .withColumn("week", $"week".cast("date"))
      .withColumn("open", first($"rev").over(w))
      .withColumn("close", last($"rev").over(w))
      .groupBy($"week")
      .agg(
        count(lit(1)).as("n_days"),
        first($"open").as("open"),
        max($"rev").as("high"),
        min($"rev").as("low"),
        first($"close").as("close"))
      .orderBy($"week".asc_nulls_first)
      .as[(java.sql.Date, Long, Double, Double, Double, Double)].collect().toSeq

    val got = SparkEntry.queries("q_ts_downsample_ohlc")(spark, sf0001)
      .as[(java.sql.Date, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.nonEmpty && got == expected)
    // Sanity on the bar shape itself: low <= open/close <= high every week.
    got.foreach { case (wk, _, open, high, low, close) =>
      assert(low <= open && open <= high && low <= close && close <= high, s"bar invariant at $wk")
    }
  }
}
