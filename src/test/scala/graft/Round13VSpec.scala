package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-24 invariant: the streamed rollup refresh equals the
  * batch-built rollup row-for-row.
  */
class Round13VSpec extends SparkTestBase {
  import spark.implicits._

  test("q_stream_mv_refresh equals the batch monthly rollup") {
    val got = SparkEntry.queries("q_stream_mv_refresh")(spark, sf0001)
      .collect().toSeq
    val want = Catalog.load(spark, sf0001, "lineitem")
      .groupBy($"l_returnflag", month($"l_shipdate").cast("long").as("mon"))
      .agg(count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("long")).as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"mon".asc_nulls_first)
      .collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
