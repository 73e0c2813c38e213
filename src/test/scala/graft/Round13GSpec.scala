package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-7 invariants: variant navigation type fidelity and
  * collation semantics beyond the oracle hash.
  */
class Round13GSpec extends SparkTestBase {
  import spark.implicits._

  test("q_json_variant: typed navigation reconciles with the flat columns") {
    val out = SparkEntry.queries("q_json_variant")(spark, sf0001).collect()
    assert(out.nonEmpty)
    val flat = Catalog.load(spark, sf0001, "orders")
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(($"o_totalprice".cast("decimal(14,2)") * 100).cast("long"))
          .as("tc"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    out.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(flat(k) == ((r.getLong(2), r.getLong(3))))
    }
    // The variant value is navigated typed: cents arrives as a long
    // (schema check), not a string re-parse.
    val schema = SparkEntry.queries("q_json_variant")(spark, sf0001).schema
    assert(schema("total_cents").dataType.typeName == "long")
  }

  test("q_str_collation: UTF8_LCASE merges the case variants exactly") {
    val r = SparkEntry.queries("q_str_collation")(spark, sf0001)
      .collect().head
    val segs = Catalog.load(spark, sf0001, "customer")
      .select($"c_custkey", $"c_mktsegment").collect()
      .map(x => if (x.getLong(0) % 2 == 0) x.getString(1).toUpperCase
                else x.getString(1).toLowerCase)
    assert(r.getLong(0) == segs.distinct.length.toLong)
    assert(r.getLong(1) == segs.map(_.toLowerCase).distinct.length.toLong)
    assert(r.getLong(2) ==
      segs.count(_.equalsIgnoreCase("building")).toLong)
    assert(r.getLong(3) == segs.count(_ == "BUILDING").toLong)
    // The collated count is strictly coarser on this mixed-case input.
    assert(r.getLong(1) < r.getLong(0))
    assert(r.getLong(3) < r.getLong(2))
  }
}
