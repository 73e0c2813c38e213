package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Catalog, Q, QueryPack}

/** Order row as a typed view — the typed API surface of SURVEY §1.3. */
case class OrderRow(
    o_orderkey: Long,
    o_custkey: Long,
    o_orderstatus: String,
    o_totalprice: Double,
    o_orderpriority: String)

/** SURVEY §1.3 typed-API surface: `Dataset[T]` transformations with
  * case-class encoders where type safety helps, landing back in a DataFrame
  * for the graded output.
  *
  * Scale notes: typed `filter`/`map` lambdas deserialize rows into objects
  * (slower than Catalyst expressions, which is why the rest of the library
  * prefers columns), but `groupByKey(...).agg(typed columns)` keeps the
  * aggregation itself in the expression domain — this query exists to prove
  * the surface, and its scaladoc records the cost model.
  */
object TypedOps extends QueryPack {

  private def typedDataset(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Catalog.load(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderpriority")
      .as[OrderRow]
    val urgent = orders
      .filter((o: OrderRow) => o.o_orderpriority == "1-URGENT" && o.o_totalprice > 100000.0)
      .map((o: OrderRow) => (o.o_custkey, o.o_orderkey,
        math.round(o.o_totalprice * 0.1 * 100.0) / 100.0))
    urgent.toDF("custkey", "orderkey", "commission")
      .orderBy($"orderkey".asc_nulls_first)
  }

  override val queries: Vector[Q] = Vector(
    Q("q_typed_dataset", typedDataset, Some("""
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        round(o_totalprice * 0.1, 2) AS commission
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 100000.0
      ORDER BY orderkey ASC NULLS FIRST""")),
  )
}
