package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Invariants over the whole declared query surface (SURVEY §2), executed on
  * the sf0.001 fixtures. These are the contract-level guards: every query
  * must be runnable, and graded outputs must be differ-safe.
  */
class RegistrySpec extends SparkTestBase {

  test("t1 smoke: entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared oracle id has a queries entry") {
    val qids = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qids))
  }

  test("no duplicate query ids") {
    assert(SparkEntry.all.map(_.id).distinct.size == SparkEntry.all.size)
  }

  for (q <- SparkEntry.all) {
    test(s"${q.id}: runs at sf0.001 with a differ-safe schema") {
      val df = q.fn(spark, sf0001)
      // The driver's pandas-based differ cannot hash array/map/struct cells —
      // any nested type in an oracle-checked output is a guaranteed failure.
      if (q.oracle.isDefined) {
        val nested = df.schema.fields.filter(f => f.dataType match {
          case _: ArrayType | _: MapType | _: StructType => true
          case _ => false
        })
        assert(nested.isEmpty,
          s"nested-typed output columns would crash the driver differ: " +
            nested.map(_.name).mkString(","))
      }
      assert(df.count() >= 0)
    }
  }
}
