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

  test("SURVEY §2 declarations equal the registry (set-diff both ways)") {
    // The round-5 and round-8 audits each caught silent declaration drift
    // (implemented-but-undeclared queries); this automates that set-diff.
    // Only the ID cell (first column) of §2 table rows counts — prose
    // references to sibling queries inside description cells do not.
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val declared = text.linesIterator
      .filter(_.startsWith("| `q_"))
      .flatMap { line =>
        val cell = line.split("\\|")(1)
        "q_[a-z0-9_]+".r.findAllIn(cell)
      }.toSet
    val registered = SparkEntry.all.map(_.id).toSet
    val missing = declared -- registered
    val undeclared = registered -- declared
    assert(missing.isEmpty && undeclared.isEmpty,
      s"missing from registry: ${missing.toSeq.sorted.mkString(",")}; " +
        s"undeclared in SURVEY: ${undeclared.toSeq.sorted.mkString(",")}")
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
