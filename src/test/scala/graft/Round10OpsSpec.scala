package graft

/** Round-10 additions: type-widening schema evolution and the quantile
  * sketch pipeline.
  */
class Round10OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("q_source_schema_widening upcasts INT32 to BIGINT and null-fills v1") {
    val df = SparkEntry.queries("q_source_schema_widening")(spark, sf0001)
    assert(df.schema("s_suppkey").dataType ==
      org.apache.spark.sql.types.LongType)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // Even keys came from the INT32 generation without s_acctbal.
    assert(rows.filter(_.getLong(0) % 2 == 0).forall(_.isNullAt(2)))
    assert(rows.filter(_.getLong(0) % 2 == 1).forall(!_.isNullAt(2)))
  }

  test("mergeSchema cannot reconcile conflicting primitive types (why the explicit schema)") {
    val d = java.nio.file.Files.createTempDirectory("graft_widen_").toString
    Seq((1, "a")).toDF("k", "v").write.parquet(s"$d/v1")
    Seq((2L, "b")).toDF("k", "v").write.parquet(s"$d/v2")
    val e = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(s"$d/v1", s"$d/v2").collect()
    }
    assert(e.getMessage.contains("CANNOT_MERGE_SCHEMAS") ||
      e.toString.contains("CANNOT_MERGE_SCHEMAS"), e.toString.take(300))
    // The explicit-schema path reads the same two generations fine.
    val widened = spark.read.schema("k BIGINT, v STRING")
      .parquet(s"$d/v1", s"$d/v2").orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(widened == Seq((1L, "a"), (2L, "b")))
  }
}
