package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Tiny table catalog: fixture tables are self-describing parquet files under
  * a scale-factor directory (see FIXTURES.md). At 100 TB these would be
  * partitioned directories / catalog tables — `load` is the single indirection
  * point where that swap happens, so no query hard-codes a layout.
  */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(tableNames.contains(name), s"unknown table $name")
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), read as raw nanos (the
      // session sets spark.sql.legacy.parquet.nanosAsLong at construction —
      // see graft.Sessions) and truncated to micros with integer division
      // (`div`, exact on longs — a double division would lose precision at
      // 1.7e18). DuckDB truncates ns→µs identically, so the oracle sees the
      // same values.
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
