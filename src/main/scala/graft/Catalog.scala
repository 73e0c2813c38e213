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
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    // Fixture generations have shipped time columns three ways: parquet
    // TIMESTAMP(NANOS) (read as raw nanos longs — the session sets
    // spark.sql.legacy.parquet.nanosAsLong at construction, see
    // graft.Sessions), plain TIMESTAMP(MICROS) with isAdjustedToUTC=false
    // (read as TIMESTAMP_NTZ), and adjusted micros (TIMESTAMP_LTZ). This is
    // the single normalization point: every query downstream sees session-tz
    // TIMESTAMP. The session timezone is pinned to UTC, so NTZ→LTZ is a
    // value-exact relabel, and the nanos→micros truncation uses integer
    // `div` (exact on longs; a double division would lose precision at
    // 1.7e18). DuckDB truncates ns→µs identically, so the oracle sees the
    // same values either way.
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.LongType if f.name == "ts" =>
          df.withColumn(f.name, expr(s"timestamp_micros(${f.name} div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn(f.name, expr(s"cast(${f.name} as timestamp)"))
        case _ => df
      }
    }
  }
}
