package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the id registered in `SparkEntry.queries`, the Spark
  * implementation, and (for oracle-checkable queries, SURVEY.md §2) the
  * equivalent DuckDB SQL over the same parquet tables. Capability-only
  * queries (sketches, LSH, …) carry `oracle = None`.
  */
final case class Q(
    id: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** A category of declared queries (one object per SURVEY.md §2 letter). */
trait QueryPack {
  def queries: Vector[Q]
}
