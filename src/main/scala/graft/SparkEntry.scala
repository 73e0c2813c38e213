package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §0.2 and §2.
  * Each `QueryPack` is one SURVEY §2 category; `queries`/`oracleSql` are
  * assembled from the packs so an id can never be registered on one side
  * without the other being considered.
  */
object SparkEntry {
  private def packs: Vector[QueryPack] = Vector(
    graft.sources.Scans,
    FiltersProjections,
    Joins,
    Aggregations,
    SqlFlavors,
    SqlFlavorsB,
    SortsSetOps,
    graft.functions.Scalars,
    Windows,
    graft.streaming.Streams,
    LlmPipeline,
    LlmExtras,
    CorpusOps,
    TypedOps,
    graft.functions.Udfs,
    Marketing,
    RelationalExtras,
    TimeSeries,
    GraphOps,
    Profiling,
    Governance,
    Retrieval,
    FeatureEng,
    GeoOps,
    BitmapOps,
    KMeansOps,
    PqOps,
    VectorServe,
    SetSimJoin,
    MlTrees,
    MvOps,
    EvalOps,
    AuditStats,
    graft.sources.DsV2,
    LakeOps,
  )

  lazy val all: Vector[Q] = {
    val qs = packs.flatMap(_.queries)
    val dup = qs.groupBy(_.id).collect { case (id, g) if g.size > 1 => id }
    require(dup.isEmpty, s"duplicate query ids: ${dup.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregations.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.id -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.id -> sql.trim)).toMap
}
