package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import java.util.OptionalLong

import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.{Q, QueryPack}

/** SURVEY.md §2.A — CUSTOM DataSourceV2 TABLE PROVIDER (round 13): a
  * deterministic generated long-range table (`id` ∈ [start, end)) wired
  * through the full connector surface rather than an RDD or an in-memory
  * relation:
  *
  *  - `SupportsPushDownFilters`: range comparisons on `id` TIGHTEN the
  *    scan's [lo, hi) bounds source-side and are reported as pushed;
  *    anything else stays a post-scan filter. Pushdown here is not
  *    cosmetic — `planInputPartitions` splits the TIGHTENED range, so a
  *    selective predicate plans fewer partitions (the spec asserts both
  *    the narrowed `description()` and the reduced partition count).
  *  - `SupportsPushDownRequiredColumns`: an empty projection (count(*))
  *    streams zero-field rows.
  *  - `SupportsReportStatistics`: exact row count + 8 B/row size AFTER
  *    pushdown, so AQE/join planning sees the filtered cardinality —
  *    the stats hook CBO needs from a V2 source.
  *
  * This is the house pattern for generated dimensions at 100 TB (date
  * scaffolds, sequence spines for gap-fill): the generator runs
  * per-partition on executors — no driver materialization, no shuffle —
  * and slices are contiguous, so a downstream range join on `id` sees
  * sorted partitions. Spark's own built-in Range exists; the point of
  * this class is the graded CONNECTOR surface (provider → table → scan
  * builder → batch → reader) a library must expose to host external
  * systems, exercised end-to-end by `q_source_dsv2_range`.
  */
class GraftRangeProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftRangeTable(
      opts.getLong("start", 0L),
      opts.getLong("end", 0L),
      opts.getInt("numPartitions", 8))
  }
}

object GraftRangeTable {
  val Schema: StructType = StructType(Seq(StructField("id", LongType, false)))
}

final class GraftRangeTable(start: Long, end: Long, numParts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range($start, $end)"
  override def schema(): StructType = GraftRangeTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(start, end, numParts)
}

final class GraftRangeScanBuilder(start: Long, end: Long, numParts: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var lo = start
  private var hi = end
  private var pushed = Array.empty[Filter]
  private var required = GraftRangeTable.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftRangeScan(start, end, lo, math.max(lo, hi), numParts,
      required.isEmpty)
}

final case class GraftRangeSlice(lo: Long, hi: Long, emitField: Boolean)
    extends InputPartition

final class GraftRangeScan(start: Long, end: Long, lo: Long, hi: Long,
    numParts: Int, empty: Boolean)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType =
    if (empty) new StructType() else GraftRangeTable.Schema
  override def description(): String = s"GraftRange[$lo, $hi)"
  override def toBatch: Batch = this

  /** The partition grid anchors to the ORIGINAL [start, end) — pushdown
    * SKIPS non-intersecting chunks (file/row-group-skipping semantics)
    * and clips the boundary ones, so a selective predicate plans fewer
    * partitions rather than re-slicing the survivors finer. */
  override def planInputPartitions(): Array[InputPartition] = {
    val n = end - start
    if (n <= 0 || hi <= lo) return Array.empty
    val parts = math.min(numParts.toLong, n).toInt
    (0 until parts).flatMap { i =>
      val cLo = math.max(start + n * i / parts, lo)
      val cHi = math.min(start + n * (i + 1) / parts, hi)
      if (cLo < cHi) Some(GraftRangeSlice(cLo, cHi, !empty)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftRangeReaderFactory

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(0L, hi - lo) * 8L)
    override def numRows(): OptionalLong = OptionalLong.of(math.max(0L, hi - lo))
  }
}

object GraftRangeReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[GraftRangeSlice]
    new PartitionReader[InternalRow] {
      private var cur = s.lo - 1
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        if (s.emitField) 1 else 0)
      override def next(): Boolean = { cur += 1; cur < s.hi }
      override def get(): InternalRow = {
        if (s.emitField) row.update(0, cur)
        row
      }
      override def close(): Unit = ()
    }
  }
}

/** The graded query over the connector (fixture-independent by design —
  * like the scratch-writing §A roundtrips, it grades a SOURCE
  * capability, not fixture content). */
object DsV2 extends QueryPack {

  private[graft] def rangeDf(spark: SparkSession, start: Long, end: Long,
      parts: Int): DataFrame =
    spark.read.format("graft.sources.GraftRangeProvider")
      .option("start", start.toString)
      .option("end", end.toString)
      .option("numPartitions", parts.toString)
      .load()

  /** Read 2M generated ids across 16 source partitions, push a
    * [250k, 1.75M) band INTO the source (12 of the 16 grid chunks
    * intersect and get planned, the band edges clipped — asserted by
    * spec), aggregate mod-7 residue classes. */
  private def sourceDsv2Range(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    rangeDf(spark, 0L, 2000000L, 16)
      .filter($"id" >= 250000L && $"id" < 1750000L)
      .groupBy(($"id" % 7).as("g"))
      .agg(count(lit(1)).as("n"), sum($"id").as("s"))
      .orderBy($"g".asc_nulls_first)
  }

  private val sourceDsv2RangeOracle = """
    SELECT CAST(range % 7 AS BIGINT) AS g, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(range) AS BIGINT) AS s
    FROM range(0, 2000000)
    WHERE range >= 250000 AND range < 1750000
    GROUP BY 1
    ORDER BY g ASC NULLS FIRST"""

  override val queries: Vector[Q] = Vector(
    Q("q_source_dsv2_range", sourceDsv2Range, Some(sourceDsv2RangeOracle)),
  )
}
