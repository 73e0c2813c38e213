package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.DsV2

/** The DataSourceV2 connector surface (SURVEY §2.A,
  * q_source_dsv2_range): filter pushdown tightens the scan bounds AND
  * skips grid partitions; column pruning survives an empty projection;
  * reported statistics reflect the pushed range; the scan is complete
  * and exact.
  */
class DsV2Spec extends SparkTestBase {
  import spark.implicits._

  private def deepScan(p: org.apache.spark.sql.execution.SparkPlan)
      : Option[BatchScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      deepScan(a.executedPlan)
    case b: BatchScanExec => Some(b)
    case other => other.children.flatMap(deepScan).headOption
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    deepScan(df.queryExecution.executedPlan)
      .getOrElse(fail("no BatchScanExec in plan"))

  test("range filters push into the source and skip grid partitions") {
    val df = DsV2.rangeDf(spark, 0L, 2000000L, 16)
      .filter($"id" >= 250000L && $"id" < 1750000L)
    val scan = scanOf(df)
    // Bounds tightened source-side (description carries [lo, hi)).
    assert(scan.scan.description().contains("GraftRange[250000, 1750000)"))
    // 12 of the 16 grid chunks intersect the band; edges are clipped.
    assert(scan.inputRDD.getNumPartitions == 12)
    assert(df.count() == 1500000L)
    // No residual Filter above the scan for fully-pushed predicates.
    val hasFilter = df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.isDefined
    assert(!hasFilter)
  }

  test("non-range predicates stay post-scan; scan is exact") {
    val df = DsV2.rangeDf(spark, 0L, 1000L, 4)
      .filter($"id" % 2 === 0 && $"id" >= 500L)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("GraftRange[500, 1000)"))
    assert(df.count() == 250L)
    assert(df.agg(sum($"id")).as[Long].head() ==
      (500L until 1000L).filter(_ % 2 == 0).sum)
  }

  test("empty projection (count star) streams zero-field rows") {
    val df = DsV2.rangeDf(spark, 10L, 110L, 3)
    assert(df.count() == 100L)
    val scan = scanOf(df.groupBy().count())
    assert(scan.scan.readSchema().isEmpty)
  }

  test("reported statistics reflect the pushed range") {
    val df = DsV2.rangeDf(spark, 0L, 2000000L, 16)
      .filter($"id" < 4000L)
    val scan = scanOf(df)
    val stats = scan.scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong == 4000L)
    assert(stats.sizeInBytes().getAsLong == 32000L)
  }

  test("contradictory bounds plan an empty scan, not a crash") {
    val df = DsV2.rangeDf(spark, 0L, 100L, 4)
      .filter($"id" >= 90L && $"id" < 10L)
    assert(df.count() == 0L)
  }
}
