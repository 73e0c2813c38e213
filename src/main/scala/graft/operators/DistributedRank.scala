package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking primitives that never funnel the data through a
  * single partition — the scale-safe replacement for `Window.orderBy(...)`
  * with no `partitionBy` (which Spark executes as one task holding the whole
  * input).
  *
  * Shape: bucket each row by LITERAL range boundaries (one `approxQuantile`
  * pass, boundaries embedded in the plan), rank within each bucket, then add
  * per-bucket offsets computed from the tiny (|buckets|-row) count table
  * joined back via broadcast. Global rank = offset + local rank, exact for
  * any total order — boundary placement only affects balance, never
  * correctness, because rows equal on the bucket key always land in the
  * same bucket and buckets respect the sort order.
  *
  * The boundaries MUST be literals: an earlier version bucketed with
  * `repartitionByRange` + `spark_partition_id()`, and the two plan branches
  * (ranks, offsets) re-sampled different boundaries — consistent at small
  * row counts by luck, wrong by a few ranks at sf0.1.
  */
object DistributedRank {

  /** Appends `out` = exact ntile(k) over (`value` asc/desc, `tie` asc).
    * Matches SQL `ntile(k) OVER (ORDER BY value [DESC], tie)` bit-for-bit:
    * first n%k tiles get ceil(n/k) rows. Requires a unique `tie`. NULL values
    * of `value` sort first under asc and last under desc (Spark's default
    * null ordering for each direction), and are bucketed consistently with
    * that order. n < k degrades like SQL ntile (tile = rank, tiles n+1..k
    * empty) instead of dividing by zero.
    *
    * Oracle-parity caveat: DuckDB defaults to NULLS LAST for BOTH directions,
    * so an oracle-checked tile over a NULLABLE ascending column diverges
    * unless the oracle SQL says NULLS FIRST explicitly. Every current call
    * site (RFM recency/frequency/monetary) is non-null by construction.
    */
  def ntileExact(df: DataFrame, k: Int, valueCol: String, ascending: Boolean,
                 tieCol: String, out: String, buckets: Int = 32): DataFrame = {
    // The input plan is evaluated once for the quantile action and once per
    // plan branch (ranks + the broadcast offsets table) — cache it so those
    // passes share one materialization. Callers hand in pre-aggregated
    // inputs orders of magnitude smaller than the raw table.
    val cached = df.cache()
    // One bounded driver-side action: ~(buckets-1) doubles, embedded as
    // literals so every branch of the plan sees identical bucketing.
    val bounds = cached.stat.approxQuantile(valueCol, quantileProbs(buckets), 0.001)
    withNtile(cached, k, valueCol, ascending, tieCol, out, bounds)
  }

  /** Multi-column form: ntile(k) for EVERY (out, value, ascending) spec with
    * ONE `approxQuantile(Array(cols), probs)` pass — one driver action total,
    * where chaining ntileExact costs one per column (r2 bench: 3 sequential
    * quantile jobs in the RFM plan).
    */
  def ntileExactMulti(df: DataFrame, k: Int,
                      specs: Seq[(String, String, Boolean)], tieCol: String,
                      buckets: Int = 32): DataFrame = {
    // Cache the input: without it, each layer's broadcast offsets table
    // re-executes everything beneath it — the base plan ran 7x across the
    // three RFM layers (quantile action + 2 branches x 3 layers, r3 bench
    // ~5 s; cached ~1 s).
    val cached = df.cache()
    val allBounds = cached.stat.approxQuantile(
      specs.map(_._2).toArray, quantileProbs(buckets), 0.001)
    specs.zip(allBounds).foldLeft(cached) {
      case (acc, ((out, value, asc), bounds)) =>
        // Cache between layers too: layer N's offsets branch would otherwise
        // re-execute layers 1..N-1's window+join chain (quadratic re-work).
        withNtile(acc, k, value, asc, tieCol, out, bounds).cache()
    }
  }

  private def quantileProbs(buckets: Int): Array[Double] =
    (1 until buckets).map(_.toDouble / buckets).toArray

  private def withNtile(df: DataFrame, k: Int, valueCol: String,
                        ascending: Boolean, tieCol: String, out: String,
                        rawBounds: Array[Double]): DataFrame = {
    val keep = df.columns.toSeq
    val bounds = rawBounds.distinct
    val v = col(valueCol).cast("double")
    // Strict comparison: rows equal to a boundary all fall on one side, so
    // equal keys always share a bucket and bucket order follows sort order.
    // NULL comparisons are null-safe false, which would silently drop every
    // null into bucket 0 — wrong under desc where Spark sorts nulls LAST, so
    // nulls are routed explicitly to match each direction's null order.
    val nonNullBucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + (if (ascending) when(v > lit(b), 1).otherwise(0)
             else when(v < lit(b), 1).otherwise(0))
    }
    val bucket = when(v.isNull,
        if (ascending) lit(0) else lit(bounds.length))
      .otherwise(nonNullBucket)
    val order = Seq(
      if (ascending) col(valueCol).asc else col(valueCol).desc,
      col(tieCol).asc)
    val ranked = df.withColumn("__bkt", bucket)
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("__bkt")).orderBy(order: _*))
          .cast("long"))
    // |buckets| rows: the one ordered-only window here is over <= 32 rows.
    val wB = Window.orderBy(col("__bkt"))
    val offsets = ranked.groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(wB.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(
        wB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__bkt"), col("__off"), col("__n"))
    ranked.join(broadcast(offsets), "__bkt")
      .withColumn("__r", col("__off") + col("__rn"))
      // ntile(k) of global rank r in n rows: the first n%k tiles have
      // (n div k)+1 rows, the rest n div k. n <= k → tile = rank (guards the
      // n div k = 0 division as well).
      .withColumn(out, expr(s"""CAST(CASE
          WHEN __n <= $k THEN __r
          WHEN __r <= (__n % $k) * ((__n div $k) + 1)
          THEN (__r - 1) div ((__n div $k) + 1) + 1
          ELSE (__n % $k) + (__r - (__n % $k) * ((__n div $k) + 1) - 1) div (__n div $k) + 1
        END AS BIGINT)"""))
      .select((keep :+ out).map(col): _*)
  }
}
