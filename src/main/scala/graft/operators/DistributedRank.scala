package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking primitives that never funnel the data through a
  * single partition — the scale-safe replacement for `Window.orderBy(...)`
  * with no `partitionBy` (which Spark executes as one task holding the whole
  * input).
  *
  * Shape: range-repartition on the sort key (contiguous key ranges per
  * partition), rank within each partition, then add per-partition offsets
  * computed from the tiny (|partitions|-row) count table joined back via
  * broadcast. Global rank = offset + local rank, exact for any total order —
  * range boundaries only affect balance, never correctness.
  */
object DistributedRank {

  /** Appends `out` = exact ntile(k) over the given total order.
    * Matches SQL `ntile(k) OVER (ORDER BY sortCols)` bit-for-bit: first
    * n%k tiles get ceil(n/k) rows. Requires n >= k (true for any fixture
    * dimension here) and a tie-free sort order.
    */
  def ntileExact(df: DataFrame, k: Int, sortCols: Seq[Column], out: String,
                 buckets: Int = 32): DataFrame = {
    val keep = df.columns.toSeq
    val part = df.repartitionByRange(buckets, sortCols: _*)
      .withColumn("__bkt", spark_partition_id())
    val ranked = part.withColumn("__rn",
      row_number().over(Window.partitionBy(col("__bkt")).orderBy(sortCols: _*))
        .cast("long"))
    // |buckets| rows: the one ordered-only window here is over ~32 rows.
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
      // (n div k)+1 rows, the rest n div k.
      .withColumn(out, expr(s"""CAST(CASE
          WHEN __r <= (__n % $k) * ((__n div $k) + 1)
          THEN (__r - 1) div ((__n div $k) + 1) + 1
          ELSE (__n % $k) + (__r - (__n % $k) * ((__n div $k) + 1) - 1) div (__n div $k) + 1
        END AS BIGINT)"""))
      .select((keep :+ out).map(col): _*)
  }
}
