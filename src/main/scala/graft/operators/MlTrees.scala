package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryPack}
import graft.Dsl._

/** SURVEY.md §2.J3 — HISTOGRAM-BASED SPLIT FINDING (round 13): the
  * distributed-GBDT training core (XGBoost approx / LightGBM): finding a
  * decision-tree split never sorts or re-scans the corpus per candidate —
  * ONE pass builds per-feature (bin, label) HISTOGRAMS (bounded by the
  * bin vocabulary, not the data), and every candidate split's quality is
  * window arithmetic over those histograms. `q_ml_tree_stump` grades the
  * full depth-1 loop: 3 features (order month 1–12, customer nation,
  * account-balance bucket 0–14) × all "f ≤ t" thresholds, scored by the
  * weighted-Gini cost in EXACT integer ppm —
  * cost = (nl²−pl²−ql²)·10⁶ div nl + (nr²−pr²−qr²)·10⁶ div nr —
  * non-negative dividends so Spark `div` ↔ DuckDB `//` agree, identical
  * integers both engines, so the top-10 split ranking is hash-exact (a
  * float Gini would be argmax-fragile at near-ties). n²·10⁶ fits int64
  * to n = 2M rows; the guard fails loudly beyond (the q_stat_gini
  * pattern) — a larger corpus scales the ppm factor down.
  *
  * Scale: the fact⋈dim join is the only wide work; the explode emits 3
  * rows per order into ONE map-side-combined (feature, bin) agg (≤ 52
  * groups); cumulatives are per-feature windows over ≤ 25 rows; deeper
  * trees repeat the same pass per node with rows routed by the parent
  * split — cost is passes × corpus, never corpus × candidates.
  */
object MlTrees extends QueryPack {

  private def treeStump(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = table(spark, sfDir)("orders")
      .join(table(spark, sfDir)("customer"),
        $"o_custkey" === $"c_custkey")
      .select(
        month($"o_orderdate").cast("long").as("f_month"),
        $"c_nationkey".cast("long").as("f_nation"),
        expr("(cast(c_acctbal * 100 as long) + 100000) div 75000")
          .as("f_balbin"),
        when($"o_totalprice" > 150000, 1L).otherwise(0L).as("pos"))
    val hist = base
      .select(explode(array(
        struct(lit("month").as("feature"), $"f_month".as("bin")),
        struct(lit("nation").as("feature"), $"f_nation".as("bin")),
        struct(lit("balbin").as("feature"), $"f_balbin".as("bin")))).as("x"),
        $"pos")
      .groupBy($"x.feature".as("feature"), $"x.bin".as("bin"))
      .agg(count(lit(1)).as("n"), sum($"pos").as("p"))
    val wf = Window.partitionBy($"feature")
    val wc = wf.orderBy($"bin".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("nl", sum($"n").over(wc))
      .withColumn("pl", sum($"p").over(wc))
      .withColumn("tn", sum($"n").over(wf))
      .withColumn("tp", sum($"p").over(wf))
      .filter($"nl" < $"tn")
      .select($"feature", $"bin".as("thr"), $"nl", $"pl",
        ($"tn" - $"nl").as("nr"), ($"tp" - $"pl").as("pr"), $"tn")
      .select($"feature", $"thr", $"nl", $"pl", $"nr", $"pr",
        when($"tn" > 2000000L, raise_error(lit(
          "graft q_ml_tree_stump: n^2*1e6 exceeds int64 beyond 2M rows; " +
            "rescale the ppm factor")))
          .otherwise(
            expr("""(nl * nl - pl * pl - (nl - pl) * (nl - pl)) * 1000000L
                      div nl
                    + (nr * nr - pr * pr - (nr - pr) * (nr - pr)) * 1000000L
                      div nr"""))
          .as("cost_ppm"))
      .orderBy($"cost_ppm".asc, $"feature".asc, $"thr".asc)
      .limit(10)
  }

  private val treeStumpOracle = """
    WITH base AS (
      SELECT CAST(month(o_orderdate) AS BIGINT) AS f_month,
        CAST(c_nationkey AS BIGINT) AS f_nation,
        (CAST(c_acctbal * 100 AS BIGINT) + 100000) // 75000 AS f_balbin,
        CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS pos
      FROM orders JOIN customer ON o_custkey = c_custkey),
    hist AS (
      SELECT feature, bin, count(*) AS n, CAST(sum(pos) AS BIGINT) AS p
      FROM (
        SELECT 'month' AS feature, f_month AS bin, pos FROM base
        UNION ALL SELECT 'nation', f_nation, pos FROM base
        UNION ALL SELECT 'balbin', f_balbin, pos FROM base)
      GROUP BY 1, 2),
    cum AS (
      SELECT feature, bin,
        CAST(sum(n) OVER (PARTITION BY feature ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
        CAST(sum(p) OVER (PARTITION BY feature ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pl,
        CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS tn,
        CAST(sum(p) OVER (PARTITION BY feature) AS BIGINT) AS tp
      FROM hist)
    SELECT feature, bin AS thr, nl, pl, tn - nl AS nr, tp - pl AS pr,
      CAST(CASE WHEN tn > 2000000
        THEN error('graft q_ml_tree_stump: overflow')
        ELSE (nl*nl - pl*pl - (nl-pl)*(nl-pl)) * 1000000 // nl
           + ((tn-nl)*(tn-nl) - (tp-pl)*(tp-pl)
              - ((tn-nl)-(tp-pl))*((tn-nl)-(tp-pl))) * 1000000 // (tn-nl)
        END AS BIGINT) AS cost_ppm
    FROM cum WHERE nl < tn
    ORDER BY cost_ppm ASC, feature ASC, thr ASC
    LIMIT 10"""

  override val queries: Vector[Q] = Vector(
    Q("q_ml_tree_stump", treeStump, Some(treeStumpOracle)),
  )
}
