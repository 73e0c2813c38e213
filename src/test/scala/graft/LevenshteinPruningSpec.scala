package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The banded edit-distance optimizer rule (plans/LevenshteinPruning):
  * fires on bounded predicates, never on value context, and preserves
  * three-valued semantics including NULLs and the always-false band.
  */
class LevenshteinPruningSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    ("kitten", "sitting"),   // distance 3
    ("cold rod", "cold rod"), // 0
    ("cold rod", "blue rod"), // 4
    ("a", "abcdefgh"),        // 7 — length guard kills it at k<=6
    (null, "x"),              // NULL propagates
    ("x", null))

  test("rewrites lev <= k to a length guard plus the banded threshold form") {
    // A file scan keeps the filter alive through optimization (literal
    // input would be constant-folded into a LocalRelation).
    val df = Catalog.load(spark, sf0001, "part")
      .filter(levenshtein($"p_name", lit("cold rod")) <= 3)
      .select($"p_partkey", $"p_name")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("levenshtein(p_name#") && opt.contains("Some(3)"),
      s"threshold form missing in:\n$opt")
    assert(opt.contains("abs((length(p_name#"),
      s"length guard missing in:\n$opt")
    // Semantics on literal rows (evaluated through the same rule).
    val kept = rows.toDF("a", "b").filter(levenshtein($"a", $"b") <= 3)
      .as[(String, String)].collect().toSet
    assert(kept == Set(("kitten", "sitting"), ("cold rod", "cold rod")))
  }

  test("lev < k and boundary/NULL semantics survive the rewrite") {
    def keep(k: Column => Column): Set[(String, String)] =
      rows.toDF("a", "b").filter(k(levenshtein($"a", $"b")))
        .as[(String, String)].collect().toSet
    assert(keep(_ < 4) == Set(("kitten", "sitting"), ("cold rod", "cold rod")))
    assert(keep(_ <= 0) == Set(("cold rod", "cold rod")))
    assert(keep(_ < 0) == Set.empty) // always-false band left alone
    assert(keep(_ <= 7) == rows.filter(r => r._1 != null && r._2 != null).toSet)
  }

  test("value context (projection) is left untouched") {
    val df = rows.toDF("a", "b")
      .select((levenshtein($"a", $"b") <= 3).as("flag"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains(", 3) >= 0"), s"projection rewritten in:\n$opt")
  }
}
