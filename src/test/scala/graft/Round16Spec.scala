package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 gates: the HNSW graph build is structurally non-quadratic
  * (every executed stage plans equi-joins only — the r15 VERDICT #1 fix),
  * and the approximate graph it produces still contains ≥95% of the exact
  * kNN graph's edges, which is the property the serve-recall gate rides on.
  */
class Round16Spec extends SparkTestBase {
  import spark.implicits._

  // ---- HNSW build plan shape (VERDICT r15 task 1) ----

  test("hnsw build: no cartesian / nested-loop join in ANY executed stage") {
    val stages = ArrayBuffer.empty[DataFrame]
    val g = operators.VectorServe.hnswBuildPlan(spark, sf0001,
      df => { stages += df; df.localCheckpoint(true) })
    g.count()
    assert(stages.size >= 2, "seed stage + at least one NN-descent round")
    val plans = stages.map(_.queryExecution.executedPlan.toString) :+
      g.queryExecution.executedPlan.toString
    plans.zipWithIndex.foreach { case (p, i) =>
      assert(!p.contains("CartesianProduct"),
        s"stage $i must not plan a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"stage $i must not plan a nested-loop join — the quadratic " +
          "corpus x corpus shape the r16 build removed")
    }
    // The seeding stage really does join: centroid routing (constant-key
    // broadcast hash) + the cell-bucket equi self-join + two corpus
    // vec_id lookups all live in stage 0's lineage.
    assert(plans.head.contains("BroadcastHashJoin") ||
      plans.head.contains("SortMergeJoin") ||
      plans.head.contains("ShuffledHashJoin"),
      "seed stage must execute hash/merge equi-joins")
  }

  test("hnsw build: approximate graph keeps >=95% of exact kNN edges") {
    // Exact M=8 kNN graph (the r15 quadratic build, acceptable here as a
    // TEST-ONLY oracle at sf0.001 = 500 vectors), symmetrized with the
    // same contract as the production build.
    val q = Catalog.load(spark, sf0001, "embeddings")
      .select($"vec_id",
        transform($"embedding",
          v => floor(v.cast("double") * lit(1000000d)).cast("long")).as("e"))
    def sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)
    val a = q.select($"vec_id".as("src"), $"e".as("se"))
    val b = q.select($"vec_id".as("dst"), $"e".as("de"))
    val w = Window.partitionBy($"src").orderBy($"d2".asc, $"dst".asc)
    val exact = a.join(b, $"src" =!= $"dst")
      .select($"src", $"dst", sq($"se", $"de").as("d2"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 8)
      .select($"src", $"dst")
    val exactSym = exact
      .unionByName(exact.select($"dst".as("src"), $"src".as("dst")))
      .distinct().localCheckpoint(true)
    val approx = operators.VectorServe.hnswBuildPlan(spark, sf0001)
    val hit = exactSym.join(approx, Seq("src", "dst")).count()
    val tot = exactSym.count()
    assert(hit * 100 >= tot * 95,
      s"graph edge recall $hit/$tot must be >= 0.95 — the serve-recall " +
        "gate is only meaningful over a near-exact graph")
  }
}
