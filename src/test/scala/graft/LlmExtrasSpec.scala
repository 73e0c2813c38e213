package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the training-data extras that the oracle match
  * can't express: what each operator is supposed to be SENSITIVE to.
  */
class LlmExtrasSpec extends SparkTestBase {
  import spark.implicits._

  private def fingerprintOf(texts: Seq[String]): Seq[Long] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("fp_docs")
    val norm = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' '))"
    spark.sql(s"""
      WITH toks AS (
        SELECT doc_id, posexplode(split($norm, ' ')) AS (pos, tok) FROM fp_docs)
      SELECT doc_id, sum((pos + 1) *
        ((31 * length(tok) +
          aggregate(transform(split(tok, ''), c -> cast(ascii(c) as bigint)), 0L, (a, x) -> a + x))
         * 2654435761L % 1000000007L)) % 1000000007L AS fp
      FROM toks GROUP BY doc_id ORDER BY doc_id""")
      .select($"fp").as[Long].collect().toSeq
  }

  test("fingerprint is order-sensitive; SimHash-style bag hashing is not") {
    val Seq(a, b, c) = fingerprintOf(Seq(
      "alpha beta gamma delta",
      "delta gamma beta alpha", // same bag, different order
      "alpha beta gamma delta"))
    assert(a == c, "identical text must fingerprint identically")
    assert(a != b, "token order must change the fingerprint")
  }

  test("cosine of a vector with its negation is -1; orthogonal is 0") {
    val df = Seq((Array(1.0f, 2.0f, -3.0f))).toDF("v")
    val neg = df.select(expr("graft_cosine(v, transform(v, x -> -x))")).as[Double].head()
    assert(math.abs(neg + 1.0) < 1e-12)
  }

  test("salted aggregation equals direct aggregation") {
    val direct = Catalog.load(spark, sf0001, "events")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
    val salted = SparkEntry.queries("q_agg_salted_skew")(spark, sf0001)
      .select($"event_type", $"n")
    assert(salted.except(direct).isEmpty && direct.except(salted).isEmpty)
  }

  test("IVF search space is a subset of brute force but finds in-cell neighbors") {
    val ivf = SparkEntry.queries("q_sim_ann_ivf")(spark, sf0001)
      .select($"probe_id", $"cand_id")
    // Every IVF hit shares the probe's assigned cell by construction — check
    // the join produced only same-cell candidates.
    val e = Catalog.load(spark, sf0001, "embeddings")
      .select($"vec_id", $"label")
    val bad = ivf
      .join(e.withColumnRenamed("vec_id", "cand_id").withColumnRenamed("label", "cl"), "cand_id")
      .join(SparkEntry.queries("q_sim_ann_ivf")(spark, sf0001)
        .select($"probe_id", $"cell").distinct(), "probe_id")
      .filter($"cl" =!= $"cell")
    assert(bad.isEmpty)
    assert(ivf.count() > 0)
  }

  test("IVF serve: second probe batch touches ONLY the index leaves") {
    // Resolve the leaves once (the build — q_sim_ann_ivf pays it).
    SparkEntry.queries("q_sim_ann_ivf")(spark, sf0001).count()
    val serve = SparkEntry.queries("q_sim_ann_ivf_serve")(spark, sf0001)
    val plan = serve.queryExecution.optimizedPlan.toString
    // No centroid recompute: the avg-per-dimension aggregation must be
    // absent — centroids arrive as a checkpointed LogicalRDD leaf.
    assert(!plan.contains("avg("), plan.take(2000))
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"))
    // Disjoint probe batches: serve answers 10..19, build answered 0..9.
    val probes = serve.select($"probe_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(probes.nonEmpty && probes.forall(p => p >= 10L && p < 20L))
  }

  test("rate source streams rows (streaming source capability)") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "50").load()
      .writeStream.format("memory").queryName("rate_sink")
      .outputMode("append")
      .start()
    try {
      // Wait until at least one batch lands.
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      while (spark.table("rate_sink").isEmpty && System.nanoTime < deadline) {
        Thread.sleep(200)
      }
      assert(!spark.table("rate_sink").isEmpty)
      assert(spark.table("rate_sink").columns.toSet == Set("timestamp", "value"))
    } finally q.stop()
  }
}
