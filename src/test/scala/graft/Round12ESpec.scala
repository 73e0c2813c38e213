package graft

import org.apache.spark.sql.functions._

/** Round-12 batch-6 invariants: incremental MV refresh reads only the
  * delta from the fact table, the RA link score keeps the de-weaked
  * no-|E|-broadcast posture, and the group-aware split is leakage-free
  * by construction (no near-dup pair crosses the train/test boundary).
  */
class Round12ESpec extends SparkTestBase {
  import spark.implicits._

  test("mv incremental: delta filter pushed down, one fact scan, leaf merged") {
    val p = SparkEntry.queries("q_mv_incremental")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      p.take(2000))
    // Exactly ONE parquet relation scan: the stale side arrives as a
    // checkpoint leaf (Scan ExistingRDD), never a second fact scan.
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 fact scan, got $scans:\n${p.take(2000)}")
    assert(p.contains("Scan ExistingRDD"), p.take(2000))
  }

  test("ra link score: shuffled joins only, top-k operator, exact weights") {
    val df = SparkEntry.queries("q_graph_link_ra")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    // Since the round-19 hot-only salting, link_ra carries COUNT-GATED
    // LeftSemi/LeftAnti broadcasts of the hub-key set (≤ 2|E|/threshold
    // rows by Markov, 5M-row gate with a merge fallback) — the same
    // sanctioned exception PlanPropertiesSpec allows for
    // common_neighbors. The wedge, anti-, and weight joins themselves
    // must stay non-broadcast.
    val badBroadcasts = p.linesIterator
      .filter(_.contains("BroadcastHashJoin"))
      .filterNot(l => l.contains("LeftSemi") || l.contains("LeftAnti"))
      .toList
    assert(badBroadcasts.isEmpty,
      s"RA joins must not broadcast edge/degree tables: $badBroadcasts\n$p")
    assert(p.contains("ShuffledHashJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // Every returned score is a positive exact ppm, and no returned pair
    // is an existing edge (the anti-join contract).
    assert(rows.forall(r => r.getLong(r.fieldIndex("ra_ppm")) > 0L))
  }

  test("group-aware split: no near-dup pair crosses a split boundary") {
    val splits = SparkEntry.queries("q_split_group_aware")(spark, sf0001)
      .collect()
    val totalDocs = splits.map(_.getLong(1)).sum
    val nDocs = Catalog.load(spark, sf0001, "documents").count()
    assert(totalDocs == nDocs, s"split must partition the corpus: " +
      s"$totalDocs vs $nDocs")

    // Rebuild the per-doc split (same component labels + Knuth hash) and
    // assert every near-dup pair lands with both ends in ONE split — the
    // leakage the doc-level split cannot rule out.
    val comp = SparkEntry.queries("q_graph_components")(spark, sf0001)
      .select($"doc_id", $"component_id")
    val h = ($"component_id".bitwiseAND(lit(2147483647L)) * lit(2654435761L)) %
      lit(4294967296L)
    val tagged = comp.select($"doc_id",
      when(h < 3435973836L, "train")
        .when(h < 3865470566L, "val")
        .otherwise("test").as("split"))
    val pairs = SparkEntry.queries("q_dedup_near")(spark, sf0001)
      .select($"doc_a", $"doc_b")
    val crossing = pairs
      .join(tagged.select($"doc_id".as("doc_a"), $"split".as("sa")), Seq("doc_a"))
      .join(tagged.select($"doc_id".as("doc_b"), $"split".as("sb")), Seq("doc_b"))
      .filter($"sa" =!= $"sb")
      .count()
    assert(crossing == 0L, s"$crossing near-dup pairs cross splits")
  }
}
