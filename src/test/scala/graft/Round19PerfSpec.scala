package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Round-19 OPTIMIZATION specs: the rewrites must be result-invariant, and
  * the slices the fixture data never exercises (hub salting — no fixture
  * graph has a node above the hot threshold) are pinned on synthetic
  * inputs.
  */
class Round19PerfSpec extends SparkTestBase {
  import spark.implicits._

  test("hot-split wedges equal the plain self-join on a hub graph") {
    // Star around node 1 (deg 40 — a hub at any threshold here) plus a
    // sparse tail so the cold slice is non-empty too; both directions
    // present, the und-leaf contract.
    val canon = ((2L to 41L).map(v => (1L, v)) ++
      Seq((50L, 51L), (51L, 52L), (52L, 53L), (50L, 53L))).toSeq
    val und = canon.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("u", "v")
    val deg = und.groupBy($"u".as("node")).agg(count(lit(1)).as("deg"))
    val avg = deg.agg((sum($"deg") cast "long").as("sd"),
      count(lit(1)).as("nv"))
      .select(greatest(expr("sd div nv"), lit(1L)).as("ad"))
    val hot = deg.crossJoin(broadcast(avg))
      .filter($"deg" > lit(8L) * $"ad").select($"node".as("v"))
    assert(hot.count() == 1L, "node 1 must be the single hub")
    def pairCounts(df: org.apache.spark.sql.DataFrame) = df
      .filter($"u" < $"u2").groupBy($"u", $"u2")
      .agg(count(lit(1)).as("c"))
      .orderBy($"u", $"u2").collect().toSeq
    val split = pairCounts(
      GraphOps.hotSplitWedges(und, broadcast(hot), 8))
    val plain = pairCounts(
      und.join(und.select($"u".as("u2"), $"v"), Seq("v"))
        .select($"u", $"u2"))
    assert(split == plain,
      s"hot-split wedge multiset must equal the unsalted self-join")
    assert(split.nonEmpty)
  }

  test("hot-split with an empty hub set degenerates to the plain join") {
    val und = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("u", "v")
    val none = Seq.empty[Long].toDF("v")
    val got = GraphOps.hotSplitWedges(und, broadcast(none), 8)
      .filter($"u" < $"u2").groupBy($"u", $"u2")
      .agg(count(lit(1)).as("c")).collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet == Set((1L, 3L, 1L)))
  }

  test("LPA max_by argmax equals the row_number argmax it replaced") {
    // Ties on the count must resolve to the SMALLEST label (count DESC,
    // label ASC) — the window form's order. Build per-(node,label) counts
    // with deliberate ties and compare both reductions.
    val cnt = Seq(
      (1L, 10L, 3L), (1L, 7L, 3L), (1L, 99L, 1L),   // tie on c=3 → lbl 7
      (2L, 5L, 2L), (2L, 4L, 1L),                   // plain max → lbl 5
      (3L, 8L, 1L), (3L, 6L, 1L), (3L, 7L, 1L)      // all tie → lbl 6
    ).toDF("node", "lbl", "c")
    val viaMaxBy = cnt.groupBy($"node")
      .agg(max_by($"lbl", struct($"c", -$"lbl")).as("lbl"))
      .orderBy($"node").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"node").orderBy($"c".desc, $"lbl".asc)
    val viaWindow = cnt
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"node", $"lbl").orderBy($"node").collect().toSeq
    assert(viaMaxBy == viaWindow)
  }
}
