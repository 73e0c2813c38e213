package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 batch-3 invariants: the Hilbert walk's mathematical contract
  * (bijection + unit-step continuity on the full grid) and its locality
  * advantage over Z-order, RRF score self-consistency, and a covariance
  * spot-check against a direct two-column aggregation.
  */
class Round12CSpec extends SparkTestBase {
  import spark.implicits._

  test("hilbert index is a bijection with unit steps on the full 256x256 grid") {
    val grid = spark.range(0L, 65536L)
      .select(($"id" % 256L).as("x"), expr("id div 256").as("y"))
    val hd = graft.operators.Layout.withHilbertD(grid)
    // Bijection: 65536 distinct hd values covering exactly 0..65535.
    val agg = hd.agg(countDistinct($"hd").as("n"),
      min($"hd").as("lo"), max($"hd").as("hi")).head()
    assert(agg.getLong(0) == 65536L && agg.getLong(1) == 0L &&
      agg.getLong(2) == 65535L)
    // Continuity: consecutive curve positions are grid neighbors —
    // |dx| + |dy| == 1 for every step. (Test-only single-partition
    // window over the 65536-row grid.)
    val w = Window.orderBy($"hd".asc)
    val steps = hd
      .withColumn("px", lag($"x", 1).over(w))
      .withColumn("py", lag($"y", 1).over(w))
      .filter($"px".isNotNull)
      .withColumn("manhattan", abs($"x" - $"px") + abs($"y" - $"py"))
    assert(steps.filter($"manhattan" =!= 1L).count() == 0)
  }

  test("hilbert segments bound locality at least as tightly as z-order") {
    val h = SparkEntry.queries("q_layout_hilbert")(spark, sf0001)
      .agg(sum($"x_span" + $"y_span")).head().getLong(0)
    val z = SparkEntry.queries("q_layout_zorder")(spark, sf0001)
      .agg(sum($"x_span" + $"y_span")).head().getLong(0)
    assert(h <= z, s"hilbert total span $h > zorder $z")
  }

  test("rrf scores recompute from the reported arm ranks") {
    val out = SparkEntry.queries("q_retrieval_hybrid_rrf")(spark, sf0001)
      .collect()
    assert(out.nonEmpty && out.length <= 10)
    out.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val sem = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(lex.nonEmpty || sem.nonEmpty)
      assert(lex.forall(k => k >= 1 && k <= 20) &&
        sem.forall(k => k >= 1 && k <= 20))
      val expected = lex.map(k => 1000000L / (60L + k)).getOrElse(0L) +
        sem.map(k => 1000000L / (60L + k)).getOrElse(0L)
      assert(r.getLong(3) == expected, s"rrf_s mismatch at doc ${r.getLong(0)}")
    }
    // Final ranking is by fused score (doc_id tiebreak) and 1..k dense.
    assert(out.map(_.getLong(4)).toSeq == (1L to out.length))
    val ordered = out.map(r => (-r.getLong(3), r.getLong(0))).toSeq
    assert(ordered == ordered.sorted)
  }

  test("covariance top pair matches a direct two-column aggregation") {
    val top = SparkEntry.queries("q_vec_covariance")(spark, sf0001).head()
    val (i, j) = (top.getLong(0).toInt, top.getLong(1).toInt)
    val direct = Catalog.load(spark, sf0001, "embeddings")
      .select(
        expr(s"cast(floor(cast(element_at(embedding, $i) as double) * 1000000) as long)").as("a"),
        expr(s"cast(floor(cast(element_at(embedding, $j) as double) * 1000000) as long)").as("b"))
      .agg(
        count(lit(1)).as("n"),
        sum(($"a" * $"b").cast("decimal(38,0)")).as("sab"),
        sum($"a".cast("decimal(38,0)")).as("ta"),
        sum($"b".cast("decimal(38,0)")).as("tb"))
      .select(($"n" * $"sab" - $"ta" * $"tb").cast("long").as("c"))
      .head().getLong(0)
    // cov_num is BIGINT since round 13 (grader decimal-hash hardening).
    assert(top.getLong(2) == direct)
  }
}
