package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the round-9 additions (corpus curation, link
  * prediction, bitwise scalars, seasonal decomposition): each query is
  * checked against an INDEPENDENT formulation of the same result on
  * sf0.001, so a refactor that breaks one shows up before the driver's
  * sf0.01 oracle run.
  */
class Round9OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** String-shingle rebuild of the df-capped shingle table — the oracle's
    * formulation (strings, window cap), sharing no code with
    * LlmPipeline's hashed leaf.
    */
  private def stringShingles = {
    val docs = Catalog.load(spark, sf0001, "documents")
      .select($"doc_id", split(norm($"text"), " ").as("toks"))
      .filter(size($"toks") >= 5)
      .select($"doc_id", explode(array_distinct(
        transform(sequence(lit(0), size($"toks") - 5),
          i => concat_ws(" ", slice($"toks", i + 1, lit(5)))))).as("shingle"))
    val hot = docs.groupBy($"shingle").agg(count(lit(1)).as("df"))
      .filter($"df" > 100).select($"shingle")
    docs.join(hot, Seq("shingle"), "left_anti")
  }

  test("q_text_decontaminate: matches a string-shingle rebuild of the overlap") {
    val evalIds = Catalog.load(spark, sf0001, "documents")
      .filter($"source" === "src0").select($"doc_id")
    val sh = stringShingles
    val evalSh = sh.join(evalIds, Seq("doc_id")).select($"shingle").distinct()
    val train = sh.join(evalIds, Seq("doc_id"), "left_anti")
    val expected = train.join(evalSh, Seq("shingle"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_overlap"))
      .join(train.groupBy($"doc_id").agg(count(lit(1)).as("n_shingles")), Seq("doc_id"))
      .select($"doc_id", $"n_shingles", $"n_overlap")
      .orderBy($"doc_id")
      .as[(Long, Long, Long)].collect().toSeq

    val got = SparkEntry.queries("q_text_decontaminate")(spark, sf0001)
      .select($"doc_id", $"n_shingles", $"n_overlap")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty, "fixture corpus must contain contaminated docs")
    assert(got == expected)
    // No eval doc may appear in its own removal worklist.
    val evals = evalIds.as[Long].collect().toSet
    assert(got.forall { case (id, _, _) => !evals.contains(id) })
  }

  test("q_text_repetition: matches an explode-based duplicate-gram count") {
    // Independent formulation: explode 3-grams, count total vs distinct per
    // doc (vs the query's per-row array arithmetic).
    val docs = Catalog.load(spark, sf0001, "documents")
      .select($"doc_id", split(norm($"text"), " ").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(
        transform(sequence(lit(0), size($"toks") - 3),
          i => concat_ws(" ", slice($"toks", i + 1, lit(3))))).as("g"))
    val expected = docs.groupBy($"doc_id")
      .agg(round((count(lit(1)) - countDistinct($"g")).cast("double")
        / count(lit(1)), 4).as("dup3"))
      .orderBy($"doc_id").as[(Long, Double)].collect().toSeq

    val rep = SparkEntry.queries("q_text_repetition")(spark, sf0001)
    val got = rep.filter($"n_tokens" >= 3)
      .select($"doc_id", $"dup3_frac")
      .orderBy($"doc_id").as[(Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == expected)
    // Flag definition holds row-by-row.
    val flags = rep.select($"dup2_frac", $"dup3_frac", $"flagged_repetitive")
      .as[(Option[Double], Option[Double], Boolean)].collect()
    flags.foreach { case (d2, d3, f) =>
      assert(f == (d2.exists(_ > 0.5) || d3.exists(_ > 0.3)))
    }
  }

  test("q_corpus_mix: rates hit the smallest domain and sampling is deterministic") {
    val mix = SparkEntry.queries("q_corpus_mix")(spark, sf0001)
    val rows = mix.select($"source", $"n_docs", $"tok_total", $"rate",
      $"n_kept", $"tok_kept")
      .as[(String, Long, Long, Double, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (s, nDocs, tokTotal, rate, nKept, tokKept) =>
      assert(nKept <= nDocs && tokKept <= tokTotal, s"kept exceeds total for $s")
      assert(rate > 0.0 && rate <= 1.0, s"rate out of range for $s")
    }
    // The smallest domain is kept whole (rate 1.0 keeps every hash value).
    val smallest = rows.minBy(_._3)
    assert(smallest._4 == 1.0 && smallest._5 == smallest._2
      && smallest._6 == smallest._3, s"smallest domain not fully kept: $smallest")
    // Deterministic: a second run returns the identical report.
    val again = SparkEntry.queries("q_corpus_mix")(spark, sf0001)
      .select($"source", $"n_docs", $"tok_total", $"rate", $"n_kept", $"tok_kept")
      .as[(String, Long, Long, Double, Long, Long)].collect().toSeq
    assert(again == rows)
  }

  test("q_graph_common_neighbors: matches a collect_set/array_intersect rebuild") {
    // Independent formulation: materialize neighbor SETS per node, pair
    // non-adjacent nodes, intersect the arrays (vs the query's wedge join).
    val urgent = Catalog.load(spark, sf0001, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c"), date_trunc("day", $"o_orderdate").as("day"))
      .distinct()
    val edges = urgent.as("x").join(urgent.as("y"), Seq("day"))
      .filter($"x.c" < $"y.c")
      .select($"x.c".as("a"), $"y.c".as("b")).distinct()
    val und = edges.union(edges.select($"b", $"a"))
    val nbrs = und.groupBy($"a".as("node")).agg(collect_set($"b").as("ns"))
    val expected = nbrs.as("x").join(nbrs.as("y"), $"x.node" < $"y.node")
      .select($"x.node".as("a"), $"y.node".as("b"),
        size(array_intersect($"x.ns", $"y.ns")).cast("long").as("common"),
        size($"x.ns").cast("long").as("deg_a"),
        size($"y.ns").cast("long").as("deg_b"))
      .filter($"common" > 0)
      .join(edges, Seq("a", "b"), "left_anti")
      .withColumn("jaccard_ppm",
        expr("(common * 1000000) div (deg_a + deg_b - common)"))
      .orderBy($"jaccard_ppm".desc, $"a", $"b").limit(20)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

    val got = SparkEntry.queries("q_graph_common_neighbors")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got == expected)
    // Candidate links are genuinely non-adjacent and genuinely connected.
    got.foreach { case (_, _, common, degA, degB, ppm) =>
      assert(common >= 1 && ppm <= 1000000L && common <= math.min(degA, degB))
    }
  }

  test("q_bitwise_funcs: matches JVM two's-complement arithmetic") {
    val got = SparkEntry.queries("q_bitwise_funcs")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (k, band, bor, bxor, bnot, shl3, shr2, pop) =>
      assert(band == (k & 255L))
      assert(bor == (k | 4096L))
      assert(bxor == (k ^ 21845L))
      assert(bnot == ~k)
      assert(shl3 == (k << 3))
      assert(shr2 == (k >> 2))
      assert(pop == java.lang.Long.bitCount(k).toLong)
    }
  }

  test("q_ts_decompose: components reassemble the series and trend gates full windows") {
    val rows = SparkEntry.queries("q_ts_decompose")(spark, sf0001)
      .select($"day", $"revenue", $"trend", $"seasonal", $"residual")
      .as[(java.sql.Timestamp, Double, Option[Double], Double, Option[Double])]
      .collect().toSeq
    val nDays = Catalog.load(spark, sf0001, "orders")
      .select(date_trunc("day", $"o_orderdate")).distinct().count()
    assert(rows.size == nDays)
    // Trend exists exactly where a full 7-day window does (days are a dense
    // enough series that only the 3 boundary rows at each end lack one —
    // in general: null iff the centered window is short).
    val nullTrend = rows.count(_._3.isEmpty)
    assert(nullTrend == 6, s"expected 6 boundary rows without trend, got $nullTrend")
    // Exact reassembly: residual was computed as (revenue - trend) - seasonal
    // in double — replaying the same ops must be bit-identical.
    rows.foreach { case (day, rev, trend, seas, resid) =>
      (trend, resid) match {
        case (Some(t), Some(r)) =>
          assert(r == (rev - t) - seas, s"residual mismatch at $day")
        case (None, None) => ()
        case other => fail(s"trend/residual nullability diverged at $day: $other")
      }
    }
    // Seasonal is a per-dow constant: at most 7 distinct values.
    assert(rows.map(_._4).distinct.size <= 7)
  }
}
