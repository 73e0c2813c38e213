package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.DistributedRank

/** Hand-computed expectations on tiny literal frames — operator semantics
  * independent of the fixture data.
  */
class OperatorUnitSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("Dsl.dsum is an exact decimal sum cast back to double") {
    val df = Seq(0.1, 0.2, 0.3).toDF("x")
    val got = df.agg(Dsl.dsum($"x")).as[Double].head()
    assert(got == 0.6) // decimal path: no 0.6000000000000001
  }

  test("sessionization: 30-minute gap starts a new session") {
    val events = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:20:00")), // 20 min → same session
      (3L, 7L, ts("2024-01-01 10:50:00")), // exactly 30 min → NEW (gap >= 30m)
      (4L, 7L, ts("2024-01-01 11:10:00")), // 20 min → same
      (5L, 8L, ts("2024-01-01 10:00:00"))  // other user → own session
    ).toDF("event_id", "user_id", "ts")
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gap = unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w))
    val got = events
      .withColumn("is_new",
        when(gap.isNull || gap >= lit(1800000000L), 1L).otherwise(0L))
      .withColumn("session_id", sum($"is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("DistributedRank.ntileExact matches the ntile window bit-for-bit") {
    // Tie-heavy data (20 distinct values over 2003 rows) in both sort
    // directions — large enough that inconsistent bucketing between the
    // rank and offset branches would show (the sf0.1 regression class).
    val rng = new scala.util.Random(7)
    val data = (1L to 2003L).map(i => (i, rng.nextInt(20))).toDF("id", "v")
    for (asc <- Seq(true, false)) {
      val order = Seq(if (asc) $"v".asc else $"v".desc, $"id".asc)
      val expected = data.withColumn("nt",
        ntile(5).over(Window.orderBy(order: _*)).cast("long"))
      val got = DistributedRank.ntileExact(data, 5, "v", asc, "id", "nt", buckets = 7)
      assert(got.select($"id", $"nt").except(expected.select($"id", $"nt")).isEmpty
        && expected.select($"id", $"nt").except(got.select($"id", $"nt")).isEmpty,
        s"ntileExact(asc=$asc) diverged from the ntile window")
    }
  }

  test("DistributedRank.ntileExactMulti raises on a null tie key instead of dropping the row") {
    // The multi-column form rejoins slim tile branches with inner USING
    // joins on the tie key — a null key would silently vanish from the
    // output, so the contract (unique AND non-null) is enforced eagerly.
    val data = Seq((Some(1L), 10), (None: Option[Long], 20), (Some(3L), 30))
      .toDF("id", "v")
    val e = intercept[Exception] {
      DistributedRank.ntileExactMulti(data, 2, Seq(("nt", "v", true)), "id")
        .count()
    }
    assert(e.getMessage.contains("must be non-null"),
      s"expected the null-tie guard to fire, got: ${e.getMessage}")
    // Non-null input is untouched: schema order stays input-then-tiles and
    // every row survives.
    val ok = DistributedRank.ntileExactMulti(
      Seq((1L, 10), (2L, 20), (3L, 30)).toDF("id", "v"),
      2, Seq(("nt", "v", true)), "id")
    assert(ok.columns.toSeq == Seq("id", "v", "nt") && ok.count() == 3)
  }

  test("q_stat_gini composite-key guard raises on out-of-domain custkey") {
    // Round-12 guard (round-11 advice): the x*1e6+custkey order key is only
    // order-preserving while custkey < 1e6; a violating domain must fail
    // loudly with the named error, never silently mis-sort.
    val dir = java.nio.file.Files.createTempDirectory("graft_gini_guard_")
    Seq((1000000L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val e = intercept[Exception] {
      SparkEntry.queries("q_stat_gini")(spark, dir.toString).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("q_stat_gini")), msgs(e).mkString(" | "))
  }

  test("q_er_sorted_neighborhood composite-key guard raises on huge partkey") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sn_guard_")
    Seq((16777216L, "widget alpha"), (2L, "widget beta"))
      .toDF("p_partkey", "p_name")
      .write.parquet(s"$dir/part.parquet")
    val e = intercept[Exception] {
      SparkEntry.queries("q_er_sorted_neighborhood")(spark, dir.toString)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("q_er_sorted_neighborhood")),
      msgs(e).mkString(" | "))
  }

  test("near-dup Jaccard: identical shingle sets give 1.0, disjoint give no pair") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),          // identical → jaccard 1.0
      (3L, "z y x w v u t s r q")   // disjoint
    ).toDF("doc_id", "text")
    val toks = split($"text", " ")
    val sh = docs.select($"doc_id",
      explode(array_distinct(transform(sequence(lit(0), size(toks) - 5),
        i => concat_ws(" ", slice(toks, i + 1, lit(5)))))).as("shingle"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a").join(sh.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("da"), $"b.doc_id".as("db"))
      .agg(count(lit(1)).as("ninter"))
      .join(sizes.select($"doc_id".as("da"), $"n".as("na")), "da")
      .join(sizes.select($"doc_id".as("db"), $"n".as("nb")), "db")
      .withColumn("j", $"ninter".cast("double") / ($"na" + $"nb" - $"ninter"))
      .select($"da", $"db", $"j").as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("cosine via zip_with/aggregate matches hand computation") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val got = df.select(
      (dot($"a", $"b") / (sqrt(dot($"a", $"a")) * sqrt(dot($"b", $"b"))))
        .as("c")).as[Double].head()
    assert(math.abs(got - 11.0 / (math.sqrt(5.0) * math.sqrt(25.0))) < 1e-12)
  }

  test("udf feature hash agrees with its oracle arithmetic") {
    // (31*len + sum of char codes) % 100 — the exact SQL-mirrored formula.
    val s = "Customer#000000007"
    val expected = (31L * s.length + s.map(_.toLong).sum) % 100L
    val viaSql = spark.sql(
      s"SELECT (31 * length('$s') + " +
        s"aggregate(transform(split('$s', ''), c -> ascii(c)), 0, (a, x) -> a + x)) % 100")
      .as[Long].head()
    assert(viaSql == expected)
  }

  test("schema rename read: every row mapped, balance non-null in both generations") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_source_schema_rename")(spark, sf0001)
    // The rename projection must recover the balance for EVERY v1 row —
    // a mergeSchema-style union would have left v1's s_acctbal null.
    assert(df.filter(col("s_acctbal").isNull).count() == 0)
    assert(df.filter(col("gen") === "v1" && col("s_suppkey") % 2 =!= 0).count() == 0)
    assert(df.count() ==
      Catalog.load(spark, sf0001, "supplier").count())
  }
}
