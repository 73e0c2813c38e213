package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the late-round-9 additions (CDC apply, bounded BFS,
  * HLL sketch pipeline): independent formulations / invariants on sf0.001.
  */
class Round9ExtrasSpec extends SparkTestBase {
  import spark.implicits._

  test("q_cdc_apply: matches a max_by formulation and tombstones deletes") {
    // Independent formulation: per-key max_by over the total (ts, event_id)
    // order instead of the query's row_number window.
    val log = Catalog.load(spark, sf0001, "events")
      .select($"user_id", $"ts", $"event_id", $"value",
        when($"event_type" === "signup", "I")
          .when($"event_type" === "error", "D")
          .otherwise("U").as("op"))
      .withColumn("ord", struct($"ts", $"event_id"))
    val expected = log.groupBy($"user_id")
      .agg(
        max_by($"op", $"ord").as("final_op"),
        max_by($"ts", $"ord").as("last_ts"),
        max_by($"value", $"ord").as("last_value"),
        count(lit(1)).as("n_changes"))
      .filter($"final_op" =!= "D")
      .orderBy($"user_id")
      .as[(Long, String, java.sql.Timestamp, Double, Long)].collect().toSeq

    val got = SparkEntry.queries("q_cdc_apply")(spark, sf0001)
      .as[(Long, String, java.sql.Timestamp, Double, Long)].collect().toSeq
    assert(got.nonEmpty && got == expected)
    // Tombstoned keys really are absent: every user whose LAST op is a
    // delete must not appear.
    assert(got.forall(_._2 != "D"))
  }

  test("q_graph_bfs: source at distance 0, neighbors at 1, edge-wise triangle inequality") {
    val urgent = Catalog.load(spark, sf0001, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c"), date_trunc("day", $"o_orderdate").as("day"))
      .distinct()
    val edges = urgent.as("x").join(urgent.as("y"), Seq("day"))
      .filter($"x.c" < $"y.c")
      .select($"x.c".as("a"), $"y.c".as("b")).distinct()
      .as[(Long, Long)].collect().toSeq
    val source = edges.flatMap(e => Seq(e._1, e._2)).min

    val got = SparkEntry.queries("q_graph_bfs")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got(source) == 0L, "source must be at distance 0")
    assert(got.values.forall(d => d >= 0 && d <= 6))
    // Every neighbor of the source is at distance exactly 1.
    val srcNbrs = edges.collect {
      case (a, b) if a == source => b
      case (a, b) if b == source => a
    }.toSet
    srcNbrs.foreach(n => assert(got(n) == 1L, s"neighbor $n of source"))
    // Triangle inequality over edges: reached endpoints differ by <= 1 hop
    // unless one side sits exactly on the horizon.
    edges.foreach { case (a, b) =>
      (got.get(a), got.get(b)) match {
        case (Some(da), Some(db)) => assert(math.abs(da - db) <= 1)
        case (Some(da), None) => assert(da == 6, s"unreached $b adjacent to d=$da")
        case (None, Some(db)) => assert(db == 6, s"unreached $a adjacent to d=$db")
        case _ => ()
      }
    }
  }

  test("q_basket_pairs: supports recount exactly for the top pairs") {
    val items = Catalog.load(spark, sf0001, "lineitem")
      .select($"l_orderkey".as("basket"), $"l_partkey".as("item"))
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = SparkEntry.queries("q_basket_pairs")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 25)
    // Descending support, ordered pairs.
    assert(got.sliding(2).forall(w => w(0)._3 >= w(1)._3))
    assert(got.forall(p => p._1 < p._2))
    // Exact support recount from the raw baskets for every returned pair.
    got.foreach { case (a, b, s) =>
      val n = items.values.count(set => set(a) && set(b))
      assert(n.toLong == s, s"pair ($a,$b) support $s vs recount $n")
    }
  }

  test("q_er_blocking: in-block pairs only, distance matches an independent DP") {
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val got = SparkEntry.queries("q_er_blocking")(spark, sf0001)
      .as[(String, String, Long, Long, String, String, Int)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.sliding(2).forall(w => w(0)._7 <= w(1)._7))
    got.foreach { case (_, _, ka, kb, na, nb, l) =>
      assert(ka < kb)
      assert(l <= 4 && l == lev(na, nb), s"($ka,$kb): $l vs DP ${lev(na, nb)}")
    }
    // Block integrity: both members really share brand+type in the fixture.
    val brands = Catalog.load(spark, sf0001, "part")
      .select($"p_partkey", $"p_brand", $"p_type")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    got.foreach { case (brand, tpe, ka, kb, _, _, _) =>
      assert(brands(ka) == ((brand, tpe)) && brands(kb) == ((brand, tpe)))
    }
  }

  test("q_seq_pattern: flags and counts match a Scala regex recomputation") {
    val raw = Catalog.load(spark, sf0001, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
    // Full-resolution sort key: getTime alone is millis, but the fixture
    // timestamps carry microseconds (seconds * 1e9 + nanos stays < 2^63).
    val seqs = raw.groupBy(_._1).view.mapValues(
      _.sortBy(e => (e._2.getTime / 1000 * 1000000000L + e._2.getNanos, e._3))
        .map(_._4.head).mkString).toMap
    val got = SparkEntry.queries("q_seq_pattern")(spark, sf0001)
      .as[(Long, Int, Boolean, Long)].collect().toSeq
    assert(got.map(_._1).toSet == seqs.keySet)
    got.foreach { case (u, len, funnel, nvcp) =>
      val s = seqs(u)
      assert(len == s.length)
      assert(funnel == "v[^p]*c[^p]*p".r.findFirstIn(s).isDefined, s"user $u: $s")
      assert(nvcp == "vcp".r.findAllIn(s).size.toLong, s"user $u: $s")
    }
  }

  test("q_join_lateral_topk: matches the window top-k formulation") {
    // Independent formulation: rank orders per nation with a window
    // instead of the correlated LATERAL LIMIT.
    import org.apache.spark.sql.expressions.Window
    val o = Catalog.load(spark, sf0001, "orders")
    val c = Catalog.load(spark, sf0001, "customer")
    val n = Catalog.load(spark, sf0001, "nation")
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val expected = o.join(c, $"o_custkey" === $"c_custkey")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .join(n, $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"o_orderkey", $"o_totalprice")
      .orderBy($"n_name", $"o_totalprice".desc, $"o_orderkey")
      .as[(String, Long, Double)].collect().toSeq
    val got = SparkEntry.queries("q_join_lateral_topk")(spark, sf0001)
      .as[(String, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == expected)
    assert(got.groupBy(_._1).values.forall(_.size <= 2))
  }

  test("q_split_train_test: partitions the corpus, shares near 80/10/10") {
    val total = Catalog.load(spark, sf0001, "documents").count()
    val got = SparkEntry.queries("q_split_train_test")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("train", "val", "test"))
    assert(got.values.map(_._2).sum == total, "splits must partition")
    val trainShare = got("train")._4
    assert(math.abs(trainShare - 800000L) < 100000L,
      s"train share $trainShare ppm far from 800000")
    // share_ppm is the exact integer division of the recounted docs.
    got.values.foreach(r => assert(r._4 == r._2 * 1000000L / total))
  }

  test("q_corpus_quality_bins: bins partition the corpus with non-decreasing ranges") {
    val total = Catalog.load(spark, sf0001, "documents").count()
    val got = SparkEntry.queries("q_corpus_quality_bins")(spark, sf0001)
      .as[(Long, Long, Double, Double, Long)].collect().toSeq
    assert(got.map(_._1) == (1L to 10L))
    assert(got.map(_._2).sum == total)
    // Equal depth within 1 (ntile semantics).
    assert(got.map(_._2).max - got.map(_._2).min <= 1)
    // Score ranges are internally ordered and non-decreasing across bins
    // (touching boundaries allowed: ties split by doc_id).
    got.foreach(b => assert(b._3 <= b._4))
    got.sliding(2).foreach(w => assert(w(0)._4 <= w(1)._3 + 1e-9))
  }

  test("q_sql_recursive_cte: depths match the closed form floor(log2(key))") {
    // Walking k -> k div 2 -> ... takes exactly floor(log2(k)) steps for
    // k >= 1 (and 0 steps for k <= 1: the anc > 1 guard never fires), so
    // the recursion has an independent closed-form check.
    val keys = Catalog.load(spark, sf0001, "part")
      .select($"p_partkey").as[Long].collect()
    val expected = keys.groupBy(k =>
        if (k <= 1) 0 else 63 - java.lang.Long.numberOfLeadingZeros(k))
      .view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q_sql_recursive_cte")(spark, sf0001)
      .as[(Int, Long, Double)].collect().toSeq
    assert(got.map(r => r._1.toLong -> r._2).toMap ==
      expected.map { case (d, n) => d.toLong -> n })
    assert(got.map(_._2).sum == keys.length.toLong)
  }

  test("q_text_ngram_lm: conditional probabilities recount from raw bigrams") {
    val bigrams = Catalog.load(spark, sf0001, "documents")
      .select($"text").as[String].collect()
      .flatMap(t => { val w = t.split(" "); w.zip(w.drop(1)) })
    val uni = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nbi = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q_text_ngram_lm")(spark, sf0001)
      .as[(String, Long, Long, String, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got.groupBy(_._1).values.forall(_.size <= 3))
    // The 10 prefixes really are the most frequent ones.
    val top10 = uni.toSeq.sortBy { case (w, n) => (-n, w) }.take(10).toMap
    assert(got.map(_._1).toSet == top10.keySet)
    got.foreach { case (w1, nW1, rk, w2, nAb, pPpm) =>
      assert(nW1 == uni(w1) && nAb == nbi((w1, w2)))
      assert(pPpm == nAb * 1000000L / nW1)
      assert(rk >= 1 && rk <= 3)
    }
  }

  test("q_agg_sketch_hll: estimates within 10% of exact distinct counts") {
    val exact = Catalog.load(spark, sf0001, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val exactAll = Catalog.load(spark, sf0001, "events")
      .select($"user_id").distinct().count()

    val got = SparkEntry.queries("q_agg_sketch_hll")(spark, sf0001)
      .as[(String, Long)].collect().toMap
    assert(got.keySet == exact.keySet + "ALL")
    (exact + ("ALL" -> exactAll)).foreach { case (k, n) =>
      val est = got(k)
      assert(math.abs(est - n) <= math.max(1, n / 10),
        s"$k: estimate $est vs exact $n")
    }
  }

  test("cumsumExact: equals the single-partition window across bucket splits") {
    import org.apache.spark.sql.expressions.Window
    // Values chosen so bucket boundaries land mid-stream; unique, unsorted
    // order keys exercise the range bucketing.
    val rows = (1L to 500L).map(i => ((i * 7919) % 1009, i % 13 + 1)) // (order, value)
    val df = rows.toDF("k", "v")
    val naive = df.withColumn("cs",
      sum($"v").over(Window.orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"k", $"cs").as[(Long, Long)].collect().toMap
    for (buckets <- Seq(1, 3, 8, 32)) {
      val got = operators.DistributedRank.cumsumExact(df, "v", "k", "cs", buckets)
        .select($"k", $"cs").as[(Long, Long)].collect().toMap
      assert(got == naive, s"buckets=$buckets")
    }
  }

  test("q_pack_sequences: placements tile the token stream exactly") {
    val got = SparkEntry.queries("q_pack_sequences")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    val C = 2048L
    // Stream is contiguous: each doc starts where the previous ended.
    got.foldLeft(0L) { case (expectedOff, (_, n, off, f, l, nSeq, sOff)) =>
      assert(off == expectedOff)
      assert(f == off / C && sOff == off % C)
      assert(l == (off + n - 1) / C)
      assert(nSeq == l - f + 1 && nSeq >= 1)
      off + n
    }
    // Total stream length recounts from the raw table.
    val total = Catalog.load(spark, sf0001, "documents")
      .select(size(split($"text", " ")).cast("long")).as[Long].collect().sum
    assert(got.map(_._2).sum == total)
  }

  test("q_text_lm_score: integer-ppm scores match a full Scala recomputation") {
    val texts = Catalog.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val docBi = texts.map { case (id, t) =>
      val w = t.split(" ", -1)
      id -> w.zip(w.tail)
    }.filter(_._2.nonEmpty)
    val nAb = docBi.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nW1 = nAb.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val pPpm = nAb.map { case (k, n) => k -> n * 1000000L / nW1(k._1) }
    val expected = docBi.map { case (id, bs) =>
      val ps = bs.map(pPpm)
      (id, bs.length.toLong, ps.sum / bs.length, ps.min)
    }.sortBy(_._1).toSeq

    val got = SparkEntry.queries("q_text_lm_score")(spark, sf0001)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4)) == expected)
    assert(got.forall(r => r._5 == (r._3 < 33000L)))
  }

  test("q_join_bloom_prefilter: equals the plain join, bloom sits before it") {
    val df = SparkEntry.queries("q_join_bloom_prefilter")(spark, sf0001)
    val got = df.as[(String, Long, Double)].collect().toSeq
    // No-bloom formulation: the invariant the oracle also enforces — the
    // prefilter may only drop rows the join would drop anyway.
    val dim = Catalog.load(spark, sf0001, "orders")
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val plain = Catalog.load(spark, sf0001, "lineitem")
      .join(dim, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"), Dsl.dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first)
      .as[(String, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == plain)
    // The bloom probe is a Filter in the executed plan (i.e. it runs on the
    // fact side before the join), not an artifact of analysis only.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing from plan")
  }

  test("q_win_ignore_nulls: matches a per-user Scala scan") {
    val events = Catalog.load(spark, sf0001, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
      .as[(Long, Long, java.sql.Timestamp, String, Double)].collect()
    val expected = events.groupBy(_._2).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3.getTime, e._1))
      val vs = sorted.map(e => if (e._4 == "click") None else Some(e._5))
      val nonNulls = vs.flatten
      val second = if (nonNulls.length >= 2) Some(nonNulls(1)) else None
      sorted.indices.map { i =>
        val upto = vs.take(i + 1).flatten
        val before = vs.take(i).flatten
        (sorted(i)._1, vs(i), upto.lastOption, before.lastOption, second)
      }
    }.toSeq.sortBy(_._1)

    val got = SparkEntry.queries("q_win_ignore_nulls")(spark, sf0001)
      .as[(Long, Long, java.sql.Timestamp, Option[Double], Option[Double],
           Option[Double], Option[Double])]
      .collect().toSeq.map(r => (r._1, r._4, r._5, r._6, r._7))
    assert(got.nonEmpty && got == expected)
  }

  test("q_vec_stats: per-dimension stats match a Scala recomputation") {
    val vecs = Catalog.load(spark, sf0001, "embeddings")
      .select($"embedding").as[Array[Float]].collect()
    val dims = vecs.head.length
    val got = SparkEntry.queries("q_vec_stats")(spark, sf0001)
      .as[(Long, Long, Double, Double, Float, Float)].collect()
    assert(got.length == dims)
    got.foreach { case (pos, n, mean, varX, minX, maxX) =>
      val xs = vecs.map(_(pos.toInt))
      assert(n == xs.length)
      assert(minX == xs.min && maxX == xs.max)
      // mean goes through the exact decimal-sum convention; recompute the
      // same way (6-dp half-up per value, then 4-dp rounded mean).
      val dec = xs.map(x => BigDecimal(x.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      val expMean = (dec / xs.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(mean - expMean) < 1e-9, s"pos $pos mean $mean vs $expMean")
      val m = xs.map(_.toDouble).sum / xs.length
      val expVar = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      assert(math.abs(varX - expVar) < 1e-3, s"pos $pos var $varX vs $expVar")
    }
  }

  test("q_profile_entropy: bits match a Scala recount; uniformity bounds hold") {
    val got = SparkEntry.queries("q_profile_entropy")(spark, sf0001)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    def recount(table: String, column: String): (Long, Long, Double) = {
      val vs = Catalog.load(spark, sf0001, table)
        .select(col(column).cast("string")).as[String].collect()
      val counts = vs.groupBy(identity).map(_._2.length.toDouble)
      val n = vs.length.toDouble
      val h = -counts.map(c => c / n * (math.log(c / n) / math.log(2))).sum
      (counts.size.toLong, vs.length.toLong,
        BigDecimal(h).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    for ((t, c) <- Seq("orders" -> "o_orderpriority",
                       "customer" -> "c_mktsegment",
                       "lineitem" -> "l_returnflag")) {
      val (nd, n, h) = recount(t, c)
      val (_, gd, gn, gh) = got(s"$t.$c")
      assert(gd == nd && gn == n)
      assert(math.abs(gh - h) <= 1e-4, s"$t.$c entropy $gh vs $h")
      // 0 <= H <= log2(distinct), with equality only for uniform columns.
      assert(gh >= 0.0 && gh <= math.log(nd.toDouble) / math.log(2) + 1e-9)
    }
  }

  test("q_ts_outlier_mad: median/MAD recompute; flags follow the threshold") {
    val got = SparkEntry.queries("q_ts_outlier_mad")(spark, sf0001)
      .as[(java.sql.Timestamp, Double, Double, Double, Boolean)].collect().toSeq
    assert(got.nonEmpty)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val revs = got.map(_._2)
    val m = median(revs)
    val devs = revs.map(r => math.abs(r - m))
    val mad = median(devs)
    got.zip(devs).foreach { case ((_, _, devR, robustZ, flag), dev) =>
      assert(math.abs(devR - dev) <= 5e-5)
      assert(math.abs(robustZ - dev / (1.4826 * mad)) <= 5e-5)
      assert(flag == dev > 4.4478 * mad)
    }
  }

  test("q_join_asof_nearest: each probe picks the closest event either side") {
    val events = Catalog.load(spark, sf0001, "events")
      .select($"user_id", $"event_id", $"ts")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .groupBy(_._1)
    val got = SparkEntry.queries("q_join_asof_nearest")(spark, sf0001)
      .as[(Long, java.sql.Timestamp, Long, java.sql.Timestamp, Long)]
      .collect().toSeq
    assert(got.size == events.size * 3)
    // Full microsecond resolution: getTime alone is millis but the fixture
    // timestamps carry micros (same trick as the q_seq_pattern spec).
    def us(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    got.foreach { case (u, probe, eid, ts, dtUs) =>
      val cands = events(u).map { case (_, id, t) =>
        (math.abs(us(t) - us(probe)), us(t), id)
      }.sorted
      assert(cands.head._3 == eid, s"user $u probe $probe")
      assert(dtUs == cands.head._1, s"user $u probe $probe dt")
      assert(us(ts) == cands.head._2)
    }
  }

  test("q_agg_listagg: members equal the sorted joined names per region") {
    val nations = Catalog.load(spark, sf0001, "nation")
      .join(Catalog.load(spark, sf0001, "region"),
        $"n_regionkey" === $"r_regionkey")
      .select($"r_name", $"n_name").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = SparkEntry.queries("q_agg_listagg")(spark, sf0001)
      .as[(String, Long, String)].collect().toSeq
    assert(got.map(_._1) == got.map(_._1).sorted && got.nonEmpty)
    got.foreach { case (r, n, members) =>
      assert(n == nations(r).size)
      assert(members == nations(r).mkString(","))
    }
  }

  test("q_source_schema_evolution: merged scan widens v1 rows with nulls") {
    val df = SparkEntry.queries("q_source_schema_evolution")(spark, sf0001)
    assert(df.columns.toSeq == Seq("s_suppkey", "s_name", "s_acctbal"))
    val rows = df.as[(Long, String, Option[Double])].collect()
    val supplier = Catalog.load(spark, sf0001, "supplier")
    assert(rows.length == supplier.count())
    // v1 generation (even keys) predates the column; v2 carries real values.
    assert(rows.forall { case (k, _, bal) =>
      if (k % 2 == 0) bal.isEmpty else bal.nonEmpty })
  }
}
