package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-12 invariants: boosting against an in-memory replay of
  * both rounds, and join discovery against known FK containments.
  */
class Round13LSpec extends SparkTestBase {
  import spark.implicits._

  test("q_ml_boost_stump equals an in-memory two-round replay; SSE falls") {
    val base = Catalog.load(spark, sf0001, "orders")
      .join(Catalog.load(spark, sf0001, "customer"),
        $"o_custkey" === $"c_custkey")
      .select(month($"o_orderdate").cast("long"),
        $"c_nationkey".cast("long"),
        expr("(cast(c_acctbal * 100 as long) + 100000) div 75000"),
        expr("""cast(cast(o_totalprice as decimal(14,2)) * 100 as long)
                div 100000"""))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val f0 = base.map(_._4).sum / base.length
    var resid = base.map(r => (r._1, r._2, r._3, r._4 - f0))
    def symDiv(s: Long, n: Long) = if (s >= 0) s / n else -((-s) / n)
    val want = (1 to 2).map { k =>
      val cand = for {
        (fname, fsel) <- Seq[(String, ((Long, Long, Long, Long)) => Long)](
          ("month", _._1), ("nation", _._2), ("balbin", _._3))
        bins = resid.map(fsel).distinct.sorted
        thr <- bins.init // nl < tn: the last bin is never a split
      } yield {
        val l = resid.filter(r => fsel(r) <= thr)
        val r2 = resid.filter(r => fsel(r) > thr)
        val (nl, sl) = (l.length.toLong, l.map(_._4).sum)
        val (nr, sr) = (r2.length.toLong, r2.map(_._4).sum)
        val score = (BigInt(sl) * sl / nl + BigInt(sr) * sr / nr).toLong
        (fname, thr, nl, sl, nr, sr, score)
      }
      val best = cand.minBy(c => (-c._7, c._1, c._2))
      val (bf, bt) = (best._1, best._2)
      val fsel: ((Long, Long, Long, Long)) => Long = bf match {
        case "month" => _._1
        case "nation" => _._2
        case _ => _._3
      }
      val (vl, vr) = (symDiv(best._4, best._3), symDiv(best._6, best._5))
      resid = resid.map(r =>
        (r._1, r._2, r._3, r._4 - (if (fsel(r) <= bt) vl else vr)))
      val sse = resid.map(r => BigInt(r._4) * r._4).sum.toLong
      (k.toLong, bf, bt, best._3, best._4, best._5, best._6, vl, vr, sse)
    }
    val got = SparkEntry.queries("q_ml_boost_stump")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9))).toSeq
    assert(got == want)
    // The training curve must fall round over round.
    assert(got(1)._10 < got(0)._10)
  }

  test("q_profile_join_discovery recovers the known FK containments") {
    val got = SparkEntry.queries("q_profile_join_discovery")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // Textbook FKs: every o_custkey is a c_custkey; every l_partkey is a
    // p_partkey — inclusion exactly 10^6 ppm in the FK -> PK direction.
    assert(got(("orders.o_custkey", "customer.c_custkey"))._4 == 1000000L)
    assert(got(("lineitem.l_partkey", "part.p_partkey"))._4 == 1000000L)
    // The reverse direction equals the directly computed inclusion.
    val custKeys = Catalog.load(spark, sf0001, "customer")
      .select($"c_custkey").distinct().collect().map(_.getLong(0)).toSet
    val ordKeys = Catalog.load(spark, sf0001, "orders")
      .select($"o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val expPpm = (custKeys & ordKeys).size.toLong * 1000000L / custKeys.size
    assert(got(("customer.c_custkey", "orders.o_custkey"))._4 == expPpm)
    // Cardinalities agree with direct distinct counts.
    val nCust = Catalog.load(spark, sf0001, "customer")
      .select($"c_custkey").distinct().count()
    assert(got(("orders.o_custkey", "customer.c_custkey"))._2 == nCust)
    // incl_ppm is a proper fraction of n_a.
    assert(got.forall { case (_, (na, _, common, ppm)) =>
      common <= na && ppm <= 1000000L })
  }
}
