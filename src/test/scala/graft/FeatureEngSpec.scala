package graft

import org.apache.spark.sql.functions._

/** Round-10 batch-3 feature-engineering pack: semantic invariants per
  * encoder beyond the oracle hash.
  */
class FeatureEngSpec extends SparkTestBase {
  import spark.implicits._

  test("pack registration: 12 queries, all with oracles") {
    assert(operators.FeatureEng.queries.map(_.id).toSet == Set(
      "q_feat_onehot", "q_feat_hash_bucket", "q_feat_minmax",
      "q_feat_zscore", "q_feat_bin_quantile", "q_feat_target_encode",
      "q_feat_freq_encode", "q_feat_woe", "q_feat_robust_scale",
      "q_feat_target_encode_cv", "q_feat_crossed",
      "q_feat_target_encode_time"))
    assert(operators.FeatureEng.queries.forall(_.oracle.isDefined))
  }

  test("onehot: exactly one indicator fires per row") {
    val df = SparkEntry.queries("q_feat_onehot")(spark, sf0001)
    val indSum = df.columns.filter(_.startsWith("is_"))
      .map(col).reduce(_ + _)
    assert(df.filter(indSum =!= 1L).count() == 0)
  }

  test("hash bucket: buckets within range and counts partition the table") {
    val df = SparkEntry.queries("q_feat_hash_bucket")(spark, sf0001)
    assert(df.filter($"bucket" < 0 || $"bucket" >= 64).count() == 0)
    val total = df.agg(sum($"n")).collect()(0).getLong(0)
    assert(total == Catalog.load(spark, sf0001, "customer").count())
  }

  test("minmax: scaled values in [0,1] with both endpoints hit per segment") {
    val df = SparkEntry.queries("q_feat_minmax")(spark, sf0001)
    assert(df.filter($"acctbal_scaled" < 0.0 || $"acctbal_scaled" > 1.0)
      .count() == 0)
    val ends = df.groupBy($"c_mktsegment")
      .agg(min($"acctbal_scaled").as("lo"), max($"acctbal_scaled").as("hi"))
    assert(ends.filter($"lo" =!= 0.0 || $"hi" =!= 1.0).count() == 0)
  }

  test("zscore: per-group mean of z is ~0 and spread ~1") {
    val df = SparkEntry.queries("q_feat_zscore")(spark, sf0001)
    val stats = df.groupBy($"o_orderpriority")
      .agg(avg($"price_z").as("mz"), stddev_samp($"price_z").as("sz"))
      .collect()
    stats.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-3)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-3)
    }
  }

  test("bin deciles: ntile balance (sizes differ by at most 1) and ordered bounds") {
    val df = SparkEntry.queries("q_feat_bin_quantile")(spark, sf0001)
      .orderBy($"bin").collect()
    assert(df.length == 10)
    val sizes = df.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    // Non-overlapping value ranges in bin order.
    df.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2)) // hi(prev) <= lo(next)
    }
  }

  test("target encoding: shrinks each segment rate toward the global prior") {
    val rows = SparkEntry.queries("q_feat_target_encode")(spark, sf0001)
      .collect()
    val nTot = rows.map(_.getLong(1)).sum.toDouble
    val kTot = rows.map(_.getLong(2)).sum.toDouble
    val prior = kTot / nTot
    rows.foreach { r =>
      val (n, k, enc) = (r.getLong(1).toDouble, r.getLong(2).toDouble,
        r.getDouble(3))
      val rate = k / n
      // enc lies between the raw rate and the prior (inclusive).
      assert(enc >= math.min(rate, prior) - 1e-12 &&
        enc <= math.max(rate, prior) + 1e-12)
    }
  }

  test("frequency encoding: xfreq equals the cross-category row count") {
    val df = SparkEntry.queries("q_feat_freq_encode")(spark, sf0001)
    val bad = df.groupBy($"c_nationkey", $"c_mktsegment", $"xfreq")
      .agg(count(lit(1)).as("actual"))
      .filter($"xfreq" =!= $"actual")
    assert(bad.count() == 0)
  }

  test("woe: signs follow over/under-representation of the urgent class") {
    val rows = SparkEntry.queries("q_feat_woe")(spark, sf0001).collect()
    val hiTot = rows.map(_.getLong(1)).sum.toDouble
    val loTot = rows.map(_.getLong(2)).sum.toDouble
    rows.foreach { r =>
      val odds = (r.getLong(1) / hiTot) / (r.getLong(2) / loTot)
      assert(math.signum(r.getDouble(3)) == math.signum(math.log(odds)) ||
        math.abs(r.getDouble(3)) < 1e-9)
    }
  }
}
