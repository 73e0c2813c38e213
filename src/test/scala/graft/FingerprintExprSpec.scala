package graft

import org.apache.spark.sql.functions._

/** Parity proof for the codegen'd `graft_fingerprint` expression
  * (plans/Fingerprint.scala) against the composed posexplode + higher-order
  * sumAscii + regroup formulation it replaced.
  */
class FingerprintExprSpec extends SparkTestBase {
  import spark.implicits._

  test("bit-identical to the composed explode+agg form on the fixture corpus") {
    val fast = SparkEntry.queries("q_text_fingerprint")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val slow = operators.LlmExtras.fingerprintComposed(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fast.nonEmpty)
    assert(fast.toSeq == slow.toSeq)
  }

  test("edge cases: empty, single token, multi-token, digits") {
    val rows = Seq("", "a", "abc def", "a b c d e", "x1 22 333").toDF("t")
      .select(call_function("graft_fingerprint", $"t").as("f"))
      .select($"f".getItem(0).as("n"), $"f".getItem(1).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // Composed-form semantics: split('', ' ') = [''] — one empty token.
    assert(rows(0) == ((1L, 0L)))
    assert(rows(1)._1 == 1L && rows(2)._1 == 2L && rows(3)._1 == 5L)
    // Order sensitivity: swapping tokens must change the fingerprint.
    val Seq(ab, ba) = Seq("abc def", "def abc").toDF("t")
      .select(call_function("graft_fingerprint", $"t").getItem(1)).as[Long]
      .collect().toSeq
    assert(ab != ba)
    // Spot-check the arithmetic for "a": th = (31*1 + 97)*2654435761 % p.
    val th = 128L * 2654435761L % 1000000007L
    assert(rows(1)._2 == th % 1000000007L)
  }

  test("usable from SQL and null-safe") {
    val r = spark.sql(
      "SELECT graft_fingerprint('hello world') AS f, graft_fingerprint(CAST(NULL AS STRING)) AS n")
      .collect().head
    assert(r.getSeq[Long](0).head == 2L)
    assert(r.isNullAt(1))
  }
}
