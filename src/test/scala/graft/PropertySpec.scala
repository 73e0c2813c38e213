package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Relational-algebra invariants on generated data (SURVEY §5.4), run by
  * ScalaCheck's own sbt framework (no scalatest bridge in the offline
  * cache). Few cases per property — each case is a full Spark job.
  */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withMaxSize(30)

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rows = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 10L), Gen.chooseNum(0, 5)))

  property("dedup idempotent") = forAll(rows) { xs =>
    val once = xs.toDF("k", "v").dropDuplicates("k")
    once.count() == once.dropDuplicates("k").count() &&
      once.count() == xs.map(_._1).distinct.size
  }

  property("semi + anti partition the left side") = forAll(rows, rows) { (ls, rs) =>
    val l = ls.toDF("k", "v")
    val r = rs.toDF("k", "v")
    l.join(r, Seq("k"), "left_semi").count() +
      l.join(r, Seq("k"), "left_anti").count() == l.count()
  }

  property("unionAll count-additive; intersect contained in both") =
    forAll(rows, rows) { (ls, rs) =>
      val l = ls.toDF("k", "v")
      val r = rs.toDF("k", "v")
      val both = l.intersect(r)
      l.unionAll(r).count() == l.count() + r.count() &&
        both.except(l).isEmpty && both.except(r).isEmpty
    }

  property("running sum final value equals group sum") = forAll(rows) { xs =>
    xs.isEmpty || {
      val df = xs.zipWithIndex
        .map { case ((k, v), i) => (k, i.toLong, v.toLong) }
        .toDF("k", "seq", "v")
      val w = Window.partitionBy($"k").orderBy($"seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val last = df.withColumn("run", sum($"v").over(w))
        .groupBy($"k").agg(max(struct($"seq", $"run")).getField("run").as("fin"))
      val grouped = df.groupBy($"k").agg(sum($"v").as("total"))
      last.join(grouped, "k").filter($"fin" =!= $"total").isEmpty
    }
  }

  property("session count never exceeds event count") = forAll(rows) { xs =>
    val events = xs.zipWithIndex.map { case ((u, m), i) =>
      (i.toLong, u, new java.sql.Timestamp(1700000000000L + m * 60000L))
    }.toDF("event_id", "user_id", "ts")
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gap = unix_micros($"ts") - unix_micros(lag($"ts", 1).over(wOrd))
    val sessions = events
      .withColumn("is_new", when(gap.isNull || gap >= lit(1800000000L), 1L).otherwise(0L))
      .withColumn("sid", sum($"is_new").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"user_id", $"sid").distinct().count()
    sessions <= events.count()
  }
}
