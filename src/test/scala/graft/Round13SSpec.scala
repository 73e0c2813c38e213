package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-19 invariants: the event-time timer run equals the
  * declarative horizon rule, and the firing boundary is pinned STRICT
  * (expiry == final watermark does NOT fire) on a crafted equality case.
  */
class Round13SSpec extends SparkTestBase {
  import spark.implicits._

  test("q_stream_tws_timer equals the horizon rule on the fixture") {
    val got = SparkEntry.queries("q_stream_tws_timer")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val stats = Catalog.load(spark, sf0001, "events")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), max(unix_millis($"ts")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wm = stats.map(_._3).max - 1000L
    val want = stats.filter(s => s._3 + 1800000L <= wm)
      .map(s => s._1 -> ((s._2, s._3 + 1800000L))).toMap
    assert(got == want)
    assert(got.nonEmpty && got.size < stats.length) // tail stays open
  }

  test("the firing boundary is non-strict: expiry == watermark fires") {
    // Synthetic events table: user 3 owns the stream max T (watermark =
    // T - 1000 ms); user 1's horizon lands EXACTLY on the watermark and
    // FIRES (Spark's timer rule is expiry <= watermark — probed, then
    // pinned here); user 2 is 1 ms earlier and also fires.
    val dir = java.nio.file.Files.createTempDirectory("graft_twtb_")
    try {
      val tMax = 1704067200000L // 2024-01-01T00:00:00Z, ms-aligned
      val ta = tMax - 1000L - 1800000L
      val rows = Seq(
        (1L, ta - 50000L, 1L), (2L, ta, 1L), // user 1: expiry == wm
        (3L, ta - 1L, 2L), (4L, ta - 60000L, 2L), // user 2: expiry wm-1
        (5L, tMax, 3L)) // the watermark owner
      rows.toDF("event_id", "ts_ms", "user_id")
        .select($"event_id", timestamp_millis($"ts_ms").as("ts"),
          $"user_id", lit("view").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("q_stream_tws_timer")(spark, dir.toString)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == Map(
          1L -> ((2L, ta + 1800000L)),
          2L -> ((2L, ta - 1L + 1800000L))),
        s"boundary semantics drifted: $got")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }
}
