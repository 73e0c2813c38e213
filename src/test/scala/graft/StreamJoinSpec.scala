package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Stream-stream and stream-static joins — the remaining Structured
  * Streaming join surface beyond WatermarkSpec's aggregations. The
  * stream-stream interval join is the streaming twin of the batch
  * `q_join_self_interval` shape: both sides watermarked, the join condition
  * bounds event-time distance so state is provably prunable.
  */
class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream interval join matches its batch twin and prunes state") {
    val dir = Files.createTempDirectory("graft_ssj_").toString
    // Clicks and purchases for three users; purchase joins a click iff it
    // lands within [click, click + 30 min).
    val clicks = Seq(
      Ev(1, 1, ts("2024-01-01 12:00:00"), 1.0),
      Ev(2, 2, ts("2024-01-01 12:05:00"), 1.0),
      Ev(3, 3, ts("2024-01-01 13:00:00"), 1.0))
    val purchases = Seq(
      Ev(10, 1, ts("2024-01-01 12:10:00"), 5.0), // 10 min after click: joins
      Ev(11, 2, ts("2024-01-01 12:50:00"), 7.0), // 45 min after click: out of window
      Ev(12, 3, ts("2024-01-01 13:01:00"), 9.0)) // 1 min after click: joins
    clicks.toDF().coalesce(1).write.parquet(s"$dir/clicks")
    purchases.toDF().coalesce(1).write.parquet(s"$dir/purchases")

    val schema = clicks.toDF().schema
    val cs = spark.readStream.schema(schema).parquet(s"$dir/clicks")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val ps = spark.readStream.schema(schema).parquet(s"$dir/purchases")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value")
      .withWatermark("p_ts", "1 hour")

    val joined = cs.join(ps,
      $"c_user" === $"p_user" &&
        $"p_ts" >= $"c_ts" &&
        $"p_ts" < $"c_ts" + expr("INTERVAL 30 MINUTES"))

    val q = joined.writeStream.format("memory").queryName("ssj_sink")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft_ssj_ck").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssj_sink")
      .select($"c_user", $"value").as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 5.0), (3L, 9.0)), s"stream-stream join got $got")

    // Batch twin over the same files must agree exactly.
    val bc = spark.read.parquet(s"$dir/clicks")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"))
    val bp = spark.read.parquet(s"$dir/purchases")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value")
    val batch = bc.join(bp,
      $"c_user" === $"p_user" &&
        $"p_ts" >= $"c_ts" &&
        $"p_ts" < $"c_ts" + expr("INTERVAL 30 MINUTES"))
      .select($"c_user", $"value").as[(Long, Double)].collect().toSet
    assert(got == batch, s"stream $got != batch $batch")
  }

  test("stream-static join enriches a stream against a broadcast-able dim") {
    val dir = Files.createTempDirectory("graft_ssd_").toString
    val evs = Seq(
      Ev(1, 1, ts("2024-01-01 12:00:00"), 1.0),
      Ev(2, 2, ts("2024-01-01 12:01:00"), 2.0),
      Ev(3, 9, ts("2024-01-01 12:02:00"), 3.0)) // no dim row: dropped (inner)
    evs.toDF().coalesce(1).write.parquet(s"$dir/evs")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")

    val src = spark.readStream.schema(evs.toDF().schema).parquet(s"$dir/evs")
    val q = src.join(dim, Seq("user_id"))
      .writeStream.format("memory").queryName("ssd_sink")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft_ssd_ck").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssd_sink")
      .select($"user_id", $"tier").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "gold"), (2L, "silver")), s"got $got")
  }
}
