package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.{SessEvent, SessionOut, StatefulSessionizer}

/** SURVEY §2.I streaming surface — the custom-state sessionizer
  * ([[graft.streaming.StatefulSessionizer]]): `flatMapGroupsWithState` with
  * `EventTimeTimeout` must produce exactly the sessions of the graded batch
  * formulation (q_win_session_ids gap/cumsum rollup) on the same events,
  * with both closure paths exercised — successor-event mid-batch closure
  * and watermark-timeout closure.
  */
class StatefulSessionSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState sessionizer equals batch sessionization") {
    // Three users; sessions split across micro-batches so sessions close
    // BOTH ways: mid-batch (successor event) and by event-time timeout
    // (final flush advancing the watermark).
    val batch1 = Seq(
      SessEvent(1, 1, ts("2024-01-01 08:00:00")),
      SessEvent(2, 1, ts("2024-01-01 08:10:00")),
      SessEvent(3, 2, ts("2024-01-01 08:05:00")),
      SessEvent(4, 3, ts("2024-01-01 08:20:00")))
    val batch2 = Seq(
      // user 1: 25-min gap -> SAME session; user 2: 60-min gap -> new.
      SessEvent(5, 1, ts("2024-01-01 08:35:00")),
      SessEvent(6, 2, ts("2024-01-01 09:05:00")),
      SessEvent(7, 3, ts("2024-01-01 08:49:59")), // 29:59 gap: same session
      SessEvent(8, 2, ts("2024-01-01 09:10:00")))
    val batch3 = Seq(
      SessEvent(9, 1, ts("2024-01-01 10:00:00"))) // 85-min gap: new session
    // Flush: far-future event (excluded from comparison) advances the
    // watermark past every open session's horizon so timeouts fire.
    val flush = Seq(SessEvent(1000, 999, ts("2024-01-02 12:00:00")))
    val all = batch1 ++ batch2 ++ batch3

    val dir = Files.createTempDirectory("graft_sess_").toString
    def append(evs: Seq[SessEvent]): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(s"$dir/all")
    batch1.toDF().coalesce(1).write.parquet(s"$dir/all")

    val src = spark.readStream.schema(batch1.toDF().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/all")
    val sessions = StatefulSessionizer.sessions(
      src.withWatermark("ts", "1 second").as[SessEvent])

    val ck = Files.createTempDirectory("graft_sess_ck").toString
    val q = sessions.writeStream.format("memory").queryName("sess_sink")
      .outputMode("append").option("checkpointLocation", ck).start()
    q.processAllAvailable()
    append(batch2); q.processAllAvailable()
    append(batch3); q.processAllAvailable()
    append(flush); q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_sink")
      .filter($"user_id" =!= 999)
      .as[SessionOut].collect()
      .map(s => (s.user_id, s.start, s.end, s.n)).toSet

    // Batch truth: the q_win_session_ids gap/cumsum formulation, rolled up.
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = all.toDF()
      .withColumn("gap", unix_micros($"ts") - unix_micros(lag($"ts", 1).over(wOrd)))
      .withColumn("is_new",
        when($"gap".isNull || $"gap" >= StatefulSessionizer.GapMs * 1000, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($"is_new").over(wRun))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("start"), max($"ts").as("end"), count(lit(1)).as("n"))
      .select($"user_id", $"start", $"end", $"n")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet

    assert(got == expected,
      s"stateful sessions != batch sessions:\n got=$got\n exp=$expected")
    // Both closure paths exercised: user 2's first session closed by a
    // successor event, the final sessions only by timeout. Sessions:
    // u1 {08:00-08:35 ×3, 10:00 ×1}, u2 {08:05 ×1, 09:05-09:10 ×2},
    // u3 {08:20-08:49:59 ×2}.
    assert(got.size == 5)
  }

  test("late out-of-order event within the watermark extends session START") {
    // Cross-batch order-insensitivity (ADVICE round 9): an event older than
    // the stored session start — legal inside the watermark delay — must
    // move session_start backwards, exactly as the batch oracle's global
    // sort would have placed it.
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.TestGroupState
    val state = TestGroupState.create[graft.streaming.SessionState](
      Optional.of(graft.streaming.SessionState(
        ts("2024-01-01 10:00:00").getTime, ts("2024-01-01 10:05:00").getTime, 2)),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(0L),
      hasTimedOut = false)
    val out = StatefulSessionizer.fold(7L,
      Iterator(SessEvent(99, 7, ts("2024-01-01 09:59:30"))), state).toList
    assert(out.isEmpty) // merged, nothing closed
    val s = state.get
    assert(s.start == ts("2024-01-01 09:59:30").getTime,
      s"start not extended backwards: $s")
    assert(s.end == ts("2024-01-01 10:05:00").getTime && s.n == 3)
  }
}
