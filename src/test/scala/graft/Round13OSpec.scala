package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-15 invariant: the transformWithState run equals the
  * batch aggregate, and the shared session's state-store provider is
  * untouched by the RocksDB-scoped clone.
  */
class Round13OSpec extends SparkTestBase {
  import spark.implicits._

  test("q_stream_tws equals the batch per-user aggregate; conf stays scoped") {
    val providerBefore =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val got = SparkEntry.queries("q_stream_tws")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val want = Catalog.load(spark, sf0001, "events")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), max(unix_micros($"ts")).as("m"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
    // The RocksDB provider was set on a newSession clone only.
    assert(spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass") == providerBefore)
  }
}
