package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-11 invariants: kNN classifier against an in-memory
  * replay, and the streaming lake sink against the direct batch aggregate.
  */
class Round13KSpec extends SparkTestBase {
  import spark.implicits._

  test("q_ml_knn_classify equals an in-memory 5-NN majority vote") {
    val vecs = Catalog.load(spark, sf0001, "embeddings")
      .select($"vec_id", $"label".cast("long"),
        transform($"embedding",
          v => floor(v.cast("double") * lit(1000000d)).cast("long")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
    val (probes, train) = vecs.partition(_._1 % 20 == 7)
    val want = probes.map { case (pid, tl, pe) =>
      val top = train.map { case (cid, cl, ce) =>
        val d2 = pe.zip(ce).map { case (x, y) => (x - y) * (x - y) }.sum
        (d2, cid, cl)
      }.sortBy(t => (t._1, t._2)).take(5)
      val (pl, votes) = top.groupBy(_._3).view.mapValues(_.length).toSeq
        .sortBy(t => (-t._2, t._1)).head
      pid -> ((tl, pl, votes.toLong, if (pl == tl) 1L else 0L))
    }.toMap
    val got = SparkEntry.queries("q_ml_knn_classify")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    // 5 votes max, majority needs at least 1.
    assert(got.values.forall(v => v._3 >= 1L && v._3 <= 5L))
  }

  test("q_stream_lake_sink snapshot equals the direct batch aggregate") {
    val got = SparkEntry.queries("q_stream_lake_sink")(spark, sf0001)
      .collect().toSeq
    val want = Catalog.load(spark, sf0001, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        Dsl.dsum($"value").as("total_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type".asc_nulls_first)
      .collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
