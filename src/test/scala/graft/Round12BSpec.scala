package graft

import org.apache.spark.sql.functions._

/** Round-12 batch-2 invariants beyond the oracle hash: the BPE
  * trainer/encoder consistency law, SemDeDup partition accounting, the
  * power-iteration normalization contract, and systematic-PPS tick
  * conservation.
  */
class Round12BSpec extends SparkTestBase {
  import spark.implicits._

  test("bpe apply's corpus total equals the learner's reported total") {
    // The two queries share the memoized model but compute the corpus
    // token count through DIFFERENT paths: the learner folds the
    // vocabulary (cnt-weighted), apply re-joins every document word. The
    // totals must agree exactly — a dictionary join that dropped or
    // duplicated a word would break this before it broke the oracle.
    val learned = SparkEntry.queries("q_text_bpe_learn")(spark, sf0001)
      .select($"corpus_tokens_after").head().getLong(0)
    val applied = SparkEntry.queries("q_text_bpe_apply")(spark, sf0001)
    val total = applied.agg(sum($"n_tokens")).head().getLong(0)
    assert(total == learned, s"apply total $total != learner $learned")
    // Ratio column: NULL iff the document had no [a-z]+ word.
    assert(applied.filter($"n_words" === 0L &&
      $"tok_per_word_ppm".isNotNull).count() == 0)
    assert(applied.filter($"n_words" > 0L &&
      $"tok_per_word_ppm".isNull).count() == 0)
    // Merges only ever shrink a word's token count: n_tokens <= letters.
    val letters = Catalog.load(spark, sf0001, "documents")
      .select($"doc_id", expr(
        "cast(aggregate(transform(regexp_extract_all(text, '([a-z]+)', 1)," +
          " w -> length(w)), 0L, (a, x) -> a + x) as long)").as("n_chars"))
    val viol = applied.join(letters, Seq("doc_id"))
      .filter($"n_tokens" > $"n_chars" ||
        ($"n_words" > 0L && $"n_tokens" < $"n_words"))
    assert(viol.count() == 0)
  }

  test("semantic dedup accounts for every vector exactly once") {
    val out = SparkEntry.queries("q_dedup_semantic")(spark, sf0001)
    val n = Catalog.load(spark, sf0001, "embeddings").count()
    assert(out.agg(sum($"n_members")).head().getLong(0) == n)
    assert(out.filter($"n_kept" + $"n_dropped" =!= $"n_members").count() == 0)
    assert(out.filter($"n_dropped" < 0L || $"n_kept" < 1L).count() == 0)
  }

  test("power iteration output is a max-normalized 64-dim direction") {
    val out = SparkEntry.queries("q_vec_pca_power")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 64 && out.map(_._1).toSeq == (1L to 64L))
    // The positivity-offset renormalization maps the max-|w| component to
    // exactly +-10^6 and bounds every other one strictly inside.
    assert(out.map(_._2.abs).max == 1000000L)
    assert(out.forall { case (_, v) => v >= -1000000L && v <= 1000000L })
  }

  test("systematic PPS conserves ticks: sum of multiplicities = tick count") {
    val out = SparkEntry.queries("q_sample_weighted")(spark, sf0001)
    val total = Catalog.load(spark, sf0001, "orders")
      .select((col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("long").as("w"))
      .agg(sum($"w")).head().getLong(0)
    val step = total / 1000L
    val phase = step / 2L
    val expectedTicks = (total + step - phase) / step
    assert(out.agg(sum($"m")).head().getLong(0) == expectedTicks)
    assert(out.filter($"m" < 1L).count() == 0)
    // Selected intervals are consistent: the weight interval around cw
    // really contains a tick (re-derived per row).
    val bad = out.filter(
      expr(s"(cw + $step - $phase) div $step = " +
        s"(cw - w + $step - $phase) div $step"))
    assert(bad.count() == 0)
  }
}
