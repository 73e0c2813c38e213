package graft

/** BPE merge learning pinned against an exact in-memory trainer (the
  * k-core precedent: the distributed loop vs a straightforward sequential
  * reference on synthetic corpora), plus the exhaustion guard.
  */
class BpeLearnSpec extends SparkTestBase {
  import spark.implicits._

  /** Sequential reference BPE: same semantics the operator declares —
    * pair counts weighted by word frequency, argmax with (count DESC,
    * left ASC, right ASC) ties, greedy left-to-right non-overlapping
    * merge.
    */
  private def referenceBpe(words: Map[String, Long],
                           k: Int): Seq[(String, String, Long)] = {
    var segs: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) return out.toSeq
      val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
      out += ((l, r, c))
      segs = segs.groupMapReduce { case (syms, _) =>
        // greedy left-to-right merge of (l, r)
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            b += l + r; i += 2
          } else { b += syms(i); i += 1 }
        }
        b.toVector
      }(_._2)(_ + _)
    }
    out.toSeq
  }

  private def runOperator(texts: Seq[String]): Seq[(Long, String, String, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_")
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q_text_bpe_learn")(spark, dir.toString)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("learned merges equal the sequential reference on a synthetic corpus") {
    val texts = Seq(
      "banana bandana banana cabana",
      "banana bananas ban cab nab",
      "abracadabra cadabra abra")
    val words = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val expected = referenceBpe(words, 8)
    assert(expected.size == 8, s"corpus must support 8 merges: $expected")
    val got = runOperator(texts)
    assert(got.map(_._1) == (1L to 8L),
      s"rounds must be 1..8 in order: $got")
    assert(got.map(t => (t._2, t._3, t._4)) == expected,
      s"got=$got expected=$expected")
  }

  test("overlapping pairs merge greedily left-to-right (aaaa -> aa aa)") {
    // 'aaaa' has 3 overlapping (a,a) pair slots but only 2 greedy merges;
    // round 1 must count 3·n and segment to [aa, aa].
    // bcdefgh supplies the six further merges rounds 3-8 need.
    val got = runOperator(Seq("aaaa aaaa aaaa bcdefgh bcdefgh"))
    assert(got.head == ((1L, "a", "a", 9L)), got.toString)
    // round 2: pairs now (aa,aa):3 and (b,c):2 -> (aa,aa) wins
    assert(got(1) == ((2L, "aa", "aa", 3L)), got.toString)
  }

  test("a corpus exhausted before 8 merges fails loudly with the named error") {
    val e = intercept[Exception](runOperator(Seq("ab ab ab")))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("q_text_bpe_learn")),
      msgs(e).mkString(" | "))
  }
}
