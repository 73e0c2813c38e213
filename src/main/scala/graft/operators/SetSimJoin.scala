package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryPack}

/** SURVEY.md §2.J — PPJoin-style PREFIX-FILTERED set-similarity join
  * (round 13): the third candidate-generation strategy on the near-dup
  * board — [[LlmPipeline.dedupNear]] joins EVERY shingle occurrence,
  * `q_dedup_minhash` trades recall for banded signatures; prefix
  * filtering (Chaudhuri et al. SSJoin / Xiao et al. PPJoin) is the
  * LOSSLESS middle: only each document's rarest-first shingle PREFIX
  * enters the candidate join, and the prefix principle guarantees every
  * qualifying pair still meets. Declared output ≡ `q_dedup_near` (same
  * pair set, same columns), and the ORACLE IS the shared
  * [[LlmPipeline.nearPairsCtes]] exhaustive formulation — the two
  * strategies verify each other through one oracle (the
  * components/twostar dual-formulation pattern), so a single pair
  * missed by the prefix logic fails the hash gate.
  *
  * Prefix principle, for threshold τ under one global total order on
  * shingles: if round(c/(na+nb−c),4) ≥ 0.8 then c ≥ τ·(na+nb−c) with
  * τ = 0.79995 (the round-at-4dp acceptance edge), and since
  * c ≤ min(na,nb), the union is ≥ max(na,nb), so c ≥ ⌈τ·n⌉ for EACH
  * side's capped size n. Order each doc's shingles globally and take
  * the first n − ⌈τ·n⌉ + 1 as its prefix: the FIRST common shingle (in
  * global order) must lie in BOTH prefixes — if it sat past either
  * prefix, that doc would have ≥ n − ⌈τ·n⌉ + 1 earlier non-common
  * shingles, leaving room for at most ⌈τ·n⌉ − 1 common ones,
  * contradicting c ≥ ⌈τ·n⌉. ⌈τ·n⌉ = (79995·n + 99999) div 100000 —
  * exact integer, no float in the filter.
  *
  * The global order is (df asc, shingle-hash asc): RARITY order, so the
  * prefix join meets on the least-frequent shingles and candidate
  * bucket sizes are df-bounded exactly where pairs are generated (on
  * top of the leaf's df-cap). The Spark order sorts HASHED shingles
  * while the oracle never orders at all (exhaustive) — any total order
  * is valid for the theorem, so the hash/string representation split
  * stays confined to the leaf, as in the rest of the dedup family.
  *
  * Scale: candidate generation reads ~n/5-sized prefixes (≈ 5× less
  * join input than the exhaustive shingle join); the length filter
  * (100000·min ≥ 79995·max) kills mismatched pairs pre-verify; the
  * exact-intersection verify joins the full leaf against CANDIDATE
  * pairs only. Everything derives from the one memoized shingle leaf.
  */
object SetSimJoin extends QueryPack {

  private def dedupPrefixFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = LlmPipeline.shingles(spark, sfDir)
    val df = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    // Rarity-ranked shingles; prefix length n - ceil(tau*n) + 1.
    val w = Window.partitionBy($"doc_id").orderBy($"df".asc, $"shingle".asc)
    val prefix = sh.join(df, Seq("shingle"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(sizes, Seq("doc_id"))
      .filter($"rn" <= $"n" - expr("(79995L * n + 99999L) div 100000L") + 1L)
      .select($"doc_id", $"shingle", $"n")
    // Candidates: prefix x prefix, ordered pair, length filter
    // min >= tau * max  <=>  100000*min >= 79995*max.
    val cands = prefix.as("a").join(prefix.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id" &&
          lit(100000L) * least($"a.n", $"b.n") >=
            lit(79995L) * greatest($"a.n", $"b.n"))
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.n".as("n_a"), $"b.n".as("n_b"))
      .distinct()
    // Verify: exact intersection over candidate pairs only, then the
    // IDENTICAL jaccard/rounding/threshold chain as dedupNear.
    val ia = sh.select($"doc_id".as("doc_a"), $"shingle")
    val ib = sh.select($"doc_id".as("doc_b"), $"shingle")
    cands.join(ia, Seq("doc_a")).join(ib, Seq("doc_b", "shingle"))
      .groupBy($"doc_a", $"doc_b", $"n_a", $"n_b")
      .agg(count(lit(1)).as("n_inter"))
      .withColumn("jaccard",
        round($"n_inter".cast("double") / ($"n_a" + $"n_b" - $"n_inter"), 4))
      .filter($"jaccard" >= 0.8)
      .select($"doc_a", $"doc_b", $"n_inter", $"jaccard")
      .orderBy($"doc_a".asc_nulls_first, $"doc_b".asc_nulls_first)
  }

  /** The exhaustive shared formulation — byte-identical semantics to
    * q_dedup_near's oracle; prefix filtering must reproduce it. */
  private val dedupPrefixFilterSql = s"""
    WITH ${LlmPipeline.nearPairsCtes}
    SELECT doc_a, doc_b, n_inter, jaccard FROM j
    WHERE jaccard >= 0.8
    ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST"""

  override val queries: Vector[Q] = Vector(
    Q("q_dedup_prefix_filter", dedupPrefixFilter, Some(dedupPrefixFilterSql)),
  )
}
