package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Catalog, Q, QueryPack}

/** SURVEY.md §2.J — the composed vector-serving endgame (round 13): the
  * two index halves trained in rounds 12 ([[KMeansOps]] IVF cells,
  * [[PqOps]] codebooks) composed into the full FAISS-shape IVF-PQ serve,
  * plus MMR diversified re-ranking — the post-retrieval step RAG
  * pipelines run so the top-k is not five near-copies of one passage.
  *
  *  - `q_sim_ann_ivfpq` — the billion-vector serve shape end-to-end:
  *    probes route to their nprobe=2 nearest TRAINED k-means cells
  *    (exact integer squared-L2, (d2, cell) ties), candidates are those
  *    cells' postings only, and scoring is ADC over the PQ CODES — the
  *    raw candidate vectors are never touched. IVF bounds the scored set
  *    at nprobe/k of the corpus; PQ bounds the bytes per candidate at M
  *    codes; together serve cost is independent of both corpus bytes and
  *    dimensionality, which is the entire reason the shape exists.
  *  - `q_retrieval_mmr` — maximal marginal relevance over each probe's
  *    top-[[MmrCand]] relevance candidates: greedily pick [[MmrK]] items
  *    maximizing 7·rel − 3·max_{s∈selected} sim(c, s) (λ = 0.7 encoded
  *    as integer weights — NO division, so no div/floor asymmetry to
  *    manage), ties (score desc, cand asc).
  *
  * Determinism: everything runs on the floor(v·10⁶) quantized vectors —
  * relevance, pairwise sims, ADC LUTs, and the greedy loop are all exact
  * int64 arithmetic, so both queries hash-match their oracles end-to-end
  * (the [[KMeansOps]]/[[PqOps]] scaled-integer contract; a float MMR
  * could at best be rank-fuzzy at tie boundaries).
  *
  * Scale: the IVF-PQ serve joins cell-pruned candidates (nprobe/k of the
  * corpus) against an 8-row-per-candidate code table with a BROADCAST
  * probes×M×Kpq LUT and one map-side-combined (probe, cand) agg — no
  * corpus-wide shuffle, no raw-vector movement. MMR's greedy is
  * inherently sequential in k, but its state is the per-probe BOUNDED
  * candidate set ([[MmrCand]] rows with their quantized vectors), so it
  * runs as a typed flatMapGroups over probes — each group is O(k·c)
  * driver-free in-memory work, probes parallelize freely (the
  * q_ts_holt/q_survival_km typed-fold escape; the corpus is touched only
  * by the one relevance scan that builds the candidates).
  */
object VectorServe extends QueryPack {

  private val NProbe = 2
  private val TopK = 5
  private val MmrProbes = 4
  private val MmrCand = 12
  private val MmrK = 5

  private def sqDist(e: Column, c: Column): Column =
    aggregate(zip_with(e, c, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** Full IVF-PQ serve: trained-cell routing → cell-pruned candidates →
    * ADC scoring from codes only → top-[[TopK]] per probe.
    */
  private def ivfPq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Routing: exact integer L2 against the 10 learned centroids.
    val probes = KMeansOps.kmQuant(spark, sfDir).filter($"vec_id" < 10L)
      .select($"vec_id".as("probe_id"), $"e")
    val pd = probes.crossJoin(broadcast(KMeansOps.kmCentroids(spark, sfDir)))
      .select($"probe_id", $"cell", sqDist($"e", $"c").as("d2"))
    val w = Window.partitionBy($"probe_id").orderBy($"d2".asc, $"cell".asc)
    val pcells = pd.withColumn("rn", row_number().over(w))
      .filter($"rn" <= NProbe).select($"probe_id", $"cell")
    // Candidates: ONLY the probed cells' postings (the IVF pruning).
    val cands = pcells
      .join(KMeansOps.kmAssign(spark, sfDir)
        .select($"cell", $"vec_id".as("cand_id")), Seq("cell"))
      .filter($"cand_id" =!= $"probe_id")
      .select($"probe_id", $"cand_id")
    // ADC: probes × M × Kpq LUT (1280 rows — broadcast by construction).
    val lut = PqOps.subQuant(spark, sfDir).filter($"vec_id" < 10L)
      .select($"vec_id".as("probe_id"), $"sub", $"se")
      .join(PqOps.pqCodebooks(spark, sfDir), Seq("sub"))
      .select($"probe_id", $"sub", $"code", PqOps.dotInt($"se", $"c").as("p"))
    val scored = cands
      .join(PqOps.pqCodes(spark, sfDir)
        .select($"vec_id".as("cand_id"), $"sub", $"code"), Seq("cand_id"))
      .join(broadcast(lut), Seq("probe_id", "sub", "code"))
      .groupBy($"probe_id", $"cand_id").agg(sum($"p").as("adc_score"))
    val wr = Window.partitionBy($"probe_id")
      .orderBy($"adc_score".desc, $"cand_id".asc)
    scored.withColumn("rank", row_number().over(wr).cast("long"))
      .filter($"rank" <= TopK)
      .orderBy($"probe_id".asc_nulls_first, $"rank".asc_nulls_first)
  }

  /** Both training loops unrolled (CTE name spaces are disjoint:
    * quant/seeds/cent·/assign· vs squant/pseeds/pcent·/passign·), then
    * the same routing → prune → ADC chain.
    */
  private val ivfPqOracle = s"""
    WITH ${KMeansOps.kmeansCtes},
    ${PqOps.pqCtes},
    pcells AS (
      SELECT probe_id, cell FROM (
        SELECT q.vec_id AS probe_id, c.cell,
          row_number() OVER (PARTITION BY q.vec_id
            ORDER BY sum((q.e - c.c) * (q.e - c.c)) ASC, c.cell ASC) AS rn
        FROM quant q JOIN cent3 c USING (pos)
        WHERE q.vec_id < 10 GROUP BY 1, 2) WHERE rn <= $NProbe),
    ivfcand AS (
      SELECT pc.probe_id, a.vec_id AS cand_id
      FROM pcells pc JOIN assign3 a ON a.cell = pc.cell
      WHERE a.vec_id <> pc.probe_id),
    lut AS (
      SELECT q.vec_id AS probe_id, q.sub, c.code, sum(q.e * c.c) AS p
      FROM squant q JOIN pcent2 c ON c.sub = q.sub AND c.spos = q.spos
      WHERE q.vec_id < 10 GROUP BY 1, 2, 3),
    adc AS (
      SELECT ic.probe_id, ic.cand_id, CAST(sum(l.p) AS BIGINT) AS adc_score
      FROM ivfcand ic
      JOIN passign2 a ON a.vec_id = ic.cand_id
      JOIN lut l ON l.probe_id = ic.probe_id
        AND l.sub = a.sub AND l.code = a.code
      GROUP BY 1, 2),
    ranked AS (
      SELECT *, CAST(row_number() OVER
        (PARTITION BY probe_id ORDER BY adc_score DESC, cand_id ASC)
        AS BIGINT) AS rank
      FROM adc)
    SELECT probe_id, cand_id, adc_score, rank FROM ranked WHERE rank <= $TopK
    ORDER BY probe_id ASC NULLS FIRST, rank ASC NULLS FIRST"""

  /** MMR re-rank: per probe, greedy [[MmrK]] picks from the top-[[MmrCand]]
    * relevance candidates, diversity-penalized by the max pairwise
    * quantized dot to the already-selected set.
    */
  private def retrievalMmr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val quant = KMeansOps.kmQuant(spark, sfDir)
    val probes = quant.filter($"vec_id" < MmrProbes.toLong)
      .select($"vec_id".as("probe_id"), $"e".as("pe"))
    val rel = quant.crossJoin(broadcast(probes))
      .filter($"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id".as("cand_id"),
        PqOps.dotInt($"e", $"pe").as("rel"), $"e")
    val w = Window.partitionBy($"probe_id").orderBy($"rel".desc, $"cand_id".asc)
    val cands = rel.withColumn("rn", row_number().over(w))
      .filter($"rn" <= MmrCand)
      .select($"probe_id", $"cand_id", $"rel", $"e")
      .as[(Long, Long, Long, Seq[Long])]
    cands.groupByKey(_._1)
      .flatMapGroups { (probe, it) =>
        val cs = it.map { case (_, c, r, e) => (c, r, e.toArray) }.toArray
          .sortBy(x => (-x._2, x._1))
        def dot(a: Array[Long], b: Array[Long]): Long = {
          var s = 0L; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }; s
        }
        val selected = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Array[Long])]
        val out = Vector.newBuilder[(Long, Long, Long, Long, Long)]
        for (t <- 1 to MmrK if selected.size < cs.length) {
          val scoredLeft = cs.filter(c => !selected.exists(_._1 == c._1))
            .map { case (c, r, e) =>
              val maxSim =
                if (selected.isEmpty) 0L
                else selected.map(s => dot(e, s._3)).max
              (c, r, 7L * r - 3L * maxSim, e)
            }
          val pick = scoredLeft.minBy { case (c, _, s, _) => (-s, c) }
          selected += ((pick._1, pick._2, pick._4))
          out += ((probe, t.toLong, pick._1, pick._2, pick._3))
        }
        out.result()
      }
      .toDF("probe_id", "sel_rank", "cand_id", "rel", "mmr_score")
      .orderBy($"probe_id".asc_nulls_first, $"sel_rank".asc_nulls_first)
  }

  /** The greedy unrolled: selN picks step N's argmax over candidates not
    * yet selected, with max-sim computed against sel1..selN-1 (every
    * candidate pair has a sims row, so the inner join is total).
    */
  private val retrievalMmrOracle = {
    def prev(t: Int) = (1 until t)
      .map(i => s"SELECT probe_id, cand_id FROM sel$i")
      .mkString("(", " UNION ALL ", ")")
    def sel(t: Int) = s"""
    sel$t AS (
      SELECT probe_id, cand_id, rel, mmr FROM (
        SELECT x.*, row_number() OVER (PARTITION BY probe_id
          ORDER BY mmr DESC, cand_id ASC) AS rn
        FROM (
          SELECT c.probe_id, c.cand_id, c.rel,
            7 * c.rel - 3 * max(s.s) AS mmr
          FROM cands c
          JOIN ${prev(t)} p ON p.probe_id = c.probe_id
          JOIN sims s ON s.probe_id = c.probe_id
            AND s.a = c.cand_id AND s.b = p.cand_id
          LEFT JOIN ${prev(t)} e
            ON e.probe_id = c.probe_id AND e.cand_id = c.cand_id
          WHERE e.cand_id IS NULL
          GROUP BY 1, 2, 3) x) WHERE rn = 1)"""
    val steps = (2 to MmrK).map(sel).mkString(",")
    val finalRows = (1 to MmrK)
      .map(t => s"SELECT probe_id, CAST($t AS BIGINT) AS sel_rank, cand_id, rel, mmr FROM sel$t")
      .mkString("\n      UNION ALL ")
    s"""
    WITH quant AS (
      SELECT vec_id, CAST(pos AS BIGINT) AS pos,
        CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS e
      FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              unnest(embedding) AS v
            FROM embeddings)),
    rel AS (
      SELECT p.vec_id AS probe_id, q.vec_id AS cand_id,
        CAST(sum(p.e * q.e) AS BIGINT) AS rel
      FROM quant p JOIN quant q USING (pos)
      WHERE p.vec_id < $MmrProbes AND q.vec_id <> p.vec_id
      GROUP BY 1, 2),
    cands AS MATERIALIZED (
      SELECT probe_id, cand_id, rel FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
          ORDER BY rel DESC, cand_id ASC) AS rn
        FROM rel) WHERE rn <= $MmrCand),
    sims AS MATERIALIZED (
      SELECT c1.probe_id, c1.cand_id AS a, c2.cand_id AS b,
        CAST(sum(qa.e * qb.e) AS BIGINT) AS s
      FROM cands c1
      JOIN cands c2 ON c1.probe_id = c2.probe_id
        AND c1.cand_id <> c2.cand_id
      JOIN quant qa ON qa.vec_id = c1.cand_id
      JOIN quant qb ON qb.vec_id = c2.cand_id AND qb.pos = qa.pos
      GROUP BY 1, 2, 3),
    sel1 AS (
      SELECT probe_id, cand_id, rel, 7 * rel AS mmr FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
          ORDER BY rel DESC, cand_id ASC) AS rn
        FROM cands) WHERE rn = 1),
    $steps
    SELECT probe_id, sel_rank, cand_id, rel, CAST(mmr AS BIGINT) AS mmr_score
    FROM ($finalRows)
    ORDER BY probe_id ASC NULLS FIRST, sel_rank ASC NULLS FIRST"""
  }

  override val queries: Vector[Q] = Vector(
    Q("q_sim_ann_ivfpq", ivfPq, Some(ivfPqOracle)),
    Q("q_retrieval_mmr", retrievalMmr, Some(retrievalMmrOracle)),
  )
}
