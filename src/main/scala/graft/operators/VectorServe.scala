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

  private val HnswM = 8       // kNN out-degree before symmetrization
  private val HnswBeam = 8    // beam width
  private val HnswRounds = 5  // bounded greedy expansion rounds
  private val HnswEntryMod = 16 // entry layer: every 16th id (the coarse layer)
  private val HnswProbes = 10L
  private val HnswK = 3
  private val HnswBuildCells = 4   // IVF seeding: bucket each vector into its 4 nearest cells
  private val HnswDescentRounds = 3 // bounded NN-descent refinement passes

  /** HNSW-FLAVOR NAVIGABLE-GRAPH ANN (round 15; r14 VERDICT task 5) — the
    * graph-index family FAISS/hnswlib serve from RAM, re-expressed as the
    * bounded-round distributed flavor: the INDEX is (a) a navigable
    * small-world GRAPH — every vector's [[HnswM]] exact nearest neighbors
    * by integer squared-L2 on the [[KMeansOps.kmQuant]] quantized grid,
    * (d2, id) ties — and (b) a coarse ENTRY LAYER (every [[HnswEntryMod]]th
    * id), standing in for HNSW's upper layers: real HNSW descends
    * log-many sparse layers to land a good entry point; a fixed coarse
    * sample is the layer-free equivalent with the same contract (start
    * near the query, let the graph walk finish). SEARCH is beam descent:
    * score the entry layer per probe, keep the best [[HnswBeam]], then
    * for [[HnswRounds]] rounds expand the beam along graph edges, rescore
    * and re-trim — each round one equi-join against the edge leaf + one
    * per-probe top-B window, all exact int64 (a float beam could flap on
    * ties; this one is bit-deterministic, which is what makes the recall
    * spec meaningful). Output: top-[[HnswK]] per probe.
    *
    * CAPABILITY-ONLY by nature (SURVEY §2.0.4): beam-search results are a
    * path-dependent property of the index walk — no cross-engine SQL
    * oracle states them — so like the sketch family it is graded by (1)
    * running under the driver with rows > 0, (2) a recall@3 ≥ bound spec
    * against the exact brute-force twin at TWO SFs (the
    * q_sim_ann_recall_eval acceptance-gate pattern), and (3) the shared
    * index leaves being exact by construction.
    *
    * Scale (round 16 — the r15 VERDICT #1 fix): the graph BUILD is no
    * longer a corpus×corpus pass. It is the IVF-seeded + NN-descent
    * construction its r15 doc named as the real-scale form:
    *  1. SEED — every vector buckets into its [[HnswBuildCells]] nearest
    *    trained k-means cells (one broadcast score against the k-row
    *    centroid leaf — linear in N), and candidate edges are pairs
    *    SHARING a bucket: an equi-join on `cell`, cost Σ|cell|², bounded
    *    by the max cell size, never N².
    *  2. REFINE — [[HnswDescentRounds]] NN-descent passes (Dong et al.,
    *    WWW'11): a neighbor of a neighbor is likely a neighbor, so each
    *    round's candidates are the current UNDIRECTED edges plus their
    *    2-hop expansion — ≤ (2M)² per vector, constant per round — scored
    *    exactly and re-trimmed to top-[[HnswM]] per src. Cross-cell true
    *    neighbors missed by seeding propagate in along shared neighbors.
    * Every join in the build is an equi-join on cell or vec_id (centroid
    * routing is JOIN-FREE: k-bounded literal scoring); Round16Spec asserts every
    * executed build stage contains NO CartesianProduct and NO
    * BroadcastNestedLoopJoin — the quadratic shape is structurally
    * excluded, not just avoided on the fixture. Serve cost per probe is
    * rounds × beam × M candidate scores + window trims, INDEPENDENT of
    * corpus size — the property that makes graph ANN the RAM-serve
    * standard. The beam iteration is |beam ∪ expansion| rows per probe
    * per round, never a corpus scan.
    */
  /** The DIRECTED post-descent kNN graph as its own memo leaf (round 19):
    * the one build now feeds both the graded kNN-graph operator
    * (q_sim_nn_descent) and — symmetrized — the HNSW serve graph. */
  private[graft] def hnswDirectedLeaf(spark: SparkSession,
                                      sfDir: String): DataFrame =
    GraphOps.memoEdgeLeaf(spark, sfDir, "hnswKnnDir") {
      hnswDirectedPlan(spark, sfDir, _.localCheckpoint(true))
    }

  private[graft] def hnswGraphLeaf(spark: SparkSession,
                                   sfDir: String): DataFrame =
    GraphOps.memoEdgeLeaf(spark, sfDir, "hnswGraph") {
      val knn = hnswDirectedLeaf(spark, sfDir)
      import spark.implicits._
      knn.unionByName(knn.select($"dst".as("src"), $"src".as("dst")))
        .distinct()
    }

  /** The un-memoized build plan (exposed so the plan-shape spec can check
    * the EXECUTED join strategies; the leaf above only ever shows the
    * checkpoint scan). Intermediate rounds eagerly localCheckpoint —
    * the iterative-refinement lineage otherwise doubles per round. The
    * `stage` hook IS that boundary: the spec swaps in a spy that records
    * each pre-checkpoint frame, so every join the build ever executes is
    * covered by some recorded stage's executedPlan (buckets/cand0 live
    * inside stage 1's lineage; each descent round is its own stage; the
    * symmetrize is the returned frame).
    */
  private[graft] def hnswBuildPlan(spark: SparkSession, sfDir: String,
      stage: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    import spark.implicits._
    // SYMMETRIZE (the hnswlib bidirectional-link step): a kNN digraph
    // strands vectors nothing points AT; undirected edges restore the
    // navigability the walk depends on (measured at sf0.1: directed
    // recall@3 0.53 → symmetrized 1.0 with M=8/5 rounds). Degree ≤ 2·M.
    val knn = hnswDirectedPlan(spark, sfDir, stage)
    knn.unionByName(knn.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
  }

  /** The directed build (seed + descent, pre-symmetrization) — see
    * [[hnswBuildPlan]] for the stage-spy contract. */
  private def hnswDirectedPlan(spark: SparkSession, sfDir: String,
      stage: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    val q = KMeansOps.kmQuant(spark, sfDir)
    // Multi-assignment: top-HnswBuildCells cells per vector, with NO join
    // for the routing at all — the k trained centroids are a k-bounded
    // driver collect (the pcaDirection precedent, within the house
    // driver-bound policy) scored as a k×Dim literal expression, then
    // array_sort picks the nearest cells per row. One codegen'd corpus
    // scan, zero shuffle; at 100 TB the centroid set is still k rows.
    val cents = KMeansOps.kmCentroids(spark, sfDir)
      .orderBy($"cell".asc).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val cellScores = array(cents.map { case (cell, c) =>
      val cCol = array(c.map(lit(_)): _*)
      struct(sqDist($"e", cCol).as("d2"), lit(cell).as("cell"))
    }: _*)
    val buckets = q
      .select($"vec_id",
        explode(slice(array_sort(cellScores), 1, HnswBuildCells)).as("sc"))
      .select($"sc.cell".as("cell"), $"vec_id")
    // Seed candidates: pairs sharing a bucket — an equi-join on cell.
    val cand0 = buckets
      .join(buckets.select($"cell", $"vec_id".as("dst")), Seq("cell"))
      .filter($"vec_id" =!= $"dst")
      .select($"vec_id".as("src"), $"dst")
      .distinct()
    // Exact int64 scoring + top-M trim — the same grid and tie contract
    // ((d2, dst) asc) the r15 exact build used, so the graph is
    // bit-deterministic given its candidate sets.
    def scoreTrim(cands: DataFrame): DataFrame = {
      val a = q.select($"vec_id".as("src"), $"e".as("se"))
      val b = q.select($"vec_id".as("dst"), $"e".as("de"))
      val w = Window.partitionBy($"src").orderBy($"d2".asc, $"dst".asc)
      cands.join(a, Seq("src")).join(b, Seq("dst"))
        .select($"src", $"dst", sqDist($"se", $"de").as("d2"))
        .withColumn("rn", row_number().over(w)).filter($"rn" <= HnswM)
        .select($"src", $"dst")
    }
    var knn = stage(scoreTrim(cand0))
    for (_ <- 1 to HnswDescentRounds) {
      val und = knn
        .unionByName(knn.select($"dst".as("src"), $"src".as("dst")))
        .distinct()
      val hop2 = und.select($"src", $"dst".as("mid"))
        .join(und.select($"src".as("mid"), $"dst"), Seq("mid"))
        .filter($"src" =!= $"dst")
        .select($"src", $"dst")
      knn = stage(scoreTrim(und.unionByName(hop2).distinct()))
    }
    knn
  }

  /** DuckDB replay oracle (round 19; r18 VERDICT task 2 — the discipline
    * that made q_graph_walks_biased gradeable): the beam search is
    * path-dependent but DETERMINISTIC — every stage is exact int64
    * arithmetic with total-order ties — so the oracle REPLAYS the entire
    * pipeline relationally: Lloyd's training ([[KMeansOps.kmeansCtes]],
    * already the IVF oracles' text), top-4 cell multi-assignment, the
    * bucket-pair candidate seed, [[HnswDescentRounds]] NN-descent rounds
    * (undirected + 2-hop expansion → exact score → top-[[HnswM]] trim),
    * symmetrization, and [[HnswRounds]] beam rounds (edge expansion minus
    * the current beam → score → top-[[HnswBeam]] trim). Round CTEs are
    * MATERIALIZED (DuckDB inlines CTEs; a chain referencing each round
    * 2-3x re-evaluates multiplicatively otherwise — the louvain-coarse
    * lesson), and pair scoring runs on the LONG (vec_id, pos, e) form so
    * the d2 aggregation vectorizes instead of paying per-row lambdas. */
  // Exact top-HnswM trim of a candidate-pair CTE by (d2, dst) — the
  // scoreTrim twin. Shared by the HNSW and NN-descent oracles.
  private def scoreTrimSql(cand: String): String = s"""
      SELECT src, dst FROM (
        SELECT src, dst, row_number() OVER
          (PARTITION BY src ORDER BY d2 ASC, dst ASC) AS rn
        FROM (SELECT c.src, c.dst, sum((a.e - b.e) * (a.e - b.e)) AS d2
              FROM $cand c
              JOIN quant a ON a.vec_id = c.src
              JOIN quant b ON b.vec_id = c.dst AND b.pos = a.pos
              GROUP BY 1, 2)) WHERE rn <= $HnswM"""

  /** The shared build-replay CTE chain (kmeans training → IVF-seeded
    * buckets → bucket-pair seed → NN-descent rounds → the directed
    * knn$HnswDescentRounds graph) — the WITH body both the NN-descent
    * and HNSW oracles start from. */
  private val hnswKnnCtes: String = {
    val descent = (1 to HnswDescentRounds).map { r =>
      s"""
    und$r AS MATERIALIZED (
      SELECT src, dst FROM knn${r - 1}
      UNION SELECT dst, src FROM knn${r - 1}),
    cand$r AS MATERIALIZED (
      SELECT src, dst FROM und$r
      UNION
      SELECT a.src, b.dst FROM und$r a
      JOIN und$r b ON a.dst = b.src AND a.src <> b.dst),
    knn$r AS MATERIALIZED (${scoreTrimSql(s"cand$r")})"""
    }.mkString(",")
    s"""${KMeansOps.kmeansCtes},
    buckets AS MATERIALIZED (
      SELECT cell, vec_id FROM (
        SELECT vec_id, cell, row_number() OVER
          (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM (SELECT q.vec_id, c.cell, sum((q.e - c.c) * (q.e - c.c)) AS d2
              FROM quant q JOIN cent3 c USING (pos) GROUP BY 1, 2))
      WHERE rn <= $HnswBuildCells),
    cand0 AS MATERIALIZED (
      SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
      FROM buckets a JOIN buckets b USING (cell)
      WHERE a.vec_id <> b.vec_id),
    knn0 AS MATERIALIZED (${scoreTrimSql("cand0")}),$descent"""
  }

  private val simAnnHnswOracle: String = {
    // Exact (probe, cand) scoring of a pair CTE — the serve-side score.
    def pairScoreSql(pairs: String): String = s"""
      SELECT pr.probe_id, pr.cand_id,
        CAST(sum((a.e - b.e) * (a.e - b.e)) AS BIGINT) AS d2
      FROM $pairs pr
      JOIN quant a ON a.vec_id = pr.probe_id
      JOIN quant b ON b.vec_id = pr.cand_id AND b.pos = a.pos
      GROUP BY 1, 2"""
    val beams = (1 to HnswRounds).map { r =>
      s"""
    expand$r AS (
      SELECT DISTINCT b.probe_id, g.dst AS cand_id
      FROM beam${r - 1} b JOIN graph g ON g.src = b.cand_id
      WHERE NOT EXISTS (SELECT 1 FROM beam${r - 1} x
        WHERE x.probe_id = b.probe_id AND x.cand_id = g.dst)),
    beam$r AS MATERIALIZED (
      SELECT probe_id, cand_id, d2 FROM (
        SELECT probe_id, cand_id, d2, row_number() OVER
          (PARTITION BY probe_id ORDER BY d2 ASC, cand_id ASC) AS rn
        FROM (${pairScoreSql(s"expand$r")}
              UNION ALL
              SELECT probe_id, cand_id, d2 FROM beam${r - 1}))
      WHERE rn <= $HnswBeam)"""
    }.mkString(",")
    s"""
    WITH $hnswKnnCtes,
    graph AS MATERIALIZED (
      SELECT src, dst FROM knn$HnswDescentRounds
      UNION SELECT dst, src FROM knn$HnswDescentRounds),
    pairs0 AS (
      SELECT p.vec_id AS probe_id, e.vec_id AS cand_id
      FROM (SELECT DISTINCT vec_id FROM quant WHERE vec_id < $HnswProbes) p
      CROSS JOIN (SELECT DISTINCT vec_id FROM quant
                  WHERE vec_id % $HnswEntryMod = 0) e),
    beam0 AS MATERIALIZED (
      SELECT probe_id, cand_id, d2 FROM (
        SELECT probe_id, cand_id, d2, row_number() OVER
          (PARTITION BY probe_id ORDER BY d2 ASC, cand_id ASC) AS rn
        FROM (${pairScoreSql("pairs0")})) WHERE rn <= $HnswBeam),$beams
    SELECT probe_id, CAST(rn AS BIGINT) AS rank, cand_id, d2 FROM (
      SELECT probe_id, cand_id, d2, row_number() OVER
        (PARTITION BY probe_id ORDER BY d2 ASC, cand_id ASC) AS rn
      FROM beam$HnswRounds WHERE cand_id <> probe_id) WHERE rn <= $HnswK
    ORDER BY probe_id ASC NULLS FIRST, rank ASC NULLS FIRST"""
  }

  /** kNN-GRAPH CONSTRUCTION via IVF-seeded NN-DESCENT, graded as its own
    * operator (round 19) — the graph build HNSW rides promoted to a
    * first-class product surface: the approximate-kNN graph is what
    * corpus-scale clustering, graph-based dedup and label propagation
    * consume directly (Dong et al., WWW'11 is the standard construction
    * at scale). Output: every vector's final top-[[HnswM]] DIRECTED
    * neighbors after [[HnswDescentRounds]] descent rounds, ranked with
    * exact int64 d2 — the same memoized leaf the HNSW serve symmetrizes,
    * so the graded hash pins the exact index the beam search walks. The
    * oracle replays the whole build relationally (the shared
    * [[hnswKnnCtes]] chain) and rescores the final edges.
    *
    * Scale: the build is the declared HNSW-build shape (cell equi-join
    * seed bounded by Σ|cell|², ≤(2M)²-per-vector descent candidates, no
    * cartesian — Round16Spec pins the executed stages); the graded
    * rescore is one |V|·M-row equi-join pass + a per-src window. */
  private def simNnDescent(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val q = KMeansOps.kmQuant(spark, sfDir)
    val knn = hnswDirectedLeaf(spark, sfDir)
    val a = q.select($"vec_id".as("src"), $"e".as("se"))
    val b = q.select($"vec_id".as("dst"), $"e".as("de"))
    val w = Window.partitionBy($"src").orderBy($"d2".asc, $"dst".asc)
    knn.join(a, Seq("src")).join(b, Seq("dst"))
      .select($"src", $"dst", sqDist($"se", $"de").as("d2"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select($"src", $"rank", $"dst", $"d2")
      .orderBy($"src".asc_nulls_first, $"rank".asc_nulls_first)
  }

  private val simNnDescentOracle: String = s"""
    WITH $hnswKnnCtes,
    scored AS (
      SELECT c.src, c.dst,
        CAST(sum((a.e - b.e) * (a.e - b.e)) AS BIGINT) AS d2
      FROM knn$HnswDescentRounds c
      JOIN quant a ON a.vec_id = c.src
      JOIN quant b ON b.vec_id = c.dst AND b.pos = a.pos
      GROUP BY 1, 2)
    SELECT src, CAST(rn AS BIGINT) AS rank, dst, d2 FROM (
      SELECT src, dst, d2, row_number() OVER
        (PARTITION BY src ORDER BY d2 ASC, dst ASC) AS rn
      FROM scored)
    ORDER BY src ASC NULLS FIRST, rank ASC NULLS FIRST"""

  private def simAnnHnsw(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val quant = KMeansOps.kmQuant(spark, sfDir)
    val graph = hnswGraphLeaf(spark, sfDir)
    val probes = quant.filter($"vec_id" < HnswProbes)
      .select($"vec_id".as("probe_id"), $"e".as("pe"))
    val corpus = quant.select($"vec_id".as("cand_id"), $"e".as("ce"))
    def score(cands: DataFrame): DataFrame =
      cands.join(corpus, Seq("cand_id"))
        .join(broadcast(probes), Seq("probe_id"))
        .select($"probe_id", $"cand_id", sqDist($"pe", $"ce").as("d2"))
    def trim(scored: DataFrame, k: Int): DataFrame = {
      val w = Window.partitionBy($"probe_id")
        .orderBy($"d2".asc, $"cand_id".asc)
      scored.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
    }
    val entries = quant
      .filter(pmod($"vec_id", lit(HnswEntryMod)) === 0)
      .select($"vec_id".as("cand_id"))
    // Each round's beam is MATERIALIZED (eager localCheckpoint of
    // |probes|·beam rows — bounded by construction): the loop references
    // the beam twice per round (expansion join + union), so a lazy plan
    // would double per round and re-execute round 0 2^rounds times
    // (measured: 27 s lazy → sub-second materialized). This is the
    // declared serve shape — a real graph index holds its frontier, it
    // does not replay the walk.
    var beam = trim(score(probes.select($"probe_id").crossJoin(entries)),
      HnswBeam).select($"probe_id", $"cand_id", $"d2")
      .localCheckpoint(true)
    (1 to HnswRounds).foreach { _ =>
      val expanded = beam
        .join(graph, beam("cand_id") === graph("src"))
        .select($"probe_id", $"dst".as("cand_id")).distinct()
        .join(beam.select($"probe_id", $"cand_id"),
          Seq("probe_id", "cand_id"), "left_anti")
      beam = trim(score(expanded)
          .unionByName(beam.select($"probe_id", $"cand_id", $"d2")),
        HnswBeam).select($"probe_id", $"cand_id", $"d2")
        .localCheckpoint(true)
    }
    trim(beam.filter($"cand_id" =!= $"probe_id"), HnswK)
      .select($"probe_id", $"rn".cast("long").as("rank"), $"cand_id", $"d2")
      .orderBy($"probe_id".asc_nulls_first, $"rank".asc_nulls_first)
  }

  /** Spec hook: exact brute-force top-k per probe on the same quantized
    * grid and tie contract — the recall ground truth. */
  private[graft] def hnswGroundTruth(spark: SparkSession,
                                     sfDir: String): DataFrame = {
    import spark.implicits._
    val quant = KMeansOps.kmQuant(spark, sfDir)
    val probes = quant.filter($"vec_id" < HnswProbes)
      .select($"vec_id".as("probe_id"), $"e".as("pe"))
    val scored = quant.select($"vec_id".as("cand_id"), $"e".as("ce"))
      .join(broadcast(probes), $"cand_id" =!= $"probe_id")
      .select($"probe_id", $"cand_id", sqDist($"pe", $"ce").as("d2"))
    val w = Window.partitionBy($"probe_id").orderBy($"d2".asc, $"cand_id".asc)
    scored.withColumn("rn", row_number().over(w)).filter($"rn" <= HnswK)
      .select($"probe_id", $"cand_id")
  }

  // Operating point measured against the FIXTURE embeddings, which are
  // isotropic (not Matryoshka-trained — no model packs coarse semantics
  // into their leading dims), so truncation is honestly lossy: recall@5 of
  // a 16-dim prefix with a 20-candidate shortlist is 0.16-0.38. The
  // declared config is the conservative one that holds a >= 0.9 recall
  // gate on isotropic data (measured 1.0 / 0.96 at sf0.001 / sf0.1); an
  // MRL-trained corpus would dial MrlPrefix down to d/4 or d/8 with the
  // same plan. The funnel's cost structure — prefix-bytes scan + bounded
  // rerank — is what's graded; the ratio is data-dependent tuning.
  private val MrlPrefix = 48 // prefix dims scored in the cheap first pass
  private val MrlShort = 64  // shortlist per probe handed to the rerank
  private val MrlK = 5
  private val MrlProbes = 10

  /** dot(a,b) in double via codegen'd higher-order functions — index-order
    * accumulation, the [[graft.operators.LlmPipeline]] cosine contract, so
    * the rounded values are bit-identical to the oracle's unnest fold. */
  private def mrlDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def mrlCos(a: Column, b: Column): Column =
    round(mrlDot(a, b) / (sqrt(mrlDot(a, a)) * sqrt(mrlDot(b, b))), 4)

  private def mrlCosSql(a: String, b: String): String = s"""(
      SELECT round(sum(CAST(r[1] AS DOUBLE) * CAST(r[2] AS DOUBLE))
             / (sqrt(sum(CAST(r[1] AS DOUBLE) * CAST(r[1] AS DOUBLE)))
                * sqrt(sum(CAST(r[2] AS DOUBLE) * CAST(r[2] AS DOUBLE)))), 4)
      FROM (SELECT unnest(list_zip($a, $b)) AS r))"""

  /** MATRYOSHKA FUNNEL SEARCH (round 16) — the MRL serving pattern: score
    * the whole corpus on the [[MrlPrefix]]-dim PREFIX of each embedding
    * (Matryoshka-trained models pack coarse semantics into the leading
    * dims), keep a [[MrlShort]]-per-probe shortlist, then rerank ONLY the
    * shortlist at full dimension and emit top-[[MrlK]]. Ranking ties pin
    * determinism: both passes rank on the 4dp-rounded cosine with cand_id
    * ascending as the tiebreak (the q_sim_knn_bruteforce contract).
    *
    * Scale: the corpus-wide pass touches prefix/d of every vector's bytes
    * (a scan-IO cut under dimension-split storage; prefix cost also
    * compounds with any upstream IVF/LSH pruning — the funnel composes
    * with, not replaces, the bucketed indexes), probes are a broadcast,
    * per-probe shortlists come from WindowGroupLimit partial top-k on
    * each scan partition (no global sort), and the full-dim rerank reads
    * exactly |probes|·[[MrlShort]] vectors. Recall is gated ≥ 0.9 vs the
    * exact full-dim top-k in Round16BSpec at two SFs.
    */
  private def simMatryoshka(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Catalog.load(spark, sfDir, "embeddings")
    val probes = e.filter($"vec_id" < MrlProbes)
      .select($"vec_id".as("probe_id"), $"embedding".as("pe"))
    val cands = e.select($"vec_id".as("cand_id"), $"embedding".as("ce"))
    val scored = cands.join(broadcast(probes), $"cand_id" =!= $"probe_id")
      .select($"probe_id", $"cand_id", $"pe", $"ce",
        mrlCos(slice($"pe", 1, MrlPrefix), slice($"ce", 1, MrlPrefix))
          .as("cos_pre"))
    val wPre = Window.partitionBy($"probe_id")
      .orderBy($"cos_pre".desc, $"cand_id".asc)
    val short = scored.withColumn("rn", row_number().over(wPre))
      .filter($"rn" <= MrlShort)
    val wFull = Window.partitionBy($"probe_id")
      .orderBy($"cos_full".desc, $"cand_id".asc)
    short.select($"probe_id", $"cand_id",
        mrlCos($"pe", $"ce").as("cos_full"))
      .withColumn("rank", row_number().over(wFull).cast("long"))
      .filter($"rank" <= MrlK)
      .select($"probe_id", $"rank", $"cand_id", $"cos_full")
      .orderBy($"probe_id".asc_nulls_first, $"rank".asc_nulls_first)
  }

  private val simMatryoshkaOracle = s"""
    WITH p AS (
      SELECT vec_id AS probe_id, embedding AS pe
      FROM embeddings WHERE vec_id < $MrlProbes),
    c AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
    pre AS (
      SELECT probe_id, cand_id, pe, ce,
        ${mrlCosSql(s"list_slice(pe, 1, $MrlPrefix)",
          s"list_slice(ce, 1, $MrlPrefix)")} AS cos_pre
      FROM c JOIN p ON cand_id <> probe_id),
    short AS (
      SELECT probe_id, cand_id, pe, ce FROM (
        SELECT pre.*, row_number() OVER (
          PARTITION BY probe_id ORDER BY cos_pre DESC, cand_id ASC) AS rn
        FROM pre) s
      WHERE rn <= $MrlShort),
    rr AS (
      SELECT probe_id, cand_id, ${mrlCosSql("pe", "ce")} AS cos_full
      FROM short)
    SELECT probe_id, CAST(rnk AS BIGINT) AS rank, cand_id, cos_full FROM (
      SELECT rr.*, row_number() OVER (
        PARTITION BY probe_id ORDER BY cos_full DESC, cand_id ASC) AS rnk
      FROM rr) f
    WHERE rnk <= $MrlK
    ORDER BY probe_id ASC NULLS FIRST, rank ASC NULLS FIRST"""

  /** Spec hook: exact full-dim top-[[MrlK]] per probe under the same
    * rounded-cosine tie contract — the funnel's recall ground truth. */
  private[graft] def mrlGroundTruth(spark: SparkSession,
                                    sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Catalog.load(spark, sfDir, "embeddings")
    val probes = e.filter($"vec_id" < MrlProbes)
      .select($"vec_id".as("probe_id"), $"embedding".as("pe"))
    val scored = e.select($"vec_id".as("cand_id"), $"embedding".as("ce"))
      .join(broadcast(probes), $"cand_id" =!= $"probe_id")
      .select($"probe_id", $"cand_id", mrlCos($"pe", $"ce").as("cos_full"))
    val w = Window.partitionBy($"probe_id")
      .orderBy($"cos_full".desc, $"cand_id".asc)
    scored.withColumn("rn", row_number().over(w)).filter($"rn" <= MrlK)
      .select($"probe_id", $"cand_id")
  }

  private val MsProbes = 8
  private val MsTokens = 4
  private val MsTokDim = 16
  private val MsTokTopK = 20
  private val MsK = 5

  /** Integer dot over two quantized token slices (codegen'd HOFs). */
  private def msDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), _ + _)

  /** Token `t` (0-based) of a quantized vector: the contiguous
    * [[MsTokDim]]-dim slice — the multi-vector reinterpretation of the
    * fixture's 64-dim embedding as [[MsTokens]] token embeddings. */
  private def msTok(e: Column, t: Int): Column =
    slice(e, t * MsTokDim + 1, MsTokDim)

  private def msDotSql(a: String, b: String): String =
    s"""CAST((SELECT sum(r[1] * r[2])
        FROM (SELECT unnest(list_zip($a, $b)) AS r)) AS BIGINT)"""

  private def msTokSql(e: String, t: Int): String =
    s"list_slice($e, ${t * MsTokDim + 1}, ${(t + 1) * MsTokDim})"

  /** MULTI-VECTOR LATE-INTERACTION RETRIEVAL / MaxSim (round 17; r16
    * VERDICT task 2) — the ColBERT-style scoring a training-data pipeline
    * runs for hard-negative mining, upgrading the pack's single-vector
    * surface: each document is a BAG of token embeddings ([[MsTokens]]
    * contiguous [[MsTokDim]]-dim slices of the quantized fixture vector —
    * a deterministic multi-vector reinterpretation both engines construct
    * identically), and score(q, d) = Σ_{query token} max_{doc token}
    * ⟨qt, dt⟩. All arithmetic is INTEGER (the kmQuant 10^6 grid), so
    * token dots, maxes and the final sum are engine-exact — no rounding
    * contract needed anywhere.
    *
    * Two-stage funnel, the REAL ColBERT candidate pipeline: stage 1 is
    * TOKEN-LEVEL single-vector retrieval — every query token searches the
    * doc-token space and keeps its [[MsTokTopK]] best doc tokens (a naive
    * pooled-doc-vector filter was measured at 0.175 recall on isotropic
    * fixtures and rejected); the candidate set is the UNION of docs owning
    * a retrieved token, so stage 2's exact 4×4 late interaction runs on a
    * candidate-bounded pair set, never corpus × corpus. Ranking ties
    * break on (cand_id, token id), engine-exact under integer scores.
    *
    * Scale: stage 1 broadcasts the probe tokens (|probes|·[[MsTokens]]
    * rows) and scores doc tokens map-side — one corpus-token pass, no
    * shuffle of the corpus; at 100 TB the token search rides the IVF
    * cell route of q_sim_ann_ivf_serve over the token table instead —
    * this exact form is its graded baseline. Stage 2 touches ≤
    * |probes|·[[MsTokens]]·[[MsTokTopK]] candidate pairs, each scoring
    * [[MsTokens]]² static codegen'd integer slice-dots — bounded work
    * independent of corpus size. */
  private def simMaxsim(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Catalog.load(spark, sfDir, "embeddings")
      .select($"vec_id",
        transform($"embedding",
          v => floor(v.cast("double") * lit(1000000d)).cast("long")).as("e"))
    val ts = 0 until MsTokens
    val probes = e.filter($"vec_id" < MsProbes)
      .select($"vec_id".as("probe_id"), $"e".as("pe"))
    val ptok = probes.select($"probe_id", $"pe",
        posexplode(array(ts.map(t => msTok($"pe", t)): _*)).as(Seq("qt", "qv")))
    val dtok = e.select($"vec_id".as("cand_id"), $"e".as("ce"),
      posexplode(array(ts.map(t => msTok($"e", t)): _*)).as(Seq("td", "tv")))
    val s1 = dtok.join(broadcast(ptok), $"cand_id" =!= $"probe_id")
      .select($"probe_id", $"qt", $"cand_id", $"td",
        msDot($"qv", $"tv").as("d1"))
    val w1 = Window.partitionBy($"probe_id", $"qt")
      .orderBy($"d1".desc, $"cand_id".asc, $"td".asc)
    val cand = s1.withColumn("rn", row_number().over(w1))
      .filter($"rn" <= MsTokTopK)
      .select($"probe_id", $"cand_id").distinct()
    val maxsim = ts.map { tq =>
      greatest(ts.map(td => msDot(msTok($"pe", tq), msTok($"ce", td))): _*)
    }.reduce(_ + _)
    val w = Window.partitionBy($"probe_id")
      .orderBy($"maxsim".desc, $"cand_id".asc)
    cand
      .join(broadcast(probes), Seq("probe_id"))
      .join(e.select($"vec_id".as("cand_id"), $"e".as("ce")), Seq("cand_id"))
      .select($"probe_id", $"cand_id", maxsim.as("maxsim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= MsK)
      .select($"probe_id", $"rank", $"cand_id", $"maxsim")
      .orderBy($"probe_id".asc_nulls_first, $"rank".asc_nulls_first)
  }

  private val simMaxsimOracle: String = {
    val ts = 0 until MsTokens
    val maxsim = ts.map { tq =>
      "greatest(" + ts.map(td =>
        msDotSql(msTokSql("pe", tq), msTokSql("q.e", td))).mkString(", ") + ")"
    }.mkString(" + ")
    val tList = (0 until MsTokens).mkString("[", ", ", "]")
    s"""
    WITH q AS (
      SELECT vec_id, list_transform(embedding,
        v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS e
      FROM embeddings),
    p AS (SELECT vec_id AS probe_id, e AS pe FROM q WHERE vec_id < $MsProbes),
    ptok AS (
      SELECT probe_id, t.qt,
        list_slice(pe, t.qt * $MsTokDim + 1, (t.qt + 1) * $MsTokDim) AS qv
      FROM p, (SELECT unnest($tList) AS qt) t),
    dtok AS (
      SELECT vec_id AS cand_id, t.td,
        list_slice(e, t.td * $MsTokDim + 1, (t.td + 1) * $MsTokDim) AS tv
      FROM q, (SELECT unnest($tList) AS td) t),
    s1 AS (
      SELECT probe_id, qt, cand_id, td, ${msDotSql("qv", "tv")} AS d1
      FROM dtok JOIN ptok ON cand_id <> probe_id),
    cand AS (
      SELECT DISTINCT probe_id, cand_id FROM (
        SELECT s1.*, row_number() OVER (
          PARTITION BY probe_id, qt
          ORDER BY d1 DESC, cand_id ASC, td ASC) AS rn
        FROM s1) s
      WHERE rn <= $MsTokTopK),
    m AS (
      SELECT c.probe_id, c.cand_id, CAST($maxsim AS BIGINT) AS maxsim
      FROM cand c
      JOIN p ON p.probe_id = c.probe_id
      JOIN q ON q.vec_id = c.cand_id)
    SELECT probe_id, CAST(rnk AS BIGINT) AS rank, cand_id, maxsim FROM (
      SELECT m.*, row_number() OVER (
        PARTITION BY probe_id ORDER BY maxsim DESC, cand_id ASC) AS rnk
      FROM m) f
    WHERE rnk <= $MsK
    ORDER BY probe_id ASC NULLS FIRST, rank ASC NULLS FIRST"""
  }

  private val MsLshBands = 2
  private val MsLshPlanes = 6 // per band; OR across bands amplifies recall

  /** Integer hyperplane dot for token LSH: weights from the suite's LCG
    * (global plane index g, position pos → w = LCG(g·16+pos) % 2001 −
    * 1000), dot over the 16-dim quantized token — EXACT int64, so the
    * sign test needs no rounding contract at all (the double-LSH query
    * rounds to 6dp; the integer grid dissolves the problem). */
  private def msPlaneDot(tv: Column, g: Int): Column = {
    val w = (0 until MsTokDim).map(pos =>
      (1103515245L * (g.toLong * MsTokDim + pos) + 12345L) % 2001L - 1000L)
    aggregate(zip_with(tv, array(w.map(lit): _*), (x, y) => x * y),
      lit(0L), _ + _)
  }

  /** Band `band`'s bucket: the sign pattern of its [[MsLshPlanes]]
    * planes. OR-amplification across [[MsLshBands]] bands (candidate if
    * ANY band agrees) — the banded-minhash trick applied to hyperplane
    * signs; 6 planes/band is the measured operating point on the
    * ISOTROPIC fixtures (recall vs the exact funnel / candidate share:
    * 4 planes 0.90/0.92 — no pruning; 6 planes 0.75/~0.35; 8 planes
    * 0.38/~0.12 — honest trade, the Matryoshka isotropy caveat again;
    * a trained-embedding corpus moves every point up), 2 bands double
    * the catch probability. */
  private def msBucket(tv: Column, band: Int): Column =
    (0 until MsLshPlanes).map(b =>
      when(msPlaneDot(tv, band * MsLshPlanes + b) > 0, lit(1L << b))
        .otherwise(0L)).reduce(_ + _)

  /** LSH-BUCKETED MaxSim (round 17) — [[simMaxsim]]'s declared 100-TB
    * scale path made real and graded: the token-level stage-1 search is
    * replaced by a sign-hyperplane BUCKET equi-join ([[MsLshPlanes]]
    * integer planes over the 16-dim token grid → 2⁶ buckets), so
    * candidate generation never scores corpus tokens against probe
    * tokens at all — query and doc tokens meet only when they share a
    * bucket, the same shuffle-by-key economics as the shingle/LSH dedup
    * stack. Stage 2 is the IDENTICAL exact integer late-interaction
    * rerank, so the two queries differ only in the candidate generator —
    * recall vs the exact funnel is spec-measured, and the whole pipeline
    * (buckets included) is oracle-graded: a wrong bucket, a wrong
    * candidate set or a wrong rerank all break the hash. */
  private def simMaxsimLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Catalog.load(spark, sfDir, "embeddings")
      .select($"vec_id",
        transform($"embedding",
          v => floor(v.cast("double") * lit(1000000d)).cast("long")).as("e"))
    val ts = 0 until MsTokens
    val tok = e.select($"vec_id",
      posexplode(array(ts.map(t => msTok($"e", t)): _*)).as(Seq("t", "tv")))
    val buckets = tok.select($"vec_id", $"t",
      posexplode(array((0 until MsLshBands).map(band =>
        msBucket($"tv", band)): _*)).as(Seq("band", "bucket")))
    val cand = buckets.filter($"vec_id" < MsProbes)
      .select($"vec_id".as("probe_id"), $"band", $"bucket")
      .join(buckets.select($"vec_id".as("cand_id"), $"band", $"bucket"),
        Seq("band", "bucket"))
      .filter($"cand_id" =!= $"probe_id")
      .select($"probe_id", $"cand_id").distinct()
    val probes = e.filter($"vec_id" < MsProbes)
      .select($"vec_id".as("probe_id"), $"e".as("pe"))
    val maxsim = ts.map { tq =>
      greatest(ts.map(td => msDot(msTok($"pe", tq), msTok($"ce", td))): _*)
    }.reduce(_ + _)
    val w = Window.partitionBy($"probe_id")
      .orderBy($"maxsim".desc, $"cand_id".asc)
    cand
      .join(broadcast(probes), Seq("probe_id"))
      .join(e.select($"vec_id".as("cand_id"), $"e".as("ce")), Seq("cand_id"))
      .select($"probe_id", $"cand_id", maxsim.as("maxsim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= MsK)
      .select($"probe_id", $"rank", $"cand_id", $"maxsim")
      .orderBy($"probe_id".asc_nulls_first, $"rank".asc_nulls_first)
  }

  private val simMaxsimLshOracle: String = {
    val ts = 0 until MsTokens
    val maxsim = ts.map { tq =>
      "greatest(" + ts.map(td =>
        msDotSql(msTokSql("pe", tq), msTokSql("q.e", td))).mkString(", ") + ")"
    }.mkString(" + ")
    val tList = ts.mkString("[", ", ", "]")
    s"""
    WITH q AS (
      SELECT vec_id, list_transform(embedding,
        v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS e
      FROM embeddings),
    tok AS (
      SELECT vec_id, t.t,
        list_slice(e, t.t * $MsTokDim + 1, (t.t + 1) * $MsTokDim) AS tv
      FROM q, (SELECT unnest($tList) AS t) t),
    tflat AS (
      SELECT vec_id, t, generate_subscripts(tv, 1) - 1 AS pos,
        unnest(tv) AS v
      FROM tok),
    dots AS (
      SELECT vec_id, t, band, b,
        CAST(sum(v * ((1103515245 * ((band * $MsLshPlanes + b)
          * $MsTokDim + pos) + 12345) % 2001 - 1000)) AS BIGINT) AS dot
      FROM tflat
      CROSS JOIN range($MsLshBands) bd(band)
      CROSS JOIN range($MsLshPlanes) pl(b)
      GROUP BY vec_id, t, band, b),
    buckets AS (
      SELECT vec_id, t, band,
        CAST(sum(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << b)
          ELSE 0 END) AS BIGINT) AS bucket
      FROM dots GROUP BY vec_id, t, band),
    cand AS (
      SELECT DISTINCT pb.vec_id AS probe_id, db.vec_id AS cand_id
      FROM buckets pb
      JOIN buckets db ON pb.band = db.band AND pb.bucket = db.bucket
        AND db.vec_id <> pb.vec_id
      WHERE pb.vec_id < $MsProbes),
    p AS (SELECT vec_id AS probe_id, e AS pe FROM q WHERE vec_id < $MsProbes),
    m AS (
      SELECT c.probe_id, c.cand_id, CAST($maxsim AS BIGINT) AS maxsim
      FROM cand c
      JOIN p ON p.probe_id = c.probe_id
      JOIN q ON q.vec_id = c.cand_id)
    SELECT probe_id, CAST(rnk AS BIGINT) AS rank, cand_id, maxsim FROM (
      SELECT m.*, row_number() OVER (
        PARTITION BY probe_id ORDER BY maxsim DESC, cand_id ASC) AS rnk
      FROM m) f
    WHERE rnk <= $MsK
    ORDER BY probe_id ASC NULLS FIRST, rank ASC NULLS FIRST"""
  }

  /** Spec hook: the LSH candidate-set size per probe (the pruning claim). */
  private[graft] def maxsimLshCandCount(spark: SparkSession,
                                        sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Catalog.load(spark, sfDir, "embeddings")
      .select($"vec_id",
        transform($"embedding",
          v => floor(v.cast("double") * lit(1000000d)).cast("long")).as("e"))
    val ts = 0 until MsTokens
    val tok = e.select($"vec_id",
      posexplode(array(ts.map(t => msTok($"e", t)): _*)).as(Seq("t", "tv")))
    val buckets = tok.select($"vec_id", $"t",
      posexplode(array((0 until MsLshBands).map(band =>
        msBucket($"tv", band)): _*)).as(Seq("band", "bucket")))
    buckets.filter($"vec_id" < MsProbes)
      .select($"vec_id".as("probe_id"), $"band", $"bucket")
      .join(buckets.select($"vec_id".as("cand_id"), $"band", $"bucket"),
        Seq("band", "bucket"))
      .filter($"cand_id" =!= $"probe_id")
      .select($"probe_id", $"cand_id").distinct()
      .groupBy($"probe_id").agg(count(lit(1)).as("n_cand"))
  }

  override val queries: Vector[Q] = Vector(
    Q("q_sim_ann_ivfpq", ivfPq, Some(ivfPqOracle)),
    Q("q_retrieval_mmr", retrievalMmr, Some(retrievalMmrOracle)),
    Q("q_sim_ann_hnsw", simAnnHnsw, Some(simAnnHnswOracle)),
    Q("q_sim_nn_descent", simNnDescent, Some(simNnDescentOracle)),
    Q("q_sim_matryoshka", simMatryoshka, Some(simMatryoshkaOracle)),
    Q("q_sim_maxsim", simMaxsim, Some(simMaxsimOracle)),
    Q("q_sim_maxsim_lsh", simMaxsimLsh, Some(simMaxsimLshOracle)),
  )
}
