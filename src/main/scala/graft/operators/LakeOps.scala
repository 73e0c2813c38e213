package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Catalog, Q, QueryPack}

/** SURVEY.md §2.A — LAKEHOUSE COMMIT LOG / TIME TRAVEL (round 13
  * batch 8): the table-format read path under every modern lake table
  * (Delta/Iceberg-shaped, re-expressed minimally): a table IS an ordered
  * log of file-level add/remove actions; snapshot N is the live file set
  * after replaying actions ≤ N, and time travel is replaying to an older
  * N. The scratch table holds three deterministic orders slices across
  * three commits — v1 adds file A, v2 appends file B, v3 REWRITES A into
  * the smaller C (the delete/compact move) — and the graded query reads
  * ALL THREE snapshots, reporting per version the row count, exact key
  * sum and cents total. The oracle recomputes each snapshot's predicate
  * directly over `orders`, so log replay + multi-file read is
  * value-graded end-to-end (a wrong live-set reconstruction cannot
  * hash-match).
  *
  * Scale posture: actions are METADATA — the log is O(commits) JSON
  * lines read driver-side (exactly where every lakehouse keeps catalog
  * state), never a data scan; a snapshot read plans only the live
  * files' scans (here a union of parquet dirs — at 100 TB the same
  * replay prunes thousands of dead files before planning). Data files
  * are written ONCE per (application, sfDir) via the §A
  * materialize-once contract; the timed pass measures the snapshot
  * READS.
  */
object LakeOps extends QueryPack {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build the three-commit scratch table once per (app, sfDir). */
  private def lakeDir(spark: SparkSession, sfDir: String): String =
    built.computeIfAbsent(
      spark.sparkContext.applicationId + "#" + sfDir, { _ =>
        import spark.implicits._
        val base = Files.createTempDirectory("graft_lake_").toString
        val orders = Catalog.load(spark, sfDir, "orders")
        val k = pmod($"o_orderkey", lit(10))
        orders.filter(k < 3).write.parquet(s"$base/fileA")
        orders.filter(k >= 3 && k < 6).write.parquet(s"$base/fileB")
        orders.filter(k < 3 && $"o_orderstatus" === "F")
          .write.parquet(s"$base/fileC")
        // v4 COMPACTS B and C into D. The compactor reads ONLY the live
        // data files (never the source table) — the file-level rewrite a
        // real table service runs; row content is untouched by contract.
        spark.read.parquet(s"$base/fileB", s"$base/fileC")
          .write.parquet(s"$base/fileD")
        val log = Seq(
          """{"v":1,"op":"add","path":"fileA"}""",
          """{"v":2,"op":"add","path":"fileB"}""",
          """{"v":3,"op":"remove","path":"fileA"}""",
          """{"v":3,"op":"add","path":"fileC"}""",
          """{"v":4,"op":"remove","path":"fileB"}""",
          """{"v":4,"op":"remove","path":"fileC"}""",
          """{"v":4,"op":"add","path":"fileD"}""")
        Files.write(Paths.get(base, "_log.json"),
          log.mkString("\n").getBytes(StandardCharsets.UTF_8))
        base
      })

  /** Replay the commit log to version `v` → live file paths. The log is
    * catalog-state-sized and read driver-side by design. */
  private def liveFiles(base: String, v: Int): Seq[String] = {
    val lines = new String(
      Files.readAllBytes(Paths.get(base, "_log.json")),
      StandardCharsets.UTF_8).split("\n").toSeq
    val acts = lines.map { l =>
      val ver = """"v":(\d+)""".r.findFirstMatchIn(l).get.group(1).toInt
      val op = """"op":"(\w+)"""".r.findFirstMatchIn(l).get.group(1)
      val path = """"path":"(\w+)"""".r.findFirstMatchIn(l).get.group(1)
      (ver, op, path)
    }.filter(_._1 <= v)
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    acts.foreach {
      case (_, "add", p)    => live += p
      case (_, "remove", p) => live -= p
      case _                => ()
    }
    live.toSeq.map(p => s"$base/$p")
  }

  private def lakeTimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = lakeDir(spark, sfDir)
    (1 to 3).map { v =>
      spark.read.parquet(liveFiles(base, v): _*)
        .agg(
          count(lit(1)).as("n_rows"),
          sum($"o_orderkey").cast("long").as("key_sum"),
          sum(($"o_totalprice".cast("decimal(14,2)") * 100).cast("long"))
            .as("total_cents"))
        .select(lit(v.toLong).as("version"), $"n_rows", $"key_sum",
          $"total_cents")
    }.reduce(_.unionByName(_)).orderBy($"version".asc_nulls_first)
  }

  private val lakeTimeTravelOracle = """
    SELECT CAST(1 AS BIGINT) AS version, CAST(count(*) AS BIGINT) AS n_rows,
      CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
        AS BIGINT) AS total_cents
    FROM orders WHERE o_orderkey % 10 < 3
    UNION ALL
    SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(o_orderkey) AS BIGINT),
      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
        AS BIGINT)
    FROM orders WHERE o_orderkey % 10 < 6
    UNION ALL
    SELECT 3, CAST(count(*) AS BIGINT), CAST(sum(o_orderkey) AS BIGINT),
      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
        AS BIGINT)
    FROM orders
    WHERE (o_orderkey % 10 >= 3 AND o_orderkey % 10 < 6)
       OR (o_orderkey % 10 < 3 AND o_orderstatus = 'F')
    ORDER BY version ASC NULLS FIRST"""

  /** CHANGE DATA FEED between consecutive snapshots (round 13 batch 9) —
    * the incremental-read path downstream consumers run instead of
    * re-scanning the table: for each commit v-1 → v, the log yields the
    * files REMOVED and ADDED by that commit, and the NET row changes are
    *   inserts = rows of added files whose key is absent from the removed
    *             files (a rewrite that carries a row over is NOT a change),
    *   deletes = rows of removed files whose key is absent from the added
    *             files.
    * On this log: v2 appends fileB (pure inserts), v3 rewrites A→C where C
    * keeps only A's 'F' rows — so v3's CDF is zero inserts and exactly the
    * non-F rows of A as deletes. The oracle recomputes both transitions
    * from the base predicates, so the file-diff + key-anti-join netting is
    * value-graded end-to-end (counting rewritten-but-unchanged rows as
    * changes cannot hash-match).
    *
    * Scale posture: a CDF read scans ONLY the files the commit touched —
    * never the table — and the netting is two anti-joins keyed on the
    * table's key over those files alone (exactly how a format without
    * row-level tracking must reconstruct row changes from a rewrite).
    * Each side is commit-sized, so the join shuffles O(commit), not
    * O(table); with AQE both sides of a small commit broadcast.
    */
  private def lakeCdc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = lakeDir(spark, sfDir)
    def read(paths: Seq[String]): Option[DataFrame] =
      if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
    (2 to 3).map { v =>
      val prev = liveFiles(base, v - 1).toSet
      val cur = liveFiles(base, v).toSet
      val added = read((cur -- prev).toSeq.sorted)
      val removed = read((prev -- cur).toSeq.sorted)
      def net(a: Option[DataFrame], b: Option[DataFrame]): Option[DataFrame] =
        a.map(df => b.fold(df)(o =>
          df.join(o.select($"o_orderkey"), Seq("o_orderkey"), "left_anti")))
      def sums(df: Option[DataFrame], n: String, s: String): DataFrame =
        df.fold(spark.range(1).select(lit(0L).as(n), lit(0L).as(s)))(
          _.agg(coalesce(count(lit(1)), lit(0L)).as(n),
            coalesce(sum($"o_orderkey"), lit(0L)).cast("long").as(s)))
      sums(net(added, removed), "n_inserted", "ins_key_sum")
        .crossJoin(sums(net(removed, added), "n_deleted", "del_key_sum"))
        .select(lit(v.toLong).as("version"), $"n_inserted", $"ins_key_sum",
          $"n_deleted", $"del_key_sum")
    }.reduce(_.unionByName(_)).orderBy($"version".asc_nulls_first)
  }

  private val lakeCdcOracle = """
    SELECT CAST(2 AS BIGINT) AS version,
      CAST(count(*) AS BIGINT) AS n_inserted,
      CAST(sum(o_orderkey) AS BIGINT) AS ins_key_sum,
      CAST(0 AS BIGINT) AS n_deleted, CAST(0 AS BIGINT) AS del_key_sum
    FROM orders WHERE o_orderkey % 10 >= 3 AND o_orderkey % 10 < 6
    UNION ALL
    SELECT 3, 0, 0, CAST(count(*) AS BIGINT), CAST(sum(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 10 < 3 AND o_orderstatus <> 'F'
    ORDER BY version ASC NULLS FIRST"""

  /** COMPACTION COMMIT (round 13 batch 13) — the table-service move every
    * lakehouse runs nightly: commit v4 rewrites the two live small files
    * (B, C) into one (D) as a pure METADATA swap (remove, remove, add in
    * ONE commit) whose invariant is that the DATA is untouched — readers
    * at v3 and v4 must see byte-identical rows while the file count
    * drops 2 → 1. The graded query reads BOTH snapshots (file count from
    * the log replay, row count + exact key sum from the data) and the
    * oracle states the invariant directly: the same predicate rows twice,
    * with only n_files differing. The compactor itself read ONLY the live
    * data files, never the source table — at 100 TB compaction cost
    * scales with the small-file set it collapses, not the table.
    */
  private def lakeCompact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = lakeDir(spark, sfDir)
    (3 to 4).map { v =>
      val files = liveFiles(base, v)
      spark.read.parquet(files: _*)
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_orderkey").cast("long").as("key_sum"))
        .select(lit(v.toLong).as("version"),
          lit(files.size.toLong).as("n_files"), $"n_rows", $"key_sum")
    }.reduce(_.unionByName(_)).orderBy($"version".asc_nulls_first)
  }

  private val lakeCompactOracle = """
    SELECT CAST(3 AS BIGINT) AS version, CAST(2 AS BIGINT) AS n_files,
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    WHERE (o_orderkey % 10 >= 3 AND o_orderkey % 10 < 6)
       OR (o_orderkey % 10 < 3 AND o_orderstatus = 'F')
    UNION ALL
    SELECT 4, 1, CAST(count(*) AS BIGINT), CAST(sum(o_orderkey) AS BIGINT)
    FROM orders
    WHERE (o_orderkey % 10 >= 3 AND o_orderkey % 10 < 6)
       OR (o_orderkey % 10 < 3 AND o_orderstatus = 'F')
    ORDER BY version ASC NULLS FIRST"""

  /** COPY-ON-WRITE MERGE scratch: its own two-commit table (separate from
    * [[lakeDir]] so the shared log stays linear). v1 lands fileB
    * (3 ≤ k%10 < 6) and fileC (k%10 < 3 ∧ status F) with exact cents;
    * v2 is the MERGE commit produced by the real copy-on-write algorithm:
    *
    *  1. FILE PRUNING — only live files CONTAINING matched keys are
    *     rewritten. The source batch keys are ≡ 42 (mod 100) ⇒ ≡ 2
    *     (mod 10), which can appear in C but never in B — so B's file
    *     must survive the commit byte-identical (spec-asserted by path).
    *  2. REWRITE — C′ = C with matched rows' cents replaced by the
    *     source's halved cents (a left join against the broadcast batch).
    *  3. INSERT — E = source rows whose key matches NO live row (anti-join
    *     against the live key set), landed as a new file.
    *  4. COMMIT — remove C, add C′, add E in ONE log entry set: readers
    *     replaying to v1 still see the pre-merge table.
    *
    * The graded query replays to v2 and aggregates per status; the oracle
    * applies the same MERGE semantics declaratively over orders. At
    * 100 TB the rewrite cost is |touched files| + |batch| — pruning is
    * what makes MERGE affordable, and it is exactly what the untouched-B
    * proof pins.
    */
  private val mergeBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def mergeDir(spark: SparkSession, sfDir: String): String =
    mergeBuilt.computeIfAbsent(
      spark.sparkContext.applicationId + "#" + sfDir, { _ =>
        import spark.implicits._
        val base = Files.createTempDirectory("graft_lake_merge_").toString
        val rows = Catalog.load(spark, sfDir, "orders")
          .select($"o_orderkey", $"o_orderstatus",
            ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long")
              .as("cents"))
        val k = pmod($"o_orderkey", lit(10))
        rows.filter(k >= 3 && k < 6).write.parquet(s"$base/fileB")
        rows.filter(k < 3 && $"o_orderstatus" === "F")
          .write.parquet(s"$base/fileC")
        val src = rows.filter(pmod($"o_orderkey", lit(100)) === 42)
          .select($"o_orderkey", $"o_orderstatus",
            expr("cents div 2").as("cents"))
          .localCheckpoint(true)
        val v1 = Seq("fileB", "fileC")
        // 1. Prune: rewrite only live files holding matched keys.
        val touched = v1.filter { f =>
          spark.read.parquet(s"$base/$f")
            .join(src.select($"o_orderkey"), Seq("o_orderkey"), "left_semi")
            .limit(1).count() > 0
        }
        // 2. Rewrite touched files with the update arm applied.
        touched.foreach { f =>
          spark.read.parquet(s"$base/$f")
            .join(broadcast(src.select($"o_orderkey",
              $"cents".as("new_cents"))), Seq("o_orderkey"), "left_outer")
            .select($"o_orderkey", $"o_orderstatus",
              coalesce($"new_cents", $"cents").as("cents"))
            .write.parquet(s"$base/${f}_m")
        }
        // 3. Insert arm: source keys matching no live row.
        val liveKeys = v1.map(f => spark.read.parquet(s"$base/$f")
          .select($"o_orderkey")).reduce(_ union _)
        src.join(liveKeys, Seq("o_orderkey"), "left_anti")
          .write.parquet(s"$base/fileE")
        // 4. One commit: removes + adds.
        val log =
          v1.map(f => s"""{"v":1,"op":"add","path":"$f"}""") ++
            touched.map(f => s"""{"v":2,"op":"remove","path":"$f"}""") ++
            touched.map(f => s"""{"v":2,"op":"add","path":"${f}_m"}""") :+
            s"""{"v":2,"op":"add","path":"fileE"}"""
        Files.write(Paths.get(base, "_log.json"),
          log.mkString("\n").getBytes(StandardCharsets.UTF_8))
        base
      })

  private def lakeMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = mergeDir(spark, sfDir)
    spark.read.parquet(liveFiles(base, 2): _*)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum($"cents").cast("long").as("cents_sum"))
      .orderBy($"o_orderstatus".asc_nulls_first)
  }

  private val lakeMergeOracle = """
    WITH tbl AS (
      SELECT o_orderkey AS k, o_orderstatus AS s,
        CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c
      FROM orders
      WHERE (o_orderkey % 10 >= 3 AND o_orderkey % 10 < 6)
         OR (o_orderkey % 10 < 3 AND o_orderstatus = 'F')),
    src AS (
      SELECT o_orderkey AS k, o_orderstatus AS s,
        CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) // 2 AS c
      FROM orders WHERE o_orderkey % 100 = 42),
    merged AS (
      SELECT t.k, t.s, CASE WHEN src.k IS NOT NULL THEN src.c ELSE t.c END
        AS c
      FROM tbl t LEFT JOIN src ON t.k = src.k
      UNION ALL
      SELECT k, s, c FROM src
      WHERE k NOT IN (SELECT k FROM tbl))
    SELECT s AS o_orderstatus, count(*) AS n_rows,
      CAST(sum(c) AS BIGINT) AS cents_sum
    FROM merged GROUP BY 1
    ORDER BY o_orderstatus ASC NULLS FIRST"""

  /** Spec hook: live file paths at a version of the time-travel table —
    * the vacuum view (on-disk minus live = deletable orphans) is asserted
    * in Round13RSpec. */
  private[graft] def timeTravelLiveFiles(spark: SparkSession, sfDir: String,
                                         v: Int): Seq[String] =
    liveFiles(lakeDir(spark, sfDir), v)

  /** Spec hook: the live file paths at a version of the MERGE table. */
  private[graft] def mergeLiveFiles(spark: SparkSession, sfDir: String,
                                    v: Int): Seq[String] =
    liveFiles(mergeDir(spark, sfDir), v)

  override val queries: Vector[Q] = Vector(
    Q("q_lake_time_travel", lakeTimeTravel, Some(lakeTimeTravelOracle)),
    Q("q_lake_cdc", lakeCdc, Some(lakeCdcOracle)),
    Q("q_lake_compact", lakeCompact, Some(lakeCompactOracle)),
    Q("q_lake_merge", lakeMerge, Some(lakeMergeOracle)),
  )
}
