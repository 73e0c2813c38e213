package graft

import org.apache.spark.sql.SparkSession

/** Single place where graded sessions are configured, so Verify, Bench and
  * the test suites agree on semantics-bearing settings.
  *
  * Shared-session cache contract: query builders may `.cache()` an
  * intermediate frame that is consumed more than once in the SAME query's
  * plan (statCuped's per-customer frame, funnelWindow's views/clicks, …).
  * These entries are deliberately NOT unpersisted by the builder — the
  * consuming action runs after the builder returns, so eager unpersist
  * would defeat the cache — and reclamation is delegated to the block
  * manager's LRU eviction (storage level MEMORY_AND_DISK; evicted blocks
  * recompute from lineage, never fail). A long-lived production session
  * that wants deterministic reclamation should run each query batch in a
  * `newSession()` clone and call `spark.sharedState.cacheManager
  * .clearCache()` between batches; the graded Verify/Bench processes are
  * bounded (one JVM per run) so LRU is the declared policy there.
  */
object Sessions {
  def build(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // Custom Catalyst surface (native codegen'd cosine for the similarity
      // hot paths) — injected here so SQL/expr() sees it in every session.
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
      // as a timestamp; read as raw nanos (Catalog truncates to micros).
      // Session-global by design — set here, at construction, never mutated
      // mid-run.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // JVM case mappings, not ICU: Spark 4 defaults lower()/upper() under
      // UTF8_BINARY to the ICU library, whose one-time static table build
      // (CollationAwareUTF8String.<clinit> iterating code points through
      // icu4j) measured MINUTES of CPU on this image — and the cost lands
      // on whichever query first evaluates a case mapping in the JVM,
      // producing floating multi-second stalls that are unattributable in
      // the bench (jstack-confirmed round 9). The graded corpus is ASCII,
      // where JVM and ICU mappings agree — and the DuckDB oracle's lower()
      // is the simple mapping, so parity actually improves.
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // Generated-class cache sized to the suite: the default 100 entries
      // is below the ~164-query registry's unique-codegen-stage count, so
      // full-suite runs thrash the cache — every eviction forces a janino
      // recompile AND a reload through the synchronized
      // ExecutorClassLoader/ByteArrayClassLoader chain; round-9 stack
      // samples caught tasks RUNNABLE in findLoadedClass under a codegen'd
      // aggregate with ~2s CPU over 114s elapsed (classloader lock convoy,
      // not compute). Static conf — must be set at session build.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // Split scans of the small fixture files: every graded table is ONE
      // parquet file (1-20 MB), so under the 128 MB default every scan
      // stage is a SINGLE task — scan-side work (decimal partial aggs,
      // text tokenization) serializes onto one core of 32, and any
      // JIT-cold interpreted stretch in that task stalls the whole query
      // (round-9 stack samples). 4 MB restores scan parallelism at fixture
      // scale; a real deployment has many files per table and keeps the
      // default — this knob is fixture-size compensation, not a scale
      // strategy.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      // Catalog tables (bucketing demos/tests) land in a per-JVM temp
      // warehouse, never in the repo working dir.
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse_").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
