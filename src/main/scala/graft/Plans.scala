package graft

/** Local iteration tool: dump the executed plan of named queries (the
  * PLANS.md evidence source). Usage: runMain graft.Plans q_dedup_minhash ...
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.build(cpus)
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // let AQE finalize so the printed plan is the executed one
      println(s"=== $name")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(155)).mkString("\n"))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
