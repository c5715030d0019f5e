package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan of a named
  * SparkEntry query and time repeated executions.
  *
  *   sbt "runMain graft.Explain <query_name> [sfDir] [runs]"
  *
  * Used to capture the evidence in PLANS.md (exchange counts, join
  * strategies, PushedFilters) — iterate the operator until the plan is
  * the one you'd want at 100 TB, not the first one that passed.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tc0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    // queries with eager localCheckpoints do real work at CONSTRUCTION
    // time — surface it, or the run timings below under-report
    println(f"[explain] construction: ${(System.nanoTime() - tc0) / 1e9}%.2fs")
    df.explain("formatted")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      // RECONSTRUCT per run (the Bench posture): re-forcing the same
      // DataFrame re-counts an already-planned RDD whose shuffle files
      // persist, so stages SKIP and the number reads ~10× faster than
      // any fresh invocation would see (0.09 s vs 1.2 s on s4).
      val n = Bench.force(SparkEntry.queries(name)(spark, sfDir))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"[explain] run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
