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
      val n = Bench.force(df)
      println(f"[explain] run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
