package graft.experiments

import org.apache.spark.sql.SparkSession

/** Where does the per-invocation ~1 s floor go? Times each phase of a
  * FRESH construction+execution of a query (the Bench posture) so the
  * plan-time/execution-time split is visible. args: query names. */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.assertAnalyzed()
        val t2 = System.nanoTime()
        df.queryExecution.optimizedPlan
        val t3 = System.nanoTime()
        df.queryExecution.executedPlan
        val t4 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        val t5 = System.nanoTime()
        def ms(a: Long, b: Long) = f"${(b - a) / 1e6}%7.1f"
        println(s"[plancost] $name run$i construct=${ms(t0, t1)} analyze=${ms(t1, t2)} " +
          s"optimize=${ms(t2, t3)} plan=${ms(t3, t4)} execute=${ms(t4, t5)} rows=$n")
      }
    }
    spark.stop()
  }
}
