package graft

import org.apache.spark.sql.SparkSession

/** Scale-experiment harness: time a list of SparkEntry queries against
  * an alternate data directory (e.g. a 10×-replicated copy of sf0.1)
  * in one JVM.
  *
  *   sbt "runMain graft.ScaleCheck <dir> <query1,query2,...> [runs]"
  *
  * Prints min-of-runs per query; pair a run against sf0.1 with one
  * against the replica to read the scaling exponent (PLANS.md).
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val secs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = Bench.force(SparkEntry.queries(name)(spark, dir))
        (System.nanoTime() - t0) / 1e9 -> n
      }
      val (best, rows) = secs.minBy(_._1)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // Locale.ROOT so comma-decimal locales can't mangle the number
      println("[scale] %-28s %8ss rows=%d dir=%s".format(name,
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(best)), rows, dir))
    }
    spark.stop()
  }
}
