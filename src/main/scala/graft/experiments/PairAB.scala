package graft.experiments

import org.apache.spark.sql.SparkSession

/** A/B harness for the mb1 co-purchase formulation (PLANS.md "mb1 pair
  * expansion"): times the basket-expansion copurchase against the
  * self-join variant in ONE JVM, alternating, min-of-3 each. Run with
  * SPARK_GRAFT_SF_DIR to pick the scale.  Not part of the driver
  * surface. */
object PairAB {
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
    graft.Tables.table(spark, sfDir, "lineitem").count() // warm page cache
    def time(label: String, f: => org.apache.spark.sql.DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.force(f)
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"[pairAB] $label%-12s min=$best%6.3f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
      best
    }
    // warmup both codegen paths untimed
    graft.Bench.force(graft.SparkEntry.copurchaseExpand(spark, sfDir))
    graft.Bench.force(graft.SparkEntry.copurchaseSelfJoin(spark, sfDir))
    time("expand", graft.SparkEntry.copurchaseExpand(spark, sfDir))
    time("selfjoin", graft.SparkEntry.copurchaseSelfJoin(spark, sfDir))
    time("expand2", graft.SparkEntry.copurchaseExpand(spark, sfDir))
    time("selfjoin2", graft.SparkEntry.copurchaseSelfJoin(spark, sfDir))
    spark.stop()
  }
}
