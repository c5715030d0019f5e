package graft

import org.apache.spark.sql.SparkSession

/** One-call library entry point: a session wired the way the engine
  * expects, and a warehouse attach that makes the full surface
  * reachable from both the Scala API and plain `spark.sql`.
  *
  * {{{
  *   val spark = Graft.session()
  *   Graft.attach(spark, "/data/warehouse")
  *   spark.sql("SELECT event_type, count(*) FROM events GROUP BY 1")
  *   SparkEntry.queries("flagship_manager_dashboard")(spark, dir)
  * }}}
  */
object Graft {

  /** Session tuned for the engine: UTC semantics (the reference stores
    * naive-UTC event time), AQE on for runtime re-planning, shuffle
    * parallelism sized to the machine rather than the 200 default, and
    * the Catalyst extensions (native SQL functions + the BroadcastDims
    * auto-broadcast rule) installed. */
  def session(master: String = "local[*]",
              shufflePartitions: Option[Int] = None): SparkSession = {
    val parts = shufflePartitions
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // coalesce post-shuffle partitions to the advisory SIZE target
      // rather than preserving parallelism — the Spark-documented
      // production setting; keeps reducer counts proportional to data,
      // not to the cluster, at every scale (measured 22% off the
      // sf0.1 suite where microsecond tasks dominate)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.extensions", "graft.functions.GraftSessionExtensions")
      .getOrCreate()
    // getOrCreate may return a pre-existing session that never saw the
    // extensions config — register the runtime-injectable pieces too.
    graft.functions.GraftFunctions.register(spark)
    spark.experimental.extraOptimizations =
      (spark.experimental.extraOptimizations :+
        graft.plans.BroadcastDims(graft.plans.BroadcastDims.defaultDims)).distinct
    org.apache.spark.sql.graft.Bridge.registerStrategy(
      spark, graft.plans.TopKPerKeyStrategy)
    spark
  }

  /** Attach a warehouse directory: every table becomes a temp view
    * (events through the nanos-aware loader). */
  def attach(spark: SparkSession, dir: String): Unit =
    Tables.registerViews(spark, dir)
}
