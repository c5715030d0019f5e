package graft

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.plans.BroadcastDims

/** The BroadcastDims optimizer rule changes physical join strategy for
  * known dimension scans without touching query code. */
class PlansSpec extends SparkSpec {

  private def plannedJoin(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan

  test("dim joins degrade to sort-merge with size-based broadcast off; the rule restores BHJ") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the worst case: no size-estimate broadcasts at all
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def query = Tables.table(spark, sfDir, "customer")
        .join(Tables.table(spark, sfDir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).count()

      val before = plannedJoin(query)
      assert(before.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        "precondition: without the rule this plans as a sort-merge join")

      spark.experimental.extraOptimizations = Seq(BroadcastDims(BroadcastDims.defaultDims))
      val after = plannedJoin(query)
      assert(after.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        "rule must turn the nation scan into a broadcast build side")
      assert(after.collect { case j: SortMergeJoinExec => j }.isEmpty)
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    }
  }

  test("p2 dispatch parses once: the five route reads share the checkpointed batch") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("p2_event_dispatch")(spark, sfDir)
    val scans = df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.isEmpty,
      "route aggregates must read the localCheckpoint'ed parse, not re-scan " +
        "events per union arm (one scan+parse total, done eagerly at checkpoint)")
  }

  test("runtime bloom filter prunes the fact side of a selective fact-fact join") {
    // At 100 TB the win is reading only the lineitem rows whose orderkey
    // can pass the selective orders filter: Spark's InjectRuntimeFilter
    // builds a bloom filter from the filtered (small) side and pushes a
    // might_contain(l_orderkey) predicate into the big side's scan. The
    // size thresholds are tuned for clusters, so at test SF we lower the
    // application-side floor to prove the rewrite engages — the plan
    // shape, not the byte counts, is what carries to scale.
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      def query = Tables.table(spark, sfDir, "lineitem")
        .join(Tables.table(spark, sfDir, "orders")
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))

      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      val withFilter = query.queryExecution.optimizedPlan.toString
      assert(withFilter.contains("might_contain"),
        "expected a bloom-filter runtime predicate on the application side")

      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = query.queryExecution.optimizedPlan.toString
      assert(!without.contains("might_contain"),
        "causality check: the predicate must come from InjectRuntimeFilter")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("the rule never hints non-dim sides or overrides explicit hints") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.experimental.extraOptimizations = Seq(BroadcastDims(BroadcastDims.defaultDims))
      // fact ⋈ fact: neither side is a registered dim ⇒ stays sort-merge
      val factFact = Tables.table(spark, sfDir, "orders")
        .join(Tables.table(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey")).count()
      assert(plannedJoin(factFact).collect { case j: SortMergeJoinExec => j }.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    }
  }
}
