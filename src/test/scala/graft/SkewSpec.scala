package graft

import org.apache.spark.sql.functions._

/** Skew handling evidence (SURVEY §7.5 / PLANS.md): the engine has two
  * answers to hot keys — the explicit two-phase salted aggregation
  * (`operators.Salt`, a19, exactness pinned in BucketingSpec) and
  * AQE's runtime skew-join split for joins. This spec proves the
  * second actually engages: a join where one key holds ~95% of the
  * rows gets its oversized partition split at runtime
  * (`SortMergeJoin(skew=true)`), so one straggler task can't serialize
  * the stage — the difference between a 1000-executor cluster
  * finishing in minutes vs waiting on one reducer. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot-key partition of a skewed sort-merge join at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffle join (both the static planner's AND AQE's own
      // broadcast thresholds) and make the skew detector sensitive
      // enough for test-sized data (defaults target 256MB partitions)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // threshold well under the hot partition's COMPRESSED size (the
      // constant hot key compresses extremely well)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      // the split adds a shuffle-read fan-out the planner is
      // conservative about when a downstream exchange follows; force
      // it so the test pins the mechanism, not the cost heuristic
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")

      // one hot key carries ~95% of the fact side
      // distinct payloads so the hot partition's shuffle bytes are not
      // compressed away below the detector's threshold
      val facts = spark.range(200000)
        .select(when(col("id") % 20 === 0, col("id") % 50).otherwise(lit(1L)).as("k"),
          pmod(col("id") * 2654435761L, lit(1000003L)).as("payload"))
      val dim = spark.range(50).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
      val joined = facts.join(dim, "k")
        .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("payload")).as("p"))

      assert(joined.collect().map(_.getLong(1)).sum === 200000L, "join must be lossless")

      // the final adaptive plan nests the join inside query-stage
      // wrappers that collect() does not traverse — assert on the
      // rendered final plan instead (isFinalPlan=true after execution)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin"),
        s"with broadcast off this must be a sort-merge join:\n$finalPlan")
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the hot-key join skew=true (partition split engaged):\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("saltedEquiJoin equals the plain join on a skewed input and shuffles on (key, salt)") {
    // one hot key holds ~90% of the fact side — the j12 shape
    val facts = spark.range(20000)
      .select(col("id").as("fid"),
        when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(1L)).as("k"))
    val dim = spark.range(7).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("name"), (col("id") * 3).as("w"))
    val salted = graft.operators.Salt.saltedEquiJoin(facts, dim, Seq("k"), 16)
      .select(col("fid"), col("k"), col("name"), col("w"))
    val plain = facts.join(dim, Seq("k")).select(col("fid"), col("k"), col("name"), col("w"))
    // exact multiset equality for ANY salt assignment
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted equi-join must be row-identical to the plain join")
    // and the salt is genuinely part of the join's distribution: with
    // broadcast off, the shuffle keys must include __salt, so the hot
    // key's rows hash to `salts` partitions BY PLAN, not by AQE rescue
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val replan = graft.operators.Salt.saltedEquiJoin(facts, dim, Seq("k"), 16)
      replan.collect()
      val plan = replan.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"),
        s"the join's exchanges must hash on (key, __salt):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
