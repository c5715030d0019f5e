package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.operators.Salt

/** Shuffle-elimination and skew-safety techniques for the 100 TB path:
  * bucketed co-located joins and salted aggregation. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact tables join with ZERO shuffle exchanges") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets")
    try {
      // co-locate both facts: same bucket count, same key, pre-sorted
      Tables.table(spark, sfDir, "orders").write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", dir.resolve("orders_b").toString)
        .saveAsTable("orders_b")
      Tables.table(spark, sfDir, "lineitem").write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", dir.resolve("lineitem_b").toString)
        .saveAsTable("lineitem_b")
      // force the join path a 100 TB fact-fact join takes (no broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_extendedprice"))
      // assert on the EXECUTED plan: exchanges are inserted by
      // EnsureRequirements during preparation — `sparkPlan` never
      // carries distribution-required exchanges, so a no-exchange
      // assert there would pass vacuously even for an unbucketed join
      val plan = joined.queryExecution.executedPlan
      assert(plan.toString.contains("SortMergeJoin"),
        "precondition: fact-fact equi-join plans as SMJ")
      assert(!plan.toString.contains("Exchange hashpartitioning"),
        "bucketed layout must satisfy the join's distribution — no exchange")
      // and the result is the same as the unbucketed join
      val expected = Tables.table(spark, sfDir, "orders")
        .join(Tables.table(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("registered bucketed variants run their compute path with zero hash exchange") {
    // x2_fact_fact_bucketed: the SMJ must sit directly on the bucketed
    // scans — no exchange, no sort between them. The plan still carries
    // the tiny post-join rollup exchange and the presentation sort; the
    // claim is that the FACT-FACT join itself never repartitions.
    val x2 = SparkEntry.queries("x2_fact_fact_bucketed")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(x2.contains("SortMergeJoin"), s"x2 bucketed must SMJ:\n$x2")
    assert(!x2.contains("Exchange hashpartitioning(l_orderkey") &&
      !x2.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed fact-fact join must not repartition on the order key:\n$x2")
    // u5_except_all_bucketed: the whole aggregation rides the bucketed
    // clustering — the ONLY repartitioning in the plan is the
    // presentation ORDER BY (range), zero hash exchanges anywhere.
    val u5 = SparkEntry.queries("u5_except_all_bucketed")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!u5.contains("Exchange hashpartitioning"),
      s"bucketed multiset aggregation must run with zero hash exchange:\n$u5")
    // u8_intersect_all_bucketed: same claim for the INTERSECT ALL fold.
    val u8 = SparkEntry.queries("u8_intersect_all_bucketed")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!u8.contains("Exchange hashpartitioning"),
      s"bucketed intersect-all fold must run with zero hash exchange:\n$u8")
    // and both variants agree with their layout-agnostic twins
    val x2Rows = SparkEntry.queries("x2_fact_fact_bucketed")(spark, sfDir).collect()
    val x2Base = SparkEntry.queries("x2_fact_fact_join")(spark, sfDir).collect()
    assert(x2Rows.toSeq == x2Base.toSeq, "bucketed x2 must equal unbucketed x2")
    val u5Rows = SparkEntry.queries("u5_except_all_bucketed")(spark, sfDir).collect()
    val u5Base = SparkEntry.queries("u5_except_all")(spark, sfDir).collect()
    assert(u5Rows.toSeq == u5Base.toSeq, "bucketed u5 must equal unbucketed u5")
    val u8Rows = SparkEntry.queries("u8_intersect_all_bucketed")(spark, sfDir).collect()
    val u8Base = SparkEntry.queries("u8_intersect_all")(spark, sfDir).collect()
    assert(u8Rows.toSeq == u8Base.toSeq, "bucketed u8 must equal unbucketed u8")
  }

  test("salted aggregation is exactly the direct aggregation") {
    val ev = Tables.events(spark, sfDir)
    val salted = Salt.saltedSumCount(ev, Seq("user_id"), col("value"), salts = 7)
      .as[(Long, Double, Long)].collect().toSet
    val direct = ev.groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("total"),
        count(lit(1)).as("n"))
      .as[(Long, Double, Long)].collect().toSet
    assert(salted === direct)
  }
}
