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
      val plan = joined.queryExecution.sparkPlan
      assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        "precondition: fact-fact equi-join plans as SMJ")
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
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
