package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{AggExpressions, GraftFunctions}

/** [[graft.functions.ArgExtremum]] — the deterministic argmax/argmin
  * aggregate: semantics pinned against the window-rank formulation on
  * tie-heavy data, null handling against `max_by`'s contract, and the
  * REASON it exists as a custom DeclarativeAggregate: the plan must
  * stay in HashAggregate where `max(struct(...))` degrades to
  * SortAggregate. */
class AggExpressionsSpec extends SparkSpec {
  import spark.implicits._

  // tie-heavy: several keys share the max ord inside each group
  private lazy val df = Seq(
    ("g1", 10, 100L), ("g1", 10, 7L), ("g1", 9, 999L),
    ("g2", 5, 50L), ("g2", 5, 51L), ("g2", 5, 49L),
    ("g3", 1, 1L),
    ("g4", 3, 30L), ("g4", 4, 40L)
  ).toDF("g", "ord", "arg")

  test("argMax/argMaxHigh/argMin match the window-rank formulation with pinned ties") {
    val got = df.groupBy("g").agg(
      AggExpressions.argMax(col("ord"), col("arg")).as("amax_lo"),
      AggExpressions.argMaxHigh(col("ord"), col("arg")).as("amax_hi"),
      AggExpressions.argMin(col("ord"), col("arg")).as("amin_lo"))
      .orderBy("g")
      .as[(String, Long, Long, Long)].collect()

    // window twins: max ord then min arg / max arg; min ord then min arg
    val wMaxLo = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("ord").desc, col("arg").asc)))
      .filter(col("rn") === 1).select("g", "arg").as[(String, Long)].collect().toMap
    val wMaxHi = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("ord").desc, col("arg").desc)))
      .filter(col("rn") === 1).select("g", "arg").as[(String, Long)].collect().toMap
    val wMinLo = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("ord").asc, col("arg").asc)))
      .filter(col("rn") === 1).select("g", "arg").as[(String, Long)].collect().toMap

    got.foreach { case (g, lo, hi, mn) =>
      assert(lo == wMaxLo(g), s"argMax($g)")
      assert(hi == wMaxHi(g), s"argMaxHigh($g)")
      assert(mn == wMinLo(g), s"argMin($g)")
    }
  }

  test("null ord rows are ignored; all-null group yields NULL (max_by contract)") {
    val nulls = Seq(
      ("a", Some(1), 10L), ("a", None, 99L),
      ("b", None, 1L), ("b", None, 2L)
    ).toDF("g", "ord", "arg")
    val got = nulls.groupBy("g")
      .agg(AggExpressions.argMax(col("ord"), col("arg")).as("am"))
      .orderBy("g").collect()
    assert(got(0).getLong(1) == 10L)   // null-ord row never wins
    assert(got(1).isNullAt(1))         // no non-null ord at all -> NULL
  }

  test("plan stays HashAggregate where the struct-max twin degrades to SortAggregate") {
    val viaArg = df.groupBy("g")
      .agg(AggExpressions.argMax(col("ord"), col("arg")).as("am"))
    val viaStruct = df.groupBy("g")
      .agg(max(struct(col("ord"), col("arg"))).as("am"))
    // execute first so the AQE wrapper holds a final plan, then read
    // the string form (AdaptiveSparkPlanExec is a leaf to collect())
    def aggKinds(q: org.apache.spark.sql.DataFrame): (Boolean, Boolean) = {
      q.collect()
      val s = q.queryExecution.executedPlan.toString
      (s.contains("HashAggregate"), s.contains("SortAggregate"))
    }
    val (h1, s1) = aggKinds(viaArg)
    assert(h1 && !s1, "ArgExtremum must hash-aggregate")
    val (_, s2) = aggKinds(viaStruct)
    assert(s2, "struct-max control should sort-aggregate (else this test is vacuous)")
  }

  test("partial/final split merges correctly across many partitions") {
    // force partial aggregation across 8 partitions with every group in
    // every partition — the merge path, not just per-partition update
    val big = spark.range(0, 8000)
      .select((col("id") % 8).as("g"), (col("id") % 100).as("ord"),
        col("id").as("arg"))
      .repartition(8)
    val got = big.groupBy("g")
      .agg(AggExpressions.argMax(col("ord"), col("arg")).as("am"))
      .orderBy("g").as[(Long, Long)].collect()
    val want = big.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("ord").desc, col("arg").asc)))
      .filter(col("rn") === 1).select("g", "arg")
      .orderBy("g").as[(Long, Long)].collect()
    assert(got.toSeq == want.toSeq)
  }

  test("SQL registration: graft_argmax / graft_argmin callable from spark.sql") {
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("argmax_probe")
    val r = spark.sql(
      """SELECT g, graft_argmax(ord, arg) AS amax, graft_argmin(ord, arg) AS amin
        |FROM argmax_probe GROUP BY g ORDER BY g""".stripMargin)
      .as[(String, Long, Long)].collect()
    assert(r.map(x => (x._1, x._2)).toMap ===
      Map("g1" -> 7L, "g2" -> 49L, "g3" -> 1L, "g4" -> 40L))
    assert(r.map(x => (x._1, x._3)).toMap ===
      Map("g1" -> 999L, "g2" -> 49L, "g3" -> 1L, "g4" -> 30L))
  }
}
