package graft

import graft.functions.GraftFunctions

class GraftFunctionsSpec extends SparkSpec {

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(dot === 32.0)
    val sh = spark.sql(
      "SELECT graft_shingles(array('a', 'b', 'c', 'b', 'c')) AS g")
      .head().getSeq[String](0)
    assert(sh === Seq("a b c", "b c b", "c b c"))
  }

  test("SQL function participates in a full query over a table") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_v")
    val n = spark.sql(
      """SELECT vec_id, graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                         CAST(embedding AS ARRAY<DOUBLE>)) AS sq_norm
        |FROM emb_v WHERE vec_id < 10""".stripMargin)
      .filter("sq_norm > 0").count()
    assert(n === 10)
  }
}
