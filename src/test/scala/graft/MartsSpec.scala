package graft

import org.apache.spark.sql.functions._

/** Session-warmed derived marts (`sources.Marts`): reuse, rebuild on a
  * reaped backing path, and row identity with the un-materialized
  * build — the contract the r14 graph/basket amortization rides. */
class MartsSpec extends SparkSpec {

  test("derived mart builds once, reuses, and rebuilds when the payload disappears") {
    var builds = 0
    def mart() = graft.sources.Marts.derived(spark, sfDir, "marts_spec_probe") {
      builds += 1
      spark.range(0, 100).select(col("id"), (col("id") * 3).as("y"))
    }
    val first = mart().collect().sortBy(_.getLong(0))
    assert(builds === 1 && first.length === 100 && first(7).getLong(1) === 21)
    mart().collect()
    assert(builds === 1, "second call must reuse the materialized mart")
    // simulate a tmp reaper: delete the payload behind the mart's back
    val path = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_marts", ProcessHandle.current().pid().toString,
      sfDir.replaceAll("[^A-Za-z0-9]", "_"), "marts_spec_probe")
    def rmTree(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rmTree(_))
      java.nio.file.Files.deleteIfExists(p)
    }
    rmTree(path)
    val again = mart().collect().sortBy(_.getLong(0))
    assert(builds === 2, "a missing payload must rebuild, not fail the read")
    assert(again.map(_.getLong(1)).toSeq === first.map(_.getLong(1)).toSeq)
  }

  test("trade-edge mart rows equal the distinct un-materialized build") {
    val mart = graft.sources.Marts.tradeEdges(spark, sfDir)
    val direct = Tables.table(spark, sfDir, "lineitem")
      .join(Tables.table(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
      .distinct()
    assert(mart.exceptAll(direct).isEmpty && direct.exceptAll(mart).isEmpty,
      "mart must be row-identical to the build it materializes")
  }
}
