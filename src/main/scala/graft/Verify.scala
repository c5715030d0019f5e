package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // size-based AQE coalescing (see Bench) — results are
      // partition-count-independent by design, this only trims the
      // tiny-task dispatch overhead at verification SF
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration subset (comma-separated names); full dump by default
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // local-iteration denylist: lets an sf0.1 dump skip the labeled
    // O(n²) baselines (d2 runs hours at 5k docs — Bench excludes it
    // for the same reason). Skipped queries still dump their oracle
    // SQL, so duck_bench sees the full suite. Unset in driver runs.
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // Failures must be LOUD: a swallowed exception here makes the
    // driver's correctness file silently OMIT the query (round 7 shipped
    // 7 analysis-time failures that way — a green-looking artifact with
    // holes). Every failure is collected into errors.json next to
    // oracle_sql.json, and the run exits non-zero.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) && !skip(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
      // release this query's cached/checkpointed blocks (see Bench);
      // clearCache drops DataFrame-level persists through the cache
      // manager (so its plan-fragment index doesn't grow across the
      // suite), the RDD loop catches localCheckpoint blocks.
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED: ${errors.keys.mkString(", ")}")
    // rc stays 0 BY DEFAULT: the driver must still compare every query
    // that DID dump (a non-zero exit could discard the whole round's
    // correctness artifact over one broken query — the failure signal is
    // errors.json + stderr, which can never silently disappear again).
    // SPARK_GRAFT_STRICT=1 flips rc to 1 on any per-query failure for
    // local/CI use, where "the command failed" is the signal you want.
    spark.stop()
    if (errors.nonEmpty && sys.env.get("SPARK_GRAFT_STRICT").contains("1"))
      sys.exit(1)
  }
}
