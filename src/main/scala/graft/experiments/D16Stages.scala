package graft.experiments

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage dissection for d16 (prefix-filtered set-similarity join):
  * times each pipeline stage in isolation — sorted-set checkpoint,
  * prefix build, candidate self-join (capped and uncapped), merge-walk
  * verify — so optimization effort lands on the stage that actually
  * costs (guide §1.1). Replicates the CURRENT
  * Dedup.prefixFrames/prefixFilterPairs stage-by-stage (r17 kernel
  * form); not part of the driver surface. */
object D16Stages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.table(spark, sfDir, "documents")
    docs.count() // warm

    def time(label: String)(f: => Unit): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[d16stages] $label%-28s min=${runs.min}%6.2f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit = { graft.Bench.force(df); () }

    val t10 = 7
    // stage 1: sorted shingle arrays + checkpoint (construction cost)
    time("sets_checkpoint") {
      val s = graft.dedup.Dedup.shingleSets(docs)
        .filter(size(col("g")) > 0)
        .select(col("doc_id"), array_sort(col("g")).as("g"))
        .localCheckpoint(true)
      s.unpersist(blocking = true)
      ()
    }
    val sets = graft.dedup.Dedup.shingleSets(docs)
      .filter(size(col("g")) > 0)
      .select(col("doc_id"), array_sort(col("g")).as("g"))
      .localCheckpoint(true)
    println(s"[d16stages] sets rows=${sets.count()}")

    def prefAll(): DataFrame = {
      val tok = sets.select(col("doc_id"), size(col("g")).as("sz"),
        explode(col("g")).as("w"))
      val df = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
      tok.join(df, "w")
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("w"))))
        .filter(col("rnk") <= expr(s"(${10 - t10} * sz) div 10") + 1)
        .select(col("doc_id"), col("w"))
    }
    time("prefix_build")(noop(prefAll()))
    val pref = prefAll().localCheckpoint(true)
    println(s"[d16stages] pref rows=${pref.count()}")

    def capped(p: DataFrame): DataFrame = p
      .withColumn("fam", count(lit(1)).over(Window.partitionBy(col("w"))))
      .filter(col("fam") <= 100)
      .select(col("doc_id"), col("w"))
    time("fam_window_over_ckpt")(noop(capped(pref)))

    def cand(p: DataFrame): DataFrame = p.as("a").join(p.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    time("cand_uncapped")(noop(cand(pref)))
    time("cand_capped")(noop(cand(capped(pref))))
    val candCk = cand(pref).localCheckpoint(true)
    println(s"[d16stages] cand rows=${candCk.count()}")
    println(s"[d16stages] cand_capped rows=${cand(capped(pref)).count()}")
    // the r17 length-filtered candidate join (the registered form):
    // prefix rows carry sz; J≥t pairs satisfy 10·min(sz) ≥ t10·max(sz)
    def prefSz(): DataFrame = {
      val tok = sets.select(col("doc_id"), size(col("g")).as("sz"),
        explode(col("g")).as("w"))
      val df = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
      tok.join(df, "w")
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("w"))))
        .filter(col("rnk") <= expr(s"(${10 - t10} * sz) div 10") + 1)
        .select(col("doc_id"), col("w"), col("sz"))
    }
    val ps = prefSz().localCheckpoint(true)
    def candLen(p: DataFrame): DataFrame = p.as("a").join(p.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
          lit(10) * col("a.sz") >= lit(t10) * col("b.sz") &&
          lit(10) * col("b.sz") >= lit(t10) * col("a.sz"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    time("cand_length_filtered")(noop(candLen(ps)))
    println(s"[d16stages] cand_length_filtered rows=${candLen(ps).count()}")

    def verify(c: DataFrame): DataFrame = c
      .join(sets.select(col("doc_id").as("d1"), col("g").as("g1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("g").as("g2")), "d2")
      .select(col("d1"), col("d2"),
        graft.functions.PairExpressions
          .sortedIntersectCount(col("g1"), col("g2")).as("n_common"),
        size(col("g1")).cast("long").as("s1"),
        size(col("g2")).cast("long").as("s2"))
      .filter(lit(10) * col("n_common") >=
        lit(t10) * (col("s1") + col("s2") - col("n_common")))
    time("verify_merge_walk")(noop(verify(candCk)))
    // end-to-end for reference (fresh pipeline, as registered)
    time("full_uncapped")(noop(
      graft.dedup.Dedup.prefixFilterPairs(docs, 0.7).orderBy("d1", "d2")))
    time("full_capped")(noop(
      graft.dedup.Dedup.prefixFilterPairs(docs, 0.7, maxFamily = 100)
        .orderBy("d1", "d2")))
    spark.stop()
  }
}
