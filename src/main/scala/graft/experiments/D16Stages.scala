package graft.experiments

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage dissection for d16 (prefix-filtered set-similarity join):
  * times each pipeline stage in isolation — shingle checkpoint, prefix
  * build, candidate self-join, verify joins — so optimization effort
  * lands on the stage that actually costs (guide §1.1). Replicates
  * Dedup.prefixFrames/prefixFilterPairs stage-by-stage; not part of
  * the driver surface. */
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
    // stage 1: shingle explode + checkpoint (construction cost)
    time("tok_checkpoint") {
      val tok = graft.dedup.Dedup.shingleSets(docs)
        .filter(size(col("g")) > 0)
        .select(col("doc_id"), explode(col("g")).as("w"))
        .localCheckpoint(true)
      tok.unpersist(blocking = true)
      ()
    }
    val tok = graft.dedup.Dedup.shingleSets(docs)
      .filter(size(col("g")) > 0)
      .select(col("doc_id"), explode(col("g")).as("w"))
      .localCheckpoint(true)
    println(s"[d16stages] tok rows=${tok.count()}")

    def prefAll(): DataFrame = {
      val df = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val sz = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      tok.join(df, "w")
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("w"))))
        .join(sz, "doc_id")
        .filter(col("rnk") <= expr(s"(${10 - t10} * sz) div 10") + 1)
        .select(col("doc_id"), col("w"))
    }
    time("prefix_build")(noop(prefAll()))
    val pref = prefAll().localCheckpoint(true)
    println(s"[d16stages] pref rows=${pref.count()}")

    def cand(p: DataFrame): DataFrame = p.as("a").join(p.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    time("cand_from_ckpt_pref")(noop(cand(pref)))
    val candCk = cand(pref).localCheckpoint(true)
    println(s"[d16stages] cand rows=${candCk.count()}")

    val sz = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    def verify(c: DataFrame): DataFrame = {
      val inter = c
        .join(tok.select(col("doc_id").as("d1"), col("w")), "d1")
        .join(tok.select(col("doc_id").as("d2"), col("w")), Seq("d2", "w"))
        .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("n_common"))
      inter
        .join(sz.select(col("doc_id").as("d1"), col("sz").as("s1")), "d1")
        .join(sz.select(col("doc_id").as("d2"), col("sz").as("s2")), "d2")
        .filter(lit(10) * col("n_common") >=
          lit(t10) * (col("s1") + col("s2") - col("n_common")))
    }
    time("verify_from_ckpt_cand")(noop(verify(candCk)))
    // end-to-end for reference (fresh pipeline, as registered)
    time("full_registered")(noop(
      graft.dedup.Dedup.prefixFilterPairs(docs, 0.7).orderBy("d1", "d2")))
    spark.stop()
  }
}
