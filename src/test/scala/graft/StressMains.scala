package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PLANS.md stress harness for the SemDedup giant-cell cap (test scope:
  * a diagnostic, not library surface).
  *
  *   sbt "Test/runMain graft.StressE8 <embeddingsDir> <cap1,cap2,...>"
  *
  * Forces the PATHOLOGICAL shape the cap exists for — k=1, every vector
  * in ONE cell — and times `Ann.semDedup` at each cap. Uncapped, a
  * 20k-vector giant cell is |cell|² = 400M candidate pairs (the same
  * order as the d13 quadratic that was killed in round 6); capped, the
  * join is |cell| × cap and the timings below should scale ~linearly in
  * the cap. Pair counts are printed from the same arithmetic the plan
  * executes, so the bounded term is visible, not inferred. */
object StressE8 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val caps = args(1).split(",").map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    caps.foreach { cap =>
      val t0 = System.nanoTime()
      val out = graft.similarity.Ann.semDedup(emb, 1, 0.8, maxCellCompare = cap)
      val kept = out.filter(col("kept")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val pairs = n.min(cap) * n - n.min(cap) * (n.min(cap) + 1) / 2
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println("[e8-stress] n=%d cap=%d pairs~%dM kept=%d %.1fs".format(
        n, cap, pairs / 1000000, kept, secs))
    }
    spark.stop()
  }
}

/** Scratch profiler for the t12 pipeline pieces (test scope). */
object ProfileT12 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.TextAnalysis.words
    val docs = Tables.documents(spark, dir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t12prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    time("docs.count")(docs.count())
    (1 to 3).foreach { i =>
      time(s"explode words $i")(docs.select(col("doc_id"),
        explode(words(col("text"))).as("w")).count())
      time(s"bigrams no-explode $i")(docs.select(col("doc_id"),
        graft.text.TextAnalysis.bigrams(words(col("text"))).as("bgs")).count())
      val exploded = docs.select(col("doc_id"),
        explode(graft.text.TextAnalysis.bigrams(words(col("text")))).as("bg"))
      time(s"explode-only count $i")(exploded.count())
      val agg = exploded.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("m"))
      time(s"agg count $i")(agg.count())
      val ck = time(s"checkpoint $i")(agg.localCheckpoint(true))
      time(s"full t12 $i")(Bench.force(
        SparkEntry.queries("t12_bigram_nll")(spark, dir)))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

/** Scratch profiler for the d13 pipeline pieces (test scope). */
object ProfileD13 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window
    import graft.text.TextAnalysis._
    val docs = Tables.documents(spark, dir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d13prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    docs.count() // warm
    (1 to 2).foreach { i =>
      val sets = docs.select(col("doc_id"),
        graft.functions.TextExpressions.wordShingles(words(col("text")), 3).as("g"))
      time(s"shingle sets count $i")(sets.count())
      val ex = sets.filter(size(col("g")) > 0)
        .select(col("doc_id"), size(col("g")).as("n_a"), explode(col("g")).as("sh"))
      time(s"exploded count $i")(ex.count())
      val win = ex.withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
        .filter(col("df") <= 1000)
      time(s"window count $i")(win.count())
      val j = win.as("x").join(win.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") =!= col("y.doc_id"))
      time(s"join count $i")(j.count())
      val full = SparkEntry.queries("d13_containment_pairs")(spark, dir)
      time(s"full d13 $i")(Bench.force(full))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

/** PLANS.md stress harness for the sharded-IVF wall escape (test
  * scope). At sandbox scale the real wall (n ≫ maxCells² ≈ 16M
  * vectors) is unreachable, so it is SIMULATED by capping cells far
  * below √n: an unsharded index then re-inherits linear per-cell
  * growth, while the sharded composition multiplies total cells by
  * nShards at the same per-vector assignment cost.
  *
  *   sbt "Test/runMain graft.StressIVF <embeddingsDir> <cap> <shards>"
  */
object StressIVF {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = args(1).toInt
    val shards = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    def run(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = Bench.force(f)
      println("[ivf-stress] %s: %.1fs rows=%d".format(
        label, (System.nanoTime() - t0) / 1e9, n))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    run(s"unsharded maxCells=$cap")(
      graft.similarity.Ann.ivfTopK(emb, 5, maxCells = cap))
    run(s"sharded ${shards}x maxCellsPerShard=$cap")(
      graft.similarity.Ann.ivfTopKSharded(emb, 5,
        maxCellsPerShard = cap, nShards = shards))
  }
}

/** A/B: mb1 co-purchase pair generation — self-join vs per-basket
  * array expansion (test scope; findings in PLANS.md). */
object ProfileMb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mbprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    time("warm")(li.count())
    (1 to 2).foreach { i =>
      time(s"join $i") {
        li.as("a").join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
          .groupBy("u", "v").agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2).count()
      }
      time(s"array $i") {
        li.groupBy("l_orderkey")
          .agg(sort_array(collect_list(col("l_partkey"))).as("parts"))
          .select(explode(expr(
            "flatten(transform(parts, (x, i) -> transform(slice(parts, i + 1, size(parts)), y -> struct(x AS u, y AS v))))")).as("p"))
          .select(col("p.u"), col("p.v")).filter(col("u") < col("v"))
          .groupBy("u", "v").agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2).count()
      }
    }
    spark.stop()
  }
}

/** Builds the 10×-replica stress corpus for the round-7 operators:
  * every source row duplicated 10× under disjoint id spaces (shifted
  * keys), so each replica keeps its join/graph structure intact — the
  * stress is 10× volume with 10× keys, the "more of everything" axis a
  * production month brings. Usage:
  *   Test/runMain graft.MakeReplica10 /tmp/graft10x_r7 [srcDir]
  */
object MakeReplica10 {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft10x_r7"
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rep(df: org.apache.spark.sql.DataFrame, shifts: Map[String, Long]) =
      (0 until 10).map { i =>
        shifts.foldLeft(df) { case (acc, (c, m)) =>
          acc.withColumn(c, col(c) + lit(i * m)) }
      }.reduce(_ union _)
    rep(Tables.events(spark, src),
        Map("event_id" -> 100000000L, "user_id" -> 1000000L))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    rep(Tables.orders(spark, src),
        Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    rep(Tables.lineitem(spark, src),
        Map("l_orderkey" -> 10000000L, "l_partkey" -> 1000000L,
          "l_suppkey" -> 100000L))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    rep(Tables.part(spark, src), Map("p_partkey" -> 1000000L))
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    rep(Tables.documents(spark, src), Map("doc_id" -> 100000000L))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    rep(Tables.table(spark, src, "customer"), Map("c_custkey" -> 1000000L))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    rep(Tables.table(spark, src, "embeddings"), Map("vec_id" -> 1000000L))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[replica] wrote 10x corpus to $out")
    spark.stop()
  }
}

/** A/B: per-key top-k — TopKPerKey heap operator vs the row_number
  * window plan, orders (10 rows/key) and lineitem (denser keys), at
  * sf0.1 and the 10× replica (test scope; findings in PLANS.md). */
object ProfileTopK {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[topkprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val orders = Tables.table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    time("warm")(orders.count() + li.count())
    (1 to 2).foreach { i =>
      time(s"orders heap   $i") {
        graft.operators.TopK.perKey(orders, Seq("o_custkey"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3).count()
      }
      time(s"orders window $i") {
        orders.withColumn("rn", row_number().over(
            Window.partitionBy("o_custkey")
              .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
          .filter(col("rn") <= 3).count()
      }
      time(s"lineitem heap   $i") {
        graft.operators.TopK.perKey(li, Seq("l_partkey"),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc), 3).count()
      }
      time(s"lineitem window $i") {
        li.withColumn("rn", row_number().over(
            Window.partitionBy("l_partkey")
              .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
                col("l_linenumber").asc)))
          .filter(col("rn") <= 3).count()
      }
      // worst case: every key unique — the partial heap retains every
      // row (pure overhead) and the operator degrades to the window
      // plan's shuffle volume; documents the honest floor
      time(s"unique-key heap   $i") {
        graft.operators.TopK.perKey(li, Seq("l_orderkey", "l_linenumber"),
          Seq(col("l_extendedprice").desc), 3).count()
      }
      time(s"unique-key window $i") {
        li.withColumn("rn", row_number().over(
            Window.partitionBy("l_orderkey", "l_linenumber")
              .orderBy(col("l_extendedprice").desc)))
          .filter(col("rn") <= 3).count()
      }
    }
    spark.stop()
  }
}

/** d16 overflow-guard stress: `prefixFilterPairs` on the 10×-replica
  * documents (exact-copy families 10 deep — the documented
  * precondition violation) capped vs uncapped-on-sf0.1. The capped run
  * must complete in bounded time with the truncation warning visible;
  * findings land in PLANS.md.
  *
  *   sbt "Test/runMain graft.ProfileD16 [replicaDir] [maxFamily]"
  */
object ProfileD16 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft10x_r9"
    val cap = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[d16] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n pairs")
    }
    val docs = Tables.documents(spark, dir)
    time(s"10x replica, maxFamily=$cap") {
      graft.dedup.Dedup.prefixFilterPairs(docs, 0.7, maxFamily = cap).count()
    }
    val sf01 = Tables.documents(spark, "/root/testdata/sf0.1")
    time("sf0.1 uncapped (the registered config)") {
      graft.dedup.Dedup.prefixFilterPairs(sf01, 0.7).count()
    }
    time(s"sf0.1 maxFamily=$cap (cap is ~free when families are small)") {
      graft.dedup.Dedup.prefixFilterPairs(sf01, 0.7, maxFamily = cap).count()
    }
    spark.stop()
  }
}
