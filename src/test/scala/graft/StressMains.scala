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

/** Bounded-family 10× replica of the DOCUMENTS table — the realistic
  * post-exact-dedup stress axis for the d-family. MakeReplica10's
  * exact-copy replicas multiply every duplicate FAMILY 10× as well as
  * the volume, so output-bound operators (d17 span coverage, d18
  * survivor picks) scale with |family|² effects that a real corpus
  * (exact-deduped first — both operators' documented precondition)
  * never exhibits. The construction is a TOKEN-SPACE ISOMORPHISM per
  * replica: every token is uniformly renamed tok→tok_rI, so within a
  * replica every shingle/window/digest relationship is EXACTLY the
  * original corpus's (equality is preserved under a bijective token
  * rename), while across replicas no shingle, window, or digest can
  * ever match — families keep their sf0.1 sizes and multiply in
  * COUNT, not in size: "more documents", not "more copies". (Two
  * rejected cuts, kept for the record: a per-REPLICA marker token
  * inserted every 10 tokens MANUFACTURED new within-replica shingle
  * collisions — the "bounded" corpus measured HARDER than the
  * exact-copy one, d18 9.07 s vs 7.53 s; a per-DOCUMENT marker
  * diluted within-replica Jaccard below the 0.7 threshold and
  * DISSOLVED the families instead — d18 found 51 clusters where the
  * isomorphism predicts 10×232.)
  * Usage: Test/runMain graft.MakeReplicaBoundedDocs /tmp/graft10x_docs
  */
object MakeReplicaBoundedDocs {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft10x_docs"
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, src)
    (0 until 10).map { i =>
      val renamed = concat_ws(" ",
        transform(split(col("text"), " "), t => concat(t, lit(s"_r$i"))))
      docs.withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
        .withColumn("text", renamed)
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[replica] wrote bounded-family 10x documents to $out")
    spark.stop()
  }
}

/** Decorrelated 10× replica of the EMBEDDINGS table — the realistic
  * stress axis for the e-family and pipe_embed_curation.
  * MakeReplica10's exact-copy replicas give every vector 10 IDENTICAL
  * twins, so SemDedup/LSH/near-dup queries measure duplicate
  * explosion (within-cell pair work grows ~replication², the r16 10×
  * artifact reads e8 at 29×) rather than corpus scaling. Each replica
  * here rotates the vector by a deterministic per-(replica, dim)
  * micro-offset — copies land in different similarity neighborhoods
  * while the marginal value distribution stays essentially unchanged
  * (the mm/BoundedDocs recipe applied to vectors).
  *
  * Usage: Test/runMain graft.MakeReplicaPerturbedEmb /tmp/graft10x_emb
  */
object MakeReplicaPerturbedEmb {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft10x_emb"
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.table(spark, src, "embeddings")
    (0 until 10).map { i =>
      // per-(replica, dim, id) offset in [-0.08, 0.08): big enough to
      // decorrelate twins (cosine ~0.97 vs 1.0), small enough to keep
      // the vectors in-distribution
      val perturbed = expr(
        s"""transform(embedding, (x, j) ->
           |  CAST(x + (CAST((vec_id * 31 + j * 7 + $i * 13) % 16 AS FLOAT)
           |            - 8.0) / 100.0 AS FLOAT))""".stripMargin)
      emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
        .withColumn("embedding", perturbed)
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[replica] wrote decorrelated 10x embeddings to $out")
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
    def time(tag: String, runs: Int = 1)(f: => Long): Unit = {
      // min-of-N (r10 verdict: the capped replica number spread
      // 29.6-62 s across rounds on a box that carries external load —
      // pin the stress figure the same way Bench pins query times)
      val timed = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      val (best, n) = timed.minBy(_._1)
      val spread = timed.map(_._1)
      println(f"[d16] $tag: $best%.1f s (min of $runs; spread ${spread.min}%.1f-${spread.max}%.1f), $n pairs")
    }
    val docs = Tables.documents(spark, dir)
    time(s"10x replica, maxFamily=$cap", runs = 3) {
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

/** Scratch profiler for the d14 pipeline pieces + formulation A/Bs
  * (test scope): stagewise costs of the sparse-cosine pair query and
  * the df-via-aggregate-join alternative to the df window. */
object ProfileD14 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d14prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    Tables.documents(spark0, dir).count() // warm
    (1 to 2).foreach { i =>
      // the registered configuration (4m advisory sub-session)
      val s2 = spark0.newSession()
      s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      s2.conf.set("spark.sql.shuffle.partitions", "32")
      val docs = Tables.documents(s2, dir)
      import graft.text.TextAnalysis._
      val sets = graft.dedup.Dedup.shingleSets(docs).filter(size(col("g")) > 0)
        .select(col("doc_id"), explode(col("g")).as("sh"))
      time(s"explode count $i")(sets.count())
      val win = sets.withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
        .filter(col("df") <= 1000)
      time(s"df window $i")(win.count())
      val agg = sets.join(
        sets.groupBy(col("sh")).agg(count(lit(1)).as("df")).filter(col("df") <= 1000), "sh")
      time(s"df agg+join $i")(agg.count())
      time(s"full d14 $i")(
        Bench.force(SparkEntry.queries("d14_sparse_cosine")(spark0, dir)))
      spark0.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark0.stop()
  }
}

/** d14 conf/formulation A/B (test scope): the registered 4m/32-width
  * sub-session vs plain session vs no-checkpoint variants. */
object ProfileD14B {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.min(8, cpus.toInt))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d14b] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    Tables.documents(spark0, dir).count() // warm
    (1 to 2).foreach { i =>
      time(s"registered (4m/32) $i")(
        Bench.force(SparkEntry.queries("d14_sparse_cosine")(spark0, dir)))
      time(s"plain session     $i")(Bench.force(
        graft.dedup.Dedup.sparseCosinePairs(
          Tables.documents(spark0, dir), 0.6).orderBy("d1", "d2")))
      val s3 = spark0.newSession()
      s3.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      time(s"4m only (8 parts) $i")(Bench.force(
        graft.dedup.Dedup.sparseCosinePairs(
          Tables.documents(s3, dir), 0.6).orderBy("d1", "d2")))
      spark0.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark0.stop()
  }
}

/** d14 structural A/B (test scope): checkpoint vs ReusedExchange. */
object ProfileD14C {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.min(8, cpus.toInt))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d14c] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def variant(docs: DataFrame, checkpoint: Boolean): DataFrame = {
      val n = docs.count()
      val maxDf = 1000
      val ex0 = graft.dedup.Dedup.shingleSets(docs).filter(size(col("g")) > 0)
        .select(col("doc_id"), explode(col("g")).as("sh"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
        .filter(col("df") <= maxDf)
        .select(col("doc_id"), col("sh"),
          log(lit(n.toDouble) / col("df")).as("w"))
      val ex = if (checkpoint) ex0.localCheckpoint(true) else ex0
      val norms = ex.groupBy(col("doc_id"))
        .agg(sqrt(sum(round(col("w") * col("w") * lit(1e12)).cast("long"))
          .cast("double") / lit(1e12)).as("nrm"))
      ex.as("x").join(ex.as("y"),
          col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .agg(sum(round(col("x.w") * col("y.w") * lit(1e12)).cast("long")).as("dotq_fp"))
        .join(broadcast(norms.select(col("doc_id").as("d1"), col("nrm").as("nrm1"))), "d1")
        .join(broadcast(norms.select(col("doc_id").as("d2"), col("nrm").as("nrm2"))), "d2")
        .select(col("d1"), col("d2"),
          round((col("dotq_fp").cast("double") / lit(1e12)) /
            (col("nrm1") * col("nrm2")), 6).as("cos"))
        .filter(col("cos") >= lit(0.6))
        .orderBy("d1", "d2")
    }
    Tables.documents(spark0, dir).count() // warm
    (1 to 2).foreach { i =>
      val s2 = spark0.newSession()
      s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      s2.conf.set("spark.sql.shuffle.partitions", "32")
      time(s"checkpointed (current) $i")(Bench.force(variant(Tables.documents(s2, dir), true)))
      val s3 = spark0.newSession()
      s3.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      s3.conf.set("spark.sql.shuffle.partitions", "32")
      time(s"reused-exchange       $i")(Bench.force(variant(Tables.documents(s3, dir), false)))
      spark0.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark0.stop()
  }
}

/** d14 posting-list-kernel A/B (test scope): per-shingle SortedPairs
  * expansion (dot contribution per shingle is w² — both sides share
  * the shingle's weight) vs the self-join. */
object ProfileD14D {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.min(8, cpus.toInt))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d14d] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def kernelVariant(docs: DataFrame): DataFrame = {
      val n = docs.count()
      val maxDf = 1000
      val g = graft.dedup.Dedup.shingleSets(docs).filter(size(col("g")) > 0)
        .select(col("doc_id"), explode(col("g")).as("sh"))
        .groupBy(col("sh")).agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) <= maxDf)
        .withColumn("w", log(lit(n.toDouble) / size(col("ids"))))
      val pairs = g.select(
          round(col("w") * col("w") * lit(1e12)).cast("long").as("q"),
          explode(graft.functions.PairExpressions.sortedPairs(col("ids"))).as("p"))
        .groupBy(col("p.u").as("d1"), col("p.v").as("d2"))
        .agg(sum(col("q")).as("dotq_fp"))
      val norms = g.select(explode(col("ids")).as("doc_id"),
          round(col("w") * col("w") * lit(1e12)).cast("long").as("q"))
        .groupBy(col("doc_id"))
        .agg(sqrt(sum(col("q")).cast("double") / lit(1e12)).as("nrm"))
      pairs
        .join(broadcast(norms.select(col("doc_id").as("d1"), col("nrm").as("nrm1"))), "d1")
        .join(broadcast(norms.select(col("doc_id").as("d2"), col("nrm").as("nrm2"))), "d2")
        .select(col("d1"), col("d2"),
          round((col("dotq_fp").cast("double") / lit(1e12)) /
            (col("nrm1") * col("nrm2")), 6).as("cos"))
        .filter(col("cos") >= lit(0.6))
        .orderBy("d1", "d2")
    }
    Tables.documents(spark0, dir).count() // warm
    (1 to 2).foreach { i =>
      val s2 = spark0.newSession()
      s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      s2.conf.set("spark.sql.shuffle.partitions", "32")
      time(s"kernel (4m/32) $i")(Bench.force(kernelVariant(Tables.documents(s2, dir))))
      time(s"kernel (plain) $i")(Bench.force(kernelVariant(Tables.documents(spark0, dir))))
      time(s"registered     $i")(
        Bench.force(SparkEntry.queries("d14_sparse_cosine")(spark0, dir)))
      spark0.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark0.stop()
  }
}

/** d14 sharing A/B (test scope): localCheckpoint vs persist vs bare
  * ReusedExchange for the 4-consumer weighted-posting frame. */
object ProfileD14E {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.min(8, cpus.toInt))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d14e] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def variant(docs: DataFrame, share: String): DataFrame = {
      val n = docs.count()
      val ex0 = graft.dedup.Dedup.shingleSets(docs).filter(size(col("g")) > 0)
        .select(col("doc_id"), explode(col("g")).as("sh"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
        .filter(col("df") <= 1000)
        .select(col("doc_id"), col("sh"),
          log(lit(n.toDouble) / col("df")).as("w"))
      val ex = share match {
        case "checkpoint" => ex0.localCheckpoint(true)
        case "persist" => ex0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        case _ => ex0
      }
      val norms = ex.groupBy(col("doc_id"))
        .agg(sqrt(sum(round(col("w") * col("w") * lit(1e12)).cast("long"))
          .cast("double") / lit(1e12)).as("nrm"))
      ex.as("x").join(ex.as("y"),
          col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .agg(sum(round(col("x.w") * col("y.w") * lit(1e12)).cast("long")).as("dotq_fp"))
        .join(broadcast(norms.select(col("doc_id").as("d1"), col("nrm").as("nrm1"))), "d1")
        .join(broadcast(norms.select(col("doc_id").as("d2"), col("nrm").as("nrm2"))), "d2")
        .select(col("d1"), col("d2"),
          round((col("dotq_fp").cast("double") / lit(1e12)) /
            (col("nrm1") * col("nrm2")), 6).as("cos"))
        .filter(col("cos") >= lit(0.6))
        .orderBy("d1", "d2")
    }
    Tables.documents(spark0, dir).count() // warm
    (1 to 2).foreach { i =>
      Seq("checkpoint", "persist", "reuse").foreach { m =>
        val s2 = spark0.newSession()
        s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        s2.conf.set("spark.sql.shuffle.partitions", "32")
        time(f"$m%-10s $i")(Bench.force(variant(Tables.documents(s2, dir), m)))
        spark0.sharedState.cacheManager.clearCache()
        spark0.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark0.stop()
  }
}

/** One-off: measure e25 recall vs exact on the harness corpus (not a test). */
object ProbeE25Recall {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = graft.Tables.embeddings(spark, sf)
      val exact = graft.similarity.Ann.cosineTopKBlocked(emb, 5)
        .filter(org.apache.spark.sql.functions.col("query_id") < 50)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val got = graft.similarity.Ann.ivfPqTopK(emb)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      println(s"$sf recall@5(q<50) = ${(exact & got).size.toDouble / exact.size} (n=${emb.count})")
    }
    spark.stop()
  }
}

/** Hot-key (skew) replica of the EVENTS table — the r14 skew-JOIN
  * stress axis: the 10× exact-copy replica with ~10% of ALL rows
  * reassigned to ONE user (event_id % 10 == 0 → user_id 1, applied
  * after the per-replica id shifts so the hot user is global). A
  * uniform user at 10× sf0.1 holds ~850 events; the hot user holds
  * 100k — a ~120× key-skew, the "one power user / one viral document"
  * shape that puts 10% of a plain shuffle join's probe rows on one
  * reducer. Only events is written: the consumers (w5, j11, j12, a19)
  * read nothing else.
  * Usage: Test/runMain graft.MakeReplicaHotUser /tmp/graft_hot [srcDir]
  */
object MakeReplicaHotUser {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft_hot"
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, src)
    (0 until 10).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * 100000000L))
        .withColumn("user_id", col("user_id") + lit(i * 1000000L))
    }.reduce(_ union _)
      .withColumn("user_id",
        when(col("event_id") % 10 === 0, lit(1L)).otherwise(col("user_id")))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"[replica] wrote hot-user events (10x, ~10% on user 1) to $out")
    spark.stop()
  }
}

/** A/B: plain shuffle equi-join vs operators.Salt.saltedEquiJoin on
  * the j12 enrichment shape, against an events dir (intended: the
  * MakeReplicaHotUser output). Broadcast is disabled so the plain form
  * actually shows its skewed-shuffle behavior (at harness scale AQE
  * would otherwise broadcast the dim side and hide the skew), and AQE
  * skew-split stays ON for the plain side — the study compares the
  * REACTIVE mitigation against the DECLARATIVE one. Row counts are
  * printed so both forms are provably the same join.
  * Usage: Test/runMain graft.SkewJoinStudy /tmp/graft_hot [runs]
  */
object SkewJoinStudy {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_hot"
    val runs = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[skewjoin] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    time("warm")(ev.count())
    val dim = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("type_n"))
    (1 to runs).foreach { i =>
      time(s"plain shuffle join $i") {
        println("  rows=" + ev.select(col("event_id"), col("user_id"), col("event_type"))
          .join(dim, Seq("user_id", "event_type")).count())
      }
      time(s"salted join (16)   $i") {
        println("  rows=" + graft.operators.Salt.saltedEquiJoin(
          ev.select(col("event_id"), col("user_id"), col("event_type")),
          dim, Seq("user_id", "event_type"), 16).count())
      }
    }
    spark.stop()
  }
}

/** Piecewise timing of e33_adaptive_recall_sampled at an arbitrary SF
  * dir (diagnostic for the r14 slope work). */
object ProfileE33 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft10x_r13"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[e33prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    (1 to 2).foreach { i =>
      val emb = time(s"checkpoint $i")(
        Tables.table(spark, dir, "embeddings").localCheckpoint(true))
      val exact = time(s"exact against $i")(
        graft.similarity.Ann.cosineTopKAgainst(
          emb.filter(col("vec_id") < 50), emb, 5)
          .select(col("query_id"), col("neighbor_id")).localCheckpoint(true))
      val approx = time(s"lsh join sampled $i")(
        graft.similarity.Ann.lshTopKJoin(emb, 5,
            queryPred = Some(col("vec_id") < 50))
          .select(col("query_id"), col("neighbor_id")).localCheckpoint(true))
      time(s"rollup $i")(println("  n=" + exact.join(approx,
        Seq("query_id", "neighbor_id"), "left").count()))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}




object ProfileMm8 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.multimodal.Media
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mm8prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Tables.table(spark, dir, "documents")
    time("assets only")(println(Media.jpegAssets(docs).count()))
    Seq(4, 5, 6, 8).foreach { hops =>
      val a = Media.jpegAssets(docs)
      val (w, h) = Media.jpegDims(col("content"), hops)
      time(s"walk hops=$hops")(
        println(a.select(col("asset_id"), w.as("w"), h.as("h"))
          .agg(sum(col("w")), sum(col("h"))).collect().mkString))
    }
    spark.stop()
  }
}

/** 100× exact-copy replica (id-shifted, the MakeReplica10 recipe via a
  * single explode instead of a 100-way union): 60M lineitem / 10M
  * events / 200k embeddings — the axis for the round-14 "would it
  * hold at 100×" rows (marts, sampled recall faces, salted join,
  * min-plus graph rounds). Documents are omitted (text payload ~GBs;
  * the doc-family 100× story is the bounded-docs isomorphism axis).
  * Usage: Test/runMain graft.MakeReplica100 /tmp/graft100x [srcDir]
  */
object MakeReplica100 {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft100x"
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rep(df: org.apache.spark.sql.DataFrame, shifts: Map[String, Long]) = {
      val r = df.withColumn("__r", explode(sequence(lit(0L), lit(99L))))
      shifts.foldLeft(r) { case (acc, (c, m)) =>
        acc.withColumn(c, col(c) + col("__r") * m)
      }.drop("__r").repartition(16)
    }
    rep(Tables.events(spark, src),
        Map("event_id" -> 100000000L, "user_id" -> 1000000L))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    rep(Tables.table(spark, src, "embeddings"), Map("vec_id" -> 1000000L))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    rep(Tables.table(spark, src, "lineitem"),
        Map("l_orderkey" -> 10000000L, "l_partkey" -> 1000000L,
          "l_suppkey" -> 100000L))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    rep(Tables.table(spark, src, "orders"),
        Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    rep(Tables.table(spark, src, "part"), Map("p_partkey" -> 1000000L))
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    rep(Tables.table(spark, src, "customer"), Map("c_custkey" -> 1000000L))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    rep(Tables.table(spark, src, "documents"), Map("doc_id" -> 1000000L))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[replica] wrote 100x corpus to $out")
    spark.stop()
  }
}

/** r16 verdict #5: the streaming path at VOLUME. The ST batch twins are
  * oracle-green and the specs drive the machinery end-to-end, but at
  * spec scale (tens of rows) a per-batch full-snapshot scan would be
  * invisible. This main drives ≥10⁶ events through a REAL
  * foreachBatch/AvailableNow query into [[StreamIngest.publishDeltas]]
  * (the bucketed CDC snapshot), then proves the bucket layout prunes:
  *
  *   sbt "Test/runMain graft.StressStreaming [nEvents] [nBatches] [nKeys]"
  *
  * Phase 1 (throughput): nEvents synthetic events (distributed
  * `spark.range` — nothing driver-side) written as nBatches parquet
  * files, streamed with maxFilesPerTrigger=1 so foreachBatch sees one
  * file per micro-batch; each batch folds into the 64-bucket snapshot
  * and publishes deltas. Reports rows/s overall.
  *
  * Phase 2 (pruning proof): with the ~nKeys-row snapshot standing, a
  * ONE-ROW batch runs through the same path; the assertion is on the
  * FILESYSTEM — exactly one bucket directory's contents rewritten
  * (mtime advanced), everything else untouched. A full-snapshot
  * rewrite (the failure this exists to catch) rewrites all 64. The
  * one-row batch's wall time is also printed next to a full batch's —
  * at a 16× snapshot/batch ratio they'd converge if the read scanned
  * the whole store.
  *
  * Phase 3: [[StreamIngest.admitToCorpus]] throughput — synthetic docs
  * (20% exact cross-batch duplicates) admitted batch-by-batch against
  * the standing minhash INDEX; per-batch cost must track batch size,
  * not corpus size (printed per batch so a drift is visible).
  *
  * Phase 4: [[StreamIngest.semAdmitToCorpus]] (ST25) at the same
  * volume — the embedding face: 20% exact cross-batch vector clones
  * must all reject via the standing IVF index (asserted), per-batch
  * cost printed, and a 1-vector batch shows the probed-bucket bound
  * on the pruned index read. */
object StressStreaming {
  import graft.streaming.StreamIngest
  def main(args: Array[String]): Unit = {
    val nEvents = if (args.length > 0) args(0).toLong else 1200000L
    val nBatches = if (args.length > 1) args(1).toInt else 12
    val nKeys = if (args.length > 2) args(2).toLong else 200000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_stress_stream")
    val src = base.resolve("src").toString
    val snap = base.resolve("snapshot").toString
    val delta = base.resolve("deltas").toString
    val perBatch = nEvents / nBatches
    (0 until nBatches).foreach { b =>
      spark.range(b * perBatch, (b + 1) * perBatch)
        .select(col("id").as("event_id"),
          to_timestamp(lit("2024-01-01 00:00:00")).plus(
            expr("make_interval(0,0,0,0,0,0, id % 86400)")).as("ts"),
          pmod(xxhash64(col("id")), lit(nKeys)).as("user_id"),
          concat(lit("type_"), pmod(col("id"), lit(5))).as("event_type"),
          (col("id") % 1000).cast("double").as("value"))
        .coalesce(4)
        .write.mode("overwrite").parquet(s"$src/b$b")
    }
    val schema = spark.read.parquet(s"$src/b0").schema
    val t0 = System.nanoTime()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 4) // 4 files = one generated batch
      .parquet(s"$src/*")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.publishDeltas(b, snap, delta,
          "user_id", "ts", "event_id", Seq("event_type", "value"),
          batchId = id, nBuckets = 64)
      }
      .option("checkpointLocation", base.resolve("chk").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val stateRows = spark.read.parquet(snap).count()
    val deltaRows = spark.read.parquet(delta).count()
    println(f"[stress-stream] publishDeltas: $nEvents events / $nBatches batches " +
      f"in $secs%.1fs = ${nEvents / secs}%.0f rows/s (state=$stateRows deltas=$deltaRows)")

    // phase 2: one-row batch against the standing snapshot — filesystem
    // proof that only ITS bucket is rewritten
    def bucketMtimes(): Map[String, Long] =
      new java.io.File(snap).listFiles().filter(_.getName.startsWith("bucket="))
        .map(d => d.getName -> d.listFiles().map(_.lastModified()).max).toMap
    val before = bucketMtimes()
    import spark.implicits._
    val oneRow = Seq((999999999L,
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), 42L, "type_9", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val t1 = System.nanoTime()
    StreamIngest.publishDeltas(oneRow, snap, delta, "user_id", "ts",
      "event_id", Seq("event_type", "value"), batchId = 9999L, nBuckets = 64)
    val oneSecs = (System.nanoTime() - t1) / 1e9
    val after = bucketMtimes()
    val rewritten = after.count { case (k, v) => before.get(k).exists(_ < v) } +
      after.count { case (k, _) => !before.contains(k) }
    println(f"[stress-stream] 1-row batch vs $stateRows-row snapshot: " +
      f"$oneSecs%.2fs, bucket dirs rewritten = $rewritten (MUST be 1; 64 = full scan)")
    assert(rewritten == 1, s"expected exactly 1 rewritten bucket, got $rewritten")

    // phase 3: admitToCorpus throughput — per-batch seconds must track
    // batch size, not the growing corpus
    val sinkD = base.resolve("corpus").toString
    val idxD = base.resolve("corpus_idx").toString
    val admitBatches = 8
    val docsPer = 25000L
    (0 until admitBatches).foreach { b =>
      // 20% of each batch duplicates the PREVIOUS batch's content
      // (id offset back) — the admission must reject those via the index
      val docs = spark.range(b * docsPer, (b + 1) * docsPer)
        .select(col("id").as("doc_id"),
          concat_ws(" ", (0 until 30).map(i =>
            concat(lit(s"w$i"), pmod(col("id") * (i + 7), lit(1000003)))): _*)
            .as("text"))
        .withColumn("text", when(col("doc_id") % 5 === 0,
            // exact clone of a NON-clone doc from the previous batch
            // (target id % 5 == 1, so its stored text is the base
            // formula — a clone-of-clone chain would never match)
            concat_ws(" ", (0 until 30).map(i =>
              concat(lit(s"w$i"),
                pmod((col("doc_id") - docsPer + 1) * (i + 7), lit(1000003)))): _*))
          .otherwise(col("text")))
      val tb = System.nanoTime()
      StreamIngest.admitToCorpus(docs, sinkD, idxD, 0.7)
      val bs = (System.nanoTime() - tb) / 1e9
      println(f"[stress-stream] admitToCorpus batch $b: $docsPer docs in $bs%.1fs " +
        f"= ${docsPer / bs}%.0f docs/s (corpus now ${(b + 1) * docsPer} submitted)")
    }
    val corpusN = spark.read.parquet(sinkD).count()
    println(s"[stress-stream] admitted corpus rows = $corpusN " +
      s"(submitted ${admitBatches * docsPer}; cross-batch clones rejected)")

    // phase 4: semAdmitToCorpus (ST25) — the embedding face at the
    // same volume: 8 × 25k synthetic vectors, 20% of each batch an
    // exact clone of the PREVIOUS batch (must reject via the standing
    // index); per-batch seconds must track batch size, not corpus
    // size. Then a 1-vector batch against the standing index: its
    // probed-bucket count (printed) is what the pruned read touches.
    val sinkE = base.resolve("emb_corpus").toString
    val idxE = base.resolve("emb_index").toString
    val vecBatches = 8
    val vecsPer = 25000L
    // pseudo-random 64-dim vector from (id, j) via a REAL hash — an
    // LCG progression here leaves adjacent ids near-parallel (measured:
    // 136k of 200k vectors accidentally rejected as near-dups)
    def vecExpr(idSql: String) =
      s"""transform(sequence(0, 63), j -> CAST(
         |  (xxhash64($idSql, j) % 1000003) / 1000003.0 AS FLOAT))""".stripMargin
    (0 until vecBatches).foreach { b =>
      val vecs = spark.range(b * vecsPer, (b + 1) * vecsPer)
        .select(col("id"),
          when(col("id") % 5 === 0 && col("id") >= vecsPer,
              expr(vecExpr(s"(id - $vecsPer + 1)")))
            .otherwise(expr(vecExpr("id"))).as("embedding"))
        .select(col("id").as("vec_id"), col("embedding"))
      val tb = System.nanoTime()
      StreamIngest.semAdmitToCorpus(vecs, sinkE, idxE, batchId = b.toLong, tau = 0.85)
      val bs = (System.nanoTime() - tb) / 1e9
      println(f"[stress-stream] semAdmitToCorpus batch $b: $vecsPer vecs in $bs%.1fs " +
        f"= ${vecsPer / bs}%.0f vecs/s (corpus now ${(b + 1) * vecsPer} submitted)")
    }
    val embN = spark.read.parquet(sinkE).count()
    val expectedRejects = (vecBatches - 1) * vecsPer / 5
    val expectedAdmit = vecBatches * vecsPer - expectedRejects
    println(s"[stress-stream] admitted embedding corpus rows = $embN " +
      s"(submitted ${vecBatches * vecsPer}; expected clone rejects = $expectedRejects)")
    // every clone MUST reject (<= bound); a handful of accidental
    // near-dups among 200k random 64-d vectors is tolerated (>= bound)
    assert(embN <= expectedAdmit && embN >= expectedAdmit - 50,
      s"cross-batch exact clones must reject (expected ~$expectedAdmit, got $embN)")
    // 1-vector batch: probed buckets bound the index read
    import org.apache.spark.sql.functions.{col => c2}
    val cents = spark.read.parquet(s"$idxE/centroids")
      .select(c2("cell"), c2("v"), c2("nrm"))
      .as[(Int, Array[Double], Double)].collect().sortBy(_._1)
    val one = spark.range(9999999L, 10000000L)
      .select(c2("id").as("vec_id"), expr(vecExpr("id")).as("embedding"))
    val probed = graft.similarity.Ann.probedCells(one,
      cents.map(_._2), cents.map(_._3)).map(_ % 64).distinct
    val t2 = System.nanoTime()
    StreamIngest.semAdmitToCorpus(one, sinkE, idxE, batchId = 999L, tau = 0.85)
    val oneVecSecs = (System.nanoTime() - t2) / 1e9
    println(f"[stress-stream] 1-vector batch vs $embN-vector index: " +
      f"$oneVecSecs%.2fs, probed buckets = ${probed.length} of 64 " +
      "(the pruned read touches only these)")
    assert(probed.length <= 4, "one vector probes at most nProbe buckets")
    spark.stop()
  }
}
