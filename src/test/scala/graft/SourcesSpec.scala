package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ingest.Backfill
import graft.ingest.Backfill.RawLead
import graft.sources.{BulkLoad, Layout}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S1/E1: paginated backfill stops on empty page and accumulates all rows") {
    val total = 273
    def fetchPage(offset: Int): Seq[RawLead] =
      (offset until math.min(offset + 100, total)).map(i =>
        RawLead(i.toLong, s"lead-$i", "open", "Ingresados", Some(i * 10.0),
          "2025-09-11T14:03:22", "2025-09-30", Seq("a", "b"), Some(i % 2 == 0), "a@x.com"))
    val ds = Backfill.paginatedFetch(spark, fetchPage)
    assert(ds.count() === total)
  }

  test("S1: DSv2 paged source fetches offset ranges as parallel partitions") {
    val df = spark.read.format("graft-paged")
      .option("fetcher", classOf[StubLeadFetcher].getName)
      .option("pageSize", 100)
      .load()
    // ceil(237/100) = 3 pages -> 3 input partitions, fetched by executors
    assert(df.rdd.getNumPartitions === 3, "one InputPartition per page")
    assert(df.count() === 237)
    // content is exactly the collection, no page lost or double-fetched
    import org.apache.spark.sql.functions.{count => fcount, countDistinct, sum}
    val r = df.agg(sum("id"), countDistinct("id"), fcount(lit(1))).head()
    assert(r.getLong(0) === (0L until 237).sum)
    assert(r.getLong(1) === 237L && r.getLong(2) === 237L)
    // composes with the normal relational surface (schema is declared)
    assert(df.filter(col("id") === 7).head().getAs[String]("title") === "lead-7")
  }

  test("E1: normalize applies F1/F2/F4/F5 column-wise") {
    val raw = Seq(
      RawLead(1, "t", "open", "s", Some(5.0), "2024-06-15 12:00:00", "2024-06-16",
        Seq("x", "y"), Some(true), "e@x.com"),
      RawLead(2, "t2", "open", "s", None, "garbage", "2024-06-17",
        Seq.empty, None, "e2@x.com")).toDF()
    val n = Backfill.normalize(raw).orderBy("id").collect()
    assert(n(0).getAs[String]("created_at_local") === "2024-06-15 06:00:00")
    assert(n(0).getAs[String]("tags_csv") === "x,y")
    assert(n(0).getAs[Int]("starred_int") === 1)
    assert(n(1).isNullAt(n(1).fieldIndex("created_at_utc")), "junk date => NULL")
    assert(n(1).isNullAt(n(1).fieldIndex("tags_csv")), "empty tags => NULL")
  }

  test("E1: snapshot keeps the newest row per lead id (INSERT OR REPLACE)") {
    val raw = Seq(
      RawLead(1, "old", "open", "s", None, "2024-01-01", "2024-01-01", Nil, None, "e"),
      RawLead(1, "new", "won", "s", None, "2024-01-01", "2024-02-01", Nil, None, "e")).toDF()
    val snap = Backfill.snapshot(Backfill.normalize(raw))
    assert(snap.count() === 1)
    assert(snap.head().getAs[String]("title") === "new")
  }

  test("S8: bulk CSV load with declared schema, permissive mode") {
    val dir = Files.createTempDirectory("graft_csv")
    val csv = dir.resolve("action_history.csv")
    Files.writeString(csv, "action_id,lead_id,action\n1,10,created\n2,11,step_changed\n")
    val schema = StructType(Seq(
      StructField("action_id", LongType), StructField("lead_id", LongType),
      StructField("action", StringType)))
    val out = BulkLoad.csvToParquet(spark, csv.toString, schema,
      dir.resolve("out").toString)
    assert(out.count() === 2)
    assert(out.schema("action_id").dataType === LongType)
  }

  test("S11: mergeSchema read unifies writer generations; old rows NULL the new column") {
    val dir = Files.createTempDirectory("graft_s11_spec")
    Seq((1L, "a")).toDF("id", "name").write.parquet(dir.resolve("g1").toString)
    Seq((2L, "b", 7L)).toDF("id", "name", "extra").write.parquet(dir.resolve("g2").toString)
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(dir.resolve("g1").toString, dir.resolve("g2").toString)
    assert(merged.columns.toSet === Set("id", "name", "extra"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("extra")), "v1 row NULLs the added column")
    assert(byId(2L).getAs[Long]("extra") === 7L)
  }

  test("Graft.session + attach: one-call setup serves SQL with the rule installed") {
    val s = Graft.session(master = "local[4]")
    try {
      Graft.attach(s, sfDir)
      assert(s.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
      // native function is SQL-callable without further setup
      val d = s.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
        .head().getDouble(0)
      assert(d === 11.0)
      assert(s.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.plans.BroadcastDims]))
    } finally {
      s.experimental.extraOptimizations = Nil
    }
  }

  test("S9: registerViews gives a drop-in spark.sql endpoint over the warehouse") {
    Tables.registerViews(spark, sfDir)
    graft.functions.GraftFunctions.register(spark)
    // a measure query in pure SQL, including a registered native expr
    val rows = spark.sql(
      """SELECT c_name, count(*) AS n FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name ORDER BY n DESC, c_name LIMIT 3""".stripMargin).collect()
    assert(rows.length === 3 && rows.head.getLong(1) > 0)
    // events view goes through the nanos-aware loader: ts is a usable timestamp
    val days = spark.sql(
      "SELECT count(DISTINCT date_trunc('DAY', ts)) FROM events").head().getLong(0)
    assert(days > 0)
  }

  test("S5/§4: partitioned layout prunes partitions under slicer predicates") {
    val dir = Files.createTempDirectory("graft_layout").resolve("facts").toString
    val events = Tables.events(spark, sfDir)
      .withColumn("office", concat(lit("office_"), pmod(col("user_id"), lit(3))))
    Layout.writeEventFacts(events, dir)
    val pruned = Layout.slicerScan(spark, dir, Some("office_1"), Some(2024), Some(1))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "scan must carry partition filters")
    assert(pruned.count() > 0)
    // pruning actually reduces files read: full scan touches 3 offices
    val full = spark.read.parquet(dir).count()
    assert(pruned.count() < full)
    assert(pruned.select("office").distinct().as[String].collect().toSeq === Seq("office_1"))
  }

  test("z-order layout keeps file stats tight on BOTH join dimensions") {
    val li = Tables.table(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
    val base = Files.createTempDirectory("graft_zorder")
    val zPath = base.resolve("z").toString
    val sPath = base.resolve("sorted").toString
    Layout.zorderWrite(li, "l_orderkey", "l_partkey", zPath, 8)
    // the single-column alternative: clustered on orderkey only
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(sPath)

    // files whose [min,max] interval on `c` intersects [lo,hi] — the set
    // a stats-based reader must open (parquet footer pruning proxy)
    def overlapping(path: String, c: String, lo: Long, hi: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
        .filter(col("mn") <= hi && col("mx") >= lo).count()

    val r = li.agg(min(col("l_partkey")), max(col("l_partkey"))).head()
    val (pLo, pHi) = (r.getLong(0), r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 4)
    // under orderkey-sort, every file spans the full partkey domain:
    // a partkey predicate can prune nothing
    assert(overlapping(sPath, "l_partkey", pLo, pHi) === 8L)
    // under z-order the same quartile predicate touches a minority of files
    val zTouched = overlapping(zPath, "l_partkey", pLo, pHi)
    assert(zTouched <= 4L, s"z-order should prune most files, touched $zTouched/8")
    // and the first dimension still prunes too (no single-axis collapse)
    val o = li.agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
    val oHi = o.getLong(0) + (o.getLong(1) - o.getLong(0)) / 4
    assert(overlapping(zPath, "l_orderkey", o.getLong(0), oHi) < 8L)
  }
}
