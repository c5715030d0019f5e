package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** s13_decimal_money — the decimal-at-storage / integer-cents-at-output
  * contract. The operator's point is that money flows through parquet
  * as a NATIVE DecimalType (the reference's Postgres `numeric` columns,
  * webhook_app.py's amount fields) and aggregates in exact decimal
  * arithmetic; the DECLARED output is exact integer cents because the
  * driver's correctness hash rejects any DecimalType output (r8–r10).
  *
  * Pins (per the r10 advice on silent non-ANSI overflow): every cents
  * column is non-NULL — under non-ANSI Spark an overflowing narrowing
  * cast yields NULL silently, so a NULL here is how overflow would
  * surface, and this makes it a test failure instead of a wrong row.
  */
class S13DecimalSpec extends SparkSpec {

  test("s13 aggregates decimal(18,2) storage to exact non-NULL integer cents") {
    val out = SparkEntry.queries("s13_decimal_money")(spark, sfDir)

    // output schema carries NO DecimalType — the driver-hash contract
    val cents = Seq("total_cents", "min_cents", "max_cents")
    cents.foreach { c =>
      assert(out.schema(c).dataType == LongType, s"$c must be BIGINT cents")
    }
    assert(!out.schema.exists(_.dataType.isInstanceOf[DecimalType]),
      "no DecimalType may reach the declared output schema")

    val rows = out.collect()
    assert(rows.nonEmpty)
    // non-NULL: a silent overflow-to-NULL in the long cast fails here
    cents.foreach { c =>
      assert(out.filter(col(c).isNull).count() == 0, s"$c has NULLs (overflow?)")
    }

    // cents are exactly 100× the decimal aggregate: recompute the sum
    // in decimal on the same stored scratch-free path and compare
    val expect = Tables.table(spark, sfDir, "orders")
      .select(col("o_orderstatus").as("status"),
        col("o_totalprice").cast("decimal(18,2)").as("price_d"))
      .groupBy("status")
      .agg((sum(col("price_d")) * 100).cast("long").as("total_cents"),
        (min(col("price_d")) * 100).cast("long").as("min_cents"),
        (max(col("price_d")) * 100).cast("long").as("max_cents"))
    assert(out.select("status", "total_cents", "min_cents", "max_cents")
      .exceptAll(expect).count() == 0)

    // the STORAGE leg still demonstrates the native decimal type: the
    // parquet the query writes carries DecimalType(18,2) in its footer
    val stored = spark.read.parquet(SparkEntry.scratchDir("s13"))
    assert(stored.schema("price_d").dataType == DecimalType(18, 2),
      "scratch parquet must store a native decimal column")
  }
}
