package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S8: one-time bulk file load (the reference's `action_history` CSV
  * export loaded via psql COPY, README.md:146-147).
  *
  * Spark-first: schema is declared (never inferred — inference is a
  * second full read and type drift at 100 TB), the read is permissive
  * (malformed rows land in a corrupt-record column instead of failing
  * the load, matching the reference's tolerate-and-log posture), and
  * the result lands as partitioned parquet so history participates in
  * pruning like every other fact table.
  */
object BulkLoad {

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Load + archive as parquet (optionally partitioned). */
  def csvToParquet(spark: SparkSession, csvPath: String, schema: StructType,
      outPath: String, partitionCols: Seq[String] = Nil): DataFrame = {
    val df = csv(spark, csvPath, schema)
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(outPath)
    spark.read.parquet(outPath)
  }
}
