package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto front): the rows not dominated in a
  * (minimize x, maximize y) trade-off — e.g. "no other part is both
  * cheaper and larger". The naive formulation is a quadratic NOT
  * EXISTS self-join; for two dimensions a sort makes it LINEAR: after
  * ordering by (x asc, y desc), a distinct (x, y) pair is dominated
  * iff some earlier pair has y' ≥ y (earlier means x' < x, or x' = x
  * with y' > y — either way a dominator), i.e. iff the running max of
  * y over the strict prefix reaches y.
  *
  * Scale: a single global sort would bottleneck on one reducer, so
  * the prefix max is computed in two tiers — range-band the x axis,
  * take the running max WITHIN each band (parallel windows), and
  * cumulative-max the per-band maxima ACROSS bands (a ≤`bands`-row
  * table, broadcast back). Band b' < b implies x' < x strictly (floor
  * banding), so the cross-band term needs no tie handling. Work is
  * one distinct shuffle + one banded window + one broadcast join,
  * at any input size.
  */
object Skyline {

  /** @param df       input rows
    * @param minimize  column to minimize (numeric)
    * @param maximize  column to maximize (numeric)
    * @param bands     x-axis range bands (parallelism of the window)
    * @return the input rows whose (minimize, maximize) pair lies on
    *         the Pareto front; duplicate optimal pairs all survive.
    */
  def skyline2d(df: DataFrame, minimize: String, maximize: String,
                bands: Int = 64): DataFrame = {
    val x = col(minimize)
    val y = col(maximize)
    // distinct pairs materialized ONCE (three consumers below — the
    // banded window, the band maxima, and the range scalars; unbroken
    // lineage would re-scan the input for each).
    val pairs = df.select(x.as("x"), y.as("y")).distinct().localCheckpoint(true)
    if (pairs.isEmpty) return df.limit(0)
    // x-range: TWO driver-side doubles (bounded by construction) that
    // only steer band ASSIGNMENT — the domination math below never
    // touches them, so float rounding here cannot affect the result.
    val row = pairs
      .agg(min(col("x").cast("double")), max(col("x").cast("double"))).head()
    val (xmin, xmax) = (row.getDouble(0), row.getDouble(1))
    val width = (xmax - xmin + 1e-9) / bands
    val banded = pairs
      .withColumn("band",
        least(floor((col("x").cast("double") - lit(xmin)) / lit(width)),
          lit(bands - 1)).cast("int"))
    val inBand = Window.partitionBy(col("band"))
      .orderBy(col("x").asc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = banded.withColumn("pre_max", max(col("y")).over(inBand))
    // per-band maxima, cumulative over STRICTLY earlier bands: tiny.
    val acrossBands = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bandMax = banded.groupBy(col("band")).agg(max(col("y")).as("bmax"))
      .withColumn("prev_band_max", max(col("bmax")).over(acrossBands))
      .select(col("band"), col("prev_band_max"))
    val front = local.join(broadcast(bandMax), "band")
      .filter(coalesce(col("pre_max") >= col("y"), lit(false)) === false &&
        coalesce(col("prev_band_max") >= col("y"), lit(false)) === false)
      .select(col("x"), col("y"))
    df.join(broadcast(front),
      x <=> front("x") && y <=> front("y"), "left_semi")
  }
}
