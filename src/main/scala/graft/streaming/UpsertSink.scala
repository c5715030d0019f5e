package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}

/** Idempotent per-micro-batch sink contract (the reference's
  * `INSERT ... ON CONFLICT (id) DO NOTHING` against Postgres,
  * webhook_app.py:41-49). A `foreachBatch` caller passes the batch and
  * Spark's epoch id; an implementation must tolerate the SAME batch
  * being delivered twice (foreachBatch is at-least-once — a retried
  * epoch re-runs the function on identical data).
  */
trait UpsertSink {
  def upsert(batch: DataFrame, batchId: Long): Unit
}

/** Warehouse-boundary implementation: keyed upsert through JDBC batch
  * statements, one connection per partition (the executor-side mirror
  * of the reference's psycopg2 `execute` loop). The conflict clause
  * makes replays no-ops at the database, so exactly-once lands where
  * it belongs: on the transactional store, not in Spark state.
  *
  * `dialect` picks the conflict syntax: `postgres` (ON CONFLICT DO
  * NOTHING, the reference's exact statement), `merge` (ANSI MERGE for
  * warehouses without the Postgres clause), or `derby` (MERGE against
  * SYSIBM.SYSDUMMY1 with WHEN NOT MATCHED only — insert-if-absent, the
  * exact DO NOTHING semantics, on the embedded engine Spark ships; this
  * is what lets a spec drive the sink against a LIVE connection with
  * zero extra dependencies). Statements batch in groups of `batchSize`
  * to amortize round-trips.
  */
final class JdbcUpsertSink(url: String, table: String, key: String,
    connectionProperties: java.util.Properties = new java.util.Properties,
    dialect: String = "postgres", batchSize: Int = 500) extends UpsertSink {

  /** The per-row statement; exposed for tests. */
  def upsertSql(cols: Seq[String]): String = {
    val colList = cols.mkString(", ")
    val placeholders = cols.map(_ => "?").mkString(", ")
    dialect match {
      case "postgres" =>
        s"INSERT INTO $table ($colList) VALUES ($placeholders) ON CONFLICT ($key) DO NOTHING"
      case "merge" =>
        val sets = cols.filterNot(_ == key).map(c => s"t.$c = s.$c").mkString(", ")
        val srcCols = cols.map(c => s"? AS $c").mkString(", ")
        s"MERGE INTO $table t USING (SELECT $srcCols) s ON t.$key = s.$key " +
          s"WHEN MATCHED THEN UPDATE SET $sets " +
          s"WHEN NOT MATCHED THEN INSERT ($colList) VALUES (${cols.map(c => s"s.$c").mkString(", ")})"
      case "derby" =>
        // Derby's MERGE source must be a table — the one-row dummy with
        // the key probe in the ON clause turns MERGE into insert-if-absent
        s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 d ON t.$key = ? " +
          s"WHEN NOT MATCHED THEN INSERT ($colList) VALUES ($placeholders)"
      case other => throw new IllegalArgumentException(s"unknown dialect: $other")
    }
  }

  /** Column order of the statement's `?` parameters (the derby probe
    * repeats the key ahead of the insert list). */
  def paramCols(cols: Seq[String]): Seq[String] =
    if (dialect == "derby") key +: cols else cols

  override def upsert(batch: DataFrame, batchId: Long): Unit = {
    val cols = batch.columns.toSeq
    val sql = upsertSql(cols)
    val params = paramCols(cols).map(cols.indexOf)
    val (u, props, bs) = (url, connectionProperties, batchSize)
    // dropDuplicates first: two copies of a key INSIDE one batch would
    // otherwise race in the same transaction.
    batch.dropDuplicates(key).foreachPartition { (rows: Iterator[Row]) =>
      val conn = java.sql.DriverManager.getConnection(u, props)
      try {
        conn.setAutoCommit(false)
        val st = conn.prepareStatement(sql)
        var n = 0
        rows.foreach { r =>
          var c = 0
          while (c < params.length) { st.setObject(c + 1, r.get(params(c))); c += 1 }
          st.addBatch()
          n += 1
          if (n % bs == 0) st.executeBatch()
        }
        st.executeBatch()
        conn.commit()
      } finally conn.close()
    }
  }
}

/** File-lake implementation and in-sandbox test double: the
  * partition-pruned parquet anti-join sink
  * ([[StreamIngest.idempotentAppendPartitioned]]) behind the same
  * contract, so a pipeline swaps warehouse for lake by constructor. */
final class ParquetUpsertSink(path: String, key: String,
    partCol: String, partExpr: Column) extends UpsertSink {
  override def upsert(batch: DataFrame, batchId: Long): Unit =
    StreamIngest.idempotentAppendPartitioned(batch, path, key, partCol, partExpr)
}
