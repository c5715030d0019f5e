package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-log ingestion operators (SURVEY.md §2.1 S4–S7, §2.2 P1–P4,
  * §2.5 W1, §2.3 J4, §2.7 U1–U3).
  *
  * The reference persists an at-least-once webhook stream into
  * append-only event tables with an idempotent `ON CONFLICT DO NOTHING`
  * sink (webhook_app.py:41-49) and reconstructs a last-known-state
  * snapshot per lead (Lead_Ingestion_CRM_SQLite.py:141-148). Here the
  * same semantics are expressed as deterministic relational ops so they
  * run identically in batch and inside `foreachBatch` on a stream.
  *
  * Scale notes:
  *  - dedup/latest-state are a single hash-shuffle on the key; with the
  *    event store bucketed by key the shuffle disappears entirely.
  *  - the window variants use `row_number` (streaming-safe, spill-safe
  *    via `WindowExec`); no driver-side state.
  *  - office routing is a partition column, not N physical tables, so
  *    partition pruning replaces the reference's table-name dispatch.
  */
object Events {

  /** Payload schema for the harness `events.props` JSON (FIXTURES.md A);
    * `user.email` mirrors the reference's nested null-safe access
    * (webhook_app.py:57). Missing fields ⇒ NULL, never error (S4). */
  val propsSchema: StructType = StructType(Seq(
    StructField("k", LongType),
    StructField("user", StructType(Seq(StructField("email", StringType))))
  ))

  /** S4: schema gate — parse JSON payload permissively; malformed rows
    * get a NULL struct the caller can route to a dead-letter side output
    * (ST7) instead of failing the batch (webhook_app.py:158-159,175-176). */
  def withParsedPayload(events: DataFrame): DataFrame =
    events.withColumn("payload", from_json(col("props"), propsSchema))

  /** S5: whitelist + multiplex routing. One logical table with an
    * `office` partition column replaces the reference's three physical
    * tables per event type (webhook_app.py:20,37). */
  def routeOffices(events: DataFrame, keyCol: Column, allowed: Seq[String]): DataFrame =
    events
      .withColumn("office", concat(lit("office_"), pmod(keyCol, lit(3)).cast("string")))
      .filter(col("office").isin(allowed: _*))

  /** S6: idempotent dedup — deterministic first-writer-wins per key
    * (the reference's ON CONFLICT (id) DO NOTHING, webhook_app.py:48).
    * Deterministic tiebreak makes the result reproducible across runs,
    * unlike dropDuplicates. Single shuffle on the key. */
  def dedupFirstWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** S7/W1/ST6: last-wins snapshot — latest event per key (the
    * reference's INSERT OR REPLACE leads snapshot,
    * Lead_Ingestion_CRM_SQLite.py:141-148). */
  def latestState(df: DataFrame, keys: Seq[String], tsCol: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tsCol.desc, tiebreak.desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** J4/U3: active set = created ∖ deleted, keyed anti join (the
    * reference's lead_deleted table subtracts from lead_created,
    * webhook_app.py:101-124). */
  def activeSet(created: DataFrame, deleted: DataFrame, key: String): DataFrame =
    created.join(deleted, Seq(key), "left_anti")

  /** J5: reached-a-stage numerator via semi join ("Firmados vs
    * Ingresados" conversion numerators, manager dashboard). */
  def reachedStage(entered: DataFrame, reached: DataFrame, key: String): DataFrame =
    entered.join(reached, Seq(key), "left_semi")

  /** U1: multi-office union with office tag; `unionByName` keeps it
    * correct when per-office schemas drift (allowMissingColumns). */
  def unionOffices(offices: Seq[(String, DataFrame)]): DataFrame =
    offices.map { case (name, df) => df.withColumn("office", lit(name)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** U2/J6: historical backfill ∪ live stream, duplicate events (webhook
    * retries replayed in both paths) collapsed (README.md:148-149). */
  def mergeHistLive(hist: DataFrame, live: DataFrame): DataFrame =
    hist.unionByName(live, allowMissingColumns = true).distinct()

  /** U6/CDC: snapshot difference — classify every key as insert /
    * update / delete between two snapshot states; unchanged keys drop
    * out. This is the change-data-capture primitive behind the
    * reference's nightly re-sync (Lead_Ingestion_CRM_SQLite.py:141-148
    * rebuilds the whole leads snapshot; diffing instead ships only the
    * delta downstream — the difference between a full rewrite and an
    * incremental publish at 100 TB).
    *
    * Column compare is null-safe (`<=>`), so NULL→value and value→NULL
    * both classify as `update` instead of vanishing. Presence on each
    * side is detected with injected literal flags — a NULL value column
    * can never be mistaken for an absent row.
    *
    * Scale: both inputs shuffle once on `keys` for the full-outer join;
    * when the snapshots come from [[latestState]] over the same store,
    * the window partitioning and the join key coincide, so the plan
    * reuses one hash exchange per side and nothing wider than
    * keys+values ever moves. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(keys.map(col) ++
      valueCols.map(c => col(c).as(s"old_$c")) :+ lit(1).as("__in_old"): _*)
    val n = newSnap.select(keys.map(col) ++
      valueCols.map(c => col(c).as(s"new_$c")) :+ lit(1).as("__in_new"): _*)
    val changed = valueCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("insert"))
          .when(col("__in_new").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .drop("__in_old", "__in_new")
  }
}
