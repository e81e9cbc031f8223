package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.ReferenceOps

/** Reference-surface queries R1–R8 (SURVEY §2.4): each is the
  * capability-equivalent of a cited reference behavior, restated over the
  * driver test tables with an explicit total ordering so the DuckDB
  * oracle can hash results. R9 (streaming running aggregate) lives in
  * [[graft.streaming.StreamingQueries]].
  *
  * All plans are scan → (filter) → (agg/window) → sort: filters and
  * projections push into the parquet scan; aggregates get partial+final
  * (map-side combine) from Catalyst; the final orderBy is a single
  * range-partitioned sort. Nothing here collects to the driver.
  */
object ReferenceQueries {

  /** R1 — substring filter (O4, op1_t1 `contains("Punched")`;
    * reference rainstorm/rainstorm.go:398-407). */
  def r1SubstrFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .filter(col("p_name").contains("ol"))
      .orderBy("p_partkey")

  /** R2 — positional field-equality filter (O5, op1_t2). */
  def r2FieldEqFilter(spark: SparkSession, dir: String): DataFrame =
    r2Shape(Tables.load(spark, dir, "events"))

  /** R2's operator shape over any events scan — the production layout
    * is a partitioned dataset, and PartitionPruningSpec drives this
    * exact definition over one to prove the predicate prunes at
    * planning time. */
  def r2Shape(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "click")
      .orderBy("event_id")

  /** R3 — two-column projection (O6, op2_t1 cols [2,3]). */
  def r3Projection(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .orderBy("l_orderkey", "l_linenumber")
      .select("l_orderkey", "l_returnflag")

  /** R4 — filter→project pipeline (t1 end-to-end: O4→O6). */
  def r4FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority").contains("URGENT"))
      .orderBy("o_orderkey")
      .select("o_orderkey", "o_orderpriority")

  /** R5 — grouped count, partial+final (O7+O8, op2_t2 + leader merge). */
  def r5GroupCount(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** R6 — filter→group-count pipeline (t2 end-to-end: O5→O7→O8) — the
    * whole reference pipeline shape in one query (SURVEY §7 slice 0). */
  def r6FilterGroupCount(spark: SparkSession, dir: String): DataFrame =
    r6Shape(Tables.load(spark, dir, "events"))

  /** R6's operator shape over any events scan (see [[r2Shape]]). */
  def r6Shape(events: DataFrame): DataFrame =
    events
      .filter(col("value") > 50)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** R7 — timestamp-ordered dedup merge (O11, synchronizer.go:75-139):
    * one row per ts (arg-min on event_id for determinism — the reference
    * is last-writer-wins on collision), ascending by ts. */
  def r7TsMerge(spark: SparkSession, dir: String): DataFrame =
    ReferenceOps.tsOrderedMerge("ts", Seq(col("event_id")))(
      Tables.load(spark, dir, "events").select("ts", "event_id", "value"))

  /** R8 — batch-id dedup (O9, rainstorm.go:538-544): first event per
    * (user_id, event_type) in (ts, event_id) order. */
  def r8BatchDedup(spark: SparkSession, dir: String): DataFrame =
    ReferenceOps.dedupFirst(
      Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))(
      Tables.load(spark, dir, "events"))
      .orderBy("event_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r1_substr_filter"     -> (r1SubstrFilter _),
    "r2_field_eq_filter"   -> (r2FieldEqFilter _),
    "r3_projection"        -> (r3Projection _),
    "r4_filter_project"    -> (r4FilterProject _),
    "r5_group_count"       -> (r5GroupCount _),
    "r6_filter_group_count" -> (r6FilterGroupCount _),
    "r7_ts_merge"          -> (r7TsMerge _),
    "r8_batch_dedup"       -> (r8BatchDedup _),
  )

  val oracleSql: Map[String, String] = Map(
    "r1_substr_filter" ->
      "SELECT * FROM part WHERE p_name LIKE '%ol%' ORDER BY p_partkey",
    "r2_field_eq_filter" ->
      "SELECT * FROM events WHERE event_type = 'click' ORDER BY event_id",
    "r3_projection" ->
      "SELECT l_orderkey, l_returnflag FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "r4_filter_project" ->
      "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority LIKE '%URGENT%' ORDER BY o_orderkey",
    "r5_group_count" ->
      "SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "r6_filter_group_count" ->
      "SELECT event_type, COUNT(*) AS cnt FROM events WHERE value > 50 GROUP BY event_type ORDER BY event_type",
    "r7_ts_merge" ->
      ("SELECT ts, event_id, value FROM (SELECT ts, event_id, value, " +
        "ROW_NUMBER() OVER (PARTITION BY ts ORDER BY event_id) AS rn FROM events) " +
        "WHERE rn = 1 ORDER BY ts, event_id"),
    "r8_batch_dedup" ->
      ("SELECT event_id, ts, user_id, event_type, value, props FROM " +
        "(SELECT *, ROW_NUMBER() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn FROM events) t " +
        "WHERE rn = 1 ORDER BY event_id"),
  )
}
