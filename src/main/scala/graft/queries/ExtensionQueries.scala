package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Capability-extension queries X1–X7 (SURVEY §2.4): the relational
  * primitives the reference lacks entirely (SURVEY §2.3 — joins, window
  * functions, top-k, set ops, scalar functions, event-time windows),
  * exercised Spark-first so Catalyst owns the physical strategy.
  *
  * Scale notes (the part that matters at 100 TB):
  *  - X1/X2: the dimension sides (customer, nation) are orders of
  *    magnitude smaller than the fact side — `broadcast()` hints pin the
  *    hash-join build side so the fact table never shuffles for them.
  *    lineitem⋈orders is a genuine big-big join and correctly
  *    shuffle-joins on the key; AQE handles skew at runtime.
  *  - X3: window partitioned by o_custkey — one hash shuffle, then
  *    in-partition sort; no global sort until the final (small) output.
  *  - X4: global top-k via orderBy+limit — Spark plans TakeOrderedAndProject
  *    (per-partition heap + driver merge of k), NOT a full sort.
  *  - X7: tumbling-window aggregate — partial+final agg on
  *    (window, type); grows with #buckets, not #events.
  */
object ExtensionQueries {

  /** X1 — equi-join customer⋈orders; dimension side broadcast. */
  def x1EquiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    o.join(broadcast(c), c("c_custkey") === o("o_custkey"))
      .select("c_name", "o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** X2 — 3-way join + agg (TPC-H q5-ish): revenue per nation.
    * Join order: lineitem⋈orders (big-big, shuffle on orderkey), then
    * broadcast customer and nation onto it. Revenue rounded to 2dp so
    * the double sum is oracle-stable across summation orders. */
  def x2JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    val l = Tables.load(spark, dir, "lineitem")
    val n = Tables.load(spark, dir, "nation")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** X3 — ranking window: top-3 orders per customer by totalprice. */
  def x3WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  /** X4 — global top-k: 10 highest-revenue lineitems.
    * orderBy+limit → TakeOrderedAndProject (heap per partition, merge of
    * 10 at the driver) — no full sort even at 100 TB. */
  def x4TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  /** X5 — set op: custkeys with orders EXCEPT poor customers' keys. */
  def x5SetOp(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders").select("o_custkey")
    val c = Tables.load(spark, dir, "customer")
      .filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("o_custkey"))
    o.except(c).orderBy("o_custkey")
  }

  /** x26 — bag-semantics set ops (x5/x11 are set-semantics): EXCEPT ALL
    * keeps multiplicity — a customer with 5 orders and 2 urgent ones
    * survives 3 times. Catalyst plans this as a count-aggregated
    * anti-multiplicity join (Expand + aggregate), one shuffle, no
    * row-by-row matching. */
  def x26ExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val all = o.select(col("o_custkey"))
    val urgent = o.filter(col("o_orderpriority").contains("URGENT"))
      .select(col("o_custkey"))
    all.exceptAll(urgent)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .orderBy("o_custkey")
  }

  /** X6 — scalar function surface: date part, substring, rounding.
    * year() cast to long to match DuckDB's BIGINT. */
  def x6ScalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        substring(col("o_orderpriority"), 1, 1).as("prio_class"),
        round(col("o_totalprice"), 0).as("price_r"))
      .orderBy("o_orderkey")

  /** X7 — tumbling event-time window: events per hour × type.
    * Batch shape of the Structured Streaming X7 test; window start
    * surfaces as `ws` (DuckDB oracle: date_trunc). */
  def x7EventWindow(spark: SparkSession, dir: String): DataFrame =
    x7Shape(Tables.load(spark, dir, "events"))

  /** X7's operator shape over any events scan — PartitionPruningSpec
    * drives this exact definition over a day-partitioned layout. */
  def x7Shape(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))
      .orderBy("ws", "event_type")

  /** x34 — SLIDING event-time windows (1-hour width, 15-minute slide):
    * the overlapping-window semantics x7 (tumbling) and x28 (session)
    * don't cover. Spark's `window` with a slide plans one Expand (each
    * event replicated into its width/slide = 4 windows) feeding the
    * usual partial+final aggregate — the streaming-capable sliding
    * trend counter. Shuffle volume is 4× the tumbling case BY DESIGN
    * (that's the semantics), still one row per (window, type) after
    * map-side combine. The oracle reconstructs window membership
    * arithmetically: an event at ts belongs to the 4 grid windows
    * starting in (ts − 1 h, ts]. */
  def x34SlidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))
      .orderBy("ws", "event_type")

  /** x35 — FULL OUTER join, the join type the inventory still lacked
    * (x1 inner, x8 semi/anti, x12 as-of, x32 streaming left-outer):
    * orders ⋈ customer keeping BOTH unmatched sides null-padded — the
    * reconciliation join (every order even if its customer is gone,
    * every customer even with no orders). Plans as one shuffle on the
    * key with both sides streamed (no broadcast: a full outer join
    * cannot broadcast either side — unmatched build rows must also
    * surface). Null ordering pinned NULLS LAST on both engines. */
  def x35FullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
    o.join(c, o("o_custkey") === c("c_custkey"), "full_outer")
      .select(col("o_orderkey"), col("o_totalprice"), col("c_custkey"), col("c_name"))
      .orderBy(col("o_orderkey").asc_nulls_last, col("c_custkey").asc_nulls_last)
  }

  /** The x58 funnel SQL — ONE text shared verbatim by both engines:
    * timestamps, MIN aggregates, equi joins with time residuals and
    * null-probed LEFT joins all spell identically in the two dialects. */
  private val funnelSql = """
      WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
                 WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
            WHERE e.event_type = 'click' GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
            WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      SELECT v.user_id, v.t1, c.t2, p.t3,
             (c.user_id IS NOT NULL) AS reached_click,
             (p.user_id IS NOT NULL) AS reached_purchase
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id
      ORDER BY v.user_id"""

  /** x58 — ordered-step FUNNEL: per user, first 'view', first 'click'
    * strictly after it, first 'purchase' strictly after that — the
    * conversion-path primitive behind every product-analytics engine
    * (and a sequencing query SQL typically hands to specialized
    * systems). Each step is one keyed MIN aggregate over an equi join
    * whose TIME constraint rides as a residual (never an interval
    * nested loop), and later steps join only the SURVIVORS of earlier
    * ones — the candidate set shrinks monotonically down the funnel.
    * At 100 TB: three key-equi shuffles of (user, ts) pairs, no
    * windows, no per-user event-sequence buffering (contrast the
    * sessionize/window spelling, which sorts every user's full
    * history); the LEFT joins preserve drop-offs, whose NULL steps ARE
    * the funnel metric. */
  def x58Funnel(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(funnelSql)
  }

  /** The x59 retention SQL, parameterized on the one dialect split:
    * day arithmetic (Spark `datediff(d, cohort)`, DuckDB `d - cohort`). */
  private def retentionSql(dayDiff: String): String = s"""
      WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
                 FROM events GROUP BY user_id),
      a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      cs AS (SELECT cohort, COUNT(*) AS cohort_size FROM f GROUP BY cohort)
      SELECT f.cohort, CAST($dayDiff AS BIGINT) AS day_offset,
             COUNT(*) AS active_users,
             round(CAST(COUNT(*) AS DOUBLE)
                   / CAST(cs.cohort_size AS DOUBLE), 6) AS retention
      FROM a JOIN f ON a.user_id = f.user_id
             JOIN cs ON cs.cohort = f.cohort
      GROUP BY f.cohort, CAST($dayDiff AS BIGINT), cs.cohort_size
      ORDER BY f.cohort, day_offset"""

  /** x59 — COHORT RETENTION matrix: users grouped by first-activity
    * day, each cohort's share still active N days later — the
    * growth-analytics staple next to x58's funnel. Shape: the cohort
    * map is one keyed MIN; activity de-dups to (user, day) pairs (one
    * partial+final DISTINCT on a 12-byte key — days, not events, cross
    * the wire after map-side combine); the cohort join is key-equi;
    * and the output matrix is cohorts × offsets — tiny at any corpus
    * size, so nothing bigger than the answer survives the last
    * aggregate. Retention ratios derive from exact integer counts. */
  def x59Retention(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(retentionSql("datediff(a.d, f.cohort)"))
  }

  /** x63 — INTERSECT ALL, completing the set-operation matrix (x5
    * EXCEPT, x11 INTERSECT, x26 EXCEPT ALL): multiset intersection
    * keeps each key min(multiplicity-left, multiplicity-right) times —
    * here "order keys by customers with a positive balance, counted as
    * often as both sides support". Catalyst plans it as the
    * generated-multiplicity join (no row-by-row loop); output is
    * re-grouped so the result is a deterministic (key, n) table. */
  def x63IntersectAll(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql("""
      SELECT o_custkey, COUNT(*) AS n FROM (
        SELECT o_custkey FROM orders
        INTERSECT ALL
        SELECT c_custkey FROM customer WHERE c_acctbal > 0)
      GROUP BY o_custkey ORDER BY o_custkey""")
  }

  /** x64 — NULL-semantics battery: the three-valued-logic behaviors
    * that silently diverge when a workload migrates engines —
    * null-safe equality, IS DISTINCT FROM, NULL propagation through
    * comparisons and 3VL OR/AND, NULLIF/COALESCE, and NULL handling in
    * aggregates (COUNT(col) vs COUNT(*), SUM/AVG skipping nulls, and
    * the all-NULL group yielding NULL not 0). Two deterministic
    * nullable derivations (value NULLed on 'error' rows; a second
    * NULLed by key residue) give every 3VL combination real rows.
    * Row-level battery on a 1-in-50 sample + the per-type aggregate
    * battery; pure scan + one partial+final aggregate. The only
    * dialect split is null-safe equality's spelling (Spark `<=>`,
    * DuckDB `IS NOT DISTINCT FROM`). */
  def x64NullLogic(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(nullLogicSql("v <=> w"))
  }

  private[queries] def nullLogicSql(nullSafeEq: String): String = s"""
      WITH t AS (SELECT event_id, event_type, user_id,
                   CASE WHEN event_type = 'error' THEN NULL
                        ELSE CAST(round(value) AS BIGINT) END AS v,
                   CASE WHEN user_id % 3 = 0 THEN NULL
                        ELSE CAST(round(value) AS BIGINT) END AS w
                 FROM events),
      rowlevel AS (
        SELECT event_id,
               $nullSafeEq                    AS nsafe_eq,
               (v = w)                        AS plain_eq,
               (v > 100 OR w > 100)           AS either_big,
               (v > 100 AND w > 100)          AS both_big,
               coalesce(v, -1)                AS v_filled,
               nullif(coalesce(v, -1), -1)    AS v_refused
        FROM t WHERE event_id % 50 = 0),
      agglevel AS (
        SELECT event_type,
               COUNT(*)                       AS n_rows,
               COUNT(v)                       AS n_nonnull,
               CAST(SUM(v) AS BIGINT)         AS sum_v,
               round(AVG(CAST(v AS DOUBLE)), 6) AS avg_v
        FROM t GROUP BY event_type)
      SELECT r.event_id, r.nsafe_eq, r.plain_eq, r.either_big, r.both_big,
             r.v_filled, r.v_refused,
             a.event_type, a.n_rows, a.n_nonnull, a.sum_v, a.avg_v
      FROM rowlevel r JOIN events e ON e.event_id = r.event_id
      JOIN agglevel a ON a.event_type = e.event_type
      ORDER BY r.event_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x63_intersect_all" -> (x63IntersectAll _),
    "x64_null_logic"    -> (x64NullLogic _),
    "x58_funnel"      -> (x58Funnel _),
    "x59_retention"   -> (x59Retention _),
    "x1_equi_join"    -> (x1EquiJoin _),
    "x2_join_agg"     -> (x2JoinAgg _),
    "x3_window_rank"  -> (x3WindowRank _),
    "x4_topk"         -> (x4TopK _),
    "x5_set_op"       -> (x5SetOp _),
    "x26_except_all"  -> (x26ExceptAll _),
    "x6_scalar_funcs" -> (x6ScalarFuncs _),
    "x7_event_window" -> (x7EventWindow _),
    "x34_sliding_window" -> (x34SlidingWindow _),
    "x35_full_outer_join" -> (x35FullOuterJoin _),
  )

  val oracleSql: Map[String, String] = Map(
    // same multiset semantics; DuckDB also spells INTERSECT ALL
    "x63_intersect_all" ->
      """SELECT o_custkey, COUNT(*) AS n FROM (
        SELECT o_custkey FROM orders
        INTERSECT ALL
        SELECT c_custkey FROM customer WHERE c_acctbal > 0)
      GROUP BY o_custkey ORDER BY o_custkey""",
    // identical text bar null-safe equality's dialect spelling
    "x64_null_logic" -> nullLogicSql("(v IS NOT DISTINCT FROM w)"),
    // byte-identical shared SQL text — see funnelSql
    "x58_funnel" -> funnelSql,
    // same text with DuckDB's native date subtraction (DATE − DATE =
    // BIGINT days, the unit datediff counts on the Spark side)
    "x59_retention" -> retentionSql("(a.d - f.cohort)"),
    "x1_equi_join" ->
      ("SELECT c_name, o_orderkey, o_totalprice FROM customer " +
        "JOIN orders ON c_custkey = o_custkey ORDER BY o_orderkey"),
    "x2_join_agg" ->
      ("SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON o_orderkey = l_orderkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name"),
    "x3_window_rank" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM " +
        "(SELECT o_custkey, o_orderkey, o_totalprice, " +
        "RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk " +
        "FROM orders) t WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey"),
    "x4_topk" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS revenue " +
        "FROM lineitem ORDER BY revenue DESC, l_orderkey, l_linenumber LIMIT 10"),
    "x5_set_op" ->
      ("SELECT o_custkey FROM orders EXCEPT " +
        "SELECT c_custkey FROM customer WHERE c_acctbal < 0 ORDER BY o_custkey"),
    "x26_except_all" ->
      ("SELECT o_custkey, COUNT(*) AS n FROM " +
        "(SELECT o_custkey FROM orders EXCEPT ALL " +
        "SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '%URGENT%') t " +
        "GROUP BY o_custkey ORDER BY o_custkey"),
    "x6_scalar_funcs" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        "substring(o_orderpriority, 1, 1) AS prio_class, " +
        "round(o_totalprice, 0) AS price_r FROM orders ORDER BY o_orderkey"),
    "x7_event_window" ->
      ("SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS cnt " +
        "FROM events GROUP BY 1, 2 ORDER BY ws, event_type"),
    // sliding membership reconstructed: each event belongs to the 4
    // quarter-hour-grid windows starting in (ts - 1h, ts] — starts
    // floor15(ts) - k*15min for k in 0..3 (time_bucket's origin is
    // midnight-aligned, same 15-min grid as Spark's epoch alignment)
    "x34_sliding_window" ->
      """SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE AS ws,
             event_type, COUNT(*) AS cnt
      FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
      GROUP BY ws, event_type ORDER BY ws, event_type""",
    "x35_full_outer_join" ->
      """SELECT o_orderkey, o_totalprice, c_custkey, c_name
      FROM orders FULL JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey NULLS LAST, c_custkey NULLS LAST""",
  )
}
