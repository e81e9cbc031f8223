package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

/** Event-time semantics the reference never had (SURVEY §2.3):
  * watermarked windowed aggregation with late-data drop (X7's streaming
  * form) and arbitrary stateful sessionization (flatMapGroupsWithState).
  * Driven through MemoryStream so micro-batch boundaries and late
  * arrivals are exact. */
class StreamingSemanticsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // offset from epoch: a ts equal to the initial watermark (0) is
  // treated as late and dropped by stateful operators
  private def ts(minutes: Long): Timestamp = new Timestamp((1440 + minutes) * 60000L)

  test("watermarked tumbling window drops data later than the watermark (X7 streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("x7s").start()
    try {
      in.addData((ts(10), "click"), (ts(20), "click"))
      q.processAllAvailable()
      // advance event time far past hour 0 + watermark -> hour-0 window closes
      in.addData((ts(200), "view"))
      q.processAllAvailable()
      // this arrival is BEFORE the watermark (200 - 10 min): must be dropped
      in.addData((ts(30), "click"))
      q.processAllAvailable()
      val closed = spark.table("x7s")
        .select(col("ws"), col("event_type"), col("cnt"))
        .as[(Timestamp, String, Long)].collect().toSet
      // hour-0 click window emitted with cnt=2 (the late third click never counted)
      assert(closed.contains((ts(0), "click", 2L)))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops cross-batch re-deliveries (O9 streaming form)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val deduped = in.toDF().toDF("batch_id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("batch_id")
    val q = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("o9dedup").start()
    try {
      in.addData((1L, ts(0)), (2L, ts(5)))
      q.processAllAvailable()
      // re-delivery of batch 1 in a LATER micro-batch (the reference's
      // at-least-once upstream) must be dropped by state
      in.addData((1L, ts(6)), (3L, ts(10)))
      q.processAllAvailable()
      val got = spark.table("o9dedup").select("batch_id")
        .as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("x66 rolling distinct emits incrementally in update mode; KMV state merges across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val q = graft.streaming.StreamingQueries
      .x66Transform(in.toDF().toDF("ts", "user_id"))
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("x66sem").start()
    try {
      // batch 1 touches only hour-0: exactly ONE update row
      in.addData((ts(1), 10L), (ts(2), 11L), (ts(3), 10L))
      q.processAllAvailable()
      val after1 = spark.table("x66sem")
        .as[(Timestamp, Long, Long)].collect().toSeq
      assert(after1 == Seq((ts(0), 2L, 3L)),
        s"hour-0 should emit distinct=2 of n=3: $after1")
      // batch 2 touches hour-0 (new user, via RESTORED KMV state) and
      // hour-1 (new window): exactly TWO more update rows — update
      // mode must NOT re-emit untouched windows (that would be the
      // complete-mode dashboard anti-pattern at 100 TB window counts)
      in.addData((ts(4), 12L), (ts(70), 10L))
      q.processAllAvailable()
      val after2 = spark.table("x66sem")
        .as[(Timestamp, Long, Long)].collect().toSeq
      assert(after2.size == 3, s"expected 1 + 2 update rows, got $after2")
      val latest = after2.groupBy(_._1).map { case (w, rows) => w -> rows.maxBy(_._3) }
      assert(latest(ts(0)) == ((ts(0), 3L, 4L)),
        s"hour-0 must re-emit with state-merged distinct=3 of n=4: $after2")
      assert(latest(ts(60)) == ((ts(60), 1L, 1L)), s"hour-1 wrong: $after2")
    } finally q.stop()
  }

  test("gap sessionization: sessions close on gap, state survives micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sessions = Sessionize.sessions(spark, in.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess").start()
    try {
      // user 1: events at t=0,10 (one session); user 2: t=5
      in.addData(Event(1, ts(0), "a"), Event(1, ts(10), "b"), Event(2, ts(5), "a"))
      q.processAllAvailable()
      // user 1 speaks again within the gap at t=25 (same session);
      // then much later at t=120 -> closes session 1 on arrival
      in.addData(Event(1, ts(25), "c"), Event(1, ts(120), "d"))
      q.processAllAvailable()
      // push watermark far ahead so remaining sessions time out
      in.addData(Event(99, ts(600), "z"))
      q.processAllAvailable()
      in.addData(Event(98, ts(1200), "z"))
      q.processAllAvailable()
      val got = spark.table("sess").as[Session].collect()
        .map(s => (s.user_id, s.start.getTime / 60000 - 1440, s.end.getTime / 60000 - 1440, s.n_events))
        .toSet
      assert(got.contains((1L, 0L, 25L, 3L)))   // session closed by the t=120 arrival
      assert(got.contains((2L, 5L, 5L, 1L)))    // closed by event-time timeout
      assert(got.contains((1L, 120L, 120L, 1L))) // closed by timeout after watermark advance
    } finally q.stop()
  }

  test("stream-stream join across batches equals the batch join (x31)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.streaming.StreamingQueries.x31StreamStreamJoin(spark, dir)
      .collect().map(_.toString)
    val ev = graft.core.Tables.load(spark, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    val want = p.join(v, col("user_id") === col("v_uid") &&
        expr("v_ts BETWEEN p_ts - INTERVAL 1 DAY AND p_ts"))
      .select("user_id", "purchase_id", "view_id")
      .orderBy("purchase_id", "view_id")
      .collect().map(_.toString)
    assert(want.nonEmpty && got.sameElements(want))
  }

  test("stream-static enrichment join is stateless and equals the batch star join (x36)") {
    val dir = "/root/testdata/sf0.001"
    val feed = graft.streaming.StreamingQueries.feedFor(spark, dir)
    val schema = spark.read.parquet(feed).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(feed)
    val customer = graft.core.Tables.load(spark, dir, "customer")
    val nation = graft.core.Tables.load(spark, dir, "nation")
    val tmp = java.nio.file.Files.createTempDirectory("graft_x36_spec").toString
    val q = graft.streaming.StreamingQueries.x36Transform(stream, customer, nation)
      .writeStream.outputMode("append").format("memory").queryName("x36_spec")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the semantics under test: the enrichment runs with NO stateful
    // operator — no state store, no watermark, no commit cost
    assert(q.lastProgress.stateOperators.isEmpty,
      q.lastProgress.stateOperators.mkString(", "))
    // the transform is stream-agnostic, so applied to the batch events
    // table it IS the oracle; the dims must broadcast in that plan
    val batch = graft.streaming.StreamingQueries.x36Transform(
      graft.core.Tables.load(spark, dir, "events"), customer, nation)
    val bp = batch.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllMatchIn(bp).size >= 2, bp.take(3000))
    val got = spark.table("x36_spec").orderBy("event_id").collect().map(_.toString)
    val want = batch.orderBy("event_id").collect().map(_.toString)
    assert(want.nonEmpty && got.sameElements(want))
  }

  test("stream-stream LEFT OUTER join emits unmatched rows null-padded (x32)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.streaming.StreamingQueries.x32StreamOuterJoin(spark, dir)
      .collect()
    val ev = graft.core.Tables.load(spark, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    val want = p.join(v, col("user_id") === col("v_uid") &&
        expr("v_ts BETWEEN p_ts - INTERVAL 1 DAY AND p_ts"), "left_outer")
      .select("user_id", "purchase_id", "view_id")
      .orderBy(col("purchase_id"), col("view_id").asc_nulls_last)
      .collect()
    // the semantics under test: watermark-driven null-padded emission
    // actually happened (not just the inner-path matches)
    assert(got.exists(_.isNullAt(2)), "no unmatched purchase was emitted")
    assert(want.nonEmpty &&
      got.map(_.toString).sameElements(want.map(_.toString)))
  }
}
