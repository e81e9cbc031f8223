package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables

/** Streaming members of the declared inventory (SURVEY §2.4).
  *
  * R9 is a real Structured Streaming run that happens to be driveable
  * from the batch Verify harness: the events table is fed in ts-ordered
  * chunks through a file-source stream, aggregated in complete mode, and
  * the final state is returned as a DataFrame. Its oracle is the plain
  * batch GROUP BY — the reference's own convergence property (test_MP4
  * analogue: running aggregate's final snapshot == batch answer).
  */
object StreamingQueries {

  /** R9 — running aggregate (O8, rainstorm.go:551-566): feed events in
    * ts-ordered chunks (repartitionByRange preserves global ts order
    * across files), `groupBy(event_type).count()` in complete mode;
    * return the final snapshot. */
  def r9StreamingAgg(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val tmp = Files.createTempDirectory("graft_r9").toString
    events.repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(s"$tmp/feed")
    val schema = spark.read.parquet(s"$tmp/feed").schema
    // 4 ts-range files fed 2 per trigger -> 2 genuine micro-batches:
    // the minimum that still exercises cross-batch state merge (the
    // semantics under test); per-trigger fixed cost (~1 s
    // planning+commit each) is the whole runtime of this query, so
    // batch count is the knob that matters.
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(s"$tmp/feed")
    val qname = "r9_state_" + UUID.randomUUID().toString.replace("-", "")
    val q = stream.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qname)
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(qname).orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r9_streaming_agg" -> (r9StreamingAgg _),
  )

  val oracleSql: Map[String, String] = Map(
    "r9_streaming_agg" ->
      "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
  )
}
