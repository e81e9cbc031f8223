package graft

import java.nio.file.Files
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingQueries

/** Evidence for the RocksDB state-store choice (PLANS.md round-5 entry):
  * the claim "state no longer lives on the executor heap" turned from an
  * argument into metrics, plus the per-component breakdown of the
  * provider's demo-feed fixed cost that the round-5 driver bench could
  * not attribute (VERDICT r5 tasks 1 and 7).
  *
  * Instrument: the exact x31 stream-stream join shape (four state
  * stores per partition — the provider's worst fixed-cost case) driven
  * with the StreamingQuery handle kept, so `recentProgress` exposes
  * per-batch `durationMs` and the state operator's RocksDB
  * customMetrics. */
class RocksDbStateSpec extends AnyFunSuite with SparkSuite {

  private def runX31(parts: Int): Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] =
    withConfs(
      "spark.sql.shuffle.partitions" -> parts.toString,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true") {
      val feed = StreamingQueries.joinFeedFor(spark, "/root/testdata/sf0.01")
      val tmp = Files.createTempDirectory("graft_rocks_probe").toString
      val vSchema = spark.read.parquet(s"$feed/views").schema
      val views = spark.readStream.schema(vSchema)
        .option("maxFilesPerTrigger", "1").parquet(s"$feed/views")
      val purchases = spark.readStream.schema(vSchema)
        .option("maxFilesPerTrigger", "1").parquet(s"$feed/purchases")
      val qname = "rocks_probe_" + UUID.randomUUID().toString.replace("-", "")
      val q = StreamingQueries.x31Join(views, purchases)
        .writeStream.outputMode("append").format("memory").queryName(qname)
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val progs = q.recentProgress.toSeq
      spark.sql(s"DROP TABLE IF EXISTS $qname")
      progs
    }

  test("x31 under RocksDB: state is resident in the native store (off-heap), not the JVM heap") {
    val progs = runX31(parts = 4)
    val ops = progs.flatMap(_.stateOperators)
    assert(ops.nonEmpty, "no stateOperators reported — join state untracked")
    // the provider actually in use is RocksDB: its custom metrics are
    // present and the native memory gauge is non-zero — with the
    // default HDFS provider these keys do not exist at all, and
    // loadedMapCacheHitCount would be reported instead
    val custom = ops.flatMap(_.customMetrics.asScala).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2.longValue).sum }
    val rocksKeys = custom.keys.filter(_.toLowerCase.contains("rocksdb"))
    assert(rocksKeys.nonEmpty, s"no rocksdb custom metrics; got ${custom.keys.toSeq.sorted}")
    val nativeMem = custom.collect {
      case (k, v) if k.toLowerCase.contains("memoryusage") => v }.sum
    assert(nativeMem > 0L,
      s"rocksdb native memory gauge is zero — state not resident in the native store ($custom)")
    // and the operator's own accounting agrees state bytes are tracked
    // against the store, while the JVM-heap map-cache metric of the
    // HDFS provider is absent
    assert(!custom.keys.exists(_ == "loadedMapCacheHitCount"),
      "HDFS provider metrics present — RocksDB conf did not take effect")
    val stateBytes = ops.map(_.memoryUsedBytes).sum
    info(f"rocksdb native memory: ${nativeMem / 1024.0}%.0f KiB across ${ops.size} operator-batches; " +
      f"stateOperators.memoryUsedBytes total ${stateBytes / 1024.0}%.0f KiB")
    info(s"rocksdb metric keys: ${rocksKeys.toSeq.sorted.mkString(", ")}")
  }

  test("x31 under RocksDB: per-batch fixed-cost breakdown (attribution for the driver bench)") {
    val progs = runX31(parts = 4)
    assert(progs.nonEmpty)
    var totalAddBatch = 0L
    progs.foreach { p =>
      val d = p.durationMs.asScala.map { case (k, v) => k -> v.longValue }
      totalAddBatch += d.getOrElse("addBatch", 0L)
      info(s"batch ${p.batchId}: durationMs ${d.toSeq.sortBy(-_._2).mkString(", ")}")
      p.stateOperators.foreach { op =>
        val cm = op.customMetrics.asScala.map { case (k, v) => k -> v.longValue }
          .filter { case (k, v) => v > 0 && (k.toLowerCase.contains("latency") ||
            k.toLowerCase.contains("commit") || k.toLowerCase.contains("load")) }
        info(s"  state op: commitTimeMs=${op.allUpdatesTimeMs + op.commitTimeMs} " +
          s"(updates ${op.allUpdatesTimeMs}, commit ${op.commitTimeMs}, removals ${op.allRemovalsTimeMs}); " +
          s"rocksdb: ${cm.toSeq.sortBy(-_._2).take(8).mkString(", ")}")
      }
    }
    val wall = progs.map(_.durationMs.asScala.getOrElse("triggerExecution", java.lang.Long.valueOf(0L)).longValue).sum
    info(s"total triggerExecution ${wall} ms over ${progs.size} batches (addBatch $totalAddBatch ms)")
  }
}
