package graft

import org.apache.spark.sql.SparkSession

/** Driver main for [[ChaosRecoverySpec]], launched in its OWN JVM so
  * the kill-an-executor run cannot touch the suite-shared local[4]
  * SparkContext. Runs a RainStorm streaming job (`exec:` UDx op1 →
  * `count:1` running aggregate) on a real multi-process cluster
  * (`local-cluster[2,1,1024]` — standalone master + 2 worker-launched
  * executor JVMs); the UDx is the chaos agent that SIGKILLs its own
  * executor on first invocation. */
object ChaosRunner {
  def main(args: Array[String]): Unit = {
    val Array(master, execCp, script, srcDir, dest, ckpt) = args
    val spark = SparkSession.builder()
      .master(master)
      .appName("chaos_recovery")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.executor.extraClassPath", execCp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.streaming.RainStormJob.runStreaming(
      spark, s"exec:$script", "count:1", srcDir, dest, ckpt)
    q.awaitTermination()
    spark.stop()
  }
}

/** Driver main for the p2 chaos scenario: runs the REAL
  * [[graft.streaming.StreamingQueries.p2Transform]] curation pipeline
  * over a document feed on `local-cluster[2,1,1024]`, writing the
  * manifest through the transactional parquet file sink. A chaos UDF on
  * the source side HALTS its executor JVM (hard death — no shutdown
  * hooks, mid-batch) the first time any task evaluates it; the global
  * marker dir makes it fire exactly once across executor relaunches. */
object ChaosP2Runner {
  def main(args: Array[String]): Unit = {
    val Array(master, execCp, marker, feed, out, ckpt) = args
    val spark = SparkSession.builder()
      .master(master)
      .appName("chaos_p2")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.executor.extraClassPath", execCp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{col, udf}
    val kill = udf { (_: Long) =>
      if (new java.io.File(marker).mkdir()) Runtime.getRuntime.halt(137)
      true
    }
    val schema = spark.read.parquet(feed).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(feed)
      .filter(kill(col("doc_id")))
    val q = graft.streaming.StreamingQueries.p2Transform(stream)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.stop()
  }
}
