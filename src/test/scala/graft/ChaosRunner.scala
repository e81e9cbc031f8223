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
