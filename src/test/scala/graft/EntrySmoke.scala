package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: `SparkEntry.entry` must produce rows on a
  * VANILLA default session (the driver owns that session — no engine
  * configs may be assumed). Run: Test/runMain graft.EntrySmoke */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("entry_smoke")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n ${if (n > 0) "PASS" else "FAIL"}")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
