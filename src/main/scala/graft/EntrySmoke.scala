package graft

import org.apache.spark.sql.SparkSession

/** Verify-recipe step 4: `SparkEntry.entry` must work on a VANILLA
  * session (the driver owns that session — no engine configs assumed).
  * The ONLY copy of this object (ADVICE r13: a test-sources duplicate
  * shadowed this one classpath-order-dependently; deleted) — exits
  * non-zero on failure so shell recipes can gate on it. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("entry-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n ${if (n > 0) "PASS" else "FAIL"}")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
