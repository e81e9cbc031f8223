package graft

import org.apache.spark.sql.SparkSession

/** Verify-recipe step 4: `SparkEntry.entry` must work on a VANILLA
  * session (the driver owns that session — no engine configs assumed). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("entry-smoke").getOrCreate()
    val n = SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    require(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
