package graft

import org.apache.spark.sql.SparkSession

/** Does the persist+temp-view pattern in x65/x70 actually substitute
  * InMemoryRelation in the consuming query, or silently re-derive?
  * Prints the leaf histogram of each query's planned physical tree.
  * Run: Test/runMain graft.CacheHitProbe /root/testdata/sf0.01
  */
object CacheHitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("x65_pagerank", "x70_triangle_count")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val mem = "InMemoryTableScan".r.findAllIn(plan).length
      val fs = "FileScan parquet".r.findAllIn(plan).length
      println(s"[cacheprobe] $name: InMemoryTableScan=$mem FileScan=$fs")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
