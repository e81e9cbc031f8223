package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** At 100 TB the tables are date/key-partitioned directories and most
  * queries touch a sliver; this pins that a partition predicate prunes
  * at PLANNING time — the scan lists and reads only matching
  * partitions, it does not read-then-filter. (The SF test files are
  * single parquet files, so the inventory queries can't exercise this;
  * here a partitioned copy of events is written and probed.) */
class PartitionPruningSpec extends AnyFunSuite with SparkSuite {

  private lazy val base: String = {
    val b = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events_by_day"
    graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(b)
    b
  }

  private lazy val days: Array[java.sql.Date] =
    spark.read.parquet(base).select("day").distinct()
      .orderBy("day").collect().map(_.getDate(0))

  test("a day-partitioned scan prunes to the one matching partition") {
    assert(days.length > 5, s"need a multi-partition layout to prove pruning, got ${days.length}")

    // derive the probe day from the data just written — a hardcoded
    // literal would couple the test to the fixture's ts epoch
    val pruned = spark.read.parquet(base)
      .filter(col("day") === lit(days(days.length / 2)))
      .select(col("event_id"))
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // the predicate must be a PARTITION filter (planning-time pruning),
    // not a data filter evaluated per row after reading everything
    assert(scan.metadata("PartitionFilters").contains("day"),
      scan.metadata.toString)
    // execute THIS queryExecution (a write would re-plan separately and
    // the captured scan's metrics would stay zero)
    pruned.collect()
    val filesRead = scan.metrics("numFiles").value
    val partsRead = scan.metrics("numPartitions").value
    assert(partsRead == 1, s"expected 1 partition read, got $partsRead ($filesRead files)")
  }

  test("the real r2/r6/x7/x19 definitions prune a day-sliced partitioned scan") {
    // The production pattern at 100 TB: the SAME operator shapes the
    // inventory declares, run over a day slice of a date-partitioned
    // dataset — the pruned scan is the difference between reading a day
    // and reading a decade. AQE is disabled for the probe only so the
    // executed plan exposes its FileSourceScanExec nodes directly
    // (pruning itself happens at planning time, with or without AQE).
    val d = days(days.length / 2)
    def slice = spark.read.parquet(base).filter(col("day") === lit(d))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val shapes: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "r2"  -> graft.queries.ReferenceQueries.r2Shape(slice),
        "r6"  -> graft.queries.ReferenceQueries.r6Shape(slice),
        "x7"  -> graft.queries.ExtensionQueries.x7Shape(slice),
        "x19" -> graft.queries.ExtendedRelationalQueries.x19Shape(slice))
      shapes.foreach { case (name, df) =>
        val scans = df.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        assert(scans.nonEmpty, s"$name: no file scans in the executed plan")
        scans.foreach(s => assert(s.metadata("PartitionFilters").contains("day"),
          s"$name scan lacks a day partition filter: ${s.metadata("PartitionFilters")}"))
        df.collect()
        scans.foreach { s =>
          val parts = s.metrics("numPartitions").value
          assert(parts == 1, s"$name: expected 1 partition read, got $parts")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
