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

  test("a day-partitioned scan prunes to the one matching partition") {
    val base = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events_by_day"
    graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(base)
    val days = spark.read.parquet(base).select("day").distinct()
      .orderBy("day").collect().map(_.getDate(0))
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
}
