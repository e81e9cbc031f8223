package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned, pre-sorted) tables — the co-located-join
  * scale tool: two tables bucketed by the same key into the same bucket
  * count join WITHOUT a shuffle on either side (SortMergeJoin reads
  * bucket i against bucket i directly). At 100 TB this is the difference
  * between re-shuffling the fact table on every join and paying the
  * partitioning once at write time — the Spark-native analogue of the
  * reference's consistent-hash placement (O12): route rows to their
  * bucket by key hash at WRITE time so reads are local.
  *
  * Bucketing requires the session catalog (`saveAsTable`); files written
  * with plain `save()` lose the bucket metadata.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. The returned
    * plan contains NO Exchange on either side (asserted in
    * BucketingSpec) — only the bucket-aware scans + SortMergeJoin. */
  def cojoin(spark: SparkSession, left: String, right: String,
             key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
