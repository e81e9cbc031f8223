package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two CSV readings the engine must offer (SURVEY §1.1 "Record
  * (structured)"):
  *
  *  - '''parity mode''' — the reference operator binaries' naive comma
  *    split: no quoting, no escaping (`"x,y",b,c,d,e` splits into 6
  *    fields — FIXTURES probe 3.9). This is what every reference query
  *    actually computed on.
  *  - '''proper mode''' — RFC-4180-ish CSV via Spark's reader (quotes
  *    honored, configurable), what a user migrating off the reference
  *    almost certainly wants next.
  *
  * They differ exactly on quoted fields; CsvModesSpec pins the
  * difference with the probe fixture.
  */
object CsvModes {

  /** Parity: read as text lines, naive-split into an array column
    * `fields` (plus the raw `value` line). */
  def readNaive(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .withColumn("fields", split(col("value"), ",", -1))

  /** Proper CSV: quotes honored, no header by default (the reference's
    * Traffic_Signs files had none). */
  def readProper(spark: SparkSession, path: String, header: Boolean = false): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
}
