package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ReferenceOps

/** The reference's HyDFS file semantics (SURVEY §2.2, §3.2–3.3) restated
  * over Spark-native storage: '''write-optimized buffered appends +
  * read-triggered ordered compaction''' (reference README.md:8;
  * localstorage/localstorage.go:85-99, synchronizer/synchronizer.go:75-139).
  *
  * Mapping:
  *  - `create`  → errorifexists write of a `base/` dataset
  *    (user/user.go:28-72: create fails if the file exists);
  *  - `append`  → append-mode write into a `log/` dataset, each row
  *    stamped with a writer-supplied timestamp — the reference's one
  *    client-side timestamp per multi-replica append (user/user.go:161-170);
  *  - `read`    → merge-on-read: base ∪ log, dedup by ts (arg-min
  *    tie-break; the reference is last-writer-wins by map overwrite),
  *    ascending ts order — O11 exactly (user/user.go:106: Get always
  *    merges first);
  *  - `compact` → materialize the merged view back into `base/` and
  *    truncate the log — the reference's physical merge, made explicit
  *    instead of a side effect of reads.
  *
  * Replication, ring placement and anti-entropy (O12, O14) are the
  * storage layer's job here (HDFS/object store), per SURVEY §7's design
  * stance — this class owns only the VISIBLE semantics: append buffering
  * and ordered convergent merge.
  *
  * Scale: appends are blind writes (no read-modify-write, no lock);
  * merge is one `dropDuplicates`-shaped shuffle over the log partition
  * being read. A 100 TB table with a small hot log pays the merge only
  * on the log, never rewriting base until `compact`.
  */
class AppendLogStore(spark: SparkSession, root: String, tsCol: String = "ts") {

  private def basePath = s"$root/base"
  private def logPath = s"$root/log"

  /** `create local hydfs` — fails if the table already exists. */
  def create(df: DataFrame): Unit =
    df.write.mode(SaveMode.ErrorIfExists).parquet(basePath)

  /** `append local hydfs` — buffered blind write; rows must carry the
    * writer timestamp column. */
  def append(df: DataFrame): Unit = {
    require(df.columns.contains(tsCol), s"append rows need a '$tsCol' column")
    df.write.mode(SaveMode.Append).parquet(logPath)
  }

  private def logExists: Boolean =
    new org.apache.hadoop.fs.Path(logPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(logPath))

  /** `get` — merge-on-read (O11): base ∪ log, unique by ts (arg-min
    * over `tieBreak` columns), ascending. Deterministic and
    * permutation-invariant, so every "replica" (reader) converges to
    * the same bytes — the property reference test5 checks by diffing
    * replica fetches. */
  def read(tieBreak: Seq[String]): DataFrame = {
    val base = spark.read.parquet(basePath)
    val all = if (logExists) base.unionByName(spark.read.parquet(logPath)) else base
    ReferenceOps.tsOrderedMerge(tsCol, tieBreak.map(col))(all)
  }

  /** `merge hydfs` — compaction: fold the log into base, truncate log. */
  def compact(tieBreak: Seq[String]): Unit = {
    val merged = read(tieBreak)
    val tmp = s"$root/compact_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(basePath), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(basePath))
    fs.delete(new org.apache.hadoop.fs.Path(logPath), true)
  }
}
