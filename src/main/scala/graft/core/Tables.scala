package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Table registry for the driver test data (TESTDATA.md / FIXTURES.md §1).
  *
  * One parquet file per table under `$sfDir/`. Schemas are read from the
  * parquet footers — the engine is schema-first (SURVEY §1.2) but the
  * footers are authoritative, so no redundant StructType declarations
  * that could drift from the data.
  *
  * Scale posture: at 100 TB each of these would be a partitioned parquet
  * dataset (directory), not a single file; `spark.read.parquet(dir)` is
  * already the right call for both. Filters/projections compose onto the
  * scan (predicate pushdown + column pruning are Catalyst's job).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is physically TIMESTAMP(NANOS) in the parquet footer,
    * which Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL) unless the
    * legacy nanosAsLong conf is on; with it on, the column surfaces as
    * LongType nanos. We normalize to TimestampType at µs precision —
    * the same truncation DuckDB applies reading the file — using integer
    * `div` (long→double division would lose precision above 2^53 ns).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None    => df
    }
  }

  /** Spread `df` to the session's parallelism when it has fewer
    * partitions: compute-dense per-row kernels (shingling, minhash,
    * codec work, pair scans) otherwise run on ONE task over the
    * single-split local test files. At real scale the scan already has
    * more splits than cores and this is a no-op; the shuffle it adds
    * locally moves the raw rows once — trivial next to the kernel work
    * it parallelizes. The ONE shared definition of the heuristic —
    * tune it here, not at call sites. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  /** [[load]] + [[spread]]. */
  def loadSpread(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spread(spark, load(spark, sfDir, name))

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

/** Session factory with the settings every entry point shares.
  * local[N] for tests; on a real cluster the master/memory flags come
  * from spark-submit and everything else here still applies.
  */
object GraftSession {
  def local(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
