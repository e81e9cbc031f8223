package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the sanctioned pattern for extension libraries that define native
  * Catalyst expressions (Spark 4 removed the public
  * `new Column(Expression)` constructor in favor of ColumnNodes).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column to a raw Catalyst Expression (the lazy
    * `expression` wrapper is Unevaluable and only unwraps inside
    * standard Dataset operations — a custom LogicalPlan needs the real
    * tree so the analyzer can resolve its UnresolvedAttributes). */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Build a DataFrame from a custom LogicalPlan (runs the full
    * analyzer, so unresolved attributes in the plan resolve against
    * child output) — needed to hand a custom logical operator to
    * Catalyst. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** `Dataset.localCheckpoint(eager = true)` with a releasable handle:
    * same semantics — the plan is materialized to executor storage and
    * both the logical-plan and RDD lineage are truncated — but the
    * backing RDD is returned so iterative algorithms (connected
    * components, label propagation) can `unpersist()` each SUPERSEDED
    * round's blocks as soon as the next round materializes.
    * `Dataset.localCheckpoint` offers no public way to do that, so a
    * 20-round loop would pin 20 rounds of blocks until session end.
    *
    * RELIABILITY trade-off: a local checkpoint stores its blocks in
    * executor storage with lineage truncated — losing ANY executor
    * mid-loop makes those partitions unrecoverable and fails the job.
    * That is the right default for `local[n]` and for clusters where a
    * failed iteration is simply rerun (the loop is deterministic), but
    * an hours-long 100 TB run where executor churn is EXPECTED should
    * set `spark.graft.checkpoint.reliable=true` (plus
    * `sparkContext.setCheckpointDir` to a fault-tolerant FS): blocks
    * are then persisted MEMORY_AND_DISK for speed AND written through
    * `RDD.checkpoint` to the checkpoint dir, so a lost executor
    * recomputes from the reliable copy instead of failing. The caller's
    * `unpersist()` contract is unchanged — with reliable=true it only
    * drops the cached copy (reads fall back to the checkpoint files);
    * checkpoint files themselves are GC'd by the ContextCleaner when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, else at
    * checkpoint-dir cleanup.
    *
    * STATS: the returned frame's leaf is `LogicalRDD.fromDataset` —
    * the same constructor `Dataset.localCheckpoint` uses — which
    * carries the ORIGIN plan's `Statistics` (plus constraints and the
    * physical output partitioning/ordering) into the new leaf. Round
    * 13 built the leaf with `internalCreateDataFrame`, whose LogicalRDD
    * has no origin stats and so estimates `defaultSizeInBytes` (huge):
    * every join DOWNSTREAM of a checkpoint silently lost broadcast
    * candidacy at static planning, which is exactly how d13's
    * doc-frequency join fell off a cliff on the third decade
    * (ScalingCurveSpec red, 18.8× wall on 10× rows). The fix is
    * structural — stats survive for every caller — and is pinned by
    * PlansSpec ("checkpointReleasable carries origin stats" and the
    * Materialize.swap leaf-stats cases) plus CheckpointContractSpec's
    * two release-contract cases. */
  def checkpointReleasable(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    val reliable =
      spark.conf.getOption("spark.graft.checkpoint.reliable").exists(_.toBoolean)
    if (reliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        "spark.graft.checkpoint.reliable=true requires " +
          "sparkContext.setCheckpointDir(<fault-tolerant path>)")
      // persist BEFORE checkpoint: the checkpoint job re-reads the RDD
      // after the materializing count(), and without a cache that means
      // recomputing the whole lineage a second time
      rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.checkpoint()
    } else {
      rdd.localCheckpoint()
    }
    rdd.count()
    val leaf = execution.LogicalRDD.fromDataset(rdd, ds, isStreaming = false)
    (classic.Dataset.ofRows(ds.sparkSession, leaf), rdd)
  }

  /** Size estimate of every LogicalRDD (checkpoint) leaf in a frame's
    * optimized plan — PlansSpec instrumentation for the
    * stats-preservation pin above (a stats-less leaf reports
    * defaultSizeInBytes and silently flips downstream join selection). */
  def checkpointLeafSizes(df: DataFrame): Seq[BigInt] =
    df.queryExecution.optimizedPlan.collect {
      case l: execution.LogicalRDD => l.stats.sizeInBytes
    }

  /** Clone the session's STATE — SQL conf, temp views, registered
    * functions — into a sibling session on the same SparkContext
    * (`SparkSession.cloneSession`, `private[sql]`, hence this shim;
    * the public `newSession()` would NOT do: it builds a FRESH
    * SessionState, dropping every runtime `spark.conf.set` and temp
    * view the caller's plans depend on). The use case is build-scoped
    * execution confs (ArtifactStore round 17): a mining job that
    * needs its own AQE/width settings constructs and executes its
    * plan on the clone, and the serving session never observes the
    * overrides — not even for the build's duration, closing the
    * session-visibility window VERDICT r16 flagged on the
    * save/set/restore approach. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Drain the listener bus (`private[spark]`, hence this shim):
    * stage/job events are delivered asynchronously, so a spec that
    * asserts on a SparkListener's observations right after an action
    * returns would race the delivery thread — D13BuildWidthSpec pins
    * stage widths this way. */
  def waitListenerBus(spark: SparkSession, timeoutMs: Long = 30000): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
}
