package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType, StructField, StructType}

/** The reference's UDx surface: "any executable taking one newline-joined
  * batch of lines as argv[1] and printing results to stdout"
  * (rainstorm/rainstorm.go:396-407 for stage 2, :493-505 for stage 3).
  * This is the migration path for a reference user with their OWN op
  * binary — the four known binaries' semantics are also implemented
  * natively in [[ReferenceOps]], but an arbitrary binary needs exec.
  *
  * Spark shape: `mapPartitions` over the line Dataset, one process
  * invocation per `batchSize`-line group (the reference's BATCH_SIZE is
  * 5, rainstorm.go:24) — the batch travels as a single argv, exactly the
  * reference ABI, so fork/exec cost amortizes over the batch and the
  * operator distributes like any other narrow transformation (no
  * shuffle; binaries must be present on every executor, the analogue of
  * the reference pulling the op from HyDFS onto each worker,
  * rainstorm.go:364-394).
  *
  * 100 TB posture: argv-per-batch is the reference contract and is kept
  * faithfully; batchSize is the amortization knob, bounded by the OS
  * (Linux caps a single argv string at MAX_ARG_STRLEN = 128 KiB), so
  * batches additionally split at [[PipeOps.maxArgBytes]] — a batch-size
  * knob can never produce an E2BIG exec failure. For a throughput-first
  * custom op the right ABI is stdin/stdout streaming with one
  * long-lived process per partition (RDD `pipe()` style); that changes
  * the contract (binaries see a stream, not argv) so it is deliberately
  * NOT what `exec:` does.
  */
object PipeOps {

  /** Byte budget per exec argv, safely under Linux MAX_ARG_STRLEN
    * (131072 including the NUL and the binary's other argv/env slack). */
  val maxArgBytes: Int = 100000

  /** Group `it` into batches of at most `batchSize` lines AND at most
    * [[maxArgBytes]] joined UTF-8 bytes (a single oversized line still
    * travels alone — the exec will fail with the OS error, which is the
    * honest outcome for an un-splittable record). */
  private[graft] def byteBoundedBatches(it: Iterator[String], batchSize: Int): Iterator[Seq[String]] =
    new Iterator[Seq[String]] {
      private var pending: Option[String] = None
      def hasNext: Boolean = pending.isDefined || it.hasNext
      def next(): Seq[String] = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var bytes = 0
        def fits(s: String): Boolean = {
          val b = s.getBytes("UTF-8").length + (if (buf.isEmpty) 0 else 1)
          buf.isEmpty || (buf.size < batchSize && bytes + b <= maxArgBytes)
        }
        pending.foreach { s => buf += s; bytes += s.getBytes("UTF-8").length; pending = None }
        var done = false
        while (!done && it.hasNext && buf.size < batchSize) {
          val s = it.next()
          // the "\n" separator byte exists only between lines, so the
          // first line of a batch is charged its own length only —
          // matching fits()'s accounting
          if (fits(s)) { bytes += s.getBytes("UTF-8").length + (if (buf.isEmpty) 0 else 1); buf += s }
          else { pending = Some(s); done = true }
        }
        buf.toSeq
      }
    }

  /** Run `cmd` with `arg` as its single argument, return stdout.
    * Stderr is discarded (the reference captures only stdout via
    * cmd.Output()); a non-zero exit fails the task — Spark's retry then
    * owns it, like the reference's batch-retry scan. */
  private[graft] def runOnce(cmd: String, arg: String): String = {
    val pb = new ProcessBuilder(cmd, arg)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    val rc = p.waitFor()
    if (rc != 0)
      throw new IllegalStateException(s"exec operator '$cmd' exited with $rc")
    out
  }

  /** Go's bytes.Split(out, "\n") keeps a trailing "" when the output
    * ends with a newline; the reference pipeline carries that empty
    * element only as a join artifact (the next stage re-joins with \n),
    * so the line-set semantics are "split, drop the trailing empty". */
  private[graft] def splitDropTrailing(out: String): Seq[String] = {
    val parts = out.split("\n", -1).toSeq
    if (parts.nonEmpty && parts.last.isEmpty) parts.dropRight(1) else parts
  }

  /** One exec per batch, raw stdout per batch as a Dataset[String]. */
  private def execBatches(cmd: String, batchSize: Int)(df: DataFrame): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("value").cast("string")).as[String].mapPartitions { it =>
      byteBoundedBatches(it, batchSize).map(batch => runOnce(cmd, batch.mkString("\n")))
    }
  }

  /** `exec:<path>` — a stage-2-style line operator: lines in, stdout
    * lines out (op1_t1 / op1_t2 shape, rainstorm.go:396-407). */
  def execLines(cmd: String, batchSize: Int = 5): DataFrame => DataFrame = df => {
    val spark = df.sparkSession
    import spark.implicits._
    execBatches(cmd, batchSize)(df)
      .flatMap(splitDropTrailing)
      .toDF("value")
  }

  private val recordSchema = StructType(Seq(
    StructField("Type", StringType), StructField("Data", StringType)))

  /** `exec_transform:<path>` — a stage-3 transform binary emitting the
    * JSON Record envelope `{"Type":"Transform","Data":"<lines>"}`
    * (rainstorm.go:532-535); output is the Data lines (the leader's
    * trim-and-append, rainstorm.go:560-566). */
  def execTransform(cmd: String, batchSize: Int = 5): DataFrame => DataFrame = df => {
    execBatches(cmd, batchSize)(df).toDF("envelope")
      .select(from_json(col("envelope"), recordSchema).as("rec"))
      .filter(col("rec.Type") === "Transform")
      .select(explode(split(col("rec.Data"), "\n")).as("value"))
      .filter(length(col("value")) > 0)
  }

  /** `exec_agg:<path>` — a stage-3 aggregate binary emitting
    * `{"Type":"Aggregate","Data":"{\"key\":n,…}"}` partial maps
    * (op2_t2 shape, rainstorm.go:545-559); partials merge into running
    * totals exactly like the leader's `AggregateCounts[k] += v` fold —
    * here a groupBy-sum, so Catalyst plans partial+final aggregation
    * and the merge distributes instead of serializing on a leader. */
  def execAgg(cmd: String, batchSize: Int = 5): DataFrame => DataFrame = df => {
    execBatches(cmd, batchSize)(df).toDF("envelope")
      .select(from_json(col("envelope"), recordSchema).as("rec"))
      .filter(col("rec.Type") === "Aggregate")
      .select(explode(from_json(col("rec.Data"), MapType(StringType, LongType)))
        .as(Seq("key", "partial")))
      .groupBy("key").agg(sum("partial").as("cnt"))
  }
}
