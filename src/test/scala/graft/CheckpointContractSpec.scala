package graft

import org.apache.spark.sql.GraftShims
import org.scalatest.funsuite.AnyFunSuite

/** The releasable-checkpoint contract at unit level (round 14) —
  * [[GraftShims.checkpointReleasable]]'s two documented behaviors when
  * the CALLER releases the handle (executor-LOSS coverage lives in
  * ChaosRecoverySpec's SIGKILL scenarios; this pins the release half):
  *
  *  - DEFAULT (local) mode: lineage is truncated by design, so a read
  *    after release must fail LOUDLY — a silent recompute is
  *    impossible and a silent short/empty result would be corruption.
  *    This is exactly Materialize.swap's superseded-invocation
  *    semantics (ADVICE r13: a still-unconsumed DataFrame from a
  *    prior invocation of the same query fails on read, audibly).
  *  - RELIABLE mode (`spark.graft.checkpoint.reliable=true` + a
  *    checkpoint dir): the release only drops the cached copy; reads
  *    fall back to the checkpoint files with identical rows — the
  *    100 TB posture the helper documents, where executor churn is
  *    expected and the unpersist contract must stay cheap.
  */
class CheckpointContractSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("default mode: a released checkpoint fails loudly on read, never silently") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val (out, rdd) = GraftShims.checkpointReleasable(docs)
    val n = out.count()
    assert(n > 0)
    rdd.unpersist(blocking = true)
    val e = intercept[Exception] { out.count() }
    // the error chain must NAME the missing checkpoint block — the
    // failure is diagnosable, not a generic task death
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.toLowerCase.contains("checkpoint") && msgs.contains("not found"), msgs.take(500))
  }

  test("reliable mode: release drops only the cached copy; reads fall back to checkpoint files, rows identical") {
    val dir = java.nio.file.Files.createTempDirectory("ckpt_contract").toString
    spark.sparkContext.setCheckpointDir(dir)
    withConfs("spark.graft.checkpoint.reliable" -> "true") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "n_chars").orderBy("doc_id")
      val before = docs.collect().toSeq
      val (out, rdd) = GraftShims.checkpointReleasable(docs)
      rdd.unpersist(blocking = true)
      assert(out.count() == before.size)
      assert(out.orderBy("doc_id").collect().toSeq == before)
      // and the leaf still carries the origin stats (the round-14
      // fromDataset fix is mode-independent)
      val leaves = GraftShims.checkpointLeafSizes(out)
      assert(leaves.size == 1 && leaves.head < (BigInt(1L) << 40), leaves.toString)
    }
  }
}
