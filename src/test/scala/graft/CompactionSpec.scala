package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

/** Small-file compaction: plan invariants (pure bin-packing), the
  * shuffle-free rewrite plan, and end-to-end row preservation over a
  * deliberately fragmented copy of the documents table. */
class CompactionSpec extends AnyFunSuite with SparkSuite {

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("plan: first-fit invariants — every bin but the last reaches target, no file split, order kept") {
    val listing = (0 until 20).map(i => (f"part-$i%05d" -> 100L))
    val bins = Compaction.plan(listing, targetBytes = 250L)
    // each sealed bin has >= target; only the tail bin may fall short
    assert(bins.init.forall(_.bytes >= 250L))
    // partition: every file appears exactly once, in listing order
    assert(bins.flatMap(_.files) == listing.map(_._1))
    // an already-large file seals alone
    val withBig = Compaction.plan(Seq("a" -> 50L, "big" -> 999L, "z" -> 50L), 250L)
    assert(withBig.exists(b => b.singleton && b.files == Seq("big")))
  }

  test("bin rewrite plan is shuffle-free (coalesce = narrow dependency, no Exchange)") {
    val in = tmpDir("compact_in")
    graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .repartition(8).write.mode("overwrite").parquet(in)
    val bins = Compaction.plan(Compaction.listParquet(in), targetBytes = Long.MaxValue)
    assert(bins.sizeIs == 1 && bins.head.files.sizeIs == 8)
    val p = Compaction.binFrame(spark, bins.head).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("Coalesce"), p.take(2000))
  }

  test("compact: many small files -> few target-sized ones, rows and content preserved") {
    val in = tmpDir("compact_in2")
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    docs.repartition(16).write.mode("overwrite").parquet(in)
    val smallFiles = Compaction.listParquet(in)
    assert(smallFiles.sizeIs == 16)
    val target = smallFiles.map(_._2).sum / 4 // aim for ~4 output bins

    val out = tmpDir("compact_out") + "/result"
    val bins = Compaction.compact(spark, in, out, target)
    assert(bins.size < smallFiles.size, s"no compaction: ${bins.size}")

    // FLAT uniform layout: exactly one top-level bin-NNNNN.parquet
    // FILE per bin — no nested part-file directories, no markers — so
    // the result reads back as a plain parquet directory with no
    // recursiveFileLookup or per-shape special casing
    val entries = Option(new File(out).listFiles()).getOrElse(Array.empty).toSeq
    assert(entries.forall(_.isFile), s"nested dirs in compacted output: ${
      entries.filter(_.isDirectory).map(_.getName).mkString(",")}")
    val outFiles = entries.filter(f =>
      f.getName.matches("bin-\\d{5}\\.parquet"))
    assert(outFiles.size == entries.size,
      s"non-bin files in output: ${entries.map(_.getName).mkString(",")}")
    assert(outFiles.size == bins.size, outFiles.map(_.getName).mkString(","))

    // content identical (full multiset of doc ids + text hashes)
    import org.apache.spark.sql.functions._
    def digest(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(col("doc_id")).orderBy("doc_id")
        .collect().map(_.getLong(0)).toSeq
    // the whole point: a plain directory read just works
    val readBack = spark.read.parquet(out)
    assert(digest(readBack) == digest(docs))
  }
}
