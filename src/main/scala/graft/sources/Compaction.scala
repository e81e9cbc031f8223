package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance job every long-lived
  * lakehouse table needs: streaming sinks, frequent small appends and
  * over-parallel writers leave thousands of KB-scale files per
  * partition, and at 100 TB the resulting scan pays per-file open
  * costs, floods the driver's file index, and defeats row-group
  * statistics (a 50 KB file has one tiny row group). Compaction
  * rewrites many small files into few target-sized ones — the
  * Delta/Iceberg `OPTIMIZE` / "bin-packing" capability, Spark-native.
  *
  * Design for scale:
  *   - The PLAN is pure metadata work: first-fit bin-packing of the
  *     file listing (name-sorted for determinism) into bins of at
  *     least `targetBytes` — no data is read to decide the layout, so
  *     planning a million-file table costs a listing, not a scan.
  *   - Each bin is rewritten INDEPENDENTLY by reading exactly its
  *     member files and coalescing to one output file. `coalesce(1)`
  *     over a bin is a NARROW dependency — rows never shuffle, never
  *     leave their bin, and bins can run in parallel or be
  *     rate-limited; a failed bin retries alone (CompactionSpec pins
  *     the no-Exchange plan).
  *   - The rewrite lands in a fresh directory and the swap is left to
  *     the caller's commit protocol (a real table format swaps the
  *     manifest; [[AppendLogStore]] shows the crash-safe
  *     tmp-then-rename pattern). Already-large files (≥ targetBytes on
  *     their own) form singleton bins and can be skipped by callers
  *     via [[CompactionBin.singleton]] — rewriting them buys nothing.
  */
object Compaction {

  /** One planned output file: the input files it merges and their
    * total size. */
  final case class CompactionBin(files: Seq[String], bytes: Long) {
    def singleton: Boolean = files.sizeIs == 1
  }

  /** First-fit bin-packing of `(path, bytes)` listings into bins of at
    * least `targetBytes`: walk the name-sorted listing accumulating
    * until the running total reaches the target, then seal the bin.
    * Deterministic (pure function of the listing), keeps
    * name-adjacent files together (preserving any coarse ordering the
    * writer left, e.g. time-ordered part numbers), and never splits a
    * file. Files already ≥ targetBytes seal immediately as singletons. */
  def plan(listing: Seq[(String, Long)], targetBytes: Long): Seq[CompactionBin] = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val sorted = listing.sortBy(_._1)
    val bins = Seq.newBuilder[CompactionBin]
    var cur = Vector.empty[String]
    var curBytes = 0L
    for ((path, bytes) <- sorted) {
      if (bytes >= targetBytes)
        // already target-sized: pass through untouched as a singleton,
        // without disturbing the small-file accumulator
        bins += CompactionBin(Vector(path), bytes)
      else {
        cur :+= path
        curBytes += bytes
        if (curBytes >= targetBytes) {
          bins += CompactionBin(cur, curBytes)
          cur = Vector.empty; curBytes = 0L
        }
      }
    }
    if (cur.nonEmpty) bins += CompactionBin(cur, curBytes)
    bins.result()
  }

  /** List the data files of a parquet directory (driver-side metadata
    * op — mirrors what a table format reads from its manifest). */
  def listParquet(dir: String): Seq[(String, Long)] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.length()).toSeq

  /** The shuffle-free rewrite frame for one bin: exactly the bin's
    * files, coalesced to one partition. Exposed so tests can pin the
    * plan (no Exchange) before writing. */
  def binFrame(spark: SparkSession, bin: CompactionBin): DataFrame =
    spark.read.parquet(bin.files: _*).coalesce(1)

  /** Compact `inDir` into `outDir`: plan over the listing, rewrite
    * each multi-file bin as one parquet file, and COPY singleton bins'
    * already-large files as-is (no decode/encode). Returns the plan.
    * `outDir` must not exist — the caller owns the swap.
    *
    * The output is a FLAT, uniform file set — `bin-NNNNN.parquet` for
    * every bin. Spark writes each multi-file bin as a directory
    * (part file + _SUCCESS marker); leaving that shape would make the
    * compacted table unreadable without `recursiveFileLookup` and
    * force every consumer to special-case two layouts, so the single
    * part file is hoisted up as the bin file and the scaffold deleted.
    * That post-write rename is driver-side metadata work, exactly what
    * a table format's commit step does. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): Seq[CompactionBin] = {
    val out = new File(outDir)
    require(!out.exists(), s"compaction output dir already exists: $outDir")
    out.mkdirs()
    val bins = plan(listParquet(inDir), targetBytes)
    bins.zipWithIndex.foreach { case (bin, i) =>
      val dst = new File(out, f"bin-$i%05d.parquet")
      if (bin.singleton)
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(bin.files.head), dst.toPath)
      else {
        val tmp = new File(out, f".bin-$i%05d.tmp")
        binFrame(spark, bin).write.parquet(tmp.getAbsolutePath)
        val parts = Option(tmp.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        require(parts.length == 1,
          s"coalesce(1) bin wrote ${parts.length} part files in $tmp")
        java.nio.file.Files.move(parts.head.toPath, dst.toPath)
        Option(tmp.listFiles()).getOrElse(Array.empty)
          .foreach(f => java.nio.file.Files.deleteIfExists(f.toPath))
        java.nio.file.Files.deleteIfExists(tmp.toPath)
      }
    }
    bins
  }
}
