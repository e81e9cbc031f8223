package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fingerprint-keyed STORED artifacts (round 11): the p8 base-manifest
  * discipline (round 10, `PipelineQueries.p8BaseManifest`) generalized
  * so every session-rebuilt serving artifact — the PQ codes table, the
  * dedup pair manifests, x73's maintained base join term — can be
  * built once per input fingerprint and read back from parquet
  * thereafter, across JVMs.
  *
  * Contract, shared by every consumer:
  *
  *  - An artifact lives at `<spark.graft.artifacts.dir>/<name>_<fp>/`
  *    where `fp` = [[fingerprint]] of the input files (path + every
  *    part file's name/size/mtime) PLUS the build parameters (format
  *    version, quantizer config, thresholds). Regenerating an input
  *    table or changing a build knob changes the key, so a stale
  *    stored artifact can never serve a new corpus or an old config —
  *    the hand-bumped-version-tag-only keying ADVICE r10 flagged.
  *  - The `_graft_done` marker is created strictly AFTER the parquet
  *    write: a kill mid-write leaves data without the marker and the
  *    next consumer REBUILDS (ChaosRecoverySpec / PersistLifecycleSpec
  *    kill-mid-write scenarios). The build runs under one JVM-global
  *    lock — one builder per process; concurrent sessions re-check
  *    the marker under the lock.
  *  - Only exactly-representable cells (integers, strings, IEEE
  *    doubles — parquet roundtrips all of them bit-for-bit) may be
  *    stored, so a read-back artifact is indistinguishable from the
  *    freshly built DataFrame and the queries' from-scratch oracles
  *    keep gating end-to-end.
  *
  * At 100 TB this is the production shape: indexes, signature tables,
  * and materialized base terms are maintained artifacts a refresh
  * READS — never recomputed per job. Locally the store lives under
  * `target/graft_artifacts` (gitignored) and survives JVMs, so a
  * bench pass-1 "cold" number depends on whether a prior run built
  * the artifact; per-query build counters keep the built-once
  * contract spec-pinned. */
object ArtifactStore {

  /** One builder per JVM; concurrent consumers of different artifacts
    * serialize too — acceptable at this cadence (builds are rare and
    * the common path is a marker check). */
  private val buildLock = new Object

  private def root(spark: SparkSession): java.io.File =
    new java.io.File(
      spark.conf.get("spark.graft.artifacts.dir", "target/graft_artifacts"))

  /** Fingerprint of the named inputs under `dir` plus the build
    * `params`: absolute dir path, every part file's (relative name,
    * byte length, mtime), and each param token, SHA-256-hashed to 16
    * hex chars. Metadata only — no data scan. Fold EVERY knob the
    * artifact's contents depend on into `params` (format version,
    * quantizer rounds/seed, thresholds): a changed knob must change
    * the key, not silently serve the old build. */
  def fingerprint(dir: String, names: Seq[String], params: Seq[String]): String = {
    def walk(f: java.io.File, rel: String): Seq[String] =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName).toSeq
          .flatMap(c => walk(c, s"$rel/${c.getName}"))
      else Seq(s"$rel:${f.length}:${f.lastModified}")
    val desc = (new java.io.File(dir).getAbsolutePath +: names.flatMap { n =>
      val f = new java.io.File(dir, n)
      if (f.exists) walk(f, n) else Seq(s"$n:absent")
    }) ++ params
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val h = md.digest(desc.mkString("\n").getBytes("UTF-8"))
    h.take(8).map(b => f"$b%02x").mkString
  }

  /** Read the artifact `<name>_<fp>` if its marker exists, else run
    * `build`, store it, mark done, and read it back. `builds`
    * increments on every real build — the lifecycle specs pin
    * built-once/read-thereafter and the kill-mid-write rebuild against
    * it. The returned DataFrame is always the parquet READ (never the
    * build plan), so first and later consumers execute identical
    * plans. */
  def getOrBuild(spark: SparkSession, name: String, fp: String,
      builds: java.util.concurrent.atomic.AtomicLong)(build: => DataFrame): DataFrame =
    buildLock.synchronized {
      val art = new java.io.File(root(spark), s"${name}_$fp")
      val marker = new java.io.File(art, "_graft_done")
      val data = new java.io.File(art, "data.parquet")
      if (!marker.exists) {
        builds.incrementAndGet()
        build.write.mode("overwrite").parquet(data.getAbsolutePath)
        // marker AFTER the write: a kill mid-write leaves no marker and
        // the next consumer rebuilds
        marker.createNewFile()
      }
      spark.read.parquet(data.getAbsolutePath)
    }
}
