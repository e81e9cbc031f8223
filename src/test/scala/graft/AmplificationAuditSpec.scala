package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{StageIO, StageIOTap}

/** The committed regression guard for the ONE planner hazard this
  * codebase has ever had (VERDICT r16 top ask): *AQE amplification
  * blindness*. AQE's partition coalescing sizes every post-shuffle
  * stage from the bytes it READS (the previous stage's map output)
  * and is blind to how many bytes the stage EMITS — so a stage whose
  * shuffle write far exceeds its shuffle read runs under-provisioned
  * no matter what `spark.sql.shuffle.partitions` says. d13's
  * containment candidate join carried exactly that for 15 rounds
  * (2.3 GB read → 54 GB emitted at 2 M docs; fixed round 16 by the
  * data-sized width override in
  * [[graft.queries.DedupQueries.d13BuildConf]]).
  *
  * Round 16 audited the rest of the inventory for the same hazard
  * with a one-off script over the shipped classes (commit `47a5bb2`,
  * PLANS.md round-16 addendum) — max per-stage write/read ratios at
  * sf10eq: d1 minhash-band mining **0.24**, d9 ExactSubstr span
  * mining **0.70**, t11 SymSpell fuzzy join **1.15**, x70
  * oriented-wedge join **0.03**, d2 SimHash pigeonhole block join
  * **3.44** (bounded by construction: the 5-block explode is exactly
  * 5× plus sparse candidates), d13 **~23×** (the one planner-hazard
  * amplifier, and the only pipeline with a width override). This spec
  * turns that audit into a permanent gate: a future operator that
  * reintroduces an output-amplifying stage without a width override
  * fails a committed test instead of shipping 15 rounds of silent
  * under-provisioning.
  *
  * THE RULE (one line): at sf10eq, no AQE-sized stage
  * (shuffle read ≥ 1 MB) may write ≥ one advisory partition of
  * shuffle output at > 5× its shuffle read, unless the pipeline
  * ships a width override for that stage. The two floors are not
  * arbitrary:
  *
  *  - read ≥ 1 MB: a stage reading less is control-plane traffic
  *    (result collection, tiny dimension exchanges) whose byte ratio
  *    is noise, not a coalescing decision over data;
  *  - write ≥ advisoryPartitionSizeInBytes: if a stage's TOTAL
  *    amplified output fits inside one advisory-sized partition,
  *    even a single post-shuffle task is correctly provisioned —
  *    under-sizing is definitionally impossible below the floor;
  *  - ratio > 5: the verdict's threshold, with measured headroom —
  *    the inventory's worst clean stage (d2's structural ≤5×
  *    pigeonhole explode) measures 3.44× because parquet-side text
  *    compression applies to both sides, while the hazard class
  *    starts an order of magnitude higher (d13 at ~23×). If d2's
  *    hamming radius or block count ever grows, this gate is
  *    exactly the alarm the round-16 addendum promised.
  *
  * d13 runs as the POSITIVE CONTROL: its amplifier must still be
  * measured > 5× (the instrument can see the hazard) AND its width
  * override must engage at this corpus size (the hazard is handled).
  * A guard whose alarm never fires on the known-hazardous stage
  * would prove nothing about the five clean ones.
  *
  * Methodology: byte counters off the shared [[StageIOTap]] listener
  * — weather-INDEPENDENT (shuffle bytes are deterministic given the
  * plan; co-tenant CPU steal moves walls, never byte counts), so no
  * steal stamps, no retries, single pass. Each pipeline runs against
  * a fresh artifact dir so stored-artifact builds (d1's band mine,
  * d9's span manifest, d13's pair manifest) execute their REAL mining
  * plans rather than reading a prior round's parquet. The slice is
  * [[EqSlices.sf10eq]] — the same 2 M-doc corpus the round-16 audit
  * script measured and the decade-3 envelope times, big enough that
  * the joins in question genuinely shuffle (d13's probe side stops
  * broadcasting at sf10eq) so every ratio is measured on the shape a
  * cluster would run. */
class AmplificationAuditSpec extends AnyFunSuite with SparkSuite {

  /** The verdict's threshold (see class doc for the measured ladder
    * around it: worst clean stage 3.44×, hazard class ≥ ~23×). */
  private val ratioMax = graft.core.AmplificationHazard.ratioMax
  /** Stages reading less shuffle than this are control-plane noise. */
  private val readFloor = graft.core.AmplificationHazard.readFloorBytes

  private def advisoryBytes: Long =
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"))

  /** The gate itself is ONE definition in core
    * ([[graft.core.AmplificationHazard]] — shared with
    * [[graft.core.ArtifactStore]]'s per-build self-audit, the
    * production arm of this CI gate); its fixed points are pinned
    * below. */
  private[graft] def hazards(stages: Seq[StageIO], advisory: Long): Seq[StageIO] =
    graft.core.AmplificationHazard(stages, advisory)

  /** Run one pipeline at sf10eq under the shared tap; returns every
    * stage it executed. Fresh artifact dir per call — the mining
    * builds are the stages under audit. Caches dropped so no pipeline
    * inherits another's materialization (byte counts must be the
    * pipeline's own). */
  private def audit(fn: (SparkSession, String) => DataFrame): Seq[StageIO] = {
    val dir = EqSlices.sf10eq(spark)
    val art = java.nio.file.Files.createTempDirectory("amp_audit_art").toString
    withConfs("spark.graft.artifacts.dir" -> art) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      // drain stragglers from prior work so the window is ONLY ours
      org.apache.spark.sql.GraftShims.waitListenerBus(spark)
      val tap = new StageIOTap
      spark.sparkContext.addSparkListener(tap)
      try {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        org.apache.spark.sql.GraftShims.waitListenerBus(spark)
        tap.stages
      } finally spark.sparkContext.removeSparkListener(tap)
    }
  }

  private def report(name: String, stages: Seq[StageIO]): Unit = {
    val sized = stages.filter(_.readBytes >= readFloor)
    val worst = if (sized.isEmpty) -1.0 else sized.map(_.amplification).max
    info(f"$name%-18s stages=${stages.size}%3d  AQE-sized=${sized.size}%3d  " +
      f"max write/read $worst%6.2fx")
    sized.sortBy(-_.writeBytes).take(3).foreach { s =>
      info(f"  stage ${s.stageId}%4d  tasks=${s.tasks}%4d  read=${s.readBytes / 1e6}%9.1f MB  " +
        f"write=${s.writeBytes / 1e6}%9.1f MB  ratio=${s.amplification}%6.2fx")
    }
  }

  private def assertClean(name: String, fn: (SparkSession, String) => DataFrame): Unit = {
    val stages = audit(fn)
    report(name, stages)
    val bad = hazards(stages, advisoryBytes)
    assert(bad.isEmpty,
      s"$name grew an output-amplifying stage without a width override: " +
        bad.map(s => f"stage ${s.stageId} read=${s.readBytes} write=${s.writeBytes} " +
          f"(${s.amplification}%.1fx > $ratioMax%.0fx)").mkString("; ") +
        " — AQE will under-provision it at scale exactly as d13's candidate join " +
        "was for 15 rounds. Either restructure the stage or ship a data-sized " +
        "buildConf width override (the DedupQueries.d13BuildConf pattern).")
  }

  // ── the gate's own fixed points (pure, instant) ────────────────────
  test("hazard rule: read floor, advisory write floor, and ratio threshold each gate") {
    val MB = 1L << 20
    val adv = 64 * MB
    // the d13 shape at sf10eq: 0.6 GB read -> 13.5 GB written, ~23x
    val amplifier = StageIO(7, 16, 600 * MB, 13500 * MB)
    assert(hazards(Seq(amplifier), adv) == Seq(amplifier))
    // d2's shape: structural <=5x explode measured 3.44x — clean
    assert(hazards(Seq(StageIO(8, 16, 100 * MB, 344 * MB)), adv).isEmpty)
    // control-plane stage: huge ratio over a sub-floor read — noise, not a decision
    assert(hazards(Seq(StageIO(9, 1, 512 * 1024, 200 * MB)), adv).isEmpty)
    // amplified output below one advisory partition: cannot be under-sized
    assert(hazards(Seq(StageIO(10, 16, 2 * MB, 40 * MB)), adv).isEmpty)
    // scan stages (no shuffle read) are sized from input splits, out of scope
    assert(hazards(Seq(StageIO(11, 16, 0, 9000 * MB)), adv).isEmpty)
  }

  // ── the production arm: every artifact build self-audits ──────────
  test("buildProfile decision table: warn iff a hazardous stage ran unprotected") {
    import graft.core.ArtifactStore.buildProfile
    val MB = 1L << 20
    val adv = 64 * MB
    val amplifier = StageIO(7, 16, 600 * MB, 13500 * MB)
    // unprotected amplifier: recorded AND warned, remedy named
    val (lines, warn) = buildProfile("probe_v1_ff", Seq(amplifier), adv, widthOverridden = false)
    assert(lines.contains("build.amp_hazards=1") &&
      lines.contains("build.width_overridden=false") &&
      lines.contains(s"build.max_stage_write_bytes=${13500 * MB}") &&
      lines.contains("build.max_amplification=22.50"))
    assert(warn.exists(w => w.contains("probe_v1_ff") && w.contains("d13BuildConf")),
      s"unprotected amplifying build must warn with the remedy named: $warn")
    // the SAME stages under a width override: recorded, silent
    val (linesP, warnP) = buildProfile("probe_v1_ff", Seq(amplifier), adv, widthOverridden = true)
    assert(warnP.isEmpty, "a width-protected build must not warn")
    assert(linesP.contains("build.amp_hazards=1") &&
      linesP.contains("build.width_overridden=true"))
    // clean build: recorded, silent
    val (linesC, warnC) = buildProfile("clean_v1_00",
      Seq(StageIO(1, 4, 100 * MB, 70 * MB)), adv, widthOverridden = false)
    assert(warnC.isEmpty && linesC.contains("build.amp_hazards=0") &&
      linesC.contains("build.max_amplification=0.70"))
    // no AQE-sized stage at all (scan-only build): the -1 sentinel
    val (linesS, warnS) = buildProfile("scan_v1_00",
      Seq(StageIO(1, 4, 0, 5 * MB)), adv, widthOverridden = false)
    assert(warnS.isEmpty && linesS.contains("build.max_amplification=-1.00"))
  }

  test("an unprotected amplifying BUILD records its hazard in the artifact meta and warns") {
    val work = java.nio.file.Files.createTempDirectory("amp_selfaudit").toString
    // a low advisory keeps this probe build small while staying above
    // the gate's write floor — the exact knob a real deployment tunes
    withConfs("spark.graft.artifacts.dir" -> work,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k") {
      val builds = new java.util.concurrent.atomic.AtomicLong(0)
      // a deliberately amplifying mining plan with NO width override:
      // stage 1 shuffles ~10 MB of incompressible hashes; stage 2
      // reads them, explodes ×20, and shuffles the amplified stream
      graft.core.ArtifactStore.getOrBuild(
        spark, "amp_probe", "cafebabecafebabe", work, builds) { s =>
        import org.apache.spark.sql.functions._
        s.range(600000)
          .select(xxhash64(col("id")).as("h"), (col("id") % 13).as("k"))
          .repartition(4, col("k"))
          .select(explode(array((0 until 20).map(i => xxhash64(col("h"), lit(i))): _*)).as("v"))
          .repartition(8, col("v"))
          .groupBy((col("v") % 997).as("g")).agg(count(lit(1)).as("n"))
      }
      assert(builds.get == 1)
      val meta = graft.core.ArtifactStore.meta(spark, "amp_probe", "cafebabecafebabe")
      val hazardCount = meta.collectFirst {
        case l if l.startsWith("build.amp_hazards=") => l.split("=")(1).toInt
      }
      assert(hazardCount.exists(_ >= 1),
        s"the ×20 explode must trip the self-audit; meta=$meta")
      assert(meta.contains("build.width_overridden=false"), s"meta=$meta")
      val maxAmp = meta.collectFirst {
        case l if l.startsWith("build.max_amplification=") => l.split("=")(1).toDouble
      }
      assert(maxAmp.exists(_ > ratioMax),
        s"recorded max amplification must exceed the $ratioMax threshold; meta=$meta")
    }
  }

  // ── the audited inventory (the 47a5bb2 set, now a permanent gate) ──
  test("d1 minhash-band mining carries no unprotected amplifying stage (audit: 0.24x)") {
    assertClean("d1_minhash_lsh", graft.queries.DedupQueries.d1MinhashLsh _)
  }

  test("d2 simhash pigeonhole block join stays inside its structural 5x bound (audit: 3.44x)") {
    assertClean("d2_simhash", graft.queries.DedupQueries.d2Simhash _)
  }

  test("d9 span mining carries no unprotected amplifying stage (audit: 0.70x)") {
    assertClean("d9_span_dedup", graft.queries.DedupQueries.d9SpanDedup _)
  }

  test("t11 fuzzy join's candidate stage stays volume-preserving (audit: 1.15x)") {
    assertClean("t11_fuzzy_join", graft.queries.TextQueries.t11FuzzyJoin _)
  }

  test("x70 wedge join REDUCES volume (audit: 0.03x)") {
    assertClean("x70_triangle_count", graft.queries.SqlSurfaceQueries.x70TriangleCount _)
  }

  test("positive control: d13's amplifier is visible to this instrument AND width-protected") {
    val dir = EqSlices.sf10eq(spark)
    // the hazard is HANDLED: the data-sized override engages at 2M docs
    val conf = graft.queries.DedupQueries.d13BuildConf(spark, dir)
    assert(conf.nonEmpty,
      "d13's width override must engage at sf10eq (80 MB corpus, ~13.5 GB candidates)")
    assert(conf.get("spark.sql.adaptive.coalescePartitions.enabled").contains("false"))
    val stages = audit(graft.queries.DedupQueries.d13Containment _)
    report("d13_containment", stages)
    // ...and the hazard is VISIBLE: the same gate that must stay silent
    // on the five clean pipelines must fire here, or a silent-gate bug
    // (wrong floors, tap not seeing the cloned build session's stages)
    // would masquerade as a clean inventory
    val seen = hazards(stages, advisoryBytes)
    assert(seen.nonEmpty,
      "the audit instrument did not see d13's ~23x candidate amplifier — the gate " +
        "is blind, so the five clean verdicts above prove nothing; check the tap " +
        "window and the floors")
    // the amplifier really ran at the override's width, not AQE's
    // read-sized guess (same execution pin as D13BuildWidthSpec, here
    // on the slice where the hazard is real rather than advisory-forced)
    val width = conf("spark.sql.shuffle.partitions").toInt
    assert(seen.exists(_.tasks >= width),
      s"no amplifying stage ran at the override width ($width) — the protection " +
        "did not reach the stage that needs it")
  }
}
