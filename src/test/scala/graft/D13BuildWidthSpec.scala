package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pin for the round-16 fix of VERDICT r15 #2 — *AQE amplification
  * blindness* on d13's candidate join. AQE's partition coalescing
  * sizes every post-shuffle stage from MAP-OUTPUT bytes; d13's
  * `pref ⋈ ex` candidate join amplifies its output (2.3 GB read →
  * 54 GB emitted at 2M docs), so AQE ran it ~27-wide regardless of
  * `spark.sql.shuffle.partitions` — measured at sf40eq, where
  * coalescing-off + a real 128-partition width dropped the quiet
  * build wall 424 → 265.6 s (join stage 11,015 → 3,775 core-s;
  * PLANS.md round 15 part 2). The fix ships as a BUILD-scoped conf
  * override ([[graft.queries.DedupQueries.d13BuildConf]] through
  * [[graft.core.ArtifactStore.getOrBuild]]'s `buildConf`), sized from
  * the AMPLIFIED-OUTPUT estimate so small corpora keep their stock
  * coalesced plans (a fixed 4×cores floor measured 4.9 → 13.9 s on
  * sf0.1's 0.6 MB corpus — input-size blindness, the same error class
  * as AQE's in the opposite direction).
  *
  * Four things must stay true, each asserted here:
  *
  *  1. the width decision reproduces its measured anchor points
  *     (sf40eq/sf10eq → 128 on 32 cores; sf0.1 → stock; a cluster's
  *     configured thousands stay authoritative);
  *  2. when the override engages, the mining job's shuffle stages
  *     actually EXECUTE at ≥ the width (plain AQE at this corpus size
  *     would coalesce them to a single partition — so the width
  *     observed by a stage listener discriminates the fix from its
  *     absence);
  *  3. the serving session's confs are never touched — round 17
  *     strengthened round 16's restored-after contract to full
  *     ISOLATION (VERDICT r16 "what's wrong" #1): the build executes
  *     on a CLONED session (`SparkSession.cloneSession` — same
  *     SparkContext, copied conf/views/functions) carrying buildConf,
  *     so a concurrent serving query cannot observe the override even
  *     WHILE the build runs;
  *  4. the `buildConf` plumbing itself: the thunk's session carries
  *     buildConf, the parent session stays clean through success AND
  *     failure, and a read hit evaluates nothing;
  *  5. (round 17, VERDICT r16 #2) the build self-calibrates: actual
  *     candidate-stream bytes are recorded in the artifact meta next
  *     to the estimate, and the drift warning fires exactly when the
  *     override engaged and actual/estimated left [0.5, 2].
  */
class D13BuildWidthSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("width decision reproduces the measured anchor points") {
    import graft.queries.DedupQueries.d13BuildWidth
    val MB = 1L << 20
    // sf40eq: 408 MB corpus, 32-core box, 32 configured → the
    // measured-good 128 (54.9 GB emitted; 424 → 265.6 s quiet)
    assert(d13BuildWidth(408 * MB, 32, 32, 64 * MB) === Some(128))
    // sf10eq: 80 MB corpus → also 128 on 32 cores (13.5 GB emitted)
    assert(d13BuildWidth(80 * MB, 32, 32, 64 * MB) === Some(128))
    // sf0.1: 0.6 MB corpus → ~90 MB estimated candidates fit in one
    // advisory-sized wave: stock AQE, NO override (round 16's first
    // cut forced 128 here and paid 4.9 → 13.9 s cold)
    assert(d13BuildWidth((0.6 * MB).toLong, 32, 32, 64 * MB) === None)
    assert(d13BuildWidth(65 * 1024, 4, 4, 64 * MB) === None) // sf0.001 in tests
    // a deployment's configured width stays authoritative up to need;
    // the 4×cores cap keeps a fixed machine at ~4 task waves
    assert(d13BuildWidth(100L * 1024 * MB, 4000, 1000, 64 * MB) === Some(4000))
    assert(d13BuildWidth(100L * 1024 * MB, 32, 1000, 64 * MB) === Some(4000))
    // ADVICE r16: a corpus barely past the one-wave threshold
    // (need≈33 on 32 cores) must run ~need-wide, NOT at a stock
    // deployment default of 200 — configured is clamped by need, so
    // disabled coalescing can never force tiny partitions on a
    // barely-engaged override
    assert(d13BuildWidth(14 * MB, 200, 32, 64 * MB) === Some(33))
    assert(d13BuildWidth(14 * MB, 4000, 32, 64 * MB) === Some(33))
  }

  test("an engaged override really runs the mining stages wide; AQE cannot coalesce them back") {
    val work = java.nio.file.Files.createTempDirectory("d13w_art").toString
    // the corpus at sfDir is tiny, so engage the override the way a
    // big corpus would: shrink AQE's advisory partition size — the
    // exact knob the width estimate divides by (no test backdoor)
    withConfs(
      "spark.graft.artifacts.dir" -> work,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k") {
      val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
      val coalesceBefore = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
      val conf = graft.queries.DedupQueries.d13BuildConf(spark, sfDir)
      val floor = conf.getOrElse("spark.sql.shuffle.partitions",
        fail("override did not engage at a 16k advisory — width estimate broken")).toInt
      assert(floor == 4 * spark.sparkContext.defaultParallelism,
        s"tiny corpus over a 16k advisory must hit the 4×parallelism cap, got $floor")
      assert(conf("spark.sql.adaptive.coalescePartitions.enabled") == "false")

      // the shared stage tap (graft.core.StageIOTap — one definition
      // for every stage-traffic consumer, like AmplificationAuditSpec
      // and the buildMeta hook)
      val tap = new graft.core.StageIOTap
      spark.sparkContext.addSparkListener(tap)
      try {
        val before = graft.queries.DedupQueries.d13PairBuilds.get()
        graft.queries.DedupQueries.d13Containment(spark, sfDir)
        assert(graft.queries.DedupQueries.d13PairBuilds.get() == before + 1,
          "fresh artifacts dir must force a real mining build")
        org.apache.spark.sql.GraftShims.waitListenerBus(spark)

        // the build really ran wide: with coalescing on, this corpus
        // (~600 docs) coalesces every post-shuffle stage to 1
        // partition — stages at the width prove the override reached
        // execution, and a width-wide stage that both read and wrote
        // shuffle is the mid-pipeline join/aggregate itself
        val observed = tap.stages
        val atFloor = observed.filter(_.tasks >= floor)
        assert(atFloor.nonEmpty,
          s"no mining stage ran at the $floor-partition width — AQE coalesced the build; " +
            s"stages observed: ${observed.map(s => s"id=${s.stageId} tasks=${s.tasks}").mkString(", ")}")
        assert(atFloor.exists(s => s.readBytes > 0 && s.writeBytes > 0),
          "no width-wide stage both read and wrote shuffle data — the mid-pipeline " +
            "join/aggregate stages (the amplifying part) did not run at the width")

        // the override is build-scoped: serving confs restored
        assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore,
          "shuffle.partitions leaked out of the d13 build scope")
        assert(spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == coalesceBefore,
          "coalescePartitions.enabled leaked out of the d13 build scope")

        // ...and the serving path READS the manifest (no second build)
        graft.queries.DedupQueries.d13Containment(spark, sfDir).count()
        assert(graft.queries.DedupQueries.d13PairBuilds.get() == before + 1,
          "second call must read the stored manifest, not rebuild")
      } finally spark.sparkContext.removeSparkListener(tap)
    }
  }

  test("a small corpus at the default advisory keeps its stock coalesced plan (no conf override)") {
    assert(graft.queries.DedupQueries.d13BuildConf(spark, sfDir).isEmpty,
      "sf0.001 under the 64MB advisory must not engage the override — small-corpus " +
        "builds keep stock AQE sizing (the round-16 input-size-blindness lesson)")
  }

  test("getOrBuild isolates buildConf on a cloned session; the serving session never observes it") {
    val work = java.nio.file.Files.createTempDirectory("d13w_plumb").toString
    spark.conf.set("spark.graft.artifacts.dir", work)
    val builds = new java.util.concurrent.atomic.AtomicLong(0)
    val conf = Map("spark.sql.shuffle.partitions" -> "7",
      "spark.graft.test.knob" -> "on")
    try {
      val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
      var seenParts: String = null
      var seenKnob: Option[String] = None
      var parentDuringBuild: String = null
      var parentKnobDuringBuild: Option[String] = None
      var sawClone = false
      val out = graft.core.ArtifactStore.getOrBuild(
        spark, "width_probe", "deadbeefdeadbeef", sfDir, builds, conf) { s =>
        seenParts = s.conf.get("spark.sql.shuffle.partitions")
        seenKnob = s.conf.getOption("spark.graft.test.knob")
        // THE isolation property (VERDICT r16 #1): while the build is
        // in flight, the SERVING session's conf is untouched — the
        // round-16 save/set/restore approach failed exactly this
        parentDuringBuild = spark.conf.get("spark.sql.shuffle.partitions")
        parentKnobDuringBuild = spark.conf.getOption("spark.graft.test.knob")
        sawClone = !(s eq spark)
        s.range(10).toDF("id")
      }
      assert(out.count() == 10 && builds.get == 1)
      assert(seenParts == "7" && seenKnob.contains("on"),
        "build thunk's session must carry buildConf")
      assert(sawClone, "a non-empty buildConf must hand the thunk a CLONED session")
      assert(parentDuringBuild == partsBefore && parentKnobDuringBuild.isEmpty,
        "serving session observed build confs WHILE the build ran — isolation broken")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore,
        "serving conf changed across the build")
      assert(spark.conf.getOption("spark.graft.test.knob").isEmpty,
        "build-only conf leaked into the serving session")

      // read hit: thunk not evaluated, no session cloned
      graft.core.ArtifactStore.getOrBuild(
        spark, "width_probe", "deadbeefdeadbeef", sfDir, builds, conf) { _ =>
        fail("read hit must not evaluate the build thunk")
      }
      assert(builds.get == 1)
      assert(spark.conf.getOption("spark.graft.test.knob").isEmpty)

      // failure path: parent stays clean, debris cleaned
      intercept[RuntimeException] {
        graft.core.ArtifactStore.getOrBuild(
          spark, "width_probe", "feedfacefeedface", sfDir, builds, conf) { s =>
          assert(s.conf.get("spark.sql.shuffle.partitions") == "7")
          throw new RuntimeException("boom")
        }
      }
      assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore,
        "serving conf changed across a FAILED build")
      assert(spark.conf.getOption("spark.graft.test.knob").isEmpty)

      // an EMPTY buildConf hands the thunk the caller's own session —
      // identical plans to every pre-round-17 build, no clone overhead
      var sameSession = false
      graft.core.ArtifactStore.getOrBuild(
        spark, "width_probe", "0123abcd0123abcd", sfDir, builds) { s =>
        sameSession = s eq spark
        s.range(3).toDF("id")
      }
      assert(sameSession, "empty buildConf must not clone the session")

      // the cloned session copies STATE the build plan depends on:
      // temp views and runtime conf travel into the clone
      spark.range(5).toDF("v").createOrReplaceTempView("width_probe_view")
      var cloneSawView = 0L
      graft.core.ArtifactStore.getOrBuild(
        spark, "width_probe", "4567cdef4567cdef", sfDir, builds, conf) { s =>
        cloneSawView = s.table("width_probe_view").count()
        s.range(2).toDF("id")
      }
      assert(cloneSawView == 5,
        "cloned build session must see the caller's temp views (cloneSession, not newSession)")
    } finally spark.conf.unset("spark.graft.artifacts.dir")
  }

  test("calibration drift decision fires exactly when the override engaged and drift left [0.5,2]") {
    import graft.core.StageIO
    import graft.queries.DedupQueries.d13CalibrationReport
    val MB = 1L << 20
    // engaged + in band (sf40eq measured shape: 408 MB × 150 est, 54.9 GB actual → 0.90×)
    val stages40 = Seq(StageIO(1, 128, 2400 * MB, 54931 * MB), StageIO(2, 128, 900 * MB, 900 * MB))
    val (lines, warnInBand) = d13CalibrationReport(408 * MB, engaged = true, stages40)
    assert(warnInBand.isEmpty, "in-band drift must not warn")
    assert(lines.exists(_ == s"d13.candidate_bytes_actual=${54931 * MB}"))
    assert(lines.exists(_ == s"d13.candidate_bytes_estimated=${408 * MB * 150}"))
    assert(lines.exists(_.startsWith("d13.actual_over_estimated=0.897")))
    assert(lines.contains("d13.width_override_engaged=true"))
    // engaged + >2× over: the under-provisioning direction — warn
    val (_, warnOver) = d13CalibrationReport(408 * MB, engaged = true,
      Seq(StageIO(1, 128, 2400 * MB, 150000 * MB)))
    assert(warnOver.exists(_.contains("WARNING")),
      "engaged build with actual > 2x estimate must warn")
    // engaged + <0.5× under: over-provisioned width — warn too
    val (_, warnUnder) = d13CalibrationReport(408 * MB, engaged = true,
      Seq(StageIO(1, 128, 2400 * MB, 20000 * MB)))
    assert(warnUnder.isDefined, "engaged build with actual < 0.5x estimate must warn")
    // NOT engaged: tiny corpora are fixed-cost-dominated, the constant
    // decided nothing — record, never warn (sf0.1 measures ~0.03×)
    val (linesSmall, warnSmall) = d13CalibrationReport(600 * 1024, engaged = false,
      Seq(StageIO(1, 1, 64 * 1024, 3 * 1024)))
    assert(warnSmall.isEmpty, "non-engaged build must never warn, whatever the drift")
    assert(linesSmall.contains("d13.width_override_engaged=false"))
  }

  test("an engaged mining build records its calibration lines in the artifact meta") {
    val work = java.nio.file.Files.createTempDirectory("d13w_meta").toString
    withConfs(
      "spark.graft.artifacts.dir" -> work,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k") {
      val before = graft.queries.DedupQueries.d13PairBuilds.get()
      graft.queries.DedupQueries.d13Containment(spark, sfDir)
      assert(graft.queries.DedupQueries.d13PairBuilds.get() == before + 1,
        "fresh artifacts dir must force a real mining build")
      val fp = graft.core.ArtifactStore.fingerprint(sfDir, Seq("documents.parquet"),
        Seq("d13pairs=v2:prefix=0.4:thr=0.6"))
      val meta = graft.core.ArtifactStore.meta(spark, "d13_pairs_v1", fp)
      assert(meta.headOption.contains(new java.io.File(sfDir).getAbsolutePath),
        s"meta scope line broken: $meta")
      val actual = meta.collectFirst {
        case l if l.startsWith("d13.candidate_bytes_actual=") => l.split("=")(1).toLong
      }
      assert(actual.exists(_ > 0),
        s"build must record a positive measured candidate-stream byte count; meta=$meta")
      assert(meta.contains("d13.width_override_engaged=true"),
        s"this build ran with the override engaged (16k advisory); meta=$meta")
      assert(meta.exists(_.startsWith("d13.candidate_bytes_estimated=")) &&
        meta.exists(_.startsWith("d13.actual_over_estimated=")), s"meta=$meta")
      // ...and the round-17 standard self-audit recognizes the engaged
      // override as protection (ArtifactStore.buildProfile — the
      // hook's d13.* lines come AFTER the standard build.* lines)
      assert(meta.contains("build.width_overridden=true"), s"meta=$meta")
      assert(meta.exists(_.startsWith("build.max_amplification=")), s"meta=$meta")
    }
  }
}
