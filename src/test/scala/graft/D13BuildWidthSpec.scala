package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.scalatest.funsuite.AnyFunSuite

/** Pin for the round-16 fix of VERDICT r15 #2 — *AQE amplification
  * blindness* on d13's candidate join. AQE's partition coalescing
  * sizes every post-shuffle stage from MAP-OUTPUT bytes; d13's
  * `pref ⋈ ex` candidate join amplifies its output ~23× (2.3 GB read
  * → 54 GB emitted at 2M docs), so AQE ran it ~27-wide regardless of
  * `spark.sql.shuffle.partitions` — measured at sf40eq, where
  * coalescing-off + a real 128-partition floor dropped the quiet
  * build wall 424 → 265.6 s (join stage 11,015 → 3,775 core-s;
  * PLANS.md round 15 part 2). The fix ships as a BUILD-scoped conf
  * override ([[graft.queries.DedupQueries.d13BuildConf]] through
  * [[graft.core.ArtifactStore.getOrBuild]]'s `buildConf`).
  *
  * Three things must stay true, each asserted here on the real
  * shipped path:
  *
  *  1. the mining job's shuffle stages actually EXECUTE at ≥ the
  *     floor (at this corpus size, plain AQE would coalesce every
  *     one of them to a single partition — so the width observed by
  *     a stage listener discriminates the fix from its absence);
  *  2. the session's confs are RESTORED after the build — the
  *     override must never leak into serving plans or later queries;
  *  3. the `buildConf` plumbing itself: applied around the build
  *     thunk + write, restored on the failure path too, and never
  *     touched on a read hit (the thunk isn't evaluated).
  */
class D13BuildWidthSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  /** Stage widths + shuffle traffic observed by a listener. */
  private final class StageTap extends SparkListener {
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, Long)]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      stages.add((si.stageId, si.numTasks,
        si.taskMetrics.shuffleReadMetrics.totalBytesRead,
        si.taskMetrics.shuffleWriteMetrics.bytesWritten))
    }
  }

  test("d13's mining stages run at the parallelism floor; AQE cannot coalesce the amplifying join") {
    val work = java.nio.file.Files.createTempDirectory("d13w_art").toString
    spark.conf.set("spark.graft.artifacts.dir", work)
    val tap = new StageTap
    spark.sparkContext.addSparkListener(tap)
    try {
      val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
      val coalesceBefore = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
      val floor = graft.queries.DedupQueries.d13BuildConf(spark)(
        "spark.sql.shuffle.partitions").toInt
      assert(floor == math.max(partsBefore.toInt, 4 * spark.sparkContext.defaultParallelism),
        s"the floor must be max(configured, 4×parallelism), got $floor")

      val before = graft.queries.DedupQueries.d13PairBuilds.get()
      graft.queries.DedupQueries.d13Containment(spark, sfDir)
      assert(graft.queries.DedupQueries.d13PairBuilds.get() == before + 1,
        "fresh artifacts dir must force a real mining build")
      org.apache.spark.sql.GraftShims.waitListenerBus(spark)

      // (1) the build really ran wide: with coalescing on, this corpus
      // (~600 docs) coalesces every post-shuffle stage to 1 partition —
      // seeing stages at exactly the floor proves the override reached
      // execution, and the widest shuffle-WRITING stage at the floor is
      // the candidate/verify pipeline itself
      val observed = tap.stages.toArray(Array.empty[(Int, Int, Long, Long)]).toSeq
      val atFloor = observed.filter(_._2 >= floor)
      assert(atFloor.nonEmpty,
        s"no mining stage ran at the $floor-partition floor — AQE coalesced the build; " +
          s"stages observed: ${observed.map(s => s"id=${s._1} tasks=${s._2}").mkString(", ")}")
      assert(atFloor.exists(s => s._3 > 0 && s._4 > 0),
        "no floor-width stage both read and wrote shuffle data — the mid-pipeline " +
          "join/aggregate stages (the amplifying part) did not run at the floor")

      // (2) the override is build-scoped: serving confs restored
      assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore,
        "shuffle.partitions leaked out of the d13 build scope")
      assert(spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == coalesceBefore,
        "coalescePartitions.enabled leaked out of the d13 build scope")

      // ...and the serving path READS the manifest (no second build)
      graft.queries.DedupQueries.d13Containment(spark, sfDir).count()
      assert(graft.queries.DedupQueries.d13PairBuilds.get() == before + 1,
        "second call must read the stored manifest, not rebuild")
    } finally {
      spark.sparkContext.removeSparkListener(tap)
      spark.conf.unset("spark.graft.artifacts.dir")
    }
  }

  test("getOrBuild applies buildConf around the build thunk and restores it on success and failure") {
    val work = java.nio.file.Files.createTempDirectory("d13w_plumb").toString
    spark.conf.set("spark.graft.artifacts.dir", work)
    val builds = new java.util.concurrent.atomic.AtomicLong(0)
    val conf = Map("spark.sql.shuffle.partitions" -> "7",
      "spark.graft.test.knob" -> "on")
    try {
      val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
      var seenParts: String = null
      var seenKnob: Option[String] = None
      val out = graft.core.ArtifactStore.getOrBuild(
        spark, "width_probe", "deadbeefdeadbeef", sfDir, builds, conf) {
        seenParts = spark.conf.get("spark.sql.shuffle.partitions")
        seenKnob = spark.conf.getOption("spark.graft.test.knob")
        spark.range(10).toDF("id")
      }
      assert(out.count() == 10 && builds.get == 1)
      assert(seenParts == "7" && seenKnob.contains("on"),
        "build thunk must execute under buildConf")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore,
        "preexisting conf must be restored to its prior value after the build")
      assert(spark.conf.getOption("spark.graft.test.knob").isEmpty,
        "a conf the session never had must be UNSET after the build, not left behind")

      // read hit: thunk not evaluated, confs untouched
      graft.core.ArtifactStore.getOrBuild(
        spark, "width_probe", "deadbeefdeadbeef", sfDir, builds, conf) {
        fail("read hit must not evaluate the build thunk")
      }
      assert(builds.get == 1)
      assert(spark.conf.getOption("spark.graft.test.knob").isEmpty)

      // failure path: restore still happens, debris cleaned
      intercept[RuntimeException] {
        graft.core.ArtifactStore.getOrBuild(
          spark, "width_probe", "feedfacefeedface", sfDir, builds, conf) {
          assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
          throw new RuntimeException("boom")
        }
      }
      assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore,
        "conf must be restored after a FAILED build")
      assert(spark.conf.getOption("spark.graft.test.knob").isEmpty)
    } finally spark.conf.unset("spark.graft.artifacts.dir")
  }
}
