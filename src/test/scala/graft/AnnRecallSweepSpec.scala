package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.{L2SquaredDistance, Vectors}
import graft.queries.AnnQueries

/** The measurement behind the IVF quantizer choice: recall@3 of the
  * IVF index against exact kNN for the s6/s15 probe set, swept over
  * the quantizer (label-derived per-class means vs the k-means-trained
  * [[AnnQueries.trainedCentroids]]) and nprobe 1..6 of the 10 cells.
  *
  * Round-8's s15 eval surfaced that the label-derived quantizer is not
  * deployable (recall@3 = 0.31 at sf0.01); this spec pins the fix —
  * the TRAINED quantizer at the shipped nprobe must clear the
  * deployability floor — and prints the whole sweep so the measured
  * ceiling is documented, not guessed. Exact top-3 sets are computed
  * once per corpus and reused across the twelve swept configurations.
  */
class AnnRecallSweepSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  private def probesOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 20 === 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("q_emb"))

  /** Exact top-3 neighbor ids per probe — the s6/s15 spelling. */
  private def exactTop3(e: DataFrame): Set[(Long, Long)] = {
    val scored = e.select(col("vec_id"), col("embedding"))
      .join(broadcast(probesOf(e)), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(Vectors.cosine(col("embedding"), col("q_emb")), 9).as("sim"))
    graft.plans.TopK.perKey(scored, Seq(col("probe_id")),
      Seq(col("sim").desc, col("vec_id")), k = 3)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** IVF top-3 per probe under `cent` at `nprobe` — the s15 ANN arm. */
  private def annTop3(e: DataFrame, cent: DataFrame, nprobe: Int): Set[(Long, Long)] = {
    val probes = probesOf(e)
    val assigned = AnnQueries.assignCells(e.select(col("vec_id"), col("embedding")), cent)
    val cells = graft.plans.TopK.perKey(
      probes.crossJoin(broadcast(cent))
        .select(col("probe_id"), col("label").as("plabel"),
          L2SquaredDistance(col("centroid"), col("q_emb")).as("qd")),
      Seq(col("probe_id")), Seq(col("qd"), col("plabel")), k = nprobe)
      .select("probe_id", "plabel")
    val annScored = assigned
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(cells), col("clabel") === col("plabel"))
      .join(broadcast(probes), "probe_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(Vectors.cosine(col("embedding"), col("q_emb")), 9).as("sim"))
    graft.plans.TopK.perKey(annScored, Seq(col("probe_id")),
      Seq(col("sim").desc, col("vec_id")), k = 3)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("trained quantizer beats the label seed and the shipped config clears the floor") {
    val e = Tables.load(spark, dir, "embeddings")
    val exact = exactTop3(e)
    val total = exact.size.toDouble
    val labelCent = AnnQueries.centroids(e)
    val trainedCent = AnnQueries.trainedCentroids(spark, dir)
    val sweep = for {
      (qname, cent) <- Seq("label" -> labelCent, "trained" -> trainedCent)
      nprobe <- 1 to 6
    } yield {
      val r = (annTop3(e, cent, nprobe) intersect exact).size / total
      info(f"quantizer=$qname%-8s nprobe=$nprobe  recall@3 = $r%.3f")
      (qname, nprobe, r)
    }
    val at = sweep.map { case (q, n, r) => (q, n) -> r }.toMap
    // the round-8 finding must reproduce: the label seed is weak
    assert(at(("trained", 2)) > at(("label", 2)),
      "training the quantizer must improve recall at the old nprobe")
    // the shipped s4/s15 configuration (trained quantizer at
    // AnnQueries.ivfNprobe) must clear the deployability floor
    assert(at(("trained", AnnQueries.ivfNprobe)) >= 0.8,
      s"shipped IVF config below the 0.8 recall floor: ${at(("trained", AnnQueries.ivfNprobe))}")
  }

  test("shipped config holds at the next scaling decade (sf0.1)") {
    val big = "/root/testdata/sf0.1"
    val e = Tables.load(spark, big, "embeddings")
    val exact = exactTop3(e)
    val trainedCent = AnnQueries.trainedCentroids(spark, big)
    (2 to 6).foreach { nprobe =>
      val r = (annTop3(e, trainedCent, nprobe) intersect exact).size / exact.size.toDouble
      info(f"sf0.1 quantizer=trained nprobe=$nprobe  recall@3 = $r%.3f")
      if (nprobe == AnnQueries.ivfNprobe)
        assert(r >= 0.8, s"shipped IVF config below the 0.8 floor at sf0.1: $r")
    }
  }
}
