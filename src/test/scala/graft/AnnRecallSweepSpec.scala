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

  /** PQ top-3 per probe at `m` subspaces (64/m dims each, codewords =
    * trained-centroid slices) and ADC rerank depth `depth` — the s16
    * arm, parameterized for the sweep. */
  private def pqTop3(e: DataFrame, cent: DataFrame, m: Int, depth: Int): Set[(Long, Long)] = {
    val subDim = 64 / m
    val probes = probesOf(e)
    val sub = cent.select(col("label"), explode(expr(
        s"transform(sequence(0, ${m - 1}), m -> struct(m AS m, slice(centroid, m * $subDim + 1, $subDim) AS c))")).as("s"))
      .select(col("s.m").as("m"), col("label"), col("s.c").as("c"))
    def partsOf(v: DataFrame, idCol: String, vecCol: String) =
      v.select(col(idCol), explode(expr(
        s"transform(sequence(0, ${m - 1}), m -> struct(m AS m, slice($vecCol, m * $subDim + 1, $subDim) AS v))")).as("p"))
        .select(col(idCol), col("p.m").as("m"), col("p.v").as("v"))
    val codes = partsOf(e.select(col("vec_id"), col("embedding")), "vec_id", "embedding")
      .join(broadcast(sub), "m")
      .select(col("vec_id"), col("m"), col("label"),
        L2SquaredDistance(col("c"), col("v")).as("d"))
      .groupBy("vec_id", "m")
      .agg(min_by(col("label"), struct(col("d"), col("label"))).as("code"))
    val qtab = partsOf(probes.select(col("probe_id"), col("q_emb")), "probe_id", "q_emb")
      .join(broadcast(sub), "m")
      .select(col("probe_id"), col("m").as("qm"), col("label"),
        floor(L2SquaredDistance(col("c"), col("v")) * lit(1000000L) + lit(0.5)).as("qd"))
    val cand = codes
      .join(broadcast(qtab), col("m") === col("qm") && col("code") === col("label"))
      .filter(col("vec_id") =!= col("probe_id"))
      .groupBy("probe_id", "vec_id").agg(sum(col("qd")).as("adist"))
    val candTop = graft.plans.TopK.perKey(cand, Seq(col("probe_id")),
      Seq(col("adist"), col("vec_id")), k = depth)
    graft.plans.TopK.perKey(
      candTop.join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(probes), "probe_id")
        .select(col("probe_id"), col("vec_id"),
          round(Vectors.cosine(col("embedding"), col("q_emb")), 9).as("sim")),
      Seq(col("probe_id")), Seq(col("sim").desc, col("vec_id")), k = 3)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("PQ sweep: the shipped (subspaces, rerank depth) clears the floor") {
    val e = Tables.load(spark, dir, "embeddings")
    val exact = exactTop3(e)
    val total = exact.size.toDouble
    val cent = AnnQueries.trainedCentroids(spark, dir)
    val sweep = for {
      m <- Seq(4, 8, 16)
      depth <- Seq(50, 200)
    } yield {
      val r = (pqTop3(e, cent, m, depth) intersect exact).size / total
      info(f"pq m=$m%-3d depth=$depth%-4d recall@3 = $r%.3f")
      ((m, depth), r)
    }
    val at = sweep.toMap
    assert(at((AnnQueries.pqSubspaces, AnnQueries.pqRerankDepth)) >= 0.8,
      s"shipped PQ config below the 0.8 recall floor: " +
        s"${at((AnnQueries.pqSubspaces, AnnQueries.pqRerankDepth))}")
  }

  test("shipped PQ config holds at the next scaling decade (sf0.1)") {
    val big = "/root/testdata/sf0.1"
    val e = Tables.load(spark, big, "embeddings")
    val exact = exactTop3(e)
    val cent = AnnQueries.trainedCentroids(spark, big)
    Seq((8, 200), (16, 50), (16, 200)).foreach { case (m, depth) =>
      val r = (pqTop3(e, cent, m, depth) intersect exact).size / exact.size.toDouble
      info(f"sf0.1 pq m=$m%-3d depth=$depth%-4d recall@3 = $r%.3f")
      if ((m, depth) == (AnnQueries.pqSubspaces, AnnQueries.pqRerankDepth))
        assert(r >= 0.8, s"shipped PQ config below the 0.8 floor at sf0.1: $r")
    }
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

  /** s17's eval: the IVF radius path can only LOSE results to the cell
    * gate, never invent them — precision must be exactly 1 against
    * the brute-force radius set, and recall is measured (the s15
    * discipline: no index path ships without a number). */
  test("s17 radius results are a subset of exact radius; recall measured at both SFs") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val e = Tables.load(spark, d, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val exact = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(Vectors.cosine(col("embedding"), col("q_emb")), 9).as("sim"))
        .filter(col("sim") >= 0.3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val ivf = AnnQueries.s17IvfRadius(spark, d)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(ivf.subsetOf(exact),
        s"IVF radius invented results at $d: ${ivf diff exact}")
      assert(exact.nonEmpty, s"degenerate eval: exact radius set empty at $d")
      val recall = ivf.size / exact.size.toDouble
      info(f"$d%-24s radius>=0.3  exact=${exact.size}%3d  ivf=${ivf.size}%3d  recall=$recall%.3f")
      assert(recall >= 0.5,
        f"IVF radius recall $recall%.3f below the 0.5 floor at $d — cell gate losing too much")
    }
  }
}
