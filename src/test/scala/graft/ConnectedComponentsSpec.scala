package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.ConnectedComponents

/** The large-star/small-star connected-components operator: correct
  * labels (vs an in-test union-find oracle) on random graphs, and the
  * logarithmic round bound on a deep chain — the regime where plain
  * min-label flooding needs O(diameter) rounds and the old d4 cap of
  * 20 would have tripped. */
class ConnectedComponentsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  private def cc(n: Long, edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val nodes = spark.range(n).toDF("id")
    val e = edges.toDF("a", "b")
    val (labels, rounds) = ConnectedComponents.runCountingRounds(nodes, e)
    (labels.as[(Long, Long)].collect().toMap, rounds)
  }

  test("deep chain (diameter 59) converges in O(log d) rounds, all one cluster") {
    val n = 60L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val (labels, rounds) = cc(n, chain)
    assert(labels.size == 60 && labels.values.forall(_ == 0L),
      s"chain must collapse to cluster 0, got ${labels.values.toSet}")
    // flooding needs 59 rounds; the star rounds must be logarithmic
    assert(rounds <= 12, s"expected O(log d) rounds on a 59-diameter chain, took $rounds")
  }

  test("empty edge set: every node is its own singleton cluster") {
    val (labels, rounds) = cc(5, Seq.empty)
    assert(labels == (0L until 5L).map(i => i -> i).toMap)
    assert(rounds == 0)
  }

  test("self-loops, duplicate and reversed edges are tolerated") {
    val (labels, _) = cc(6, Seq((1L, 1L), (2L, 3L), (3L, 2L), (2L, 3L), (5L, 4L)))
    assert(labels == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 4L, 5L -> 4L))
  }

  test("random graphs match union-find (components, minima, singletons)") {
    val genEdges = for {
      n <- Gen.choose(1, 24)
      m <- Gen.choose(0, 30)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L)
        b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
    } yield (n.toLong, edges)
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, Prop.forAll(genEdges) { case (n, edges) =>
      val (labels, _) = cc(n, edges)
      labels == unionFind(n, edges.filter(e => e._1 != e._2))
    })
    assert(res.passed, res.status.toString)
  }

  test("reliable checkpoint mode: blocks survive unpersist, CC loop still converges") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      // the reliable path must write a real checkpoint file and keep the
      // data readable AFTER unpersist (that is what survives executor
      // loss on a cluster; a local checkpoint dies with its blocks)
      val (out, rdd) = org.apache.spark.sql.GraftShims
        .checkpointReleasable(spark.range(100).toDF("id"))
      assert(rdd.getCheckpointFile.isDefined, "expected a reliable checkpoint file")
      rdd.unpersist(blocking = true)
      assert(out.count() == 100L)
      // and the full CC loop under the knob yields the same labels
      val (labels, _) = cc(6, Seq((0L, 1L), (1L, 2L), (4L, 5L)))
      assert(labels == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L, 5L -> 4L))
    } finally spark.conf.unset("spark.graft.checkpoint.reliable")
  }

  test("two chains joined by a bridge edge merge into one component") {
    // 0-1-...-9 and 20-21-...-29, bridge 9-20
    val c1 = (0L until 9L).map(i => (i, i + 1))
    val c2 = (20L until 29L).map(i => (i, i + 1))
    val (labels, _) = cc(30, c1 ++ c2 :+ (9L, 20L))
    (0L to 9L).foreach(i => assert(labels(i) == 0L))
    (20L to 29L).foreach(i => assert(labels(i) == 0L))
    (10L to 19L).foreach(i => assert(labels(i) == i))
  }
}
