package graft

import org.scalatest.funsuite.AnyFunSuite

/** d4's clustering contract: pair-connected documents share one
  * cluster (transitively — A~B and B~C cluster together even when the
  * pair miner never emitted A~C), cluster ids are component minima
  * (l1's keep-first survivor rule), and untouched documents are
  * singletons labelled by themselves. */
class DedupClusterSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("d4 clusters close d1's pairs transitively; ids are component minima") {
    val dir = "/root/testdata/sf0.01"
    val cluster = graft.queries.DedupQueries.d4DedupClusters(spark, dir)
      .as[(Long, Long)].collect().toMap
    val pairs = graft.queries.DedupQueries.d1MinhashLsh(spark, dir)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSeq
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // cluster id = min member id
    cluster.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"cluster $c is not its min member")
    }
    // reference transitive closure computed independently (union-find)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    cluster.foreach { case (id, c) =>
      val expected = if (parent.contains(id)) find(id) else id
      assert(c == expected, s"doc $id: cluster $c != union-find $expected")
    }
  }

  /** d8's claims, MEASURED (the s5 practice: a documented rate is a
    * test, not a comment): at the production threshold the background
    * corpus loses nothing (no false-positive removals), and planted
    * twins are removed at cluster-bound recall — a twin quantized away
    * from its base is invisible by design, so recall is asserted high
    * but not perfect. Measured at sf0.01: 47/50 twins removed (0.94);
    * the 3 misses are twins assigned to a different cluster. */
  test("d8 removes only planted twins, at cluster-bound recall >= 0.9") {
    val dir = "/root/testdata/sf0.01"
    val survivors = graft.queries.AnnQueries.d8SemanticDedup(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val base = graft.core.Tables.load(spark, dir, "embeddings")
      .select("vec_id").as[Long].collect().toSet
    val twins = base.filter(_ % 10 == 0).map(_ + 1000000L)
    val removed = (base ++ twins) -- survivors
    assert(removed.nonEmpty)
    assert(removed.forall(twins.contains),
      s"non-twin vectors removed: ${(removed -- twins).take(5)}")
    val recall = removed.size.toDouble / twins.size
    assert(recall >= 0.9, s"twin recall $recall (${removed.size}/${twins.size})")
  }
}
