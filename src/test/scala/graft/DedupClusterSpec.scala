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

  /** d14's reason to exist, pinned on a crafted corpus: the
    * doc-inside-doc (wrapper-page) pair has Jaccard ≈ |small|/|big|
    * below d1's threshold, so resemblance-only clustering (d4) keeps
    * both — d14's merged edge set must cluster them. The generated
    * testdata has no containment-only pairs (verified: every d13 pair
    * at sf0.01 is also a d1 pair), so this is constructed, not
    * sampled. Also gates the prefix-filter candidate scheme's recall
    * on exactly the adversarial shape the banded scheme missed:
    * containment 1, resemblance ~0.17. */
  test("d14 merges a containment-only wrapper pair that d4 leaves split") {
    val dir = java.nio.file.Files.createTempDirectory("d14case").toString
    val words = (0 until 60).map(i => s"w$i")
    val big = words.mkString(" ")                  // 58 shingles
    val small = words.take(12).mkString(" ")       // 10 shingles, all in big
    val other = (0 until 30).map(i => s"z$i").mkString(" ")
    Seq((1L, small, small.length.toLong), (2L, big, big.length.toLong),
        (3L, other, other.length.toLong))
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val d13 = graft.queries.DedupQueries.d13Containment(spark, dir)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(d13.contains((1L, 2L)),
      s"prefix filter missed the contained pair (got $d13)")

    val d1 = graft.queries.DedupQueries.d1MinhashLsh(spark, dir)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(!d1.contains((1L, 2L)), "pair visible to Jaccard — case not adversarial")

    val d14 = graft.queries.DedupQueries.d14FullDedup(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(d14(1L) == 1L && d14(2L) == 1L, s"wrapper pair not merged: $d14")
    assert(d14(3L) == 3L, s"unrelated doc absorbed: $d14")

    val d4 = graft.queries.DedupQueries.d4DedupClusters(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(d4(1L) != d4(2L), "d4 merged the pair — containment edge not needed?")
  }

  /** d15's reason to exist, pinned on crafted variants: the same
    * sentence reformatted (case flip, doubled whitespace, decomposed
    * Unicode é) is byte-distinct — l1's exact hash keeps all copies —
    * but canonicalizes to one key that d15 collapses. */
  test("d15 collapses case/whitespace/NFC variants that byte-exact dedup keeps") {
    val dir = java.nio.file.Files.createTempDirectory("d15case").toString
    val base = "the café on main street serves espresso"
    val caseFlip = "The Café on MAIN street serves espresso"
    val spaced = "the café  on main\tstreet  serves espresso "
    val decomposed = "the cafe\u0301 on main street serves espresso" // e + COMBINING ACUTE
    val other = "a completely different document"
    Seq((1L, base), (2L, caseFlip), (3L, spaced), (4L, decomposed), (5L, other))
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val l1 = graft.queries.LlmQueries.l1ExactDedup(spark, dir)
      .as[Long].collect().toSet
    assert(l1 == Set(1L, 2L, 3L, 4L, 5L), s"byte-exact should keep all five: $l1")

    val d15 = graft.queries.DedupQueries.d15NormalizedExact(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(d15 == Map(1L -> 4L, 5L -> 1L),
      s"variants must collapse to doc 1 with 4 copies: $d15")
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

  /** The dedup consumer family (d1/d4/d5/d7/d14) shares one pair
    * mining per CORPUS VERSION: since round 11 the verified pair
    * manifest is a fingerprint-keyed STORED artifact
    * (graft.core.ArtifactStore — the round-7 session persist still
    * re-ran the band join once per JVM), so every call's plan must be
    * a plain read of the stored parquet and the expensive mining must
    * not re-run (PersistLifecycleSpec pins the build counter; here the
    * plan shape is pinned structurally). */
  test("d1 pair mining is a stored artifact: every call's plan reads the mined parquet") {
    val dir = "/root/testdata/sf0.01"
    graft.queries.DedupQueries.d1MinhashLsh(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val second = graft.queries.DedupQueries.d1MinhashLsh(spark, dir)
    val p = second.queryExecution.executedPlan.toString
    assert(p.contains("d1_pairs_v1_"),
      "second d1 call does not read the stored pair manifest")
    assert(!p.contains("minhash16"),
      "second d1 call re-mines instead of reading the stored manifest")
  }
}
