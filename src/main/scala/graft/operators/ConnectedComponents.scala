package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating '''large-star /
  * small-star''' rounds (Kiveris, Lattanzi, Mirrokni, Rastogi,
  * Vassilvitskii — "Connected Components in MapReduce and Beyond",
  * ACM SoCC 2014): each round rewires edges toward the component
  * minimum, converging in O(log² n) rounds — O(log d) observed —
  * instead of the O(diameter) rounds plain min-label flooding needs.
  * On a 100 TB dedup graph a long chain of pairwise near-dups (common
  * with templated / boilerplate documents) has diameter in the
  * thousands; round count is the number of full shuffles, so this is
  * the difference between ~12 shuffles and ~2000.
  *
  * Edge set is kept canonical — `(hi, lo)` with `hi > lo`, distinct —
  * and both operations are one groupBy-min plus one equi-join over it:
  *
  *  - '''large-star''' (per node u): connect every strictly-larger
  *    neighbor v to m(u) = min(Γ(u) ∪ {u});
  *  - '''small-star''' (per node u): connect every smaller neighbor —
  *    and u itself — to the minimum of those neighbors.
  *
  * Both preserve the component partition (SoCC'14 §3, Lemmas 1–2); the
  * terminal state is a star forest whose centers are the component
  * minima. Termination is tested STRUCTURALLY (star-forest check:
  * member and center node sets disjoint, one center per member) — the
  * exact postcondition the label read-out relies on — rather than an
  * edge-set-equality fixpoint test, so a bug can stall the loop but
  * never mislabel silently.
  *
  * Storage: every round's edge set is materialized through
  * [[GraftShims.checkpointReleasable]] (lineage-truncated, like
  * `localCheckpoint`) and the superseded round is unpersisted as soon
  * as its successor is on disk — peak footprint is two edge snapshots,
  * not rounds·snapshots. Only the final (node → cluster) snapshot
  * stays persisted: it IS the returned data.
  *
  * Fault tolerance: by default the per-round snapshots are LOCAL
  * checkpoints — executor loss mid-loop loses blocks and fails the
  * run (acceptable where the loop is simply rerun). Long cluster runs
  * with expected executor churn should set
  * `spark.graft.checkpoint.reliable=true` + `setCheckpointDir` so each
  * round also lands on fault-tolerant storage — see the trade-off note
  * on [[GraftShims.checkpointReleasable]].
  */
object ConnectedComponents {

  /** One large-star round over the canonical (hi, lo) edge set.
    * Output stays canonical: emitted edges are (v, m(u)) with
    * v > u ≥ m(u). */
  private[graft] def largeStar(edges: DataFrame): DataFrame = {
    val nb = edges.select(col("hi").as("u"), col("lo").as("v"))
      .union(edges.select(col("lo").as("u"), col("hi").as("v")))
    val m = nb.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    nb.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("hi"), col("m").as("lo"))
      .distinct()
  }

  /** One small-star round. In canonical form each node u's SMALLER
    * neighbors are exactly the `lo` values of its `hi = u` edges, so no
    * symmetric view is needed: m(u) = min of them, emit (v, m(u)) for
    * each plus (u, m(u)), dropping the center's self-loop. */
  private[graft] def smallStar(edges: DataFrame): DataFrame = {
    val m = edges.groupBy("hi").agg(min(col("lo")).as("m"))
    edges.join(m, "hi")
      .select(col("lo").as("a"), col("m").as("b"))
      .union(m.select(col("hi").as("a"), col("m").as("b")))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("hi"), least(col("a"), col("b")).as("lo"))
      .distinct()
  }

  /** Terminal-state test: a star forest centered at component minima —
    * no node is both a member (`hi`) and a center (`lo`), and every
    * member has exactly one center. Canonical orientation then makes
    * each center the minimum of its star. Fused into ONE aggregation
    * job (the loop runs this every round, and a Spark action's fixed
    * cost is the round tax): tag each endpoint role, count roles per
    * node, and look for any node that is both member and center or a
    * member twice. */
  private[graft] def isStarForest(edges: DataFrame): Boolean =
    edges.select(col("hi").as("n"), lit(1L).as("asHi"), lit(0L).as("asLo"))
      .union(edges.select(col("lo").as("n"), lit(0L).as("asHi"), lit(1L).as("asLo")))
      .groupBy("n")
      .agg(sum(col("asHi")).as("hiCnt"), sum(col("asLo")).as("loCnt"))
      .filter((col("hiCnt") > 0 && col("loCnt") > 0) || col("hiCnt") > 1)
      .isEmpty

  /** Connected components of `edges` over the node universe `nodes`:
    * returns `(id, cluster)` for EVERY node (singletons label
    * themselves), cluster = minimum node id of the component — the
    * keep-first survivor rule dedup pipelines want.
    *
    * @param nodes single-column DataFrame of node ids
    * @param edges two-column DataFrame of undirected edges (any
    *              orientation, self-loops and duplicates tolerated)
    */
  def run(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 50): DataFrame =
    runCountingRounds(nodes, edges, maxRounds)._1

  /** [[run]] plus the number of star rounds taken — exposed so tests
    * can assert the logarithmic round bound on deep chains. */
  private[graft] def runCountingRounds(nodes: DataFrame, edges: DataFrame,
                                       maxRounds: Int = 50): (DataFrame, Int) = {
    val canon = edges.toDF("a", "b")
      .select(greatest(col("a"), col("b")).as("hi"), least(col("a"), col("b")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
    var (cur, curRdd) = GraftShims.checkpointReleasable(canon)
    var rounds = 0
    // the finally releases whatever round is current — without it a
    // non-convergence require() or a mid-round failure would pin the
    // last round's blocks for the rest of the session
    try {
      var done = isStarForest(cur)
      while (!done && rounds < maxRounds) {
        val (next, nextRdd) = GraftShims.checkpointReleasable(smallStar(largeStar(cur)))
        curRdd.unpersist(blocking = false)
        cur = next
        curRdd = nextRdd
        rounds += 1
        done = isStarForest(cur)
      }
      require(done, s"connected components did not reach a star forest in $rounds rounds")
      val labels = nodes.toDF("id")
        .join(cur.select(col("hi").as("id"), col("lo").as("cl")), Seq("id"), "left")
        .groupBy("id")
        .agg(min(coalesce(col("cl"), col("id"))).as("cluster"))
      // the result snapshot IS the returned data and stays pinned — the
      // one deliberate residual (|nodes| rows); callers that loop over
      // many graphs should consume and release it promptly
      val (result, _) = GraftShims.checkpointReleasable(labels)
      (result, rounds)
    } finally {
      curRdd.unpersist(blocking = false)
    }
  }
}
