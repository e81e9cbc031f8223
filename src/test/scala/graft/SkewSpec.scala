package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salting

/** The skew story, exercised instead of asserted (PLANS.md's "AQE
  * handles skew at runtime" + Salting's rewrite):
  *
  *  1. on a planted zipfian-head join (one key owns ~25 % of the fact
  *     side) AQE's OptimizeSkewedJoin actually FIRES — the executed
  *     plan carries a skew-marked sort-merge join — once the shuffle
  *     stats make the hot partition visible;
  *  2. with the split active, the skewed join's wall time stays within
  *     a small envelope of the identical join on uniform data (the hot
  *     partition no longer serializes the stage);
  *  3. Salting.saltedJoin — the explicit rewrite for paths AQE can't
  *     see — is row-equal to the plain inner join on the same data.
  *
  * Thresholds here are scaled to test-sized data (a few MB of shuffle):
  * the DEFAULT 256 MB skewedPartitionThreshold exists to ignore skew
  * this small, so the spec lowers it proportionally; the mechanism and
  * plan shape are exactly what a 100 TB hot-user join hits with the
  * defaults.
  */
class SkewSpec extends AnyFunSuite with SparkSuite {

  /** `frac`% of rows on hot key 0, the rest spread over `keys` uniform
    * keys 1..keys — generated distributed and deterministically (no
    * rand(), same data every run/retry). */
  private def fact(n: Long, hotPct: Int, keys: Int): DataFrame =
    spark.range(n).select(
      when(pmod(col("id"), lit(100)) < lit(hotPct), lit(0L))
        .otherwise(pmod(hash(col("id")), lit(keys)).cast("long") + 1L).as("k"),
      col("id").as("rid"),
      // hash-derived payload: lz4 on the shuffle wire can't collapse it,
      // so MapStatus sizes reflect the real row volume (a cycling value
      // compresses ~20x and hides the hot partition from the threshold)
      (hash(col("id")).cast("double") / 7.0).as("v"))

  private def dim(keys: Int): DataFrame =
    spark.range(keys + 1).select(
      col("id").as("d_k"),
      concat(lit("payload_"), col("id")).as("d_payload"))

  private val skewConfs = Seq(
    // enough reducers that the uniform keys spread thin and the hot
    // key's partition stands out against the median
    "spark.sql.shuffle.partitions" -> "64",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    // defaults are 256 MB / 64 MB — scaled ~4000x down to match the
    // test corpus (post-compression shuffle bytes), same 4:1 ratio
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k")

  /** The x2-shape join: fact shuffles on the hot key; dim is hinted to
    * a sort-merge join (at scale: a dim that outgrew the broadcast
    * threshold), then reduced to one row so collect() is cheap but the
    * join still materializes every matched row. */
  private def joinShape(f: DataFrame, d: DataFrame): DataFrame =
    f.join(d.hint("merge"), f("k") === d("d_k"))
      // rid kept in the aggregate so the fact shuffle carries the full
      // 24-byte row, not a pruned 16-byte one
      .select(sum(col("v")).as("s"), sum(col("rid")).as("r"), count(lit(1)).as("n"))

  test("AQE skew-split fires on a planted zipfian-head join") {
    withConfs(skewConfs: _*) {
      val q = joinShape(fact(600000L, 30, 200), dim(200))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-marked SortMergeJoin in the final adaptive plan:\n$plan")
    }
  }

  test("skewed join wall time stays within the uniform envelope under AQE") {
    withConfs(skewConfs: _*) {
      def timed(f: DataFrame): Double = {
        val t0 = System.nanoTime()
        joinShape(f, dim(200)).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val n = 600000L
      timed(fact(n, 0, 200)) // untimed: JIT + codegen for the shape
      // INTERLEAVED passes (u,s,u,s,u,s), min per arm: when the whole
      // suite (or a co-tenant) competes for the cores, a CPU burst
      // lands inside one interleaving slot, not on one whole arm —
      // back-to-back arms made this flake under `sbt test`'s
      // suite-level parallelism
      val pairs = (1 to 3).map { _ =>
        (timed(fact(n, 0, 200)), timed(fact(n, 30, 200)))
      }
      val uniform = pairs.map(_._1).min
      val skewed = pairs.map(_._2).min
      // envelope: 2x per the plan-audit claim, plus a 1 s absolute
      // floor so scheduler jitter on a sub-second join can't flake it
      // (an unsplit 30 %-hot partition costs ~27x the median reducer,
      // far outside either bound)
      assert(skewed <= math.max(2.0 * uniform, uniform + 1.0),
        f"skewed $skewed%.2f s vs uniform $uniform%.2f s — hot partition is serializing the join")
    }
  }

  test("saltedJoin is row-equal to the plain inner join on zipfian data") {
    val f = fact(50000L, 25, 50)
    val d = dim(50)
    val plain = f.join(d, f("k") === d("d_k"))
      .select("k", "rid", "v", "d_k", "d_payload")
    val salted = Salting.saltedJoin(f, d, "k", "d_k", n = 16, saltBy = Seq("rid"))
      .select("k", "rid", "v", "d_k", "d_payload")
    val l = plain.collect().map(_.toString).sorted
    val r = salted.collect().map(_.toString).sorted
    assert(l.length == r.length && l.sameElements(r))
  }

  test("salted aggregation equals direct aggregation on zipfian data") {
    val f = fact(50000L, 25, 50)
    val direct = f.groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy("k").collect().map(_.toString)
    val salted = Salting.saltedGroupCount(Seq("k"), saltBy = Seq("rid"))(f)
      .orderBy("k").collect().map(_.toString)
    assert(direct.sameElements(salted))
  }
}
