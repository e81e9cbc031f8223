package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.reverse
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors
import graft.plans.GraftExtensions

/** The extension layer must inject SQL functions and the cosine fusion
  * rule into a session built with `withExtensions` (or
  * spark.sql.extensions on a cluster). */
class GraftExtensionsSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("GraftExtensionsSpec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    // do not leave the extensions session as the JVM default: later
    // suites' getOrCreate would silently inherit the injected rules
    // (the SparkContext itself stays alive for them to rebuild on)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    super.afterAll()
  }

  test("injected SQL functions resolve without manual registration") {
    assert(spark.sql("SELECT poly_hash('hello') AS h").collect().head.getLong(0) == 418513571L)
    assert(spark.sql("SELECT fnv1a32('') AS h").collect().head.getLong(0) == 2166136261L)
  }

  test("FuseCosineSimilarity rewrites the builtin spelling to the fused kernel") {
    import spark.implicits._
    // parquet-backed input: local relations get constant-folded away
    // before the plan is observable
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"embedding".as("a"), reverse($"embedding").as("b"))
    val builtin = df.select(Vectors.cosineBuiltin($"a", $"b").as("sim"))
    // the optimizer must have fused the three-array-fold spelling
    val optimized = builtin.queryExecution.optimizedPlan
    val fused = optimized.expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.CosineSimilarity]))
    assert(fused, s"no CosineSimilarity in optimized plan:\n$optimized")
    // and results are bit-identical to the direct fused expression
    val direct = df.select(Vectors.cosine($"a", $"b").as("sim"))
    assert(builtin.collect().map(_.getDouble(0)).toSeq ==
      direct.collect().map(_.getDouble(0)).toSeq)
  }

  private val rankLimitSql = """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM ext_orders) t
    WHERE rn <= 3"""

  test("RewriteRankLimitToTopK: the window spelling plans as the heap operator, rows unchanged") {
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("ext_orders")
    val q = spark.sql(rankLimitSql)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    val got = q.orderBy("o_custkey", "o_orderkey").collect().toSeq
    // same query with the rewrite disabled = the reference answer
    spark.conf.set("spark.graft.topk.autoRewrite", "false")
    try {
      val ref = spark.sql(rankLimitSql)
      assert(ref.queryExecution.executedPlan.toString.contains("Window"))
      assert(got == ref.orderBy("o_custkey", "o_orderkey").collect().toSeq)
    } finally spark.conf.unset("spark.graft.topk.autoRewrite")
  }

  test("the windowed escape hatch is never re-rewritten (opt-out marker honored)") {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // TopK.windowed is where perKey ROUTES high-group-cardinality
    // inputs; if the rule rewrote it back the routing would be defeated
    val planned = graft.plans.TopK.windowed(df, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc), k = 2)
    val plan = planned.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey"), plan.take(3000))
    assert(plan.contains("Window"), plan.take(3000))
  }

  test("global top-k (empty PARTITION BY) is never rewritten — the operator has no keys for it") {
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("ext_orders")
    val q = spark.sql("""
      SELECT o_orderkey FROM (
        SELECT o_orderkey, row_number() OVER (ORDER BY o_totalprice DESC) AS rn
        FROM ext_orders) t
      WHERE rn <= 5""")
    // must not crash at planning (ClusteredDistribution(Nil) is
    // forbidden) and must not plan the heap operator
    assert(!q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(q.count() == 5)
  }

  test("RewriteRankLimitToTopK stays conservative when the rank column survives") {
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("ext_orders")
    // rn is selected: the operator can't emit ranks, so the Window must stay
    val q = spark.sql("""
      SELECT o_custkey, rn FROM (
        SELECT o_custkey, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC) AS rn
        FROM ext_orders) t
      WHERE rn <= 3""")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey"), plan.take(3000))
    assert(q.count() > 0)
  }
}
