package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.reverse
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors
import graft.plans.GraftExtensions

/** The extension layer must inject SQL functions and the cosine fusion
  * rule into a session built with `withExtensions` (or
  * spark.sql.extensions on a cluster). */
class GraftExtensionsSpec extends AnyFunSuite {

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
}
