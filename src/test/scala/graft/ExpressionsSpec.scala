package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fnv1a32, GraftFunctions, PolyHash, TextPrimitives, Vectors}

/** The codegen expressions must be bit-identical to their portable SQL
  * spellings (that's what makes the DuckDB oracle valid for queries that
  * use them) — pinned here over random inputs, plus known-answer tests
  * for FNV-1a against the published test vectors. */
class ExpressionsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("PolyHash == builtin aggregate spelling on random strings") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(1)
    val strs = Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(50)).mkString) :+ "" :+ "a"
    val df = strs.toDF("s").selectExpr(
      "poly_hash(s) AS fast",
      TextPrimitives.rollingHashSparkBuiltin("s") + " AS ref")
    assert(df.filter($"fast" =!= $"ref").count() == 0)
  }

  test("PolyHash object == expression eval") {
    assert(PolyHash.hash("hello") == 418513571L) // pinned by the DuckDB probe
  }

  test("CosineSimilarity == builtin composition on random float vectors") {
    val rnd = new scala.util.Random(2)
    val vecs = Seq.fill(100)(
      (Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b").select(
      Vectors.cosine($"a", $"b").as("fast"),
      Vectors.cosineBuiltin($"a", $"b").as("ref"))
    // bit-identical, not just close: same fold order by construction
    assert(df.filter($"fast" =!= $"ref").count() == 0)
  }

  test("Fnv1a32 matches published FNV-1a 32-bit test vectors") {
    val got = Seq("", "a", "foobar").toDF("s")
      .select(Fnv1a32($"s").as("h")).as[Long].collect().toSeq
    assert(got == Seq(2166136261L, 3826002220L, 3214735720L))
  }

  test("SimHash30 majority-bit semantics") {
    GraftFunctions.register(spark)
    // features: two of three share bits {0,2}; majority keeps exactly those
    val got = Seq(Seq(5L, 5L, 2L)).toDF("ids")
      .selectExpr("simhash30(ids) AS s").as[Long].head()
    assert(got == 5L)
    // empty array -> no majorities -> 0
    val empty = Seq(Seq.empty[Long]).toDF("ids")
      .selectExpr("simhash30(ids) AS s").as[Long].head()
    assert(empty == 0L)
  }

  test("s2 ANN recall: LSH bucket top-5 ⊆ corpus, exact top-5 overlap measured") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.queries.LlmQueries.l3CosineTopk(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val approx = graft.queries.AnnQueries.s2AnnLsh(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.size == 5)
    // 8 hyperplanes at 64-dim: same-bucket recall of true top-5 is
    // data-dependent; require the approximate answer to find at least
    // one true neighbor and log the overlap for the record.
    info(s"s2 recall@5 = ${(exact & approx).size}/5")
    assert((exact & approx).nonEmpty)
  }
}
