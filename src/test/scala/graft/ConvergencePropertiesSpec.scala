package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ReferenceOps

/** Property-based mirrors of the reference's convergence tests
  * (SURVEY §5 item 3), driven by ScalaCheck directly (the
  * scalatest-scalacheck bridge isn't in the offline cache):
  *  - test5 analogue: the timestamp-ordered merge (O11) is
  *    permutation-invariant and idempotent, including ts collisions
  *    (reference is last-writer-wins there; engine pins arg-min);
  *  - O9 analogue: dedup is idempotent under duplicated delivery;
  *  - test_MP4 analogue: chunked (streaming-shaped) aggregation equals
  *    the batch aggregate regardless of how the input is chunked.
  */
class ConvergencePropertiesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val appendGen: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, for {
      ts <- Gen.choose(0L, 15L) // small range forces collisions
      id <- Gen.choose(0L, 100L)
      payload <- Gen.alphaStr.map(_.take(6))
    } yield (ts, id, payload))
  } yield rows

  /** Run a ScalaCheck property with a fixed seed and few-but-real cases
    * (each case spins Spark jobs, so 15 cases ≈ plenty). */
  private def check(prop: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(15)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private def merge(rows: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] =
    ReferenceOps.tsOrderedMerge("ts", Seq(col("id"), col("payload")))(
      rows.toDF("ts", "id", "payload"))
      .as[(Long, Long, String)].collect().toSeq

  test("O11 merge is permutation-invariant (test5 analogue)") {
    val rnd = new scala.util.Random(7)
    check(Prop.forAll(appendGen) { rows =>
      merge(rows) == merge(rnd.shuffle(rows))
    })
  }

  test("O11 merge is idempotent and dedups replica union (test5 analogue)") {
    check(Prop.forAll(appendGen) { rows =>
      val once = merge(rows)
      // replicas hold overlapping buffers: union must converge to the same state
      val replicaUnion = rows ++ rows.take(rows.size / 2)
      merge(once) == once && merge(replicaUnion) == once
    })
  }

  test("O9 dedup is idempotent under re-delivery (at-least-once upstream)") {
    def dedup(rows: Seq[(Long, Long, String)]) =
      ReferenceOps.dedupFirst(Seq("ts"), Seq(col("id"), col("payload")))(
        rows.toDF("ts", "id", "payload"))
        .orderBy("ts", "id").as[(Long, Long, String)].collect().toSeq
    check(Prop.forAll(appendGen) { rows =>
      dedup(rows) == dedup(rows ++ rows)
    })
  }

  test("chunked aggregation equals batch aggregate for any chunking (test_MP4 analogue)") {
    check(Prop.forAll(appendGen, Gen.choose(1, 5)) { (rows, nChunks) =>
      rows.isEmpty || {
        val batch = rows.toDF("ts", "id", "payload")
          .groupBy("id").count().orderBy("id")
          .as[(Long, Long)].collect().toSeq
        // partial per-chunk counts merged by a second aggregation —
        // the reference's per-batch partial map + leader fold (O7+O8)
        val chunks = rows.grouped(math.max(1, rows.size / nChunks)).toSeq
        val partials = chunks.map(c =>
          c.toDF("ts", "id", "payload").groupBy("id").count())
        val merged = partials.reduce(_ union _)
          .groupBy("id").agg(org.apache.spark.sql.functions.sum("count").as("count"))
          .orderBy("id").as[(Long, Long)].collect().toSeq
        merged == batch
      }
    })
  }
}
