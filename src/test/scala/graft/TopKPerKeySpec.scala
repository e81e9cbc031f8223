package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.plans.TopK

/** The custom top-k-per-key operator must (a) plan as TopKPerKeyExec
  * with a Catalyst-inserted hash shuffle, (b) agree exactly with the
  * declarative row_number spelling, (c) never sort whole partitions. */
class TopKPerKeySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("TopK.perKey matches the window row_number spelling exactly") {
    val dir = "/root/testdata/sf0.01"
    val orders = Tables.load(spark, dir, "orders")
    val got = TopK.perKey(orders,
      Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
      .as[(Long, Long, Double)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == ref)
  }

  test("l20 priority sample over-represents high-weight documents (the bias IS the spec)") {
    // weight-proportional sampling must pull the sample's mean quality
    // ABOVE the corpus mean per source — a uniform sampler (l5's
    // regime) would match it in expectation. Deterministic data +
    // deterministic sampler ⇒ this is a fixed fact, not a flaky draw.
    val dir = "/root/testdata/sf0.01"
    val sample = graft.queries.LlmQueries.l20WeightedSample(spark, dir)
    val sMean = sample.agg(avg("score")).head().getDouble(0)
    val cMean = graft.queries.TextQueries.t2QualityScore(spark, dir)
      .agg(avg("score")).head().getDouble(0)
    assert(sMean > cMean,
      f"sample mean $sMean%.4f not above corpus mean $cMean%.4f — no weight bias")
  }

  test("plans as TopKPerKeyExec with a planner-inserted shuffle, no SortExec") {
    val dir = "/root/testdata/sf0.001"
    val df = TopK.perKey(Tables.load(spark, dir, "orders"),
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc), k = 2)
    // string match: AdaptiveSparkPlanExec hides its subtree from
    // exists/collect until execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Sort "), s"unexpected sort:\n$plan")
    // two-pass shape: the map-side partial pass sits BELOW the exchange
    // (hash-aggregate style), so the shuffle carries at most groups·k
    // rows per input partition, never the raw input
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.indexOf("TopKPerKeyPartial") > plan.indexOf("Exchange hashpartitioning"),
      s"partial pass must be below the exchange:\n$plan")
  }

  test("partial pass bounds what the shuffle carries to groups*k per partition") {
    // 10 input partitions × 100k rows each is 1M rows into the operator
    // with 4 groups and k=2: without the partial pass the exchange
    // would carry all 1M rows; with it, at most 10·4·2 = 80 survivors.
    // AQE off so the exchange node (and its write metric) is directly
    // visible on the executed plan.
    withConfs("spark.sql.adaptive.enabled" -> "false") {
      val df = spark.range(0, 1000000L, 1, 10)
        .selectExpr("id % 4 AS key", "id AS v")
      val topk = TopK.perKey(df, Seq(col("key")), Seq(col("v").desc), k = 2)
      assert(topk.count() == 8L)
      val carried = topk.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.metrics("shuffleRecordsWritten").value
      }
      assert(carried.nonEmpty, topk.queryExecution.executedPlan.toString)
      assert(carried.forall(_ <= 80L), s"shuffle carried $carried rows")
    }
  }

  test("property: TopK.perKey == window spelling on random data (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(0, 200)
      k <- Gen.choose(1, 4)
      rows <- Gen.listOfN(n, for {
        key <- Gen.choose(0, 10)
        v <- Gen.choose(-1000, 1000)
        id <- Gen.choose(0L, 10000L)
      } yield (key, v, id))
    } yield (rows, k)
    val params = SCTest.Parameters.default.withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(99L))
    val res = SCTest.check(params, Prop.forAll(gen) { case (rows, k) =>
      val df = rows.toDF("key", "v", "id")
      val got = TopK.perKey(df, Seq(col("key")),
        Seq(col("v").desc, col("id")), k)
        .orderBy("key", "v", "id").as[(Int, Int, Long)].collect().toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("key").orderBy(col("v").desc, col("id"))
      val ref = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .orderBy("key", "v", "id").as[(Int, Int, Long)].collect().toSeq
      got == ref
    })
    assert(res.passed, res.status.toString)
  }

  test("duplicate order values: keeps exactly k rows per key (heap, not rank ties)") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 2)).toDF("k", "v")
    val got = TopK.perKey(df, Seq(col("k")), Seq(col("v")), k = 2)
      .groupBy("k").count().orderBy("k").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 2L), ("b", 1L)))
  }

  test("groupsHint above threshold falls back to the spillable window plan") {
    // every row its own group: the heap operator's worst case (its map
    // would hold the whole input off the memory manager); the hint must
    // route planning to WindowExec, which sorts and spills instead
    // hint is TOTAL groups; the threshold is per partition — with the
    // session's shuffle partitions, 200k total ÷ parts must exceed 1000
    spark.conf.set(TopK.maxGroupsKey, "1000")
    try {
      val df = spark.range(200000L).selectExpr("id AS key", "id % 7 AS v")
      val planned = TopK.perKey(df, Seq(col("key")), Seq(col("v")), k = 1,
        groupsHint = Some(200000L))
      val plan = planned.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"), plan)
      assert(plan.contains("Window"), plan)
      // and it still computes: one row per group
      assert(planned.count() == 200000L)
    } finally spark.conf.unset(TopK.maxGroupsKey)
  }

  test("partial pass past the group cap degrades to pass-through, never wrong or OOM") {
    // 500 distinct keys per input partition with cap 300: every map
    // task hits the cap and forwards its tail unreduced; the final pass
    // (~31 groups per hash partition) stays under it — result must be
    // exactly the per-key minimum either way. (Not ONE input partition:
    // SinglePartition satisfies ClusteredDistribution, so no exchange
    // would separate the passes and the final cap would fire instead.)
    // AQE off so the final pass keeps all 32 hash partitions (~31
    // groups each); with coalescing it would collapse to one partition
    // and the FINAL cap would fire — which is that pass's correct,
    // separately-tested behavior, not what this test measures
    withConfs(TopK.maxGroupsKey -> "300",
        "spark.sql.adaptive.enabled" -> "false") {
      val df = spark.range(0, 2000L, 1, 4).selectExpr("id % 1000 AS key", "id AS v")
      val got = TopK.perKey(df, Seq(col("key")), Seq(col("v")), k = 1)
        .orderBy("key").as[(Long, Long)].collect().toSeq
      assert(got == (0L until 1000L).map(i => (i, i)))
    }
  }

  test("runtime guard: exceeding maxGroupsPerPartition fails fast with advice") {
    spark.conf.set(TopK.maxGroupsKey, "100")
    try {
      val df = spark.range(1000L).selectExpr("id AS key", "id AS v")
      val e = intercept[org.apache.spark.SparkException] {
        TopK.perKey(df, Seq(col("key")), Seq(col("v")), k = 1).count()
      }
      val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
      assert(msg.contains("TopK.windowed"), msg)
    } finally spark.conf.unset(TopK.maxGroupsKey)
  }

  test("runtime guard threshold honors the session conf (below cap passes)") {
    spark.conf.set(TopK.maxGroupsKey, "100")
    try {
      val df = spark.range(300L).selectExpr("id % 50 AS key", "id AS v")
      assert(TopK.perKey(df, Seq(col("key")), Seq(col("v")), k = 1).count() == 50L)
    } finally spark.conf.unset(TopK.maxGroupsKey)
  }
}
