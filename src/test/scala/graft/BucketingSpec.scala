package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.sources.Bucketing

/** Bucketed tables must co-locate: the join of two same-bucketed tables
  * contains no Exchange (shuffle) operator at all. */
class BucketingSpec extends AnyFunSuite with SparkSuite {

  test("join of two same-bucketed tables is shuffle-free") {
    val dir = "/root/testdata/sf0.001"
    // disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.load(spark, dir, "orders"), "orders_b", "o_custkey")
      Bucketing.writeBucketed(
        Tables.load(spark, dir, "customer")
          .withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey")
      val joined = Bucketing.cojoin(spark, "orders_b", "customer_b", "o_custkey")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: Exchange => e
      }
      assert(exchanges.isEmpty,
        s"expected shuffle-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == Tables.load(spark, dir, "orders").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
