package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Runtime bloom-filter join pruning (SPARK-32268), exercised instead
  * of assumed: when a shuffle join's build side carries a selective
  * filter, Catalyst's InjectRuntimeFilter plants a bloom-filter
  * aggregate on the build side and a `might_contain` probe on the
  * PROBE side's scan — at 100 TB this is the difference between
  * shuffling the full fact table and shuffling only the rows that can
  * possibly match the filtered dimension. (Broadcast joins don't need
  * it — the dim itself prunes at the join; this is the mechanism for
  * the dim that outgrew the broadcast threshold.)
  *
  * Thresholds are scaled to test-sized inputs: the application-side
  * scan-size gate defaults to 10 GB precisely so joins this small skip
  * the filter; the mechanism asserted here is what fires with the
  * DEFAULTS on a 100 TB fact scan.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkSuite {

  test("selective build side injects a bloom-filter probe into the fact scan") {
    val dir = "/root/testdata/sf0.01"
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // 10 GB default exists to skip test-sized joins; 0 = always eligible
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "32MB",
      // force a shuffle join: broadcast joins prune at the join itself
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val orders = Tables.load(spark, dir, "orders")
      val customer = Tables.load(spark, dir, "customer")
        .filter("c_acctbal < 0") // selective: ~9% of customers
      val joined = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_acctbal")

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom-filter probe (might_contain) on the fact side:\n$optimized")

      // and the filter is transparent: row-identical to the same join
      // with injection disabled
      val expected =
        withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
          orders.join(customer, orders("o_custkey") === customer("c_custkey"))
            .select("o_orderkey", "c_custkey", "c_acctbal")
            .collect().map(_.toString).sorted
        }
      val got = joined.collect().map(_.toString).sorted
      assert(got.length == expected.length && got.sameElements(expected))
    }
  }
}
