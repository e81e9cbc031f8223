package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Regression CANARY for the Spark 4.1.2 Catalyst defect d16 works
  * around (`DedupQueries.scala`, d16 doc): wrapping the persisted pair
  * view — whose analyzed plan already carries the `ids` CTE chain — in
  * ANOTHER `spark.sql` WITH trips the optimizer's CTE-pushdown
  * bookkeeping (`PushdownPredicatesAndPruneColumnsForCTEDef` throws
  * `key not found: <defId>`), which is why d16 composes its outer
  * layer with DataFrame joins instead of the WITH spelling every other
  * query family uses.
  *
  * This spec asserts the broken spelling STILL throws. When a Spark
  * upgrade fixes the rule, this test starts failing — that's the
  * signal to retire the workaround and restore the WITH spelling (do
  * both: flip d16, then delete this spec). Inverted-assertion canaries
  * are how a workaround gets un-written instead of fossilizing. */
class CteWorkaroundCanarySpec extends AnyFunSuite with graft.SparkSuite {

  test("WITH-wrapping the persisted pair view still trips CTE pushdown (else retire the d16 workaround)") {
    val dir = "/root/testdata/sf0.001"
    val pairs = DedupQueries.resemblancePairs(spark, dir)
    pairs.createOrReplaceTempView("canary_pairs")
    // the spelling d16 WOULD use were the rule healthy: one more WITH
    // layer over the persisted view + the shared minhash CTE
    val ex = intercept[Throwable] {
      spark.sql(
        """WITH s AS (SELECT doc_id, minhash16(ids) AS mh FROM ids)
          SELECT p.doc_id_a, p.doc_id_b, sa.mh AS mha, sb.mh AS mhb, p.jac
          FROM canary_pairs p
          JOIN s sa ON sa.doc_id = p.doc_id_a
          JOIN s sb ON sb.doc_id = p.doc_id_b""").collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("key not found"),
      s"the WITH spelling no longer throws the CTE-pushdown defect — " +
        s"Spark fixed it: retire d16's DataFrame-join workaround and delete this canary. " +
        s"(got: ${ex.getClass.getName}: ${msg.take(300)})")
  }
}
