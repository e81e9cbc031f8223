package graft

import org.scalatest.funsuite.AnyFunSuite

/** Solver invariants for l25/l26 the oracle hash can't express on its
  * own (the hash pins agreement, not CORRECTNESS of the plan):
  *
  *  - budget conservation: Σ expected_tokens never exceeds the B =
  *    ⌊Σ available / 2⌋ target (floor rounding only loses);
  *  - temperature direction: unclamped rates are anti-monotone in
  *    source size — the whole point of T=2 is upsampling the tail, so
  *    a SMALLER source never gets a lower rate than a bigger one;
  *  - clamping: every rate ≤ 1e6, and expected ≤ available;
  *  - execution fidelity: l26's realized per-source keep fraction
  *    tracks rate_micro (hash-uniformity tolerance), and the kept set
  *    is a deterministic function of doc_id (re-run → identical). */
class MixPlanSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  test("l25 plan conserves the budget, upsamples the tail, and clamps sanely") {
    val rows = graft.queries.LlmQueries.l25MixPlan(spark, dir).collect()
    assert(rows.nonEmpty)
    val avail = rows.map(_.getLong(2))
    val rates = rows.map(_.getLong(4))
    val expected = rows.map(_.getLong(5))
    val budget = avail.sum / 2
    assert(expected.sum <= budget,
      s"plan overspends: ${expected.sum} > budget $budget")
    // floor-rounding slack is bounded: within one token per source +
    // one per rate quantum
    assert(expected.sum >= budget - rows.length * 2 - budget / 100000,
      s"plan underspends implausibly: ${expected.sum} vs $budget")
    rows.foreach { r =>
      assert(r.getLong(4) <= 1000000L)
      assert(r.getLong(5) <= r.getLong(2), "expected exceeds available")
    }
    // anti-monotone where unclamped: bigger source -> rate no higher
    val unclamped = rows.filter(_.getLong(4) < 1000000L)
      .map(r => (r.getLong(2), r.getLong(4))).sortBy(_._1)
    unclamped.sliding(2).foreach {
      case Array((a1, r1), (a2, r2)) =>
        if (a1 < a2) assert(r2 <= r1,
          s"temperature direction violated: avail $a1->$a2 but rate $r1->$r2")
      case _ =>
    }
  }

  test("l26 realizes the plan: per-source keep fraction tracks rate; rerun identical") {
    val plan = graft.queries.LlmQueries.l25MixPlan(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    val kept = graft.queries.LlmQueries.l26MixApply(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySource = kept.groupBy(_._1).map { case (s, xs) => s -> xs.length }
    plan.foreach { case (src, (nDocs, rate)) =>
      val got = bySource.getOrElse(src, 0).toDouble / nDocs
      val want = rate / 1e6
      // the hash coin is uniform but nDocs is ~250/source at sf0.01:
      // allow 4 sigma of binomial noise
      val sigma = math.sqrt(want * (1 - want) / nDocs)
      assert(math.abs(got - want) <= 4 * sigma + 0.02,
        f"$src keep fraction $got%.3f vs rate $want%.3f (n=$nDocs)")
    }
    val again = graft.queries.LlmQueries.l26MixApply(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(kept.sorted.toSeq == again.sorted.toSeq, "kept set not reproducible")
  }
}
