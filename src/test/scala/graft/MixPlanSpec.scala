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
    rows.foreach { r =>
      assert(r.getLong(4) <= 1000000L)
      assert(r.getLong(5) <= r.getLong(2), "expected exceeds available")
    }
    // per-source fidelity (the sound version of a global lower bound,
    // which is FALSE whenever the clamp binds — clamped surplus is by
    // design not redistributed): a clamped source keeps everything;
    // an unclamped source's expected tokens sit within floor slack of
    // its temperature share B·w/W
    val weights = rows.map(_.getLong(3))
    val wsum = weights.sum.toDouble
    rows.foreach { r =>
      val (a, w, rate, exp) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      if (rate == 1000000L) assert(exp == a, s"clamped source must keep all: $exp vs $a")
      else {
        val share = budget.toDouble * w / wsum
        // two floors: the rate quantum loses ≤ A/1e6 tokens, the
        // expected floor ≤ 1 more
        assert(math.abs(exp - share) <= a / 1e6 + 2,
          f"${r.getString(0)} expected $exp vs share $share%.1f (avail $a)")
      }
    }
    // anti-monotone where unclamped AND materially different in size —
    // the weight_milli floor can legitimately invert rates between
    // near-equal availabilities (a ≤1-milli weight loss outweighs the
    // <0.5% true rate gap), so only assert across a ≥1% size gap
    val unclamped = rows.filter(_.getLong(4) < 1000000L)
      .map(r => (r.getLong(2), r.getLong(4))).sortBy(_._1)
    for {
      (a1, r1) <- unclamped
      (a2, r2) <- unclamped
      if a2 >= (a1 * 1.01).toLong && a1 >= 1000
    } assert(r2 <= r1,
      s"temperature direction violated: avail $a1->$a2 but rate $r1->$r2")
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
