package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Empirical backing for the 100 TB posture arguments: the dedup/ANN
  * suite's structural claims (banded equi-joins, broadcast probes,
  * candidate cost following data size) predict near-LINEAR wall-time in
  * corpus size. This measures the two-point curve sf0.01 → sf0.1 (10×
  * the rows) inside one session and asserts ≤1.5× super-linearity —
  * a quadratic regression (the thing the banding exists to avoid)
  * would show ~100× and fail loudly, while fixed per-query overheads
  * only ever push the measured ratio BELOW the data ratio, so the
  * bound is meaningful in exactly the direction that matters.
  *
  * Methodology per the timing-test lessons baked into Bench/SkewSpec:
  * an untimed JIT warmup pass at sf0.001 first (generated-class
  * compilation + C2 otherwise lands on the first timed arm), then two
  * INTERLEAVED passes over (query × sf) with min-per-cell — a co-tenant
  * CPU burst lands on one pass, not both — and caches released before
  * every timed run so no arm inherits another's materialization.
  *
  * WEATHER (round 15, VERDICT r14 #2): every timed arm stamps its OWN
  * /proc/stat steal delta (the Bench pattern) — a 3-s pre-flight probe
  * cannot protect a ~9-min arm, and round 14 closed red on a burst
  * that began minutes into the d13 sf10eq arm and outlasted both
  * interleaved passes. A hot arm (> [[armStealPctMax]] steal over its
  * own window) is DISCARDED and re-run; after [[armRetries]] hot
  * re-runs the test cancels loudly. A red here therefore really means
  * superlinear work: every number that reaches an assert was measured
  * on a quiet window.
  *
  * ENVELOPE PAIRING (VERDICT r14 #4, from the PLANS.md noise ladder):
  * quiet arms measure d13's decade-3 ratio at 8.8–9.2×; a 1.6 %-steal
  * window measured 15.5×; a true quadratic would be ~100×. The assert
  * stays at 15× BECAUSE arms above 1 % steal are rejected — the pair
  * (per-arm ≤ 1 %, envelope ≤ 15×) is one instrument: weather can no
  * longer reach the line, while a candidate blowup still clears it by
  * an order of magnitude. Moving either side means re-deriving the
  * other from the measured ladder. */
class ScalingCurveSpec extends AnyFunSuite with SparkSuite {

  private val small = "/root/testdata/sf0.01"
  private val big = "/root/testdata/sf0.1"

  /** Cumulative hypervisor steal ticks — the shared instrument
    * ([[graft.core.Weather]], ADVICE r15: one definition, not three
    * copies), -1 where unreadable. */
  private def stealTicks(): Long = graft.core.Weather.stealTicks()

  /** Accept an arm only below this steal share of its own window (see
    * the class doc's envelope pairing before changing it). */
  private val armStealPctMax = 1.0
  /** Hot re-runs allowed per arm before the test cancels. */
  private val armRetries = 2

  /** Time one arm under its own steal stamp. `prepare` (cache release)
    * runs untimed before EVERY attempt, so a retry never inherits the
    * discarded attempt's materialization; the accepted wall is the
    * first attempt whose window stayed quiet. Unreadable counters
    * accept the arm — no weather evidence either way, and the pre-15
    * behavior (no guard at all) is the honest fallback. `ticks` is
    * injectable because real steal cannot be planted from inside the
    * guest (in-guest load doesn't increment the hypervisor counter) —
    * the discard/retry/cancel contract is pinned by this spec's
    * instrument self-test with a scripted counter instead. */
  private def timedArm(label: String, prepare: () => Unit,
                       ticks: () => Long = () => stealTicks())(body: => Unit): Double = {
    val nCpu = Runtime.getRuntime.availableProcessors()
    var attempt = 0
    while (true) {
      prepare()
      val s0 = ticks()
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      val s1 = ticks()
      val d = if (s0 < 0 || s1 < 0) -1L else s1 - s0
      val pct = graft.core.Weather.stealPct(d, dt, nCpu)
      info(f"arm $label%-34s $dt%8.2f s   steal $d ticks ($pct%.2f%% of window)")
      if (pct <= armStealPctMax) return dt
      attempt += 1
      if (attempt > armRetries) cancel(
        f"$label: ${armRetries + 1} consecutive arms above $armStealPctMax%.1f%% steal " +
          f"(last $pct%.2f%%) — the wall-clock envelope would measure co-tenant " +
          "weather, not this engine; re-run on a quiet box")
      info(s"arm $label: hot window, measurement discarded (retry $attempt/$armRetries)")
    }
    throw new IllegalStateException("unreachable")
  }

  /** Cheap pre-flight early-out kept from round 13 (why start a long
    * run into a known-hot box?); the per-arm stamps above are what
    * actually protect the measurements. 32 hw threads × 100 Hz × 3 s
    * ≈ 9600 tick-capacity; >200 ticks ≈ 2 % stolen. */
  private def requireQuietBox(): Unit = {
    val s0 = stealTicks()
    if (s0 >= 0) {
      Thread.sleep(3000)
      val s1 = stealTicks()
      if (s1 >= 0) {
        val d = s1 - s0
        info(s"quiet-box probe: $d steal ticks in 3 s")
        assume(d <= 200,
          s"box is hot ($d steal ticks in 3 s > 200) — wall-clock envelope " +
            "would measure co-tenant weather, not this engine; re-run on a quiet box")
      }
    }
  }

  private def releaseCaches(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    // s12/l19/l22 (and the IVF consumers) memoize their trained
    // artifacts per session — drop them so every timed arm here runs
    // the REAL training, not a memo hit (the memo is the production
    // design; this spec measures the work)
    graft.queries.AnnQueries.clearTrainingMemo()
    graft.queries.LlmQueries.clearTrainingMemo()
    // ...and rotate the STORED-artifact dir (round 11: PQ codes, dedup
    // pair manifests, x73's base term) for the same reason — a timed
    // arm must pay the real build, not read a prior run's parquet
    spark.conf.set("spark.graft.artifacts.dir",
      java.nio.file.Files.createTempDirectory("scaling_art").toString)
  }

  /** Untimed run (JIT warmup): no stamp, no retry. */
  private def runPlain(fn: (SparkSession, String) => DataFrame, dir: String): Unit = {
    releaseCaches()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
  }

  /** One timed arm: cache release untimed per attempt, wall accepted
    * only from a quiet steal window (see [[timedArm]]). */
  private def runStamped(name: String, fn: (SparkSession, String) => DataFrame,
                         dir: String): Double =
    timedArm(s"$name @ ${new java.io.File(dir).getName}", () => releaseCaches()) {
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    }

  /** VERDICT r14 #2's "done" condition, made checkable without real
    * weather: a burst landing inside a timed arm's window must get the
    * measurement discarded and re-run on the next window, and a burst
    * outlasting every retry must CANCEL the test — never a red
    * assert. A scripted counter stands in for /proc/stat because
    * in-guest load cannot raise the hypervisor's steal counter. */
  test("arm harness: a hot window is discarded and re-run; sustained heat cancels, never fails") {
    // window 1 hot (10k ticks over ~10 ms: far above 1 %), window 2 quiet
    val script = Iterator(0L, 10000L, 10000L, 10000L)
    var runs = 0
    val dt = timedArm("selftest_burst", () => (), () => script.next()) {
      runs += 1; Thread.sleep(10)
    }
    assert(runs == 2, "the hot first window must be discarded and the arm re-run")
    assert(dt > 0.0)
    // every window hot: bounded retries, then a loud CANCEL (the board
    // shows skipped — check_close.sh warns — instead of a weather red)
    var calls = 0L
    var hotRuns = 0
    val ex = intercept[org.scalatest.exceptions.TestCanceledException] {
      timedArm("selftest_sustained", () => (), () => { calls += 100000L; calls }) {
        hotRuns += 1; Thread.sleep(5)
      }
    }
    assert(hotRuns == armRetries + 1, "cancel must come only after the bounded retries")
    assert(ex.getMessage.contains("steal"), s"cancel must name the weather: ${ex.getMessage}")
  }

  test("dedup/ANN suite scales near-linearly from sf0.01 to sf0.1 (10x rows)") {
    requireQuietBox()
    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "d1_minhash_lsh" -> (graft.queries.DedupQueries.d1MinhashLsh _),
      "d2_simhash" -> (graft.queries.DedupQueries.d2Simhash _),
      "d6_incremental_dedup" -> (graft.queries.DedupQueries.d6IncrementalDedup _),
      "s5_lsh_near_dup_prod" -> (graft.queries.AnnQueries.s5LshNearDupProd _),
      // the composed curation pipeline: every stage's posture claim
      // (ids-only edges, broadcast probe, per-shard window) must
      // compound to a linear curve, not just hold stage-by-stage
      "p3_curation_pipeline" -> (graft.queries.PipelineQueries.p3CurationPipeline _),
      // span dedup: the positional-gram explode is the largest row
      // expansion in the suite (~tokens per doc), and its cost claim —
      // follows corpus size, the duplicated-hash join side follows
      // overlap — is exactly a linearity claim
      "d9_span_dedup" -> (graft.queries.DedupQueries.d9SpanDedup _),
      // round-6 extensions: the newest 100 TB claims, measured instead
      // of argued structurally (VERDICT r5 task 3) —
      // d10: sketch build is a map-side pass + 128 KB broadcast; cost
      // must follow the probe scan, never the base key cardinality
      "d10_bloom_dedup" -> (graft.queries.DedupQueries.d10BloomDedup _),
      // d11: d9's shuffle grown to (id, pos, hash) — still
      // O(corpus tokens) rows by design, so the curve must stay linear
      "d11_span_mask" -> (graft.queries.DedupQueries.d11SpanMask _),
      // d12: the cut job — the one query where the wide text column
      // crosses a shuffle (once); linearity says that join follows
      // corpus bytes, not pair structure
      "d12_span_cut" -> (graft.queries.DedupQueries.d12SpanCut _),
      // s7: PQ encode is an argmin aggregate over broadcast
      // codebooks — per-vector work is constant (M x K x d/M
      // multiplies). Since round 9 the timed arm ALSO includes the
      // quantizer's fixed 10-round Lloyd training (releaseCaches
      // clears the memo so this spec measures real work; each round
      // is one scan, so the training term is itself linear in rows)
      "s7_ivf_pq" -> (graft.queries.AnnQueries.s7IvfPq _),
      // round-6 batch-2/3 heavies —
      // t9: the char_stats kernel walks every code point of the
      // corpus; its scan-speed claim is precisely wall ∝ corpus chars
      "t9_char_diversity" -> (graft.queries.TextQueries.t9CharDiversity _),
      // x54: the two-level prefix sum — the single-partition step must
      // stay bucket-sized, so wall must follow rows, not collapse
      // through one sorted partition (which would bend the curve)
      "x54_global_cumsum" -> (graft.queries.ExtendedRelationalQueries.x54GlobalCumsum _),
      // x58: three keyed aggregates + survivor joins; linearity says
      // funnel cost follows events, not users × events
      "x58_funnel" -> (graft.queries.ExtensionQueries.x58Funnel _),
      // s11: the full Lloyd step — per-vector work is constant
      // (K centroids × d), the exchange is labels × d; wall must
      // track vector count, not pairs
      "s11_kmeans_step" -> (graft.queries.AnnQueries.s11KmeansStep _),
      // p4: the composed release report — three keep gates + rollup
      // must compound to a linear curve like p3
      "p4_corpus_release" -> (graft.queries.PipelineQueries.p4CorpusRelease _),
      // round-7 additions —
      // d13: the prefix-filter containment join — candidates follow
      // the (prefix × posting) product, which the rarest-first order
      // keeps data-proportional, never all-pairs
      "d13_containment" -> (graft.queries.DedupQueries.d13Containment _),
      // d14: both pair miners + star-contraction composed; edges are
      // id-only so CC cost follows the pair count
      "d14_full_dedup" -> (graft.queries.DedupQueries.d14FullDedup _),
      // s12: per-ROUND cost is one scan (constant per-vector work);
      // total rounds are data-dependent (10 at sf0.01, 23 at sf0.1),
      // so the wall ratio carries a 2.3x round factor on top of the
      // row factor — still far inside the envelope, and the round
      // count is part of the measured claim
      "s12_kmeans_run" -> (graft.queries.AnnQueries.s12KmeansRun _),
      // round-8 additions —
      // t11: SymSpell candidates follow the (variant-bucket)² product;
      // on this bounded-entropy corpus the true pair count grows ~55×
      // on 10× docs, so a near-linear WALL curve shows the fixed
      // explode + hashed equi-join dominating — the quadratic term is
      // real output (2304 pairs at sf0.1), not planning
      "t11_fuzzy_join" -> (graft.queries.TextQueries.t11FuzzyJoin _),
      // l19: one corpus scan into the vocab table + 8 rounds of
      // vocab-sized work — wall must track the scan, and the round
      // count is FIXED by construction (unlike s12's data-dependent
      // rounds)
      "l19_bpe_train" -> (graft.queries.LlmQueries.l19BpeTrain _),
      // m11: a pure decode pass (one GIF encode+decode per doc, 5
      // scalars out) — the media suite's scan-speed claim, measured
      "m11_scene_cut" -> (graft.queries.MultimodalQueries.m11SceneCut _),
      // round-10: the broadcast-LM likelihood gate — corpus bigrams
      // against a reference-bounded broadcast table; wall must follow
      // the corpus scan (the model side grows with the 1/97 slice's
      // vocabulary, not the corpus)
      "l27_bigram_quality" -> (graft.queries.LlmQueries.l27BigramQuality _),
    )
    queries.foreach { case (_, fn) => runPlain(fn, "/root/testdata/sf0.001") } // JIT warmup, untimed

    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    for (_ <- 1 to 2; (name, fn) <- queries; dir <- Seq(small, big)) {
      val t = runStamped(name, fn, dir)
      val k = (name, dir)
      best(k) = math.min(best.getOrElse(k, Double.MaxValue), t)
    }
    queries.foreach { case (name, _) =>
      val ts = best((name, small))
      val tb = best((name, big))
      val ratio = tb / ts
      info(f"$name%-22s sf0.01 $ts%6.2f s -> sf0.1 $tb%6.2f s   wall ratio ${ratio}%5.2f (data 10x)")
      assert(ratio <= 15.0,
        f"$name wall-time grew ${ratio}%.1fx on 10x data — super-linear beyond the 1.5x envelope")
    }
  }

  /** The sf1-EQUIVALENT slice (10× the sf0.1 rows) — the
    * structure-preserving copy rules (token tags at Levenshtein ≥ 3,
    * dimension-rotated embeddings, order-key-only offsets) and their
    * derivations live with the shared builder in [[EqSlices]]. */
  private lazy val sf1eq: String = EqSlices.sf1eq(spark)

  /** The 100×-direction evidence the single-decade curve above cannot
    * give: the heaviest dedup/iterative lines measured on a SECOND
    * decade (sf0.1 → sf1-equivalent, 10× again), with the measured
    * scaling exponent reported per line. The envelope is the same
    * ≤ 15× wall on 10× data; a quadratic candidate blowup (the
    * all-pairs failure mode the banding/prefix-filter exists to
    * avoid) would show ~100×. s12's round count is data-dependent, so
    * its ratio carries a rounds factor on top of the row factor —
    * reported, and still far inside the envelope. */
  test("heavy dedup/iterative lines scale near-linearly on the second decade (sf0.1 -> sf1eq)") {
    requireQuietBox()
    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "d1_minhash_lsh" -> (graft.queries.DedupQueries.d1MinhashLsh _),
      "d13_containment" -> (graft.queries.DedupQueries.d13Containment _),
      "d14_full_dedup" -> (graft.queries.DedupQueries.d14FullDedup _),
      "s5_lsh_near_dup_prod" -> (graft.queries.AnnQueries.s5LshNearDupProd _),
      "s12_kmeans_run" -> (graft.queries.AnnQueries.s12KmeansRun _),
      // round-8: the new join modality and the heaviest new scan line.
      // t11's per-copy tags sit at Levenshtein ≥ 3 from each other
      // (copyTag), so cross-copy 16-char prefixes can never be within
      // the join's distance-2 bound — the quadratic term must track
      // per-copy structure, not corpus size² (round 12 proved the old
      // 1-edit tag violated exactly this). l22 trains over a 10×-vocab
      // word table then applies 8 fold layers per row — both stages
      // must follow corpus size.
      "t11_fuzzy_join" -> (graft.queries.TextQueries.t11FuzzyJoin _),
      "l22_bpe_apply" -> (graft.queries.LlmQueries.l22BpeApply _),
      // round-10: the PQ encode arm (s16's eval made it a first-class
      // artifact) — per-vector work is constant (M×K×d/M multiplies
      // into an argmin aggregate over broadcast codebooks), and the
      // timed arm includes the cleared-memo 10-round Lloyd training,
      // itself one scan per round — so the composed wall must stay
      // linear in rows across BOTH decades, not just the first
      "s7_ivf_pq" -> (graft.queries.AnnQueries.s7IvfPq _),
      // round-10: the broadcast-LM gate on the second decade — the
      // sf1eq copies' token suffixes keep cross-copy bigrams disjoint,
      // so the reference table grows ~10× with its slice while staying
      // broadcast-sized; wall must track the corpus scan
      "l27_bigram_quality" -> (graft.queries.LlmQueries.l27BigramQuality _),
      // round-11: radius retrieval through the trained IVF cells — the
      // candidate set grows with CELL OCCUPANCY (corpus/nlists per
      // probed cell), exactly the term a 100× skeptic asks about; the
      // timed arm includes the cleared-memo quantizer training (one
      // scan per Lloyd round), so the composed wall must stay linear
      // in rows across the second decade like s7's encode arm
      "s17_ivf_radius" -> (graft.queries.AnnQueries.s17IvfRadius _),
      // round-9: the graph + collocation lines — the wedge/self-join
      // intermediates a 100× skeptic asks about. The graph slices
      // replicate the DISTINCT edge set per copy (see sf1eq doc), so
      // these lines measure the data-scaling claim directly: raw rows
      // ×10 must cost only the scan + DISTINCT delta (the iterative
      // joins and the wedge enumeration run on the same graph — their
      // growth law in GRAPH size is the m^1.5 / per-iteration-shuffle
      // argument documented at the queries). t12's per-copy token
      // suffixes keep per-doc k fixed, so its Σk² self-join and its
      // support table must both track corpus size linearly.
      "x65_pagerank" -> (graft.queries.SqlSurfaceQueries.x65Pagerank _),
      "x70_triangle_count" -> (graft.queries.SqlSurfaceQueries.x70TriangleCount _),
      "t12_collocations" -> (graft.queries.TextQueries.t12Collocations _),
    )
    val bigDir = sf1eq
    queries.foreach { case (_, fn) => runPlain(fn, small) } // JIT warmup, untimed
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    for (_ <- 1 to 2; (name, fn) <- queries; dir <- Seq(big, bigDir)) {
      val t = runStamped(name, fn, dir)
      val k = (name, dir)
      best(k) = math.min(best.getOrElse(k, Double.MaxValue), t)
    }
    queries.foreach { case (name, _) =>
      val ts = best((name, big))
      val tb = best((name, bigDir))
      val ratio = tb / ts
      val exponent = math.log10(math.max(ratio, 1e-9))
      info(f"$name%-22s sf0.1 $ts%6.2f s -> sf1eq $tb%6.2f s   wall ratio ${ratio}%5.2f   exponent ${exponent}%4.2f (data 10x)")
      assert(ratio <= 15.0,
        f"$name wall-time grew ${ratio}%.1fx on 10x data — super-linear beyond the envelope")
    }
  }

  /** The sf10-EQUIVALENT slice (100× the sf0.1 rows) — shared builder
    * in [[EqSlices]] (round 17: AmplificationAuditSpec measures its
    * shuffle ratios on the same slice this decade test times). */
  private lazy val sf10eq: String = EqSlices.sf10eq(spark)

  /** THIRD decade (round 12): the sf0.1 → sf1eq curve said the
    * heaviest shuffles are linear across one decade; this measures the
    * NEXT one (sf1eq → sf10eq, 100× the sf0.1 rows) for exactly the
    * lines where a superlinear term would first surface — the span
    * explode (d9), the prefix-filter containment join (d13), the
    * deletion-neighborhood fuzzy join (t11), the wedge enumeration
    * (x70) — plus one stored-artifact BUILD (d1's banded pair mine;
    * releaseCaches rotates the artifact dir, so the timed arm pays the
    * real mining job, not a parquet read). Same ≤ 15× envelope per
    * decade; a candidate-space blowup would show ~100×. */
  test("heaviest shuffle/join lines scale near-linearly on the third decade (sf1eq -> sf10eq)") {
    requireQuietBox()
    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "d9_span_dedup" -> (graft.queries.DedupQueries.d9SpanDedup _),
      "d13_containment" -> (graft.queries.DedupQueries.d13Containment _),
      "t11_fuzzy_join" -> (graft.queries.TextQueries.t11FuzzyJoin _),
      "x70_triangle_count" -> (graft.queries.SqlSurfaceQueries.x70TriangleCount _),
      "d1_minhash_lsh" -> (graft.queries.DedupQueries.d1MinhashLsh _),
    )
    val mid = sf1eq
    val bigDir = sf10eq
    queries.foreach { case (_, fn) => runPlain(fn, small) } // JIT warmup, untimed
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    for (_ <- 1 to 2; (name, fn) <- queries; dir <- Seq(mid, bigDir)) {
      val t = runStamped(name, fn, dir)
      val k = (name, dir)
      best(k) = math.min(best.getOrElse(k, Double.MaxValue), t)
    }
    queries.foreach { case (name, _) =>
      val ts = best((name, mid))
      val tb = best((name, bigDir))
      val ratio = tb / ts
      val exponent = math.log10(math.max(ratio, 1e-9))
      info(f"$name%-22s sf1eq $ts%6.2f s -> sf10eq $tb%6.2f s   wall ratio ${ratio}%5.2f   exponent ${exponent}%4.2f (data 10x)")
      assert(ratio <= 15.0,
        f"$name wall-time grew ${ratio}%.1fx on 10x data — super-linear beyond the envelope")
    }
  }
}
