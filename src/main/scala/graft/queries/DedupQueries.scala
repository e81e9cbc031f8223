package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.functions.GraftFunctions
import graft.functions.TextPrimitives._

/** Near-duplicate detection suite for the training-data pipeline:
  *
  *  - d3 exact n-gram jaccard — the ground truth, quadratic in docs:
  *    right at test scale, wrong at 100 TB;
  *  - d1 MinHash+LSH — the 100 TB path: shingle → 16 minhashes →
  *    8 bands × 2 rows → shuffle on band key → verify only candidate
  *    pairs. Cost is O(n·shingles) + O(candidate pairs), never O(n²);
  *  - d2 SimHash — 30-bit fingerprint per doc + small-hamming pair
  *    scan; fingerprinting is a scan, pairing here is brute force (the
  *    scale path would block on fingerprint prefixes).
  *
  * Everything is deterministic (fixed permutation constants, rolling
  * hash) and reproduced verbatim in the DuckDB oracle from the same
  * constants — so even the LSH candidate-generation step is
  * hash-checkable, not just "rows > 0".
  */
object DedupQueries {

  private val jacThreshold = "0.5"
  private val hamThreshold = 4

  // --- shared Spark SQL fragments -----------------------------------------

  /** doc_id + distinct 3-gram shingle array (docs with >=3 tokens). */
  private val shingleCteSpark: String =
    s"""toks AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
        sh AS (SELECT doc_id, ${shinglesSpark("w")} AS s FROM toks WHERE size(w) >= 3)"""

  /** doc_id + rolling-hashed shingle ids. */
  private val idsCteSpark: String =
    s"""ids AS (SELECT doc_id, s, transform(s, g -> ${rollingHashSpark("g")}) AS ids FROM sh)"""

  private def jacSpark(a: String, b: String): String =
    s"CAST(size(array_intersect($a, $b)) AS DOUBLE) / size(array_union($a, $b))"

  // --- shared DuckDB fragments --------------------------------------------

  private val shingleCteDuck: String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT doc_id, ${shinglesDuck("w")} AS s FROM toks WHERE length(w) >= 3)"""

  private val idsCteDuck: String =
    s"""ids AS (SELECT doc_id, s, list_transform(s, g -> ${rollingHashDuck("g")}) AS ids FROM sh)"""

  private def jacDuck(a: String, b: String): String =
    s"CAST(length(list_intersect($a, $b)) AS DOUBLE) / length(list_distinct(list_concat($a, $b)))"

  // --- d3: exact n-gram jaccard ------------------------------------------

  /** Exact jaccard WITHOUT the quadratic nested-loop + per-pair
    * array_intersect: explode shingles, equi-join on the shingle (a
    * shuffle hash join), count common shingles per pair, then
    * jac = c / (|A| + |B| - c). Pairs sharing zero shingles can never
    * reach the threshold, so the equi-join's implicit pruning is
    * semantics-preserving — and at scale the cost follows the actual
    * shingle-overlap distribution instead of n². */
  def d3NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.load(spark, dir, "documents").createOrReplaceTempView("documents")
    spark.sql(s"""
      WITH $shingleCteSpark,
      sz AS (SELECT doc_id, size(s) AS sz FROM sh),
      ex AS (SELECT doc_id, explode(s) AS g FROM sh),
      common AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
                 FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                 GROUP BY a.doc_id, b.doc_id)
      SELECT i AS doc_id_a, j AS doc_id_b,
             CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jac
      FROM common JOIN sz sa ON sa.doc_id = i JOIN sz sb ON sb.doc_id = j
      WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= $jacThreshold
      ORDER BY doc_id_a, doc_id_b""")
  }

  // --- d1: MinHash + LSH ---------------------------------------------------

  def d1MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.load(spark, dir, "documents").createOrReplaceTempView("documents")
    val mh = minhashAB.zipWithIndex.map { case ((a, b), k) =>
      s"array_min(transform(ids, x -> ($a*x + $b) % $P)) AS mh$k"
    }.mkString(", ")
    val bandStructs = (0 until 8).map(k =>
      s"named_struct('bi', $k, 'bk', concat(CAST(mh${2 * k} AS STRING), '_', CAST(mh${2 * k + 1} AS STRING)))")
      .mkString(", ")
    spark.sql(s"""
      WITH $shingleCteSpark,
      $idsCteSpark,
      mh AS (SELECT doc_id, s, $mh FROM ids),
      eb AS (SELECT doc_id, s, band.bi AS bi, band.bk AS bk
             FROM mh LATERAL VIEW explode(array($bandStructs)) AS band),
      cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
               FROM eb a JOIN eb b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id),
      ver AS (SELECT c.i AS doc_id_a, c.j AS doc_id_b,
                     ${jacSpark("sa.s", "sb.s")} AS jac
              FROM cand c JOIN sh sa ON sa.doc_id = c.i JOIN sh sb ON sb.doc_id = c.j)
      SELECT doc_id_a, doc_id_b, jac FROM ver WHERE jac >= $jacThreshold
      ORDER BY doc_id_a, doc_id_b""")
  }

  // --- d2: SimHash ---------------------------------------------------------

  /** Fingerprinting runs through the codegen [[graft.functions.SimHash30]]
    * expression — the builtin spelling (30 interpreted ArrayFilter passes
    * per doc) was ~1000× slower and dominated the benchmark. The pair
    * scan stays brute force (cheap long ops); the scale path would block
    * on fingerprint prefixes first. */
  def d2Simhash(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.load(spark, dir, "documents").createOrReplaceTempView("documents")
    spark.sql(s"""
      WITH $shingleCteSpark,
      $idsCteSpark,
      simh AS (SELECT doc_id, simhash30(ids) AS sim FROM ids)
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             CAST(bit_count(a.sim ^ b.sim) AS BIGINT) AS ham
      FROM simh a JOIN simh b ON a.doc_id < b.doc_id
      WHERE bit_count(a.sim ^ b.sim) <= $hamThreshold
      ORDER BY doc_id_a, doc_id_b""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_minhash_lsh"   -> (d1MinhashLsh _),
    "d2_simhash"       -> (d2Simhash _),
    "d3_ngram_jaccard" -> (d3NgramJaccard _),
  )

  val oracleSql: Map[String, String] = {
    val mhDuck = minhashAB.zipWithIndex.map { case ((a, b), k) =>
      s"list_min(list_transform(ids, x -> ($a*x + $b) % $P)) AS mh$k"
    }.mkString(", ")
    val bandList = (0 until 8).map(k =>
      s"{'bi': $k, 'bk': CAST(mh${2 * k} AS VARCHAR) || '_' || CAST(mh${2 * k + 1} AS VARCHAR)}")
      .mkString(", ")
    Map(
      "d3_ngram_jaccard" ->
        s"""WITH $shingleCteDuck
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               ${jacDuck("a.s", "b.s")} AS jac
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE ${jacDuck("a.s", "b.s")} >= $jacThreshold
        ORDER BY doc_id_a, doc_id_b""",
      "d1_minhash_lsh" ->
        s"""WITH $shingleCteDuck,
        $idsCteDuck,
        mh AS (SELECT doc_id, s, $mhDuck FROM ids),
        eb AS (SELECT doc_id, s, u.bi AS bi, u.bk AS bk
               FROM mh, UNNEST([$bandList]) t(u)),
        cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
                 FROM eb a JOIN eb b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id),
        ver AS (SELECT c.i AS doc_id_a, c.j AS doc_id_b,
                       ${jacDuck("sa.s", "sb.s")} AS jac
                FROM cand c JOIN sh sa ON sa.doc_id = c.i JOIN sh sb ON sb.doc_id = c.j)
        SELECT doc_id_a, doc_id_b, jac FROM ver WHERE jac >= $jacThreshold
        ORDER BY doc_id_a, doc_id_b""",
      "d2_simhash" ->
        s"""WITH $shingleCteDuck,
        $idsCteDuck,
        simh AS (SELECT doc_id, list_sum(list_transform(range(0, 30), j ->
                   CASE WHEN 2 * length(list_filter(ids, h -> (h >> j) & 1 = 1)) > length(ids)
                        THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS sim FROM ids)
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS ham
        FROM simh a JOIN simh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sim, b.sim)) <= $hamThreshold
        ORDER BY doc_id_a, doc_id_b""",
    )
  }
}
