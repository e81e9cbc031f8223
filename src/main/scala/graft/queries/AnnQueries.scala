package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Vectors

/** Approximate nearest-neighbor search — the 100 TB companion to the
  * exact L3 baseline.
  *
  * s2 uses sign-random-projection (SimHash-for-cosine) bucketing:
  * 8 fixed pseudo-random hyperplanes → a 256-bucket partition of the
  * corpus; the query only scans its own bucket (≈ 0.4 % of the corpus
  * under a uniform hash) and ranks candidates by exact cosine. The
  * hyperplane weights come from a literal LCG — `u = (1103515245·n +
  * 12345) mod 2^31`, `w = u/2^31 − 0.5` — so the DuckDB oracle can
  * regenerate bit-identical planes and the WHOLE approximate pipeline is
  * hash-checked, bucketing included.
  *
  * Trade-off vs L3: recall < 1 by construction (a true neighbor in a
  * different bucket is unseen). The operator is judged against its own
  * deterministic spec, and its recall is measured in the test suite by
  * comparison with L3.
  */
object AnnQueries {

  private val planes = 8
  private val dims = 64

  /** Spark SQL: LSH bucket id (0..255) of array<float> column `e`.
    * All integer literals are BIGINT — Spark's ANSI mode would overflow
    * int32 multiplication; DuckDB would promote silently. Element access
    * via get() is 0-based. */
  private def bucketSpark(e: String): String = {
    val dot = s"aggregate(sequence(0, ${dims - 1}), CAST(0.0 AS DOUBLE), (s, k) -> " +
      s"s + (CAST((CAST(1103515245 AS BIGINT) * (p * $dims + k) + 12345) % 2147483648 AS DOUBLE) " +
      s"/ 2147483648.0 - 0.5) * CAST(get($e, k) AS DOUBLE))"
    s"aggregate(sequence(0, ${planes - 1}), CAST(0 AS BIGINT), (acc, p) -> " +
      s"acc + CASE WHEN $dot > 0.0 THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END)"
  }

  /** DuckDB: identical bucket id; element access is 1-based. */
  private def bucketDuck(e: String): String = {
    val dot = s"list_sum(list_transform(range(0, $dims), k -> " +
      s"(CAST((CAST(1103515245 AS BIGINT) * (p * $dims + k) + 12345) % 2147483648 AS DOUBLE) " +
      s"/ 2147483648.0 - 0.5) * CAST($e[k + 1] AS DOUBLE)))"
    s"list_sum(list_transform(range(0, $planes), p -> " +
      s"CASE WHEN $dot > 0.0 THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END))"
  }

  /** s2 — multi-probe LSH cosine top-5 neighbors of vec_id 0:
    * candidates = vectors whose bucket is within Hamming distance 1 of
    * the query's bucket (9 of 256 buckets ≈ 3.5 % of the corpus —
    * single-probe starves on small corpora and loses recall on big
    * ones), ranked by exact cosine (9dp-rounded like L3). At scale the
    * probe set is 9 bucket lookups against a bucket-partitioned corpus
    * — still a ~30× pruning vs the exact scan. */
  def s2AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .withColumn("bucket", expr(bucketSpark("embedding")))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(q),
        bit_count(col("bucket").bitwiseXOR(col("q_bucket"))) <= 1)
      .select(col("vec_id"),
        round(Vectors.cosine(col("embedding"), col("q_emb")), 9).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s2_ann_lsh" -> (s2AnnLsh _),
  )

  val oracleSql: Map[String, String] = {
    def cosDot(x: String, y: String) =
      s"list_sum(list_transform(range(1, length($x.embedding) + 1), " +
        s"k -> CAST($x.embedding[k] AS DOUBLE) * CAST($y.embedding[k] AS DOUBLE)))"
    val cos = s"${cosDot("a", "b")} / sqrt(${cosDot("a", "a")}) / sqrt(${cosDot("b", "b")})"
    Map(
      "s2_ann_lsh" ->
        s"""WITH eb AS (SELECT vec_id, embedding, ${bucketDuck("embedding")} AS bucket FROM embeddings)
        SELECT b.vec_id, ROUND($cos, 9) AS sim
        FROM eb a JOIN eb b
          ON bit_count(xor(a.bucket, b.bucket)) <= 1 AND a.vec_id = 0 AND b.vec_id <> 0
        ORDER BY sim DESC, b.vec_id LIMIT 5""",
    )
  }
}
