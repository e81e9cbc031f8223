package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** LLM-data-pipeline queries (SURVEY §2.4 L1–L4 plus the training-data
  * operators mandated by the north star): dedup, text analysis,
  * similarity search over `documents.parquet` / `embeddings.parquet`.
  */
object LlmQueries {

  /** L1 — exact dedup: hash-groupBy on sha2(text), survivor = min doc_id.
    * At scale this is one shuffle on a 32-byte key; the full text never
    * shuffles (only hash + id), which is the point of hashing first. */
  def l1ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
      .orderBy("doc_id")

  /** L2 — text stats: token count (whitespace) + stored char count,
    * top-20 longest docs. */
  def l2TextStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"),
        col("n_chars"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .limit(20)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l1_exact_dedup" -> (l1ExactDedup _),
    "l2_text_stats"  -> (l2TextStats _),
  )

  val oracleSql: Map[String, String] = Map(
    "l1_exact_dedup" ->
      "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id",
    "l2_text_stats" ->
      ("SELECT doc_id, CAST(length(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens, " +
        "n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 20"),
  )
}
