package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.functions.GraftFunctions
import graft.functions.TextPrimitives._

/** p1 — the end-to-end training-data pipeline the individual operators
  * exist for, composed as ONE query: exact dedup → quality scoring →
  * language ID → token counting → fingerprinting, emitting the curated
  * corpus manifest. This is the shape of a real pretraining data job;
  * every stage is a scan or one hash shuffle, so the composition
  * pipelines without materialization barriers.
  */
object PipelineQueries {

  private val qualityThreshold = "0.5"

  def p1TrainingPipeline(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.load(spark, dir, "documents").createOrReplaceTempView("documents")
    val w = "split(text, ' ')"
    spark.sql(s"""
      WITH survivors AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
      d AS (SELECT documents.* FROM documents JOIN survivors USING (doc_id)),
      scored AS (SELECT doc_id, lang, text, n_chars,
          CAST(size($w) AS BIGINT) AS n_tokens,
          round(0.5 * CAST(${stopHitsSpark(w, stopwords("en"))} AS DOUBLE) / size($w)
              + 0.3 * least(1.0, size($w) / 100.0)
              + 0.2 * (1.0 - CAST(char_length(regexp_replace(text, '[A-Za-z0-9 ]', '')) AS DOUBLE)
                             / CAST(n_chars AS DOUBLE)), 6) AS score
        FROM d WHERE size($w) > 0)
      SELECT doc_id, n_tokens, score,
        CASE WHEN ${stopHitsSpark(s"split(text, ' ')", stopwords("en"))} > 0
             THEN 'en' ELSE 'unknown' END AS pred_lang,
        ${rollingHashSpark("text")} AS fp
      FROM scored
      WHERE score >= $qualityThreshold
      ORDER BY doc_id""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_training_pipeline" -> (p1TrainingPipeline _),
  )

  val oracleSql: Map[String, String] = {
    val w = "string_split(text, ' ')"
    Map(
      "p1_training_pipeline" ->
        s"""WITH survivors AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
        d AS (SELECT documents.* FROM documents JOIN survivors USING (doc_id)),
        scored AS (SELECT doc_id, lang, text, n_chars,
            CAST(length($w) AS BIGINT) AS n_tokens,
            round(0.5 * CAST(${stopHitsDuck(w, stopwords("en"))} AS DOUBLE) / length($w)
                + 0.3 * least(1.0, length($w) / 100.0)
                + 0.2 * (1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                               / CAST(n_chars AS DOUBLE)), 6) AS score
          FROM d WHERE length($w) > 0)
        SELECT doc_id, n_tokens, score,
          CASE WHEN ${stopHitsDuck(w, stopwords("en"))} > 0
               THEN 'en' ELSE 'unknown' END AS pred_lang,
          ${rollingHashDuck("text")} AS fp
        FROM scored
        WHERE score >= $qualityThreshold
        ORDER BY doc_id""",
    )
  }
}
