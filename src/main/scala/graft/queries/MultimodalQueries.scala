package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing for the training-data pipeline: media
  * (image/audio/video) is carried as opaque `binary` columns with typed
  * metadata, and decode / feature-extraction runs as an imperative
  * per-partition kernel over batches — the shape a real pipeline uses
  * for libjpeg/ffmpeg-style libraries that can't be expressed as
  * Catalyst expressions.
  *
  * The decode itself is a STUB (this container has no media libraries):
  * [[DecodeStub.decode]] derives deterministic fake dimensions from the
  * byte payload. Everything AROUND the stub — binary column handling,
  * the Dataset encoder round-trip, per-partition batching, the output
  * schema — is real and oracle-checked (the stub's arithmetic is
  * reproducible in SQL, which is exactly why it's the stand-in).
  */
object MultimodalQueries {

  /** Stand-in for a real media decoder. Replace `decode` with the real
    * library call (e.g. javax.imageio / ffmpeg JNI) on a cluster that
    * ships it; the signature — bytes in, typed metadata out — and the
    * batched per-partition call pattern are the real contract. */
  object DecodeStub {
    final case class Media(nBytes: Long, width: Long, height: Long, channels: Long)
    def decode(bytes: Array[Byte]): Media = {
      val n = bytes.length.toLong
      Media(n, n % 640 + 1, (n * 31) % 480 + 1, 3L)
    }
  }

  /** m1 — decode a binary media column to typed metadata.
    * The binary payload is synthesized from `text` (UTF-8 bytes) since
    * the test corpus has no real media; `mapPartitions` processes rows
    * in batches of 64, the batch shape a vectorized decode would use
    * (amortizing per-call setup such as decoder contexts). */
  def m1MultimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bin = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    bin.mapPartitions { rows =>
      rows.grouped(64).flatMap { batch =>
        batch.map { case (id, bytes) =>
          val m = DecodeStub.decode(bytes)
          (id, m.nBytes, m.width, m.height, m.channels)
        }
      }
    }.toDF("doc_id", "n_bytes", "width", "height", "channels")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_decode" -> (m1MultimodalDecode _),
  )

  val oracleSql: Map[String, String] = Map(
    // The stub's arithmetic, restated over DuckDB's UTF-8 byte length.
    "m1_multimodal_decode" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width, " +
        "CAST((octet_length(encode(text)) * 31) % 480 + 1 AS BIGINT) AS height, " +
        "CAST(3 AS BIGINT) AS channels " +
        "FROM documents ORDER BY doc_id"),
  )
}
