package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors

/** The scale path for s9 (MIPS), proven on the real corpus: the
  * Bachrach et al. (2014) reduction appends √(M²−‖x‖²) to every corpus
  * vector (M ≥ max corpus norm) and 0 to queries, after which
  * COSINE order over the augmented vectors equals raw INNER-PRODUCT
  * order — because cos(q', x') = ⟨q,x⟩ / (‖q‖·M) is a fixed positive
  * rescaling per query. This is what lets the s2/s5 SRP-LSH index —
  * which only answers cosine — serve inner-product retrieval at 100 TB:
  * augment once at ingest, index the augmented corpus, query with the
  * zero-padded probe. The spec runs BOTH rankings end-to-end through
  * the same fold kernels the queries use and asserts the per-probe
  * top-3 lists are identical, ties broken by vec_id in both.
  */
class MipsAugmentationSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("augmented-cosine top-3 == raw inner-product top-3 for every probe") {
    val e = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
    def dotD(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val withN = e.select(col("vec_id"), col("v"), dotD(col("v"), col("v")).as("nsq"))
    // M² strictly above the max corpus norm² so every √ argument is > 0
    val m2 = withN.agg(max(col("nsq"))).head.getDouble(0) * 1.01

    val corpus = withN.select(col("vec_id"), col("v"),
      concat(col("v"), array(sqrt(lit(m2) - col("nsq")))).as("va"))
    val probes = corpus.filter(col("vec_id") % 20 === 7)
      .select(col("vec_id").as("probe_id"), col("v").as("q"),
        concat(col("v"), array(lit(0.0))).as("qa"))

    val pairs = corpus.join(probes, col("vec_id") =!= col("probe_id"))
    def top3(score: Column): Map[Long, Seq[Long]] = {
      import org.apache.spark.sql.expressions.Window
      pairs.select(col("probe_id"), col("vec_id"), score.as("s"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("s").desc, col("vec_id"))))
        .filter(col("rn") <= 3)
        .groupBy("probe_id").agg(sort_array(collect_list(struct(col("rn"), col("vec_id")))).as("l"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)))
        .toMap
    }

    val byIp  = top3(round(dotD(col("q"), col("v")), 9))
    val byCos = top3(round(
      dotD(col("qa"), col("va")) / sqrt(dotD(col("qa"), col("qa"))) / sqrt(dotD(col("va"), col("va"))),
      9))
    assert(byIp.nonEmpty)
    assert(byIp == byCos,
      s"MIPS order diverged from augmented-cosine order: " +
        s"${byIp.toSeq.sortBy(_._1).take(3)} vs ${byCos.toSeq.sortBy(_._1).take(3)}")
  }
}
