package graft

import org.apache.spark.sql.SparkSession

/** The scale-equivalent test slices (sf1eq = 10× sf0.1, sf10eq = 100×
  * sf0.1), factored out of ScalingCurveSpec (round 17) so the decade
  * envelopes and AmplificationAuditSpec share ONE builder — the same
  * one-definition rule that consolidated the steal instrument into
  * [[graft.core.Weather]] and the stage tap into
  * [[graft.core.StageIOTap]]. Built once under target/ (gitignored);
  * the `_done_*` marker versions are unchanged from the
  * ScalingCurveSpec originals, so slices built by earlier rounds are
  * reused as-is.
  *
  * Structure-preserving copy rules (the reason these slices are
  * admissible scale evidence at all — full derivations at the
  * original round notes in PLANS.md):
  *
  *  - documents: copy c>0 gets doc_ids offset by c·10⁷ and every
  *    token suffixed with [[copyTag]] — cross-copy shingle, prefix,
  *    and deletion-variant spaces stay disjoint, so per-copy densities
  *    replicate instead of densifying (a scaled WORKLOAD, not a
  *    different corpus). A naive C× tiling would give every doc C−1
  *    byte-identical twins — pair counts ×C², a different corpus; and
  *    the round-12 third decade proved even a 1-digit tag ("x42" vs
  *    "x43" = one edit) lets t11's edit-distance-2 join bridge copies,
  *    quadratic REAL output in the copy count — hence the tripled-digit
  *    Levenshtein-≥3 tag;
  *  - embeddings (sf1eq only): copy c rotates dimensions by 7c mod 64
  *    — intra-copy cosines are preserved exactly; the rule aliases at
  *    c ≥ 64, which is why THIS slice stops at 10 copies and the
  *    sf10eq documents slice carries no embeddings (AnnScaleProbe owns
  *    the extended orthogonal-transform rule);
  *  - orders/lineitem: copy c offsets ONLY the order keys, carrying
  *    entity columns unchanged — the derived graphs' node domains are
  *    query-pinned entity spaces, so every copy regenerates the
  *    IDENTICAL distinct edge set (densities replicate; offsetting
  *    entity keys would densify the fixed node space into a different
  *    graph).
  */
object EqSlices {

  private val big = "/root/testdata/sf0.1"

  /** The per-copy token tag: copy id as two digits, each tripled,
    * behind an 'x' — any two distinct copies differ in ≥ 3 positions
    * (if both digits differ, the 6-digit parts share LCS ≤ 3; if one
    * digit matches, the other contributes 3 mismatches), so
    * Levenshtein(tag_c, tag_c') ≥ len − LCS ≥ 3 and no edit-distance-2
    * metric can bridge copies. */
  def copyTag(c: Int): String =
    "x" + f"$c%02d".flatMap(d => s"$d$d$d")

  /** The sf1-EQUIVALENT slice: 10× the sf0.1 rows (documents,
    * embeddings, orders, lineitem), ~30 MB under target/. */
  def sf1eq(spark: SparkSession): String = synchronized {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File("target/sf1eq").getAbsolutePath
    // v3: round 12 moved the copy tag to the Levenshtein-≥3 code
    // (v2 added orders/lineitem)
    val done = new java.io.File(s"$dir/_done_v3")
    if (!done.exists) {
      val docs = spark.read.parquet(s"$big/documents.parquet")
      (0 until 10).map { c =>
        if (c == 0) docs
        else docs.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit(copyTag(c)))), " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _).coalesce(8)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$big/embeddings.parquet")
      (0 until 10).map { c =>
        if (c == 0) emb
        else {
          val sh = (c * 7) % 64
          emb.select(
            (col("vec_id") + lit(c * 10000000L)).as("vec_id"),
            expr(s"concat(slice(embedding, ${sh + 1}, ${64 - sh}), " +
              s"slice(embedding, 1, $sh))").as("embedding"),
            col("label"))
        }
      }.reduce(_ unionByName _).coalesce(8)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val orders = spark.read.parquet(s"$big/orders.parquet")
      (0 until 10).map { c =>
        orders.withColumn("o_orderkey", col("o_orderkey") + lit(c * 100000000L))
      }.reduce(_ unionByName _).coalesce(8)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val li = spark.read.parquet(s"$big/lineitem.parquet")
      (0 until 10).map { c =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(c * 100000000L))
      }.reduce(_ unionByName _).coalesce(8)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      done.createNewFile()
    }
    dir
  }

  /** The sf10-EQUIVALENT slice: 100× the sf0.1 rows. Only the tables
    * the third-decade lines read are materialized — documents, orders,
    * lineitem; embeddings are not part of THIS slice (the plain
    * 7c mod 64 rotation rule aliases at c ≥ 64: copy c and c+64 would
    * rotate identically and become exact semantic twins). ~1.3 GB
    * under target/, built once. */
  def sf10eq(spark: SparkSession): String = synchronized {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File("target/sf10eq").getAbsolutePath
    // v2: the Levenshtein-≥3 copy tag (see copyTag)
    val done = new java.io.File(s"$dir/_done_v2")
    if (!done.exists) {
      val docs = spark.read.parquet(s"$big/documents.parquet")
      (0 until 100).map { c =>
        if (c == 0) docs
        else docs.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit(copyTag(c)))), " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _).repartition(16)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val orders = spark.read.parquet(s"$big/orders.parquet")
      (0 until 100).map { c =>
        orders.withColumn("o_orderkey", col("o_orderkey") + lit(c * 100000000L))
      }.reduce(_ unionByName _).repartition(16)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val li = spark.read.parquet(s"$big/lineitem.parquet")
      (0 until 100).map { c =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(c * 100000000L))
      }.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      done.createNewFile()
    }
    dir
  }
}
