package graft

/** Test-scope instrument: the embedding-space THIRD decade. The spec
  * suite's sf10eq slice deliberately omits embeddings because the
  * sf1eq rule (dimension-rotate copy c by 7c mod 64) ALIASES at
  * c ≥ 64 — copy c and c+64 would rotate identically and become exact
  * semantic twins. This probe extends the rule: copy c is rotated by
  * 7·(c mod 64) mod 64 AND, for c ≥ 64, sign-flipped on odd
  * coordinates. A global sign flip is an orthogonal transform, so
  * intra-copy pairwise cosines are preserved EXACTLY (both sides flip
  * together), while any two distinct copies differ by a rotation, a
  * flip, or both — decorrelating cross-copy vectors to background on
  * this near-uniform corpus. Timed lines: s7 (PQ encode + the
  * cleared-memo 10-round Lloyd training — the bulk-index build claim)
  * and s17 (trained-IVF radius serving — the cell-occupancy claim).
  * One timed pass per arm (the ≤15× envelope question is answerable
  * at that precision); results recorded in PLANS.md round 12.
  *
  * Run: Test/runMain graft.AnnScaleProbe
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.core.GraftSession.local(4, "ann_scale_probe")
    val big = "/root/testdata/sf0.1"
    val sf10 = new java.io.File("target/sf10eq").getAbsolutePath
    val done = new java.io.File(s"$sf10/_emb_done_v1")
    if (!done.exists) {
      val emb = spark.read.parquet(s"$big/embeddings.parquet")
      (0 until 100).map { c =>
        if (c == 0) emb
        else {
          val sh = (7 * (c % 64)) % 64
          val rotated =
            if (sh == 0) col("embedding")
            else expr(s"concat(slice(embedding, ${sh + 1}, ${64 - sh}), " +
              s"slice(embedding, 1, $sh))")
          val rf =
            if (c >= 64)
              expr(s"transform(${if (sh == 0) "embedding"
                else s"concat(slice(embedding, ${sh + 1}, ${64 - sh}), slice(embedding, 1, $sh))"}, " +
                "(x, i) -> IF(i % 2 = 0, x, -x))")
            else rotated
          emb.select(
            (col("vec_id") + lit(c * 10000000L)).as("vec_id"),
            rf.as("embedding"), col("label"))
        }
      }.reduce(_ unionByName _).repartition(16)
        .write.mode("overwrite").parquet(s"$sf10/embeddings.parquet")
      done.createNewFile()
    }
    def arm(tag: String, dir: String, fn: () => org.apache.spark.sql.DataFrame): Double = {
      spark.conf.set("spark.graft.artifacts.dir",
        java.nio.file.Files.createTempDirectory("annprobe_art").toString)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      graft.queries.AnnQueries.clearTrainingMemo()
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $tag $dir secs=$secs%.2f")
      secs
    }
    val sf1 = new java.io.File("target/sf1eq").getAbsolutePath
    // JIT warmup
    arm("warmup_s7", "/root/testdata/sf0.01",
      () => graft.queries.AnnQueries.s7IvfPq(spark, "/root/testdata/sf0.01"))
    arm("warmup_s17", "/root/testdata/sf0.01",
      () => graft.queries.AnnQueries.s17IvfRadius(spark, "/root/testdata/sf0.01"))
    for ((name, fn) <- Seq[(String, String => org.apache.spark.sql.DataFrame)](
        "s7_ivf_pq" -> (d => graft.queries.AnnQueries.s7IvfPq(spark, d)),
        "s17_ivf_radius" -> (d => graft.queries.AnnQueries.s17IvfRadius(spark, d)))) {
      val a = arm(name, sf1, () => fn(sf1))
      val b = arm(name, sf10, () => fn(sf10))
      println(f"PROBE $name ratio=${b / a}%.2f exponent=${math.log10(b / a)}%.2f")
    }
    spark.stop()
  }
}
