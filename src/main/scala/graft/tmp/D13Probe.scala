import org.apache.spark.sql.SparkSession
object D13Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    graft.core.Tables.load(spark, "/root/testdata/sf0.1", "documents").createOrReplaceTempView("documents")
    spark.sql("""WITH toks AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
        ids AS (SELECT doc_id, shingle_hashes(w) AS ids FROM toks WHERE size(w) >= 3)
      SELECT * FROM ids""").persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .createOrReplaceTempView("ids")
    def time(label: String, sql: String): Unit = {
      for (p <- 1 to 2) {
        val t0 = System.nanoTime()
        val df = spark.sql(sql)
        df.write.format("noop").mode("overwrite").save()
        println(f"$label pass$p ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    // hash-order prefix (no df): sorted ids, take floor(0.4*sz)+1 smallest
    time("hashorder", """
      WITH ex AS (SELECT doc_id, size(ids) AS sz, explode(ids) AS g FROM ids),
      pref AS (SELECT doc_id, size(ids) AS sz,
                 explode(slice(array_sort(ids), 1, CAST(floor(0.4 * size(ids)) + 1 AS INT))) AS g
               FROM ids),
      cand AS (SELECT DISTINCT least(p.doc_id, x.doc_id) AS i, greatest(p.doc_id, x.doc_id) AS j
               FROM pref p JOIN ex x ON p.g = x.g
               WHERE p.sz < x.sz OR (p.sz = x.sz AND p.doc_id <> x.doc_id)),
      ver AS (SELECT c.i AS doc_id_a, c.j AS doc_id_b,
                round(CAST(size(array_intersect(ia.ids, ib.ids)) AS DOUBLE)
                      / least(size(ia.ids), size(ib.ids)), 6) AS containment
              FROM cand c JOIN ids ia ON ia.doc_id = c.i JOIN ids ib ON ib.doc_id = c.j)
      SELECT doc_id_a, doc_id_b, containment FROM ver WHERE containment >= 0.6
      ORDER BY doc_id_a, doc_id_b""")
    // candidate counts both ways
    println("cand hashorder: " + spark.sql("""
      WITH ex AS (SELECT doc_id, size(ids) AS sz, explode(ids) AS g FROM ids),
      pref AS (SELECT doc_id, size(ids) AS sz,
                 explode(slice(array_sort(ids), 1, CAST(floor(0.4 * size(ids)) + 1 AS INT))) AS g
               FROM ids)
      SELECT COUNT(*) FROM (SELECT DISTINCT least(p.doc_id, x.doc_id), greatest(p.doc_id, x.doc_id)
               FROM pref p JOIN ex x ON p.g = x.g
               WHERE p.sz < x.sz OR (p.sz = x.sz AND p.doc_id <> x.doc_id))""").collect()(0).getLong(0))
    println("cand rarest: " + spark.sql("""
      WITH ex AS (SELECT doc_id, size(ids) AS sz, explode(ids) AS g FROM ids),
      df AS (SELECT g, COUNT(*) AS df FROM ex GROUP BY g),
      rk AS (SELECT ex.doc_id, ex.sz, ex.g,
               row_number() OVER (PARTITION BY ex.doc_id ORDER BY df.df, ex.g) AS rn
             FROM ex JOIN df ON ex.g = df.g),
      pref AS (SELECT doc_id, sz, g FROM rk WHERE rn <= floor(0.4 * sz) + 1)
      SELECT COUNT(*) FROM (SELECT DISTINCT least(p.doc_id, x.doc_id), greatest(p.doc_id, x.doc_id)
               FROM pref p JOIN ex x ON p.g = x.g
               WHERE p.sz < x.sz OR (p.sz = x.sz AND p.doc_id <> x.doc_id))""").collect()(0).getLong(0))
    spark.stop()
  }
}
