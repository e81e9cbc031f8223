package graft

import org.scalatest.funsuite.AnyFunSuite

/** s13's BM25 scoring checked against an INDEPENDENT plain-Scala
  * reference — a third implementation besides the Spark plan and the
  * DuckDB twin, so a shared-spelling bug (both engines computing the
  * same wrong thing from the same SQL text) cannot hide. The reference
  * tokenizes, counts, and folds the rational Robertson/Sparck-Jones
  * score in ordinary JVM doubles with the SAME operation order the SQL
  * spells, and rounds with BigDecimal HALF_UP (Spark round semantics).
  */
class Bm25Spec extends AnyFunSuite with SparkSuite {

  private val terms = Seq("spark", "vector", "merge")
  private val sf = "/root/testdata/sf0.001"

  test("s13 top-20 equals a plain-Scala BM25 reference on sf0.001") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))

    val n = docs.length.toDouble
    val dls = docs.map { case (id, toks) => (id, toks.length.toLong) }.toMap
    val sumDl = dls.values.sum.toDouble
    val tf = docs.map { case (id, toks) =>
      (id, terms.map(t => t -> toks.count(_ == t).toLong).toMap)
    }.toMap
    val df = terms.map(t => t -> tf.values.count(_(t) > 0).toDouble).toMap

    def score(id: Long): Double = {
      val dl = dls(id).toDouble
      terms.map { t =>
        ((n - df(t)) + 0.5) / (df(t) + 0.5) *
          ((tf(id)(t).toDouble * 2.2) /
            (tf(id)(t).toDouble + 1.2 * (0.25 + 0.75 * (dl / (sumDl / n)))))
      }.reduceLeft(_ + _)
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val expected = docs.map(_._1)
      .map(id => (id, round6(score(id))))
      .sortBy { case (id, s) => (-s, id) }
      .take(20)

    val got = SparkEntry.queries("s13_bm25_topk")(spark, sf)
      .selectExpr("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

    assert(got == expected.toSeq,
      s"spark=${got.take(5)}... reference=${expected.take(5).toSeq}...")
  }

  test("BM25 term saturation: score is monotone but sub-linear in tf") {
    // pure-arithmetic property of the spelled formula: doubling tf
    // must raise the per-term score by LESS than 2x (k1 saturation)
    def term(tf: Double, dl: Double, dfT: Double, n: Double, avgdl: Double): Double =
      ((n - dfT) + 0.5) / (dfT + 0.5) *
        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
    val (dl, dfT, n, avgdl) = (40.0, 300.0, 500.0, 38.0)
    val s1 = term(1, dl, dfT, n, avgdl)
    val s2 = term(2, dl, dfT, n, avgdl)
    val s4 = term(4, dl, dfT, n, avgdl)
    assert(s1 < s2 && s2 < s4)
    assert(s2 < 2 * s1 && s4 < 2 * s2)
  }
}
