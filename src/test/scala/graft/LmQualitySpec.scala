package graft

import org.scalatest.funsuite.AnyFunSuite

/** l27's reason to exist, pinned on crafted text: the bigram-LM
  * likelihood gate must separate word ORDER, not just word choice —
  * a document built from exactly the reference's vocabulary but in
  * transitions the reference never makes (template spam, shuffled
  * text) must score low while the in-distribution counterpart scores
  * high. This is the property the binary coverage gate (l14) cannot
  * express: both test docs below have identical word multisets.
  *
  * The expected scores are computed BY HAND from the MLE definition
  * (c(pair)·10⁶ DIV c(left), Σ DIV n) so the test pins the arithmetic,
  * not just the ordering. */
class LmQualitySpec extends AnyFunSuite with SparkSuite {

  test("l27 scores in-order text high and the same words shuffled at zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("l27prop").toString
    // doc 0 (doc_id % 97 == 0) is the reference slice the model trains
    // on; docs 1 and 2 are scored. Doc 1 repeats the reference's exact
    // transitions; doc 2 uses the SAME words in transitions the
    // reference never makes (no shared bigram — checked by hand).
    val ref = "the cat sat on the mat"
    val natural = "the cat sat on the mat"
    val shuffled = "mat on cat the sat"
    Seq((0L, ref), (1L, natural), (2L, shuffled))
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.queries.LlmQueries.l27BigramQuality(spark, dir)
      .as[(Long, Long, Long)].collect()
      .map { case (k, n, s) => (k, (n, s)) }.toMap

    // reference bigram counts: (the,cat) 1, (cat,sat) 1, (sat,on) 1,
    // (on,the) 1, (the,mat) 1; left counts: the=2, cat=1, sat=1, on=1.
    // doc 1: p = 500000, 1000000, 1000000, 1000000, 500000 ->
    //        sum 4000000 over 5 bigrams = 800000 micro.
    assert(got(1L) == ((5L, 800000L)),
      s"in-distribution doc scored ${got(1L)}, expected (5, 800000)")
    // doc 2: bigrams (mat,on) (on,cat) (cat,the) (the,sat) — none in
    // the reference -> every p = 0.
    assert(got(2L) == ((4L, 0L)),
      s"shuffled doc scored ${got(2L)}, expected (4, 0)")
    assert(!got.contains(0L), "the reference slice must never score itself")
  }
}
