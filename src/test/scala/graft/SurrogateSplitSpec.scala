package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine code-point contract for the BPE symbol split (l19's
  * `split(word, '')` vs the DuckDB twin's `string_split(word, '')` vs
  * BpeApplyCount's codePointAt walk): a supplementary-plane character
  * (𝕏 = U+1D54F, a surrogate PAIR in UTF-16) must stay ONE symbol on
  * the Spark side — if split ever fractured it into two lone
  * surrogates, training symbols would diverge from both the oracle
  * (DuckDB splits UTF-8 per code point: measured ['a','𝕏','b']) and
  * the apply kernel. Java 8+ String.split("") does not split inside a
  * surrogate pair, so this holds; the spec pins it against a Spark
  * upgrade or a split-spelling change regressing it silently (the
  * test corpora are BMP-only, so nothing else would notice). */
class SurrogateSplitSpec extends AnyFunSuite with SparkSuite {

  test("split(word, '') keeps supplementary-plane characters whole") {
    val rows = spark.sql(
      "SELECT split('a𝕏b', '') AS s, concat_ws(' ', split('a𝕏b', '')) AS j")
      .collect()
    val syms = rows(0).getSeq[String](0)
    assert(syms == Seq("a", "𝕏", "b"),
      s"code-unit fracture: $syms")
    // the exact l19 seed spelling (concat_ws over the split) — the
    // space-joined symbol string both engines fold over
    assert(rows(0).getString(1) == "a 𝕏 b")
  }

  test("BpeApplyCount counts the supplementary char as one seed symbol") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(
      graft.functions.BpeApplyCount(lit("a𝕏b"), Seq.empty).as("n"))
    assert(df.collect()(0).getLong(0) == 3L)
  }
}
