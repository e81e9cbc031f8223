package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LlmQueries

/** l19's merge-application fold must be Sennrich's greedy left-to-right
  * non-overlapping scan. The subtle cases a naive string-replace
  * spelling gets wrong (shared delimiters between adjacent matches,
  * overlap runs) are pinned here against hand-derived expectations.
  */
class BpeTrainSpec extends AnyFunSuite with SparkSuite {

  /** Apply pair (ml, mr) to a space-joined symbol string via the
    * production expression text. */
  private def apply1(w: String, ml: String, mr: String): String = {
    import spark.implicits._
    Seq((w, ml, mr)).toDF("w", "ml", "mr")
      .selectExpr(LlmQueries.bpeApplySpark + " AS out")
      .head().getString(0)
  }

  test("overlap run merges greedily left-to-right: a a a -> aa a") {
    assert(apply1("a a a", "a", "a") == "aa a")
    assert(apply1("a a a a", "a", "a") == "aa aa")
    assert(apply1("a a a a a", "a", "a") == "aa aa a")
  }

  test("adjacent matches both fire (no shared-delimiter loss): a b a b -> ab ab") {
    assert(apply1("a b a b", "a", "b") == "ab ab")
  }

  test("a just-created symbol never re-merges within the round: a b b -> ab b") {
    assert(apply1("a b b", "a", "b") == "ab b")
  }

  test("merge fires on the exact last symbol only, never a suffix: x ab c with (b,c) unchanged") {
    // "ab" ends with "b" as a substring but IS NOT the symbol "b"
    assert(apply1("x ab c", "b", "c") == "x ab c")
  }

  test("single-symbol words pass through the seed untouched") {
    assert(apply1("a", "a", "a") == "a")
  }

  test("multi-char merged symbols participate in later rounds: m er -> mer") {
    assert(apply1("m er g e", "m", "er") == "mer g e")
  }

  test("apply compresses: trained-token counts sit between word and char counts") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val applied = LlmQueries.l22BpeApply(spark, dir)
    val base = graft.core.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id",
        "size(filter(split(text, ' '), w -> w <> '')) AS n_words",
        "length(replace(text, ' ', '')) AS n_chars")
    val joined = applied.join(base, "doc_id")
      .selectExpr("doc_id", "n_trained_tokens", "n_words", "n_chars")
      .as[(Long, Long, Int, Int)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, t, w, c) =>
      // merges only ever shrink a word (never below 1 symbol), so the
      // count is bounded by chars above and words below
      assert(t <= c, s"doc $id: $t trained tokens > $c chars")
      assert(t >= w, s"doc $id: $t trained tokens < $w words")
    }
    // and the 8 merges actually fire: strict compression in aggregate
    assert(joined.map(_._2).sum < joined.map(_._4.toLong).sum)
  }

  test("train is deterministic and emits monotone rounds with non-increasing counts") {
    val out = LlmQueries.l19BpeTrain(spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to out.length.toLong))
    val cnts = out.map(_.getLong(3)).toSeq
    assert(cnts == cnts.sorted.reverse, s"counts not non-increasing: $cnts")
    // merged symbols really are concatenations of earlier vocabulary:
    // every multi-char left/right symbol must be producible from the
    // merges learned before it
    val known = scala.collection.mutable.Set[String]()
    out.foreach { r =>
      for (s <- Seq(r.getString(1), r.getString(2)))
        assert(s.length == 1 || known.contains(s), s"symbol $s not derivable")
      known += r.getString(1) + r.getString(2)
    }
  }
}
