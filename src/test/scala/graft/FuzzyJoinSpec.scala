package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** t11's SymSpell blocking rests on one theorem — dist(s,t) ≤ 2 ⟹
  * D₂(s) ∩ D₂(t) ≠ ∅ — and one expression (the deletion-neighborhood
  * generator). The generator's off-by-one space is pinned on crafted
  * strings, and the intersection property is exercised over random
  * string pairs against a plain-Scala Levenshtein reference, so a
  * regression in either cannot hide behind the (recall-gating but
  * corpus-shaped) DuckDB oracle.
  */
class FuzzyJoinSpec extends AnyFunSuite with SparkSuite {

  private def d1(s: String): Set[String] = {
    import spark.implicits._
    Seq(s).toDF("p").selectExpr(TextQueries.deletions1("p") + " AS d")
      .head().getSeq[String](0).toSet
  }

  private def d2(s: String): Set[String] =
    Set(s) ++ d1(s) ++ d1(s).flatMap(d1)

  test("single-deletion neighborhood of abcd is exactly the 4 deletions") {
    assert(d1("abcd") == Set("bcd", "acd", "abd", "abc"))
  }

  test("repeated characters collapse to fewer distinct variants") {
    assert(d1("aaa") == Set("aa"))
  }

  /** Plain-Scala unit-cost Levenshtein — the independent reference. */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("deletion neighborhoods of any pair within distance 2 intersect (200 random pairs)") {
    val rnd = new scala.util.Random(42)
    def word() = Seq.fill(4 + rnd.nextInt(3))(('a' + rnd.nextInt(2)).toChar).mkString
    var tested = 0
    for (_ <- 0 until 200) {
      val (a, b) = (word(), word())
      if (lev(a, b) <= 2) {
        tested += 1
        assert(d2(a).intersect(d2(b)).nonEmpty, s"no shared variant for ($a, $b), dist=${lev(a, b)}")
      }
    }
    assert(tested > 20, s"alphabet too wide — only $tested close pairs exercised")
  }

  test("levenshtein agrees between Spark and the plain-Scala reference on crafted edits") {
    import spark.implicits._
    val cases = Seq(
      ("key agg row scan", "key agg row slow"), // 2 substitutions
      ("abcdefgh", "abdefgh"),                  // deletion
      ("abcdefgh", "abxcdefgh"),                // insertion
      ("same", "same"))
    val got = cases.toDF("a", "b").selectExpr("levenshtein(a, b) AS d")
      .collect().map(_.getInt(0)).toSeq
    assert(got == cases.map { case (a, b) => lev(a, b) })
  }
}
