package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ReferenceOps

/** Parity tests for the line-op library against the FIXTURES.md §3 probe
  * log — the empirically pinned behavior of the reference's compiled
  * operator binaries (op1_t1 / op1_t2 / op2_t1 / op2_t2). Probe numbers
  * in test names refer to FIXTURES §3's transcript. */
class ReferenceOpsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val probeBatch = Seq(
    "-88.2,40.1,1001,Stop,30x30,None,Punched Telespar,2005,Warning,none",
    "-88.3,40.2,1002,Yield,36x36,None,Unpunched Telespar,2006,Regulatory,none",
    "-88.4,40.3,1003,Speed,24x24,None,Square Post,2007,Warning,Punched note here",
    "-88.5,40.4,1004,Stop2,30x30,None,Telespar Punched,2008,Other,none",
    "-88.6,40.5,1005,Warn,12x18,None,Punched TelesparX,2009,Warning,none",
    "-88.7,40.6,1006,Warn2,12x18,None,xPunched Telespar,2010,Stop,none")

  private def lines(xs: Seq[String]): DataFrame = xs.toDF("value")
  private def values(df: DataFrame): Seq[String] =
    df.collect().map(_.getString(0)).toSeq

  test("probe 3.1: substring filter keeps 'Punched' anywhere, case-sensitive") {
    val kept = values(ReferenceOps.filterContains("Punched")(lines(probeBatch)))
    assert(kept == Seq(probeBatch(0), probeBatch(2), probeBatch(3), probeBatch(4), probeBatch(5)))
  }

  test("probe 3.4: substring filter is case-sensitive") {
    val in = lines(Seq("-88,40,2002,Stop,30x30,None,punched telespar,2005,Warning,none"))
    assert(values(ReferenceOps.filterContains("Punched")(in)).isEmpty)
  }

  test("probe 3.5: substring filter has no arity requirement") {
    assert(values(ReferenceOps.filterContains("Punched")(lines(Seq("Punched,a")))) == Seq("Punched,a"))
  }

  test("probe 3.2/3.3: field-eq filter is positional, not substring") {
    val kept = values(ReferenceOps.filterFieldEq(6, "Punched Telespar")(lines(probeBatch)))
    assert(kept == Seq(probeBatch(0)))
    val wrongPos = lines(Seq("-88,40,2001,Punched Telespar,30x30,None,Square Post,2005,Warning,none"))
    assert(values(ReferenceOps.filterFieldEq(6, "Punched Telespar")(wrongPos)).isEmpty)
  }

  test("probe 3.6: field-eq filter silently drops rows with <7 fields") {
    val in = lines(Seq("Punched Telespar,a,b"))
    assert(values(ReferenceOps.filterFieldEq(6, "Punched Telespar")(in)).isEmpty)
  }

  test("probe 3.7: projection of fields 2,3 rejoined with comma") {
    val got = values(ReferenceOps.projectFields(Seq(2, 3))(lines(probeBatch)))
    assert(got == Seq("1001,Stop", "1002,Yield", "1003,Speed", "1004,Stop2", "1005,Warn", "1006,Warn2"))
  }

  test("probe 3.9: naive comma split — quotes NOT honored") {
    val got = values(ReferenceOps.projectFields(Seq(2, 3))(lines(Seq("\"x,y\",b,c,d,e"))))
    assert(got == Seq("b,c"))
  }

  test("probe 3.10/3.14: short rows silently dropped by projection") {
    val got = values(ReferenceOps.projectFields(Seq(2, 3))(
      lines(Seq("a,b,c,d,e", "x,y", "p,q,r,s,t"))))
    assert(got == Seq("c,d", "r,s"))
    assert(values(ReferenceOps.projectFields(Seq(2, 3))(lines(Seq("a,b,c")))).isEmpty)
  }

  test("probe 3.16: empty fields at target indexes survive projection") {
    val got = values(ReferenceOps.projectFields(Seq(2, 3))(lines(Seq("a,b,,,e,f,g,h,i,j"))))
    assert(got == Seq(","))
  }

  test("probe 3.8/3.13/3.15: group-count on field 8, short rows dropped") {
    val got = ReferenceOps.groupCountField(8)(lines(probeBatch))
      .orderBy("key").as[(String, Long)].collect().toSeq
    assert(got == Seq("Other" -> 1L, "Regulatory" -> 1L, "Stop" -> 1L, "Warning" -> 3L))
    val mixed = ReferenceOps.groupCountField(8)(
      lines(Seq("a,b,c,d,e,f,g,h,K1", "a,b,c,d,e,f,g,h", "a,b,c,d,e,f,g,h,K2")))
      .orderBy("key").as[(String, Long)].collect().toSeq
    assert(mixed == Seq("K1" -> 1L, "K2" -> 1L))
  }

  test("probe 3.16: empty group key is counted, not dropped") {
    val got = ReferenceOps.groupCountField(8)(lines(Seq("a,b,c,d,e,f,g,h,")))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq("" -> 1L))
  }

  test("probe 3.12: trailing empty line flows through and is dropped by ops") {
    val in = lines(Seq("Punched,x", ""))
    assert(values(ReferenceOps.filterContains("Punched")(in)) == Seq("Punched,x"))
    assert(values(ReferenceOps.projectFields(Seq(2, 3))(lines(Seq("")))).isEmpty)
  }

  test("dedupFirst keeps exactly the arg-min row per key") {
    val df = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"))
      .toDF("k", "ord", "payload")
    val got = ReferenceOps.dedupFirst(Seq("k"), Seq(col("ord")))(df)
      .orderBy("k").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 5L, "b"), (2L, 7L, "c")))
  }
}
