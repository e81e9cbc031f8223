package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.sources.Layout

/** The z-order layout claim, measured: a box predicate on two
  * dimensions touches FEW z-ordered files but ~ALL single-column-sorted
  * files. "Touches" is measured as the files that contain matching rows
  * (`input_file_name()` of the survivors) — exactly the files whose
  * min/max statistics can NOT exclude the box, i.e. the lower bound on
  * what any stats-based reader must read. */
class LayoutSpec extends AnyFunSuite with SparkSuite {

  test("z-order bounds the WORST filter dimension; a linear sort full-scans its off-dimension") {
    val dir = "/root/testdata/sf0.01"
    val files = 16
    // dims: user_id (0..149) × hour-of-month (0..719) — both uniform
    val ev = Tables.load(spark, dir, "events").select(
      col("user_id"),
      ((dayofmonth(col("ts")) - 1) * 24 + hour(col("ts"))).cast("long").as("h"),
      col("value"))
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    Layout.writeZOrdered(ev, "user_id", 149L, "h", 719L, s"$base/z", files)
    Layout.writeLinear(ev, "h", s"$base/linear", files)

    // the two single-dimension filter classes + their intersection box
    val userOnly = col("user_id").between(40, 59)            // 13 % of users
    val hourOnly = col("h").between(240, 335)                // 13 % of hours
    def touched(path: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
      val df = spark.read.parquet(path).where(pred)
      (df.count(), df.select(input_file_name()).distinct().count())
    }
    def report(name: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
      val (zr, zf) = touched(s"$base/z", pred)
      val (lr, lf) = touched(s"$base/linear", pred)
      assert(zr == lr && zr > 0, s"$name: layouts must hold the same data ($zr vs $lr)")
      info(f"$name%-9s rows=$zr%5d  files touched: z-order $zf%2d/$files, linear(h) $lf%2d/$files")
      (zf, lf)
    }
    val (zU, lU) = report("user-only", userOnly)
    val (zH, lH) = report("hour-only", hourOnly)
    val (zB, lB) = report("box", userOnly && hourOnly)
    // the h-sorted layout is unbeatable on its own column but FULL-SCANS
    // the user filter; z-order tiles both dims, so its worst single-dim
    // class is bounded — that asymmetry is the whole point of the curve.
    // Margins, not exact counts: the file boundaries come from the range
    // partitioner's reservoir sample over whatever distribution the
    // driver regenerated, so a couple of files either way is sampling
    // noise, while the claims below survive any realistic skew.
    assert(lU >= files - 2, s"h-sorted layout should ~full-scan a user filter, touched $lU/$files")
    assert(math.max(zU, zH) < math.max(lU, lH),
      s"z-order worst dim $zU/$zH should beat linear worst dim $lU/$lH")
    assert(zU <= files / 2 + 1 && zH <= files / 2 + 1,
      s"each z single-dim class should stay near half the files (got $zU, $zH)")
    // the 2-dim box intersects only the tiles both ranges share (the
    // subset relation zB <= min(zU, zH) is structural; vs linear allow
    // a 2-file sampling margin)
    assert(zB <= math.min(zU, zH) && zB <= lB + 2,
      s"box: z-order $zB files vs linear $lB — tiles not intersecting")
  }

  test("ZOrder2 expression: interleave is monotone-local and clamps out-of-range") {
    import spark.implicits._
    import graft.functions.ZOrder2
    // known bit patterns: (1,0) -> bit 0, (0,1) -> bit 1
    assert(ZOrder2.interleave(1L, 0L) == 1L)
    assert(ZOrder2.interleave(0L, 1L) == 2L)
    assert(ZOrder2.interleave(3L, 3L) == 15L)
    // saturating clamp, not wraparound
    assert(ZOrder2.interleave(-5L, 0L) == ZOrder2.interleave(0L, 0L))
    assert(ZOrder2.interleave(1L << 40, 0L) == ZOrder2.interleave(0xffffL, 0L))
    // expression == object semantics over a dataframe (codegen path)
    val df = Seq((5L, 9L), (0L, 0L), (65535L, 65535L)).toDF("a", "b")
      .select(ZOrder2($"a", $"b").as("z"))
    assert(df.as[Long].collect().toSeq ==
      Seq(ZOrder2.interleave(5L, 9L), 0L, ZOrder2.interleave(65535L, 65535L)))
  }
}
