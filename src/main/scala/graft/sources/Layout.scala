package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, greatest, least, lit}

import graft.functions.ZOrder2

/** Data-layout tools: HOW rows are arranged in files decides how much
  * of a 100 TB table a selective query reads. [[Bucketing]] covers the
  * join side (co-located hash layout); this covers the FILTER side —
  * multi-dimensional clustering so that file- and row-group-level
  * min/max statistics prune scans on EITHER (or both) of two
  * dimensions.
  *
  * The problem with a single-column sort: files are tight on the sort
  * column and random on every other, so a filter on the second
  * dimension reads the whole table. A Z-order (Morton) sort interleaves
  * the bits of both dimensions ([[graft.functions.ZOrder2]]), so each
  * file covers a small RECTANGLE of the (a, b) space — both columns'
  * per-file min/max ranges are narrow, and a box predicate touches only
  * the files whose rectangle intersects it (the Delta/Iceberg
  * `OPTIMIZE ZORDER BY` capability, Spark-native). LayoutSpec measures
  * exactly that: the same box filter's matching rows concentrate in a
  * few z-files but spread over ~all time-sorted files.
  */
object Layout {

  /** The z-key column for two non-negative integral dimensions, each
    * min-max scaled to the full 16-bit range first. WITHOUT scaling,
    * the wider dimension owns the curve's high bits and the narrower
    * one degenerates to a minor sort key (measured on events: user_id
    * spans 8 bits vs 10 for hour-of-month, and the unscaled curve
    * clustered hours only) — the same reason production ZORDER
    * implementations bin by rank/percentile before interleaving.
    * Values are clamped into [0, max] BEFORE the scale multiply: for
    * dims above ~1.4e14 the raw `a * 65535` would overflow Long to
    * negative and ZOrder2's saturating clamp would then send the row to
    * the curve ORIGIN instead of the top — the opposite of the
    * documented saturate-not-wrap intent. The clamp alone is not
    * enough when CMAX itself exceeds Long.MaxValue/65535 (the product
    * of in-range values still wraps), so huge dimensions take a
    * divide-FIRST path: `clamped / (cmax/65535 + 1)` never overflows
    * and stays in [0, 65535]. Note this is an overflow-safe APPROXIMATE
    * binning, not the identical binning computed in the other order:
    * its bucket boundaries differ slightly from `clamped*65535/cmax`
    * and its top bucket is 65534 — but it is monotone in the input,
    * which is all z-order clustering needs. */
  def zkey(a: Column, amax: Long, b: Column, bmax: Long): Column = {
    def scaled(c: Column, cmax: Long): Column = {
      val m = math.max(1L, cmax)
      val clamped = greatest(lit(0L), least(c.cast("long"), lit(m)))
      if (m <= Long.MaxValue / 65535L) (clamped * 65535L / m).cast("long")
      else (clamped / (m / 65535L + 1L)).cast("long")
    }
    ZOrder2(scaled(a, amax), scaled(b, bmax))
  }

  /** Rewrite `df` into `files` parquet files z-ordered on (a, b):
    * range-partition by the z-key (a sampled range split, the same
    * machinery as a global ORDER BY — one shuffle), sort within each
    * file, drop the key. Files then tile the space-filling curve:
    * row-group and file statistics on BOTH dimensions are narrow.
    * `amax`/`bmax` are the dimensions' value ceilings (in production,
    * from table stats). */
  def writeZOrdered(df: DataFrame, a: String, amax: Long, b: String, bmax: Long,
                    path: String, files: Int = 16): Unit =
    df.withColumn("__z", zkey(col(a), amax, col(b), bmax))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** The baseline layout the z-order is measured against: same file
    * count, rows ordered by a SINGLE column (the "natural" arrival
    * or time order every unoptimized table has). */
  def writeLinear(df: DataFrame, orderCol: String,
                  path: String, files: Int = 16): Unit =
    df.repartitionByRange(files, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite").parquet(path)
}
