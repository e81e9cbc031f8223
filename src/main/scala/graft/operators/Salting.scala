package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys (prompt/SURVEY: "skewed keys → salting or
  * AQE skew-join"). AQE splits skewed SHUFFLE JOIN partitions on its
  * own; what it does not rewrite is a skewed aggregation whose single
  * hot group lands on one reducer. `saltedAgg` is the classic two-phase
  * rewrite:
  *
  *   groupBy(key)            ⇒ groupBy(key, salt) → partial combine
  *                             groupBy(key)       → final combine
  *
  * The salt is `pmod(hash(all columns), n)` — deterministic (re-runs and
  * retries see the same salt, keeping the plan idempotent), uniform
  * enough to spread a hot key over n reducers. Correct for any algebraic
  * aggregate supplied as (partial, merge) pairs; exposed here for the
  * common count/sum cases.
  */
object Salting {

  /** The salt hashes an explicit column set (`saltBy`), not the whole
    * row: hashing every column would reference every column and defeat
    * column pruning — the scan of an 11-column fact table would read
    * all 11 to count one. Pass row-identity columns (any set that
    * varies WITHIN a key); empty `saltBy` falls back to all columns. */
  private def saltCol(df: DataFrame, saltBy: Seq[String], n: Int): Column = {
    val src = if (saltBy.nonEmpty) saltBy else df.columns.toSeq
    pmod(hash(src.map(col): _*), lit(n))
  }

  /** Two-phase salted count per key set. Result == groupBy(keys).count()
    * (pinned by SaltingSpec) with the hot key's partial counts spread
    * over `n` reducers in phase 1. */
  def saltedGroupCount(keys: Seq[String], n: Int = 16,
                       saltBy: Seq[String] = Seq.empty)(df: DataFrame): DataFrame =
    df.withColumn("__salt", saltCol(df, saltBy, n))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("cnt"))

  /** Two-phase salted sum of `value` per key set. */
  def saltedGroupSum(keys: Seq[String], value: String, n: Int = 16,
                     saltBy: Seq[String] = Seq.empty)(df: DataFrame): DataFrame =
    df.withColumn("__salt", saltCol(df, saltBy, n))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(value)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$value"))

  /** Salted inner equi-join for a skewed LEFT (fact) side — the classic
    * replicate-the-build-side rewrite that AQE's skew-split performs at
    * runtime, spelled explicitly for engines/paths where AQE cannot see
    * the skew (a first shuffle whose stats AQE never gets, or a key so
    * hot that one reducer would still own it after coalescing):
    *
    *   fact:  salt = pmod(hash(saltBy), n)     — hot key spread over n
    *   dim:   replicated once per salt value   — n small copies
    *   join on (key, salt), salt dropped after
    *
    * Equivalent to `left.join(right, leftKey === rightKey)` for inner
    * joins (pinned by SkewSpec); the dim side grows n×, so use it when
    * the dim is broadcast-small-ish but the join must still shuffle
    * (e.g. the dim outgrew the broadcast threshold). Cost model at
    * 100 TB: the fact side shuffles once either way; the rewrite buys a
    * bounded max-reducer at the price of n× the (small) dim bytes.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String, n: Int = 16,
                 saltBy: Seq[String] = Seq.empty): DataFrame = {
    val fact = left.withColumn("__salt", saltCol(left, saltBy, n))
    val dim = right.withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    fact.join(dim,
        fact(leftKey) === dim(rightKey) && fact("__salt") === dim("__salt"))
      .drop("__salt")
  }
}
