package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate — the mergeable-sketch capability class: partial sketches
  * build map-side, merge associatively across partitions, and the
  * estimate is read out once at the end. At 100 TB a grouped distinct
  * count shuffles k longs per (partition × group) instead of every
  * distinct value (the exact x16 two-shuffle spelling), trading a
  * known ±1/√(k−1) relative error (Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM 2002).
  *
  * Determinism contract (what makes this oracle-checkable, unlike
  * HLL++): the input is an already-hashed LongType column (the query
  * supplies `(a·x + b) mod P`, P = 1e9+7), the sketch keeps the k
  * smallest DISTINCT hashes, and the estimate is integer arithmetic —
  * `m` exact when m < k, else `(k−1)·P div h_k` — so DuckDB reproduces
  * it bit-for-bit with `list_sort(list(DISTINCT h))[k]`.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    hashSpace: Long = KmvDistinct.P,
    emitValues: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv needs k >= 2, got $k")

  // emitValues=true returns the SKETCH (the ≤k smallest distinct
  // hashes, ascending) instead of the estimate — the mergeable form
  // set-algebra consumers (x71's intersection estimator) operate on.
  // Estimates stay the default so x20/x50/x66 are unchanged.
  override def dataType: DataType =
    if (emitValues) org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    else LongType
  override def nullable: Boolean = false

  // SQL-registered (GraftFunctions): a wrong argument type must be an
  // analysis error, not an executor ClassCastException — same contract
  // as BloomAgg/MisraGries
  override def checkInputDataTypes() =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct needs a BIGINT hash column, got ${child.dataType}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def trim(buf: java.util.TreeSet[java.lang.Long]): Unit =
    while (buf.size > k) buf.pollLast()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // only insert if it could enter the k smallest (cheap reject for
      // the common case once the sketch is saturated)
      if (buf.size < k || h < buf.last()) { buf.add(h); trim(buf) }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2); trim(b1); b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (emitValues) {
      val arr = new Array[Long](buf.size)
      var i = 0
      buf.forEach { h => arr(i) = h; i += 1 } // TreeSet iterates ascending
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    } else if (buf.size < k) buf.size.toLong
    // Inputs are contracted to lie in (0, hashSpace); kmv_distinct is
    // SQL-registered over arbitrary expressions though, so clamp the
    // divisor — a 0 or negative k-th value (out-of-contract input)
    // must not throw ArithmeticException or return a negative count.
    else (k - 1).toLong * hashSpace / math.max(1L, buf.last())

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

object KmvDistinct {
  /** Hash space / modulus shared with the query-side hash and the
    * DuckDB oracle. */
  val P: Long = 1000000007L

  /** `kmv_distinct(hashCol, k)` as a Column aggregate. */
  def apply(c: Column, k: Int): Column =
    GraftShims.column(
      KmvDistinct(GraftShims.expression(c), k).toAggregateExpression())

  /** The sketch itself (≤k smallest distinct hashes, ascending) as a
    * Column aggregate — the mergeable form for sketch set algebra. */
  def values(c: Column, k: Int): Column =
    GraftShims.column(
      KmvDistinct(GraftShims.expression(c), k, emitValues = true).toAggregateExpression())
}
