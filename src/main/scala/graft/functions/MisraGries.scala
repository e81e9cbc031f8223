package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Misra–Gries frequent-items sketch as a native Catalyst aggregate —
  * the heavy-hitter capability class: k counters per partial, merged
  * associatively, with the guarantee that EVERY item of frequency
  * > n/(k+1) is present in the final candidate set (Misra & Gries,
  * "Finding repeated elements", Sci. Comput. Program. 1982; merge rule
  * from Agarwal et al., "Mergeable summaries", PODS 2012: sum counters
  * pairwise, then subtract the (k+1)-th largest count and drop the
  * non-positive — the combined sketch keeps the same error bound).
  *
  * At 100 TB this is the only way to ask "which keys are hot" without
  * shuffling every distinct key: each partition ships k (key, count)
  * pairs instead of its whole key set, and the driver-side candidate
  * array is at most k longs. The sketch alone over-approximates
  * (candidates may include sub-threshold keys, and its counts are
  * lower bounds); the x45 query therefore RECOUNTS candidates exactly
  * in a second scan whose aggregate state is bounded by k — so the
  * final answer is exact and deterministic even though partial-merge
  * order is not, which is what lets a plain GROUP BY ... HAVING oracle
  * gate it.
  *
  * eval() returns the candidate keys sorted ascending (array<long>);
  * counts are deliberately NOT exposed — they are merge-order-dependent
  * lower bounds, and the recount pass owns the exact numbers.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  // SQL-registered (GraftFunctions): wrong argument type must fail at
  // analysis, not as an executor ClassCastException (BloomMaybe's contract)
  override def checkInputDataTypes() =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"misra_gries needs a BIGINT key column, got ${child.dataType}")

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def update(buf: java.util.HashMap[Long, Long],
                      input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val c = buf.get(x)
      if (c != 0L || buf.containsKey(x)) buf.put(x, c + 1L)
      else if (buf.size < k) buf.put(x, 1L)
      else {
        // decrement-all step: every stored counter loses 1 (the classic
        // "cancel k+1 distinct items against each other" move)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(b1: java.util.HashMap[Long, Long],
                     b2: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val addIt = b2.entrySet().iterator()
    while (addIt.hasNext) {
      val e = addIt.next()
      // absent key unboxes to 0L, so this is get-or-zero + sum
      b1.put(e.getKey, b1.get(e.getKey) + e.getValue)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everyone, drop <= 0
      val counts = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val dec = counts(counts.length - (k + 1)) // (k+1)-th largest
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= dec) it.remove() else e.setValue(e.getValue - dec)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    val keys = new Array[Long](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[Long, Long](n * 2)
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** `misra_gries(keyCol, k)` as a Column aggregate returning the
    * candidate heavy keys (sorted array&lt;long&gt;). */
  def apply(c: Column, k: Int): Column =
    GraftShims.column(
      MisraGries(GraftShims.expression(c), k).toAggregateExpression())
}
