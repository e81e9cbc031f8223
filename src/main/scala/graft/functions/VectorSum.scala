package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Elementwise VECTOR SUM over an `array<float>` embedding column as a
  * native mergeable aggregate — the grouped-centroid capability
  * (class prototypes, cluster-mean updates, per-source embedding
  * drift): partial buffers build map-side and merge by elementwise
  * addition, so each partition ships ONE d-length long vector (plus a
  * count) per group it saw, instead of the posexplode spelling's
  * rows × d (pos, value) stream through the shuffle. At 100 TB the
  * exchange carries groups × (8d + 8) bytes — megabytes — while the
  * elementwise adds stay a scan.
  *
  * Determinism contract (the fourth mergeable sketch, same story as
  * KMV/Misra–Gries/Bloom): components quantize to integer micro-units
  * FIRST — round-half-away-from-zero of x·10⁶, the same rounding SQL
  * `round()` applies in both engines — so the buffer is an exact
  * integer vector, addition is associative in any merge order, and the
  * DuckDB twin (explode + grouped integer SUM) reproduces every
  * component bit-for-bit. Buffer state: slot 0 = row count, slots
  * 1..d = component sums; d is fixed by the first vector seen and
  * enforced on every later one (a ragged corpus is a data bug worth
  * failing loudly on, not averaging over).
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_sum needs an array<float> argument, got $other")
    }

  /** Empty marker; real buffer allocated on first update (d unknown
    * until then). */
  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  /** SQL round() semantics: half away from zero (both engines).
    * Deliberately BigDecimal HALF_UP — identical to Spark's round()
    * and DuckDB's round(). The floor(x + 0.5) shortcut DOUBLE-ROUNDS:
    * scaled = 0.49999999999999994 (largest double < 0.5) + 0.5 is
    * exactly 1.0 in binary64, so the shortcut yields 1 where both SQL
    * engines yield 0 — a measure-zero divergence on real data, but the
    * determinism contract here is "bit-identical to round()", so the
    * kernel mirrors the engine implementation exactly. */
  private def quantize(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1000000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.isEmpty) new Array[Long](d + 1) else buf
    require(b.length == d + 1,
      s"vector_sum: ragged input — expected ${b.length - 1} dims, got $d")
    b(0) += 1L
    var k = 0
    while (k < d) {
      b(k + 1) += quantize(arr.getFloat(k).toDouble)
      k += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.isEmpty) return b1
    if (b1.isEmpty) return b2
    require(b1.length == b2.length,
      s"vector_sum: ragged merge — ${b1.length - 1} vs ${b2.length - 1} dims")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  /** [count, sum_1 .. sum_d] — consumers derive means with one
    * division, keeping the aggregate's output exact integers. */
  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(if (buf.isEmpty) Array(0L) else buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}

object VectorSumAgg {
  /** `vector_sum(embedding)` as a Column aggregate: returns
    * [count, Σq_1 .. Σq_d] in integer micro-units. */
  def apply(c: Column): Column =
    GraftShims.column(
      VectorSumAgg(GraftShims.expression(c)).toAggregateExpression())
}
