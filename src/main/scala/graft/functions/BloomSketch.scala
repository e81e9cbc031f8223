package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Deterministic Bloom filter over already-hashed keys — the
  * membership-sketch capability class: a 1 Mbit (128 KB) bit array
  * with k = 2 positions per key, built as a mergeable aggregate
  * (partials OR together, so build is one map-side pass) and probed
  * with [[BloomMaybe]]. The 100 TB role is the INGEST PRE-FILTER: "is
  * this key possibly in the base corpus" answered by shipping a
  * 128 KB artifact to every scan task instead of shuffling the base
  * key set — false positives (bounded by the standard
  * (1−e^(−kn/m))^k: ~0.7 % at d10's sf0.1 cardinality of ~44 k keys,
  * vanishing below) are then confirmed exactly on the small
  * maybe-set, false negatives impossible.
  *
  * Unlike Spark's built-in `bloom_filter_agg` (xxhash64-seeded, not
  * reproducible outside the JVM), the two probe positions are plain
  * integer arithmetic over the caller's hash —
  * `p1 = h mod m`, `p2 = (a·h + b) mod P mod m` — so the DuckDB oracle
  * regenerates the exact bit set and the sketch's answer is
  * hash-gated, not just unit-tested.
  */
object BloomSketch {
  val MBits = 1048576
  val MixA = 48271L
  val MixB = 11L
  val P: Long = 1000000007L

  def pos1(h: Long): Int = (((h % MBits) + MBits) % MBits).toInt
  def pos2(h: Long): Int =
    ((((MixA * h + MixB) % P + P) % P % MBits).toInt)

  def maybe(bits: Array[Byte], h: Long): Boolean = {
    val p1 = pos1(h); val p2 = pos2(h)
    ((bits(p1 >> 3) >> (p1 & 7)) & 1) == 1 &&
      ((bits(p2 >> 3) >> (p2 & 7)) & 1) == 1
  }
}

/** `bloom_agg(hashCol)` — build the 128 KB filter; merge = bitwise OR. */
case class BloomAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {
  import BloomSketch._

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  // SQL-registered (GraftFunctions), so a wrong argument type must be an
  // analysis error, not an executor ClassCastException — same contract
  // as BloomMaybe/GramHashes
  override def checkInputDataTypes() =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_agg needs a BIGINT hash column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](MBits / 8)

  private def set(bits: Array[Byte], p: Int): Unit =
    bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte

  override def update(bits: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      set(bits, pos1(h)); set(bits, pos2(h))
    }
    bits
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  override def eval(bits: Array[Byte]): Any = bits
  override def serialize(bits: Array[Byte]): Array[Byte] = bits
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

object BloomAgg {
  def apply(c: Column): Column =
    GraftShims.column(BloomAgg(GraftShims.expression(c)).toAggregateExpression())
}

/** `bloom_maybe(filterBinary, hashCol)` — both probe bits set? */
case class BloomMaybe(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes() =
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_maybe needs (binary, bigint), got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(bits: Any, h: Any): Any =
    BloomSketch.maybe(bits.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomSketch.maybe($b, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMaybe =
    copy(left = newLeft, right = newRight)
}

object BloomMaybe {
  def apply(f: Column, h: Column): Column =
    GraftShims.column(BloomMaybe(GraftShims.expression(f), GraftShims.expression(h)))
}
