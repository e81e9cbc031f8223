package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions with whole-stage codegen — the
  * preference-order step (b) of SURVEY §7: used where a builtin
  * composition would either break semantics or cost too much.
  *
  * Both expressions generate straight-line Java in `doGenCode`, so they
  * stay inside WholeStageCodegen spans instead of falling back to
  * interpreted eval (a Scala UDF would box every row and block codegen).
  */

/** FNV-1a 32-bit hash of a string's UTF-8 bytes — the reference's
  * consistent-hash placement function (utils/utils.go:8-14: files map to
  * the first ring member with HostHash >= fnv1a(filename)). Capability
  * parity for every place the reference makes hashing semantically
  * visible (O12).
  *
  * Returns the hash as an unsigned 32-bit value widened to LongType
  * (Go's uint32 has no JVM twin).
  */
case class Fnv1a32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fnv1a32 needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Fnv1a32.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        byte[] $bytes = $c.getBytes();
        long $h = 2166136261L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $h = ($h ^ ($bytes[$i] & 0xffL)) * 16777619L & 0xffffffffL;
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv1a32 =
    copy(child = newChild)
}

object Fnv1a32 {
  def hash(bytes: Array[Byte]): Long = {
    var h = 2166136261L
    var i = 0
    while (i < bytes.length) {
      h = ((h ^ (bytes(i) & 0xffL)) * 16777619L) & 0xffffffffL
      i += 1
    }
    h
  }
  def apply(c: Column): Column = GraftShims.column(Fnv1a32(GraftShims.expression(c)))
}

/** Cosine similarity between two array<float> columns, computed in
  * double precision with a single fused loop — one pass over both
  * arrays for dot product and both norms, vs three separate
  * zip_with+aggregate array traversals (plus their per-element lambda
  * dispatch) in the builtin composition. Null if either array is null;
  * arrays must have equal length (mismatch throws, same as zip_with
  * would silently zip-pad — a mismatch is a data bug, surface it).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if (Seq(left, right).forall(_.dataType match {
          case ArrayType(FloatType, _) => true; case _ => false }))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity needs two array<float> arguments, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(b.numElements() == n,
      s"cosine_similarity: length mismatch ${n} vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $n = $a.numElements();
        if ($b.numElements() != $n) {
          throw new IllegalArgumentException(
            "cosine_similarity: length mismatch " + $n + " vs " + $b.numElements());
        }
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $a.getFloat($i);
          double $y = (double) $b.getFloat($i);
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        ${ev.value} = $dot / java.lang.Math.sqrt($na) / java.lang.Math.sqrt($nb);
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

object CosineSimilarity {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(CosineSimilarity(
      GraftShims.expression(a), GraftShims.expression(b)))
}

/** Polynomial rolling hash over a string's code points:
  * `h = fold(0, cp => (h*257 + cp) mod 1e9+7)` — the codegen twin of
  * [[TextPrimitives.rollingHashSpark]]'s builtin spelling (which runs
  * interpreted: higher-order functions are CodegenFallback). Exactly the
  * same integer math, so results are oracle-identical; ~100× less
  * per-row overhead. Folds over CODE POINTS (like ascii()/ord()), not
  * UTF-8 bytes, to match the SQL spec on non-ASCII input.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"poly_hash needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
        java.lang.String $s = $c.toString();
        long $h = 0L;
        for (int $i = 0; $i < $s.length(); ) {
          int $cp = $s.codePointAt($i);
          $i += java.lang.Character.charCount($cp);
          $h = ($h * 257L + $cp) % 1000000007L;
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 257L + cp) % 1000000007L
    }
    h
  }
  def apply(c: Column): Column = GraftShims.column(PolyHash(GraftShims.expression(c)))
}

/** 30-bit SimHash of an array<long> of feature hashes: bit j is set iff
  * a strict majority of features have bit j set. One fused loop with a
  * counter array in generated Java, vs 30 interpreted ArrayFilter passes
  * in the builtin spelling (which made the fingerprint ~1000× slower
  * and dominated the whole benchmark). Output matches the SQL spec
  * bit-for-bit.
  */
case class SimHash30(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType match { case ArrayType(LongType, _) => true; case _ => false })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash30 needs an array<bigint> argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](30)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 30) { if (((h >> j) & 1L) == 1L) cnt(j) += 1; j += 1 }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 30) { if (2 * cnt(j) > n) sim |= (1L << j); j += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sim = ctx.freshName("sim")
      s"""
        int $n = $c.numElements();
        int[] $cnt = new int[30];
        for (int $i = 0; $i < $n; $i++) {
          long $h = $c.getLong($i);
          for (int $j = 0; $j < 30; $j++) {
            if ((($h >> $j) & 1L) == 1L) $cnt[$j]++;
          }
        }
        long $sim = 0L;
        for (int $j = 0; $j < 30; $j++) {
          if (2 * $cnt[$j] > $n) $sim |= (1L << $j);
        }
        ${ev.value} = $sim;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash30 =
    copy(child = newChild)
}

object SimHash30 {
  def apply(c: Column): Column = GraftShims.column(SimHash30(GraftShims.expression(c)))
}

/** All distinct word-3-gram rolling hashes of a token array, fused:
  * equivalent to `array_distinct(transform(shingles(w), g ->
  * poly_hash(g)))` where each shingle is `w[i] + ' ' + w[i+1] + ' ' +
  * w[i+2]` — but computed in one generated loop without materializing
  * the shingle strings (the builtin spelling's transform+concat_ws runs
  * interpreted and allocates every shingle). Arrays shorter than 3
  * tokens yield an empty array. */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType match {
      case ArrayType(StringType, _) => true; case _ => false })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs an array<string> argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + 2 < n) {
      val g = arr.getUTF8String(i).toString + " " +
        arr.getUTF8String(i + 1).toString + " " + arr.getUTF8String(i + 2).toString
      out.add(PolyHash.hash(g))
      i += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(res)
  }

  // One call into the interpreted eval per ROW (not per element) is
  // already outside the hot loop; the win over the builtin spelling is
  // the fused per-element work, which lives in nullSafeEval's tight
  // Java loop either way.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(c: Column): Column = GraftShims.column(ShingleHashes(GraftShims.expression(c)))
}

/** POSITIONAL word-`width`-gram rolling hashes of a token array: one
  * hash per starting position `i` in 0..n-width, order-preserving and
  * NOT deduplicated — `gs[i]` is the hash of `w[i] + ' ' + ... +
  * w[i+width-1]`, so array index IS span position. [[ShingleHashes]]'s
  * distinct-set output serves set-similarity (jaccard/minhash); span
  * dedup (d9) needs the position structure — which span of WHICH doc is
  * duplicated — so this keeps every occurrence. Arrays shorter than
  * `width` yield an empty array. Same fused per-row loop as the other
  * text kernels; equivalent builtin spelling
  * `transform(sequence(1, size(w)-width+1), i -> poly_hash(concat_ws(' ',
  * slice(w, i, width))))` is pinned in ExpressionsSpec. */
case class GramHashes(child: Expression, width: Int) extends UnaryExpression {
  require(width >= 1, s"gram_hashes needs width >= 1, got $width")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType match {
      case ArrayType(StringType, _) => true; case _ => false })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gram_hashes needs an array<string> argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - width + 1
    if (m <= 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < width) {
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = PolyHash.hash(sb.toString)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("gramHashes", this, classOf[GramHashes].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  def apply(c: Column, width: Int): Column =
    GraftShims.column(GramHashes(GraftShims.expression(c), width))
}

/** Apply a span MASK to a token array: given the tokens and the SORTED,
  * distinct start offsets of duplicated `width`-gram spans (d11's
  * manifest rows for one doc), drop every token covered by any masked
  * span — the union of [s, s+width-1] intervals — and rebuild the text
  * as the kept tokens joined by single spaces. One linear two-pointer
  * walk per row (tokens and starts advance together, overlapping spans
  * merge for free in `maskedUntil`); the builtin spelling is a per-token
  * `exists()` over the starts list — O(tokens × spans) interpreted
  * lambda calls (equivalence pinned in ExpressionsSpec). This is the CUT
  * step of Lee et al.'s dedup pipeline (ExactSubstr → cut), the d11
  * consumer. */
case class SpanCut(left: Expression, right: Expression, width: Int)
  extends BinaryExpression {
  require(width >= 1, s"span_cut needs width >= 1, got $width")
  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if ((left.dataType match {
      case ArrayType(StringType, _) => true; case _ => false }) &&
      (right.dataType match {
        case ArrayType(LongType, _) => true; case _ => false }))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"span_cut needs (array<string>, array<bigint>), got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(tokens: Any, starts: Any): Any = {
    val w = tokens.asInstanceOf[ArrayData]
    val s = starts.asInstanceOf[ArrayData]
    val n = w.numElements()
    val m = s.numElements()
    val sb = new java.lang.StringBuilder()
    var maskedUntil = -1L
    var first = true
    var i = 0
    var j = 0
    while (i < n) {
      while (j < m && s.getLong(j) <= i) {
        val end = s.getLong(j) + width - 1
        if (end > maskedUntil) maskedUntil = end
        j += 1
      }
      if (i > maskedUntil) {
        if (!first) sb.append(' ')
        sb.append(w.getUTF8String(i).toString)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) => {
      val expr = ctx.addReferenceObj("spanCut", this, classOf[SpanCut].getName)
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $expr.nullSafeEval($t, $s);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCut =
    copy(left = newLeft, right = newRight)
}

object SpanCut {
  def apply(tokens: Column, starts: Column, width: Int): Column =
    GraftShims.column(SpanCut(
      GraftShims.expression(tokens), GraftShims.expression(starts), width))
}

/** Morton (Z-order) key of two non-negative long columns: the low 16
  * bits of each input, bit-interleaved (a's bits at even positions) —
  * a space-filling-curve key whose SORT ORDER clusters rows that are
  * close in BOTH dimensions, so a range/sort layout on the key gives
  * multi-dimensional data skipping from one-dimensional file and
  * row-group min/max statistics (the Delta/Iceberg OPTIMIZE ZORDER
  * capability, as a plain deterministic expression). Inputs are
  * clamped into [0, 2^16): out-of-range dimension values saturate
  * rather than wrap — a saturated key still sorts adjacent to its
  * neighbors, while wraparound would teleport it across the curve. */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder2 needs two bigint arguments, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder2.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Saturating 16-bit clamp + bit interleave (a even, b odd bits). */
  def interleave(a: Long, b: Long): Long = {
    val ca = math.min(math.max(a, 0L), 0xffffL)
    val cb = math.min(math.max(b, 0L), 0xffffL)
    var out = 0L
    var i = 0
    while (i < 16) {
      out |= ((ca >> i) & 1L) << (2 * i)
      out |= ((cb >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  def apply(a: Column, b: Column): Column =
    GraftShims.column(ZOrder2(GraftShims.expression(a), GraftShims.expression(b)))
}

/** All 16 MinHash signatures `min over ids of (a_k*x + b_k) mod P` in a
  * single generated pass over the id array — vs 16 interpreted
  * transform+array_min traversals. Constants are
  * [[TextPrimitives.minhashAB]], baked into the generated code, so the
  * DuckDB oracle regenerates identical signatures. Empty input → null
  * (array_min of an empty array is null in the builtin spelling too). */
case class MinHash16(child: Expression) extends UnaryExpression {
  import TextPrimitives.{minhashAB, P}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes() =
    if (child.dataType match {
      case ArrayType(LongType, _) => true; case _ => false })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash16 needs an array<bigint> argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(16)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var k = 0
      while (k < 16) {
        val (a, b) = minhashAB(k)
        val h = (a * x + b) % P
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val as = minhashAB.map(_._1).mkString(", ")
    val bs = minhashAB.map(_._2).mkString(", ")
    val aArr = ctx.addMutableState("long[]", "mhA", v => s"$v = new long[]{$as};")
    val bArr = ctx.addMutableState("long[]", "mhB", v => s"$v = new long[]{$bs};")
    val n = ctx.freshName("n")
    val mins = ctx.freshName("mins")
    val i = ctx.freshName("i")
    val k = ctx.freshName("k")
    val x = ctx.freshName("x")
    val h = ctx.freshName("h")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        int $n = $c.numElements();
        if ($n == 0) {
          ${ev.isNull} = true;
        } else {
          long[] $mins = new long[16];
          java.util.Arrays.fill($mins, Long.MAX_VALUE);
          for (int $i = 0; $i < $n; $i++) {
            long $x = $c.getLong($i);
            for (int $k = 0; $k < 16; $k++) {
              long $h = ($aArr[$k] * $x + $bArr[$k]) % ${P}L;
              if ($h < $mins[$k]) $mins[$k] = $h;
            }
          }
          ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($mins);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash16 =
    copy(child = newChild)
}

object MinHash16 {
  def apply(c: Column): Column = GraftShims.column(MinHash16(GraftShims.expression(c)))
}

/** Sign-random-projection LSH bucket (0..255) of an array<float>
  * embedding: 8 hyperplanes whose weights come from the literal LCG
  * `u = (1103515245·(p·64+k) + 12345) mod 2^31`, `w = u/2^31 − 0.5` —
  * the codegen twin of the builtin spelling in
  * [[graft.queries.AnnQueries]] (which runs interpreted: ~1M lambda
  * dispatches per 2000-vector scan). Same double accumulation order ⇒
  * identical buckets, pinned by test. */
case class LshBucket8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket8 needs an array<float> argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0L
    var p = 0
    while (p < 8) {
      var s = 0.0
      var k = 0
      while (k < n) {
        val u = (1103515245L * (p * 64 + k) + 12345L) % 2147483648L
        s += (u.toDouble / 2147483648.0 - 0.5) * arr.getFloat(k).toDouble
        k += 1
      }
      if (s > 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val u = ctx.freshName("u")
      s"""
        int $n = $c.numElements();
        long $bucket = 0L;
        for (int $p = 0; $p < 8; $p++) {
          double $s = 0.0;
          for (int $k = 0; $k < $n; $k++) {
            long $u = (1103515245L * ($p * 64 + $k) + 12345L) % 2147483648L;
            $s += ((double) $u / 2147483648.0 - 0.5) * (double) $c.getFloat($k);
          }
          if ($s > 0.0) $bucket |= (1L << $p);
        }
        ${ev.value} = $bucket;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket8 =
    copy(child = newChild)
}

object LshBucket8 {
  def apply(c: Column): Column = GraftShims.column(LshBucket8(GraftShims.expression(c)))
}

/** Banded sign-random-projection signatures of an array<float>
  * embedding: `bands` band values, each packing `bits` hyperplane signs
  * (plane index p = band·bits + j). Plane weights come from an
  * LCG→xorshift→LCG integer mix of n = p·dims+k:
  * `u₁ = (1103515245·n + 12345) mod 2³¹`, `u₂ = u₁ xor (u₁ >> 16)`,
  * `u₃ = (1103515245·u₂ + 12345) mod 2³¹`, `w = u₃/2³¹ − 0.5`.
  * The xorshift step matters: raw consecutive LCG outputs lie on a
  * coarse lattice (Marsaglia, "Random numbers fall mainly in the
  * planes"), which correlates the hyperplanes and was measured to cost
  * ~25 points of recall; every operation stays in non-overflowing
  * BIGINT arithmetic so the DuckDB oracle regenerates identical planes.
  *
  * This is the LSH-banding amplification (Leskovec/Rajaraman/Ullman,
  * "Mining of Massive Datasets" ch.3) applied to SRP: two vectors are
  * candidates iff ANY band matches exactly. With per-plane agreement
  * probability p = 1 − θ/π, candidate probability is
  * 1 − (1 − p^bits)^bands, while a non-matching random pair (p ≈ ½)
  * collides with probability ≈ 1 − (1 − 2^−bits)^bands — `bits` buys
  * precision, `bands` buys recall back; the regime-specific tuning
  * table lives at the call site ([[graft.queries.AnnQueries]]'s
  * s3Bands/s3Bits). One fused loop over all bands·bits planes in
  * generated Java.
  */
case class LshBandSigs(child: Expression, bands: Int, bits: Int, dims: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lsh_band_sigs needs an array<float> argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // the weight formula strides by `dims`; an embedding of a different
    // length would silently reuse LCG inputs across adjacent planes
    // (re-correlating the hyperplanes), so a mismatch is an error
    require(n == dims,
      s"lsh_band_sigs: embedding has $n dims, expression built for $dims")
    val w = LshBandSigs.weights(bands, bits, dims)
    // hoist the embedding out of ArrayData ONCE: the plane loops read
    // every element bands·bits times, and going through the ArrayData
    // interface (virtual dispatch + float→double per read) on each of
    // those reads dominates the kernel — a local double[] turns the
    // inner loop into a pure array dot product the JIT can vectorize
    val v = new Array[Double](n)
    var k0 = 0
    while (k0 < n) { v(k0) = arr.getFloat(k0).toDouble; k0 += 1 }
    val sigs = new Array[Long](bands)
    var g = 0
    while (g < bands) {
      var sig = 0L
      var j = 0
      while (j < bits) {
        val p = g * bits + j
        var s = 0.0
        var k = 0
        val base = p * n
        while (k < n) {
          s += w(base + k) * v(k)
          k += 1
        }
        if (s > 0.0) sig |= (1L << j)
        j += 1
      }
      sigs(g) = sig
      g += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The plane weights are row-constant: derive them ONCE per task via
    // the shared memoizing helper (bands·bits·dims LCG evaluations),
    // leaving a pure multiply-add dot product in the per-row loop —
    // measured 20× on the s3 signature scan vs deriving weights inline.
    val wField = ctx.addMutableState("double[]", "lshWeights", _ => "")
    // Per-row input copy, reused across rows (one allocation per task):
    // every element is read bands·bits times by the plane loops, and the
    // ArrayData read (interface dispatch + float→double) per access was
    // the kernel's real cost — with a plain double[] the innermost loop
    // is a contiguous dot product HotSpot auto-vectorizes. Measured
    // quiet at sf0.1 (isolated bench lines, min of two): s3
    // 2.77 → 1.71 s, s5 1.24 → 0.99 s. Accumulation order is unchanged,
    // so signatures stay bit-identical.
    val vField = ctx.addMutableState("double[]", "lshVec", _ => "")
    val n = ctx.freshName("n")
    val sigs = ctx.freshName("sigs")
    val g = ctx.freshName("g")
    val j = ctx.freshName("j")
    val p = ctx.freshName("p")
    val k = ctx.freshName("k")
    val s = ctx.freshName("s")
    val sig = ctx.freshName("sig")
    val base = ctx.freshName("base")
    // top-level Scala object -> class with static forwarders, callable
    // from generated Java by its plain name
    val helper = "graft.functions.LshBandSigsHelper"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        int $n = $c.numElements();
        if ($n != $dims) {
          throw new IllegalArgumentException(
            "lsh_band_sigs: embedding has " + $n + " dims, expression built for $dims");
        }
        if ($wField == null) {
          $wField = $helper.weights($bands, $bits, $dims);
        }
        if ($vField == null) {
          $vField = new double[$dims];
        }
        for (int $k = 0; $k < $n; $k++) {
          $vField[$k] = (double) $c.getFloat($k);
        }
        long[] $sigs = new long[$bands];
        for (int $g = 0; $g < $bands; $g++) {
          long $sig = 0L;
          for (int $j = 0; $j < $bits; $j++) {
            int $p = $g * $bits + $j;
            double $s = 0.0;
            int $base = $p * $n;
            for (int $k = 0; $k < $n; $k++) {
              $s += $wField[$base + $k] * $vField[$k];
            }
            if ($s > 0.0) $sig |= (1L << $j);
          }
          $sigs[$g] = $sig;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($sigs);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandSigs =
    copy(child = newChild)
}

object LshBandSigs {
  def apply(c: Column, bands: Int, bits: Int, dims: Int = 64): Column =
    GraftShims.column(LshBandSigs(GraftShims.expression(c), bands, bits, dims))

  /** Memoized plane-weight matrix (w[p·n + k] for plane p, dim k) from
    * the literal LCG→xorshift→LCG mix — the formula the DuckDB oracle
    * replicates. Thread-safe; one entry per (bands, bits, dims) shape. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()
  def weights(bands: Int, bits: Int, n: Int): Array[Double] =
    cache.computeIfAbsent((bands, bits, n), { _ =>
      val w = new Array[Double](bands * bits * n)
      var p = 0
      while (p < bands * bits) {
        var k = 0
        while (k < n) {
          // stride = dims: distinct LCG input per (plane, dim) pair
          val u1 = (1103515245L * (p * n + k) + 12345L) % 2147483648L
          val u2 = u1 ^ (u1 >> 16)
          val u3 = (1103515245L * u2 + 12345L) % 2147483648L
          w(p * n + k) = u3.toDouble / 2147483648.0 - 0.5
          k += 1
        }
        p += 1
      }
      w
    })
}

/** Java-callable twin for generated code (codegen cannot reference the
  * Scala companion's tupled cache signature directly). */
object LshBandSigsHelper {
  def weights(bands: Int, bits: Int, n: Int): Array[Double] =
    LshBandSigs.weights(bands, bits, n)
}

/** Squared L2 distance between an array<double> column (an IVF
  * centroid) and an array<float> column (an embedding), in one fused
  * codegen loop — the builtin `aggregate(zip_with(c, x, (a,b) ->
  * (a-b)*(a-b)), 0.0, +)` spelling is two interpreted higher-order
  * passes per pair. Same left-to-right fold order ⇒ bit-identical
  * doubles on non-null input, so the DuckDB oracle and the pinned
  * builtin spelling both still match; a null ELEMENT yields a null
  * distance (as the builtin's NULL propagation does), while a length
  * mismatch throws — a data bug, surfaced, the same stance as
  * [[CosineSimilarity]]. */
case class L2SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if ((left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(FloatType, _)) => true
      case _ => false })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2_sq needs (array<double>, array<float>), got ${left.dataType}, ${right.dataType}")

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(b.numElements() == n,
      s"l2_sq: length mismatch $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      // a null ELEMENT yields a null distance, matching the builtin
      // zip_with spelling ((cx - NULL) propagates NULL through the sum)
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        int $n = $a.numElements();
        if ($b.numElements() != $n) {
          throw new IllegalArgumentException(
            "l2_sq: length mismatch " + $n + " vs " + $b.numElements());
        }
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          double $d = $a.getDouble($i) - (double) $b.getFloat($i);
          $s += $d * $d;
        }
        if (!${ev.isNull}) { ${ev.value} = $s; }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SquaredDistance =
    copy(left = l, right = r)
}

object L2SquaredDistance {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(L2SquaredDistance(
      GraftShims.expression(a), GraftShims.expression(b)))
}

/** Count of BPE-pretokenizer-shaped tokens — matches of
  * `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` — in one pass over the string's
  * code points, without the regex engine or materializing every match
  * the way `size(regexp_extract_all(...))` must. Semantics pinned
  * against the regex spelling in tests (letter runs and digit runs
  * count once; any other non-whitespace code point counts alone; `\s`
  * is the regex default ASCII class). */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    BpeTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.BpeTokenCount.count($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  private def isLetter(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isDigit(b: Int): Boolean = b >= '0' && b <= '9'
  // java.util.regex default \s: [ \t\n\x0B\f\r]
  private def isWs(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Counts directly over the UTF-8 bytes — no String materialization
    * or UTF-16 decode per row: every classified character (letters,
    * digits, default-regex \s) is ASCII, and any non-ASCII code point
    * counts as one token (a multi-byte sequence = one lead byte +
    * skipped continuation bytes). */
  def count(s: UTF8String): Int = {
    val nb = s.numBytes()
    var n = 0
    var i = 0
    while (i < nb) {
      val b = s.getByte(i) & 0xff
      if (b < 0x80) {
        if (isLetter(b)) {
          n += 1
          while (i < nb && isLetter(s.getByte(i) & 0xff)) i += 1
        } else if (isDigit(b)) {
          n += 1
          while (i < nb && isDigit(s.getByte(i) & 0xff)) i += 1
        } else {
          if (!isWs(b)) n += 1
          i += 1
        }
      } else {
        // lead byte of a multi-byte code point: one token per code point
        n += 1
        i += UTF8String.numBytesForFirstByte(s.getByte(i))
      }
    }
    n
  }

  def count(s: String): Int = count(UTF8String.fromString(s))

  def apply(c: Column): Column = GraftShims.column(BpeTokenCount(GraftShims.expression(c)))
}

/** All character trigrams of the lowercased string, code-point-correct,
  * in one pass — the builtin `transform(sequence(1, n-2), i ->
  * substring(lower(text), i, 3))` spelling interprets one lambda per
  * trigram and re-evaluates lower() per element. Pinned against the
  * builtin spelling in tests; empty result below 3 code points. */
case class CharTrigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_trigrams needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    // code-point offsets (substring semantics are code-point-based in
    // both engines; identical to char offsets on ASCII/BMP input)
    val offs = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < s.length) { offs.add(i); i += Character.charCount(s.codePointAt(i)) }
    offs.add(s.length)
    val n = offs.size - 1
    if (n < 3) return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[UTF8String])
    val out = new Array[UTF8String](n - 2)
    var k = 0
    while (k < n - 2) {
      out(k) = UTF8String.fromString(s.substring(offs.get(k), offs.get(k + 3)))
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("charTrigrams", this, classOf[CharTrigrams].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
    copy(child = newChild)
}

object CharTrigrams {
  def apply(c: Column): Column = GraftShims.column(CharTrigrams(GraftShims.expression(c)))
}

/** Count of tokens that belong to a literal word set — the kernel
  * behind stopword scoring (language ID, quality score). The builtin
  * spelling `size(filter(w, t -> t IN (...)))` is a higher-order
  * function and therefore CodegenFallback: one interpreted lambda
  * dispatch per TOKEN per language. Here the set probe runs in a tight
  * Java loop against a prebuilt HashSet (one virtual call per ROW via
  * the ShingleHashes reference-object pattern), which cut t1's
  * four-language scan ~3× at sf0.1. */
case class StopHits(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes() =
    if (child.dataType match {
      case ArrayType(StringType, _) => true; case _ => false })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"stop_hits needs an array<string> argument, got ${child.dataType}")

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("stopHits", this, classOf[StopHits].getName)
      s"${ev.value} = (Integer) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): StopHits =
    copy(child = newChild)
}

/** Every stride-th single-space-delimited token of a string, rejoined
  * with single spaces — the codegen twin of
  * `concat_ws(' ', filter(transform(split(s, ' '), (t, i) -> ...), i % stride = 0).t)`.
  * The builtin spelling routes through ArrayTransform/ArrayFilter,
  * which are CodegenFallback (interpreted, one closure call per
  * element per row) and allocate the full token array plus a struct
  * per token just to throw 7/8 of it away; this walks the UTF-8 bytes
  * once and copies only the kept tokens. Byte-level split on 0x20 is
  * exact: a space byte never occurs inside a multi-byte UTF-8
  * sequence, and like `split` with its default -1 limit it keeps
  * empty tokens (consecutive/trailing spaces) so token INDICES — what
  * the stride selects on — agree with the builtin spelling
  * (equivalence pinned in ExpressionsSpec). */
case class StrideSampleTokens(child: Expression, stride: Int) extends UnaryExpression {
  require(stride > 0, s"stride_sample stride must be positive, got $stride")
  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"stride_sample needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    StrideSampleTokens.sample(input.asInstanceOf[UTF8String], stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StrideSampleTokens.sample($c, $stride);")

  override protected def withNewChildInternal(newChild: Expression): StrideSampleTokens =
    copy(child = newChild)
}

object StrideSampleTokens {
  /** One pass over the bytes: token boundaries at each 0x20, token i
    * kept iff i % stride == 0, kept tokens joined by a single space.
    * Called from generated code (static forwarder), so it must stay a
    * plain (UTF8String, int) -> UTF8String signature. */
  def sample(s: UTF8String, stride: Int): UTF8String = {
    val bytes = s.getBytes
    val out = new java.io.ByteArrayOutputStream(bytes.length / stride + 8)
    var tokenStart = 0
    var tokenIdx = 0
    var first = true
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (tokenIdx % stride == 0) {
          if (!first) out.write(' ')
          out.write(bytes, tokenStart, i - tokenStart)
          first = false
        }
        tokenIdx += 1
        tokenStart = i + 1
      }
      i += 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  def apply(c: Column, stride: Int): Column =
    GraftShims.column(StrideSampleTokens(GraftShims.expression(c), stride))
}

/** Per-document repetition statistics in one fused pass over the token
  * array: `[max word multiplicity, distinct adjacent-bigram count]` —
  * the two counts behind the classic repetition quality gates (a doc
  * dominated by one word, or stitched from repeated phrases, is
  * boilerplate/spam, not prose). Counts are INTEGERS so the DuckDB
  * oracle (histogram + list_distinct over the same split) reproduces
  * them exactly; the fractions are derived downstream from these
  * counts on both engines with identical IEEE division. The builtin
  * spelling needs an explode + two shuffled aggregates per doc for the
  * mode count; this is a per-row hash loop at scan speed. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType match {
      case ArrayType(StringType, _) => true; case _ => false })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"repeat_stats needs an array<string> argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var top = 0L
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      val c = counts.merge(w, 1, (a, b) => a + b)
      if (c > top) top = c.toLong
      i += 1
    }
    // adjacent bigrams, joined with the same single space the split
    // removed — words cannot contain spaces, so the join is injective
    val bigrams = new java.util.HashSet[String](n * 2)
    i = 0
    while (i + 1 < n) {
      bigrams.add(arr.getUTF8String(i).toString + " " + arr.getUTF8String(i + 1).toString)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[Long](top, bigrams.size.toLong))
  }

  // One interpreted call per ROW; the per-token work is the fused Java
  // loop above either way (the ShingleHashes pattern).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("repeatStats", this, classOf[RepetitionStats].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  def apply(c: Column): Column = GraftShims.column(RepetitionStats(GraftShims.expression(c)))
}

/** Per-document CHARACTER-level statistics in one fused pass over the
  * text's code points: `[n_codepoints, distinct codepoints, max
  * codepoint multiplicity, Σ multiplicity²]` — the integer ingredients
  * of the character-diversity quality gates (Simpson concentration =
  * Σc²/n², effective alphabet = its reciprocal) that catch mojibake,
  * binary-pasted-as-text and single-character flooding, which
  * word-level gates (repeat_stats) are blind to because a garbage
  * "word" is still one token. All four are exact integers, so the
  * DuckDB twin (unnest characters + grouped counts) reproduces them
  * bit-for-bit and derived ratios divide identically. The builtin
  * spelling explodes every CHARACTER of the corpus through a shuffled
  * per-(doc, char) aggregate — at 100 TB that's a corpus-of-codepoints
  * shuffle vs this per-row hash loop at scan speed. Counting is by
  * CODE POINT (not UTF-16 unit), matching DuckDB's character
  * semantics; multiplicities fit an int (docs are bounded by the
  * engine's 2 GB string limit). */
case class CharStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_stats needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[Integer, Integer](64)
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var top = 0L
    var sumSq = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > top) top = c
      sumSq += c * c
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[Long](n, counts.size.toLong, top, sumSq))
  }

  // One interpreted call per ROW (the RepetitionStats pattern); the
  // per-character work is the fused Java loop either way.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("charStats", this, classOf[CharStats].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

object CharStats {
  def apply(c: Column): Column = GraftShims.column(CharStats(GraftShims.expression(c)))
}

/** Unicode NFC normalization — the canonicalization a multilingual
  * curation pipeline runs BEFORE tokenizing, shingling or hashing: the
  * same text crawled from two sources can differ only in
  * composed-vs-decomposed accents ("é" as U+00E9 vs U+0065+U+0301 —
  * byte-different, render-identical), and every downstream exact-dedup
  * / fingerprint / shingle operator would otherwise treat them as
  * different documents. Delegates to the JDK's `java.text.Normalizer`;
  * Unicode normalization is STABLE (normalized output of assigned code
  * points never changes across Unicode versions), which is also why
  * DuckDB's utf8proc-based `nfc_normalize` agrees byte-for-byte and
  * the oracle can gate the full pipeline. Codegen is one static call —
  * stays inside whole-stage codegen. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC));
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(c: Column): Column = GraftShims.column(NfcNormalize(GraftShims.expression(c)))
}

/** Symmetric int8 quantization statistics for an embedding vector, in
  * one fused pass: `struct(scale, q_sum, q_min, q_max, n_sat)` where
  * `scale = max |x_i|` and `q_i = sign(x_i) · floor(|x_i|/scale·127 +
  * 0.5)` (round-half-away, spelled via floor so the arithmetic is
  * IEEE-identical on any engine — no dependence on a round() tie mode).
  * This is the compression step an ANN/retrieval store runs before
  * indexing 100 TB of embeddings (4× smaller than float32, dot products
  * in int8 SIMD); the stats are the validation artifact: saturation
  * count, range, and the checksum-ish q_sum. Quantized values are kept
  * as LONGs end-to-end so no negative-zero double can leak into the
  * oracle hash. The builtin spelling is four interpreted higher-order
  * traversals per row; this is one fused loop at scan speed. */
case class Int8QuantStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_min", LongType, nullable = false),
    StructField("q_max", LongType, nullable = false),
    StructField("n_sat", LongType, nullable = false)))
  override def checkInputDataTypes() =
    if (child.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int8_quant_stats needs an array<float> argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(arr.getFloat(i).toDouble)
      if (v > scale) scale = v
      i += 1
    }
    var qsum = 0L; var qmin = 0L; var qmax = 0L; var nsat = 0L
    if (n > 0 && scale > 0.0) {
      qmin = Long.MaxValue; qmax = Long.MinValue
      i = 0
      while (i < n) {
        val x = arr.getFloat(i).toDouble
        val m = math.floor(math.abs(x) / scale * 127.0 + 0.5).toLong
        val q = if (x < 0) -m else m
        qsum += q
        if (q < qmin) qmin = q
        if (q > qmax) qmax = q
        if (m >= 127L) nsat += 1
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(scale, qsum, qmin, qmax, nsat)
  }

  // One interpreted call per ROW; the per-element work is the fused
  // Java loop above either way (the RepetitionStats pattern).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("quantStats", this, classOf[Int8QuantStats].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

object Int8QuantStats {
  def apply(c: Column): Column = GraftShims.column(Int8QuantStats(GraftShims.expression(c)))
}

/** Greedy longest-match subword token count over the fixed
  * [[TextPrimitives.subwordVocab]] — tokenizer-accurate counting for
  * packing/mixing budgets, where t3's whitespace and BPE-shape counts
  * under-estimate real subword sequence lengths. At each position:
  * the longest vocabulary piece (length 4 → 2) matching the current
  * prefix is one token; otherwise one CODE POINT is one token (the
  * OOV fallback); the ASCII space is a separator (consumed, never
  * counted), so whole-text counting equals per-word counting — the
  * fact the per-word recursive DuckDB twin relies on. One fused pass
  * over the UTF-8 bytes, allocation-free: pieces are matched as
  * packed big-endian ints against per-length sorted arrays (the
  * vocabulary is ASCII, so a window containing a space or a
  * non-ASCII byte can never match and is skipped cheaply). The
  * builtin spelling would be a per-position lambda over the
  * vocabulary list — interpreted, allocating, and ~vocab× the
  * comparisons. Callers lowercase first (`subword_count(lower(text))`)
  * so case folding stays with the engines' lower(), which the t5
  * precedent already proves cross-engine identical. */
case class SubwordCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"subword_count needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SubwordCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.SubwordCount.count($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}

object SubwordCount {
  private val maxLen = TextPrimitives.subwordVocab.map(_.length).max
  require(maxLen <= 4 && TextPrimitives.subwordVocab.forall(v =>
    v.length >= 2 && v.forall(c => c >= 'a' && c <= 'z')),
    "subword vocab must be lowercase ASCII pieces of length 2-4")

  private def packed(len: Int): Array[Int] =
    TextPrimitives.subwordVocab.filter(_.length == len)
      .map(_.foldLeft(0)((a, c) => (a << 8) | (c & 0xff))).sorted.toArray
  private val p2 = packed(2)
  private val p3 = packed(3)
  private val p4 = packed(4)
  private def table(len: Int): Array[Int] =
    if (len == 4) p4 else if (len == 3) p3 else p2

  def count(s: UTF8String): Long = {
    val nb = s.numBytes()
    var i = 0
    var n = 0L
    while (i < nb) {
      val b = s.getByte(i) & 0xff
      if (b == ' ') {
        i += 1 // separator: consumed, not counted
      } else if (b >= 0x80) {
        n += 1 // OOV fallback: one token per code point
        i += UTF8String.numBytesForFirstByte(s.getByte(i))
      } else {
        var step = 1
        var l = math.min(maxLen, nb - i)
        while (step == 1 && l >= 2) {
          var k = 0
          var key = 0
          var ok = true
          while (ok && k < l) {
            val bb = s.getByte(i + k) & 0xff
            if (bb >= 'a' && bb <= 'z') key = (key << 8) | bb else ok = false
            k += 1
          }
          if (ok && java.util.Arrays.binarySearch(table(l), key) >= 0) step = l
          l -= 1
        }
        n += 1
        i += step
      }
    }
    n
  }

  def count(s: String): Long = count(UTF8String.fromString(s))

  def apply(c: Column): Column = GraftShims.column(SubwordCount(GraftShims.expression(c)))
}

/** l22's fused BPE-apply kernel: tokenize `child` with a LEARNED merge
  * table (constructor parameter — driver-collected from l19's train,
  * so no SQL-literal injection surface) and return the resulting
  * symbol count. Semantics are EXACTLY the layered greedy fold chain
  * it replaces (pinned as the spec in ExpressionsSpec): words split on
  * ' ' (empties skipped), symbols start as code points, and each merge
  * in training order does one greedy left-to-right non-overlapping
  * pass per word. The chain spelling runs ~8 interpreted lambda
  * invocations per SYMBOL per row (measured 14.9× wall on the second
  * scaling decade — the m3 lesson again); this kernel is one JVM call
  * per row. */
case class BpeApplyCount(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_apply_count needs a string argument, got ${child.dataType}")

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(input: Any): Any =
    BpeApplyCount.count(input.asInstanceOf[UTF8String].toString, mergeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeArr, "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.BpeApplyCount.count($c.toString(), $ref);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyCount =
    copy(child = newChild)
}

object BpeApplyCount {
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    GraftShims.column(BpeApplyCount(GraftShims.expression(c), merges))

  /** One greedy left-to-right pass per merge per word, in merge order.
    * In-place on a reusable symbol buffer: `m` is the live symbol
    * count; a fired merge writes l+r at the left slot and compacts the
    * tail by one. */
  def count(text: String, merges: Array[(String, String)]): Long = {
    var total = 0L
    val syms = new java.util.ArrayList[String](64)
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        // word boundary: apply the merges to the buffered word
        if (!syms.isEmpty) {
          var k = 0
          while (k < merges.length) {
            val l = merges(k)._1
            val r = merges(k)._2
            // the fold's greedy rule verbatim: merge the incoming
            // symbol into the LAST OUTPUT when the pair matches; a
            // just-merged l+r can never equal l (r non-empty), so
            // consumed positions never re-merge — Sennrich's scan
            var w = 0 // write cursor (live output count)
            var rd = 0 // read cursor
            while (rd < syms.size) {
              if (w > 0 && syms.get(w - 1) == l && syms.get(rd) == r) {
                syms.set(w - 1, l + r)
              } else {
                if (w < rd) syms.set(w, syms.get(rd))
                w += 1
              }
              rd += 1
            }
            // trim the tail
            while (syms.size > w) syms.remove(syms.size - 1)
            k += 1
          }
          total += syms.size
          syms.clear()
        }
      } else {
        // symbols start as code points (match split(wd, '') semantics)
        val cp = text.codePointAt(i)
        val len = Character.charCount(cp)
        syms.add(text.substring(i, i + len))
        i += len - 1
      }
      i += 1
    }
    total
  }
}

/** SQL registration so the spark.sql-built queries can call the codegen
  * expressions by name. Idempotent; call before any spark.sql text that
  * references them. */
object GraftFunctions {
  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)  => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal argument, got $other")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_hash", exprs => PolyHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash30", exprs => SimHash30(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("fnv1a32", exprs => Fnv1a32(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hashes", exprs => ShingleHashes(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash16", exprs => MinHash16(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("lsh_band_sigs",
      exprs => LshBandSigs(exprs(0),
        litInt(exprs(1), "lsh_band_sigs"), litInt(exprs(2), "lsh_band_sigs"),
        if (exprs.length > 3) litInt(exprs(3), "lsh_band_sigs") else 64), "scala_udf")
    // an AggregateFunction returned bare: the analyzer wraps it in the
    // AggregateExpression (Complete) when it resolves the call site
    reg.createOrReplaceTempFunction("kmv_distinct",
      exprs => KmvDistinct(exprs(0), litInt(exprs(1), "kmv_distinct")), "scala_udf")
    reg.createOrReplaceTempFunction("misra_gries",
      exprs => MisraGries(exprs(0), litInt(exprs(1), "misra_gries")), "scala_udf")
    reg.createOrReplaceTempFunction("gram_hashes",
      exprs => GramHashes(exprs(0), litInt(exprs(1), "gram_hashes")), "scala_udf")
    reg.createOrReplaceTempFunction("span_cut",
      exprs => SpanCut(exprs(0), exprs(1), litInt(exprs(2), "span_cut")), "scala_udf")
    reg.createOrReplaceTempFunction("bloom_agg",
      exprs => BloomAgg(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("bloom_maybe",
      exprs => BloomMaybe(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("stride_sample",
      exprs => StrideSampleTokens(exprs(0), litInt(exprs(1), "stride_sample")), "scala_udf")
    reg.createOrReplaceTempFunction("bpe_token_count",
      exprs => BpeTokenCount(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("subword_count",
      exprs => SubwordCount(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("char_trigrams",
      exprs => CharTrigrams(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("repeat_stats",
      exprs => RepetitionStats(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("char_stats",
      exprs => CharStats(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize",
      exprs => NfcNormalize(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("int8_quant_stats",
      exprs => Int8QuantStats(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("stop_hits",
      exprs => StopHits(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(s: UTF8String, StringType) =>
          // filter(_.nonEmpty): ''.split(" ") is Seq(""), and an empty
          // "word" would count every empty token split() emits
          s.toString.split(" ").toSeq.filter(_.nonEmpty)
        case other => throw new IllegalArgumentException(
          s"stop_hits expects a string literal word list, got $other")
      }), "scala_udf")
  }
}
