package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Int8 vector quantization primitives (SURVEY §7.6 similarity extension).
  *
  * The 100-TB argument: a 64-dim float32 embedding corpus is 256 B/vector
  * (512 B once widened to double for exact math); scaled-int8 quantization
  * stores the same vector in 64 B — a 4-8× cut in scan bytes, shuffle bytes,
  * and broadcast size — and scores candidates with an integer dot product
  * (SIMD-friendly, no FP rounding concerns in the oracle compare). Packing
  * is `round(127 * v_i / ||v||)` per component, so the quantized dot of two
  * vectors approximates `127² · cosine`; ranking by it is the standard
  * memory-bound ANN scan (re-ranking by exact cosine is a composable second
  * stage — [[graft.ext.Similarity]] keeps it separate on purpose).
  *
  * [[PackInt8]]: `array<int>` (components in [-128, 127]) → `binary`, one
  * byte per component. [[Int8Dot]]: `(binary, binary)` → `long` — the sum of
  * signed byte products. Both codegen'd; a dimension mismatch throws rather
  * than silently truncating.
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${t.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      // a null element would read as 0 and silently zero the dimension
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(s"pack_int8 NULL component at index $i")
      val v = arr.getInt(i)
      if (v < Byte.MinValue || v > Byte.MaxValue)
        throw new IllegalArgumentException(
          s"pack_int8 component $v at index $i outside [-128, 127]")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "pack_int8 NULL component at index " + $i);
         |  }
         |  int $v = $c.getInt($i);
         |  if ($v < -128 || $v > 127) {
         |    throw new IllegalArgumentException(
         |      "pack_int8 component " + $v + " at index " + $i + " outside [-128, 127]");
         |  }
         |  $out[$i] = (byte) $v;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackInt8 =
    copy(child = newChild)
  override def prettyName: String = "pack_int8"
}

/** Signed-byte dot product over two packed int8 vectors: `(binary, binary)
  * → long`. 64 dims × 127² fits easily in an int, but the accumulator is a
  * long so higher-dimensional callers never overflow.
  */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"int8_dot dimension mismatch: ${x.length} vs ${y.length}")
    var s = 0L
    var i = 0
    while (i < x.length) {
      s += x(i).toLong * y(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.length != $b.length) {
         |  throw new IllegalArgumentException(
         |    "int8_dot dimension mismatch: " + $a.length + " vs " + $b.length);
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $s += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "int8_dot"
}

/** Fused scale-quantize-pack: `(array<double> v, double nrm) → binary` with
  * byte i = `round(v[i] * 127 / nrm)` (round-half-away-from-zero, the
  * behavior of both Spark's `round` and DuckDB's `round` on doubles). One
  * codegen loop replaces the interpreted `transform(round(...))` chain —
  * higher-order array functions are CodegenFallback and `round` allocates a
  * BigDecimal per element, which measured ~2.5× slower than the plain
  * exact double scan it was supposed to beat.
  *
  * `|v[i]| ≤ nrm` for any L2 norm, so results stay within [-127, 127] by
  * construction; a violation (wrong norm passed) throws rather than
  * wrapping.
  */
case class QuantizeInt8(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i))
        throw new IllegalArgumentException(s"quantize_int8 NULL component at index $i")
      val d = v.getDouble(i) * 127 / nrm
      val r = QuantizeInt8.roundHalfAway(d)
      // inverted guard: NaN (zero/NaN norm) fails >= and <= and must throw,
      // not cast to byte 0
      if (!(r >= Byte.MinValue && r <= Byte.MaxValue))
        throw new IllegalArgumentException(
          s"quantize_int8 component $r at index $i outside [-128, 127] (bad norm?)")
      out(i) = r.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val r = ctx.freshName("r")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "quantize_int8 NULL component at index " + $i);
         |  }
         |  double $d = $a.getDouble($i) * 127 / $b;
         |  double $r = graft.functions.QuantizeInt8.roundHalfAway($d);
         |  if (!($r >= -128 && $r <= 127)) {
         |    throw new IllegalArgumentException(
         |      "quantize_int8 component " + $r + " at index " + $i + " outside [-128, 127] (bad norm?)");
         |  }
         |  $out[$i] = (byte) $r;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizeInt8 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "quantize_int8"
}

object QuantizeInt8 {
  /** Round half away from zero, bit-exact with C `round` (what DuckDB's
    * `round(double)` runs) on every finite double: split into integer part
    * and fraction (both exact — the operands are within one unit, so the
    * subtraction is representable), then compare the fraction against 0.5
    * directly. The tempting `floor(|d| + 0.5)` is NOT this function: for
    * d = 0.49999999999999994 the FP add rounds up to 1.0 and floors to 1,
    * where true nearest (and std::round) is 0 — a one-ulp input landing
    * next to a tie boundary would quantize differently engine-side vs
    * oracle-side and break the hash compare. NaN propagates (caller
    * guards).
    */
  def roundHalfAway(d: Double): Double = {
    val a = math.abs(d)
    if (a != a || a >= 9007199254740992.0) return d // NaN or >= 2^53: integral already
    val f = math.floor(a)
    val r = if (a - f >= 0.5) f + 1 else f
    if (d < 0) -r else r
  }
}

object Int8Ops {
  import bridge.{toColumn, toExpression}

  def pack(c: Column): Column = toColumn(PackInt8(toExpression(c)))
  def dot(a: Column, b: Column): Column =
    toColumn(Int8Dot(toExpression(a), toExpression(b)))
  def quantize(v: Column, nrm: Column): Column =
    toColumn(QuantizeInt8(toExpression(v), toExpression(nrm)))
}
