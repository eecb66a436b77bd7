package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text hashing for fingerprinting / MinHash / SimHash.
  *
  * A polynomial rolling hash over Unicode code points,
  * `h = fold(cp => (h * 31 + cp) mod (2^31 - 1))` — chosen over Spark's
  * built-in `hash`/`xxhash64` because the *oracle* (DuckDB) must reproduce it
  * exactly: the same fold is expressible there as
  * `list_reduce(list_transform(string_split(s,''), c -> unicode(c)),
  *              (a,b) -> (a*31+b) % 2147483647)`.
  *
  * Scale notes: single pass over the string, whole-stage codegen, no array
  * materialization — O(bytes) per row with zero allocation beyond the loop.
  * Extends the reference's fingerprint-free design (it never hashes values;
  * our dedup/fingerprint extensions need one, SURVEY §7.6).
  */
object PolyHash {
  /** 2^31 - 1 (Mersenne prime): products stay far below Long overflow. */
  val Mod: Long = 2147483647L
  val Mult: Long = 31L

  /** Reference implementation (driver-side / tests). */
  def of(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.of(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * ${PolyHash.Mult}L + $cp) % ${PolyHash.Mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
  override def prettyName: String = "poly_hash"
}

/** 64-bit SimHash over a token array, one pass, codegen'd.
  *
  * Two independent 31-bit polynomial hashes per token (multipliers 31 and
  * 131, same Mersenne modulus — both oracle-replayable) supply bit sources
  * for fingerprint bits 0..30 and 31..61; bit b is set when more than half
  * the tokens have that hash bit set. Bits 62-63 are structurally zero, so
  * the fingerprint is effectively 62 informative bits — wide enough that
  * unrelated documents no longer concentrate at small hamming distances the
  * way a 32-bit fingerprint measurably does (BASELINE.md, 100k-doc case).
  *
  * Fused design over `aggregate()` HOFs: the declarative formulation is one
  * array pass PER BIT (62 passes/row) plus a materialized hash array; this
  * expression is one pass per row, no allocation beyond the counter array.
  */
object SimHash64 {
  val Bits = 62

  /** Reference implementation (driver-side / tests / oracle derivation). */
  def of(tokens: Seq[String]): Long = {
    val cnt = new Array[Long](Bits)
    var m = 0L
    tokens.foreach { s =>
      var h1 = 0L; var h2 = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h1 = (h1 * 31L + cp) % PolyHash.Mod
        h2 = (h2 * 131L + cp) % PolyHash.Mod
        i += Character.charCount(cp)
      }
      m += 1
      var b = 0
      while (b < 31) {
        cnt(b) += (h1 >> b) & 1L
        cnt(31 + b) += (h2 >> b) & 1L
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < Bits) { if (2 * cnt(b) > m) fp |= 1L << b; b += 1 }
    fp
  }
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val toks = Seq.newBuilder[String]
    var k = 0
    while (k < arr.numElements()) {
      if (!arr.isNullAt(k)) toks += arr.getUTF8String(k).toString
      k += 1
    }
    SimHash64.of(toks.result())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val b = ctx.freshName("b")
      val fp = ctx.freshName("fp")
      s"""
         |long[] $cnt = new long[${SimHash64.Bits}];
         |long $m = 0L;
         |for (int $k = 0; $k < $a.numElements(); $k++) {
         |  if (!$a.isNullAt($k)) {
         |    java.lang.String $s = $a.getUTF8String($k).toString();
         |    long $h1 = 0L; long $h2 = 0L;
         |    int $i = 0;
         |    while ($i < $s.length()) {
         |      int $cp = $s.codePointAt($i);
         |      $h1 = ($h1 * 31L + $cp) % ${PolyHash.Mod}L;
         |      $h2 = ($h2 * 131L + $cp) % ${PolyHash.Mod}L;
         |      $i += java.lang.Character.charCount($cp);
         |    }
         |    $m++;
         |    for (int $b = 0; $b < 31; $b++) {
         |      $cnt[$b] += ($h1 >> $b) & 1L;
         |      $cnt[31 + $b] += ($h2 >> $b) & 1L;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < ${SimHash64.Bits}; $b++) {
         |  if (2L * $cnt[$b] > $m) $fp |= 1L << $b;
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "sim_hash64"
}

/** `sample_draw(str) -> long`: the deterministic sampling draw — the poly
  * hash of a (pre-salted) key pushed through the quadratic scrambler
  * `(h² mod M)·48271 + h mod M`. One fused pass: hash loop and scramble in
  * a single codegen'd expression, so [[graft.ext.Sampling]]'s draw costs
  * one string traversal per row. The scrambler exists because the raw poly
  * hash is affine in the last code point — consecutive keys would pass or
  * fail a rate threshold in blocks.
  */
case class SampleDrawExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val h = PolyHash.of(input.asInstanceOf[UTF8String].toString)
    (h * h % PolyHash.Mod * 48271L + h) % PolyHash.Mod
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * ${PolyHash.Mult}L + $cp) % ${PolyHash.Mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = ($h * $h % ${PolyHash.Mod}L * 48271L + $h) % ${PolyHash.Mod}L;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SampleDrawExpr =
    copy(child = newChild)
  override def prettyName: String = "sample_draw"
}

object TextHash {
  import bridge.{toColumn, toExpression}

  /** Column API: `poly_hash(string) -> long` in `[0, 2^31-1)`. */
  def polyHash(c: Column): Column = toColumn(PolyHashExpr(toExpression(c)))

  /** Column API: `sample_draw(string) -> long` — fused hash + scramble. */
  def sampleDraw(c: Column): Column = toColumn(SampleDrawExpr(toExpression(c)))

  /** Column API: `sim_hash64(array<string>) -> long` (62 informative bits). */
  def simHash64(c: Column): Column = toColumn(SimHash64Expr(toExpression(c)))
}
