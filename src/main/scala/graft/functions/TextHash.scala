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

object TextHash {
  import bridge.{toColumn, toExpression}

  /** Column API: `poly_hash(string) -> long` in `[0, 2^31-1)`. */
  def polyHash(c: Column): Column = toColumn(PolyHashExpr(toExpression(c)))
}
