package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole MinHash signature in ONE pass over the token array.
  *
  * Declaratively, the signature is: word 3-shingles → `array_distinct` →
  * PolyHash per shingle → 16× `array_min(transform(hs, h => (a_j*h+b_j) %
  * P))` — a shingle-array materialization plus 17 array traversals (and 16
  * transformed-array allocations) per document. Fused: iterate shingle
  * windows directly over the tokens, fold the polynomial hash across the
  * three tokens and the joining spaces WITHOUT building the shingle string,
  * and update all 16 running minima per shingle. `array_distinct` is
  * dropped because duplicate shingles cannot change a minimum — the values
  * are identical by construction (the oracle replays the declarative form).
  *
  * Constants mirror [[graft.ext.Dedup]]: a_j = 2j+1, b_j = 7919j+13,
  * P = 2^31-1 (also PolyHash's modulus, so products never overflow a long).
  *
  * Returns null when fewer than 3 tokens (no shingles — upstream filters
  * these out, matching the declarative pipeline's `size(t) >= 3`). Null
  * elements are SKIPPED along with their joining separator, exactly like
  * the `concat_ws` the declarative shingle builder uses (unreachable from
  * `split()` output, but the function is SQL-registered for any caller).
  */
object MinHashSig {

  val NumHashes = 16
  private val P = PolyHash.Mod

  /** The scanner; called from generated code — keep the signature stable. */
  def of(arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val n = arr.numElements()
    if (n < 3) return null
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
      i += 1
    }
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var w = 0
    while (w + 2 < n) {
      var h = 0L
      var emitted = 0 // non-null parts hashed so far (concat_ws null-skip)
      var part = 0
      while (part < 3) {
        val s = toks(w + part)
        if (s != null) {
          if (emitted > 0) h = (h * PolyHash.Mult + ' ') % P
          var k = 0
          while (k < s.length) {
            val cp = s.codePointAt(k)
            h = (h * PolyHash.Mult + cp) % P
            k += Character.charCount(cp)
          }
          emitted += 1
        }
        part += 1
      }
      var j = 0
      while (j < NumHashes) {
        val v = (h * (2L * j + 1) + (7919L * j + 13)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.of(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.of($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHash {
  /** Column API: `minhash_sig(array<string> tokens) -> array<long>[16]`. */
  def minhashSig(tokens: Column): Column =
    bridge.toColumn(MinHashSigExpr(bridge.toExpression(tokens)))
}
