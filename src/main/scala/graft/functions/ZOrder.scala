package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave of two non-negative dimensions:
  * `(bigint, bigint) → bigint`, bit i of each input landing at bits 2i /
  * 2i+1 of the output. Sorting a table by the z-value clusters it so that a
  * range predicate on EITHER dimension touches a bounded fraction of
  * files/row-groups — the multi-column generalization of sorting by one
  * column, and the standard lakehouse layout trick (Delta/Iceberg OPTIMIZE
  * ZORDER) for fact tables filtered on more than one axis. The interleave
  * itself is pure bit math (codegen'd single expression); the LAYOUT is
  * what delivers pruning — see Queries.ensureZorderedEvents.
  *
  * Inputs must fit 31 bits — NOT 32: the right dimension's top bit would
  * land in the long's SIGN bit, putting z(0, 2^31) below z(0, 0) under the
  * signed ordering every sort/range-partition uses and splitting the curve
  * at the sign boundary instead of clustering it. 31 bits per dimension
  * keeps all 62 output bits in the positive range, so signed order == curve
  * order over the whole accepted domain. Callers bucket/clamp wider values
  * first — a silent high-bit drop would interleave wrongly, so
  * out-of-range throws.
  */
case class ZOrderInterleave(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderInterleave.combine(a.asInstanceOf[Long], b.asInstanceOf[Long])

  // One single-line statement: janino rejects a multi-line `a = x | (y << 1)`
  // continuation ("Expression ... is not a type") and the whole stage would
  // silently fall back to interpreted mode — the guard + interleave live in
  // the static helper instead, shared with nullSafeEval.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderInterleave.combine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderInterleave =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "z_order"
}

object ZOrderInterleave {

  /** Range-guarded Morton combine — THE codegen entry point (one static
    * call keeps the generated statement janino-parseable) and the
    * interpreted path's implementation.
    */
  def combine(x: Long, y: Long): Long = {
    if (x < 0L || x > 0x7FFFFFFFL || y < 0L || y > 0x7FFFFFFFL)
      throw new IllegalArgumentException(
        s"z_order inputs must sit in [0, 2^31): got ($x, $y)")
    interleave(x) | (interleave(y) << 1)
  }

  /** Spread the low 32 bits of `v` to the even bit positions (the classic
    * magic-mask spread, Hacker's Delight §7-2). Called from generated code.
    */
  def interleave(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def zOrder(a: Column, b: Column): Column =
    bridge.toColumn(ZOrderInterleave(bridge.toExpression(a), bridge.toExpression(b)))
}
