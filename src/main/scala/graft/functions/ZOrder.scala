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

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    if (x < 0 || x > 0x7FFFFFFFL || y < 0 || y > 0x7FFFFFFFL)
      throw new IllegalArgumentException(
        s"z_order inputs must sit in [0, 2^31): got ($x, $y)")
    ZOrderInterleave.interleave(x) | (ZOrderInterleave.interleave(y) << 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |if ($a < 0L || $a > 2147483647L || $b < 0L || $b > 2147483647L) {
       |  throw new IllegalArgumentException(
       |    "z_order inputs must sit in [0, 2^31): got (" + $a + ", " + $b + ")");
       |}
       |${ev.value} = graft.functions.ZOrderInterleave.interleave($a)
       |  | (graft.functions.ZOrderInterleave.interleave($b) << 1);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderInterleave =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "z_order"
}

object ZOrderInterleave {

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
