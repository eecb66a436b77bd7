package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** F2: the reference's big-endian binary codecs (`Bytes.toInt`/`Bytes.toLong`,
  * ExportHBaseTableToAvro.java:202-205, ExportHBaseTableToParquet.java:192-195)
  * as native Catalyst expressions with whole-stage codegen — no UDF boxing on
  * the typed-decode hot path. Encoders included so round-trips are testable.
  *
  * HBase's Bytes uses big-endian, the same as `java.nio.ByteBuffer`'s default
  * order, so the codegen is a one-liner over ByteBuffer.
  */
abstract class BinaryDecode extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.catalogString}")
  protected def width: Int
  protected def checked(b: Array[Byte]): Array[Byte] = {
    if (b.length != width)
      throw new IllegalArgumentException(
        s"binary value has ${b.length} bytes, expected $width")
    b
  }
}

case class BinaryToInt(child: Expression) extends BinaryDecode {
  override def dataType: DataType = IntegerType
  override protected def width: Int = 4
  override protected def nullSafeEval(input: Any): Any =
    java.nio.ByteBuffer.wrap(checked(input.asInstanceOf[Array[Byte]])).getInt
  // The width check must exist in BOTH paths — codegen is the default, and
  // skipping it there would silently mis-decode wrong-length cells.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.length != 4) {
      |  throw new IllegalArgumentException(
      |    "binary value has " + $c.length + " bytes, expected 4");
      |}
      |${ev.value} = java.nio.ByteBuffer.wrap($c).getInt();
    """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): BinaryToInt =
    copy(child = newChild)
  override def prettyName: String = "binary_to_int"
}

case class BinaryToLong(child: Expression) extends BinaryDecode {
  override def dataType: DataType = LongType
  override protected def width: Int = 8
  override protected def nullSafeEval(input: Any): Any =
    java.nio.ByteBuffer.wrap(checked(input.asInstanceOf[Array[Byte]])).getLong
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.length != 8) {
      |  throw new IllegalArgumentException(
      |    "binary value has " + $c.length + " bytes, expected 8");
      |}
      |${ev.value} = java.nio.ByteBuffer.wrap($c).getLong();
    """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): BinaryToLong =
    copy(child = newChild)
  override def prettyName: String = "binary_to_long"
}

case class IntToBinary(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an int argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    java.nio.ByteBuffer.allocate(4).putInt(input.asInstanceOf[Int]).array()
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.nio.ByteBuffer.allocate(4).putInt($c).array()")
  override protected def withNewChildInternal(newChild: Expression): IntToBinary =
    copy(child = newChild)
  override def prettyName: String = "int_to_binary"
}

case class LongToBinary(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    java.nio.ByteBuffer.allocate(8).putLong(input.asInstanceOf[Long]).array()
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.nio.ByteBuffer.allocate(8).putLong($c).array()")
  override protected def withNewChildInternal(newChild: Expression): LongToBinary =
    copy(child = newChild)
  override def prettyName: String = "long_to_binary"
}

/** Column-level API over the codec expressions. */
object ByteCodecs {
  import bridge.{toColumn, toExpression}

  def binaryToInt(c: Column): Column = toColumn(BinaryToInt(toExpression(c)))
  def binaryToLong(c: Column): Column = toColumn(BinaryToLong(toExpression(c)))
  def intToBinary(c: Column): Column = toColumn(IntToBinary(toExpression(c)))
  def longToBinary(c: Column): Column = toColumn(LongToBinary(toExpression(c)))
}
