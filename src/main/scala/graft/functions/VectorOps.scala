package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Vector primitives for the similarity/dedup extensions (SURVEY §7.6).
  *
  * A native codegen'd dot product over `array<double>` — the hot inner loop of
  * brute-force cosine top-k. Beats `aggregate(zip_with(...))` (interpreted
  * higher-order functions, 2 array materializations per pair) by evaluating a
  * tight primitive loop with zero allocation.
  *
  * Determinism: strict left-to-right `sum += a[i] * b[i]` — each product and
  * each add rounds separately (JVM has no auto-FMA), which is exactly the
  * sequence DuckDB's `list_reduce(list_transform(list_zip(a,b), p -> p[1]*p[2]),
  * (x,y) -> x+y)` performs, so oracle comparisons are bit-identical.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // Fail loudly on dimension mismatch — silently truncating would diverge
    // from the oracle (whose zip pads with NULL and folds to NULL).
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"dot_product dimension mismatch: ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product dimension mismatch: " + $a.numElements() + " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

object VectorOps {
  import bridge.{toColumn, toExpression}
  import org.apache.spark.sql.functions._

  /** `dot(array<double>, array<double>) -> double`, codegen'd. */
  def dot(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))

  /** Cast an `array<float>` embedding to `array<double>` (exact widening). */
  def toDoubleArray(c: Column): Column = transform(c, x => x.cast("double"))

  /** L2 norm via the same codegen'd loop (`sqrt(dot(v, v))`). */
  def norm(v: Column): Column = sqrt(dot(v, v))
}
