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

/** `dot(v, m[r])` for every row r of a matrix, in ONE expression:
  * `(array<double>, array<array<double>>) -> array<double>`.
  *
  * Why this exists: unrolling k separate [[DotProduct]]s into one projection
  * generates k copies of the inner loop in a single consume() method; past
  * HotSpot's huge-method JIT limit (8 KB bytecode) the whole stage silently
  * runs in the bytecode interpreter — measured 300× slower at 32 centroids ×
  * 1M rows, with no Spark warning (Janino compiles fine; the JVM just never
  * JITs it). A nested loop over the matrix keeps the generated code size
  * constant in k. Each per-row dot is the same strict left-to-right sequence
  * as DotProduct, so oracle parity is unchanged.
  */
case class DotMatrix(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<array<double>>), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    val rows = m.numElements()
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      val mr = m.getArray(r)
      if (mr.numElements() != n)
        throw new IllegalArgumentException(
          s"dot_matrix dimension mismatch at row $r: ${mr.numElements()} vs $n")
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * mr.getDouble(i); i += 1 }
      out(r) = s
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val rows = ctx.freshName("rows")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val mr = ctx.freshName("mr")
      s"""
         |int $n = $a.numElements();
         |int $rows = $b.numElements();
         |double[] $out = new double[$rows];
         |for (int $r = 0; $r < $rows; $r++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $mr = $b.getArray($r);
         |  if ($mr.numElements() != $n) {
         |    throw new IllegalArgumentException(
         |      "dot_matrix dimension mismatch at row " + $r + ": " + $mr.numElements() + " vs " + $n);
         |  }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $mr.getDouble($i);
         |  }
         |  $out[$r] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotMatrix =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_matrix"
}

object VectorOps {
  import bridge.{toColumn, toExpression}
  import org.apache.spark.sql.functions._

  /** `dot(array<double>, array<double>) -> double`, codegen'd. */
  def dot(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))

  /** One dot per matrix row: `(array<double>, array<array<double>>) ->
    * array<double>`, codegen'd with constant code size (see [[DotMatrix]]).
    */
  def dotAll(v: Column, m: Column): Column =
    toColumn(DotMatrix(toExpression(v), toExpression(m)))

  /** Cast an `array<float>` embedding to `array<double>` (exact widening). */
  def toDoubleArray(c: Column): Column = transform(c, x => x.cast("double"))

  /** L2 norm via the same codegen'd loop (`sqrt(dot(v, v))`). */
  def norm(v: Column): Column = sqrt(dot(v, v))
}
