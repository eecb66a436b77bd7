package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SQL surface for graft's custom Catalyst expressions, registered through
  * `SparkSessionExtensions` — the sanctioned third-party extension point:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic
  *   // or spark.sql.extensions=graft.GraftExtensions  (config, e.g. CLI)
  * ...
  * spark.sql("SELECT poly_hash(text), bin_to_long(value) FROM cells")
  * }}}
  *
  * This is deliberately the ONLY SparkSessionExtensions use in the engine:
  * the reference's semantics need no custom optimizer rules or strategies
  * (SURVEY §4 — Catalyst subsumes every physical trick it has), so injecting
  * any would be planner noise. Scalar/aggregate *functions* are exactly what
  * the extension point is for.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))
    }
}

object GraftExtensions {

  /** Arity mismatch as a real analysis-time error (same error class the
    * built-in registry raises), not a raw require() IllegalArgumentException.
    */
  private def wrongArity(name: String, expected: Int, actual: Int): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> expected.toString,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"),
      None)

  private def unary(name: String, f: Expression => Expression)(
      args: Seq[Expression]): Expression = {
    if (args.length != 1) wrongArity(name, 1, args.length)
    f(args.head)
  }

  private def binary(name: String, f: (Expression, Expression) => Expression)(
      args: Seq[Expression]): Expression = {
    if (args.length != 2) wrongArity(name, 2, args.length)
    f(args.head, args(1))
  }

  /** (name, usage, builder) for every public custom expression. */
  val registrations: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("poly_hash", "poly_hash(str) - rolling polynomial hash over code points",
      unary("poly_hash", PolyHashExpr) _),
    ("sim_hash64", "sim_hash64(array<string>) - 64-bit SimHash over tokens",
      unary("sim_hash64", SimHash64Expr) _),
    ("sample_draw", "sample_draw(str) - deterministic scrambled sampling draw in [0, 2^31-1)",
      unary("sample_draw", SampleDrawExpr) _),
    ("text_stats", "text_stats(str) - fused per-document counters (struct of 10 longs)",
      unary("text_stats", TextStatsExpr) _),
    ("bin_to_int", "bin_to_int(binary) - big-endian 4-byte decode (HBase Bytes.toInt)",
      unary("bin_to_int", BinaryToInt) _),
    ("bin_to_long", "bin_to_long(binary) - big-endian 8-byte decode (HBase Bytes.toLong)",
      unary("bin_to_long", BinaryToLong) _),
    ("int_to_bin", "int_to_bin(int) - big-endian 4-byte encode",
      unary("int_to_bin", IntToBinary) _),
    ("long_to_bin", "long_to_bin(bigint) - big-endian 8-byte encode",
      unary("long_to_bin", LongToBinary) _),
    ("vec_dot", "vec_dot(array<double>, array<double>) - strict-order inner product",
      binary("vec_dot", DotProduct) _),
    ("vec_dot_matrix",
      "vec_dot_matrix(array<double>, array<array<double>>) - one dot per matrix row",
      binary("vec_dot_matrix", DotMatrix) _),
    ("max_by_ts", "max_by_ts(binary, bigint) - hash-aggregable last-write-wins",
      binary("max_by_ts",
        (v, o) => MaxByTsAgg(v, o).toAggregateExpression()) _))
}
