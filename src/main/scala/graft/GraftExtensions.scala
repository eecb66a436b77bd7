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
  * Besides the function surface, ONE optimizer rule is injected:
  * [[graft.sources.KvIndexRouting]] (pre-CBO — post-pushdown), the
  * Phoenix-style rewrite that serves a selective SQL value-range
  * predicate over a kv table's pivoted view through a maintained
  * secondary index. The reference's own semantics need no other rules or
  * strategies (SURVEY §4 — Catalyst subsumes every physical trick it
  * has); the routing rule is an EXTENSION-side optimizer (§7.6), kept
  * strictly answer-preserving by construction (its class doc). Sessions
  * not built with extensions get the same rule via
  * [[graft.sources.KvIndexRouting.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))
    }
    ext.injectPreCBORule(session => graft.sources.KvIndexRouting(session))
    // The routing rule splices lazy [[graft.sources.KvRoutedLookup]]
    // nodes (execution-time index probes, r18); this strategy plans them.
    ext.injectPlannerStrategy(_ => graft.sources.KvRoutedLookupStrategy)
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

  private def ternary(name: String, f: (Expression, Expression, Expression) => Expression)(
      args: Seq[Expression]): Expression = {
    if (args.length != 3) wrongArity(name, 3, args.length)
    f(args.head, args(1), args(2))
  }

  /** Sketch parameters (capacity, k, probes) must be literals — they shape
    * the aggregation buffer, not per-row data. A non-foldable argument is an
    * analysis-time error, mirroring how the built-in registry treats e.g.
    * approx_percentile's accuracy argument.
    */
  private def nonFoldable(name: String, arg: String, tpe: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "NON_FOLDABLE_ARGUMENT",
      Map(
        "funcName" -> s"`$name`",
        "paramName" -> s"`$arg`",
        "paramType" -> tpe),
      None)

  /** A foldable argument of the WRONG type is a different user error than a
    * non-foldable one and gets the standard type-mismatch diagnostic, not a
    * misleading NON_FOLDABLE_ARGUMENT (e.g. probes written as `array(0.5)`
    * parse as array<decimal> — the user needs "expected ARRAY<DOUBLE>",
    * not "must be foldable").
    */
  private def wrongType(name: String, arg: String, required: String,
      e: Expression): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE",
      Map(
        "sqlExpr" -> s"\"$name\"",
        "paramIndex" -> s"`$arg`",
        "requiredType" -> required,
        "inputSql" -> s"\"${e.sql}\"",
        "inputType" -> s"\"${e.dataType.sql}\""),
      None)

  private def foldInt(name: String, arg: String, e: Expression): Int = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    if (!e.foldable) nonFoldable(name, arg, "\"INT\"")
    // a NULL literal or an out-of-int bigint must be an analysis error, not
    // a silently unboxed 0 / truncated sketch size
    val v = e.dataType match {
      case ByteType => Option(e.eval()).map(_.asInstanceOf[Byte].toLong)
      case ShortType => Option(e.eval()).map(_.asInstanceOf[Short].toLong)
      case IntegerType => Option(e.eval()).map(_.asInstanceOf[Int].toLong)
      case LongType => Option(e.eval()).map(_.asInstanceOf[Long])
      case _ => wrongType(name, arg, "\"INT\"", e)
    }
    v match {
      case Some(l) if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case _ => nonFoldable(name, arg, "\"INT\"")
    }
  }

  private def foldDoubles(name: String, arg: String, e: Expression): Seq[Double] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, NumericType}
    if (!e.foldable) nonFoldable(name, arg, "\"ARRAY<DOUBLE>\"")
    // Any numeric element type folds: array(0.5, 0.9) parses as
    // array<decimal>, which is a perfectly good probe list — widen instead
    // of erroring (the registry's own approx_percentile does the same).
    val widened = e.dataType match {
      case ArrayType(DoubleType, _) => e
      case ArrayType(_: NumericType, _) => Cast(e, ArrayType(DoubleType))
      case _ => wrongType(name, arg, "\"ARRAY<DOUBLE>\"", e)
    }
    widened.eval() match {
      case arr: ArrayData if !(0 until arr.numElements()).exists(arr.isNullAt) =>
        arr.toDoubleArray().toSeq
      case _ => nonFoldable(name, arg, "\"ARRAY<DOUBLE>\"") // NULL / null element
    }
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
        (v, o) => MaxByTsAgg(v, o).toAggregateExpression()) _),
    ("repetition_stats",
      "repetition_stats(str) - within-doc repetition counters (struct of 5 longs)",
      unary("repetition_stats", RepetitionStatsExpr.apply(_: Expression)) _),
    ("pack_int8", "pack_int8(array<int>) - pack [-128,127] components, 1 byte each",
      unary("pack_int8", PackInt8) _),
    ("int8_dot", "int8_dot(binary, binary) - signed-byte integer dot product",
      binary("int8_dot", Int8Dot) _),
    ("quantize_int8",
      "quantize_int8(array<double>, nrm double) - fused round(v*127/nrm) pack",
      binary("quantize_int8", QuantizeInt8) _),
    ("z_order", "z_order(bigint, bigint) - Morton bit-interleave of two 31-bit dims",
      binary("z_order", ZOrderInterleave) _),
    ("kmv_distinct", "kmv_distinct(hash bigint, k int) - KMV distinct sketch, exact below k",
      binary("kmv_distinct",
        (h, k) => KmvDistinctAgg(h, foldInt("kmv_distinct", "k", k))
          .toAggregateExpression()) _),
    ("space_saving_topk",
      "space_saving_topk(term, capacity int, k int) - heavy-hitter top-k, exact below capacity",
      ternary("space_saving_topk",
        (t, cap, k) => SpaceSavingAgg(t,
          foldInt("space_saving_topk", "capacity", cap),
          foldInt("space_saving_topk", "k", k)).toAggregateExpression()) _),
    ("quantile_sketch",
      "quantile_sketch(v bigint, probes array<double>, k int) - mergeable quantiles, exact below k",
      ternary("quantile_sketch",
        (v, probes, k) => QuantileSketchAgg(v,
          foldInt("quantile_sketch", "k", k),
          foldDoubles("quantile_sketch", "probes", probes)).toAggregateExpression()) _))
}
