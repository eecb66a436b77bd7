package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Within-document repetition counters — the Gopher-style quality signals
  * (Rae et al. 2021, "Scaling Language Models", table A1: duplicate-line /
  * duplicate-n-gram fractions) adapted to the corpus' newline-free docs:
  * token- and bigram-level duplication plus the top-token share.
  *
  * One fused pass per document (hash map + hash set over the token stream),
  * [[TextStats]]-style: the generated code is a single static call, so the
  * whole filter stage stays inside whole-stage codegen with constant code
  * size. Raw COUNTERS are returned (not ratios) so callers compose their
  * own thresholds with exact integer math.
  *
  * Token semantics are the library's standard `split(trim(text), "\\s+")`
  * (limit −1): leading/trailing empty tokens from non-space whitespace are
  * kept, exactly like Spark's `split` and DuckDB's
  * `regexp_split_to_array` — the fields hash-compare against oracles built
  * on those.
  */
object RepetitionStats {

  val Fields: Seq[String] =
    Seq("n_tokens", "n_distinct", "top_cnt", "n_bigrams", "n_distinct_bigrams")

  val Schema: StructType =
    StructType(Fields.map(f => StructField(f, LongType, nullable = false)))

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** The scanner; called from generated code — keep the signature stable. */
  def of(u: UTF8String): InternalRow = {
    // trim() strips 0x20 only — same as Spark's trim and DuckDB's default
    val trimmed = {
      val s = u.toString
      var b = 0
      var e = s.length
      while (b < e && s.charAt(b) == ' ') b += 1
      while (e > b && s.charAt(e - 1) == ' ') e -= 1
      s.substring(b, e)
    }
    val toks = Ws.split(trimmed, -1)
    val counts = new java.util.HashMap[String, Long]()
    var top = 0L
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1L, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    val bigrams = new java.util.HashSet[String]()
    i = 0
    while (i < toks.length - 1) {
      // tokens contain no whitespace, so ' ' joins collision-free
      bigrams.add(toks(i) + " " + toks(i + 1)); ()
      i += 1
    }
    val nBigrams = math.max(0, toks.length - 1).toLong
    new GenericInternalRow(Array[Any](
      toks.length.toLong, counts.size().toLong, top, nBigrams,
      bigrams.size().toLong))
  }
}

case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = RepetitionStats.Schema

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.of(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStats.of($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStatsExpr {
  def apply(c: Column): Column =
    bridge.toColumn(RepetitionStatsExpr(bridge.toExpression(c)))
}
