package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All of [[graft.ext.TextAnalysis]]'s per-document counters in THREE linear
  * string passes (original, lowered, lowered-again-for-subwords) instead of
  * ~15 regex/split passes — same numbers, ~20× less work per document.
  *
  * Semantics replicated EXACTLY (the DuckDB oracles hash-compare them):
  *  - `chars`     == `length(text)` (Unicode code points);
  *  - `nonspace`  == `length(regexp_replace(text, "\\s", ""))` — Java regex
  *    `\s` is the ASCII class [ \t\n\x0B\f\r];
  *  - `ws_tokens` == `size(split(trim(text), "\\s+"))` with blank → 0:
  *    `trim` strips 0x20 only, and Spark's `split` (limit = -1, unlike
  *    Java's `String.split`) keeps BOTH the leading empty token (trimmed
  *    text starting with non-space whitespace) and the trailing one —
  *    counted here via the starts-with-/ends-with-\s adjustments;
  *  - `punct`     == `regexp_count(lower(text), "[^a-z0-9\\s]")` — the
  *    lowering is `UTF8String.toLowerCase`, the exact function Spark's
  *    `lower()` runs, so full-Unicode edge cases agree by construction;
  *  - `stop`/`en`/`de`/`es`/`fr` == `regexp_count(lower(text), "\\b(w1|w2|…)\\b")`
  *    per marker list: Java `\b` bounds ASCII word chars [a-z0-9_] (on
  *    lowered text), so an occurrence is a maximal word-char run equal to a
  *    marker word — one run scan scores every list at once;
  *  - `bpe`       == `regexp_count(lower(text), "[a-z]{1,4}|[0-9]|[^a-z0-9\\s]")`:
  *    left-to-right non-overlapping greedy matching == greedy ≤4-letter
  *    chunks / single digits / single non-alnum-non-space marks.
  *
  * The expression's generated code is ONE static call — constant code size,
  * no interpreter cliff, scanner logic JIT-compiled once.
  */
object TextStats {

  val Fields: Seq[String] =
    Seq("chars", "nonspace", "ws_tokens", "punct", "stop", "bpe",
      "en", "de", "es", "fr")

  val Schema: StructType =
    StructType(Fields.map(f => StructField(f, LongType, nullable = false)))

  // bit masks per marker list (a word can sit in several lists, e.g. "the")
  private val StopBit = 1
  private val EnBit = 2
  private val DeBit = 4
  private val EsBit = 8
  private val FrBit = 16

  /** word → membership mask; mirrors TextAnalysis.StopPattern/LangMarkers. */
  private val Markers: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    def add(words: Seq[String], bit: Int): Unit = words.foreach { w =>
      m.merge(w, bit, (a, b) => Integer.valueOf(a | b))
    }
    add(Seq("the", "a", "of", "and", "to", "in", "is"), StopBit)
    add(Seq("the", "a", "of", "and", "is", "to"), EnBit)
    add(Seq("der", "die", "das", "und", "ein", "ist"), DeBit)
    add(Seq("el", "la", "los", "y", "un", "es"), EsBit)
    add(Seq("le", "les", "et", "une", "est"), FrBit)
    m
  }
  private val MaxMarkerLen = 3

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
  @inline private def isWordCp(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == '_'

  /** The scanner; called from generated code — keep the signature stable. */
  def of(u: UTF8String): InternalRow = {
    val s = u.toString
    // ---- pass 1 (original): chars, nonspace, ws_tokens
    var chars = 0L
    var nonspace = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      chars += 1
      if (!isWs(cp)) nonspace += 1
      i += Character.charCount(cp)
    }
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    var wsTokens = 0L
    if (e > b) {
      if (isWs(s.codePointAt(b))) wsTokens += 1 // split()'s leading empty token
      if (isWs(Character.codePointBefore(s, e))) wsTokens += 1 // trailing one
      var j = b
      var inRun = false
      while (j < e) {
        val cp = s.codePointAt(j)
        if (!isWs(cp)) { if (!inRun) { wsTokens += 1; inRun = true } }
        else inRun = false
        j += Character.charCount(cp)
      }
    }
    // ---- pass 2 (lowered): punct + marker-word runs
    val lo = u.toLowerCase.toString
    var punct = 0L
    var stop = 0L; var en = 0L; var de = 0L; var es = 0L; var fr = 0L
    val word = new java.lang.StringBuilder(8)
    var wordOverflow = false
    def flushWord(): Unit = {
      if (!wordOverflow && word.length > 0) {
        val mask = Markers.get(word.toString)
        if (mask != null) {
          val v = mask.intValue()
          if ((v & StopBit) != 0) stop += 1
          if ((v & EnBit) != 0) en += 1
          if ((v & DeBit) != 0) de += 1
          if ((v & EsBit) != 0) es += 1
          if ((v & FrBit) != 0) fr += 1
        }
      }
      word.setLength(0)
      wordOverflow = false
    }
    var k = 0
    while (k < lo.length) {
      val cp = lo.codePointAt(k)
      if (isWordCp(cp)) {
        if (word.length >= MaxMarkerLen) wordOverflow = true
        else word.appendCodePoint(cp)
      } else flushWord()
      val letter = cp >= 'a' && cp <= 'z'
      val digit = cp >= '0' && cp <= '9'
      if (!letter && !digit && !isWs(cp)) punct += 1
      k += Character.charCount(cp)
    }
    flushWord()
    // ---- pass 3 (lowered): BPE-ish subword count
    var bpe = 0L
    var p = 0
    while (p < lo.length) {
      val cp = lo.codePointAt(p)
      if (cp >= 'a' && cp <= 'z') {
        var taken = 0
        while (taken < 4 && p < lo.length && {
          val c2 = lo.codePointAt(p); c2 >= 'a' && c2 <= 'z'
        }) { p += Character.charCount(lo.codePointAt(p)); taken += 1 }
        bpe += 1
      } else {
        if ((cp >= '0' && cp <= '9') || !isWs(cp)) bpe += 1
        p += Character.charCount(cp)
      }
    }
    new GenericInternalRow(Array[Any](chars, nonspace, wsTokens, punct, stop,
      bpe, en, de, es, fr))
  }
}

case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = TextStats.Schema

  override protected def nullSafeEval(input: Any): Any =
    TextStats.of(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStats.of($c);")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "text_stats"
}
