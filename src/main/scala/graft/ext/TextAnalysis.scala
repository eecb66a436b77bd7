package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Text-analysis operators for large-scale training-data pipelines (SURVEY
  * §7.6): token counting, quality scoring, language ID, fingerprinting —
  * all single-pass, codegen-friendly column expressions (no UDFs, no
  * shuffles; every operator here is embarrassingly parallel over documents).
  *
  * Determinism contract: every function is reproducible in ANSI-ish SQL so
  * the DuckDB oracle can hash-match it — ratios use pure *integer* arithmetic
  * (`x * 1000 DIV y`), never floating division.
  */
object TextAnalysis {

  import graft.functions.IntMath.idiv

  /** Whitespace token count: `split(trim(s), "\s+")`, 0 for blank text. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: greedy ≤4-char letter chunks, single digits,
    * and one token per non-alphanumeric mark — a regex stand-in for a real
    * byte-pair vocabulary (same token-growth shape: ~len/4 per long word).
    */
  val BpeishPattern = "[a-z]{1,4}|[0-9]|[^a-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    regexp_count(lower(text), lit(BpeishPattern))

  /** Punctuation/symbol character count. */
  def punctCount(text: Column): Column =
    regexp_count(lower(text), lit("[^a-z0-9\\s]"))

  /** English stop-word occurrences (word-boundary matched). */
  val StopPattern = "\\b(the|a|of|and|to|in|is)\\b"
  def stopCount(text: Column): Column =
    regexp_count(lower(text), lit(StopPattern))

  /** Quality facets, integer-scaled (‰ and ×100) for oracle stability:
    * punct per 1000 chars, stop words per 1000 tokens, average token length
    * ×100. `DIV` (integer division) keeps every value exact.
    */
  def qualityFacets(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val nTokens = wsTokenCount(text)
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "punct_per_1000" ->
        when(nChars === 0, lit(0L)).otherwise(idiv(punctCount(text).cast("long") * 1000L, nChars)),
      "stop_per_1000" ->
        when(nTokens === 0, lit(0L)).otherwise(idiv(stopCount(text).cast("long") * 1000L, nTokens)),
      "avg_tok_x100" ->
        when(nTokens === 0, lit(0L)).otherwise(idiv(nonSpace.cast("long") * 100L, nTokens)))
  }

  /** Scalar quality score in [0, 1000]: full marks need enough tokens,
    * mid-range word lengths, some stop-word mass, little punctuation. A
    * deterministic, cheap analog of fastText-style quality filters.
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFacets(text).toMap
    val lengthPts = least(f("n_tokens").cast("long"), lit(250L)) // up to 250
    val stopPts = least(f("stop_per_1000"), lit(250L)) // up to 250
    val punctPts = greatest(lit(0L), lit(250L) - f("punct_per_1000")) // up to 250
    val avgPts = greatest(lit(0L),
      lit(250L) - idiv(abs(f("avg_tok_x100") - lit(450L)), lit(2L))) // peak at 4.5 chars
    (lengthPts + stopPts + punctPts + avgPts).cast("long")
  }

  /** Language-ID: marker-word n-gram heuristic. Scores = marker hits per
    * language; prediction = arg-max with a fixed tie order (en, de, es, fr),
    * `unknown` when nothing matches. Real pipelines use fastText; the scoring
    * *shape* (per-language evidence, arg-max, abstain on zero) is the same.
    */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|is|to)\\b",
    "de" -> "\\b(der|die|das|und|ein|ist)\\b",
    "es" -> "\\b(el|la|los|y|un|es)\\b",
    "fr" -> "\\b(le|les|et|une|est)\\b")

  def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, pat) =>
      s"score_$lang" -> regexp_count(lower(text), lit(pat)).cast("long")
    }

  def langPredict(scores: Seq[(String, Column)]): Column = {
    val top = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("unknown")) { case ((name, s), elseCol) =>
      when(top > 0 && s === top, lit(name.stripPrefix("score_"))).otherwise(elseCol)
    }
  }

  /** Document fingerprint: rolling polynomial hash of the full text
    * (single-pass codegen expression, [[graft.functions.PolyHashExpr]]).
    */
  def fingerprint(text: Column): Column = TextHash.polyHash(text)

  // ------------------------------------------------------------- queries

  def tokens(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      wsTokenCount(col("text")).cast("long").as("ws_tokens"),
      bpeishTokenCount(col("text")).cast("long").as("bpe_tokens"),
      punctCount(col("text")).cast("long").as("punct_chars"))

  def quality(docs: DataFrame): DataFrame = {
    val facets = qualityFacets(col("text")).map { case (n, c) => c.cast("long").as(n) }
    docs.select((col("doc_id") +: facets :+ qualityScore(col("text")).as("quality")): _*)
  }

  def langId(docs: DataFrame): DataFrame = {
    val scores = langScores(col("text"))
    docs.select(
      (col("doc_id") +: scores.map { case (n, c) => c.as(n) }
        :+ langPredict(scores).as("lang_pred")): _*)
  }

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** Per-language top-k terms by document frequency — the corpus-statistics
    * pass of a training-data pipeline (vocabulary building, boilerplate
    * spotting). One distinct-terms explode, one (lang, term) count
    * aggregate, then a per-language top-k window; the window's partition is
    * the handful of languages, so the rank step is cheap — the heavy lifting
    * stays in the partial-aggregated count. Ties rank lexicographically for
    * determinism.
    */
  def topTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("lang"), col("doc_id"),
        explode(array_distinct(split(trim(col("text")), "\\s+"))).as("term"))
    val dfreq = terms.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("lang")).orderBy(col("df").desc, col("term"))
    dfreq.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
