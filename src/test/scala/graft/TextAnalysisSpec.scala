package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis
import graft.functions.{PolyHash, TextHash}

/** Text-analysis extension operators (SURVEY §7.6). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  test("whitespace token count handles blanks, runs of spaces, and trim") {
    val df = Seq("a b  c", "", "   ", " x ").toDF("text")
      .select(TextAnalysis.wsTokenCount(col("text")).as("n"))
    df.as[Long].collect().toSeq shouldBe Seq(3L, 0L, 0L, 1L)
  }

  test("BPE-ish count: long words split into <=4-char pieces; digits/punct separate") {
    val df = Seq(("aggregation b 42!",
      3 + 1 + 2 + 1)) // agg|rega|tion, b, 4|2, !
      .toDF("text", "expected")
    val got = df.select(TextAnalysis.bpeishTokenCount(col("text"))).as[Long].head()
    got shouldBe df.select(col("expected").cast("long")).as[Long].head()
  }

  test("fused scanner == the regex formulation it replaced (adversarial + real docs)") {
    // The TextStats scanner exists for speed only — these regexes DEFINE the
    // semantics (and the DuckDB oracles replay them). Pin equality on edge
    // cases (leading tabs → split()'s empty token, marker words glued to
    // word chars, unicode, blanks) and on the real corpus.
    val adversarial = Seq(
      "", " ", "\t", "\ta b", " \t ", "x  y\tz\n",
      "the-a the1 _the the a_b the_", "of,and.to;in!is?",
      "AGGREGATION The 42!", "aaaaaaaaaaa 0123 ...",
      "der und ein ist el la los y un es le les et une est",
      "café über naïve €42").toDF("text")
    val real = spark.read.parquet(s"$sfDir/documents.parquet").select(col("text"))
    for (df <- Seq(adversarial, real)) {
      val scanner = df.select(TextAnalysis.stats(col("text")).as("st"))
        .select(graft.functions.TextStats.Fields.map(f => col(s"st.$f")): _*)
      import org.apache.spark.sql.{functions => F}
      val regex = df.select(
        F.length(col("text")).cast("long"),
        F.length(regexp_replace(col("text"), "\\s", "")).cast("long"),
        when(F.length(F.trim(col("text"))) === 0, 0L)
          .otherwise(F.size(F.split(F.trim(col("text")), "\\s+")).cast("long")),
        regexp_count(lower(col("text")), lit("[^a-z0-9\\s]")).cast("long"),
        regexp_count(lower(col("text")), lit("\\b(the|a|of|and|to|in|is)\\b")).cast("long"),
        regexp_count(lower(col("text")), lit("[a-z]{1,4}|[0-9]|[^a-z0-9\\s]")).cast("long"),
        regexp_count(lower(col("text")), lit("\\b(the|a|of|and|is|to)\\b")).cast("long"),
        regexp_count(lower(col("text")), lit("\\b(der|die|das|und|ein|ist)\\b")).cast("long"),
        regexp_count(lower(col("text")), lit("\\b(el|la|los|y|un|es)\\b")).cast("long"),
        regexp_count(lower(col("text")), lit("\\b(le|les|et|une|est)\\b")).cast("long"))
      scanner.collect().map(_.toSeq) shouldBe regex.collect().map(_.toSeq)
    }
  }

  test("repetition stats: counts, top share, bigram dedup, split edge cases") {
    import graft.functions.RepetitionStatsExpr
    def stats(s: String): (Long, Long, Long, Long, Long) =
      Seq(s).toDF("text")
        .select(RepetitionStatsExpr(col("text")).as("r"))
        .select("r.n_tokens", "r.n_distinct", "r.top_cnt", "r.n_bigrams",
          "r.n_distinct_bigrams")
        .as[(Long, Long, Long, Long, Long)].head()
    // "a b a b a": 5 tokens, 2 distinct, top a=3; bigrams {a b, b a} of 4
    stats("a b a b a") shouldBe ((5L, 2L, 3L, 4L, 2L))
    stats("x") shouldBe ((1L, 1L, 1L, 0L, 0L))
    // leading tab after trim keeps split()'s empty token, like Spark/DuckDB
    stats(" \tx y ") shouldBe ((3L, 3L, 1L, 2L, 2L))
    // all-same doc is fully duplicated
    stats("z z z z") shouldBe ((4L, 1L, 4L, 3L, 1L))
  }

  test("quality facets are integer-exact and guard zero denominators") {
    val r = TextAnalysis.quality(one("the cat, the hat!")).collect().head
    val m = r.getValuesMap[Any](Seq("n_chars", "n_tokens", "punct_per_1000",
      "stop_per_1000", "avg_tok_x100"))
    m("n_chars") shouldBe 17L
    m("n_tokens") shouldBe 4L
    m("punct_per_1000") shouldBe (2L * 1000) / 17
    m("stop_per_1000") shouldBe (2L * 1000) / 4
    m("avg_tok_x100") shouldBe (14L * 100) / 4
    TextAnalysis.quality(one("")).collect().head.getLong(3) shouldBe 0L
  }

  test("language-ID picks the dominant marker set; abstains on none") {
    val rows = TextAnalysis.langId(Seq(
      (1L, "the cat and the dog is here"),
      (2L, "der hund und die katze ist da"),
      (3L, "qwerty zzz")).toDF("doc_id", "text"))
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    rows(1L) shouldBe "en"
    rows(2L) shouldBe "de"
    rows(3L) shouldBe "unknown"
  }

  test("tie-break is the fixed chain order (en before de)") {
    // "la" is in both es and fr marker sets -> tie; es comes first.
    val pred = TextAnalysis.langId(one("la la"))
      .select("lang_pred").as[String].head()
    pred shouldBe "es"
  }

  test("polyHash matches the reference fold and the codegen path") {
    val texts = Seq("", "a", "abc", "hello world", "ünïcödé")
    val viaSpark = texts.toDF("t")
      .select(TextHash.polyHash(col("t"))).as[Long].collect().toSeq
    viaSpark shouldBe texts.map(PolyHash.of)
    // spot-check the fold arithmetic itself
    PolyHash.of("a") shouldBe 'a'.toLong
    PolyHash.of("ab") shouldBe ('a' * 31L + 'b') % PolyHash.Mod
  }

  test("redactPii scrubs email/phone/ip/long digit runs, keeps the rest") {
    val in = "mail bob.smith+x@corp.example.org call +1-555-0199 " +
      "host 192.168.0.1 acct 12345678 ok ref 42 end"
    val out = Seq(in).toDF("t")
      .select(TextAnalysis.redactPii(col("t"))).as[String].head()
    out shouldBe "mail <EMAIL> call <PHONE> host <IP> acct <NUM> ok ref 42 end"
  }

  test("redactPii rule order: specific shapes beat the generic digit-run") {
    // phone digits would also match \d-runs if the order flipped
    val out = Seq("a@b.co 123456 +12-345-6789").toDF("t")
      .select(TextAnalysis.redactPii(col("t"))).as[String].head()
    out shouldBe "<EMAIL> <NUM> <PHONE>"
  }

  test("qualityFilter: first failing rule names the reason, ok keeps") {
    def reasonOf(t: String): (String, Boolean) =
      TextAnalysis.qualityFilter(Seq((1L, t)).toDF("doc_id", "text"))
        .select("reason", "keep").as[(String, Boolean)].head()
    reasonOf("one two three") shouldBe ("too_short", false)
    reasonOf("aaaaaaaaaaaa bbbbbbbbbbbb cccccccccccc dddddddddddd eeeeeeeeeeee") shouldBe
      ("bad_word_len", false)
    reasonOf("wx yz!! ab,, cd;; ef..") shouldBe ("too_much_punct", false)
    reasonOf("alpha beta gamma delta epsilon zeta") shouldBe ("no_stopwords", false)
    reasonOf("the cat sat on the mat in a hat") shouldBe ("ok", true)
  }

  test("tfIdfTopTerms: rare terms outrank common ones, integer-exact scores") {
    // 3 docs; 'rare' only in doc 1, 'shared' in all -> idf(shared) floor
    val d = Seq(
      (1L, "shared shared rare"),
      (2L, "shared other other"),
      (3L, "shared misc")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(d, k = 2)
      .as[(Long, String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5).map(r => (r._2, r._4))).toMap
    // doc 1: rare tf=1 idf=(3*1000)//1=3000 -> 3000; shared tf=2 idf=1000 -> 2000
    out(1L) shouldBe Array(("rare", 3000L), ("shared", 2000L))
    // doc 2: other tf=2 idf=3000 -> 6000 beats shared 1000
    out(2L).head shouldBe ("other", 6000L)
  }

  test("fingerprint is stable and collision-spread over real docs") {
    val fps = TextAnalysis.fingerprints(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val n = fps.count()
    // distinct fingerprints ~= distinct texts (hash spreads, no mass collisions)
    fps.select("fp").distinct().count() should be > (n * 9 / 10)
  }
}
