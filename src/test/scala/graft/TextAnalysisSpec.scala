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
    df.as[Int].collect().toSeq shouldBe Seq(3, 0, 0, 1)
  }

  test("BPE-ish count: long words split into <=4-char pieces; digits/punct separate") {
    val df = Seq(("aggregation b 42!",
      3 + 1 + 2 + 1)) // agg|rega|tion, b, 4|2, !
      .toDF("text", "expected")
    val got = df.select(TextAnalysis.bpeishTokenCount(col("text"))).as[Int].head()
    got shouldBe df.select(col("expected")).as[Int].head()
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

  test("fingerprint is stable and collision-spread over real docs") {
    val fps = TextAnalysis.fingerprints(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val n = fps.count()
    // distinct fingerprints ~= distinct texts (hash spreads, no mass collisions)
    fps.select("fp").distinct().count() should be > (n * 9 / 10)
  }
}
