package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis
import graft.functions.Bpe

/** Real merges-table BPE ([[Bpe]], SURVEY §7.6): greedy tokenization laws,
  * deterministic training, the codegen expressions, and agreement between
  * the leftmost-single-fuse apply rule and training's merge-all rule.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val T = Bpe.Default

  test("tokenizeWord: greedy lowest-rank-first merging under the default table") {
    // Trained on the fixture corpus: frequent corpus words compress fully,
    // out-of-corpus words split into learned subwords or chars.
    Bpe.tokenizeWord("window", T).toSeq shouldBe Seq("window")
    Bpe.tokenizeWord("query", T).toSeq shouldBe Seq("query")
    Bpe.tokenizeWord("spark", T).toSeq shouldBe Seq("s", "par", "k")
    Bpe.tokenizeWord("customer", T).toSeq shouldBe Seq("c", "u", "st", "o", "mer")
    Bpe.tokenizeWord("the", T).toSeq shouldBe Seq("t", "h", "e")
    // Untrained letters stay single chars; rejoining equals the input.
    Bpe.tokenizeWord("xyzzy", T).toSeq shouldBe Seq("x", "y", "z", "z", "y")
    Bpe.tokenizeWord("", T).toSeq shouldBe Seq.empty
    Seq("windows", "partitioned", "aggregation", "qqq", "a").foreach { w =>
      Bpe.tokenizeWord(w, T).mkString shouldBe w
    }
  }

  test("rank priority: lower-rank pair merges first regardless of position") {
    // table: (b,c) rank 1, (a,b) rank 2 — in "abc" the RIGHT pair wins.
    val t = Bpe.Table(Vector("b" -> "c", "a" -> "b"))
    Bpe.tokenizeWord("abc", t).toSeq shouldBe Seq("a", "bc")
    // leftmost occurrence of the best pair: "abcbc" fuses the first bc.
    Bpe.tokenizeWord("abcbc", t).toSeq shouldBe Seq("a", "bc", "bc")
    // overlapping occurrences fuse left-to-right: aaa -> [aa, a]
    val t2 = Bpe.Table(Vector("a" -> "a"))
    Bpe.tokenizeWord("aaa", t2).toSeq shouldBe Seq("aa", "a")
    Bpe.tokenizeWord("aaaa", t2).toSeq shouldBe Seq("aa", "aa")
  }

  test("countTokens: words + one token per non-whitespace symbol; \\s is the separator class") {
    Bpe.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString(
      "the window! 42\t spark\n"), T) shouldBe (3L + 1 + 1 + 2 + 3)
    // empty/blank
    Bpe.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString(""), T) shouldBe 0L
    Bpe.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString(" \t\n"), T) shouldBe 0L
    // uppercase lowers first
    Bpe.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString("WINDOW"), T) shouldBe 1L
  }

  test("train: deterministic, frequency-greedy, lexicographic tie-break, hapax stop") {
    // 'ab' x3, 'abc' x2: (a,b) count 5 wins first; then (ab,c) count 2.
    val m = Bpe.train(Seq("ab" -> 3L, "abc" -> 2L), numMerges = 10)
    m.take(2) shouldBe Vector("a" -> "b", "ab" -> "c")
    // After those merges every word is one token: no pair occurs twice -> stop.
    m.length shouldBe 2
    // Tie-break: equal counts -> lexicographically smallest pair.
    Bpe.train(Seq("dc" -> 2L, "ba" -> 2L), 1).head shouldBe ("b" -> "a")
    // Hapax pairs never merge.
    Bpe.train(Seq("xy" -> 1L, "zw" -> 1L), 5) shouldBe Vector.empty
    // Re-training on identical input is bit-identical.
    val wf = Seq("stream" -> 10L, "street" -> 8L, "steam" -> 6L)
    Bpe.train(wf, 6) shouldBe Bpe.train(wf, 6)
  }

  test("apply/train agreement: tokenizing with a trained table reproduces training's end state") {
    // Train to exhaustion on a corpus, then tokenize each word with the
    // trained table: the per-word token sequences must equal the training
    // loop's own final state (the leftmost-single-fuse rule = training's
    // merge-all rule, for trained tables).
    val wf = Seq("window" -> 9L, "widow" -> 4L, "indigo" -> 3L, "dow" -> 7L,
      "inn" -> 2L, "won" -> 2L)
    val merges = Bpe.train(wf, 50)
    val t = Bpe.Table(merges)
    // replay training's state by applying merges in order with mergeAll
    wf.foreach { case (w, _) =>
      var toks = w.map(String.valueOf(_)).toArray
      merges.foreach { case (a, b) => toks = Bpe.mergeAll(toks, a, b) }
      Bpe.tokenizeWord(w, t).toSeq shouldBe toks.toSeq
    }
  }

  test("expressions: codegen'd count and token stream agree with the driver implementation") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        TextAnalysis.bpeTokenCount(col("text")).as("n"),
        TextAnalysis.bpeTokens(col("text")).as("toks"))
    val rows = df.collect()
    rows.length should be > 0
    rows.foreach { r =>
      val expect = Bpe.countTokens(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)), T)
      r.getLong(2) shouldBe expect
      r.getSeq[String](3).length.toLong shouldBe expect
      // token stream rejoins to the letters+symbols of the lowered text
      r.getSeq[String](3).mkString shouldBe
        r.getString(1).toLowerCase.replaceAll("\\s", "")
    }
    // whole-stage codegen stays intact around the static call (the `*(n)`
    // prefix marks a WholeStageCodegen span in the executed plan)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"no codegen span:\n$plan")
  }

  test("trainBpe (distributed): corpus training is deterministic and matches Default") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t1 = TextAnalysis.trainBpe(docs, "text", numMerges = 48)
    val t2 = TextAnalysis.trainBpe(docs, "text", numMerges = 48)
    t1 shouldBe t2
  }

  test("null text counts 0 via the expression (nullSafeEval contract)") {
    val got = Seq[(java.lang.Long, String)]((1L, null), (2L, "a window"))
      .toDF("doc_id", "text")
      .select(TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
    // UnaryExpression null-propagates: null in -> null out.
    got shouldBe Seq(-1L, 2L)
  }
}
