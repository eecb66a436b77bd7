package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.functions.VectorOps

/** Dedup extension operators (SURVEY §7.6): exact, Jaccard, MinHash+LSH,
  * SimHash, embedding cosine.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docsDf = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (4L, "completely different words here nothing shared at all"),
    (5L, "tiny doc")) // < 3 tokens -> no shingles
    .toDF("doc_id", "text")

  test("exact dedup: canonical = min doc_id, dups flagged") {
    val out = Dedup.exact(docsDf).orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect()
    out shouldBe Array(
      (1L, 1L, false), (2L, 2L, false), (3L, 1L, true),
      (4L, 4L, false), (5L, 5L, false))
  }

  test("shingles: ordered distinct 3-grams; short docs excluded upstream") {
    val sh = docsDf
      .filter(org.apache.spark.sql.functions.size(Dedup.tokens(col("text"))) >= 3)
      .select(col("doc_id"), Dedup.shingles(Dedup.tokens(col("text"))).as("sh"))
      .filter(col("doc_id") === 1L)
      .select(explode(col("sh"))).as[String].collect()
    sh.head shouldBe "the quick brown"
    sh.length shouldBe 7 // 9 tokens -> 7 shingles, all distinct here
  }

  test("jaccard pairs: exact dup scores 1000; near-dup high; disjoint absent") {
    val pairs = Dedup.jaccardPairs(docsDf, threshold = 500L)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    pairs((1L, 3L)) shouldBe 1000L
    pairs.keySet should contain((1L, 2L)) // 6 of 8 shingles shared -> 750
    pairs((1L, 2L)) shouldBe (6L * 1000 / 8)
    pairs.keys.flatMap(p => Seq(p._1, p._2)) should not contain 4L
  }

  test("decontaminate: doc sharing a 5-gram with the benchmark is flagged with its hit count") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x alpha beta gamma delta epsilon zeta y"), // contains 2 benchmark 5-grams
      (2L, "completely unrelated words that never overlap anything"),
      (3L, "alpha beta gamma short")) // 4 tokens: no 5-gram at all
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, bench)
      .as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 2L)
  }

  test("substring spans: a duplicated k-run yields L-k+1 consecutive dup windows") {
    // Docs 10/11 share a 9-token run -> 2 duplicated 8-windows each, starting
    // at positions 2 and 1; doc 12 shares nothing 8 tokens long.
    val d = Seq(
      (10L, "pre one two three four five six seven eight nine"),
      (11L, "one two three four five six seven eight nine post"),
      (12L, "one two three four five six seven unrelated tail here"))
      .toDF("doc_id", "text")
    val out = Dedup.substringDupSpans(d, k = 8)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    out shouldBe Map(10L -> ((2L, 2L)), 11L -> ((2L, 1L)))
  }

  test("minhash: identical docs -> identical signatures; LSH finds the pair") {
    val sig = Dedup.minhashSignatures(docsDf)
    val rows = sig.filter(col("doc_id").isin(1L, 3L)).drop("doc_id").collect()
    rows(0).toSeq shouldBe rows(1).toSeq
    val pairs = Dedup.minhashLshPairs(docsDf, minMatches = 16L)
      .as[(Long, Long, Long)].collect()
    pairs should contain((1L, 3L, 16L))
  }

  test("fused minhash == the declarative shingle+transform formulation (real docs)") {
    // The declarative form (distinct shingles -> polyhash -> 16 transformed
    // array_mins) DEFINES the semantics and is what the oracle replays.
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val fused = Dedup.minhashSignatures(real).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val declarative = {
      val base = real.select(col("doc_id"), Dedup.tokens(col("text")).as("t"))
        .filter(org.apache.spark.sql.functions.size(col("t")) >= 3)
        .select(col("doc_id"), Dedup.shingles(col("t")).as("sh"))
        .select(col("doc_id"),
          transform(col("sh"), s => graft.functions.TextHash.polyHash(s)).as("hs"))
      val sigs = (0 until Dedup.NumHashes).map { j =>
        array_min(transform(col("hs"),
          h => (h * Dedup.hashA(j) + Dedup.hashB(j)) % Dedup.P)).as(s"s$j")
      }
      base.select(col("doc_id") +: sigs: _*).collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    }
    fused.size shouldBe declarative.size
    fused.foreach { case (id, sig) =>
      withClue(s"doc $id") { sig shouldBe declarative(id) }
    }
  }

  test("minhash signature components are in [0, P)") {
    val sig = Dedup.minhashSignatures(docsDf)
    val mins = sig.select(least((0 until Dedup.NumHashes).map(j => col(s"s$j")): _*))
      .as[Long].collect()
    all(mins) should be >= 0L
    val maxs = sig.select(greatest((0 until Dedup.NumHashes).map(j => col(s"s$j")): _*))
      .as[Long].collect()
    all(maxs) should be < Dedup.P
  }

  test("exact dedup: hash-key result matches; verifyTexts audited mode agrees") {
    val plain = Dedup.exact(docsDf).collect().map(_.toSeq).toSet
    val audited = Dedup.exact(docsDf, verifyTexts = true).collect().map(_.toSeq).toSet
    audited shouldBe plain
  }

  test("simhash64: codegen expression == reference impl; bits 62-63 always zero") {
    import graft.functions.SimHash64
    val got = Dedup.simhash(docsDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = docsDf.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      withClue(s"doc $id") { got(id) shouldBe SimHash64.of(toks) }
    }
    got.values.foreach(h => (h >>> SimHash64.Bits) shouldBe 0L)
  }

  test("simhash: identical docs equal; banding == quadratic scan (pigeonhole)") {
    val sh = Dedup.simhash(docsDf)
    val m = sh.as[(Long, Long)].collect().toMap
    m(1L) shouldBe m(3L)
    val viaLsh = Dedup.simhashPairs(docsDf, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val brute = sh.as("x").join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long"))
      .as[(Long, Long, Long)].collect().filter(_._3 <= 3).toSet
    viaLsh shouldBe brute
  }

  test("dot product expression matches manual fold; norm exact on 3-4-5") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    df.select(VectorOps.dot(col("a"), col("b"))).as[Double].head() shouldBe 32.0
    val n = Seq(Tuple1(Array(3.0, 4.0))).toDF("v")
      .select(VectorOps.norm(col("v"))).as[Double].head()
    n shouldBe 5.0
  }

  test("canonical corpus: one keeper per cluster, best quality, member of cluster") {
    val out = Queries.all("pipe_canonical_corpus")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val cl = Dedup.clusters(d, Dedup.minhashLshPairs(d))
      .collect().map(r => (r.getLong(0), r.getLong(1))) // (doc_id, cluster_id)
    val members = cl.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val quality = graft.ext.TextAnalysis.quality(d)
      .select(col("doc_id"), col("quality"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exactly one keeper per cluster, covering every cluster
    out.map(_._1).toSet shouldBe members.keySet
    out.foreach { case (cid, keep, q, n) =>
      members(cid) should contain(keep) // keeper is a member
      n shouldBe members(cid).size.toLong
      q shouldBe quality(keep)
      q shouldBe members(cid).map(quality).max // the best member
    }
    // the pass actually deduplicates: keepers < docs when clusters merge
    out.length.toLong should be <= d.count()
  }

  test("paragraph dedup: shared chunks keep first occurrence, docs rebuilt in order") {
    // 3-word chunks: doc 1 = [A B], doc 2 = [B C] (B = doc 1's suffix),
    // doc 3 = [A] entirely (pure boilerplate -> vanishes)
    val d = Seq(
      (1L, "a1 a2 a3 b1 b2 b3"),
      (2L, "b1 b2 b3 c1 c2 c3"),
      (3L, "a1 a2 a3")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(d, chunkWords = 3)
      .as[(Long, String)].collect().sortBy(_._1)
    out shouldBe Array(
      (1L, "a1 a2 a3 b1 b2 b3"),
      (2L, "c1 c2 c3")) // lost its duplicated preamble, kept its tail
  }

  test("paragraph dedup: trailing partial chunk is its own unit") {
    val d = Seq((1L, "x y z w"), (2L, "w")).toDF("doc_id", "text")
    // chunks of 3: doc 1 -> ["x y z", "w"]; doc 2 -> ["w"] loses to doc 1
    val out = Dedup.paragraphDedup(d, chunkWords = 3)
      .as[(Long, String)].collect().sortBy(_._1)
    out shouldBe Array((1L, "x y z w"))
  }

  test("embedding pairs: identical vectors -> cos_x1000 = 1000 (exact sqrt)") {
    val e = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(3.0f, 4.0f)),
      (3L, Array(-4.0f, 3.0f))) // orthogonal to 1
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(e, threshold = 0L)
      .as[(Long, Long, Long)].collect().toSet
    pairs should contain((1L, 2L, 1000L))
    pairs.filter(p => p._1 == 1L && p._2 == 3L).map(_._3).foreach(_ shouldBe 0L)
  }

  test("semantic dedup: exact copies drop with their original as keeper; no cartesian in the plan") {
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // exact copies of every 25th vector: same cell by construction, cos = 1
    val copies = base.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    val nCopies = copies.count()
    val out = Dedup.semanticDedup(base.unionAll(copies)).cache()
    val dropped = out.filter(col("is_dup")).collect()
    dropped.length.toLong shouldBe nCopies
    dropped.foreach { r =>
      r.getLong(0) shouldBe (r.getAs[Long]("kept_by") + 5000L)
    }
    // survivors have no keeper; originals all survive
    out.filter(!col("is_dup")).filter(col("kept_by").isNotNull).count() shouldBe 0
    out.filter(!col("is_dup")).count() shouldBe base.count()
    // scale shape: the pairing is the cell equi-join, never a cartesian
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian in semantic dedup plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in semantic dedup plan")
  }
}
