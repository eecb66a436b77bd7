package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** ANN search extension (SURVEY §7.6). */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // A tiny corpus with a planted structure: 1 and 2 parallel, 3 opposite,
  // 4 orthogonal; queries = {1}.
  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(2.0f, 0.001f, 0.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (5L, Array(0.5f, 0.5f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("dot_matrix equals one DotProduct per matrix row (incl codegen path)") {
    import graft.functions.VectorOps
    val m = Seq(Seq(1.0, 2.0, 3.0), Seq(0.0, -1.0, 0.5), Seq(4.0, 4.0, 4.0))
    val df = Seq(Seq(2.0, 0.5, 1.0)).toDF("v")
    val all = df.select(VectorOps.dotAll(col("v"), typedlit(m)).as("d"))
      .as[Seq[Double]].head()
    val each = m.map(row =>
      df.select(VectorOps.dot(col("v"), typedlit(row)).as("d")).as[Double].head())
    all shouldBe each
    all shouldBe Seq(6.0, 0.0, 14.0)
  }

  test("dot_matrix rejects a dimension-mismatched matrix row loudly") {
    import graft.functions.VectorOps
    val bad = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))
    val e = intercept[Exception] {
      Seq(Seq(1.0, 1.0)).toDF("v")
        .select(VectorOps.dotAll(col("v"), typedlit(bad))).collect()
    }
    e.getMessage should include("mismatch")
  }

  test("brute top-k ranks by cosine with deterministic tie-break") {
    val out = Similarity.bruteTopK(vecs, v => v === 1L, k = 4)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect()
    out.map(_._2).toSeq shouldBe Seq(2L, 5L, 4L, 3L) // parallel, 45°, 90°, 180°
    out.head._4 shouldBe 999L // cos(1,2) ~ 0.9999999 -> floor 999
    out.last._4 shouldBe -1000L
  }

  test("int8 pack/dot round-trips and matches a hand-computed dot") {
    import graft.functions.Int8Ops
    val df = Seq((Seq(127, -128, 0, 5), Seq(1, 2, 3, 4))).toDF("a", "b")
    df.select(Int8Ops.dot(Int8Ops.pack(col("a")), Int8Ops.pack(col("b"))).as("d"))
      .as[Long].head() shouldBe (127L * 1 - 128L * 2 + 0L * 3 + 5L * 4)
    // out-of-range component and dimension mismatch both fail loudly
    intercept[Exception] {
      Seq(Seq(200)).toDF("a").select(Int8Ops.pack(col("a"))).collect()
    }.getMessage should include("outside")
    intercept[Exception] {
      Seq((Seq(1, 2), Seq(1, 2, 3))).toDF("a", "b")
        .select(Int8Ops.dot(Int8Ops.pack(col("a")), Int8Ops.pack(col("b")))).collect()
    }.getMessage should include("mismatch")
  }

  test("quantize guards: zero-norm NaN, null elements, and tie rounding") {
    import graft.functions.{Int8Ops, QuantizeInt8}
    // zero vector -> nrm 0 -> NaN components must throw, not pack 0x00
    intercept[Exception] {
      Seq((Seq(0.0, 0.0), 0.0)).toDF("v", "n")
        .select(Int8Ops.quantize(col("v"), col("n"))).collect()
    }.getMessage should include("bad norm")
    intercept[Exception] {
      Seq((Seq(Some(1.0), None), 2.0)).toDF("v", "n")
        .select(Int8Ops.quantize(col("v"), col("n"))).collect()
    }.getMessage should include("NULL component")
    intercept[Exception] {
      Seq(Seq(Some(1), None)).toDF("a")
        .select(Int8Ops.pack(col("a"))).collect()
    }.getMessage should include("NULL component")
    // round-half-away matches C round on the adversarial boundary double
    QuantizeInt8.roundHalfAway(0.49999999999999994) shouldBe 0.0
    QuantizeInt8.roundHalfAway(-0.49999999999999994) shouldBe -0.0
    QuantizeInt8.roundHalfAway(2.5) shouldBe 3.0
    QuantizeInt8.roundHalfAway(-2.5) shouldBe -3.0
    QuantizeInt8.roundHalfAway(2.4999999999999996) shouldBe 2.0
  }

  test("quantized top-k preserves the planted neighborhood order") {
    val out = Similarity.quantTopK(vecs, v => v === 1L, k = 4)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect()
    // same ranking as exact cosine on this corpus; scores are int8 dots
    out.map(_._2).toSeq shouldBe Seq(2L, 5L, 4L, 3L)
    out.head._4 shouldBe 127L * 127L // parallel unit vectors
    out.last._4 shouldBe -127L * 127L // opposite
  }

  test("quant+rerank reproduces exact brute top-k when candidates cover the corpus") {
    val exact = Similarity.bruteTopK(vecs, v => v === 1L, k = 4)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect().toSeq
    val rr = Similarity.quantRerankTopK(vecs, v => v === 1L, k = 4, candidates = 4)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect().toSeq
    rr shouldBe exact // stage-2 scores are the same exact cosine
  }

  test("buckets are stable, in [0, 2^6), and differ across tables") {
    val idx = Similarity.bucketedIndex(Similarity.index(vecs), dim = 4)
    val buckets = idx.select("bucket").as[Long].collect()
    all(buckets) should be >= 0L
    all(buckets) should be < 64L
    idx.select("t").distinct().count() shouldBe Similarity.NumTables
    // same vector indexed twice -> identical buckets (pure function)
    val b1 = idx.filter(col("vec_id") === 1L).select("t", "bucket").collect().toSet
    val b2 = Similarity.bucketedIndex(Similarity.index(vecs), dim = 4)
      .filter(col("vec_id") === 1L).select("t", "bucket").collect().toSet
    b1 shouldBe b2
  }

  test("LSH always finds a (near-)identical vector: same planes, same bucket") {
    val out = Similarity.lshTopK(vecs, v => v === 1L, k = 4, dim = 4)
      .as[(Long, Long, Long, Long)].collect()
    // vector 2 is near-parallel to 1 -> identical sign pattern in every table
    out.map(r => r._2 -> r._4).toMap.get(2L) shouldBe Some(999L)
    out.find(_._2 == 2L).map(_._3) shouldBe Some(1L)
  }

  test("mismatched hyperplane dimension fails loudly (no silent truncation)") {
    val e = intercept[org.apache.spark.SparkException] {
      Similarity.lshTopK(vecs, v => v === 1L, k = 4, dim = 64).collect()
    }
    e.getMessage should include("dimension mismatch")
  }

  test("LSH candidates are a subset of the corpus; ranks are contiguous from 1") {
    val out = Similarity.lshTopK(vecs, v => v === 1L, k = 4, dim = 4)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect()
    out.map(_._3).toSeq shouldBe (1L to out.length)
    out.map(_._2).foreach(nb => Seq(2L, 3L, 4L, 5L) should contain(nb))
  }

  test("planes are exact rationals reproducible from the formula") {
    Similarity.plane(0, 0, 0) shouldBe (7.0 / 97.0 - 0.5)
    Similarity.plane(2, 5, 63) shouldBe
      ((((2 * 577 + 5) * 131 + 63 * 31 + 7) % 97).toDouble / 97.0 - 0.5)
  }
}
