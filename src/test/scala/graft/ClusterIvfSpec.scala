package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity, TextAnalysis}
import graft.kv.KvTable

/** Connected-component clustering, IVF ANN, and top-terms. */
class ClusterIvfSpec extends SparkSpec {
  import spark.implicits._

  /** driverMaxEdges = -1 forces the distributed large/small-star path; the
    * default exercises the driver union-find fast path.
    */
  private def clustersOf(n: Long, pairs: Seq[(Long, Long)],
      driverMaxEdges: Long = Dedup.DriverCcMaxEdges): Map[Long, Long] = {
    val docs = spark.range(n).select($"id".as("doc_id"))
    val p = pairs.toDF("a", "b")
    Dedup.clusters(docs, p, driverMaxEdges = driverMaxEdges)
      .as[(Long, Long)].collect().toMap
  }

  private val Mixed = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
  private val MixedExpect = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
    4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L, 8L -> 8L, 9L -> 9L)

  test("clusters: chain, triangle, and singletons all get the component min") {
    // chain 0-1-2-3 (diameter 3), triangle 4-5-6, singletons 7..9
    clustersOf(10, Mixed) shouldBe MixedExpect
  }

  test("clusters: distributed large/small-star path agrees with the driver fast path") {
    clustersOf(10, Mixed, driverMaxEdges = -1) shouldBe MixedExpect
  }

  test("clusters: long path needs several contraction rounds and still converges") {
    // path 0-1-2-...-9: min label must travel 9 hops (distributed path)
    val edges = (0L until 9L).map(i => (i, i + 1))
    val got = clustersOf(10, edges, driverMaxEdges = -1)
    got.values.toSet shouldBe Set(0L)
  }

  test("clusters: adversarial 200-node chain (diameter >> maxRounds) converges in O(log n)") {
    // Diameter 199 with the default maxRounds = 20: naive neighbor-min
    // label propagation needs one round per hop and would throw; the
    // alternating large/small-star contraction roughly halves distances
    // per round and lands well inside the budget.
    val edges = (0L until 199L).map(i => (i, i + 1))
    val got = clustersOf(200, edges, driverMaxEdges = -1)
    got.size shouldBe 200
    got.values.toSet shouldBe Set(0L)
  }

  test("clusters: non-convergence within maxRounds throws loudly") {
    val docs = spark.range(5).select($"id".as("doc_id"))
    val p = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Dedup.clusters(docs, p, maxRounds = 2, driverMaxEdges = -1)
    }
    e.getMessage should include("converge")
  }

  test("ivf: every query returns k ranked neighbors with descending scores") {
    val emb = KvTable.table(spark, sfDir, "embeddings")
    val got = Similarity.ivfTopK(emb, v => v % 50 === 0, k = 5)
      .orderBy($"q", $"rank").collect()
    val qs = got.map(_.getLong(0)).distinct
    qs.length should be > 5
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      rows.map(_.getLong(2)).toSeq shouldBe (1L to rows.length)
      val scores = rows.sortBy(_.getLong(2)).map(_.getLong(3))
      scores.toSeq shouldBe scores.sorted(Ordering[Long].reverse)
    }
  }

  test("ivf: recall against brute force is substantial (cells actually probe)") {
    val emb = KvTable.table(spark, sfDir, "embeddings")
    val brute = Similarity.bruteTopK(emb, v => v % 50 === 0, k = 5)
      .select($"q", $"nb").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, v => v % 50 === 0, k = 5)
      .select($"q", $"nb").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    withClue(s"recall@5 = $recall") { recall should be >= 0.3 }
  }

  test("ivf incremental append equals a full rebuild; drifted batches are refused") {
    val emb = KvTable.table(spark, sfDir, "embeddings")
    val base = s"${sys.props("java.io.tmpdir")}/graft_test/ivf_incr_spec"
    graft.sinks.Sinks.deleteRecursive(spark, base)
    Similarity.persistIvfIndex(emb.filter($"vec_id" % 10 =!= 9), base)
    val (corpusFit, batchFit) =
      Similarity.appendIvfIndex(spark, base, emb.filter($"vec_id" % 10 === 9))
    // same-distribution batch fits the frozen quantizer about as well
    batchFit should be >= corpusFit - 0.10
    // the appended layout answers queries exactly like a full rebuild
    val full = s"${sys.props("java.io.tmpdir")}/graft_test/ivf_full_spec"
    graft.sinks.Sinks.deleteRecursive(spark, full)
    Similarity.persistIvfIndex(emb, full)
    val incr = Similarity.ivfTopKIndexed(spark, base, v => v % 50 === 0)
      .orderBy($"q", $"rank").collect().toSeq
    val rebuilt = Similarity.ivfTopKIndexed(spark, full, v => v % 50 === 0)
      .orderBy($"q", $"rank").collect().toSeq
    incr shouldBe rebuilt
    // a genuinely drifted batch: vectors projected into the orthogonal
    // complement of the centroid span score ~0 against EVERY centroid
    // (the corpus fit is ~0.26), which trips the gate instead of appending
    def dotd(a: Array[Double], b: Array[Double]): Double =
      a.iterator.zip(b.iterator).map(p => p._1 * p._2).sum
    val basis = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    for (c <- graft.ext.IvfCentroids.Cents) {
      val v = c.clone()
      for (b <- basis) {
        val d = dotd(v, b)
        for (i <- v.indices) v(i) -= d * b(i)
      }
      val n = math.sqrt(dotd(v, v))
      if (n > 1e-9) basis += v.map(_ / n)
    }
    val drifted = (0 until 50).map { j =>
      val v = Array.tabulate(64)(d =>
        (((j * 64 + d) * 2654435761L) % 1000).toDouble / 500.0 - 1.0)
      for (b <- basis) {
        val d = dotd(v, b)
        for (i <- v.indices) v(i) -= d * b(i)
      }
      (1000000L + j, v.map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Similarity.appendIvfIndex(spark, base, drifted))
    e.getMessage should include("centroid drift")
  }

  test("embedding LSH pairs are a subset of brute pairs with identical scores") {
    val emb = KvTable.table(spark, sfDir, "embeddings")
    val brute = Queries.dedupEmbedPairs(spark, sfDir)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val lsh = Dedup.embeddingLshPairs(emb)
      .as[(Long, Long, Long)].collect()
    lsh.length should be > 0
    lsh.foreach { case (a, b, cos) =>
      withClue(s"pair ($a,$b)") { brute.get((a, b)) shouldBe Some(cos) }
    }
  }

  test("topterms: document frequency counts distinct docs, ties rank lexicographically") {
    val docs = Seq(
      (0L, "b a", "en"), (1L, "a b", "en"), (2L, "c c c", "en"), (3L, "x", "de"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.topTerms(docs, k = 2)
      .select($"lang", $"term", $"df", $"rk")
      .orderBy($"lang", $"rk").collect().map(_.toSeq)
    // en: a(df2) and b(df2) tie → lexicographic; c has df1 (multiplicity in
    // one doc does not inflate document frequency)
    got shouldBe Seq(
      Seq("de", "x", 1L, 1L),
      Seq("en", "a", 2L, 1L), Seq("en", "b", 2L, 2L))
  }
}
