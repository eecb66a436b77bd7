package graft

import org.apache.spark.sql.functions._

import graft.ext.Sampling
import graft.functions.PolyHash

/** Deterministic sampling / corpus mixing (SURVEY §7.6 extension): the
  * contract under test is REPRODUCIBILITY (pure hash draws — stable under
  * repartitioning and re-runs) plus the exact integer threshold semantics
  * the oracles replay.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("bernoulli: deterministic, repartition-invariant, row-auditable") {
    val a = Sampling.bernoulli(docs, "doc_id", 300).select("doc_id")
      .as[Long].collect().sorted
    val b = Sampling.bernoulli(docs.repartition(7), "doc_id", 300).select("doc_id")
      .as[Long].collect().sorted
    b shouldBe a // sample is a function of the data, not the partitioning
    a.length should be > 0
    a.length should be < docs.count().toInt
    // every decision replays from the row alone (hash + quadratic scrambler)
    a.foreach { id =>
      val h = PolyHash.of(s"bern|$id")
      val draw = (h * h % PolyHash.Mod * 48271L + h) % PolyHash.Mod
      draw * 1000 should be < 300L * PolyHash.Mod
    }
    // rate 1000 keeps everything; rate 0 keeps nothing
    Sampling.bernoulli(docs, "doc_id", 1000).count() shouldBe docs.count()
    Sampling.bernoulli(docs, "doc_id", 0).count() shouldBe 0L
  }

  test("bernoulli: distinct salts draw independent samples off the same keys") {
    val a = Sampling.bernoulli(docs, "doc_id", 300, salt = "s1")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.bernoulli(docs, "doc_id", 300, salt = "s2")
      .select("doc_id").as[Long].collect().toSet
    a should not be b
  }

  test("stratifiedCap: at most cap per stratum, ranks a 1..n prefix") {
    val out = Sampling.stratifiedCap(docs, "source", "doc_id", cap = 3)
    val perStratum = out.groupBy("source").agg(
        count(lit(1)).as("n"), max("rk").as("maxRk"))
      .collect()
    perStratum.length should be > 1
    perStratum.foreach { r =>
      r.getAs[Long]("n") should be <= 3L
      r.getAs[Long]("maxRk") shouldBe r.getAs[Long]("n") // contiguous prefix
    }
    // a smaller cap is a strict prefix of a larger one (no resampling)
    val small = Sampling.stratifiedCap(docs, "source", "doc_id", cap = 2)
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val big = out.filter(col("rk") <= 2)
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    small shouldBe big
  }

  test("weightedMix: thresholds follow weights, saturate at keep-all, hit budget") {
    val sources = docs.select("source").distinct().as[String].collect().sorted
    val w = sources.map(_ -> 100L).toMap
    // a huge budget saturates every source at rate 1 -> the full corpus
    Sampling.weightedMix(docs, "source", "n_chars", "doc_id", w,
      budget = 1000000000L).count() shouldBe docs.count()
    // equal weights + a half-ish budget: expected cost tracks the budget
    val total = docs.agg(sum("n_chars")).as[Long].head()
    val budget = total / 2
    val got = Sampling.weightedMix(docs, "source", "n_chars", "doc_id", w, budget)
      .agg(sum("n_chars")).as[Long].head()
    got.toDouble shouldBe budget.toDouble +- budget * 0.25
    // doubling one source's weight never shrinks its sample
    val w2 = w.updated(sources.head, 200L)
    val mixOf = (ws: Map[String, Long]) =>
      Sampling.weightedMix(docs, "source", "n_chars", "doc_id", ws, budget)
        .filter(col("source") === sources.head).count()
    mixOf(w2) should be >= mixOf(w)
  }

  test("weightedMix fails loudly on a source missing from the weights map") {
    val sources = docs.select("source").distinct().as[String].collect().sorted
    val missingOne = sources.tail.map(_ -> 100L).toMap // drop the first source
    val ex = intercept[Exception] {
      Sampling.weightedMix(docs, "source", "n_chars", "doc_id", missingOne,
        budget = 10000L).count()
    }
    ex.getMessage should include("no weight for source")
  }

  test("datasetSplit: exhaustive, leakage-safe, and stable under corpus growth") {
    val full = spark.range(10000).selectExpr("id AS doc_id")
    val s1 = Sampling.datasetSplit(full, "doc_id", 800, 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // every row assigned, fractions near 80/10/10
    s1.size shouldBe 10000
    val train = s1.values.count(_ == "train")
    val v = s1.values.count(_ == "val")
    train.toDouble / 10000 shouldBe 0.8 +- 0.03
    v.toDouble / 10000 shouldBe 0.1 +- 0.02
    // growth stability: assignments over a subset are IDENTICAL — adding
    // docs later never moves an existing one across splits
    val sub = Sampling.datasetSplit(
        spark.range(5000).selectExpr("id AS doc_id"), "doc_id", 800, 100)
      .select("doc_id", "split").as[(Long, String)].collect()
    sub.foreach { case (id, sp) => s1(id) shouldBe sp }
  }

  test("weightedMix plan: corpus side is never shuffled (broadcast thresholds)") {
    val sources = docs.select("source").distinct().as[String].collect().sorted
    val mix = Sampling.weightedMix(docs, "source", "n_chars", "doc_id",
      sources.map(_ -> 100L).toMap, budget = 10000L)
    mix.collect()
    val plan = mix.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("epochShuffle: a permutation, epoch-independent, reproducible, shard-ranked 1..n") {
    val n = docs.count()
    val e3 = Sampling.epochShuffle(docs, "doc_id", epoch = 3, nShards = 8)
      .select("shard", "shard_pos", "doc_id").cache()
    // a PERMUTATION: every doc appears exactly once
    e3.count() shouldBe n
    e3.select("doc_id").distinct().count() shouldBe n
    // shard positions are a dense 1..size rank per shard
    val bad = e3.groupBy("shard")
      .agg(count(lit(1)).as("sz"), max("shard_pos").as("mx"), min("shard_pos").as("mn"))
      .filter(col("mx") =!= col("sz") || col("mn") =!= 1).count()
    bad shouldBe 0
    // reproducible: a re-run (fresh plan, different partitioning) is identical
    val again = Sampling.epochShuffle(docs.repartition(7), "doc_id", 3, nShards = 8)
      .select("shard", "shard_pos", "doc_id")
    e3.except(again).count() shouldBe 0
    // distinct epochs permute DIFFERENTLY (independent draws off same keys)
    val e4 = Sampling.epochShuffle(docs, "doc_id", epoch = 4, nShards = 8)
      .select("shard", "shard_pos", "doc_id")
    e3.except(e4).count() should be > 0L
    // scale shape: the only exchange is the shard hash partition (plus
    // AQE's reads) — never a global single-partition sort
    val plan = e3.queryExecution.executedPlan.toString
    plan should not include "SinglePartition"
  }
}
