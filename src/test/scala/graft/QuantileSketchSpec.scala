package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.QuantileSketchAgg

/** Mergeable quantile sketch: exactness below k, merge independence, rank
  * error past k.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: DataFrame, probes: Seq[Double], k: Int): Seq[Double] =
    df.agg(QuantileSketchAgg.quantileSketch(col("v"), probes, k).as("q"))
      .as[Seq[Double]].head()

  test("below k the interpolation equals percentile() exactly") {
    // scrambled-but-deterministic values, incl duplicates
    val df = spark.range(5000).select(((col("id") * 7919) % 1000).as("v"))
    val got = sketch(df, Seq(0.0, 0.25, 0.5, 0.9, 1.0), k = 8192)
    val want = df.select(percentile(col("v"),
        typedlit(Seq(0.0, 0.25, 0.5, 0.9, 1.0))).as("p"))
      .as[Seq[Double]].head()
    got shouldBe want
  }

  test("merge is partitioning-independent below k") {
    val base = spark.range(4000).select(((col("id") * 104729) % 977).as("v"))
    val a = sketch(base.repartition(1), Seq(0.5, 0.9), k = 8192)
    val b = sketch(base.repartition(17), Seq(0.5, 0.9), k = 8192)
    a shouldBe b
  }

  test("past k the median of uniform data lands within a few percent") {
    val n = 100000L
    val df = spark.range(n).select(((col("id") * 48271) % n).as("v"))
    val Seq(p50) = sketch(df.repartition(8), Seq(0.5), k = 256)
    math.abs(p50 - n / 2.0) / n should be < 0.05
  }

  test("total weight is preserved exactly through compactions") {
    // p=0 and p=1 always return the true min/max held at SOME level; with
    // heavy compaction the extremes must survive (weight conservation means
    // positions 0 and n-1 stay addressable)
    val df = spark.range(50000).select(col("id").as("v")).repartition(4)
    val Seq(lo, hi) = sketch(df, Seq(0.0, 1.0), k = 64)
    lo should be >= 0.0
    hi should be <= 49999.0
    hi - lo should be > 40000.0 // extremes stay near the true range
  }

  test("null values are skipped; all-null input evaluates to null") {
    val df = Seq[Option[Long]](Some(1L), None, Some(3L)).toDF("v")
    sketch(df, Seq(0.5), k = 64) shouldBe Seq(2.0)
    val nulls = Seq[Option[Long]](None, None).toDF("v")
    nulls.agg(QuantileSketchAgg.quantileSketch(col("v"), Seq(0.5), 64).as("q"))
      .select(col("q").isNull).as[Boolean].head() shouldBe true
  }
}
