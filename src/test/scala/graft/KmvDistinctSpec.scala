package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvDistinctAgg

/** KMV distinct sketch: exactness below k, merge independence, estimator
  * error past k.
  */
class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Long =
    df.agg(KmvDistinctAgg.kmvDistinct(col("v"), k)).as[Long].head()

  test("below k the count is EXACT, duplicates ignored") {
    val df = spark.range(1000).select((col("id") % 300).as("v"))
    sketch(df, k = 4096) shouldBe 300L
    // boundary: exactly k-1 distinct values still exact
    val edge = spark.range(4095).select(col("id").as("v"))
    sketch(edge, k = 4096) shouldBe 4095L
  }

  test("merge is partitioning-independent (bit-identical across layouts)") {
    val base = spark.range(20000).select((col("id") * 7919 % 5000).as("v"))
    val a = sketch(base.repartition(1), k = 1024)
    val b = sketch(base.repartition(13), k = 1024)
    val c = sketch(base.repartition(32, col("v")), k = 1024)
    a shouldBe b
    b shouldBe c
  }

  test("past k the estimate lands within ~5/sqrt(k) of the truth") {
    val n = 50000L
    val df = spark.range(n).select(col("id").as("v"))
    val k = 1024
    val est = sketch(df, k).toDouble
    val rel = math.abs(est - n) / n
    rel should be < (5.0 / math.sqrt(k)) // ~0.156 at k=1024
  }

  test("null inputs are skipped, empty input counts zero") {
    val df = Seq[Option[Long]](Some(1L), None, Some(1L), Some(2L)).toDF("v")
    sketch(df, k = 64) shouldBe 2L
    sketch(spark.range(0).select(col("id").as("v")), k = 64) shouldBe 0L
  }
}
