package graft

import org.apache.spark.sql.functions._

import graft.ops.GapFill

/** LOCF gap fill: grid densification, fill semantics, per-series isolation. */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private val observed = Seq(
    ("a", 10L, 100L), ("a", 13L, 130L),
    ("b", 11L, 210L))
    .toDF("k", "h", "v")

  test("densifies to per-key min..max and LOCF-fills the gaps") {
    val out = GapFill.locf(observed, "k", "h", Seq("v"))
      .orderBy("k", "h").as[(String, Long, Long)].collect().toSeq
    out shouldBe Seq(
      ("a", 10L, 100L), ("a", 11L, 100L), ("a", 12L, 100L), ("a", 13L, 130L),
      ("b", 11L, 210L))
  }

  test("non-fill columns stay null on synthetic gap rows") {
    val withN = observed.withColumn("n", lit(7L))
    val gaps = GapFill.locf(withN, "k", "h", Seq("v"))
      .filter(col("n").isNull).select("k", "h").as[(String, Long)].collect().toSet
    gaps shouldBe Set(("a", 11L), ("a", 12L))
  }

  test("a single-bucket series passes through unchanged") {
    val one = Seq(("z", 5L, 50L)).toDF("k", "h", "v")
    GapFill.locf(one, "k", "h", Seq("v")).as[(String, Long, Long)].collect()
      .toSeq shouldBe Seq(("z", 5L, 50L))
  }
}
