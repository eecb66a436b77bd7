package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewTools

/** Relational surface the reference lacks (SURVEY §2.4-2.6): broadcast
  * enrich join, window top-k, salted skew aggregation.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase agg == plain groupBy (algebraic composition)") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("b", 10L, 4L))
      .toDF("k0", "v", "id")
    val salted = SkewTools.saltedSumCount(df, col("k0"), col("v"), col("id"), 8)
      .orderBy("k").as[(String, Long, Long)].collect()
    salted shouldBe Array(("a", 3L, 6L), ("b", 1L, 10L))
  }

  test("salted agg spreads a hot key over `buckets` pre-aggregation groups") {
    val hot = spark.range(1000).select(lit("hot").as("k0"), col("id").as("v"), col("id"))
    val phase1Groups = hot
      .groupBy(col("k0"), pmod(col("id"), lit(8)).as("salt"))
      .agg(count(lit(1))).count()
    phase1Groups shouldBe 8 // one partial per salt bucket, not one total
    val out = SkewTools.saltedSumCount(hot, col("k0"), col("v"), col("id"), 8)
      .as[(String, Long, Long)].collect()
    out shouldBe Array(("hot", 1000L, 999L * 1000 / 2))
  }

  test("enrich join broadcasts the dim side") {
    val plan = Queries.all("rel_enrich_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("window top-k: ranks contiguous, bounded, ordered by price desc") {
    val out = Queries.all("rel_topk_orders")(spark, sfDir)
    val byCust = out.as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    byCust.values.foreach { rows =>
      rows.map(_._3).sorted.toSeq shouldBe (1L to rows.length)
      rows.sortBy(_._3).map(_._4).toSeq shouldBe
        rows.sortBy(_._3).map(_._4).toSeq.sorted.reverse
    }
  }
}
