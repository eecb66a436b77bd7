package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SpaceSavingAgg

/** SpaceSaving heavy hitters: exactness below capacity, merge independence,
  * and the paper's guarantees past capacity.
  */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def top(df: DataFrame, capacity: Int, k: Int): Seq[(String, Long)] =
    df.agg(SpaceSavingAgg.heavyHitters(col("t"), capacity, k).as("top"))
      .select(explode(col("top")))
      .select("col.term", "col.cnt").as[(String, Long)].collect().toSeq

  /** id-skewed stream: term "t<i>" appears (i+1)² times for i in [0, n). */
  private def skewed(n: Int): DataFrame =
    spark.range(n).select(col("id"))
      .withColumn("k", explode(sequence(lit(1), ((col("id") + 1) * (col("id") + 1)).cast("int"))))
      .select(concat(lit("t"), col("id")).as("t"))

  test("below capacity counts are EXACT and ordered (cnt DESC, term ASC)") {
    val out = top(skewed(20), capacity = 64, k = 5)
    out shouldBe Seq("t19" -> 400L, "t18" -> 361L, "t17" -> 324L,
      "t16" -> 289L, "t15" -> 256L)
    // tie-break: equal counts order by term ascending
    val ties = Seq("b", "a", "c", "a", "b", "c").toDF("t")
    top(ties, capacity = 64, k = 3) shouldBe Seq("a" -> 2L, "b" -> 2L, "c" -> 2L)
  }

  test("merge is partitioning-independent while below capacity") {
    val base = skewed(30)
    val a = top(base.repartition(1), capacity = 256, k = 10)
    val b = top(base.repartition(13), capacity = 256, k = 10)
    val c = top(base.repartition(32, col("t")), capacity = 256, k = 10)
    a shouldBe b
    b shouldBe c
  }

  test("past capacity every true heavy hitter survives and counts overestimate") {
    // 2000 distinct terms through a 64-counter sketch, one partition so the
    // stream order is deterministic: heavy terms (freq > N/capacity) must
    // be present with cnt >= true count (SpaceSaving never undercounts).
    val light = spark.range(2000).select(concat(lit("x"), col("id")).as("t"))
    val heavy = spark.range(200).select(lit("HH").as("t"))
      .union(spark.range(150).select(lit("H2").as("t")))
    val out = top(light.union(heavy).coalesce(1), capacity = 64, k = 2)
    out.map(_._1) shouldBe Seq("HH", "H2")
    out.find(_._1 == "HH").get._2 should be >= 200L
    out.find(_._1 == "H2").get._2 should be >= 150L
  }

  test("multi-partition merge past capacity recovers every planted heavy hitter") {
    // 500k tokens over a ~100k-term vocabulary in 16 partitions, 20 planted
    // hitters at ~2.5k hits each vs a tail of ~5/term: the summed+truncated
    // mergeable-summaries merge must keep all 20 with counts >= truth
    // (counter-wise eviction-inheritance would let the tail ratchet).
    val toks = spark.range(500000L).selectExpr(
        "CASE WHEN id % 10 = 0 THEN concat('hot', CAST((id DIV 10) % 20 AS STRING)) " +
          "ELSE concat('w', CAST(abs(xxhash64(id)) % 100000 AS STRING)) END AS t")
      .repartition(16)
    val out = top(toks, capacity = 1024, k = 20)
    out.count(_._1.startsWith("hot")) shouldBe 20
    all(out.filter(_._1.startsWith("hot")).map(_._2)) should be >= 2400L
  }

  test("null terms are skipped; empty input yields an empty top list") {
    val df = Seq[Option[String]](Some("a"), None, Some("a")).toDF("t")
    top(df, capacity = 64, k = 3) shouldBe Seq("a" -> 2L)
    top(spark.range(0).select(lit("z").as("t")), capacity = 64, k = 3) shouldBe Seq()
  }
}
