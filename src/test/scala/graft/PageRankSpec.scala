package graft

import graft.ops.PageRank

/** Fixed-iteration integer PageRank (SURVEY §7.6 relational extension). */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("symmetric 2-cycle is stationary at scale/2") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = PageRank.run(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    r shouldBe Map(1L -> 500000000000L, 2L -> 500000000000L)
  }

  test("star graph: hub accumulates leaf mass, one superstep, exact integers") {
    // 1 <-> 2, 1 <-> 3; N=3, r0 = 333333333333 each, deg(1)=2, deg(2)=deg(3)=1
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = PageRank.run(edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    // base = 15e12 // 300 = 50000000000
    // hub: 5e10 + 85 * (333333333333 + 333333333333) // 100 = 616666666666
    // leaf: 5e10 + 85 * (333333333333 // 2) // 100       = 191666666666
    r shouldBe Map(
      1L -> 616666666666L, 2L -> 191666666666L, 3L -> 191666666666L)
  }

  test("parallel edges do not double-weight (dedup inside)") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = PageRank.run(edges, iters = 3).as[(Long, Long)].collect().toMap
    r shouldBe Map(1L -> 500000000000L, 2L -> 500000000000L)
  }
}
