package graft

import org.apache.spark.sql.functions._

import graft.ops.Triangles

/** Degree-oriented triangle counting on hand-built graphs. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNodeCounts(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap

  test("a single triangle counts once for each of its three nodes") {
    counts(Seq((1L, 2L), (1L, 3L), (2L, 3L))) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("K4 has four triangles, three through each node") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    counts(k4) shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("triangle-free graphs produce no rows; shared edges double-count correctly") {
    // a path and a star are triangle-free
    counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))) shouldBe Map.empty
    counts(Seq((1L, 2L), (1L, 3L), (1L, 4L))) shouldBe Map.empty
    // two triangles glued on edge (1,2): nodes 1,2 sit in both
    val glued = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    counts(glued) shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L)
  }

  test("a skew hub graph matches the brute-force count (orientation correctness)") {
    // hub 0 connected to 1..40, plus ring edges i—(i+1) among the leaves:
    // every consecutive leaf pair closes a triangle through the hub
    val hub = (1L to 40L).map(i => (0L, i))
    val ring = (1L until 40L).map(i => (i, i + 1))
    val got = counts(hub ++ ring)
    got(0L) shouldBe 39L
    got(1L) shouldBe 1L
    got(20L) shouldBe 2L // two ring neighbors -> two triangles
    got.values.sum shouldBe 39L * 3
  }
}
