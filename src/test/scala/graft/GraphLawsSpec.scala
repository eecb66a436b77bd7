package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.{GapFill, Triangles}

/** Law tests for the round-6 graph/series operators: the distributed
  * implementations against brute-force definitions on randomized inputs.
  */
class GraphLawsSpec extends SparkSpec {
  import spark.implicits._

  /** O(n³) reference triangle count per node. */
  private def bruteCounts(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keys.toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      a <- nodes
      b <- nodes if b > a && adj(a).contains(b)
      c <- nodes if c > b && adj(a).contains(c) && adj(b).contains(c)
    } {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }
    counts.toMap
  }

  test("degree-oriented counts equal brute force on 20 random graphs") {
    val rnd = new Random(42)
    for (trial <- 1 to 20) {
      val n = 6 + rnd.nextInt(20)
      val density = 0.15 + rnd.nextDouble() * 0.5
      val edges = (for {
        u <- 0L until n
        v <- (u + 1) until n if rnd.nextDouble() < density
      } yield (u, v)).toSet
      if (edges.nonEmpty) {
        val got = Triangles.perNodeCounts(edges.toSeq.toDF("u", "v"))
          .as[(Long, Long)].collect().toMap
        withClue(s"trial $trial (n=$n, m=${edges.size}): ") {
          got shouldBe bruteCounts(edges)
        }
      }
    }
  }

  test("triangle counts are invariant to edge-list partitioning") {
    val edges = (for { u <- 0L until 20; v <- (u + 1) until 20 if (u + v) % 3 != 0 }
      yield (u, v)).toDF("u", "v")
    val a = Triangles.perNodeCounts(edges.repartition(1)).as[(Long, Long)].collect().toMap
    val b = Triangles.perNodeCounts(edges.repartition(13)).as[(Long, Long)].collect().toMap
    a shouldBe b
  }

  test("z-order interleave: bit placement, monotonicity per axis, range guard") {
    import graft.functions.ZOrderInterleave
    def z(a: Long, b: Long): Long =
      Seq((a, b)).toDF("a", "b")
        .select(ZOrderInterleave.zOrder(col("a"), col("b"))).as[Long].head()
    z(0L, 0L) shouldBe 0L
    z(1L, 0L) shouldBe 1L // a occupies even bits
    z(0L, 1L) shouldBe 2L // b occupies odd bits
    z(3L, 3L) shouldBe 15L
    // 31-bit maxima fill bits 0..61 — POSITIVE, so signed sort order is
    // curve order (a 32-bit right input would put its top bit in the
    // long's sign bit and order z(0, 2^31) below z(0, 0))
    z(0x7FFFFFFFL, 0x7FFFFFFFL) shouldBe (1L << 62) - 1
    // fixing one axis, the z-value is monotonic in the other — including
    // across the old hazardous boundary
    val zs = (0L to 20L).map(v => z(v, 7L))
    zs shouldBe zs.sorted
    z(0L, 0x7FFFFFFFL) should be > z(0L, 0L)
    intercept[Exception] { z(-1L, 0L) }.getMessage should include("z_order")
    intercept[Exception] { z(0L, 1L << 31) }.getMessage should include("z_order")
  }

  test("gap fill is idempotent: filling an already-dense series is identity") {
    val dense = (1L to 40L).map(h => ("k", h, h * 10)).toDF("k", "h", "v")
    val once = GapFill.locf(dense, "k", "h", Seq("v"))
    val twice = GapFill.locf(once.select("k", "h", "v"), "k", "h", Seq("v"))
    twice.orderBy("h").as[(String, Long, Long)].collect() shouldBe
      dense.orderBy("h").as[(String, Long, Long)].collect()
  }

  test("interleave prefix balance: source share tracks its weight within one slot") {
    // prefix up to key K contains floor(K*w/12)-ish docs of a weight-w
    // source (its r-th doc sits at key r*12/w) — check the proportionality
    // law on the real query output at sf0.001
    val out = Queries.all("pipe_interleave")(spark, sfDir)
      .select(col("source"), col("pos_key"),
        (substring(col("source"), 4, 10).cast("long") % 4 + 1).as("w"))
    // K=60 keeps every expected count (5w <= 20) inside each source's 25
    // docs, and 12 | K·w makes the law exact: doc r of a weight-w source
    // sits at key r*12/w, so the prefix holds exactly K*w/12 of them
    val k = 60L
    val counts = out.filter(col("pos_key") <= k)
      .groupBy(col("source"), col("w")).count()
      .as[(String, Long, Long)].collect()
    counts should not be empty
    counts.foreach { case (src, w, c) =>
      withClue(s"$src (w=$w): ") { c shouldBe k * w / 12 }
    }
  }
}
