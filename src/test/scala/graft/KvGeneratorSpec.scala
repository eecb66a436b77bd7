package graft

import org.apache.spark.sql.functions._
import graft.kv.{KvGenerator, RangeLayout}

/** G1/G2 generator semantics (PopulateTable.java:102-138) + D1 layout. */
class KvGeneratorSpec extends SparkSpec {
  import spark.implicits._

  test("generator is deterministic: same args -> identical cells") {
    val a = KvGenerator.cells(spark, 200, 4, "r").orderBy("ts")
      .select(col("rowKey"), col("qualifier"), decode(col("value"), "UTF-8"), col("ts"))
    val b = KvGenerator.cells(spark, 200, 4, "r").orderBy("ts")
      .select(col("rowKey"), col("qualifier"), decode(col("value"), "UTF-8"), col("ts"))
    a.collect().toSeq shouldBe b.collect().toSeq
  }

  test("10-cell fan-out: count = records * cellsPerRecord; qualifiers C0..C9") {
    val cells = KvGenerator.cells(spark, 100, 4, "r")
    cells.count() shouldBe 1000
    cells.select("qualifier").distinct().as[String].collect().sorted shouldBe
      (0 to 9).map(i => s"C$i")
  }

  test("rowKey shape keyRoot|runID|taskId, keyRoot zero-padded to 5 (F3/F4)") {
    val keys = KvGenerator.cells(spark, 40, 4, "run1")
      .select("rowKey").distinct().as[String].collect()
    all(keys) should fullyMatch regex """\d{5}\|run1\|[0-3]"""
  }

  test("values are counter strings, ts strictly increasing per record order") {
    val first = KvGenerator.cells(spark, 10, 1, "r")
      .orderBy("ts").select(decode(col("value"), "UTF-8").as("v")).as[String].head()
    first shouldBe "counter:0"
  }

  test("duplicate rowKeys occur and merge last-wins through the pivot (§2.11)") {
    // KeySpace is 32768; 40k records on 1 task guarantees keyRoot collisions.
    val cells = KvGenerator.cells(spark, 40000, 1, "r")
    val distinctKeys = cells.select("rowKey").distinct().count()
    distinctKeys should be < 40000L
    val piv = graft.ops.KvPivot.pivot(cells, Seq("C0"))
    piv.count() shouldBe distinctKeys
  }

  test("task parallelism = requested partitions (G2/NMapInputFormat)") {
    KvGenerator.cells(spark, 100, 7, "r").rdd.getNumPartitions shouldBe 7
  }

  test("region split points match CreateTable.java:61-73") {
    RangeLayout.splitPoints(4) shouldBe Seq("08191", "16382", "24573")
    RangeLayout.splitPoints(2) shouldBe Seq("16383")
  }

  test("regionOf assigns keys to the right region, clamped to last region") {
    val df = Seq("00000", "08190", "08191", "32767").toDF("k")
    val regions = df.select(RangeLayout.regionOf(col("k"), 4).as("r"))
      .as[Int].collect().toSeq
    regions shouldBe Seq(0, 0, 1, 3)
  }

  test("layout range-partitions by rowKey and sorts within partitions (O1)") {
    val cells = KvGenerator.cells(spark, 1000, 4, "r")
    val laid = RangeLayout.layout(cells, 4)
    laid.rdd.getNumPartitions shouldBe 4
    // Each partition individually sorted by (rowKey, qualifier):
    val perPart = laid.select("rowKey", "qualifier").rdd
      .mapPartitions { it =>
        val rows = it.map(r => (r.getString(0), r.getString(1))).toVector
        Iterator.single(rows == rows.sorted)
      }.collect()
    all(perPart) shouldBe true
    // Partitions are range-disjoint: max(part i) <= min(part i+1).
    val bounds = laid.select("rowKey").rdd.mapPartitionsWithIndex { (i, it) =>
      val ks = it.map(_.getString(0)).toVector
      if (ks.isEmpty) Iterator.empty
      else Iterator.single((i, ks.min, ks.max))
    }.collect().sortBy(_._1)
    bounds.sliding(2).foreach {
      case Array((_, _, maxPrev), (_, minNext, _)) =>
        assert(maxPrev <= minNext)
      case _ =>
    }
  }
}
