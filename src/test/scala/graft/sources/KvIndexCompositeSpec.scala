package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COMPOSITE (multi-column) indexes ([[KvIndex.lookupComposite]]): the
  * invariant under test is the composite analog of KvIndexSpec's — a
  * lookup equals the inner-join-of-components full-scan answer filtered
  * by every component range, regardless of staleness, DML since, or
  * which path (fresh index-only vs stale verified) freshness picks.
  */
class KvIndexCompositeSpec extends graft.SparkSpec {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_comp_$name"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    d
  }

  /** n keys; every key has an `a` cell (value 3i); even keys also a `b`
    * cell (value 5i) — odd keys lack component b and must never appear.
    */
  private def cells(n: Int, tsBase: Long = 0L): DataFrame = {
    val a = spark.range(n.toLong).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'a' AS qualifier",
      "encode(CAST(id * 3 AS STRING), 'UTF-8') AS value",
      s"id + ${tsBase}L AS ts")
    val b = spark.range(n.toLong).filter("id % 2 = 0").selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'b' AS qualifier",
      "encode(CAST(id * 5 AS STRING), 'UTF-8') AS value",
      s"id + ${tsBase}L AS ts")
    a.unionByName(b)
  }

  /** Ground truth: inner join of the two LWW views, both ranges. */
  private def oracle(dir: String, aLo: Long, aHi: Long, bLo: Long,
      bHi: Long): Set[(String, String, String)] = {
    def lww(q: String, out: String) =
      spark.read.format("graft-kv").load(dir)
        .filter(col("family") === "f" && col("qualifier") === q)
        .groupBy("rowKey")
        .agg(decode(graft.functions.MaxByTsAgg.maxByTs(
          col("value"), col("ts")), "UTF-8").as(out))
    lww("a", "va").join(lww("b", "vb"), Seq("rowKey"))
      .filter(col("va").cast("long") >= aLo && col("va").cast("long") < aHi &&
        col("vb").cast("long") >= bLo && col("vb").cast("long") < bHi)
      .as[(String, String, String)].collect().toSet
  }

  private def looked(dir: String, aLo: Long, aHi: Long, bLo: Long,
      bHi: Long): Set[(String, String, String)] =
    KvIndex.lookupComposite(spark, dir, "by_ab",
      Seq((aLo.toString, aHi.toString), (bLo.toString, bHi.toString)))
      .as[(String, String, String)].collect().toSet

  private def create(dir: String): KvIndex.Meta =
    KvIndex.create(spark, dir, "by_ab", "f", "a", pad = 8,
      regions = 2, rest = Seq(("b", 8)))

  test("composite meta round-trips; entries are the component inner join") {
    val dir = freshDir("basic")
    cells(1000).write.format("graft-kv").option("regions", 4)
      .mode("overwrite").save(dir)
    create(dir)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val m = KvIndex.list(fs, new Path(dir)).head
    m.keyQuals shouldBe Seq("a", "b")
    m.pads shouldBe Seq(8, 8)
    m.covered shouldBe true // composite ⇒ covered (exact maintenance)

    // a in [600, 660) → i in [200, 220); b in [0, 10000) → even i < 2000:
    // the 10 even keys of [200, 220)
    val got = looked(dir, 600, 660, 0, 10000)
    got shouldBe oracle(dir, 600, 660, 0, 10000)
    got.size shouldBe 10
    // narrowing the SECOND component narrows the answer: b = 5i < 1030
    // keeps even i < 206 → 3 keys (200, 202, 204)
    looked(dir, 600, 660, 0, 1030) shouldBe oracle(dir, 600, 660, 0, 1030)
    looked(dir, 600, 660, 0, 1030).size shouldBe 3
  }

  test("fresh composite lookup is INDEX-ONLY: one scan, zero base data-file opens") {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.hadoopConfiguration.set("fs.cfs.impl",
      classOf[CountingFileSystem].getName)
    val local = s"${sys.props("java.io.tmpdir")}/graft_test/kv_comp_cfs"
    graft.sinks.Sinks.deleteRecursive(spark, local)
    val dir = s"cfs:$local"
    cells(1000).write.format("graft-kv").option("regions", 4)
      .mode("overwrite").save(dir)
    create(dir)
    val expect = oracle(dir, 600, 660, 0, 10000)
    CountingFileSystem.reset()
    looked(dir, 600, 660, 0, 10000) shouldBe expect
    val opened = CountingFileSystem.openedData.asScala.toSet
    assert(opened.nonEmpty && opened.forall(_.contains("/_index/")),
      s"composite fresh read touched base data files: $opened")
  }

  test("exact through DML: either component's change re-keys; component loss evicts") {
    val dir = freshDir("dml")
    cells(1000).write.format("graft-kv").option("regions", 2)
      .mode("overwrite").save(dir)
    create(dir)

    def upsert(key: String, q: String, v: String, ts: Long): Unit =
      Seq((key, q, v, ts)).toDF("rowKey", "q", "v", "ts")
        .selectExpr("rowKey", "'f' AS family", "q AS qualifier",
          "encode(v, 'UTF-8') AS value", "ts")
        .write.format("graft-kv").option("regions", 1)
        .mode("append").save(dir)

    // key 000300 (a=900, b=1500): move component a OUT of [600,660);
    // key 000202 (a=606, b=1010): move component b OUT of [0,1030);
    // key 000201 (a=603, no b): GAINS component b → enters the join;
    // key 000204: whole-row delete;
    // key 000200: loses component b (column delete) → leaves the join.
    upsert("000300", "a", "99999", 5000L)
    upsert("000202", "b", "88888", 5001L)
    upsert("000201", "b", "7", 5002L)
    KvDelete.deleteRows(spark, dir,
      Seq("000204").toDF("rowKey"))
    KvDelete.deleteColumns(spark, dir,
      Seq(("000200", "f", "b")).toDF("rowKey", "family", "qualifier"))

    // STALE lookup (nothing refreshed yet): verification must already
    // agree with the full-scan truth.
    looked(dir, 600, 660, 0, 1030) shouldBe oracle(dir, 600, 660, 0, 1030)
    looked(dir, 600, 660, 0, 1030).map(_._1) shouldBe Set("000201")

    // Refresh is EXACT: scrutiny reports zero missing AND zero stale.
    val r = KvIndex.refresh(spark, dir, "by_ab")
    assert(r.isInstanceOf[KvIndex.Refreshed], s"expected Refreshed, got $r")
    val s = KvIndex.scrutiny(spark, dir, "by_ab")
    s.missing shouldBe 0L
    s.stale shouldBe 0L
    looked(dir, 600, 660, 0, 1030) shouldBe oracle(dir, 600, 660, 0, 1030)
  }

  test("per-component width and digit guards: values and bounds both refuse") {
    val dir = freshDir("guards")
    cells(100).write.format("graft-kv").option("regions", 1)
      .mode("overwrite").save(dir)
    create(dir)
    // bound wider than the SECOND component's pad
    val e1 = intercept[IllegalArgumentException] {
      KvIndex.lookupComposite(spark, dir, "by_ab",
        Seq(("0", "100"), ("0", "123456789")))
    }
    e1.getMessage should include("exceeds the index's decimal width")
    // non-digit bound on the second component
    val e2 = intercept[IllegalArgumentException] {
      KvIndex.lookupComposite(spark, dir, "by_ab",
        Seq(("0", "100"), ("0", "x")))
    }
    e2.getMessage should include("non-negative decimal")
    // wrong bound count
    val e3 = intercept[IllegalArgumentException] {
      KvIndex.lookupComposite(spark, dir, "by_ab", Seq(("0", "100")))
    }
    e3.getMessage should include("2 key components")
    // a non-digit VALUE landing in the second component fails the refresh
    // (8 chars — inside the width, so the DIGIT guard is what fires)
    Seq(("000001", "f", "b", "nandigit", 9000L))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .selectExpr("rowKey", "family", "qualifier",
        "encode(v, 'UTF-8') AS value", "ts")
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir)
    val e4 = intercept[Exception] {
      KvIndex.refresh(spark, dir, "by_ab")
    }
    e4.getMessage should include("non-negative decimal")
    // single-qualifier APIs refuse the composite index loudly
    val e5 = intercept[IllegalArgumentException] {
      KvIndex.lookup(spark, dir, "by_ab", "0", "100")
    }
    e5.getMessage should include("composite")
    // a NUL inside a bound is refused: NUL is the key separator, and a
    // NUL-carrying bound compares differently against raw values than
    // against the encoded keys — the index-only path would silently
    // diverge from the verified path at range edges
    val e6 = intercept[IllegalArgumentException] {
      KvIndex.lookupComposite(spark, dir, "by_ab",
        Seq(("0", "100"), ("0", "1\u0000" + "9")))
    }
    e6.getMessage should include("NUL")
  }

  test("autoLookupComposite: cost-routes selective ranges to the index, wide ones to the scan") {
    val dir = freshDir("auto")
    cells(1000).write.format("graft-kv").option("regions", 4)
      .mode("overwrite").save(dir)
    create(dir)
    def auto(aLo: Long, aHi: Long, bLo: Long, bHi: Long) =
      KvIndex.autoLookupComposite(spark, dir, "f",
        Seq(("a", aLo.toString, aHi.toString), ("b", bLo.toString, bHi.toString)))
        .as[(String, String, String)].collect().toSet
    // selective and unselective both equal the ground truth
    auto(600, 660, 0, 10000) shouldBe oracle(dir, 600, 660, 0, 10000)
    auto(0, 99999, 0, 99999) shouldBe oracle(dir, 0, 99999, 0, 99999)
    auto(0, 99999, 0, 99999).size shouldBe 500 // every even key
    // predicate order doesn't matter: reordered quals map onto the index
    KvIndex.autoLookupComposite(spark, dir, "f",
      Seq(("b", "0", "10000"), ("a", "600", "660")))
      .as[(String, String, String)].collect().toSet shouldBe
      oracle(dir, 600, 660, 0, 10000)
    // no matching index (different family): the scan fallback answers,
    // with the caller's declared pads
    KvIndex.autoLookupComposite(spark, dir, "g",
      Seq(("a", "600", "660"), ("b", "0", "10000")),
      pads = Seq(8, 8)).count() shouldBe 0L
    // a declared pad contradicting the index refuses loudly
    val e = intercept[IllegalArgumentException] {
      KvIndex.autoLookupComposite(spark, dir, "f",
        Seq(("a", "600", "660"), ("b", "0", "10000")), pads = Seq(4, 8))
    }
    e.getMessage should include("contradicts index")
  }

  test("resalt forces a REBUILD; the rebuilt composite index answers exactly") {
    val dir = freshDir("resalt")
    cells(800).write.format("graft-kv").option("regions", 2)
      .mode("overwrite").save(dir)
    create(dir)
    // one pre-resalt append puts the salt declaration STRICTLY INSIDE the
    // to-be-refreshed span — the unservable-span condition (a declaration
    // at exactly since+1 would pass as a clean boundary)
    cells(5, tsBase = 50000L).write.format("graft-kv")
      .option("regions", 1).mode("append").save(dir)
    val rr = KvResalt.resalt(spark, dir, Some(4))
    assert(rr.isInstanceOf[KvResalt.Resalted], s"resalt: $rr")
    // post-resalt DML so the rebuild has a tail to absorb
    KvSalt.saltedWrite(cells(10, tsBase = 100000L), dir, n = 4,
      regions = 1, mode = "append")
    val r = KvIndex.refresh(spark, dir, "by_ab")
    assert(r.isInstanceOf[KvIndex.Rebuilt], s"expected Rebuilt, got $r")
    looked(dir, 600, 660, 0, 10000) shouldBe oracle(dir, 600, 660, 0, 10000)
    // and the rebuilt index is exact
    val s = KvIndex.scrutiny(spark, dir, "by_ab")
    s.missing shouldBe 0L
    s.stale shouldBe 0L
  }
}
