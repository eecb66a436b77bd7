package graft.sources

import org.apache.spark.sql.functions._

import graft.kv.Utf8Order

/** UTF-8 byte order vs JVM String (UTF-16) order — the ADVICE r18 hazard:
  * every stat, prune, and range-relaxation surface must use the SAME
  * ordering parquet Binary stats and Spark's UTF8String comparisons use.
  * The divergence pair: a supplementary-plane code point (U+10000, UTF-16
  * surrogates 0xD800.., UTF-8 0xF0..) sorts BELOW U+E000 in UTF-16 but
  * ABOVE it in UTF-8 bytes. These tests pin the ordering object itself and
  * the end-to-end read paths (prune, min/max pushdown, big-In relaxation)
  * over keys that straddle the divergence.
  */
class Utf8OrderSpec extends graft.SparkSpec {
  import spark.implicits._

  // "k" + U+10000 and "k" + U+E000: JVM says supp < high, bytes say supp > high
  private val supp = "k𐀀"
  private val high = "k"

  test("Utf8Order diverges from JVM order exactly on the surrogate/private-use pair") {
    assert(supp < high, "JVM UTF-16 order: surrogate below U+E000")
    assert(Utf8Order.compare(supp, high) > 0, "UTF-8 byte order: 0xF0 above 0xEE")
    Utf8Order.min(supp, high) shouldBe high
    Utf8Order.max(supp, high) shouldBe supp
    // agreement on ASCII (the overwhelmingly common case)
    Utf8Order.compare("a", "b") should be < 0
    Utf8Order.compare("ab", "a") should be > 0
    Utf8Order.compare("x", "x") shouldBe 0
  }

  private def writeTable(name: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/$name"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    val ascii = (0 until 40).map(i => (f"a$i%03d", "f", "q", s"v$i", 10L))
    val special = Seq((supp, "f", "q", "vs", 10L), (high, "f", "q", "vh", 10L))
    // two commits → two stat-carrying segments, so file pruning has a
    // real decision to make; the special keys ride the second commit
    ascii.toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .write.format("graft-kv").option("regions", 2).mode("append").save(d)
    special.toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .write.format("graft-kv").option("regions", 1).mode("append").save(d)
    d
  }

  test("sink stats, range prune, and point lookups are byte-order-correct on divergent keys") {
    val d = writeTable("utf8_order_table")
    val df = spark.read.format("graft-kv").load(d)

    // manifest key bounds are byte-order min/max (supp is the true max)
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stats = KvLog.liveFileStats(fs, new org.apache.hadoop.fs.Path(d))
    val specialStat = stats.values.find(_.maxKey.contains(supp))
    assert(specialStat.isDefined,
      "the special segment's manifest maxKey must be the byte-order max (supp)")
    specialStat.get.minKey shouldBe Some(high)

    // Spark evaluates >= in byte order: both special keys are above "b"
    val aboveB = df.filter(col("rowKey") >= "b").select("rowKey")
      .as[String].collect().sorted(Utf8Order)
    aboveB.toSeq shouldBe Seq(high, supp)

    // range that byte-order covers ONLY supp (UTF-16 order would claim
    // the interval [high-exclusive, ...] excludes it and prune the file)
    val aboveHigh = df.filter(col("rowKey") > high).select("rowKey")
      .as[String].collect()
    aboveHigh.toSeq shouldBe Seq(supp)

    // point lookups on both divergent keys survive interval/bloom pruning
    df.filter(col("rowKey") === supp).count() shouldBe 1
    df.filter(col("rowKey") === high).count() shouldBe 1

    // pushed min/max aggregate serves the byte-order answer Spark expects
    val truth = spark.read.parquet(
      KvLog.liveFiles(fs, new org.apache.hadoop.fs.Path(d))
        .map(f => s"$d/$f"): _*)
      .agg(min("rowKey"), max("rowKey")).collect()(0)
    val served = df.agg(min("rowKey").as("mn"), max("rowKey").as("mx")).collect()(0)
    served.getString(0) shouldBe truth.getString(0)
    served.getString(1) shouldBe supp
  }

  test("big-In range relaxation keeps divergent set members (superset under byte order)") {
    val d = writeTable("utf8_order_bigin")
    val df = spark.read.format("graft-kv").load(d)
    // > InRecordFilterMax (256) values forces the [min, max] relaxation;
    // the UTF-16 min/max of this set is an EMPTY byte range that would
    // drop both matches at the record filter
    val bigSet = (0 until 300).map(i => f"zz$i%03d") ++ Seq(supp, high)
    val got = df.filter(col("rowKey").isin(bigSet: _*)).select("rowKey")
      .as[String].collect().sorted(Utf8Order)
    got.toSeq shouldBe Seq(high, supp)
  }

  test("regionIndex assigns divergent keys to the regions that physically hold them") {
    // bounds as byte-order-sorted minKeys: region 1 starts at high
    val bounds = Array(high)
    KvRegionLayout.regionIndex("a000", bounds) shouldBe 0
    KvRegionLayout.regionIndex(high, bounds) shouldBe 1
    // UTF-16 order would put supp in region 0 — bytes put it in region 1
    KvRegionLayout.regionIndex(supp, bounds) shouldBe 1
  }
}
