package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Index-served top-n ([[KvIndex.topNCovered]] + the
  * [[KvIndexRouting]] ORDER-BY-elimination arm): `ORDER BY value
  * [DESC] LIMIT k` over the LWW pivot must serve INDEX-ONLY from a
  * fresh covered index — zero base data-file opens, the cell-level TopN
  * pushed into the index scan — and must refuse (loudly for the
  * explicit API, silently falling back for SQL routing) everywhere the
  * index-only answer cannot be proven: plain indexes (stale high
  * values), stale covered indexes, collation mismatches, non-index tie
  * orders. Also pins the [[KvIndex.rangeIsSelective]] memo's
  * invalidation: a new base commit must re-price the routing decision.
  */
class KvIndexTopNSpec extends graft.SparkSpec {

  import spark.implicits._

  private val base = s"${sys.props("java.io.tmpdir")}/graft_test/kv_topn"

  /** Covered-index table on the counting FS: 500 keys, value = 3·id as a
    * decimal string, then DML (updates + a delete) and one exact
    * refresh, so "fresh covered" is earned through the maintenance
    * lifecycle, not a pristine build.
    */
  private lazy val covTable: String = {
    spark.sparkContext.hadoopConfiguration.set("fs.cfs.impl",
      classOf[CountingFileSystem].getName)
    val local = s"$base/cov"
    graft.sinks.Sinks.deleteRecursive(spark, local)
    val dir = s"cfs:$local"
    spark.range(500).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'v' AS qualifier",
      "encode(CAST(id * 3 AS STRING), 'UTF-8') AS value",
      "id AS ts")
      .write.format("graft-kv").option("regions", 4).mode("overwrite").save(dir)
    KvIndex.create(spark, dir, "by_v", "f", "v", pad = 8,
      include = Seq("tag"))
    // DML: key 10 jumps to the top of the order, key 499 (old max 1497)
    // drops to the bottom, key 498 is deleted outright.
    Seq(("000010", "9000", 100000L), ("000499", "1", 100001L))
      .toDF("rowKey", "v", "ts")
      .selectExpr("rowKey", "'f' AS family", "'v' AS qualifier",
        "encode(v, 'UTF-8') AS value", "ts")
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir)
    KvDelete.deleteRows(spark, dir, Seq("000498").toDF("rowKey"))
    val r = KvIndex.refresh(spark, dir, "by_v")
    assert(r.isInstanceOf[KvIndex.Refreshed], s"staging refresh: $r")
    KvIndexRouting.install(spark)
    dir
  }

  /** Ground truth: full-scan LWW pivot, numeric sort, k rows. */
  private def oracleTop(dir: String, k: Int, desc: Boolean): Seq[(String, String)] = {
    val piv = spark.read.format("graft-kv").load(dir)
      .filter(col("family") === "f" && col("qualifier") === "v")
      .groupBy("rowKey")
      .agg(decode(graft.functions.MaxByTsAgg.maxByTs(col("value"), col("ts")),
        "UTF-8").as("value"))
    val ord =
      if (desc) Seq(col("value").cast("long").desc, col("rowKey").desc)
      else Seq(col("value").cast("long").asc, col("rowKey").asc)
    piv.orderBy(ord: _*).limit(k).as[(String, String)].collect().toSeq
  }

  private def pivotView(dir: String, name: String): Unit =
    spark.read.format("graft-kv").load(dir)
      .filter(col("family") === "f" && col("qualifier") === "v")
      .groupBy(col("rowKey"))
      .agg(decode(graft.functions.MaxByTsAgg.maxByTs(
        col("value"), col("ts")), "UTF-8").as("value"))
      .createOrReplaceTempView(name)

  private def planOf(df: DataFrame): String = {
    df.collect(): Unit
    df.queryExecution.executedPlan.toString
  }

  test("topNCovered serves index-only: zero base data-file opens, pushed TopN, exact rows") {
    import scala.jdk.CollectionConverters._
    val dir = covTable
    val wantDesc = oracleTop(dir, 7, desc = true)
    CountingFileSystem.reset()
    val res = KvIndex.topNCovered(spark, dir, "by_v", 7)
    val got = res.as[(String, String)].collect().toSeq
    val opened = CountingFileSystem.openedData.asScala.toSet
    assert(opened.nonEmpty && opened.forall(_.contains("/_index/")),
      s"top-n touched base data files: $opened")
    got shouldBe wantDesc
    got.head shouldBe (("000010", "9000")) // the DML'd max, not old 1497
    // the cell-level TopN reached the index scan (O(k) rows per file)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("topN="), s"TopN not pushed into the index scan:\n$plan")
    // ASC mirror: the deleted key must not resurface at the bottom
    val gotAsc = KvIndex.topNCovered(spark, dir, "by_v", 5, desc = false)
      .as[(String, String)].collect().toSeq
    gotAsc shouldBe oracleTop(dir, 5, desc = false)
    assert(!gotAsc.exists(_._1 == "000498"), "deleted key served")
  }

  test("topNCovered refuses plain indexes; a stale covered index serves verified") {
    val dir = s"${base}/refuse"
    graft.sinks.Sinks.deleteRecursive(spark, dir)
    spark.range(100).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'v' AS qualifier",
      "encode(CAST(id AS STRING), 'UTF-8') AS value", "id AS ts")
      .write.format("graft-kv").option("regions", 2).mode("overwrite").save(dir)
    KvIndex.create(spark, dir, "plain", "f", "v", pad = 4)
    (the[IllegalArgumentException] thrownBy
      KvIndex.topNCovered(spark, dir, "plain", 5))
      .getMessage should include("covered")
    KvIndex.create(spark, dir, "cov", "f", "v", pad = 4, include = Nil,
      covered = true)
    // one more commit makes the covered index STALE: r18, the top-n is
    // still served — over-fetched stale candidates ∪ the CDC tail,
    // verified against the pinned base — and sees the unabsorbed update
    // (000000 jumps from 0 to 77, into the top 5)
    Seq(("000000", "77", 9999L)).toDF("rowKey", "v", "ts")
      .selectExpr("rowKey", "'f' AS family", "'v' AS qualifier",
        "encode(v, 'UTF-8') AS value", "ts")
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir)
    KvIndex.topNCovered(spark, dir, "cov", 5)
      .as[(String, String)].collect().toSeq shouldBe Seq(
        ("000099", "99"), ("000098", "98"), ("000097", "97"),
        ("000096", "96"), ("000095", "95"))
    KvIndex.topNCovered(spark, dir, "cov", 3, desc = false)
      .as[(String, String)].collect().toSeq shouldBe Seq(
        ("000001", "1"), ("000002", "2"), ("000003", "3"))
    // and a stale delete: drop the current max without a refresh
    KvDelete.deleteRows(spark, dir, Seq("000099").toDF("rowKey"))
    KvIndex.topNCovered(spark, dir, "cov", 2)
      .as[(String, String)].collect().toSeq shouldBe Seq(
        ("000098", "98"), ("000097", "97"))
    KvIndex.refresh(spark, dir, "cov")
    KvIndex.topNCovered(spark, dir, "cov", 1)
      .as[(String, String)].collect().head shouldBe (("000098", "98"))
  }

  test("stale top-n stays O(k + changes): per-key gets on the base, index head fetch") {
    import scala.jdk.CollectionConverters._
    val dir = s"${base}/stale_cost"
    spark.sparkContext.hadoopConfiguration.set("fs.cfs.impl",
      classOf[CountingFileSystem].getName)
    graft.sinks.Sinks.deleteRecursive(spark, dir.stripPrefix("cfs:"))
    val cdir = s"cfs:$dir"
    spark.range(400).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'v' AS qualifier",
      "encode(CAST(id * 7 AS STRING), 'UTF-8') AS value", "id AS ts")
      .write.format("graft-kv").option("regions", 4).mode("overwrite").save(cdir)
    KvIndex.create(spark, cdir, "by_v", "f", "v", pad = 8, covered = true)
    // two touched keys since the refresh
    Seq(("000003", "99999", 50000L), ("000399", "2", 50001L))
      .toDF("rowKey", "v", "ts")
      .selectExpr("rowKey", "'f' AS family", "'v' AS qualifier",
        "encode(v, 'UTF-8') AS value", "ts")
      .write.format("graft-kv").option("regions", 1).mode("append").save(cdir)
    val df = KvIndex.topNCovered(spark, cdir, "by_v", 5)
    CountingFileSystem.reset()
    val got = df.as[(String, String)].collect().toSeq
    got shouldBe Seq(("000003", "99999"), ("000398", "2786"),
      ("000397", "2779"), ("000396", "2772"), ("000395", "2765"))
    // the verification read is a bounded per-key In — its plan must not
    // be a full base scan (the In pushes per-key bloom-pruned gets)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("In(rowKey"),
      s"stale top-n verification is not a pushed per-key get:\n$plan")
  }

  test("SQL ORDER BY value LIMIT k routes index-only; tie-break and bare orders both serve") {
    import scala.jdk.CollectionConverters._
    val dir = covTable
    pivotView(dir, "topn_v")
    val want = oracleTop(dir, 9, desc = true)
    // (value, rowKey) same-direction tie-break: exact order contract
    val tied = spark.sql(
      """SELECT rowKey, value FROM topn_v
        |ORDER BY CAST(value AS BIGINT) DESC, rowKey DESC LIMIT 9""".stripMargin)
    CountingFileSystem.reset()
    val gotTied = tied.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val planTied = tied.queryExecution.executedPlan.toString
    assert(planTied.contains("KvRoutedLookup"),
      s"tie-broken top-n did not route:\n$planTied")
    assert(CountingFileSystem.openedData.asScala.forall(_.contains("/_index/")),
      "routed top-n opened base data files")
    gotTied shouldBe want
    // bare value order: any valid top-k SET — compare set-wise vs unrouted
    val bare = spark.sql(
      "SELECT rowKey, value FROM topn_v ORDER BY CAST(value AS BIGINT) DESC LIMIT 9")
    assert(planOf(bare).contains("KvRoutedLookup"), "bare-order top-n did not route")
    bare.collect().map(r => (r.getString(0), r.getString(1))).toSet shouldBe
      want.toSet // values are distinct here, so the set IS determined
    // routed ≡ unrouted
    spark.conf.set(KvIndexRouting.EnabledKey, "false")
    try {
      val plain = spark.sql(
        """SELECT rowKey, value FROM topn_v
          |ORDER BY CAST(value AS BIGINT) DESC, rowKey DESC LIMIT 9""".stripMargin)
      assert(!planOf(plain).contains("KvRoutedLookup"), "routing ran while disabled")
      plain.collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe gotTied
    } finally spark.conf.unset(KvIndexRouting.EnabledKey)
  }

  test("top-n shapes that cannot be proven index-served keep the pivot plan") {
    val dir = covTable
    pivotView(dir, "topn_r")
    def unrouted(sql: String): Unit = {
      val df = spark.sql(sql)
      val plan = planOf(df)
      assert(!plan.contains("KvRoutedLookup"), s"must not route:\n$sql\n$plan")
    }
    // string order over a DECIMAL-mode index: '999' sorts above '9000'
    unrouted("SELECT rowKey, value FROM topn_r ORDER BY value DESC LIMIT 5")
    // mixed tie directions: the index key implies SAME-direction ties
    unrouted("""SELECT rowKey, value FROM topn_r
                |ORDER BY CAST(value AS BIGINT) DESC, rowKey ASC LIMIT 5""".stripMargin)
    // non-default null ordering: the proof is direction-default only
    unrouted("""SELECT rowKey, value FROM topn_r
                |ORDER BY CAST(value AS BIGINT) DESC NULLS FIRST LIMIT 5""".stripMargin)
    // a non-rowKey second key answers a different tie question
    unrouted("""SELECT rowKey, value FROM topn_r
                |ORDER BY CAST(value AS BIGINT) DESC, value DESC LIMIT 5""".stripMargin)
    // the inner filter's qualifier set must EQUAL the pivoted columns:
    // an IN superset contributes rows whose every value column is NULL
    // — rank-relevant to a bare top-k and invisible to any index
    spark.read.format("graft-kv").load(dir)
      .filter(col("family") === "f" && col("qualifier").isin("v", "tag"))
      .groupBy(col("rowKey"))
      .agg(decode(graft.functions.MaxByTsAgg.maxByTs(
        col("value"), when(col("qualifier") === "v", col("ts"))),
        "UTF-8").as("value"))
      .createOrReplaceTempView("topn_super")
    unrouted("""SELECT rowKey, value FROM topn_super
                |ORDER BY CAST(value AS BIGINT) DESC, rowKey DESC LIMIT 5""".stripMargin)
    // STALE covered index: one more base commit, no refresh — r18, the
    // route STILL serves (verified over-fetch ∪ CDC tail) and the
    // answer reflects the unabsorbed commit
    Seq(("000123", "8888", 200000L)).toDF("rowKey", "v", "ts")
      .selectExpr("rowKey", "'f' AS family", "'v' AS qualifier",
        "encode(v, 'UTF-8') AS value", "ts")
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir)
    pivotView(dir, "topn_r")
    val stale = spark.sql(
      """SELECT rowKey, value FROM topn_r
        |ORDER BY CAST(value AS BIGINT) DESC, rowKey DESC LIMIT 3""".stripMargin)
    val stalePlan = planOf(stale)
    assert(stalePlan.contains("KvRoutedLookup"),
      s"stale covered index no longer served top-n:\n$stalePlan")
    stale.collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      oracleTop(dir, 3, desc = true)
    // refresh restores the index-only head (no verification read)
    KvIndex.refresh(spark, dir, "by_v")
    pivotView(dir, "topn_r")
    val again = spark.sql(
      """SELECT rowKey, value FROM topn_r
        |ORDER BY CAST(value AS BIGINT) DESC, rowKey DESC LIMIT 3""".stripMargin)
    import scala.jdk.CollectionConverters._
    CountingFileSystem.reset()
    again.collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      oracleTop(dir, 3, desc = true)
    assert(planOf(again).contains("KvRoutedLookup"),
      "refreshed index did not route")
    // fresh again: the execution-time lookup reads the index only
    assert(CountingFileSystem.openedData.asScala.forall(_.contains("/_index/")),
      "fresh top-n still paid a base verification read")
  }

  test("range-restricted top-n routes: Limit(Sort(Filter(range, pivot))) in one index scan") {
    import scala.jdk.CollectionConverters._
    val dir = covTable
    KvIndex.refresh(spark, dir, "by_v") // covTable tests may interleave
    pivotView(dir, "topn_f")
    def oracleRange(k: Int, lo: Long, hi: Option[Long], desc: Boolean) = {
      val piv = spark.read.format("graft-kv").load(dir)
        .filter(col("family") === "f" && col("qualifier") === "v")
        .groupBy("rowKey")
        .agg(decode(graft.functions.MaxByTsAgg.maxByTs(col("value"), col("ts")),
          "UTF-8").as("value"))
        .filter(hi.foldLeft(col("value").cast("long") >= lo)(
          (c, h) => c && col("value").cast("long") < h))
      val ord = if (desc) Seq(col("value").cast("long").desc, col("rowKey").desc)
        else Seq(col("value").cast("long").asc, col("rowKey").asc)
      piv.orderBy(ord: _*).limit(k).as[(String, String)].collect().toSeq
    }
    // closed range, DESC
    val closed = spark.sql(
      """SELECT rowKey, value FROM topn_f
        |WHERE CAST(value AS BIGINT) >= 600 AND CAST(value AS BIGINT) < 1200
        |ORDER BY CAST(value AS BIGINT) DESC, rowKey DESC LIMIT 5""".stripMargin)
    CountingFileSystem.reset()
    val gotClosed = closed.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val planClosed = closed.queryExecution.executedPlan.toString
    assert(planClosed.contains("KvRoutedLookup"),
      s"range top-n did not route:\n$planClosed")
    assert(CountingFileSystem.openedData.asScala.forall(_.contains("/_index/")),
      "fresh range top-n opened base data files")
    gotClosed shouldBe oracleRange(5, 600, Some(1200), desc = true)
    // OPEN upper bound (the `value >= x ORDER BY ... LIMIT k` shape)
    val open = spark.sql(
      """SELECT rowKey, value FROM topn_f
        |WHERE CAST(value AS BIGINT) >= 900
        |ORDER BY CAST(value AS BIGINT) ASC, rowKey ASC LIMIT 4""".stripMargin)
    assert(planOf(open).contains("KvRoutedLookup"),
      s"open-bound range top-n did not route:\n${planOf(open)}")
    open.collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      oracleRange(4, 900, None, desc = false)
    // a RESIDUAL conjunct the index cannot consume must NOT route the
    // top-n arm (it would cut spliced rows and under-produce the limit)
    val residual = spark.sql(
      """SELECT rowKey, value FROM topn_f
        |WHERE CAST(value AS BIGINT) >= 600 AND rowKey > '000100'
        |ORDER BY CAST(value AS BIGINT) DESC, rowKey DESC LIMIT 5""".stripMargin)
    residual.collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe {
      val piv = spark.read.format("graft-kv").load(dir)
        .filter(col("family") === "f" && col("qualifier") === "v")
        .groupBy("rowKey")
        .agg(decode(graft.functions.MaxByTsAgg.maxByTs(col("value"), col("ts")),
          "UTF-8").as("value"))
        .filter(col("value").cast("long") >= 600 && col("rowKey") > "000100")
      piv.orderBy(col("value").cast("long").desc, col("rowKey").desc)
        .limit(5).as[(String, String)].collect().toSeq
    }
  }

  test("top-n cost tie-break: the narrowest covered payload serves, not name order") {
    val dir = s"$base/tiebreak"
    graft.sinks.Sinks.deleteRecursive(spark, dir)
    spark.range(200).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'v' AS qualifier",
      "encode(CAST(id * 11 AS STRING), 'UTF-8') AS value", "id AS ts")
      .write.format("graft-kv").option("regions", 2).mode("overwrite").save(dir)
    // name order would pick aaa_wide; the fetch cost (cells per entry)
    // says zzz_slim — 2 cells vs 4
    KvIndex.create(spark, dir, "aaa_wide", "f", "v", pad = 6,
      include = Seq("x", "y"))
    KvIndex.create(spark, dir, "zzz_slim", "f", "v", pad = 6, covered = true)
    KvIndexRouting.install(spark)
    pivotView(dir, "topn_tb")
    val df = spark.sql(
      """SELECT rowKey, value FROM topn_tb
        |ORDER BY CAST(value AS BIGINT) DESC, rowKey DESC LIMIT 5""".stripMargin)
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    got shouldBe (199 to 195 by -1).map(i => (f"$i%06d", (i * 11).toString))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("index=zzz_slim"),
      s"cost tie-break did not pick the slim index:\n$plan")
  }

  test("multi-qualifier top-n: the covered-include wide route, null-ordering guards intact") {
    val dir = s"$base/wide"
    graft.sinks.Sinks.deleteRecursive(spark, dir)
    // 300 keys carry 'c' (value 3·id); keys 0..149 ALSO carry 'v'
    // (5·id); keys 300..349 carry ONLY 'v' — the null-leading pivot
    // rows the wide guards exist for
    val cCells = spark.range(300).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'c' AS qualifier",
      "encode(CAST(id * 3 AS STRING), 'UTF-8') AS value", "id AS ts")
    val vCells = spark.range(150).unionAll(spark.range(300, 350)).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'v' AS qualifier",
      "encode(CAST(id * 5 AS STRING), 'UTF-8') AS value", "id AS ts")
    cCells.unionAll(vCells).write.format("graft-kv")
      .option("regions", 3).mode("overwrite").save(dir)
    KvIndex.create(spark, dir, "cov_cv", "f", "c", pad = 8,
      include = Seq("v"))
    KvIndexRouting.install(spark)
    def view(): Unit = spark.read.format("graft-kv").load(dir)
      .filter(col("family") === "f" && col("qualifier").isin("c", "v"))
      .groupBy(col("rowKey"))
      .agg(
        decode(graft.functions.MaxByTsAgg.maxByTs(col("value"),
          when(col("qualifier") === "c", col("ts"))), "UTF-8").as("c"),
        decode(graft.functions.MaxByTsAgg.maxByTs(col("value"),
          when(col("qualifier") === "v", col("ts"))), "UTF-8").as("v"))
      .createOrReplaceTempView("wide_v")
    view()
    def rows(sql: String): Seq[(String, String, String)] =
      spark.sql(sql).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    def check(sql: String, expectRouted: Boolean): Unit = {
      val df = spark.sql(sql)
      val got = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("KvRoutedLookup") == expectRouted,
        s"routed=${!expectRouted} unexpectedly for:\n$sql\n$plan")
      spark.conf.set(KvIndexRouting.EnabledKey, "false")
      try got shouldBe rows(sql)
      finally spark.conf.unset(KvIndexRouting.EnabledKey)
    }
    // bare DESC within the c-row count: index-served, include riding
    check("""SELECT rowKey, c, v FROM wide_v
            |ORDER BY CAST(c AS BIGINT) DESC, rowKey DESC LIMIT 5""".stripMargin,
      expectRouted = true)
    // bare ASC: the true head IS the null-c (v-only) rows — never routes
    check("""SELECT rowKey, c, v FROM wide_v
            |ORDER BY CAST(c AS BIGINT) ASC, rowKey ASC LIMIT 5""".stripMargin,
      expectRouted = false)
    // range + ASC: bounds exclude nulls on both sides — routes
    check("""SELECT rowKey, c, v FROM wide_v
            |WHERE CAST(c AS BIGINT) >= 300 AND CAST(c AS BIGINT) < 600
            |ORDER BY CAST(c AS BIGINT) ASC, rowKey ASC LIMIT 7""".stripMargin,
      expectRouted = true)
    // bare DESC with k PAST the c-row count: routes, and the in-node
    // guard falls back to the exact wide pivot so the null-c tail pads
    // identically to the unrouted plan
    check("""SELECT rowKey, c, v FROM wide_v
            |ORDER BY CAST(c AS BIGINT) DESC, rowKey DESC LIMIT 320""".stripMargin,
      expectRouted = true)
    // STALE: an unabsorbed update jumps a key into the top, a fresh
    // v-only key lands, a key is deleted — the wide route still answers
    spark.range(1).selectExpr(
      "'000007' AS rowKey", "'f' AS family", "'c' AS qualifier",
      "encode('99999', 'UTF-8') AS value", "500000L AS ts")
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir)
    KvDelete.deleteRows(spark, dir,
      spark.range(1).selectExpr("'000299' AS rowKey"))
    view()
    check("""SELECT rowKey, c, v FROM wide_v
            |ORDER BY CAST(c AS BIGINT) DESC, rowKey DESC LIMIT 6""".stripMargin,
      expectRouted = true)
  }

  test("bare wide ASC serves when the includeOnly stat proves no null-leading rows") {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.hadoopConfiguration.set("fs.cfs.impl",
      classOf[CountingFileSystem].getName)
    val local = s"$base/asc_stat"
    graft.sinks.Sinks.deleteRecursive(spark, local)
    val dir = s"cfs:$local"
    // every key carries BOTH qualifiers — includeOnly must compute to 0
    val cCells = spark.range(200).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'c' AS qualifier",
      "encode(CAST(id * 3 AS STRING), 'UTF-8') AS value", "id AS ts")
    val vCells = spark.range(200).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'v' AS qualifier",
      "encode(CAST(id * 5 AS STRING), 'UTF-8') AS value", "id AS ts")
    cCells.unionAll(vCells).write.format("graft-kv")
      .option("regions", 2).mode("overwrite").save(dir)
    KvIndex.create(spark, dir, "cov_cv", "f", "c", pad = 8,
      include = Seq("v"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    KvIndex.meta(fs, new org.apache.hadoop.fs.Path(dir), "cov_cv")
      .get.includeOnly shouldBe Some(0L)
    KvIndexRouting.install(spark)
    def view(): Unit = spark.read.format("graft-kv").load(dir)
      .filter(col("family") === "f" && col("qualifier").isin("c", "v"))
      .groupBy(col("rowKey"))
      .agg(
        decode(graft.functions.MaxByTsAgg.maxByTs(col("value"),
          when(col("qualifier") === "c", col("ts"))), "UTF-8").as("c"),
        decode(graft.functions.MaxByTsAgg.maxByTs(col("value"),
          when(col("qualifier") === "v", col("ts"))), "UTF-8").as("v"))
      .createOrReplaceTempView("asc_v")
    view()
    val ascSql =
      """SELECT rowKey, c, v FROM asc_v
        |ORDER BY CAST(c AS BIGINT) ASC, rowKey ASC LIMIT 5""".stripMargin
    def run(sql: String): (Seq[(String, String, String)], String) = {
      val df = spark.sql(sql)
      (df.collect().map(r =>
        (r.getString(0), r.getString(1), r.getString(2))).toSeq,
        df.queryExecution.executedPlan.toString)
    }
    def unroutedRows(sql: String): Seq[(String, String, String)] = {
      spark.conf.set(KvIndexRouting.EnabledKey, "false")
      try run(sql)._1 finally spark.conf.unset(KvIndexRouting.EnabledKey)
    }
    // FRESH + stat 0: bare ASC routes and serves index-only
    CountingFileSystem.reset()
    val (gotAsc, planAsc) = run(ascSql)
    assert(planAsc.contains("KvRoutedLookup"),
      s"stat-proven bare wide ASC did not route:\n$planAsc")
    assert(CountingFileSystem.openedData.asScala.forall(_.contains("/_index/")),
      "stat-proven bare ASC opened base data files")
    gotAsc shouldBe unroutedRows(ascSql)
    // STALE + stat 0 at asOf: a v-only key lands (becomes the TRUE ASC
    // head with null c) and a c update moves a key — no refresh; the
    // route must still answer exactly (touched keys are candidates and
    // the candidate frame keeps null-leading rows)
    Seq(("zz0001", "v", "7", 900000L), ("000150", "c", "1", 900001L))
      .toDF("rowKey", "q", "vv", "ts")
      .selectExpr("rowKey", "'f' AS family", "q AS qualifier",
        "encode(vv, 'UTF-8') AS value", "ts")
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir)
    view()
    val (gotStale, planStale) = run(ascSql)
    assert(planStale.contains("KvRoutedLookup"),
      s"stale stat-proven bare ASC did not route:\n$planStale")
    gotStale shouldBe unroutedRows(ascSql)
    gotStale.head._1 shouldBe "zz0001" // the null-c row ranks FIRST (ASC)
    // REFRESH recomputes the stat incrementally → 1 → bare ASC declines
    val r = KvIndex.refresh(spark, dir, "cov_cv")
    assert(r.isInstanceOf[KvIndex.Refreshed], s"refresh: $r")
    KvIndex.meta(fs, new org.apache.hadoop.fs.Path(dir), "cov_cv")
      .get.includeOnly shouldBe Some(1L)
    view()
    val (gotAfter, planAfter) = run(ascSql)
    assert(!planAfter.contains("KvRoutedLookup"),
      s"bare ASC routed with includeOnly=1:\n$planAfter")
    gotAfter shouldBe unroutedRows(ascSql)
  }

  test("composite top-n: ORDER BY c1, c2 LIMIT k with per-component bounds routes index-only") {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.hadoopConfiguration.set("fs.cfs.impl",
      classOf[CountingFileSystem].getName)
    val local = s"$base/composite"
    graft.sinks.Sinks.deleteRecursive(spark, local)
    val dir = s"cfs:$local"
    // 300 keys carry 'a' (3·id); only the first 250 ALSO carry 'b'
    // ((7·id) mod 1000) — keys 250..299 are the PARTIAL rows (null b)
    // the per-component null wall exists for
    val aCells = spark.range(300).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'a' AS qualifier",
      "encode(CAST(id * 3 AS STRING), 'UTF-8') AS value", "id AS ts")
    val bCells = spark.range(250).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'b' AS qualifier",
      "encode(CAST((id * 7) % 1000 AS STRING), 'UTF-8') AS value", "id AS ts")
    aCells.unionAll(bCells).write.format("graft-kv")
      .option("regions", 3).mode("overwrite").save(dir)
    KvIndex.create(spark, dir, "idx_ab", "f", "a", pad = 8,
      rest = Seq(("b", 8)))
    KvIndexRouting.install(spark)
    def view(): Unit = spark.read.format("graft-kv").load(dir)
      .filter(col("family") === "f" && col("qualifier").isin("a", "b"))
      .groupBy(col("rowKey"))
      .agg(
        decode(graft.functions.MaxByTsAgg.maxByTs(col("value"),
          when(col("qualifier") === "a", col("ts"))), "UTF-8").as("av"),
        decode(graft.functions.MaxByTsAgg.maxByTs(col("value"),
          when(col("qualifier") === "b", col("ts"))), "UTF-8").as("bv"))
      .createOrReplaceTempView("comp_v")
    view()
    def rows(sql: String): Seq[(String, String, String)] =
      spark.sql(sql).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    def check(sql: String, expectRouted: Boolean): Unit = {
      val df = spark.sql(sql)
      val got = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("KvRoutedLookup") == expectRouted,
        s"routed=${!expectRouted} unexpectedly for:\n$sql\n$plan")
      spark.conf.set(KvIndexRouting.EnabledKey, "false")
      try got shouldBe rows(sql)
      finally spark.conf.unset(KvIndexRouting.EnabledKey)
    }
    val bounded =
      """SELECT rowKey, av, bv FROM comp_v
        |WHERE CAST(av AS BIGINT) >= 150 AND CAST(av AS BIGINT) < 600
        |  AND CAST(bv AS BIGINT) >= 1 AND CAST(bv AS BIGINT) < 900
        |ORDER BY CAST(av AS BIGINT) DESC, CAST(bv AS BIGINT) DESC, rowKey DESC
        |LIMIT 6""".stripMargin
    // fresh: ONE bounded index scan, zero base data-file opens
    val df = spark.sql(bounded)
    CountingFileSystem.reset()
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("KvRoutedLookup"),
      s"bounded composite top-n did not route:\n$plan")
    assert(CountingFileSystem.openedData.asScala.forall(_.contains("/_index/")),
      "fresh composite top-n opened base data files")
    spark.conf.set(KvIndexRouting.EnabledKey, "false")
    try got shouldBe rows(bounded)
    finally spark.conf.unset(KvIndexRouting.EnabledKey)
    // ASC with the same bounds: both directions serve (no nulls left)
    check("""SELECT rowKey, av, bv FROM comp_v
            |WHERE CAST(av AS BIGINT) >= 150 AND CAST(av AS BIGINT) < 600
            |  AND CAST(bv AS BIGINT) >= 1 AND CAST(bv AS BIGINT) < 900
            |ORDER BY CAST(av AS BIGINT) ASC, CAST(bv AS BIGINT) ASC, rowKey ASC
            |LIMIT 6""".stripMargin, expectRouted = true)
    // the NULL WALL: a bare composite sort must NOT route — a partial
    // row (a present, b null) ranks mid-stream (e.g. (897, NULL) above
    // (300, 700) DESC) and is invisible to the inner-join index
    check("""SELECT rowKey, av, bv FROM comp_v
            |ORDER BY CAST(av AS BIGINT) DESC, CAST(bv AS BIGINT) DESC, rowKey DESC
            |LIMIT 5""".stripMargin, expectRouted = false)
    // one UNBOUNDED component: same wall, must not route
    check("""SELECT rowKey, av, bv FROM comp_v
            |WHERE CAST(av AS BIGINT) >= 150 AND CAST(av AS BIGINT) < 600
            |ORDER BY CAST(av AS BIGINT) DESC, CAST(bv AS BIGINT) DESC, rowKey DESC
            |LIMIT 5""".stripMargin, expectRouted = false)
    // sort order ≠ component order: the encoded key answers (a, b) only
    check("""SELECT rowKey, av, bv FROM comp_v
            |WHERE CAST(av AS BIGINT) >= 150 AND CAST(av AS BIGINT) < 600
            |  AND CAST(bv AS BIGINT) >= 1 AND CAST(bv AS BIGINT) < 900
            |ORDER BY CAST(bv AS BIGINT) DESC, CAST(av AS BIGINT) DESC, rowKey DESC
            |LIMIT 5""".stripMargin, expectRouted = false)
    // STALE: an unabsorbed update moves a key to the top of the bounded
    // range, another key is deleted — no refresh; the route still serves
    // (over-fetched candidates ∪ CDC tail, verified pinned)
    Seq(("000060", "a", "599", 500000L), ("000100", "b", "2", 500001L))
      .toDF("rowKey", "q", "v", "ts")
      .selectExpr("rowKey", "'f' AS family", "q AS qualifier",
        "encode(v, 'UTF-8') AS value", "ts")
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir)
    KvDelete.deleteRows(spark, dir, Seq("000199").toDF("rowKey"))
    view()
    check(bounded, expectRouted = true)
  }

  test("bare composite sort serves when the partial-key stat proves the index complete") {
    val dir = s"$base/composite_bare"
    graft.sinks.Sinks.deleteRecursive(spark, dir)
    // every key carries BOTH components — partial-key stat must be 0
    val aCells = spark.range(250).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'a' AS qualifier",
      "encode(CAST(id * 3 AS STRING), 'UTF-8') AS value", "id AS ts")
    val bCells = spark.range(250).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'b' AS qualifier",
      "encode(CAST(pmod(id * 37, 1000) AS STRING), 'UTF-8') AS value",
      "id AS ts")
    aCells.unionAll(bCells).write.format("graft-kv")
      .option("regions", 2).mode("overwrite").save(dir)
    KvIndex.create(spark, dir, "idx_ab", "f", "a", pad = 8,
      rest = Seq(("b", 8)))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    KvIndex.meta(fs, new org.apache.hadoop.fs.Path(dir), "idx_ab")
      .get.includeOnly shouldBe Some(0L)
    KvIndexRouting.install(spark)
    def view(): Unit = spark.read.format("graft-kv").load(dir)
      .filter(col("family") === "f" && col("qualifier").isin("a", "b"))
      .groupBy(col("rowKey"))
      .agg(
        decode(graft.functions.MaxByTsAgg.maxByTs(col("value"),
          when(col("qualifier") === "a", col("ts"))), "UTF-8").as("av"),
        decode(graft.functions.MaxByTsAgg.maxByTs(col("value"),
          when(col("qualifier") === "b", col("ts"))), "UTF-8").as("bv"))
      .createOrReplaceTempView("bare_v")
    view()
    val bareDesc =
      """SELECT rowKey, av, bv FROM bare_v
        |ORDER BY CAST(av AS BIGINT) DESC, CAST(bv AS BIGINT) DESC, rowKey DESC
        |LIMIT 5""".stripMargin
    val bareAsc =
      """SELECT rowKey, av, bv FROM bare_v
        |ORDER BY CAST(av AS BIGINT) ASC, CAST(bv AS BIGINT) ASC, rowKey ASC
        |LIMIT 5""".stripMargin
    def run(sql: String): (Seq[(String, String, String)], String) = {
      val df = spark.sql(sql)
      (df.collect().map(r =>
        (r.getString(0), r.getString(1), r.getString(2))).toSeq,
        df.queryExecution.executedPlan.toString)
    }
    def unrouted(sql: String): Seq[(String, String, String)] = {
      spark.conf.set(KvIndexRouting.EnabledKey, "false")
      try run(sql)._1 finally spark.conf.unset(KvIndexRouting.EnabledKey)
    }
    val (gotD, planD) = run(bareDesc)
    assert(planD.contains("KvRoutedLookup"),
      s"stat-proven bare composite DESC did not route:\n$planD")
    gotD shouldBe unrouted(bareDesc)
    val (gotA, planA) = run(bareAsc)
    assert(planA.contains("KvRoutedLookup"),
      s"stat-proven bare composite ASC did not route:\n$planA")
    gotA shouldBe unrouted(bareAsc)
    // a PARTIAL row lands (only 'a', the new global max) — no refresh:
    // plan-time stat still says 0, the stale path must rank it exactly
    // (touched key, any-frame candidates; DESC nulls-last on b)
    spark.range(1).selectExpr(
      "'zz0009' AS rowKey", "'f' AS family", "'a' AS qualifier",
      "encode('99999', 'UTF-8') AS value", "900000L AS ts")
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir)
    view()
    val (gotStale, planStale) = run(bareDesc)
    assert(planStale.contains("KvRoutedLookup"),
      s"stale stat-proven bare composite did not route:\n$planStale")
    gotStale shouldBe unrouted(bareDesc)
    gotStale.head._1 shouldBe "zz0009" // partial row ranks FIRST (max a)
    // refresh re-counts: one partial key → bare declines, still exact
    val r = KvIndex.refresh(spark, dir, "idx_ab")
    assert(r.isInstanceOf[KvIndex.Refreshed], s"refresh: $r")
    KvIndex.meta(fs, new org.apache.hadoop.fs.Path(dir), "idx_ab")
      .get.includeOnly shouldBe Some(1L)
    view()
    val (gotAfter, planAfter) = run(bareDesc)
    assert(!planAfter.contains("KvRoutedLookup"),
      s"bare composite routed with a partial key on record:\n$planAfter")
    gotAfter shouldBe unrouted(bareDesc)
  }

  test("salted base: covered lookup and top-n equal the unsalted twin, fresh and stale") {
    def build(name: String, salt: Option[Int]): String = {
      val dir = s"$base/$name"
      graft.sinks.Sinks.deleteRecursive(spark, dir)
      val data = spark.range(300).selectExpr(
        "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
        "'f' AS family", "'v' AS qualifier",
        "encode(CAST(id * 3 AS STRING), 'UTF-8') AS value", "id AS ts")
      salt match {
        case Some(n) =>
          KvSalt.saltedWrite(data, dir, n, regions = 3, mode = "overwrite")
        case None => data.write.format("graft-kv").option("regions", 3)
          .mode("overwrite").save(dir)
      }
      KvIndex.create(spark, dir, "by_v", "f", "v", pad = 8, covered = true)
      // DML after the create: an update + a delete, then the refresh
      val upd = spark.range(1).selectExpr(
        "'000005' AS rowKey", "'f' AS family", "'v' AS qualifier",
        "encode('70000', 'UTF-8') AS value", "700000L AS ts")
      salt match {
        case Some(n) => KvSalt.saltedWrite(upd, dir, n, regions = 1)
        case None => upd.write.format("graft-kv").option("regions", 1)
          .mode("append").save(dir)
      }
      import spark.implicits._
      KvDelete.deleteRows(spark, dir, Seq("000299").toDF("rowKey"))
      val r = KvIndex.refresh(spark, dir, "by_v")
      assert(r.isInstanceOf[KvIndex.Refreshed], s"$name refresh: $r")
      dir
    }
    val plain = build("twin_plain", None)
    val salted = build("twin_salted", Some(8))
    def top(dir: String, k: Int, desc: Boolean) =
      KvIndex.topNCovered(spark, dir, "by_v", k, desc)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    def look(dir: String) =
      KvIndex.lookupCovered(spark, dir, "by_v", "600", "900")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    // FRESH: the index surface must be layout-blind
    top(salted, 6, desc = true) shouldBe top(plain, 6, desc = true)
    top(salted, 6, desc = false) shouldBe top(plain, 6, desc = false)
    top(plain, 1, desc = true).head shouldBe (("000005", "70000"))
    look(salted) shouldBe look(plain)
    // STALE: one unabsorbed commit on each (same logical content), no
    // refresh — the verified stale path maps through the salt too
    Seq(plain -> None, salted -> Some(8)).foreach { case (dir, s) =>
      val upd2 = spark.range(1).selectExpr(
        "'000007' AS rowKey", "'f' AS family", "'v' AS qualifier",
        "encode('80000', 'UTF-8') AS value", "800000L AS ts")
      s match {
        case Some(n) => KvSalt.saltedWrite(upd2, dir, n, regions = 1)
        case None => upd2.write.format("graft-kv").option("regions", 1)
          .mode("append").save(dir)
      }
    }
    top(salted, 4, desc = true) shouldBe top(plain, 4, desc = true)
    top(plain, 1, desc = true).head shouldBe (("000007", "80000"))
    look(salted) shouldBe look(plain)
  }

  test("rangeIsSelective memo invalidates on a new base commit (decision re-prices)") {
    val dir = s"$base/memo"
    graft.sinks.Sinks.deleteRecursive(spark, dir)
    // 100 rows; the probed range [0, 90) covers ~30% — unselective at
    // the 0.2 default, so the first plan keeps the scan.
    spark.range(100).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'v' AS qualifier",
      "encode(CAST(id * 3 AS STRING), 'UTF-8') AS value", "id AS ts")
      .write.format("graft-kv").option("regions", 2).mode("overwrite").save(dir)
    KvIndex.create(spark, dir, "by_v", "f", "v", pad = 6)
    KvIndexRouting.install(spark)
    def rangeDf(): DataFrame = {
      spark.read.format("graft-kv").load(dir)
        .filter(col("family") === "f" && col("qualifier") === "v")
        .groupBy(col("rowKey"))
        .agg(decode(graft.functions.MaxByTsAgg.maxByTs(
          col("value"), col("ts")), "UTF-8").as("value"))
        .createOrReplaceTempView("memo_v")
      spark.sql(
        """SELECT rowKey, value FROM memo_v
          |WHERE CAST(value AS BIGINT) >= 0 AND CAST(value AS BIGINT) < 90""".stripMargin)
    }
    val before = rangeDf()
    val planBefore = planOf(before)
    assert(!planBefore.contains("KvRoutedLookup"), s"30% range routed:\n$planBefore")
    before.count() shouldBe 30L
    // 400 new keys far OUT of range: base grows 5×, the same range is
    // now 6% — a memoized stat replay that survived this commit would
    // keep refusing. (The index is NOT refreshed: only the base's
    // latestSeq moves, which is exactly the memo key under test.)
    spark.range(1000, 1400).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'v' AS qualifier",
      "encode(CAST(50000 + id AS STRING), 'UTF-8') AS value", "id AS ts")
      .write.format("graft-kv").option("regions", 2).mode("append").save(dir)
    val after = rangeDf()
    val planAfter = planOf(after)
    assert(planAfter.contains("KvRoutedLookup"),
      s"post-commit re-price did not route (stale memo?):\n$planAfter")
    after.count() shouldBe 30L
  }
}
