package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kv.{KvGenerator, RangeLayout}

/** The `graft-kv` DataSource V2 connector: correctness vs a plain parquet
  * read of the same region files, plus the pushdown surface the connector
  * OWNS — family/qualifier/rowKey predicates reported pushed, rowKey range
  * pruning whole region files at planning time, column pruning reaching the
  * reader.
  */
class KvSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_source_regions"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    val cells = KvGenerator.cells(spark, 2000, 4, "run1")
    RangeLayout.layout(cells, 8).write.mode("overwrite").parquet(d)
    d
  }

  private def v2: DataFrame = spark.read.format("graft-kv").load(dir)
  private def pq: DataFrame = spark.read.parquet(dir)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case b: Array[Byte] => new String(b, "UTF-8")
      case x => String.valueOf(x)
    }.mkString("|")).sorted.toSeq

  test("full scan equals the plain parquet read, one partition per region file") {
    sortedRows(v2) shouldBe sortedRows(pq)
    v2.rdd.getNumPartitions shouldBe 8
  }

  test("family + qualifier predicates match the parquet read and are reported pushed") {
    val p = col("family") === "c" && col("qualifier") === "C3"
    sortedRows(v2.filter(p)) shouldBe sortedRows(pq.filter(p))
    val plan = v2.filter(p).queryExecution.executedPlan.toString
    plan should include("GraftKvScan")
    plan should include("pushed=[")
    plan should include("EqualTo(qualifier,C3)")
  }

  test("rowKey range prunes region files at planning time") {
    val lo = "00100"
    val hi = "00200"
    val ranged = v2.filter(col("rowKey") >= lo && col("rowKey") < hi)
    sortedRows(ranged) shouldBe sortedRows(pq.filter(col("rowKey") >= lo && col("rowKey") < hi))
    // the sorted 8-region layout puts a narrow key interval in 1-2 regions;
    // the pruned scan must schedule strictly fewer partitions than regions
    assert(ranged.rdd.getNumPartitions < 8,
      s"expected region pruning, got ${ranged.rdd.getNumPartitions} partitions")
    val plan = ranged.queryExecution.executedPlan.toString
    plan should include regex "regions=[1-7]/8"
  }

  test("a multi-thousand-key In stays correct and limit-safe (range-relaxed record filter)") {
    // past KvFilters.InRecordFilterMax (256) the parquet record filter
    // relaxes to the key set's [min, max] range — a SUPERSET; Spark's
    // retained InSet must cut it back exactly, and the per-reader limit
    // cap must stay OFF (allExact treats the relaxed In as inexact) so
    // a limit over the big In can never under-produce
    // real keys (every 2nd distinct key + misses), so the In actually hits
    val live = pq.select("rowKey").distinct().orderBy("rowKey")
      .collect().map(_.getString(0))
    val keys = live.zipWithIndex.collect { case (k, i) if i % 2 == 0 => k } ++
      (0 until 2000).map(i => s"miss_$i")
    require(keys.length > 500, s"fixture too small: ${keys.length}")
    val inDf = v2.filter(col("rowKey").isin(keys: _*))
    sortedRows(inDf) shouldBe sortedRows(pq.filter(col("rowKey").isin(keys: _*)))
    val expected = pq.filter(col("rowKey").isin(keys: _*))
      .filter(col("qualifier") === "C0")
      .orderBy("rowKey", "ts").limit(7).collect()
      .map(_.getString(0)).toSeq
    v2.filter(col("rowKey").isin(keys: _*))
      .filter(col("qualifier") === "C0")
      .orderBy("rowKey", "ts").limit(7).collect()
      .map(_.getString(0)).toSeq shouldBe expected
  }

  test("an Or of rowKey ranges prunes per disjunct (MultiRowRangeFilter shape)") {
    // two narrow ranges at opposite ends of the keyspace: conjunctive-only
    // pruning would see no single bound and keep all 8 regions; disjunctive
    // pruning keeps just the regions each disjunct touches
    val p = (col("rowKey") >= "00010" && col("rowKey") < "00060") ||
      (col("rowKey") >= "01900" && col("rowKey") < "01950")
    val both = v2.filter(p)
    sortedRows(both) shouldBe sortedRows(pq.filter(p))
    assert(both.rdd.getNumPartitions < 8,
      s"expected disjunctive pruning, got ${both.rdd.getNumPartitions} partitions")
  }

  test("an IN rowKey list prunes regions by its disjunct points") {
    val keys = Seq("00011", "00013")
    val in = v2.filter(col("rowKey").isin(keys: _*))
    sortedRows(in) shouldBe sortedRows(pq.filter(col("rowKey").isin(keys: _*)))
    assert(in.rdd.getNumPartitions < 8,
      s"expected IN pruning, got ${in.rdd.getNumPartitions} partitions")
  }

  test("column pruning reaches the scan output") {
    val slim = v2.select(col("rowKey"), col("ts"))
    sortedRows(slim) shouldBe sortedRows(pq.select(col("rowKey"), col("ts")))
    val scanLine = slim.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("GraftKvScan")).get
    scanLine should not include "qualifier"
  }

  test("filter-only columns are materialized for the reader but not emitted") {
    val p = col("qualifier") === "C1"
    val slim = v2.filter(p).select(col("rowKey"))
    sortedRows(slim) shouldBe sortedRows(pq.filter(p).select(col("rowKey")))
  }

  test("empty-result range yields zero partitions, not a full scan") {
    val none = v2.filter(col("rowKey") >= "99998" && col("rowKey") <= "99999zzz")
    none.count() shouldBe pq.filter(col("rowKey") >= "99998" && col("rowKey") <= "99999zzz").count()
  }

  test("write path enforces the bulk-load layout on UNSORTED, UNPARTITIONED input") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_test/kv_sink_regions"
    graft.sinks.Sinks.deleteRecursive(spark, out)
    // adversarial input: random order, random partitioning, 32 partitions
    val cells = KvGenerator.cells(spark, 2000, 4, "runw")
      .repartition(32, col("ts")).orderBy(rand(7)).repartition(32)
    cells.write.format("graft-kv").option("regions", 6).mode("overwrite").save(out)

    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    files.length shouldBe 6 // one file per demanded region

    // row-level equality with the input
    val back = spark.read.parquet(out)
    back.count() shouldBe cells.count()
    def digest(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(bit_xor(xxhash64(col("rowKey"), col("qualifier"), col("ts"))))
        .collect()(0).getLong(0)
    digest(back) shouldBe digest(cells)

    // the HFile invariant, checked per FILE: sorted by (rowKey, qualifier)
    // within, and file key ranges globally disjoint + ordered
    val ranges = files.map { f =>
      val rows = spark.read.parquet(f.getAbsolutePath)
        .select(col("rowKey"), col("qualifier")).collect()
        .map(r => (r.getString(0), r.getString(1)))
      rows.sortBy(identity).toSeq shouldBe rows.toSeq // sorted within file
      (rows.head._1, rows.last._1)
    }
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA <= loB,
        s"region files overlap: $hiA > $loB")
      case _ => ()
    }
    // connector-written files are readable back through the connector too,
    // with region pruning intact
    val viaV2 = spark.read.format("graft-kv").load(out)
    viaV2.count() shouldBe cells.count()
    assert(viaV2.filter(col("rowKey") < "00100").rdd.getNumPartitions < 6)
  }

  test("count(*) and min/max(ts) are served from footer metadata, zero data read") {
    val agg = v2.agg(count(lit(1)).as("n"), min(col("ts")).as("lo"), max(col("ts")).as("hi"))
    val expect = pq.agg(count(lit(1)), min(col("ts")), max(col("ts"))).collect()(0)
    val got = agg.collect()(0)
    got.getLong(0) shouldBe expect.getLong(0)
    got.getLong(1) shouldBe expect.getLong(1)
    got.getLong(2) shouldBe expect.getLong(2)
    val plan = agg.queryExecution.executedPlan.toString
    plan should include("aggPushed=[COUNT(*), MIN(ts), MAX(ts)]")
    plan should include("metadata-only")
  }

  test("a filter disables the metadata aggregate rewrite") {
    val agg = v2.filter(col("qualifier") === "C1").agg(count(lit(1)))
    agg.collect()(0).getLong(0) shouldBe
      pq.filter(col("qualifier") === "C1").count()
    agg.queryExecution.executedPlan.toString should not include "aggPushed"
  }

  test("reported statistics make the connector side of a join broadcast-eligible") {
    // without SupportsReportStatistics a V2 relation sizes at
    // defaultSizeInBytes (effectively infinite) and can never auto-broadcast
    val small = v2.filter(col("rowKey") >= "00100" && col("rowKey") < "00200")
    val sizeB = small.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(sizeB < 10L * 1024 * 1024, s"stats should reflect pruned regions, got $sizeB")
    val big = spark.range(0, 100000).selectExpr(
      "lpad(CAST(id % 32768 AS STRING), 5, '0') AS k", "id AS payload")
    val joined = big.join(small, col("k") === substring(col("rowKey"), 1, 5))
    val plan = joined.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("the connector works as a SQL catalog table (CREATE TABLE USING graft-kv)") {
    spark.sql("DROP TABLE IF EXISTS kv_sql_table")
    spark.sql(s"CREATE TABLE kv_sql_table USING `graft-kv` OPTIONS (path '$dir')")
    try {
      val viaSql = spark.sql(
        "SELECT rowKey, ts FROM kv_sql_table WHERE qualifier = 'C2'")
      viaSql.count() shouldBe pq.filter(col("qualifier") === "C2").count()
      val plan = viaSql.queryExecution.executedPlan.toString
      plan should include("GraftKvScan")
      plan should include("EqualTo(qualifier,C2)")
    } finally spark.sql("DROP TABLE IF EXISTS kv_sql_table")
  }

  test("pushed limit plans O(limit) files unfiltered, caps reader output filtered") {
    // unfiltered: one region file's footer rows cover LIMIT 3 -> 1 task,
    // not 8, and the global Limit still gets its rows
    val limited = v2.limit(3)
    limited.count() shouldBe 3
    limited.rdd.getNumPartitions shouldBe 1
    limited.queryExecution.executedPlan.toString should include("limit=3")
    // the rows are genuine table rows
    val full = sortedRows(pq).toSet
    sortedRows(limited).foreach(r => full should contain(r))
    // filtered: matching-rows-per-file is unknowable from metadata, so all
    // regions stay planned; the cap is per-reader, post-filter — the
    // result still honors both the filter and the limit
    val filtered = v2.filter(col("qualifier") === "C3").limit(5)
    val rows = filtered.collect()
    rows.length shouldBe 5
    filtered.queryExecution.executedPlan.toString should include("regions=8/8")
    val c3 = sortedRows(pq.filter(col("qualifier") === "C3")).toSet
    sortedRows(filtered).foreach(r => c3 should contain(r))
    // a limit larger than the table degrades to the full scan
    v2.limit(1000000).count() shouldBe pq.count()
  }

  test("ORDER BY rowKey LIMIT n pushes top-n both directions: every reader O(n), no file dropped") {
    // an LSM-shaped table: two OVERLAPPING commits, each covering the full
    // keyspace — any file may hold globally-small keys
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_source_topn"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    val cells = KvGenerator.cells(spark, 800, 4, "runT")
    (0 until 2).foreach { i =>
      cells.filter(pmod(col("ts"), lit(2)) === i)
        .write.format("graft-kv").option("regions", 2)
        .mode("append").save(d)
    }
    val t = spark.read.format("graft-kv").load(d)
    val p = spark.read.parquet(d)
    def keys(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("rowKey").collect().map(_.getString(0)).sorted.toSeq
    val top = t.orderBy("rowKey").limit(7)
    // the rowKey MULTISET of a rowKey-ordered top-n is deterministic even
    // when ties leave the chosen physical rows ambiguous
    keys(top) shouldBe keys(p.orderBy("rowKey").limit(7))
    val plan = top.queryExecution.executedPlan.toString
    plan should include("topN=7(rowKey ASC)")
    plan should include("regions=4/4") // overlap: no file may be dropped
    // with a filter, Spark's rule keeps TopN above the (residual) Filter
    // and does not push it — the query still answers correctly through
    // the ordinary TakeOrderedAndProject path
    val topF = t.filter(col("qualifier") === "C2").orderBy("rowKey").limit(3)
    keys(topF) shouldBe
      keys(p.filter(col("qualifier") === "C2").orderBy("rowKey").limit(3))
    topF.queryExecution.executedPlan.toString should not include "topN="
    // DESC is served by the TAIL reader (ring buffer over the file's last
    // rows, tail row groups only when unfiltered): pushed, correct, O(n)
    // emitted per task — the "newest keys" inspection
    val desc = t.orderBy(col("rowKey").desc).limit(4)
    keys(desc) shouldBe keys(p.orderBy(col("rowKey").desc).limit(4))
    val dplan = desc.queryExecution.executedPlan.toString
    dplan should include("topN=4(rowKey DESC)")
    dplan should include("regions=4/4") // overlap: no file may be dropped
    // a DESC top-n larger than the table degrades to the full content
    keys(t.orderBy(col("rowKey").desc).limit(100000)) shouldBe keys(p)
    // MULTI-COLUMN prefix of the file sort order (rowKey, qualifier):
    // uniform ASC and uniform DESC both push (first/last n file rows are
    // the exact 2-column top-n); mixed directions fall back to the sort
    def pairs(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      df.select("rowKey", "qualifier").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val top2 = t.orderBy(col("rowKey"), col("qualifier")).limit(7)
    pairs(top2) shouldBe pairs(p.orderBy(col("rowKey"), col("qualifier")).limit(7))
    top2.queryExecution.executedPlan.toString should
      include("topN=7(rowKey,qualifier ASC)")
    val desc2 = t.orderBy(col("rowKey").desc, col("qualifier").desc).limit(5)
    pairs(desc2) shouldBe
      pairs(p.orderBy(col("rowKey").desc, col("qualifier").desc).limit(5))
    desc2.queryExecution.executedPlan.toString should
      include("topN=5(rowKey,qualifier DESC)")
    val mixed = t.orderBy(col("rowKey"), col("qualifier").desc).limit(5)
    pairs(mixed) shouldBe
      pairs(p.orderBy(col("rowKey"), col("qualifier").desc).limit(5))
    mixed.queryExecution.executedPlan.toString should not include "topN="
    // a non-prefix order (qualifier leading) must also refuse
    val nonPrefix = t.orderBy(col("qualifier")).limit(5)
    nonPrefix.queryExecution.executedPlan.toString should not include "topN="
  }

  test("splitRegionBytes fans a monolith region over byte-range partitions, rows exactly once") {
    // one sorted file with many ~16KB row groups; a split target well
    // under the file size must plan multiple partitions whose union is
    // the exact file (the midpoint rule assigns each row group to one
    // range), while a whole-key algorithm contract is out of scope here
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_split_scan"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    KvGenerator.cells(spark, 6000, 4, "runSp")
      .orderBy("rowKey", "qualifier").coalesce(1)
      .write.option("parquet.block.size", 16 * 1024)
      .mode("overwrite").parquet(d)
    val whole = spark.read.format("graft-kv").load(d)
    val split = spark.read.format("graft-kv")
      .option("splitRegionBytes", 64 * 1024).load(d)
    whole.rdd.getNumPartitions shouldBe 1
    assert(split.rdd.getNumPartitions > 1,
      s"expected intra-file split, got ${split.rdd.getNumPartitions}")
    sortedRows(split) shouldBe sortedRows(whole)
    // pushdown still composes: a filtered split scan equals the plain read
    val p = col("qualifier") === "C2" && col("rowKey") >= "00100"
    sortedRows(split.filter(p)) shouldBe sortedRows(whole.filter(p))
    // limit/top-n plans skip splitting (already O(n) per task)
    val lim = spark.read.format("graft-kv")
      .option("splitRegionBytes", 64 * 1024).load(d).limit(5)
    lim.collect().length shouldBe 5
  }

  test("the DESC tail reader returns the exact file tail across MULTIPLE row groups") {
    // a sorted multi-row-group region file (tiny block size forces several
    // groups), read directly through the tail reader with tail planning on:
    // the byte-range row-group selection plus the ring buffer must surface
    // exactly the file's last n rows
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_tail_groups"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    val cells = KvGenerator.cells(spark, 4000, 4, "runG")
      .orderBy("rowKey", "qualifier").coalesce(1)
    val w = spark.sessionState.newHadoopConf()
    cells.write.option("parquet.block.size", 16 * 1024) // ~16KB row groups
      .mode("overwrite").parquet(d)
    val file = new java.io.File(d).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .head.getAbsolutePath
    val groups = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file), w))
      try r.getRowGroups.size finally r.close()
    }
    assert(groups > 1, s"fixture must span row groups, got $groups")
    val n = 7
    val names = graft.kv.Cell.schema.fieldNames.toSeq
    val reader = new graft.sources.KvTailPartitionReader(
      file, names, names, None, w, n, tailPlan = true)
    val got = scala.collection.mutable.Buffer.empty[String]
    while (reader.next()) {
      val r = reader.get()
      got += r.getUTF8String(0).toString + "|" + r.getUTF8String(2).toString
    }
    reader.close()
    val expect = spark.read.parquet(d)
      .orderBy(col("rowKey").desc, col("qualifier").desc).limit(n)
      .collect().map(r => r.getString(0) + "|" + r.getString(2)).toSeq
    got.sorted.toSeq shouldBe expect.sorted.toSeq
  }

  test("layout certification: compacted tables certify, LSM pile-ups and legacy dirs do not; scan reports order") {
    import graft.sources.KvTableInfo
    // legacy plain-parquet directory: no manifest, nothing certifiable
    KvTableInfo.disjointSortedRegions(spark, dir) shouldBe false
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_source_cert"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    val cells = KvGenerator.cells(spark, 600, 4, "runC2")
    (0 until 2).foreach { i =>
      cells.filter(pmod(col("ts"), lit(2)) === i)
        .write.format("graft-kv").option("regions", 2)
        .mode("append").save(d)
    }
    // overlapping commits: ranges collide, certification refuses
    KvTableInfo.disjointSortedRegions(spark, d) shouldBe false
    graft.sources.KvCompactor.compact(spark, d, regions = 3)
    // compaction restored the disjoint range layout — certified
    KvTableInfo.disjointSortedRegions(spark, d) shouldBe true
    // ...and the ordering REPORT makes a redundant in-partition sort
    // disappear from the plan (per-file (rowKey, qualifier) order is a
    // write-contract fact the scan now tells Catalyst about)
    val sorted = spark.read.format("graft-kv").load(d)
      .sortWithinPartitions("rowKey")
    sorted.collect()
    sorted.queryExecution.executedPlan.toString should not include "Sort "
  }

  test("sinceSeq plans exactly the span's files and reads exactly its commits' cells") {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_source_cdc"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    val cells = KvGenerator.cells(spark, 600, 4, "runS")
    (0 until 3).foreach { i =>
      cells.filter(pmod(col("ts"), lit(3)) === i)
        .write.format("graft-kv").option("regions", 2)
        .mode("append").save(d)
    }
    val inc = spark.read.format("graft-kv").option("sinceSeq", 0).load(d)
    // one partition per committed file of the span: commits 1,2 x 2 regions
    inc.rdd.getNumPartitions shouldBe 4
    sortedRows(inc) shouldBe
      sortedRows(spark.read.format("graft-kv").load(d)
        .filter(pmod(col("ts"), lit(3)) =!= 0))
    // bounded above too: (0, 1] is commit 1 alone
    val span = spark.read.format("graft-kv")
      .option("sinceSeq", 0).option("asOfSeq", 1).load(d)
    span.rdd.getNumPartitions shouldBe 2
    sortedRows(span) shouldBe
      sortedRows(spark.read.format("graft-kv").load(d)
        .filter(pmod(col("ts"), lit(3)) === 1))
    // a legacy directory has no version history to span
    val legacy = s"${sys.props("java.io.tmpdir")}/graft_test/kv_source_cdc_legacy"
    graft.sinks.Sinks.deleteRecursive(spark, legacy)
    cells.limit(10).write.mode("overwrite").parquet(legacy)
    (the[Exception] thrownBy spark.read.format("graft-kv")
      .option("sinceSeq", 0).load(legacy).count())
      .getMessage should include("manifest log")
  }

  test("pruning is observable as scan metrics: plannedRegions < candidateRegions on a ranged scan") {
    val ranged = v2.filter(col("rowKey") >= "00100" && col("rowKey") < "00200")
    ranged.collect()
    val scanExec = ranged.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.getOrElse(fail("no BatchScanExec in the plan"))
    val m = scanExec.metrics
    m("candidateRegions").value shouldBe 8
    assert(m("plannedRegions").value < 8,
      s"expected pruning visible in metrics, got ${m("plannedRegions").value}")
    m("plannedRegions").value shouldBe ranged.rdd.getNumPartitions.toLong
  }

  test("sink codec option lands in the region files; zstd roundtrips and shrinks") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_test/kv_codec"
    val cells = KvGenerator.cells(spark, 3000, 4, "runC")
    def write(codec: String): String = {
      val d = s"${base}_$codec"
      graft.sinks.Sinks.deleteRecursive(spark, d)
      cells.write.format("graft-kv").option("regions", 2)
        .option("codec", codec).mode("overwrite").save(d)
      d
    }
    val conf = spark.sessionState.newHadoopConf()
    def codecOf(d: String): String = {
      val f = new java.io.File(d).listFiles()
        .filter(x => x.getName.startsWith("part-") && x.getName.endsWith(".parquet")).head
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try r.getRowGroups.get(0).getColumns.get(0).getCodec.name() finally r.close()
    }
    def bytesOf(d: String): Long = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val snappy = write("snappy")
    val zstd = write("zstd")
    codecOf(snappy) shouldBe "SNAPPY"
    codecOf(zstd) shouldBe "ZSTD"
    sortedRows(spark.read.format("graft-kv").load(zstd)) shouldBe
      sortedRows(spark.read.format("graft-kv").load(snappy))
    assert(bytesOf(zstd) < bytesOf(snappy),
      s"zstd (${bytesOf(zstd)}) not smaller than snappy (${bytesOf(snappy)})")
    an[Exception] should be thrownBy write("bogus")
  }

  test("write then overwrite truncates instead of accumulating") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_test/kv_sink_truncate"
    graft.sinks.Sinks.deleteRecursive(spark, out)
    val cells = KvGenerator.cells(spark, 300, 2, "runx")
    cells.write.format("graft-kv").option("regions", 3).mode("overwrite").save(out)
    cells.write.format("graft-kv").option("regions", 3).mode("overwrite").save(out)
    spark.read.parquet(out).count() shouldBe cells.count()
  }
}
