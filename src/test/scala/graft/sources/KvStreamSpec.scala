package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.connector.read.streaming.ReadLimit

import graft.kv.{Cell, KvGenerator, RangeLayout}

/** The `graft-kv` micro-batch tail ([[KvTailStream]]): WAL-segment replay
  * order, admission control, checkpoint resume, and the reuse of the batch
  * scan's pushdown/pruning surface. In `graft.sources` so the offset logic
  * can be unit-driven without a running query.
  */
class KvStreamSpec extends graft.SparkSpec {

  /** Move the single part file of each chunk into `dir` under a
    * lexicographically increasing segment name (the WAL sequence-id
    * convention the tail documents).
    */
  private def stageSegments(dir: String, chunks: Seq[DataFrame], startIdx: Int = 0): Unit = {
    Files.createDirectories(Paths.get(dir))
    chunks.zipWithIndex.foreach { case (df, i) =>
      val tmp = s"${dir}_tmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head
      Files.move(part.toPath,
        Paths.get(dir, f"part-${startIdx + i}%05d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      graft.sinks.Sinks.deleteRecursive(spark, tmp)
    }
  }

  private lazy val allCells: DataFrame =
    KvGenerator.cells(spark, 500, 4, "runS").cache()

  /** 4 ts-range WAL segments of the generator cells. */
  private lazy val walDir: String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_wal_segments"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    val n = allCells.count()
    val perSeg = (n / 4) + 1
    val chunks = (0 until 4).map { i =>
      allCells.filter(col("ts") >= i * perSeg && col("ts") < (i + 1) * perSeg)
    }
    stageSegments(d, chunks)
    d
  }

  private def tailStream(dir: String, maxFiles: Int = 1): DataFrame =
    spark.readStream.format("graft-kv")
      .option("maxFilesPerBatch", maxFiles).load(dir)

  private def runAvailableNow(df: DataFrame, name: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = df.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow())
    val q = checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
    q.awaitTermination()
    q
  }

  test("AvailableNow + maxFilesPerBatch=1 replays one WAL segment per micro-batch") {
    val q = runAvailableNow(
      tailStream(walDir).groupBy(col("qualifier")).count(), "kv_tail_counts")
    val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
    dataBatches.length shouldBe 4
    q.recentProgress.map(_.numInputRows).sum shouldBe allCells.count()
    // complete-mode final state equals the batch aggregate
    val got = spark.table("kv_tail_counts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = allCells.groupBy(col("qualifier")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe want
  }

  test("qualifier scope option is enforced inside the source (numInputRows, not a residual)") {
    // Catalyst's V2 filter pushdown only rewrites BATCH scan relations; a
    // stream scopes itself via options (the replication-peer-config analog).
    val scoped = spark.readStream.format("graft-kv")
      .option("maxFilesPerBatch", 4).option("qualifier", "C2").load(walDir)
    val q = runAvailableNow(
      scoped.groupBy(col("rowKey")).count(), "kv_tail_filtered")
    val emitted = q.recentProgress.map(_.numInputRows).sum
    val matching = allCells.filter(col("qualifier") === "C2").count()
    emitted shouldBe matching // an un-scoped source would have emitted all rows
    matching should be < allCells.count()
    spark.table("kv_tail_filtered").count() shouldBe
      allCells.filter(col("qualifier") === "C2").select("rowKey").distinct().count()
  }

  test("scope options work identically on the batch read") {
    val scoped = spark.read.format("graft-kv")
      .option("qualifier", "C2").option("minRowKey", "00100")
      .option("maxRowKey", "00200").load(walDir)
    val want = allCells.filter(col("qualifier") === "C2" &&
      col("rowKey") >= "00100" && col("rowKey") < "00200")
    scoped.count() shouldBe want.count()
    scoped.queryExecution.executedPlan.toString should include("EqualTo(qualifier,C2)")
  }

  test("checkpoint resume: a restart consumes only segments appended after the last offset") {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_wal_resume"
    val cp = s"${sys.props("java.io.tmpdir")}/graft_test/kv_wal_resume_cp"
    Seq(d, cp).foreach(graft.sinks.Sinks.deleteRecursive(spark, _))
    val n = allCells.count()
    val perSeg = (n / 4) + 1
    val chunks = (0 until 4).map { i =>
      allCells.filter(col("ts") >= i * perSeg && col("ts") < (i + 1) * perSeg)
    }
    stageSegments(d, chunks.take(3))
    val agg = tailStream(d).groupBy(col("qualifier")).count()
    val q1 = runAvailableNow(agg, "kv_tail_resume", Some(cp))
    q1.recentProgress.filter(_.numInputRows > 0).length shouldBe 3
    // seal a new segment AFTER the consumed watermark, restart from checkpoint
    stageSegments(d, Seq(chunks(3)), startIdx = 3)
    val q2 = runAvailableNow(agg, "kv_tail_resume", Some(cp))
    val resumed = q2.recentProgress.filter(_.numInputRows > 0)
    resumed.length shouldBe 1
    resumed.head.numInputRows shouldBe chunks(3).count()
    // and the recovered complete-mode state covers ALL segments
    spark.table("kv_tail_resume").agg(sum(col("count"))).collect()(0).getLong(0) shouldBe n
  }

  test("offset watermark is the last consumed segment name; admission caps each batch") {
    val stream = new KvTailStream(walDir, Cell.schema, Array.empty, Some(1))
    stream.prepareForTriggerAvailableNow()
    val start = stream.initialOffset()
    val o1 = stream.latestOffset(start, ReadLimit.maxFiles(1))
    o1.asInstanceOf[KvWalOffset].watermark shouldBe "part-00000.parquet"
    stream.planInputPartitions(start, o1).length shouldBe 1
    val o2 = stream.latestOffset(o1, ReadLimit.maxFiles(1))
    o2.asInstanceOf[KvWalOffset].watermark shouldBe "part-00001.parquet"
    // round-trip through the offset log
    stream.deserializeOffset(o2.json()) shouldBe o2
    // drained: latestOffset returns start unchanged
    val o3 = stream.latestOffset(stream.deserializeOffset("part-00003.parquet"),
      ReadLimit.maxFiles(1))
    o3.asInstanceOf[KvWalOffset].watermark shouldBe "part-00003.parquet"
  }

  test("streaming sink seals sorted epoch segments; tail→sink is a working replication pipe") {
    val dst = s"${sys.props("java.io.tmpdir")}/graft_test/kv_pipe_dst"
    val cp = s"${sys.props("java.io.tmpdir")}/graft_test/kv_pipe_cp"
    Seq(dst, cp).foreach(graft.sinks.Sinks.deleteRecursive(spark, _))
    val q = tailStream(walDir, maxFiles = 1).writeStream
      .format("graft-kv").option("regions", 2)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start(dst)
    q.awaitTermination()
    // landed table equals the source table
    val landed = spark.read.format("graft-kv").load(dst)
    landed.count() shouldBe allCells.count()
    landed.select(sum(col("ts"))).collect()(0).getLong(0) shouldBe
      allCells.select(sum(col("ts"))).collect()(0).getLong(0)
    // segment names are deterministic per (epoch, region) and epoch-monotone
    val names = new java.io.File(dst).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).sorted
    all(names) should fullyMatch regex "part-e\\d{10}-\\d{5}\\.parquet"
    names.map(_.substring(6, 16)).distinct.length shouldBe 4 // one epoch per segment
    // each sealed segment honors the sink's (rowKey, qualifier) sort contract
    import spark.implicits._
    names.take(2).foreach { f =>
      val keys = spark.read.parquet(s"$dst/$f")
        .select(col("rowKey"), col("qualifier")).as[(String, String)].collect().toSeq
      keys shouldBe keys.sorted
    }
    // and the landed table itself can be tailed (pipe composes)
    val q2 = runAvailableNow(
      tailStream(dst, maxFiles = 100).groupBy(col("family")).count(), "kv_pipe_retail")
    spark.table("kv_pipe_retail").collect().map(_.getLong(1)).sum shouldBe allCells.count()
    q2.recentProgress.filter(_.numInputRows > 0).length should be >= 1
  }

  test("scan statistics are pruning-aware: a key-range scan reports only kept regions") {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_stats_ranged"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    RangeLayout.layout(allCells, 8).write.mode("overwrite").parquet(d)
    val full = new KvScan(d, Cell.schema, Array.empty)
    val fullStats = full.estimateStatistics()
    fullStats.numRows().getAsLong shouldBe allCells.count()
    val pushed: Array[org.apache.spark.sql.sources.Filter] = Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("rowKey", "00100"),
      org.apache.spark.sql.sources.LessThan("rowKey", "00200"))
    val ranged = new KvScan(d, Cell.schema, pushed)
    val rangedStats = ranged.estimateStatistics()
    assert(rangedStats.sizeInBytes().getAsLong < fullStats.sizeInBytes().getAsLong,
      "pruned scan must report a smaller size than the full table")
    assert(rangedStats.numRows().getAsLong < fullStats.numRows().getAsLong)
    rangedStats.sizeInBytes().getAsLong should be > 0L
  }

  test("rowKey bounds prune WAL segments from a batch's partition list") {
    // key-ranged segments (the sorted region layout): pruning has something
    // to cut only when segments carry disjoint key ranges
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_wal_ranged"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    RangeLayout.layout(allCells, 8).write.mode("overwrite").parquet(d)
    val pushed: Array[org.apache.spark.sql.sources.Filter] = Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("rowKey", "00100"),
      org.apache.spark.sql.sources.LessThan("rowKey", "00200"))
    val stream = new KvTailStream(d, Cell.schema, pushed, None)
    val start = stream.initialOffset()
    val end = stream.latestOffset(start, ReadLimit.allAvailable())
    val parts = stream.planInputPartitions(start, end)
    assert(parts.length < 8, s"expected segment pruning, got ${parts.length}/8")
    assert(parts.nonEmpty)
  }
}
