package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.kv.KvGenerator

/** Round-12 hardening of the log lifecycle: migration-shaped directories
  * refuse the implicit seed instead of silently orphaning files, and the
  * sinceSeq read validates its upper bound like changedFiles always did.
  */
class KvLogHardeningSpec extends graft.SparkSpec {

  private def tmp(name: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/$name"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    d
  }

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  test("a data-only migration (sink-named files, no _log) refuses the implicit seed loudly") {
    val src = tmp("kv_hard_migr_src")
    val dst = tmp("kv_hard_migr_dst")
    KvGenerator.cells(spark, 500, 2, "hard1")
      .write.format("graft-kv").option("regions", 2).mode("overwrite").save(src)
    // Copy the DATA ONLY — the plausible "rsync the parquet, forget _log"
    // migration. The first commit must refuse, not silently orphan.
    val fs = fsOf(src)
    fs.mkdirs(new Path(dst))
    fs.listStatus(new Path(src)).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { st =>
        org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
          new Path(dst, st.getPath.getName), false, true,
          spark.sessionState.newHadoopConf())
      }
    val e = intercept[Exception] {
      KvGenerator.cells(spark, 10, 1, "hard2")
        .write.format("graft-kv").option("regions", 1).mode("append").save(dst)
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    messages should include("no manifest log")
    messages should include("adoptOrphans")
    // Nothing was committed: the directory still has no manifest.
    assert(!KvLog.exists(fs, new Path(dst)))
  }

  test("foreign (plain-parquet) files still seed into the first commit's manifest") {
    val d = tmp("kv_hard_foreign")
    val cells = KvGenerator.cells(spark, 300, 2, "hard3")
    cells.limit(100).write.mode("overwrite").parquet(d)
    val before = spark.read.parquet(d).count()
    cells.limit(50).write.format("graft-kv").option("regions", 1)
      .mode("append").save(d)
    val total = spark.read.format("graft-kv").load(d).count()
    assert(total == before + 50,
      s"expected foreign $before + appended 50, got $total")
  }

  test("commit paths create _log before any rename: a mid-commit dir never looks like a migration") {
    val d = tmp("kv_hard_logfirst")
    KvGenerator.cells(spark, 100, 1, "hard4")
      .write.format("graft-kv").option("regions", 1).mode("append").save(d)
    val fs = fsOf(d)
    assert(KvLog.exists(fs, new Path(d)))
    // A second append over the sink-named file + existing log is the
    // normal path — seeding is skipped entirely, no refusal.
    KvGenerator.cells(spark, 100, 1, "hard5")
      .write.format("graft-kv").option("regions", 1).mode("append").save(d)
    assert(KvLog.latestSeq(fs, new Path(d)) == 1L)
  }

  test("sinceSeq with asOfSeq beyond the log end errors instead of returning a silent partial span") {
    val d = tmp("kv_hard_since")
    val cells = KvGenerator.cells(spark, 200, 2, "hard6")
    (0 until 2).foreach { i =>
      cells.filter(pmod(col("ts"), lit(2)) === i)
        .write.format("graft-kv").option("regions", 1).mode("append").save(d)
    }
    // latest seq is 1; asOfSeq 7 names a version that never existed.
    val e = intercept[Exception] {
      spark.read.format("graft-kv").option("sinceSeq", 0)
        .option("asOfSeq", 7).load(d).count()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    messages should include("outside")
    // The valid span still works.
    val n = spark.read.format("graft-kv").option("sinceSeq", 0)
      .option("asOfSeq", 1).load(d).count()
    assert(n > 0)
  }

  // --- movePublish (the link-hostile publish fallback) -------------------

  private def writeTmp(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      text: String): Unit = {
    val out = fs.create(p, true)
    out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  test("movePublish with no racer publishes the bytes and reports the win") {
    val d = tmp("kv_hard_movepub")
    val fs = fsOf(d)
    fs.mkdirs(new Path(d))
    val t = new Path(d, "e.tmp"); val target = new Path(d, "e.json")
    writeTmp(fs, t, "entry-bytes")
    assert(KvLog.movePublish(fs, t, target))
    assert(KvLog.readText(fs, target) == "entry-bytes")
  }

  test("movePublish onto a racer's published target reports the lost race and keeps the racer's bytes") {
    val d = tmp("kv_hard_movepub_race")
    val fs = fsOf(d)
    fs.mkdirs(new Path(d))
    val t = new Path(d, "e.tmp"); val target = new Path(d, "e.json")
    writeTmp(fs, target, "racer-bytes")
    writeTmp(fs, t, "loser-bytes")
    assert(!KvLog.movePublish(fs, t, target))
    assert(KvLog.readText(fs, target) == "racer-bytes")
  }

  test("a read-back failure after a successful move stays a WIN (a transient read must not demote a published entry)") {
    // The misreport direction is the corruption one: a committer whose
    // entry IS live but who reports "lost race" discards the replacement
    // files its own manifest entry references. Simulate the stale-handle
    // store: the target becomes unreadable right after the move.
    val d = tmp("kv_hard_movepub_stale")
    val real = fsOf(d)
    real.mkdirs(new Path(d))
    val t = new Path(d, "e.tmp"); val target = new Path(d, "e.json")
    writeTmp(real, t, "entry-bytes")
    val failing = new org.apache.hadoop.fs.FilterFileSystem(real) {
      override def open(f: Path, bufferSize: Int)
          : org.apache.hadoop.fs.FSDataInputStream =
        if (f.getName == target.getName && fs.exists(f))
          throw new java.io.IOException("simulated stale NFS handle")
        else super.open(f, bufferSize)
    }
    assert(KvLog.movePublish(failing, t, target),
      "a successful move with an unreadable target must stay a win")
    assert(KvLog.readText(real, target) == "entry-bytes",
      "the entry really was published")
  }
}
