package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.kv.KvGenerator

/** [[KvFsck]]: the read-only hbck analog. The oracle query covers the
  * healthy accounting; this spec covers what fsck exists FOR — detecting
  * the states that mean data loss — and that the check itself never
  * mutates the table.
  */
class KvFsckSpec extends graft.SparkSpec {

  private def fsOf(d: String) =
    new Path(d).getFileSystem(spark.sessionState.newHadoopConf())

  private def stage(name: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/$name"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    val cells = KvGenerator.cells(spark, 600, 4, "runF")
    (0 until 2).foreach { i =>
      cells.filter(pmod(col("ts"), lit(2)) === i)
        .write.format("graft-kv").option("regions", 2).mode("append").save(d)
    }
    d
  }

  test("a freshly written table checks healthy, and the check mutates nothing") {
    val d = stage("kv_fsck_healthy")
    val fs = fsOf(d)
    val before = fs.listStatus(new Path(d)).map(s => s.getPath.getName -> s.getLen).toMap
    val r = KvFsck.check(spark, d)
    assert(r.healthy, s"expected healthy, got $r")
    r.liveFiles shouldBe 4
    r.statsCoverage shouldBe 4
    r.orphans shouldBe 0
    fs.listStatus(new Path(d)).map(s => s.getPath.getName -> s.getLen).toMap shouldBe before
  }

  test("a hand-deleted live file is LIVE_MISSING — the data-loss signal") {
    val d = stage("kv_fsck_missing")
    val fs = fsOf(d)
    val victim = KvLog.liveFiles(fs, new Path(d)).head
    fs.delete(new Path(d, victim), false) shouldBe true
    val r = KvFsck.check(spark, d)
    r.liveMissing shouldBe 1
    assert(!r.healthy, "a missing live file must fail the health check")
  }

  test("a reclaimed snapshot-pinned file is SNAPSHOT_MISSING") {
    val d = stage("kv_fsck_snap")
    val fs = fsOf(d)
    KvSnapshot.create(spark, d, "pin")
    // overwrite keeps the pinned originals; delete one behind fsck's back
    KvGenerator.cells(spark, 100, 2, "runF2")
      .write.format("graft-kv").option("regions", 2).mode("overwrite").save(d)
    val pinned = KvSnapshot.referencedFiles(fs, new Path(d))
    fs.delete(new Path(d, pinned.head), false) shouldBe true
    val r = KvFsck.check(spark, d)
    r.snapshotMissing shouldBe 1
    assert(!r.healthy, "a missing pinned file must fail the health check")
  }

  test("repair forgetMissing publishes the removes: scans stop dying, loss is acknowledged") {
    val d = stage("kv_fsck_repair_miss")
    val fs = fsOf(d)
    val table = new Path(d)
    val victim = KvLog.liveFiles(fs, table).head
    val victimRows = spark.read.parquet(s"$d/$victim").count()
    val total = spark.read.format("graft-kv").load(d).count()
    fs.delete(new Path(d, victim), false) shouldBe true
    // un-repaired, a DATA read dies on the phantom partition (a bare
    // count() is metadata-served from the manifest and would not notice)
    an[Exception] should be thrownBy
      spark.read.format("graft-kv").load(d).select("rowKey").collect()
    val r = KvFsck.repair(spark, d, forgetMissing = true)
    r.forgotten shouldBe Seq(victim)
    assert(KvFsck.check(spark, d).healthy)
    spark.read.format("graft-kv").load(d).select("rowKey").collect()
      .length.toLong shouldBe (total - victimRows)
  }

  test("repair adoptOrphans publishes the adds: the orphan's cells become visible") {
    val d = stage("kv_fsck_repair_orph")
    val fs = fsOf(d)
    val table = new Path(d)
    val total = spark.read.format("graft-kv").load(d).count()
    val donor = KvLog.liveFiles(fs, table).head
    val donorRows = spark.read.parquet(s"$d/$donor").count()
    val stray = new Path(d, "part-b9999999999-00000-orph.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(d, donor), fs, stray,
      false, fs.getConf)
    // invisible until adopted (manifest-planned scans ignore strays)
    spark.read.format("graft-kv").load(d).count() shouldBe total
    val r = KvFsck.repair(spark, d, adoptOrphans = true)
    r.adopted shouldBe Seq(stray.getName)
    assert(KvFsck.check(spark, d).healthy)
    KvFsck.check(spark, d).orphans shouldBe 0
    spark.read.format("graft-kv").load(d).count() shouldBe (total + donorRows)
  }

  test("adoption re-stats orphans by scanning: a marker-carrying orphan still masks") {
    val d = stage("kv_fsck_adopt_stats")
    val fs = fsOf(d)
    val table = new Path(d)
    val total = spark.read.format("graft-kv").load(d).count()
    val victimKey = spark.read.format("graft-kv").load(d)
      .select("rowKey").head().getString(0)
    val victimCells = spark.read.format("graft-kv").load(d)
      .filter(col("rowKey") === victimKey).count()
    // simulate a CRASHED delete-marker commit: the marker segment reached
    // disk but its manifest entry never published — stage the markers in a
    // scratch table, then copy the sealed file in as an unreferenced stray
    import spark.implicits._
    val scratch = s"${sys.props("java.io.tmpdir")}/graft_test/kv_fsck_adopt_src"
    graft.sinks.Sinks.deleteRecursive(spark, scratch)
    KvDelete.deleteRows(spark, scratch, Seq(victimKey).toDF("rowKey"))
    val sfs = fsOf(scratch)
    val markerFile = KvLog.liveFiles(sfs, new Path(scratch)).head
    val stray = new Path(d, "part-b9999999998-00000-tomb.parquet")
    org.apache.hadoop.fs.FileUtil.copy(sfs, new Path(scratch, markerFile),
      fs, stray, false, fs.getConf)
    spark.read.format("graft-kv").load(d).count() shouldBe total // invisible
    val r = KvFsck.repair(spark, d, adoptOrphans = true)
    r.adopted shouldBe Seq(stray.getName)
    // the adopted entry carries RECOMPUTED stats — tombstone count included,
    // so the read path's masking gate sees the markers
    val st = KvLog.liveFileStats(fs, table)(stray.getName)
    st.rows shouldBe 1L
    st.tombstones shouldBe 1L
    assert(st.minKey.contains(victimKey) && st.maxKey.contains(victimKey))
    KvFsck.check(spark, d).liveTombstones shouldBe 1
    // plain scans MASK: the victim's cells vanish and no raw marker row
    // (reserved \\u0000-prefix qualifier) ever surfaces
    val visible = spark.read.format("graft-kv").load(d)
      .select("rowKey", "qualifier").collect()
    visible.length.toLong shouldBe (total - victimCells)
    assert(!visible.exists(_.getString(0) == victimKey), "victim masked")
    assert(!visible.exists(r => Option(r.getString(1)).exists(_.startsWith("\u0000"))),
      "no raw marker rows on a masked scan")
  }

  test("repair dropBrokenSnapshots releases only the unreadable pin") {
    val d = stage("kv_fsck_repair_snap")
    val fs = fsOf(d)
    KvSnapshot.create(spark, d, "broken")
    KvGenerator.cells(spark, 100, 2, "runF4")
      .write.format("graft-kv").option("regions", 2).mode("overwrite").save(d)
    KvSnapshot.create(spark, d, "intact") // pins the new live set
    val pinned = KvSnapshot.get(fs, new Path(d), "broken").get.files.map(_._1)
    fs.delete(new Path(d, pinned.head), false) shouldBe true
    val r = KvFsck.repair(spark, d, dropBrokenSnapshots = true)
    r.droppedSnapshots shouldBe Seq("broken")
    KvSnapshot.list(fs, new Path(d)).map(_.name) shouldBe Seq("intact")
    assert(KvFsck.check(spark, d).healthy)
  }

  test("a dead tail's mark gates compaction; fsck surfaces it and DropTail releases it") {
    val d = stage("kv_fsck_tail")
    val fs = fsOf(d)
    val table = new Path(d)
    // a corrupt mark (crashed recordTail) reads as the conservative
    // position 0 — compaction must park below it, not merge past it
    val tailsDir = new Path(new Path(table, KvLog.LogDirName), "_tails")
    fs.mkdirs(tailsDir)
    val out = fs.create(new Path(tailsDir, "dead"), true)
    out.write("garbage".getBytes("UTF-8")); out.close()
    KvFsck.check(spark, d).tailMarks shouldBe 1
    KvCompactor.compact(spark, d, regions = 2) match {
      case KvCompactor.Parked(reason) => reason should include("gate compaction")
      case other => fail(s"expected the dead tail to park compaction, got $other")
    }
    KvLog.dropTail(fs, table, "dead") shouldBe true
    KvFsck.check(spark, d).tailMarks shouldBe 0
    KvCompactor.compact(spark, d, regions = 2) shouldBe a[KvCompactor.Compacted]
  }

  test("deep check cross-verifies footers: a truncated data file is flagged, a clean table is not") {
    val d = stage("kv_fsck_deep")
    KvFsck.deepCheck(spark, d) shouldBe KvFsck.DeepReport(4, 0, 0)
    // corrupt one live file by truncating its bytes (a torn upload): the
    // metadata-only check still passes — only the deep check can see it
    val fs = fsOf(d)
    val victim = new Path(d, KvLog.liveFiles(fs, new Path(d)).head)
    val bytes = {
      val in = fs.open(victim)
      try { val b = new Array[Byte](100); in.readFully(b); b } finally in.close()
    }
    val out = fs.create(victim, true)
    try out.write(bytes) finally out.close()
    assert(KvFsck.check(spark, d).healthy, "metadata check cannot see byte rot")
    val deep = KvFsck.deepCheck(spark, d)
    deep.checked shouldBe 4
    (deep.rowMismatches + deep.unreadable) shouldBe 1
    assert(!deep.healthy)
  }

  test("a legacy directory without a manifest is refused, not guessed at") {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_fsck_legacy"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    graft.kv.RangeLayout.layout(KvGenerator.cells(spark, 200, 2, "runF3"), 2)
      .write.mode("overwrite").parquet(d)
    an[IllegalArgumentException] should be thrownBy KvFsck.check(spark, d)
  }
}
