package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kv.KvGenerator

/** [[KvVacuum]]: GC of manifest-unreferenced files — deletes exactly the
  * crash leftovers (stray data files, compaction scratch dirs) and nothing
  * the manifest references; the grace period shields in-flight commits; a
  * legacy directory (no manifest) is refused, never guessed at.
  */
class KvVacuumSpec extends graft.SparkSpec {

  private lazy val cells: DataFrame = KvGenerator.cells(spark, 200, 4, "runV").cache()

  private def pileUp(name: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/$name"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    (0 until 2).foreach { i =>
      cells.filter(pmod(col("ts"), lit(2)) === i)
        .write.format("graft-kv").option("regions", 2)
        .mode("append").save(d)
    }
    d
  }

  private def fsOf(d: String) =
    new Path(d).getFileSystem(spark.sessionState.newHadoopConf())

  private def age(d: String, name: String): Unit =
    fsOf(d).setTimes(new Path(d, name), 1000L, -1)

  test("vacuum deletes expired stray files and scratch dirs; every manifest-referenced file survives") {
    val d = pileUp("kv_vac_basic")
    val fs = fsOf(d)
    val n = spark.read.format("graft-kv").load(d).count()
    val live = KvLog.liveFiles(fs, new Path(d))
    // crash leftovers: an unpublished compaction output + its scratch dir
    val stray = "part-c0000000009-00000.parquet"
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(d, live.head), fs,
      new Path(d, stray), false, fs.getConf)
    fs.mkdirs(new Path(d, "_compact_dead01"))
    age(d, stray); age(d, "_compact_dead01")
    val res = KvVacuum.vacuum(spark, d, graceMs = 0)
    res match {
      case KvVacuum.Vacuumed(files, bytes, dirs, _, _) =>
        files shouldBe 1; dirs shouldBe 1; bytes should be > 0L
      case r => fail(s"expected Vacuumed, got $r")
    }
    fs.exists(new Path(d, stray)) shouldBe false
    fs.exists(new Path(d, "_compact_dead01")) shouldBe false
    live.foreach(f => fs.exists(new Path(d, f)) shouldBe true)
    spark.read.format("graft-kv").load(d).count() shouldBe n
  }

  test("a crashed writer's _tmp_ staging is reclaimed; one still being written to survives") {
    val d = pileUp("kv_vac_tmp")
    val fs = fsOf(d)
    // dead staging: a batch writer hard-killed mid-write (owner cleans up
    // on both commit and abort, so an old _tmp_ dir is orphaned)
    fs.mkdirs(new Path(d, "_tmp_deadbeef"))
    val f = fs.create(new Path(d, "_tmp_deadbeef/part-r-00000-1.parquet"))
    f.write(Array[Byte](1, 2, 3)); f.close()
    age(d, "_tmp_deadbeef"); age(d, "_tmp_deadbeef/part-r-00000-1.parquet")
    // live staging: the DIR is old but a file inside is fresh — a write
    // that has been running longer than the grace must not lose its files
    fs.mkdirs(new Path(d, "_tmp_alive001"))
    age(d, "_tmp_alive001")
    val g = fs.create(new Path(d, "_tmp_alive001/part-r-00000-2.parquet"))
    g.write(Array[Byte](1)); g.close()
    KvVacuum.vacuum(spark, d, graceMs = 60 * 1000) match {
      case v: KvVacuum.Vacuumed => v.scratchDirs shouldBe 1
      case r => fail(s"expected Vacuumed, got $r")
    }
    fs.exists(new Path(d, "_tmp_deadbeef")) shouldBe false
    fs.exists(new Path(d, "_tmp_alive001/part-r-00000-2.parquet")) shouldBe true
  }

  test("the grace period shields young files: a just-renamed commit in flight is never deleted") {
    val d = pileUp("kv_vac_grace")
    val fs = fsOf(d)
    val stray = "part-c0000000009-00000.parquet"
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new Path(d, KvLog.liveFiles(fs, new Path(d)).head), fs,
      new Path(d, stray), false, fs.getConf)
    KvVacuum.vacuum(spark, d, graceMs = 3600 * 1000) shouldBe
      KvVacuum.Vacuumed(0, 0, 0)
    fs.exists(new Path(d, stray)) shouldBe true
  }

  test("a legacy directory is refused: without a manifest, unreferenced is undefined") {
    val legacy = s"${sys.props("java.io.tmpdir")}/graft_test/kv_vac_legacy"
    graft.sinks.Sinks.deleteRecursive(spark, legacy)
    cells.limit(10).write.mode("overwrite").parquet(legacy)
    KvVacuum.vacuum(spark, legacy, graceMs = 0) match {
      case KvVacuum.Skipped(reason) => reason should include("manifest")
      case r => fail(s"expected Skipped, got $r")
    }
  }

  test("merged-away segments get grace from the REMOVING ENTRY's publish, not their own mtime") {
    val d = pileUp("kv_vac_compact")
    val fs = fsOf(d)
    val table = new Path(d)
    val before = KvLog.liveFiles(fs, table)
    // age the segments to look days old BEFORE compaction: a vacuum keying
    // grace off file mtime would delete them the instant they're removed,
    // racing in-flight scans planned pre-publish
    before.foreach(age(d, _))
    val seq = KvCompactor.compact(spark, d, regions = 2) match {
      case KvCompactor.Compacted(s, merged, _, _) => merged shouldBe 4; s
      case r => fail(s"expected Compacted, got $r")
    }
    val n = spark.read.format("graft-kv").load(d).count()
    // just-removed (entry published milliseconds ago): a full grace window
    // shields the old-mtime originals
    KvVacuum.vacuum(spark, d, graceMs = 3600 * 1000) shouldBe
      KvVacuum.Vacuumed(0, 0, 0)
    before.foreach(f => fs.exists(new Path(d, f)) shouldBe true)
    // removal grace expired (entry backdated): exactly the originals go
    KvLog.backdateEntry(fs, table, seq, 1000L)
    KvVacuum.vacuum(spark, d, graceMs = 3600 * 1000) match {
      case v: KvVacuum.Vacuumed => v.deletedFiles shouldBe 4
      case r => fail(s"expected Vacuumed, got $r")
    }
    before.foreach(f => fs.exists(new Path(d, f)) shouldBe false)
    spark.read.format("graft-kv").load(d).count() shouldBe n
  }
}
