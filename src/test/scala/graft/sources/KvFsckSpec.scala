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

  test("a legacy directory without a manifest is refused, not guessed at") {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_fsck_legacy"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    graft.kv.RangeLayout.layout(KvGenerator.cells(spark, 200, 2, "runF3"), 2)
      .write.mode("overwrite").parquet(d)
    an[IllegalArgumentException] should be thrownBy KvFsck.check(spark, d)
  }
}
