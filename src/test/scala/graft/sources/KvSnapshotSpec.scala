package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.kv.KvGenerator

/** Named snapshots ([[KvSnapshot]] — the HBase snapshot/restore cycle):
  * create pins the live set in a self-contained manifest, reads plan from
  * it, vacuum never reclaims pinned files, restore rolls back with one
  * metadata commit, drop releases the pin.
  */
class KvSnapshotSpec extends graft.SparkSpec {

  private def freshTable(name: String, epochs: Int): (String, Long) = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/$name"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    val cells = KvGenerator.cells(spark, 300, 4, s"run$name")
    (0 until epochs).foreach { i =>
      cells.filter(pmod(floor(col("ts") / 10).cast("long"), lit(epochs)) === i)
        .write.format("graft-kv").option("regions", 1).mode("append").save(d)
    }
    (d, cells.count())
  }

  private def fsOf(d: String) =
    new Path(d).getFileSystem(spark.sessionState.newHadoopConf())

  test("a snapshot read returns the pinned state across appends, compaction, and vacuum") {
    val (d, n0) = freshTable("kv_snap_read", epochs = 3)
    val before = spark.read.format("graft-kv").load(d)
      .agg(bit_xor(xxhash64(col("rowKey"), col("qualifier"), col("ts"))))
      .collect()(0).getLong(0)
    KvSnapshot.create(spark, d, "v1").files should have size 3
    // mutate hard: more appends, a major compaction, an aggressive vacuum
    KvGenerator.cells(spark, 100, 2, "runJunk")
      .write.format("graft-kv").option("regions", 1).mode("append").save(d)
    KvCompactor.compact(spark, d, regions = 2) shouldBe a[KvCompactor.Compacted]
    KvVacuum.vacuum(spark, d, graceMs = 0) shouldBe a[KvVacuum.Vacuumed]
    val snap = spark.read.format("graft-kv").option("snapshot", "v1").load(d)
    snap.count() shouldBe n0
    snap.agg(bit_xor(xxhash64(col("rowKey"), col("qualifier"), col("ts"))))
      .collect()(0).getLong(0) shouldBe before
    // the live read reflects the mutations, unaffected by the snapshot
    spark.read.format("graft-kv").load(d).count() should be > n0
  }

  test("vacuum skips snapshot-pinned files; drop releases them for reclamation") {
    val (d, _) = freshTable("kv_snap_vacuum", epochs = 3)
    val fs = fsOf(d)
    val pinned = KvSnapshot.create(spark, d, "pin").files.map(_._1)
    KvCompactor.compact(spark, d, regions = 1) shouldBe a[KvCompactor.Compacted]
    KvVacuum.vacuum(spark, d, graceMs = 0)
    pinned.foreach(f => assert(fs.exists(new Path(d, f)), s"$f was reclaimed"))
    KvSnapshot.drop(spark, d, "pin") shouldBe true
    KvVacuum.vacuum(spark, d, graceMs = 0)
    pinned.foreach(f => assert(!fs.exists(new Path(d, f)), s"$f survived drop"))
    // the live (compacted) table is untouched either way
    spark.read.format("graft-kv").load(d).count() should be > 0L
  }

  test("restore rolls the table back with one metadata commit and preserves history") {
    val (d, n0) = freshTable("kv_snap_restore", epochs = 2)
    val fs = fsOf(d)
    KvSnapshot.create(spark, d, "golden")
    val junk = KvGenerator.cells(spark, 150, 2, "runBad")
    junk.write.format("graft-kv").option("regions", 1).mode("append").save(d)
    val preRestoreSeq = KvLog.latestSeq(fs, new Path(d))
    spark.read.format("graft-kv").load(d).count() shouldBe n0 + junk.count()
    val seq = KvSnapshot.restore(spark, d, "golden")
    seq shouldBe preRestoreSeq + 1
    spark.read.format("graft-kv").load(d).count() shouldBe n0
    // the restore entry is a checkpoint: replay anchors there
    KvLog.horizon(fs, new Path(d)) shouldBe seq
    // history preserved — the pre-restore version still reads by seq
    spark.read.format("graft-kv").option("asOfSeq", preRestoreSeq.toString)
      .load(d).count() shouldBe n0 + junk.count()
  }

  test("snapshots outlive log truncation (self-contained manifest, no replay)") {
    val (d, n0) = freshTable("kv_snap_trunc", epochs = 3)
    val fs = fsOf(d)
    val table = new Path(d)
    KvSnapshot.create(spark, d, "keep")
    // a compaction writes the pending-carrying checkpoint truncation needs,
    // then zero-retention truncation drops the whole pre-floor prefix
    KvCompactor.compact(spark, d, regions = 1) shouldBe a[KvCompactor.Compacted]
    KvLog.truncate(fs, table, retentionMs = 0) should be > 0
    spark.read.format("graft-kv").option("snapshot", "keep").load(d)
      .count() shouldBe n0
  }

  test("lifecycle guards: duplicate create, unknown restore, invalid names, streaming") {
    val (d, _) = freshTable("kv_snap_guard", epochs = 2)
    KvSnapshot.create(spark, d, "one")
    an[IllegalArgumentException] should be thrownBy
      KvSnapshot.create(spark, d, "one")
    an[IllegalArgumentException] should be thrownBy
      KvSnapshot.restore(spark, d, "never-made")
    an[IllegalArgumentException] should be thrownBy
      KvSnapshot.create(spark, d, "../escape")
    an[IllegalArgumentException] should be thrownBy
      spark.read.format("graft-kv").option("snapshot", "one")
        .option("asOfSeq", "0").load(d).collect()
    KvSnapshot.drop(spark, d, "never-made") shouldBe false
  }
}
