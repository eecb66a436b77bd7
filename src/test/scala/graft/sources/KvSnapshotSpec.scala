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

  test("snapshots survive mode(overwrite): pinned files and _snapshots outlive the truncate") {
    val (d, n0) = freshTable("kv_snap_overwrite", epochs = 2)
    val before = spark.read.format("graft-kv").load(d)
      .agg(bit_xor(xxhash64(col("rowKey"), col("qualifier"), col("ts"))))
      .collect()(0).getLong(0)
    KvSnapshot.create(spark, d, "preserve")
    val fresh = KvGenerator.cells(spark, 80, 2, "runNew")
    fresh.write.format("graft-kv").option("regions", 1).mode("overwrite").save(d)
    // the live table is ONLY the overwrite's data…
    spark.read.format("graft-kv").load(d).count() shouldBe fresh.count()
    // …but the pinned state still reads and still restores
    val snap = spark.read.format("graft-kv").option("snapshot", "preserve").load(d)
    snap.count() shouldBe n0
    snap.agg(bit_xor(xxhash64(col("rowKey"), col("qualifier"), col("ts"))))
      .collect()(0).getLong(0) shouldBe before
    KvSnapshot.restore(spark, d, "preserve")
    spark.read.format("graft-kv").load(d).count() shouldBe n0
  }

  test("cloneTo materializes an independent table with stats carried") {
    val (d, n0) = freshTable("kv_snap_clonesrc", epochs = 3)
    val dest = s"${sys.props("java.io.tmpdir")}/graft_test/kv_snap_clonedst"
    graft.sinks.Sinks.deleteRecursive(spark, dest)
    val info = KvSnapshot.create(spark, d, "fork")
    KvSnapshot.cloneTo(spark, d, "fork", dest)
    val clone = spark.read.format("graft-kv").load(dest)
    clone.count() shouldBe n0
    // the clone's manifest carries the snapshot's stats: metadata-served
    // planning works from the first read
    val dfs = fsOf(dest)
    KvLog.liveFileStats(dfs, new Path(dest)).keySet shouldBe
      info.files.map(_._1).toSet
    // independence both ways: mutate the clone, the source is untouched
    KvGenerator.cells(spark, 50, 2, "runCl")
      .write.format("graft-kv").option("regions", 1).mode("append").save(dest)
    KvCompactor.compact(spark, dest, regions = 1) shouldBe a[KvCompactor.Compacted]
    KvVacuum.vacuum(spark, dest, graceMs = 0)
    spark.read.format("graft-kv").load(d).count() shouldBe n0
    // non-empty destination refused
    an[IllegalArgumentException] should be thrownBy
      KvSnapshot.cloneTo(spark, d, "fork", dest)
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
