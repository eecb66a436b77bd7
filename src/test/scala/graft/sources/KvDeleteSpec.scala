package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[KvDelete]]: row/column tombstones as first-class connector
  * operations — committed like writes, masking every subsequent scan at
  * read time, purged physically by major compaction. The HBase
  * delete-marker contract, end to end.
  */
class KvDeleteSpec extends graft.SparkSpec {

  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/$name"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    d
  }

  private def fs = new Path("/").getFileSystem(spark.sessionState.newHadoopConf())

  private def cells(rows: (String, String, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))

  /** 40 keys × (a@10, a@30, b@10). */
  private def baseRows: Seq[(String, String, String, String, Long)] =
    (1 to 40).flatMap { i =>
      val k = f"k$i%02d"
      Seq((k, "f", "a", s"a$i", 10L), (k, "f", "a", s"A$i", 30L),
        (k, "f", "b", s"b$i", 10L))
    }

  private def readable(df: DataFrame): Set[(String, String, String, String, Long)] =
    df.select(col("rowKey"), col("family"), col("qualifier"),
        decode(col("value"), "UTF-8").as("v"), col("ts"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet

  private def scan(d: String): DataFrame =
    spark.read.format("graft-kv").load(d)

  test("row + column + ts-bounded deletes mask every subsequent scan; newer writes survive") {
    val d = tmp("kv_del_mask")
    cells(baseRows: _*).write.format("graft-kv").option("regions", 2)
      .mode("append").save(d)
    // k01,k02: full row erasure. k06: row delete AS OF ts 15 — the a@30
    // version survives. (k07,f,b): column delete — a-cells untouched.
    KvDelete.deleteRows(spark, d, Seq("k01", "k02").toDF("rowKey"))
    KvDelete.deleteRows(spark, d, Seq("k06").toDF("rowKey"), defaultTs = 15L)
    KvDelete.deleteColumns(spark, d,
      Seq(("k07", "f", "b")).toDF("rowKey", "family", "qualifier"))
    val expected = baseRows.filter { case (k, _, q, _, ts) =>
      k != "k01" && k != "k02" &&
        !(k == "k06" && ts <= 15L) &&
        !(k == "k07" && q == "b")
    }.map { case (k, f, q, v, ts) => (k, f, q, v, ts) }.toSet
    readable(scan(d)) shouldBe expected
    // a write AFTER the ts-bounded delete (higher ts) is visible
    cells(("k06", "f", "b", "reborn", 99L)).write.format("graft-kv")
      .option("regions", 1).mode("append").save(d)
    readable(scan(d)) shouldBe expected + (("k06", "f", "b", "reborn", 99L))
    // raw view still has everything, markers included
    val raw = spark.read.format("graft-kv").option("readTombstones", "true").load(d)
    assert(raw.count() == baseRows.size + 1 + 4,
      "raw view = all puts + the 4 markers")
    // time travel to the pre-delete version sees the undeleted table
    val pre = spark.read.format("graft-kv").option("asOfSeq", 0).load(d)
    readable(pre) shouldBe baseRows.toSet
  }

  test("deleted keys stay invisible to point lookups, limits, and DESC top-n") {
    val d = tmp("kv_del_push")
    cells(baseRows: _*).write.format("graft-kv").option("regions", 2)
      .mode("append").save(d)
    KvDelete.deleteRows(spark, d,
      (Seq("k01", "k03") ++ Seq("k39", "k40")).toDF("rowKey"))
    // point lookup (bloom + pushed EqualTo) of a deleted key: empty
    assert(scan(d).filter(col("rowKey") === "k01").count() == 0)
    assert(scan(d).filter(col("rowKey") === "k04").count() == 3)
    // a LIMIT larger than any single file's survivors never under-produces
    val survivors = 36 * 3
    assert(scan(d).limit(survivors).count() == survivors)
    assert(scan(d).limit(5).count() == 5)
    // DESC top-n skips the deleted tail keys
    val topKeys = scan(d).orderBy(col("rowKey").desc).limit(3)
      .select("rowKey").collect().map(_.getString(0)).toSeq
    topKeys shouldBe Seq("k38", "k38", "k38")
    // ASC head skips the deleted k01/k03
    val headKeys = scan(d).orderBy(col("rowKey")).limit(4)
      .select("rowKey").collect().map(_.getString(0)).toSeq
    headKeys shouldBe Seq("k02", "k02", "k02", "k04")
    // a projection narrower than the mask coordinate still masks
    assert(scan(d).select("rowKey").distinct().count() == 36)
  }

  test("metadata aggregates refuse the rewrite on tombstoned tables: COUNT answers for the MASKED table") {
    val d = tmp("kv_del_count")
    cells(baseRows: _*).write.format("graft-kv").option("regions", 2)
      .mode("append").save(d)
    assert(scan(d).count() == baseRows.size) // marker-free: metadata-served
    KvDelete.deleteRows(spark, d, Seq("k01").toDF("rowKey"))
    assert(scan(d).count() == baseRows.size - 3)
    assert(spark.read.format("graft-kv").option("readTombstones", "true")
      .load(d).count() == baseRows.size + 1)
    assert(scan(d).agg(max("ts")).head().getLong(0) == 30L)
  }

  test("major compaction purges masked cells AND markers; partial compaction retains markers") {
    val d = tmp("kv_del_compact")
    // commit 0: markers target half the table; commits 1-2: data
    val half = (1 to 20).map(i => f"k$i%02d")
    cells(baseRows.filter(_._5 == 10L): _*).write.format("graft-kv")
      .option("regions", 2).mode("append").save(d)
    cells(baseRows.filter(_._5 == 30L): _*).write.format("graft-kv")
      .option("regions", 2).mode("append").save(d)
    KvDelete.deleteRows(spark, d, half.toDF("rowKey"))
    val maskedBefore = readable(scan(d))
    maskedBefore.map(_._1) shouldBe (21 to 40).map(i => f"k$i%02d").toSet

    // PARTIAL pass: a registered tail at seq 2 gates the marker commit
    // out of... rather, merges commits 0-1 (data) and CARRIES the marker
    // file — nothing is unmasked, markers persist.
    val dir = new Path(d)
    KvLog.recordTail(fs, dir, "t1", 2)
    KvCompactor.compact(spark, d, regions = 2) shouldBe a[KvCompactor.Compacted]
    readable(scan(d)) shouldBe maskedBefore
    val rawMid = spark.read.format("graft-kv").option("readTombstones", "true")
      .load(d).filter(col("qualifier") < "\u0001")
    assert(rawMid.count() == 20, "markers survive a partial pass")

    // MAJOR pass (tail dropped): masked cells and markers physically gone.
    KvLog.dropTail(fs, dir, "t1")
    KvCompactor.compact(spark, d, regions = 2) shouldBe a[KvCompactor.Compacted]
    readable(scan(d)) shouldBe maskedBefore
    val rawAfter = spark.read.format("graft-kv").option("readTombstones", "true")
      .load(d)
    assert(rawAfter.filter(col("qualifier") < "\u0001").count() == 0,
      "major compaction purges every marker")
    assert(rawAfter.count() == maskedBefore.size,
      "masked puts are physically gone")
    assert(KvLog.liveFileStats(fs, dir).values.forall(_.tombstones == 0))
    // marker-free again: metadata COUNT is servable and exact
    assert(scan(d).count() == maskedBefore.size)
  }

  test("a partial pass whose merge INCLUDES the marker file applies masking and carries compacted markers") {
    val d = tmp("kv_del_minor")
    // seq 0: data(ts=10); seq 1: markers; seq 2: data(ts=30, newer than
    // any marker target below). Tail gates at 2: merge = {data@10,
    // markers}, carry = {data@30}.
    cells(baseRows.filter(_._5 == 10L): _*).write.format("graft-kv")
      .option("regions", 2).mode("append").save(d)
    KvDelete.deleteRows(spark, d, Seq("k01", "k02").toDF("rowKey"),
      defaultTs = 20L)
    cells(baseRows.filter(_._5 == 30L): _*).write.format("graft-kv")
      .option("regions", 2).mode("append").save(d)
    val before = readable(scan(d))
    // ts<=20 masked for k01/k02: their @10 cells die, @30 cells live
    assert(before.count(_._1 == "k01") == 1)
    val dir = new Path(d)
    KvLog.recordTail(fs, dir, "t2", 2)
    KvCompactor.compact(spark, d, regions = 2) shouldBe a[KvCompactor.Compacted]
    readable(scan(d)) shouldBe before
    // the markers were compacted (2 coordinates) and retained
    val raw = spark.read.format("graft-kv").option("readTombstones", "true")
      .load(d).filter(col("qualifier") < "\u0001")
    assert(raw.count() == 2, "newest-marker-per-coordinate retained")
    KvLog.dropTail(fs, dir, "t2")
  }

  test("masking is REGION-SCOPED on disjoint layouts; overlapping big masks fall back to broadcast") {
    import spark.implicits._
    // disjoint (compacted) layout: every partition carries only ITS
    // file's marker slice — the plan says so
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_mask_sliced"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    graft.kv.KvGenerator.cells(spark, 2000, 4, "runM")
      .write.format("graft-kv").option("regions", 4).mode("append").save(d)
    KvCompactor.compact(spark, d, regions = 4) shouldBe a[KvCompactor.Compacted]
    val victims = spark.read.format("graft-kv").load(d)
      .select("rowKey").distinct().orderBy("rowKey").limit(3)
      .as[String].collect().toSeq
    KvDelete.deleteRows(spark, d, victims.toDF("rowKey"))
    val df = spark.read.format("graft-kv").load(d)
    val rows = df.select("rowKey").collect().map(_.getString(0))
    df.queryExecution.executedPlan.toString should include("mode=sliced")
    victims.foreach(v => assert(!rows.contains(v), s"$v must be masked"))
    rows.length shouldBe 2000 * 10 - victims.size * 10
    // overlapping epochs + a >4k mask: per-file slices would replicate
    // the whole mask per file — the guard falls back to ONE broadcast
    val d2 = s"${sys.props("java.io.tmpdir")}/graft_test/kv_mask_bcast"
    graft.sinks.Sinks.deleteRecursive(spark, d2)
    // three SINGLE-REGION epochs: every data file spans the whole
    // keyspace, so per-file slices would triple the mask — past the guard
    val cells2 = graft.kv.KvGenerator.cells(spark, 6000, 4, "runM")
    (0 until 3).foreach { i =>
      cells2.filter(pmod(col("ts"), lit(3)) === i)
        .write.format("graft-kv").option("regions", 1).mode("append").save(d2)
    }
    val victims2 = spark.read.format("graft-kv").load(d2)
      .select("rowKey").distinct().orderBy("rowKey").limit(5000)
    KvDelete.deleteRows(spark, d2, victims2)
    val df2 = spark.read.format("graft-kv").load(d2)
    df2.count() shouldBe (6000L - 5000L) * 10
    df2.queryExecution.executedPlan.toString should include("mode=broadcast")
    // EXACTLY-2x duplication (two full-span files) also falls back: the
    // sliced plan would ship about twice the broadcast's bytes via task
    // serialization — the bound is strict (>= 2x declines)
    val d3 = s"${sys.props("java.io.tmpdir")}/graft_test/kv_mask_2x"
    graft.sinks.Sinks.deleteRecursive(spark, d3)
    (0 until 2).foreach { i =>
      cells2.filter(pmod(col("ts"), lit(2)) === i)
        .write.format("graft-kv").option("regions", 1).mode("append").save(d3)
    }
    val victims3 = spark.read.format("graft-kv").load(d3)
      .select("rowKey").distinct().orderBy("rowKey").limit(5000)
    KvDelete.deleteRows(spark, d3, victims3)
    val df3 = spark.read.format("graft-kv").load(d3)
    df3.count() shouldBe (6000L - 5000L) * 10
    df3.queryExecution.executedPlan.toString should include("mode=broadcast")
  }

  test("the sink refuses reserved-prefix qualifiers in user writes") {
    val d = tmp("kv_del_guard")
    val e = intercept[Exception] {
      cells(("k1", "f", "\u0000evil", "x", 1L)).write.format("graft-kv")
        .option("regions", 1).mode("append").save(d)
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    messages should include("reserved tombstone prefix")
  }

  test("deletes compose with salted tables: markers land salted, plain reads mask") {
    val d = tmp("kv_del_salt")
    KvSalt.saltedWrite(cells(baseRows: _*), d, n = 8, regions = 4,
      mode = "overwrite")
    KvDelete.deleteRows(spark, d, Seq("k05", "k17").toDF("rowKey"))
    val out = readable(scan(d))
    assert(!out.exists(r => r._1 == "k05" || r._1 == "k17"))
    assert(out.size == baseRows.size - 6)
    assert(scan(d).filter(col("rowKey") === "k05").count() == 0)
    assert(scan(d).filter(col("rowKey") === "k18").count() == 3)
  }

  test("an unbounded SQL delete is not poisoned by a prior forever-marker: later inserts survive") {
    val d = tmp("kv_del_atnow")
    cells(baseRows: _*).write.format("graft-kv").option("regions", 2)
      .mode("append").save(d)
    // a forever-delete first (its marker carries ts=Long.MaxValue; the
    // sink excludes marker ts from the manifest bounds)
    KvDelete.deleteRows(spark, d, Seq("k01").toDF("rowKey"))
    // now the unbounded SQL-shaped delete of k02: its implicit bound must
    // be the PUT max ts (30), not the forever-marker's MaxValue
    KvDelete.runSqlDelete(spark, d, KvDelete.SqlDelete(Seq("k02"), None, None))
    assert(scan(d).filter(col("rowKey") === "k02").count() == 0)
    // a later write with a higher ts is visible — delete-at-now semantics
    cells(("k02", "f", "a", "alive", 31L)).write.format("graft-kv")
      .option("regions", 1).mode("append").save(d)
    readable(scan(d).filter(col("rowKey") === "k02")) shouldBe
      Set(("k02", "f", "a", "alive", 31L))
  }

  test("a sinceSeq change feed ships RAW cells, markers included: deletes replicate through CDC") {
    val d = tmp("kv_del_cdc")
    cells(baseRows.take(9): _*).write.format("graft-kv").option("regions", 1)
      .mode("append").save(d) // seq 0
    KvDelete.deleteRows(spark, d, Seq("k01").toDF("rowKey")) // seq 1
    // the span (0, 1] carries exactly the delete commit: the marker row
    // itself, raw — NOT an empty masked view
    val span = spark.read.format("graft-kv").option("sinceSeq", 0).load(d)
    assert(span.count() == 1)
    assert(span.filter(col("qualifier") < "\u0001").count() == 1,
      "the CDC span must surface the delete marker")
    // while the STATE read of the same table masks
    assert(scan(d).count() == 6)
  }

  test("fsck reports tombstone accounting: marker files and live marker counts") {
    val d = tmp("kv_del_fsck")
    cells(baseRows.take(9): _*).write.format("graft-kv").option("regions", 1)
      .mode("append").save(d)
    KvDelete.deleteRows(spark, d, Seq("k01", "k02").toDF("rowKey"))
    val r = KvFsck.check(spark, d)
    r.tombstoneFiles shouldBe 1L
    r.liveTombstones shouldBe 2L
    assert(r.healthy, "markers are informational, not a health failure")
    KvCompactor.compact(spark, d, regions = 1) shouldBe a[KvCompactor.Compacted]
    val r2 = KvFsck.check(spark, d)
    r2.tombstoneFiles shouldBe 0L
    r2.liveTombstones shouldBe 0L
  }

  test("SQL-delete translation edge cases: ts underflow refused, truncate recognized") {
    import org.apache.spark.sql.sources._
    // ts < Long.MinValue matches nothing; v-1 would underflow to a
    // forever-marker — the translation must refuse (the rewrite fallback
    // then deletes zero rows)
    KvDelete.translateSqlDelete(Array(
      And(EqualTo("rowKey", "x"), LessThan("ts", Long.MinValue)))) shouldBe None
    KvDelete.translateSqlDelete(Array(
      And(EqualTo("rowKey", "x"), LessThan("ts", 10L)))) shouldBe
      Some(KvDelete.SqlDelete(Seq("x"), Some(9L), None))
    KvDelete.translateSqlDelete(Array(AlwaysTrue)) shouldBe
      Some(KvDelete.SqlDelete(Nil, None, None, truncate = true))
    KvDelete.translateSqlDelete(Array(GreaterThan("ts", 5L))) shouldBe None
  }

  test("DML truncate empties a LEGACY (log-less) directory too, seeding it first") {
    val d = tmp("kv_del_legacy_trunc")
    cells(baseRows.take(9): _*).write.mode("overwrite").parquet(d) // foreign files
    assert(scan(d).count() == 9)
    KvDelete.runSqlDelete(spark, d, KvDelete.SqlDelete(Nil, None, None, truncate = true))
    assert(scan(d).count() == 0, "truncate must not no-op on a legacy dir")
    // and it is history-preserving DML: the seeded pre-truncate version reads
    val fs0 = new Path(d).getFileSystem(spark.sessionState.newHadoopConf())
    assert(KvLog.latestSeq(fs0, new Path(d)) == 1L) // seed + truncate
    assert(spark.read.format("graft-kv").option("asOfSeq", 0).load(d).count() == 9)
  }

  test("snapshots and clones carry tombstones: the clone masks identically") {
    val d = tmp("kv_del_snap_src")
    val c = tmp("kv_del_snap_clone")
    cells(baseRows.take(30): _*).write.format("graft-kv").option("regions", 2)
      .mode("append").save(d)
    KvDelete.deleteRows(spark, d, Seq("k03").toDF("rowKey"))
    KvSnapshot.create(spark, d, "withDeletes")
    KvSnapshot.cloneTo(spark, d, "withDeletes", c)
    // the clone's marker file carried its d= stat, so masking activates
    readable(scan(c)) shouldBe readable(scan(d))
    assert(scan(c).filter(col("rowKey") === "k03").count() == 0)
    // and the snapshot read itself masks too
    val snapRead = spark.read.format("graft-kv")
      .option("snapshot", "withDeletes").load(d)
    readable(snapRead) shouldBe readable(scan(d))
  }

  test("streaming tails ship markers raw: deletes replicate") {
    import org.apache.spark.sql.streaming.Trigger
    val d = tmp("kv_del_tail_src")
    val out = tmp("kv_del_tail_out")
    val cp = tmp("kv_del_tail_cp")
    cells(baseRows.take(9): _*).write.format("graft-kv").option("regions", 1)
      .mode("append").save(d)
    KvDelete.deleteRows(spark, d, Seq("k01").toDF("rowKey"))
    val q = spark.readStream.format("graft-kv").load(d)
      .writeStream.format("graft-kv")
      .option("regions", 1).option("allowTombstones", "true")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start(out)
    q.awaitTermination()
    // the replica masks exactly like the source
    readable(scan(out)) shouldBe readable(scan(d))
    assert(spark.read.format("graft-kv").option("readTombstones", "true")
      .load(out).filter(col("qualifier") < "\u0001").count() == 1,
      "the marker itself replicated")
  }
}
