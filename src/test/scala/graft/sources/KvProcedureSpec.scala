package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** [[KvProcedures]]: the SQL CALL surface for lifecycle verbs — the
  * maintenance loop a DML user needs (marker DELETE → compact → vacuum,
  * snapshot → restore) driven end-to-end without leaving SQL.
  */
class KvProcedureSpec extends graft.SparkSpec {

  import spark.implicits._

  private val cat = "graftcat_proc"
  private lazy val wh: String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_proc_wh"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftKvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def stage(table: String, n: Int = 40): Path = {
    wh: Unit // force the catalog registration before any SQL names it
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.p")
    (1 to n).map(i => (f"k$i%03d", "f", "a", s"v$i", i.toLong))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .createOrReplaceTempView(s"proc_cells_$table")
    spark.sql(
      s"""CREATE TABLE $cat.p.$table USING `graft-kv`
         |TBLPROPERTIES ('regions' = '2')
         |AS SELECT * FROM proc_cells_$table""".stripMargin)
    new Path(s"$wh/p/$table")
  }

  private def fsOf(p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  test("the DML maintenance loop in pure SQL: DELETE markers -> CALL compact -> CALL vacuum") {
    val dir = stage("t1")
    val fs = fsOf(dir)
    spark.sql(s"DELETE FROM $cat.p.t1 WHERE rowKey >= 'k001' AND rowKey <= 'k010'")
    assert(KvLog.liveFileStats(fs, dir).values.map(_.tombstones).sum == 10L)
    // compact purges the masked cells AND the markers; the recorded
    // regions property (2) is the default output fan-out
    val c = spark.sql(s"CALL $cat.sys.compact(table => 'p.t1')").collect()
    c.length shouldBe 1
    c.head.getString(0) shouldBe "compacted"
    assert(KvLog.liveFiles(fs, dir).size == 2,
      "compact must default to the table's recorded regions")
    assert(KvLog.liveFileStats(fs, dir).values.map(_.tombstones).sum == 0L,
      "major compaction purges markers")
    spark.sql(s"SELECT count(*) FROM $cat.p.t1").head().getLong(0) shouldBe 30L
    // vacuum with zero grace reclaims the retired pre-compaction segments
    val v = spark.sql(s"CALL $cat.sys.vacuum(table => 'p.t1', grace_ms => 0)")
      .collect().head
    v.getString(0) shouldBe "vacuumed"
    assert(v.getInt(1) > 0, "the retired segments were reclaimable")
    spark.sql(s"SELECT count(*) FROM $cat.p.t1").head().getLong(0) shouldBe 30L
  }

  test("snapshot -> mutate -> restore round-trips the pinned state by name") {
    val dir = stage("t2")
    val s = spark.sql(s"CALL $cat.sys.snapshot(table => 'p.t2', name => 'pre')")
      .collect().head
    s.getString(0) shouldBe "pre"
    s.getInt(2) shouldBe 2 // the two region files are pinned
    spark.sql(s"DELETE FROM $cat.p.t2 WHERE rowKey <= 'k020'")
    spark.sql(s"SELECT count(*) FROM $cat.p.t2").head().getLong(0) shouldBe 20L
    val seq = spark.sql(s"CALL $cat.sys.restore(table => 'p.t2', name => 'pre')")
      .collect().head.getLong(0)
    assert(seq > 0)
    spark.sql(s"SELECT count(*) FROM $cat.p.t2").head().getLong(0) shouldBe 40L
    // a snapshot pins its files against vacuum: post-restore state survives
    // a zero-grace vacuum
    spark.sql(s"CALL $cat.sys.vacuum(table => 'p.t2', grace_ms => 0)").collect()
    spark.sql(s"SELECT count(*) FROM $cat.p.t2").head().getLong(0) shouldBe 40L
  }

  test("fsck reports the health row, including tombstone accounting") {
    val dir = stage("t3"): Unit
    spark.sql(s"DELETE FROM $cat.p.t3 WHERE rowKey = 'k001'")
    val r = spark.sql(s"CALL $cat.sys.fsck(table => 'p.t3')").collect().head
    r.getBoolean(0) shouldBe true // healthy
    r.getAs[Long]("live_files") shouldBe 3L // 2 regions + 1 marker segment
    r.getAs[Long]("live_missing") shouldBe 0L
    r.getAs[Long]("tombstone_files") shouldBe 1L
    r.getAs[Long]("live_tombstones") shouldBe 1L
  }

  test("clone materializes a snapshot as a new catalog table; drop_snapshot unpins") {
    val dir = stage("t5"): Unit
    spark.sql(s"CALL $cat.sys.snapshot(table => 'p.t5', name => 'pin')").collect()
    spark.sql(s"DELETE FROM $cat.p.t5 WHERE rowKey <= 'k020'")
    val r = spark.sql(s"CALL $cat.sys.clone(table => 'p.t5', " +
      "name => 'pin', target => 'p.t5c')").collect().head
    r.getString(0) shouldBe "p.t5c"
    // the clone reads by NAME immediately and carries the PINNED state
    spark.sql(s"SELECT count(*) FROM $cat.p.t5c").head().getLong(0) shouldBe 40L
    spark.sql(s"SELECT count(*) FROM $cat.p.t5").head().getLong(0) shouldBe 20L
    // refusals: existing target, missing namespace, bad identifier
    an[Exception] should be thrownBy spark.sql(
      s"CALL $cat.sys.clone(table => 'p.t5', name => 'pin', target => 'p.t5c')")
      .collect()
    an[Exception] should be thrownBy spark.sql(
      s"CALL $cat.sys.clone(table => 'p.t5', name => 'pin', target => 'nons.x')")
      .collect()
    // drop_snapshot unpins; a second drop reports false
    spark.sql(s"CALL $cat.sys.drop_snapshot(table => 'p.t5', name => 'pin')")
      .collect().head.getBoolean(0) shouldBe true
    spark.sql(s"CALL $cat.sys.drop_snapshot(table => 'p.t5', name => 'pin')")
      .collect().head.getBoolean(0) shouldBe false
  }

  test("maintain runs one policy pass: parks under the threshold, compacts past it") {
    val dir = stage("t6")
    val fs = fsOf(dir)
    // 2 region files, threshold 8 -> parks
    val parked = spark.sql(s"CALL $cat.sys.maintain(table => 'p.t6')")
      .collect().head
    parked.getString(0) should include("Parked")
    // pile up segments past a threshold of 2 -> the pass compacts
    (1 to 3).foreach { _ =>
      spark.sql(s"INSERT INTO $cat.p.t6 SELECT * FROM proc_cells_t6")
    }
    val before = KvLog.liveFiles(fs, dir).size
    assert(before > 2)
    val run = spark.sql(s"CALL $cat.sys.maintain(table => 'p.t6', " +
      "max_segments => 2, grace_ms => 0)").collect().head
    run.getString(0) should include("Compacted")
    assert(KvLog.liveFiles(fs, dir).size < before)
    spark.sql(s"SELECT count(*) FROM $cat.p.t6").head().getLong(0) shouldBe 160L
  }

  test("SHOW PROCEDURES lists the sys verbs; DESCRIBE PROCEDURE surfaces the description") {
    wh: Unit
    val listed = spark.sql(s"SHOW PROCEDURES IN $cat")
      .collect().map(_.getAs[String]("procedure_name")).toSet
    listed shouldBe Set("compact", "vacuum", "snapshot", "restore",
      "clone", "drop_snapshot", "maintain", "fsck", "history",
      "truncate_log", "repair", "resalt", "create_index", "refresh_index",
      "drop_index", "indexes", "verify_index")
    val desc = spark.sql(s"DESCRIBE PROCEDURE $cat.sys.compact")
      .collect().map(_.getString(0)).mkString("\n")
    desc should include("compact")
    desc should include("purge delete markers")
  }

  test("history returns the manifest commit log by name, in seq order") {
    val dir = stage("t20")
    val fs = fsOf(dir)
    spark.sql(s"INSERT INTO $cat.p.t20 SELECT * FROM proc_cells_t20")
    spark.sql(s"DELETE FROM $cat.p.t20 WHERE rowKey = 'k001'")
    val viaSql = spark.sql(s"CALL $cat.sys.history(table => 'p.t20')")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    viaSql shouldBe KvLog.history(fs, dir)
    viaSql.map(_._1) shouldBe Seq(0L, 1L, 2L) // CTAS, INSERT, marker DELETE
    viaSql.map(_._2).distinct shouldBe Seq("append")
  }

  test("truncate_log drops expired pre-floor entries; history restarts at the floor") {
    val dir = stage("t21")
    val fs = fsOf(dir)
    spark.sql(s"INSERT INTO $cat.p.t21 SELECT * FROM proc_cells_t21")
    // no compaction checkpoint yet: truncation refuses (0 entries), the
    // same conservative contract as the path API
    val r0 = spark.sql(s"CALL $cat.sys.truncate_log(table => 'p.t21', " +
      "retention_ms => 0)").collect().head
    r0.getInt(0) shouldBe 0
    spark.sql(s"CALL $cat.sys.compact(table => 'p.t21')").collect()
    val r = spark.sql(s"CALL $cat.sys.truncate_log(table => 'p.t21', " +
      "retention_ms => 0)").collect().head
    assert(r.getInt(0) >= 2, s"the pre-floor CTAS+INSERT entries expire, got $r")
    r.getLong(1) shouldBe KvLog.floor(fs, dir)
    val hist = spark.sql(s"CALL $cat.sys.history(table => 'p.t21')").collect()
    hist.head.getLong(0) shouldBe r.getLong(1)
    // the table stays fully readable after truncation
    spark.sql(s"SELECT count(*) FROM $cat.p.t21").head().getLong(0) shouldBe 80L
  }

  test("repair applies explicitly-named hbck actions; fsck flips back to healthy") {
    val dir = stage("t22")
    val fs = fsOf(dir)
    // break the table: delete one live referenced file out of band
    val victim = KvLog.liveFiles(fs, dir).head
    fs.delete(new Path(dir, victim), false) shouldBe true
    spark.sql(s"CALL $cat.sys.fsck(table => 'p.t22')")
      .collect().head.getBoolean(0) shouldBe false
    // unnamed/unknown actions refuse — each action is an operator judgment
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.sys.repair(table => 'p.t22', actions => 'fixEverything')")
        .collect()
    }
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ") should
      include("actions must be from")
    val r = spark.sql(s"CALL $cat.sys.repair(table => 'p.t22', " +
      "actions => 'forgetMissing')").collect().head
    r.getInt(0) shouldBe 1 // the missing reference is forgotten
    r.getInt(1) shouldBe 0
    spark.sql(s"CALL $cat.sys.fsck(table => 'p.t22')")
      .collect().head.getBoolean(0) shouldBe true
  }

  test("compact with no regions argument or property sizes output from bytes, not a fixed count") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.p")
    spark.sql(
      s"""CREATE TABLE $cat.p.t23 (
         |  rowKey STRING, family STRING, qualifier STRING,
         |  value BINARY, ts BIGINT) USING `graft-kv`""".stripMargin)
    (1 to 3).foreach { i =>
      (1 to 40).map(j => (f"k$i%02d$j%03d", "f", "a", s"v$j", j.toLong))
        .toDF("rowKey", "family", "qualifier", "v", "ts")
        .select(col("rowKey"), col("family"), col("qualifier"),
          encode(col("v"), "UTF-8").as("value"), col("ts"))
        .createOrReplaceTempView("proc_cells_sized")
      spark.sql(s"INSERT INTO $cat.p.t23 SELECT * FROM proc_cells_sized")
    }
    val dir = new Path(s"$wh/p/t23")
    val fs = fsOf(dir)
    assert(KvLog.liveFiles(fs, dir).size > 8,
      "staging must exceed the old hard-coded 8-region fallback")
    val c = spark.sql(s"CALL $cat.sys.compact(table => 'p.t23')").collect().head
    c.getString(0) shouldBe "compacted"
    // a few KB of cells vs the 128MB default target: ceil gives ONE
    // region — the size-derived count, not the old fixed 8
    c.getInt(3) shouldBe 1
    KvLog.liveFiles(fs, dir).size shouldBe 1
  }

  test("unknown procedures and malformed table arguments fail loudly") {
    wh: Unit
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.sys.explode(table => 'p.t1')").collect()
    }
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ") should
      include("no procedure")
    val dir = stage("t4"): Unit
    // path characters in the table argument must not escape the warehouse
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $cat.sys.compact(table => 'p.t4/x')").collect()
    }
    Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ") should
      include("invalid identifier")
  }

  test("compact surfaces dropped_cells and enforce_policy opts out of retention") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.p")
    // two versions per key under a declared versions=1 retention
    (1 to 40).flatMap(i => Seq(
      (f"k$i%03d", "f", "a", s"old$i", i.toLong),
      (f"k$i%03d", "f", "a", s"new$i", i + 1000L)))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .createOrReplaceTempView("proc_cells_t30")
    spark.sql(
      s"""CREATE TABLE $cat.p.t30 USING `graft-kv`
         |TBLPROPERTIES ('regions' = '2', 'versions' = '1')
         |AS SELECT * FROM proc_cells_t30""".stripMargin)
    // opt OUT first: a logical-view-preserving merge, zero cells dropped
    val off = spark.sql(s"CALL $cat.sys.compact(table => 'p.t30', " +
      "enforce_policy => false)").collect().head
    off.getString(0) shouldBe "compacted"
    off.getLong(4) shouldBe 0L
    spark.sql(s"SELECT count(*) FROM $cat.p.t30").head().getLong(0) shouldBe 80L
    // default enforces the declared retention and REPORTS the side effect
    val on = spark.sql(s"CALL $cat.sys.compact(table => 'p.t30')").collect().head
    on.getString(0) shouldBe "compacted"
    on.getLong(4) shouldBe 40L // the 40 superseded old versions
    spark.sql(s"SELECT count(*) FROM $cat.p.t30").head().getLong(0) shouldBe 40L
  }
}
