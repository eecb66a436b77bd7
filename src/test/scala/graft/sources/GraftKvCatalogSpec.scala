package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** [[GraftKvCatalog]]: the named-table SQL surface over the `graft-kv`
  * connector — CREATE/INSERT/SELECT/SHOW/DROP against a filesystem
  * warehouse, with table properties driving write defaults and the whole
  * lifecycle (manifest, salt, deletes) traveling with the directory.
  */
class GraftKvCatalogSpec extends graft.SparkSpec {

  import spark.implicits._

  private val cat = "graftcat_spec"
  private lazy val wh: String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_catalog_wh"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftKvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def cellsDf = Seq(
    ("k01", "f", "a", "v1", 10L), ("k01", "f", "b", "v2", 11L),
    ("k02", "f", "a", "v3", 12L), ("k03", "g", "c", "v4", 13L))
    .toDF("rowKey", "family", "qualifier", "v", "ts")
    .select(col("rowKey"), col("family"), col("qualifier"),
      encode(col("v"), "UTF-8").as("value"), col("ts"))

  test("CREATE NAMESPACE / CREATE TABLE / INSERT / SELECT / SHOW / DROP round-trip") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.corpus")
    assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).contains("corpus"))
    spark.sql(
      s"""CREATE TABLE $cat.corpus.t1 (
         |  rowKey STRING, family STRING, qualifier STRING,
         |  value BINARY, ts BIGINT)
         |USING `graft-kv` TBLPROPERTIES ('regions' = '2')""".stripMargin)
    assert(spark.sql(s"SHOW TABLES IN $cat.corpus").collect()
      .map(_.getString(1)).contains("t1"))
    cellsDf.createOrReplaceTempView("catalog_spec_cells")
    spark.sql(s"INSERT INTO $cat.corpus.t1 SELECT * FROM catalog_spec_cells")
    // the recorded 'regions' property drove the write fan-out
    val dir = new Path(s"$wh/corpus/t1")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    assert(KvLog.liveFiles(fs, dir).size == 2,
      "INSERT must use the table's recorded regions=2")
    // SQL reads go through the same pruned/pushed scan
    val n = spark.sql(
      s"SELECT count(*) FROM $cat.corpus.t1 WHERE rowKey = 'k01'")
      .head().getLong(0)
    assert(n == 2)
    spark.sql(s"SELECT rowKey, qualifier FROM $cat.corpus.t1 ORDER BY rowKey, qualifier")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("k01", "a"), ("k01", "b"), ("k02", "a"), ("k03", "c"))
    // second INSERT appends (a second manifest commit)
    spark.sql(s"INSERT INTO $cat.corpus.t1 SELECT * FROM catalog_spec_cells")
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t1").head().getLong(0) == 8)
    // deletes work against the catalog table's directory
    KvDelete.deleteRows(spark, s"$wh/corpus/t1", Seq("k03").toDF("rowKey"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus.t1").head().getLong(0) == 6)
    spark.sql(s"DROP TABLE $cat.corpus.t1")
    assert(!fs.exists(dir))
    assert(!spark.sql(s"SHOW TABLES IN $cat.corpus").collect()
      .map(_.getString(1)).contains("t1"))
  }

  test("CTAS creates and loads; the cell schema is enforced") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ctas")
    cellsDf.createOrReplaceTempView("catalog_spec_cells2")
    spark.sql(
      s"""CREATE TABLE $cat.ctas.t2 USING `graft-kv`
         |TBLPROPERTIES ('regions' = '1')
         |AS SELECT * FROM catalog_spec_cells2""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ctas.t2").head().getLong(0) == 4)
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.ctas.bad (a INT, b STRING) USING `graft-kv`")
    }
    e.getMessage should include("exactly columns")
  }

  test("a salted catalog table takes plain SQL INSERT — the sink applies the salt (r13)") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.salted")
    spark.sql(
      s"""CREATE TABLE $cat.salted.t3 (
         |  rowKey STRING, family STRING, qualifier STRING,
         |  value BINARY, ts BIGINT)
         |USING `graft-kv`
         |TBLPROPERTIES ('regions' = '2', 'salt_buckets' = '8')""".stripMargin)
    val dir = new Path(s"$wh/salted/t3")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    KvSalt.bucketsOf(fs, dir) shouldBe Some(8)
    cellsDf.createOrReplaceTempView("catalog_spec_cells3")
    // SQL is a LOGICAL-key surface on both sides: the INSERT carries
    // logical keys and the sink salts + demuxes them per bucket.
    spark.sql(s"INSERT INTO $cat.salted.t3 SELECT * FROM catalog_spec_cells3")
    assert(spark.sql(s"SELECT count(*) FROM $cat.salted.t3 WHERE rowKey = 'k01'")
      .head().getLong(0) == 2)
    // On disk every key IS stored-salted (validated byte shape, prefix
    // consistent with the key's own hash).
    val stored = spark.read.parquet(s"$wh/salted/t3")
      .select("rowKey").collect().map(_.getString(0))
    stored.length shouldBe 4
    all(stored.map(k =>
      KvSalt.isStored(org.apache.spark.unsafe.types.UTF8String.fromString(k),
        8))) shouldBe true
    // A single salted commit certifies stored-space contiguity: the
    // bucket×partition grid is pairwise disjoint and per-file sorted.
    KvTableInfo.keyContiguousRegions(spark, s"$wh/salted/t3") shouldBe true
    // INSERT OVERWRITE re-salts through the same path (the truncate
    // re-registers the declared salt, rows land salted).
    spark.sql(s"INSERT OVERWRITE $cat.salted.t3 SELECT * FROM catalog_spec_cells3")
    assert(spark.sql(s"SELECT count(*) FROM $cat.salted.t3").head().getLong(0) == 4)
    KvSalt.bucketsOf(fs, dir) shouldBe Some(8)
    // the path API's PRE-salted write path composes with the catalog —
    // tablePathOf is the name → directory bridge
    GraftKvCatalog.tablePathOf(spark, s"$cat.salted.t3") shouldBe
      s"$wh/salted/t3"
    KvSalt.saltedWrite(cellsDf,
      GraftKvCatalog.tablePathOf(spark, s"$cat.salted.t3"), n = 8,
      regions = 2, mode = "append")
    assert(spark.sql(s"SELECT count(*) FROM $cat.salted.t3 WHERE rowKey = 'k01'")
      .head().getLong(0) == 4)
    // a mismatching salted overwrite is refused by the declaration
    an[Exception] should be thrownBy KvSalt.saltedWrite(cellsDf,
      GraftKvCatalog.tablePathOf(spark, s"$cat.salted.t3"), n = 16,
      regions = 2, mode = "overwrite")
    // CTAS with salt_buckets also lands salted end to end
    spark.sql(
      s"""CREATE TABLE $cat.salted.t3c USING `graft-kv`
         |TBLPROPERTIES ('regions' = '2', 'salt_buckets' = '4')
         |AS SELECT * FROM catalog_spec_cells3""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM $cat.salted.t3c WHERE rowKey = 'k01'")
      .head().getLong(0) == 2)
    val storedC = spark.read.parquet(s"$wh/salted/t3c")
      .select("rowKey").collect().map(_.getString(0))
    all(storedC.map(k =>
      KvSalt.isStored(org.apache.spark.unsafe.types.UTF8String.fromString(k),
        4))) shouldBe true
  }

  test("a maintain-declared catalog table bounds its own segment count across INSERTs") {
    // HBase compacts automatically — a DML-heavy catalog table should
    // too. `maintain*` table properties make every INSERT run the
    // idempotent policy pass after its commit: segments stay bounded and
    // retired files get vacuumed, with no operator CALL.
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mnt")
    spark.sql(
      s"""CREATE TABLE $cat.mnt.t USING `graft-kv`
         |TBLPROPERTIES ('regions' = '1', 'maintain' = 'true',
         |  'maintain_max_segments' = '3', 'maintain_grace_ms' = '0')""".stripMargin)
    cellsDf.createOrReplaceTempView("catalog_spec_mnt")
    (1 to 6).foreach { _ =>
      spark.sql(s"INSERT INTO $cat.mnt.t SELECT * FROM catalog_spec_mnt")
    }
    val dir = new Path(s"$wh/mnt/t")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val live = KvLog.liveFiles(fs, dir).size
    assert(live < 6,
      s"6 single-region INSERTs must have been compacted below 6 live " +
        s"segments by the maintenance passes, got $live")
    // content is untouched by the housekeeping
    spark.sql(s"SELECT count(*) FROM $cat.mnt.t").head().getLong(0) shouldBe 24L
    spark.sql(s"SELECT count(*) FROM $cat.mnt.t WHERE rowKey = 'k01'")
      .head().getLong(0) shouldBe 12L
    // DML composes: a marker DELETE masks immediately; the table's own
    // passes then apply + purge the marker when a merge covers it. A
    // re-insert at ts <= the marker bound may land before the purge
    // (masked, then physically dropped by the covering merge) or after
    // it (visible — HBase's documented post-major-compaction re-insert
    // drift). Every state is legal EXCEPT a live marker with a visible
    // masked row: that would mean the masked read path broke.
    spark.sql(s"DELETE FROM $cat.mnt.t WHERE rowKey = 'k03'")
    spark.sql(s"SELECT count(*) FROM $cat.mnt.t WHERE rowKey = 'k03'")
      .head().getLong(0) shouldBe 0L
    spark.sql(s"INSERT INTO $cat.mnt.t SELECT * FROM catalog_spec_mnt")
    val tomb = KvLog.liveFileStats(fs, dir).values.map(_.tombstones).sum
    val k03 = spark.sql(s"SELECT count(*) FROM $cat.mnt.t WHERE rowKey = 'k03'")
      .head().getLong(0)
    assert(!(tomb > 0 && k03 > 0L),
      s"a live marker must mask: liveTombstones=$tomb k03=$k03")
  }

  test("maintenance triggers on the DML that creates the garbage: a DELETE-only workload stays bounded") {
    // GDPR-shape workload: markers only, never an INSERT. Without the
    // DELETE-side trigger the marker segments would pile up toward the
    // read-path cap with no pass ever running.
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mntd")
    (1 to 30).map(i => (f"k$i%03d", "f", "a", s"v$i", i.toLong))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .createOrReplaceTempView("catalog_spec_mntd")
    spark.sql(
      s"""CREATE TABLE $cat.mntd.t USING `graft-kv`
         |TBLPROPERTIES ('regions' = '1', 'maintain' = 'true',
         |  'maintain_max_segments' = '3', 'maintain_grace_ms' = '0')
         |AS SELECT * FROM catalog_spec_mntd""".stripMargin)
    (1 to 6).foreach { i =>
      spark.sql(s"DELETE FROM $cat.mntd.t WHERE rowKey = 'k00$i'")
    }
    val dir = new Path(s"$wh/mntd/t")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    assert(KvLog.liveFiles(fs, dir).size < 7,
      "six marker commits must have been folded by the DELETE-side passes")
    // the logical view stayed correct through every pass
    spark.sql(s"SELECT count(*) FROM $cat.mntd.t").head().getLong(0) shouldBe 24L
  }

  test("declared ttl_ms / versions retention is enforced physically by the maintenance pass") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ret")
    // HBase's CREATE-time retention attributes (CreateTable.java:48-52 —
    // VERSIONS, TTL), declared as TBLPROPERTIES and enforced by the
    // self-maintenance pass's compaction rewrite. ts is epoch millis by
    // the TTL contract.
    spark.sql(
      s"""CREATE TABLE $cat.ret.t (
         |  rowKey STRING, family STRING, qualifier STRING,
         |  value BINARY, ts BIGINT)
         |USING `graft-kv` TBLPROPERTIES ('regions' = '1',
         |  'maintain' = 'true', 'maintain_max_segments' = '2',
         |  'maintain_grace_ms' = '0',
         |  'ttl_ms' = '${7L * 24 * 3600 * 1000}', 'versions' = '2')""".stripMargin)
    val now = System.currentTimeMillis()
    // Three versions per live key (ts now-2, now-1, now) + one EXPIRED
    // key whose only cells are 30 days old.
    def ins(tsExpr: String, keyPrefix: String): Unit = {
      spark.range(20).selectExpr(
        s"concat('$keyPrefix', lpad(CAST(id AS STRING), 3, '0')) AS rowKey",
        "'f' AS family", "'a' AS qualifier",
        s"encode(concat('v', CAST($tsExpr AS STRING)), 'UTF-8') AS value",
        s"CAST($tsExpr AS BIGINT) AS ts")
        .createOrReplaceTempView("ret_src")
      spark.sql(s"INSERT INTO $cat.ret.t SELECT * FROM ret_src")
    }
    ins(s"${now}L - ${30L * 24 * 3600 * 1000}L", "old")
    ins(s"${now}L - 2", "k")
    ins(s"${now}L - 1", "k")
    ins(s"${now}L", "k")
    // Self-maintenance already compacted mid-stream (threshold 2); the
    // closing explicit pass (the admin's off-peak CALL) merges the tail
    // so retention is enforced across EVERY segment. Then read the
    // REGION FILES DIRECTLY — retention must be physical, not a
    // read-time mask.
    spark.sql(s"CALL $cat.sys.maintain(table => 'ret.t', max_segments => 1)")
      .collect()
    val dir = new Path(s"$wh/ret/t")
    val files = KvLog.liveFiles(fsOf(s"$wh/ret/t"), dir).map(n => s"$wh/ret/t/$n")
    assert(files.size == 1, s"closing pass did not fully compact: $files")
    val raw = spark.read.parquet(files: _*)
    import org.apache.spark.sql.functions.countDistinct
    // Expired key gone entirely; live keys hold exactly the newest 2.
    raw.filter(col("rowKey").startsWith("old")).count() shouldBe 0L
    val perKey = raw.filter(col("rowKey").startsWith("k"))
      .groupBy("rowKey").count().agg(
        countDistinct(col("count")).as("d"), max(col("count")).as("m"))
      .head()
    perKey.getLong(0) shouldBe 1L
    perKey.getLong(1) shouldBe 2L
    raw.filter(col("rowKey") === "k000").select("ts").collect()
      .map(_.getLong(0)).sorted.toSeq shouldBe Seq(now - 1, now)

    // The declared retention appears in re-runnable DDL...
    val ddl = spark.sql(s"SHOW CREATE TABLE $cat.ret.t")
      .collect().head.getString(0)
    ddl should include(s"'ttl_ms' = '${7L * 24 * 3600 * 1000}'")
    ddl should include("'versions' = '2'")
    // ...ALTER can tune it, and invalid values refuse at DDL time.
    spark.sql(s"ALTER TABLE $cat.ret.t SET TBLPROPERTIES ('versions' = '3')")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ret.t SET TBLPROPERTIES ('versions' = '0')")
    }.getMessage should include("versions")
    intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE $cat.ret.bad (
           |  rowKey STRING, family STRING, qualifier STRING,
           |  value BINARY, ts BIGINT)
           |USING `graft-kv` TBLPROPERTIES ('ttl_ms' = 'soon')""".stripMargin)
    }.getMessage should include("ttl_ms")
  }

  test("SHOW TBLPROPERTIES / DESCRIBE TABLE surface the recorded layout properties") {
    // The operator-facing inspection surface: what a table RECORDED at
    // CREATE (regions/salt/codec/maintain*) must be readable back through
    // plain SQL — it's how an operator learns why writes fan out the way
    // they do and whether self-maintenance is declared, without touching
    // the warehouse directory.
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.insp")
    spark.sql(
      s"""CREATE TABLE $cat.insp.t (
         |  rowKey STRING, family STRING, qualifier STRING,
         |  value BINARY, ts BIGINT)
         |USING `graft-kv`
         |TBLPROPERTIES ('regions' = '4', 'maintain' = 'true',
         |  'maintain_max_segments' = '5')""".stripMargin)
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.insp.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    props.get("regions") shouldBe Some("4")
    props.get("maintain") shouldBe Some("true")
    props.get("maintain_max_segments") shouldBe Some("5")
    val desc = spark.sql(s"DESCRIBE TABLE $cat.insp.t").collect()
      .map(_.getString(0))
    graft.kv.Cell.schema.fieldNames.foreach(c => assert(desc.contains(c),
      s"DESCRIBE must list cell column $c"))
  }

  test("SHOW CREATE TABLE emits re-runnable DDL: USING graft-kv + the recorded properties") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.sct")
    spark.sql(
      s"""CREATE TABLE $cat.sct.orig (
         |  rowKey STRING, family STRING, qualifier STRING,
         |  value BINARY, ts BIGINT)
         |USING `graft-kv`
         |TBLPROPERTIES ('regions' = '3', 'salt_buckets' = '4',
         |  'maintain' = 'true')""".stripMargin)
    val ddl = spark.sql(s"SHOW CREATE TABLE $cat.sct.orig")
      .collect().head.getString(0)
    ddl should include("USING `graft-kv`")
    ddl should include("'regions' = '3'")
    ddl should include("'salt_buckets' = '4'")
    ddl should include("'maintain' = 'true'")
    // the emitted DDL round-trips: running it (renamed) yields a table
    // with the same recorded properties and schema
    spark.sql(ddl.replace(s"$cat.sct.orig", s"$cat.sct.copy"))
    def shown(t: String): Map[String, String] =
      spark.sql(s"SHOW TBLPROPERTIES $cat.sct.$t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    shown("copy") shouldBe shown("orig")
    spark.table(s"$cat.sct.copy").schema.fieldNames.toSeq shouldBe
      spark.table(s"$cat.sct.orig").schema.fieldNames.toSeq
    // and the copy is a working salted table (the salt registered at its
    // own CREATE): a sink-salted INSERT + logical read compose
    cellsDf.createOrReplaceTempView("catalog_spec_sct")
    spark.sql(s"INSERT INTO $cat.sct.copy SELECT * FROM catalog_spec_sct")
    spark.sql(s"SELECT count(*) FROM $cat.sct.copy WHERE rowKey = 'k01'")
      .head().getLong(0) shouldBe 2L
  }

  test("a corrupted maintain property cannot fail a committed DELETE (best-effort resolution)") {
    // The marker-DELETE path resolves the maintenance policy AFTER its
    // commit is durable. A recorded-props file corrupted out-of-band (or
    // written by a future engine version with a knob this one rejects)
    // must degrade to a loud warning — not surface as a failed statement
    // whose delete actually happened, the exact retry trap
    // maintainBestEffort exists to prevent.
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mntc")
    cellsDf.createOrReplaceTempView("catalog_spec_mntc")
    spark.sql(
      s"""CREATE TABLE $cat.mntc.t USING `graft-kv`
         |TBLPROPERTIES ('regions' = '1')
         |AS SELECT * FROM catalog_spec_mntc""".stripMargin)
    val dir = new Path(s"$wh/mntc/t")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    // corrupt the recorded props behind the catalog's back
    KvLog.writeText(fs, new Path(new Path(dir, KvLog.LogDirName),
      "_table_props"), "maintain=yes\n")
    spark.sql(s"DELETE FROM $cat.mntc.t WHERE rowKey = 'k01'")
    spark.sql(s"SELECT count(*) FROM $cat.mntc.t").head().getLong(0) shouldBe 2L
  }

  test("maintain property values are validated at CREATE, not at the first INSERT") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mntv")
    val e = intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE $cat.mntv.bad USING `graft-kv`
           |TBLPROPERTIES ('maintain' = 'yes')""".stripMargin)
    }
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ") should
      include("true|false")
    val e2 = intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE $cat.mntv.bad2 USING `graft-kv`
           |TBLPROPERTIES ('maintain' = 'true',
           |  'maintain_max_segments' = '0')""".stripMargin)
    }
    Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ") should
      include("maintain_max_segments")
    // neither table half-materialized
    assert(!fsOf(s"$wh/mntv").exists(new Path(s"$wh/mntv/bad")))
  }

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  test("INSERT OVERWRITE on an ADOPTED path-salted table preserves the salt registration") {
    // The r13 review's corruption case: a table salted by the PATH API
    // (registration in _log/_salt, no catalog property) and read by name.
    // The catalog's sink-side salting honors the path registration, so
    // the truncate must re-register it — otherwise the overwrite lands
    // stored-salted rows in a table every subsequent read treats as
    // unsalted (silent empty point lookups).
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.adopt")
    val p = s"$wh/adopt/ts"
    KvSalt.saltedWrite(cellsDf, p, n = 8, regions = 2, mode = "overwrite")
    val dir = new Path(p)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    assert(spark.sql(s"SELECT count(*) FROM $cat.adopt.ts WHERE rowKey = 'k01'")
      .head().getLong(0) == 2)
    cellsDf.createOrReplaceTempView("catalog_spec_adopt")
    spark.sql(s"INSERT OVERWRITE $cat.adopt.ts SELECT * FROM catalog_spec_adopt")
    KvSalt.bucketsOf(fs, dir) shouldBe Some(8)
    assert(spark.sql(s"SELECT count(*) FROM $cat.adopt.ts WHERE rowKey = 'k01'")
      .head().getLong(0) == 2,
      "the overwritten rows must stay reachable by LOGICAL key")
    // plain INSERT INTO the adopted table salts through the same path
    spark.sql(s"INSERT INTO $cat.adopt.ts SELECT * FROM catalog_spec_adopt")
    assert(spark.sql(s"SELECT count(*) FROM $cat.adopt.ts WHERE rowKey = 'k01'")
      .head().getLong(0) == 4)
  }

  test("cloneTo carries catalog table properties to the clone") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cln")
    cellsDf.createOrReplaceTempView("catalog_spec_cln")
    spark.sql(
      s"""CREATE TABLE $cat.cln.t13 USING `graft-kv`
         |TBLPROPERTIES ('regions' = '2', 'codec' = 'zstd')
         |AS SELECT * FROM catalog_spec_cln""".stripMargin)
    KvSnapshot.create(spark, s"$wh/cln/t13", "s")
    KvSnapshot.cloneTo(spark, s"$wh/cln/t13", "s", s"$wh/cln/t14")
    val fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())
    KvTableProps.read(fs, new Path(s"$wh/cln/t14")) shouldBe
      Map("regions" -> "2", "codec" -> "zstd")
    // and the clone is immediately addressable by name
    assert(spark.sql(s"SELECT count(*) FROM $cat.cln.t14").head().getLong(0) == 4)
  }

  test("SQL DELETE FROM commits markers; TRUNCATE resets; unsupported shapes refuse whole") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.del")
    cellsDf.createOrReplaceTempView("catalog_spec_cells4")
    spark.sql(
      s"""CREATE TABLE $cat.del.t6 USING `graft-kv`
         |TBLPROPERTIES ('regions' = '1')
         |AS SELECT * FROM catalog_spec_cells4""".stripMargin)
    // row delete by key: both k01 cells masked from every read
    spark.sql(s"DELETE FROM $cat.del.t6 WHERE rowKey = 'k01'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.del.t6").head().getLong(0) == 2)
    // it is a MARKER commit, not a rewrite: the raw view still has the puts
    val dir = s"$wh/del/t6"
    assert(spark.read.format("graft-kv").option("readTombstones", "true")
      .load(dir).count() == 5) // 4 puts + 1 marker
    // column delete by (key, family, qualifier)
    spark.sql(
      s"DELETE FROM $cat.del.t6 WHERE rowKey = 'k02' AND family = 'f' AND qualifier = 'a'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.del.t6").head().getLong(0) == 1)
    // a later INSERT with a HIGHER ts is visible (delete-at-now semantics)
    Seq(("k02", "f", "a", "back", 99L))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .createOrReplaceTempView("catalog_spec_back")
    spark.sql(s"INSERT INTO $cat.del.t6 SELECT * FROM catalog_spec_back")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.del.t6 WHERE rowKey = 'k02'").head().getLong(0) == 1)
    // a condition markers cannot express FALLS BACK to the masked
    // copy-on-write rewrite — live markers no longer refuse it (r13):
    // only the freshly re-inserted k02 (ts=99) matches and is dropped
    spark.sql(s"DELETE FROM $cat.del.t6 WHERE ts > 50")
    assert(spark.sql(s"SELECT count(*) FROM $cat.del.t6").head().getLong(0) == 1)
    // TRUNCATE TABLE is DML: it empties the table in ONE manifest entry
    // and PRESERVES everything else — catalog metadata, version history
    // (time travel to the pre-truncate seq still works), registrations.
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val preTruncateSeq = KvLog.latestSeq(fs, new Path(dir))
    val preTruncateCount =
      spark.sql(s"SELECT count(*) FROM $cat.del.t6").head().getLong(0)
    spark.sql(s"TRUNCATE TABLE $cat.del.t6")
    assert(spark.sql(s"SELECT count(*) FROM $cat.del.t6").head().getLong(0) == 0)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.del.t6 VERSION AS OF $preTruncateSeq")
      .head().getLong(0) == preTruncateCount,
      "TRUNCATE must preserve history: the pre-truncate version reads back")
    KvTableProps.read(fs, new Path(dir)).get("regions") shouldBe Some("1")
    spark.sql(s"INSERT INTO $cat.del.t6 SELECT * FROM catalog_spec_cells4")
    assert(KvLog.liveFiles(fs, new Path(dir)).size == 1,
      "post-truncate INSERT must still honor the recorded regions")
  }

  test("ranged SQL DELETE stays O(deletes): markers for the in-range keys, no rewrite") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.rng")
    (1 to 20).map(i => (f"k$i%02d", "f", "a", s"v$i", i.toLong))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .createOrReplaceTempView("catalog_spec_rng")
    spark.sql(
      s"""CREATE TABLE $cat.rng.t USING `graft-kv`
         |TBLPROPERTIES ('regions' = '2')
         |AS SELECT * FROM catalog_spec_rng""".stripMargin)
    val dir = new Path(s"$wh/rng/t")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val dataFiles = KvLog.liveFiles(fs, dir).toSet
    // half-open range erasure — the GDPR range shape
    spark.sql(s"DELETE FROM $cat.rng.t WHERE rowKey >= 'k05' AND rowKey < 'k11'")
    spark.sql(s"SELECT count(*) FROM $cat.rng.t").head().getLong(0) shouldBe 14
    spark.sql(s"SELECT min(rowKey), max(rowKey) FROM $cat.rng.t " +
      "WHERE rowKey >= 'k03' AND rowKey <= 'k13'").collect().head match {
      case r => (r.getString(0), r.getString(1)) shouldBe ("k03", "k13")
    }
    // MARKERS, not a rewrite: every original data file still live, plus
    // one marker segment carrying exactly the 6 in-range row tombstones
    val stats = KvLog.liveFileStats(fs, dir)
    val live = KvLog.liveFiles(fs, dir)
    assert(dataFiles.subsetOf(live.toSet), "a ranged delete must not rewrite data files")
    val markers = live.filterNot(dataFiles)
    markers.map(n => stats(n).tombstones).sum shouldBe 6L
    // prefix delete (LIKE 'p%') rides the same path
    spark.sql(s"DELETE FROM $cat.rng.t WHERE rowKey LIKE 'k2%'")
    spark.sql(s"SELECT max(rowKey) FROM $cat.rng.t").head().getString(0) shouldBe "k19"
    // already-masked keys get no second marker: the enumeration is masked
    val before = KvLog.liveFileStats(fs, dir).values.map(_.tombstones).sum
    spark.sql(s"DELETE FROM $cat.rng.t WHERE rowKey >= 'k05' AND rowKey < 'k11'")
    KvLog.liveFileStats(fs, dir).values.map(_.tombstones).sum shouldBe before
    // The enumeration honors ALL conjuncts (r13 review): a ranged delete
    // with a column conjunct marks only the keys that CARRY a matching
    // cell — O(matching keys), never one marker per range key (which
    // would both race toward MaxLiveMarkers and spuriously mask future
    // inserts at never-matched coordinates).
    Seq("k01", "k02", "k03", "k04").zipWithIndex
      .map { case (k, i) => (k, "f", "b", s"w$i", 31L + i) }
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .createOrReplaceTempView("catalog_spec_rng_b")
    spark.sql(s"INSERT INTO $cat.rng.t SELECT * FROM catalog_spec_rng_b")
    val beforeCol = KvLog.liveFileStats(fs, dir).values.map(_.tombstones).sum
    spark.sql(s"DELETE FROM $cat.rng.t WHERE rowKey >= 'k01' AND " +
      "rowKey < 'k20' AND family = 'f' AND qualifier = 'b'")
    KvLog.liveFileStats(fs, dir).values.map(_.tombstones).sum shouldBe
      (beforeCol + 4L) // only the 4 keys holding an (f, b) cell
    spark.sql(s"SELECT count(*) FROM $cat.rng.t WHERE qualifier = 'b'")
      .head().getLong(0) shouldBe 0L
    // Same for a ts conjunct: only keys with a cell at/under the bound.
    val beforeTs = KvLog.liveFileStats(fs, dir).values.map(_.tombstones).sum
    spark.sql(s"DELETE FROM $cat.rng.t WHERE rowKey >= 'k12' AND " +
      "rowKey <= 'k19' AND ts <= 13")
    KvLog.liveFileStats(fs, dir).values.map(_.tombstones).sum shouldBe
      (beforeTs + 2L) // k12 (ts 12) and k13 (ts 13) match; k14..k19 do not
    spark.sql(s"SELECT count(*) FROM $cat.rng.t " +
      "WHERE rowKey >= 'k12' AND rowKey <= 'k19'").head().getLong(0) shouldBe 6L
  }

  test("SQL time travel: VERSION AS OF reads the named manifest seq") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.tt")
    cellsDf.createOrReplaceTempView("catalog_spec_cells5")
    spark.sql(
      s"""CREATE TABLE $cat.tt.t7 USING `graft-kv`
         |TBLPROPERTIES ('regions' = '1')
         |AS SELECT * FROM catalog_spec_cells5""".stripMargin)
    spark.sql(s"INSERT INTO $cat.tt.t7 SELECT * FROM catalog_spec_cells5")
    assert(spark.sql(s"SELECT count(*) FROM $cat.tt.t7").head().getLong(0) == 8)
    assert(spark.sql(s"SELECT count(*) FROM $cat.tt.t7 VERSION AS OF 0")
      .head().getLong(0) == 4)
    // TIMESTAMP AS OF far in the future resolves to the latest version
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.tt.t7 TIMESTAMP AS OF '2199-01-01 00:00:00'")
      .head().getLong(0) == 8)
    an[Exception] should be thrownBy
      spark.sql(s"SELECT count(*) FROM $cat.tt.t7 VERSION AS OF 'goldenish'").collect()
  }

  test("SQL UPDATE rewrites only the affected groups; DELETE falls back to a rewrite for non-key conditions") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.rlo")
    // 8 keys across 2 region files
    (1 to 8).map(i => (f"k$i%02d", "f", "a", s"v$i", i.toLong))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .createOrReplaceTempView("catalog_spec_rlo")
    spark.sql(
      s"""CREATE TABLE $cat.rlo.t8 USING `graft-kv`
         |TBLPROPERTIES ('regions' = '2')
         |AS SELECT * FROM catalog_spec_rlo""".stripMargin)
    val dir = new Path(s"$wh/rlo/t8")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val seqBefore = KvLog.latestSeq(fs, dir)
    // keyed UPDATE: static group pruning touches ONE of the two regions
    spark.sql(s"UPDATE $cat.rlo.t8 SET value = CAST('patched' AS BINARY) " +
      "WHERE rowKey = 'k01'")
    val entry = KvLog.read(fs, dir, KvLog.latestSeq(fs, dir)).get
    assert(entry.removes.size == 1,
      s"a keyed UPDATE must replace one group, removed ${entry.removes}")
    val after = spark.sql(
      s"SELECT rowKey, CAST(value AS STRING) v FROM $cat.rlo.t8 ORDER BY rowKey")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    after.head shouldBe ("k01", "patched")
    after.map(_._1) shouldBe (1 to 8).map(i => f"k$i%02d")
    assert(after.count(_._2 == "patched") == 1, "only k01 updated")
    // non-key DELETE cannot be a marker: the group-based fallback rewrites
    spark.sql(s"DELETE FROM $cat.rlo.t8 WHERE ts % 2 = 0")
    assert(spark.sql(s"SELECT count(*) FROM $cat.rlo.t8").head().getLong(0) == 4)
    // physically gone, zero markers involved
    assert(spark.read.format("graft-kv").option("readTombstones", "true")
      .load(dir.toString).count() == 4)
    assert(KvLog.latestSeq(fs, dir) > seqBefore + 1)
  }

  test("MERGE INTO updates matches and inserts the rest through one atomic group swap") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mrg")
    cellsDf.createOrReplaceTempView("catalog_spec_mrg_base")
    spark.sql(
      s"""CREATE TABLE $cat.mrg.t9 USING `graft-kv`
         |TBLPROPERTIES ('regions' = '1')
         |AS SELECT * FROM catalog_spec_mrg_base""".stripMargin)
    Seq(("k01", "f", "a", "merged", 99L), ("k09", "f", "z", "fresh", 50L))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .createOrReplaceTempView("catalog_spec_mrg_src")
    spark.sql(
      s"""MERGE INTO $cat.mrg.t9 t
         |USING catalog_spec_mrg_src s
         |ON t.rowKey = s.rowKey AND t.family = s.family
         |   AND t.qualifier = s.qualifier
         |WHEN MATCHED THEN UPDATE SET value = s.value, ts = s.ts
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.sql(
      s"SELECT rowKey, qualifier, CAST(value AS STRING) v, ts " +
        s"FROM $cat.mrg.t9 ORDER BY rowKey, qualifier")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    out.length shouldBe 5
    assert(out.contains(("k01", "a", "merged", 99L)), "matched row updated")
    assert(out.contains(("k09", "z", "fresh", 50L)), "unmatched row inserted")
    assert(out.contains(("k02", "a", "v3", 12L)), "untouched rows copied through")
  }

  test("row-level rewrites preserve the table's recorded regions layout") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.rlay")
    (1 to 64).map(i => (f"k$i%03d", "f", "a", s"v$i", i.toLong))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .createOrReplaceTempView("catalog_spec_rlay")
    spark.sql(
      s"""CREATE TABLE $cat.rlay.t USING `graft-kv`
         |TBLPROPERTIES ('regions' = '3')
         |AS SELECT * FROM catalog_spec_rlay""".stripMargin)
    val dir = new Path(s"$wh/rlay/t")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    KvLog.liveFiles(fs, dir).size shouldBe 3
    // an unkeyed UPDATE rewrites every group — the replacement must come
    // back as the RECORDED 3 regions, not the operation default of 8
    spark.sql(s"UPDATE $cat.rlay.t SET ts = ts + 100")
    KvLog.liveFiles(fs, dir).size shouldBe 3
    spark.sql(s"SELECT min(ts) FROM $cat.rlay.t").head().getLong(0) shouldBe 101L
  }

  test("tablePathOf validates identifier segments like the catalog proper") {
    wh: Unit
    GraftKvCatalog.tablePathOf(spark, s"$cat.ns1.t1") shouldBe s"$wh/ns1/t1"
    an[IllegalArgumentException] should be thrownBy
      GraftKvCatalog.tablePathOf(spark, s"$cat.ns1.bad/segment")
    an[IllegalArgumentException] should be thrownBy
      GraftKvCatalog.tablePathOf(spark, s"$cat..t1")
  }

  test("rewrites COMPOSE with marker deletes: UPDATE over live tombstones re-emits them compacted") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.rref")
    cellsDf.createOrReplaceTempView("catalog_spec_rref")
    spark.sql(
      s"""CREATE TABLE $cat.rref.t10 USING `graft-kv`
         |TBLPROPERTIES ('regions' = '1')
         |AS SELECT * FROM catalog_spec_rref""".stripMargin)
    val dir = new Path(s"$wh/rref/t10")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    // forever-mask k01 (path API) + at-now-mask k02 (SQL marker fast path)
    KvDelete.deleteRows(spark, s"$wh/rref/t10", Seq("k01").toDF("rowKey"))
    spark.sql(s"DELETE FROM $cat.rref.t10 WHERE rowKey = 'k02'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.rref.t10").head().getLong(0) == 1)
    // the composition every mutable-table user writes: UPDATE while the
    // markers are still unpurged — a masked copy-on-write, no refusal.
    // A CONDITIONED update's runtime group filtering retires only the
    // matched data group: the unrelated marker segments stay live,
    // untouched, and still masking.
    spark.sql(s"UPDATE $cat.rref.t10 SET ts = 50 WHERE ts = 13")
    val out = spark.sql(
      s"SELECT rowKey, ts FROM $cat.rref.t10 ORDER BY rowKey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    out shouldBe Seq(("k03", 50L)) // deleted keys stay masked post-rewrite
    val stats0 = KvLog.liveFileStats(fs, dir)
    KvLog.liveFiles(fs, dir)
      .count(n => stats0.get(n).exists(_.tombstones > 0)) shouldBe 2
    // an UNKEYED update is the full rewrite: the marker segments are
    // retired too and re-enter as ONE compacted sidecar file inside the
    // same atomic entry — 2 live markers preserved, masked puts dropped
    spark.sql(s"UPDATE $cat.rref.t10 SET ts = 51")
    val stats = KvLog.liveFileStats(fs, dir)
    val live = KvLog.liveFiles(fs, dir)
    val markerFiles = live.filter(n => stats.get(n).exists(_.tombstones > 0))
    markerFiles.size shouldBe 1
    stats(markerFiles.head).tombstones shouldBe 2L
    // the sidecar seals under the reserved NON-NUMERIC "m" label — a
    // namespace no demux writer slot (partition*buckets+bucket) can reach
    markerFiles.head should include("-m-")
    val raw = spark.read.format("graft-kv").option("readTombstones", "true")
      .load(dir.toString).collect()
    // raw = 1 surviving updated put + 2 re-emitted markers; the masked
    // puts of k01/k02 are physically gone from the replacement files
    raw.length shouldBe 3
    spark.sql(s"SELECT rowKey, ts FROM $cat.rref.t10").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe Seq(("k03", 51L))
    // a delete at-now is not forever: re-inserting k02 with a NEWER ts
    // survives the re-emitted marker; forever-masked k01 stays dark
    Seq(("k01", "f", "a", "back", 99L), ("k02", "f", "a", "back", 99L))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .createOrReplaceTempView("catalog_spec_rref_back")
    spark.sql(s"INSERT INTO $cat.rref.t10 SELECT * FROM catalog_spec_rref_back")
    spark.sql(s"SELECT rowKey FROM $cat.rref.t10 ORDER BY rowKey").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("k02", "k03")
  }

  test("SQL UPDATE/MERGE work on salted tables: replacements re-salt and stay certified") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.sref")
    spark.sql(
      s"""CREATE TABLE $cat.sref.tsalt (
         |  rowKey STRING, family STRING, qualifier STRING,
         |  value BINARY, ts BIGINT)
         |USING `graft-kv`
         |TBLPROPERTIES ('regions' = '2', 'salt_buckets' = '4')""".stripMargin)
    val p = s"$wh/sref/tsalt"
    KvSalt.saltedWrite(cellsDf, p, n = 4, regions = 2)
    KvCompactor.compact(spark, p, regions = 2) shouldBe a[KvCompactor.Compacted]
    assert(KvTableInfo.keyContiguousRegions(spark, p), "compacted salted table certifies")
    // unkeyed UPDATE = full rewrite: every group retired, the demux
    // re-salts each replacement row — logical results, salt invisible
    spark.sql(s"UPDATE $cat.sref.tsalt SET ts = ts + 100")
    spark.sql(s"SELECT rowKey, ts FROM $cat.sref.tsalt ORDER BY rowKey, ts")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
      Seq(("k01", 110L), ("k01", 111L), ("k02", 112L), ("k03", 113L))
    // the layout came back stored-disjoint-sorted: the contiguity tier
    // still certifies, the strict logical tier still refuses salted
    assert(KvTableInfo.keyContiguousRegions(spark, p),
      "a full salted rewrite must re-certify stored-space contiguity")
    assert(!KvTableInfo.disjointSortedRegions(spark, p))
    val dir = new Path(p)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val stats = KvLog.liveFileStats(fs, dir)
    assert(KvLog.liveFiles(fs, dir).forall(n => stats.get(n).exists(st =>
      st.minKey.exists(_.matches("\\d{3}\\|.*")))),
      "every replacement file stores salted keys")
    // keyed UPDATE: the expanded predicate routes to the one salted group
    spark.sql(s"UPDATE $cat.sref.tsalt SET value = CAST('patched' AS BINARY) " +
      "WHERE rowKey = 'k02'")
    spark.sql(s"SELECT CAST(value AS STRING) FROM $cat.sref.tsalt " +
      "WHERE rowKey = 'k02'").head().getString(0) shouldBe "patched"
    // two-branch MERGE (insert-only MERGE optimizes to a plain append,
    // which keeps refusing unsalted SQL rows like INSERT does): the
    // NOT MATCHED row is salted by the replacement demux on the way in —
    // a raw (unsalted) store would garble the salt-stripping read
    Seq(("k03", "g", "c", "merged", 90L), ("k09", "f", "z", "fresh", 50L))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .createOrReplaceTempView("catalog_spec_salt_src")
    spark.sql(
      s"""MERGE INTO $cat.sref.tsalt t
         |USING catalog_spec_salt_src s
         |ON t.rowKey = s.rowKey AND t.family = s.family
         |   AND t.qualifier = s.qualifier
         |WHEN MATCHED THEN UPDATE SET value = s.value, ts = s.ts
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql(s"SELECT CAST(value AS STRING) FROM $cat.sref.tsalt " +
      "WHERE rowKey = 'k09'").head().getString(0) shouldBe "fresh"
    spark.sql(s"SELECT CAST(value AS STRING) FROM $cat.sref.tsalt " +
      "WHERE rowKey = 'k03'").head().getString(0) shouldBe "merged"
  }

  test("INSERT OVERWRITE truncates then loads; recorded properties survive") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.iow")
    cellsDf.createOrReplaceTempView("catalog_spec_iow")
    spark.sql(
      s"""CREATE TABLE $cat.iow.t12 USING `graft-kv`
         |TBLPROPERTIES ('regions' = '2')
         |AS SELECT * FROM catalog_spec_iow""".stripMargin)
    spark.sql(s"INSERT INTO $cat.iow.t12 SELECT * FROM catalog_spec_iow")
    assert(spark.sql(s"SELECT count(*) FROM $cat.iow.t12").head().getLong(0) == 8)
    spark.sql(s"INSERT OVERWRITE $cat.iow.t12 SELECT * FROM catalog_spec_iow")
    assert(spark.sql(s"SELECT count(*) FROM $cat.iow.t12").head().getLong(0) == 4)
    val dir = new Path(s"$wh/iow/t12")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    KvTableProps.read(fs, dir).get("regions") shouldBe Some("2")
    assert(KvLog.liveFiles(fs, dir).size == 2,
      "the overwrite honors the recorded regions")
  }

  test("streaming reads by NAME: readStream.table tails a catalog table") {
    import org.apache.spark.sql.streaming.Trigger
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.strm")
    cellsDf.createOrReplaceTempView("catalog_spec_strm")
    spark.sql(
      s"""CREATE TABLE $cat.strm.t11 USING `graft-kv`
         |TBLPROPERTIES ('regions' = '1')
         |AS SELECT * FROM catalog_spec_strm""".stripMargin)
    val out = s"${sys.props("java.io.tmpdir")}/graft_test/kv_cat_stream_out"
    val cp = s"${out}_cp"
    Seq(out, cp).foreach(graft.sinks.Sinks.deleteRecursive(spark, _))
    val q = spark.readStream.table(s"$cat.strm.t11")
      .writeStream.format("parquet")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start(out)
    q.awaitTermination()
    spark.read.parquet(out).count() shouldBe 4
    // source-enforced FAMILY scope composes with name resolution (the
    // replication-peer contract — configuration, not consumer filters)
    val outF = s"${out}_fam"
    Seq(outF, outF + "_cp").foreach(graft.sinks.Sinks.deleteRecursive(spark, _))
    val qf = spark.readStream.option("family", "g").table(s"$cat.strm.t11")
      .writeStream.format("parquet")
      .option("checkpointLocation", outF + "_cp")
      .trigger(Trigger.AvailableNow()).start(outF)
    qf.awaitTermination()
    spark.read.parquet(outF).select("rowKey").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("k03")
    // sinceSeq resume by name: a fresh-checkpoint tail starting after
    // seq 0 sees only the post-CTAS commit
    cellsDf.limit(1).createOrReplaceTempView("catalog_spec_strm2")
    spark.sql(s"INSERT INTO $cat.strm.t11 SELECT * FROM catalog_spec_strm2")
    val outS = s"${out}_since"
    Seq(outS, outS + "_cp").foreach(graft.sinks.Sinks.deleteRecursive(spark, _))
    val qs = spark.readStream.option("sinceSeq", 0).table(s"$cat.strm.t11")
      .writeStream.format("parquet")
      .option("checkpointLocation", outS + "_cp")
      .trigger(Trigger.AvailableNow()).start(outS)
    qs.awaitTermination()
    spark.read.parquet(outS).count() shouldBe 1
  }

  test("streaming reads by NAME strip the salt of a salted catalog table") {
    import org.apache.spark.sql.streaming.Trigger
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.strs")
    spark.sql(
      s"""CREATE TABLE $cat.strs.t14 (
         |  rowKey STRING, family STRING, qualifier STRING,
         |  value BINARY, ts BIGINT)
         |USING `graft-kv`
         |TBLPROPERTIES ('regions' = '1', 'salt_buckets' = '4')""".stripMargin)
    cellsDf.createOrReplaceTempView("catalog_spec_strs")
    spark.sql(s"INSERT INTO $cat.strs.t14 SELECT * FROM catalog_spec_strs")
    val out = s"${sys.props("java.io.tmpdir")}/graft_test/kv_cat_saltstream_out"
    val cp = s"${out}_cp"
    Seq(out, cp).foreach(graft.sinks.Sinks.deleteRecursive(spark, _))
    val q = spark.readStream.table(s"$cat.strs.t14")
      .writeStream.format("parquet")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start(out)
    q.awaitTermination()
    // the tail emits LOGICAL keys although the stored files are salted
    spark.read.parquet(out).select("rowKey").collect()
      .map(_.getString(0)).sorted.toSeq shouldBe
      Seq("k01", "k01", "k02", "k03")
  }

  test("an out-of-band-corrupted maintain property degrades best-effort: INSERT still commits") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lenient")
    spark.sql(
      s"""CREATE TABLE $cat.lenient.t12 (
         |  rowKey STRING, family STRING, qualifier STRING,
         |  value BINARY, ts BIGINT)
         |USING `graft-kv`
         |TBLPROPERTIES ('regions' = '1', 'maintain' = 'true')""".stripMargin)
    // corrupt the RECORDED property behind the catalog's back — the
    // eager CREATE validation can't see this, and the write surface must
    // degrade exactly like the DELETE path does (warn, skip the policy
    // pass, commit the statement)
    val dir = new Path(s"$wh/lenient/t12")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    KvTableProps.write(fs, dir,
      Map("regions" -> "1", "maintain" -> "yes",
        "maintain_max_segments" -> "zero"))
    cellsDf.createOrReplaceTempView("catalog_spec_lenient")
    spark.sql(s"INSERT INTO $cat.lenient.t12 SELECT * FROM catalog_spec_lenient")
    spark.sql(s"SELECT count(*) FROM $cat.lenient.t12").head().getLong(0) shouldBe 4L
    spark.sql(s"DELETE FROM $cat.lenient.t12 WHERE rowKey = 'k01'")
    spark.sql(s"SELECT count(*) FROM $cat.lenient.t12").head().getLong(0) shouldBe 2L
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES mutates recorded write defaults with CREATE's validation") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.alt")
    spark.sql(
      s"""CREATE TABLE $cat.alt.t13 (
         |  rowKey STRING, family STRING, qualifier STRING,
         |  value BINARY, ts BIGINT)
         |USING `graft-kv` TBLPROPERTIES ('regions' = '1')""".stripMargin)
    def recorded: Map[String, String] =
      spark.sql(s"SHOW TBLPROPERTIES $cat.alt.t13").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    // SET a new write default + turn maintenance ON after the fact — the
    // top UX gap self-maintaining tables created: the policy is a table
    // property, so changing it must not destroy the table
    spark.sql(s"ALTER TABLE $cat.alt.t13 SET TBLPROPERTIES " +
      "('regions' = '2', 'maintain' = 'true', " +
      "'maintain_max_segments' = '2', 'maintain_grace_ms' = '0')")
    recorded("regions") shouldBe "2"
    recorded("maintain") shouldBe "true"
    cellsDf.createOrReplaceTempView("catalog_spec_alter")
    // the next INSERTs resolve the ALTERed defaults: regions=2 fan-out,
    // and the third commit crosses max_segments=2 so the policy pass
    // compacts — maintenance demonstrably ACTIVE on a table created
    // without it
    val dir = new Path(s"$wh/alt/t13")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    spark.sql(s"INSERT INTO $cat.alt.t13 SELECT * FROM catalog_spec_alter")
    KvLog.liveFiles(fs, dir).size shouldBe 2
    spark.sql(s"INSERT INTO $cat.alt.t13 SELECT * FROM catalog_spec_alter")
    spark.sql(s"INSERT INTO $cat.alt.t13 SELECT * FROM catalog_spec_alter")
    assert(KvLog.liveFiles(fs, dir).size <= 2,
      "the ALTERed maintain policy must bound the segment count")
    spark.sql(s"SELECT count(*) FROM $cat.alt.t13").head().getLong(0) shouldBe 12L
    // an INVALID value is refused and the recorded properties stay intact
    an[Exception] should be thrownBy spark.sql(
      s"ALTER TABLE $cat.alt.t13 SET TBLPROPERTIES ('maintain' = 'maybe')")
    an[Exception] should be thrownBy spark.sql(
      s"ALTER TABLE $cat.alt.t13 SET TBLPROPERTIES ('regions' = '0')")
    an[Exception] should be thrownBy spark.sql(
      s"ALTER TABLE $cat.alt.t13 SET TBLPROPERTIES ('codec' = 'lzo')")
    an[Exception] should be thrownBy spark.sql(
      s"ALTER TABLE $cat.alt.t13 SET TBLPROPERTIES ('not_a_knob' = 'x')")
    recorded("maintain") shouldBe "true"
    recorded("regions") shouldBe "2"
    // salt_buckets is LAYOUT: altering it keeps refusing, with the reason
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.alt.t13 SET TBLPROPERTIES ('salt_buckets' = '4')"))
    e.getMessage should include("LAYOUT")
    // UNSET turns maintenance back off; unknown keys refuse
    spark.sql(s"ALTER TABLE $cat.alt.t13 UNSET TBLPROPERTIES " +
      "('maintain', 'maintain_max_segments', 'maintain_grace_ms')")
    recorded.contains("maintain") shouldBe false
    recorded("regions") shouldBe "2"
  }

  test("ALTER refuses schema changes; RENAME moves the directory; DROP NAMESPACE honors CASCADE") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ops")
    spark.sql(
      s"""CREATE TABLE $cat.ops.t4 (
         |  rowKey STRING, family STRING, qualifier STRING,
         |  value BINARY, ts BIGINT) USING `graft-kv`""".stripMargin)
    an[Exception] should be thrownBy
      spark.sql(s"ALTER TABLE $cat.ops.t4 ADD COLUMN extra STRING")
    spark.sql(s"ALTER TABLE $cat.ops.t4 RENAME TO ops.t5")
    assert(spark.sql(s"SHOW TABLES IN $cat.ops").collect()
      .map(_.getString(1)).toSet == Set("t5"))
    an[Exception] should be thrownBy spark.sql(s"DROP NAMESPACE $cat.ops")
    spark.sql(s"DROP NAMESPACE $cat.ops CASCADE")
    assert(!spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).contains("ops"))
  }
}
