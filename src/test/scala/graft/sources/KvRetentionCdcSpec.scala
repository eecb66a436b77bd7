package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-VISIBLE RETENTION (r17): a ttl/versions compaction stages its
  * dropped coordinates as exact-version delete markers in side files the
  * manifest entry references (`!` lines, [[KvLog.Entry.dropFiles]] — the
  * Delta CDF delete-row shape), so change feeds CROSS the pass by
  * shipping the drops instead of refusing. These specs pin the
  * lifecycle around the happy paths [[KvIndexRetentionSpec]] covers:
  * the zero-drop pass publishing a PLAIN merge (a declared policy that
  * expired nothing must not poison CDC spans), the entry round-trip,
  * vacuum protection vs stray reclamation, truncation cleanup, and the
  * exact-version marker application semantics.
  */
class KvRetentionCdcSpec extends graft.SparkSpec {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_retcdc_$name"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    d
  }

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  /** Two versions per key at ts = i and ts = i + 100000. */
  private def twoVersions(n: Int): DataFrame = {
    val v1 = spark.range(n.toLong).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'amt' AS qualifier",
      "encode(CAST(id * 3 AS STRING), 'UTF-8') AS value", "id AS ts")
    val v2 = spark.range(n.toLong).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'amt' AS qualifier",
      "encode(CAST(id * 3 + 1 AS STRING), 'UTF-8') AS value",
      "id + 100000L AS ts")
    v1.unionByName(v2)
  }

  test("a policy pass that drops NOTHING publishes a plain merge — no flag, no files") {
    val dir = freshDir("noop_drop")
    // two commits so the merge has real work; every ts >= 0, so a TTL at
    // 0 and a versions bound of 8 both expire nothing
    val cells = twoVersions(200)
    cells.filter(col("ts") < 100000).write.format("graft-kv")
      .option("regions", 2).mode("append").save(dir)
    cells.filter(col("ts") >= 100000).write.format("graft-kv")
      .option("regions", 2).mode("append").save(dir)
    val res = KvCompactor.compact(spark, dir, regions = 2,
      cellPolicy = KvCompactor.CellPolicy(
        dropBelowTs = Some(0L), maxVersions = Some(8)))
    res shouldBe a[KvCompactor.Compacted]
    res.asInstanceOf[KvCompactor.Compacted].dropped shouldBe 0L
    val fs = fsOf(dir)
    val table = new Path(dir)
    val entry = KvLog.read(fs, table, KvLog.latestSeq(fs, table)).get
    entry.contentDrop shouldBe false // ADVICE r16: gate on counted drops
    entry.dropFiles shouldBe empty
    // the span over the pass is CDC-transparent, like any plain merge
    spark.read.format("graft-kv").option("sinceSeq", "1").load(dir)
      .count() shouldBe 0L
    // and no drop side files were left behind
    fs.listStatus(table).map(_.getPath.getName)
      .count(_.startsWith("drops-")) shouldBe 0
  }

  test("a dropping pass round-trips its drop files through the entry") {
    val dir = freshDir("roundtrip")
    twoVersions(300).write.format("graft-kv").option("regions", 2)
      .mode("overwrite").save(dir)
    val res = KvCompactor.compact(spark, dir, regions = 2,
      cellPolicy = KvCompactor.CellPolicy(maxVersions = Some(1)))
    res.asInstanceOf[KvCompactor.Compacted].dropped shouldBe 300L
    val fs = fsOf(dir)
    val table = new Path(dir)
    val entry = KvLog.read(fs, table, KvLog.latestSeq(fs, table)).get
    entry.contentDrop shouldBe true
    entry.dropFiles should not be empty
    entry.dropFiles.foreach { n =>
      n should startWith("drops-")
      assert(fs.exists(new Path(table, n)), s"drop file $n missing on disk")
    }
    // drop files are NOT live data: a full scan never reads them
    spark.read.format("graft-kv").load(dir).count() shouldBe 300L
    spark.read.format("graft-kv").load(dir)
      .filter(col("qualifier").startsWith(KvDelete.MarkerPrefix))
      .count() shouldBe 0L
    // the records carry the dropped cells' own coordinates
    val recs = spark.read.parquet(
      entry.dropFiles.map(n => s"$dir/$n"): _*)
    recs.count() shouldBe 300L
    recs.schema.fieldNames.toSeq shouldBe
      Seq("rowKey", "family", "qualifier", "value", "ts")
    recs.filter(col("qualifier")
      .startsWith(KvDelete.VersionMarkerPrefix)).count() shouldBe 300L
    recs.agg(max("ts")).head().getLong(0) should be < 100000L // only v1 dropped
    // fsck accounts the referenced drop files; losing one is a health
    // failure (CDC spans would die mid-read with no planned refusal)
    val rep = KvFsck.check(spark, dir)
    rep.dropFiles shouldBe entry.dropFiles.size.toLong
    rep.dropMissing shouldBe 0L
    rep.healthy shouldBe true
    fs.delete(new Path(table, entry.dropFiles.head), false) shouldBe true
    val broken = KvFsck.check(spark, dir)
    broken.dropMissing shouldBe 1L
    broken.healthy shouldBe false
  }

  test("vacuum spares referenced drop files and reclaims strays; truncate reclaims with the entry") {
    val dir = freshDir("lifecycle")
    twoVersions(100).write.format("graft-kv").option("regions", 1)
      .mode("overwrite").save(dir)
    val res = KvCompactor.compact(spark, dir, regions = 1,
      cellPolicy = KvCompactor.CellPolicy(maxVersions = Some(1)))
    res.asInstanceOf[KvCompactor.Compacted].dropped shouldBe 100L
    val fs = fsOf(dir)
    val table = new Path(dir)
    val referenced = KvLog.read(fs, table, KvLog.latestSeq(fs, table)).get.dropFiles
    referenced should not be empty
    // plant a stray: a drop file no entry references (crashed publish),
    // aged past any grace
    val stray = new Path(table, "drops-0000000099-00000.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new Path(table, referenced.head), fs, stray, false, fs.getConf)
    fs.setTimes(stray, 1000L, -1)
    KvVacuum.vacuum(spark, dir, graceMs = 0L) match {
      case v: KvVacuum.Vacuumed => assert(v.deletedFiles >= 1)
      case other => fail(s"vacuum did not run: $other")
    }
    assert(!fs.exists(stray), "unreferenced drop stray must be reclaimed")
    referenced.foreach { n =>
      assert(fs.exists(new Path(table, n)),
        s"vacuum reclaimed referenced drop file $n")
    }
    // the feed still serves after the vacuum pass
    spark.read.format("graft-kv").option("sinceSeq", "0").load(dir)
      .count() shouldBe 100L
    // truncation: once the entry itself expires below the floor, its
    // drop files go with it. Age the pre-floor entries and truncate.
    val latest = KvLog.latestSeq(fs, table)
    val dropSeq = latest // the retention pass is the tip + floor setter
    // a later plain compact raises the floor past the drop entry
    twoVersions(10).filter(col("ts") >= 100000)
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir)
    KvCompactor.compact(spark, dir, regions = 1) shouldBe
      a[KvCompactor.Compacted]
    (0L to dropSeq).foreach { s =>
      val p = new Path(new Path(table, "_log"), f"$s%020d")
      if (fs.exists(p)) fs.setTimes(p, 1000L, -1)
    }
    KvLog.truncate(fs, table, retentionMs = 0L)
    assert(KvLog.earliestSeq(fs, table) > dropSeq,
      "truncation must pass the drop entry for this leg to bite")
    referenced.foreach { n =>
      assert(!fs.exists(new Path(table, n)),
        s"truncate left drop file $n of a truncated entry behind")
    }
  }

  test("a raw replication pipe converges: feed markers mask on the target and compact away") {
    val src = freshDir("repl_src")
    twoVersions(150).write.format("graft-kv").option("regions", 2)
      .mode("overwrite").save(src) // seq 0
    val res = KvCompactor.compact(spark, src, regions = 2,
      cellPolicy = KvCompactor.CellPolicy(maxVersions = Some(1)))
    res.asInstanceOf[KvCompactor.Compacted].dropped shouldBe 150L
    // the HBase replication shape: baseline + raw change feed (markers
    // included) land on the target through the ordinary sink
    val dst = freshDir("repl_dst")
    spark.read.format("graft-kv").option("asOfSeq", "0").load(src)
      .write.format("graft-kv").option("regions", 2)
      .mode("append").save(dst)
    spark.read.format("graft-kv").option("sinceSeq", "0").load(src)
      .write.format("graft-kv").option("regions", 1)
      .option("allowTombstones", "true").mode("append").save(dst)
    def scanned(dir: String) = spark.read.format("graft-kv").load(dir)
      .select("rowKey", "family", "qualifier", "value", "ts")
      .as[(String, String, String, Array[Byte], Long)].collect()
      .map(r => (r._1, r._2, r._3, new String(r._4, "UTF-8"), r._5)).toSet
    // read-time convergence: the replicated exact-version markers MASK
    // the dropped versions (the HBase Delete semantics)
    scanned(dst) shouldBe scanned(src)
    val fs = fsOf(dst)
    KvLog.liveFileStats(fs, new Path(dst)).values
      .map(_.tombstones).sum should be > 0L
    // physical convergence: the target's own major compaction APPLIES
    // the version markers (dropping the masked puts) and purges them
    KvCompactor.compact(spark, dst, regions = 1) shouldBe
      a[KvCompactor.Compacted]
    KvLog.liveFileStats(fs, new Path(dst)).values
      .map(_.tombstones).sum shouldBe 0L
    spark.read.format("graft-kv").option("readTombstones", "true").load(dst)
      .count() shouldBe 150L // 150 retained puts, zero marker cells
    scanned(dst) shouldBe scanned(src)
  }

  test("a minor tier pass with a policy drops only from the merged cohort; the span still reconstructs") {
    val dir = freshDir("minor_drops")
    // two SIMILAR-SIZED small segments (the minor tier) + one far larger
    // segment the tier selection leaves carried
    val cells = twoVersions(60)
    cells.filter(col("ts") < 100000 && col("ts") % 2 === 0)
      .write.format("graft-kv").option("regions", 1)
      .mode("append").save(dir) // seq 0: small (30 v1 cells)
    cells.filter(col("ts") < 100000 && col("ts") % 2 === 1)
      .write.format("graft-kv").option("regions", 1)
      .mode("append").save(dir) // seq 1: small (30 v1 cells)
    twoVersions(900).filter(col("ts") >= 100000)
      .write.format("graft-kv").option("regions", 1)
      .mode("append").save(dir) // seq 2: large (900 v2 cells) — carried
    // TTL watermark inside the tier's ts range: half the merged cells
    // drop, half survive the rewrite; the carried large segment (all v2,
    // far above the watermark) is untouched
    val res = KvCompactor.compact(spark, dir, regions = 1,
      selection = KvCompactor.Minor(),
      cellPolicy = KvCompactor.CellPolicy(dropBelowTs = Some(30L)))
    res shouldBe KvCompactor.Compacted(3L, merged = 2, into = 1,
      dropped = 30L)
    val fs = fsOf(dir)
    val entry = KvLog.read(fs, new Path(dir), 3L).get
    entry.contentDrop shouldBe true
    entry.dropFiles should not be empty
    // carried file rides the checkpoint's adds untouched
    spark.read.format("graft-kv").load(dir).count() shouldBe 930L
    // the span over the PARTIAL pass reconstructs exactly, like a major
    val baseline = spark.read.format("graft-kv")
      .option("asOfSeq", "2").load(dir)
    val feed = spark.read.format("graft-kv")
      .option("sinceSeq", "2").load(dir)
    feed.count() shouldBe 30L
    KvDelete.applyVersionMarkers(baseline.unionByName(feed), feed)
      .count() shouldBe 930L
  }

  test("value-aware masking: a same-ts value tie drops exactly the copy the source dropped") {
    val src = freshDir("tie_src")
    // two cells per key at the SAME (rowKey, family, qualifier, ts),
    // different values — the degenerate corner where coordinate+ts
    // matching alone cannot tell the dropped copy from the kept one
    def tied(prefix: String) = spark.range(40L).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'amt' AS qualifier",
      s"encode(concat('$prefix', CAST(id AS STRING)), 'UTF-8') AS value",
      "CAST(7 AS BIGINT) AS ts")
    tied("A").unionByName(tied("B")).write.format("graft-kv")
      .option("regions", 1).mode("overwrite").save(src)
    // versions=1 keeps the (ts desc, value asc) rank-1 copy — the
    // A-values — and stages drop records naming the B-values
    val res = KvCompactor.compact(spark, src, regions = 1,
      cellPolicy = KvCompactor.CellPolicy(maxVersions = Some(1)))
    res.asInstanceOf[KvCompactor.Compacted].dropped shouldBe 40L
    def vals(dir: String) = spark.read.format("graft-kv").load(dir)
      .select(decode(col("value"), "UTF-8").as("v"))
      .as[String].collect().toSet
    vals(src).forall(_.startsWith("A")) shouldBe true
    // replica: baseline (both copies) + the raw feed (B-markers)
    val dst = freshDir("tie_dst")
    spark.read.format("graft-kv").option("asOfSeq", "0").load(src)
      .write.format("graft-kv").option("regions", 1)
      .mode("append").save(dst)
    spark.read.format("graft-kv").option("sinceSeq", "0").load(src)
      .write.format("graft-kv").option("regions", 1)
      .option("allowTombstones", "true").mode("append").save(dst)
    // value-aware read-time mask: ONLY the B copies vanish (value-blind
    // coordinate+ts matching would erase the kept A copies too and the
    // coordinates would vanish from the replica while alive at the source)
    vals(dst) shouldBe vals(src)
    // and the replica's own compaction applies the same value-aware rule
    KvCompactor.compact(spark, dst, regions = 1) shouldBe
      a[KvCompactor.Compacted]
    vals(dst) shouldBe vals(src)
    spark.read.format("graft-kv").option("readTombstones", "true")
      .load(dst).count() shouldBe 40L // 40 kept puts, markers purged
  }

  test("applyVersionMarkers removes exactly the named versions") {
    val cells = Seq(
      ("k1", "f", "a", "v1", 1L), // dropped: exact match below
      ("k1", "f", "a", "v2", 2L), // survives: different ts
      ("k1", "f", "a", "v1", 3L), // survives: same value, different ts
      ("k2", "f", "a", "v1", 1L), // survives: different rowKey
      ("k1", "g", "a", "v1", 1L), // survives: different family
      ("k1", "f", "b", "v1", 1L)) // survives: different qualifier
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
    val marker = Seq(("k1", "f", KvDelete.VersionMarkerPrefix + "a", "v1", 1L))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
    val out = KvDelete.applyVersionMarkers(cells.unionByName(marker))
      .select(col("rowKey"), col("family"), col("qualifier"),
        decode(col("value"), "UTF-8").as("v"), col("ts"))
      .as[(String, String, String, String, Long)].collect().toSet
    out shouldBe Set(
      ("k1", "f", "a", "v2", 2L),
      ("k1", "f", "a", "v1", 3L),
      ("k2", "f", "a", "v1", 1L),
      ("k1", "g", "a", "v1", 1L),
      ("k1", "f", "b", "v1", 1L))
    // byte-identical duplicates: one marker removes every copy (doc'd)
    val dup = cells.filter(col("ts") === 1L && col("rowKey") === "k1" &&
      col("family") === "f" && col("qualifier") === "a")
    KvDelete.applyVersionMarkers(
      cells.unionByName(dup).unionByName(marker))
      .filter(col("rowKey") === "k1" && col("family") === "f" &&
        col("qualifier") === "a" && col("ts") === 1L)
      .count() shouldBe 0L
  }

  test("a dropping pass rebases drop files over an interleaved append") {
    val dir = freshDir("rebase")
    val cells = twoVersions(120)
    cells.filter(col("ts") < 100000).write.format("graft-kv")
      .option("regions", 1).mode("append").save(dir) // seq 0
    cells.filter(col("ts") >= 100000).write.format("graft-kv")
      .option("regions", 1).mode("append").save(dir) // seq 1
    val tail = twoVersions(10).filter(col("ts") >= 100000)
      .withColumn("qualifier", lit("late"))
    // interleave a pure append between staging (drop files already
    // renamed in, keyed by the pre-allocated seq) and the publish
    KvCompactor.prePublishHook = () => {
      KvCompactor.prePublishHook = () => ()
      tail.write.format("graft-kv").option("regions", 1)
        .mode("append").save(dir) // steals seq 2
    }
    val res =
      try KvCompactor.compact(spark, dir, regions = 1,
        cellPolicy = KvCompactor.CellPolicy(dropBelowTs = Some(100000L)))
      finally KvCompactor.prePublishHook = () => ()
    res shouldBe KvCompactor.Compacted(3L, merged = 2, into = 1,
      dropped = 120L)
    val fs = fsOf(dir)
    val table = new Path(dir)
    val entry = KvLog.read(fs, table, 3L).get
    entry.contentDrop shouldBe true
    // drop files re-keyed to the PUBLISHED seq; no pre-rebase strays
    entry.dropFiles should not be empty
    entry.dropFiles.foreach { n =>
      n should startWith("drops-0000000003-")
      assert(fs.exists(new Path(table, n)))
    }
    fs.listStatus(table).map(_.getPath.getName)
      .count(n => n.startsWith("drops-") &&
        !n.startsWith("drops-0000000003-")) shouldBe 0
    // the feed over the rebased span still reconstructs exactly
    val baseline = spark.read.format("graft-kv")
      .option("asOfSeq", "1").load(dir)
    val feed = spark.read.format("graft-kv")
      .option("sinceSeq", "1").load(dir)
    KvDelete.applyVersionMarkers(baseline.unionByName(feed), feed)
      .count() shouldBe spark.read.format("graft-kv").load(dir).count()
  }

  test("drop entries are admitted atomically under tail batch caps") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = freshDir("atomic")
    val cells = twoVersions(80)
    cells.filter(col("ts") < 100000).write.format("graft-kv")
      .option("regions", 2).mode("append").save(dir) // seq 0
    cells.filter(col("ts") >= 100000).write.format("graft-kv")
      .option("regions", 2).mode("append").save(dir) // seq 1
    // maxFilesPerBatch=1 forces the smallest batches the tail allows —
    // the drop entry must still be admitted WHOLE (never parked
    // mid-entry, where the resume index would misread as a fresh-start
    // mid-delivery of the entry's different adds list)
    val out = freshDir("atomic_out")
    val ckpt = freshDir("atomic_ckpt")
    def run(): Unit = {
      val q = spark.readStream.format("graft-kv")
        .option("maxFilesPerBatch", 1).load(dir)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // consume the two appends, checkpointed
    // versions pass with 2 output regions: the rank window shuffles, so
    // the coalesce(regions) drop write lands 2 non-empty files. AQE is
    // disabled for the staging only — at test scale it coalesces the
    // tiny shuffle to one partition and the test NEEDS a multi-file
    // drop entry (at real scale multiple files are the norm).
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val res = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      KvCompactor.compact(spark, dir, regions = 2,
        cellPolicy = KvCompactor.CellPolicy(maxVersions = Some(1)))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
    res.asInstanceOf[KvCompactor.Compacted].dropped shouldBe 80L
    val fs = fsOf(dir)
    val entry = KvLog.read(fs, new Path(dir),
      KvLog.latestSeq(fs, new Path(dir))).get
    assert(entry.dropFiles.size > 1,
      s"staging must produce multiple drop files, got ${entry.dropFiles}")
    run() // resume: crosses the drop entry under the 1-file cap
    val consumed = spark.read.parquet(out)
    consumed.count() shouldBe 240L // 160 puts + 80 drop markers, no dupes
    consumed.filter(col("qualifier")
      .startsWith(KvDelete.VersionMarkerPrefix)).count() shouldBe 80L
  }

  test("TTL drops reconstruct through the feed: baseline + changes == current") {
    val dir = freshDir("ttl_feed")
    val cells = twoVersions(250)
    cells.filter(col("ts") < 100000).write.format("graft-kv")
      .option("regions", 2).mode("append").save(dir) // seq 0
    cells.filter(col("ts") >= 100000).write.format("graft-kv")
      .option("regions", 2).mode("append").save(dir) // seq 1
    // consumer checkpointed at seq 1; TTL pass at seq 2 erases every v1
    val res = KvCompactor.compact(spark, dir, regions = 2,
      cellPolicy = KvCompactor.CellPolicy(dropBelowTs = Some(100000L)))
    res.asInstanceOf[KvCompactor.Compacted].dropped shouldBe 250L
    // fresh data after the pass: the span mixes adds and drops
    twoVersions(250).filter(col("ts") >= 100000)
      .withColumn("qualifier", lit("post"))
      .write.format("graft-kv").option("regions", 2)
      .mode("append").save(dir) // seq 3
    val baseline = spark.read.format("graft-kv")
      .option("asOfSeq", "1").load(dir)
    val feed = spark.read.format("graft-kv")
      .option("sinceSeq", "1").load(dir)
    def keyed(df: DataFrame) = df
      .select(col("rowKey"), col("family"), col("qualifier"),
        decode(col("value"), "UTF-8").as("v"), col("ts"))
      .as[(String, String, String, String, Long)].collect().toSet
    keyed(KvDelete.applyVersionMarkers(baseline.unionByName(feed))) shouldBe
      keyed(spark.read.format("graft-kv").load(dir))
  }

  private def keyedCells(df: DataFrame) = df
    .select(col("rowKey"), col("family"), col("qualifier"),
      decode(col("value"), "UTF-8").as("v"), col("ts"))
    .as[(String, String, String, String, Long)].collect().toSet

  test("byte-identical duplicates straddling the keep boundary never drop the retained version") {
    val dir = freshDir("straddle")
    def cell(v: String, ts: Long): DataFrame =
      Seq(("k1", "f", "amt", v, ts)).toDF("rowKey", "family", "qualifier", "v", "ts")
        .select(col("rowKey"), col("family"), col("qualifier"),
          encode(col("v"), "UTF-8").as("value"), col("ts"))
    cell("old", 1L).unionByName(cell("new", 2L))
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir) // seq 0
    // byte-identical RE-PUT of the newest version: under maxVersions=1
    // the two copies would rank 1 and 2 in the keep window, and a drop
    // record for the rank-2 copy matches the retained rank-1 copy on all
    // five fields — the CDC consumer would erase the version the source
    // still serves (ADVICE r17 medium). The compactor now collapses
    // identical cells before ranking, so a version is wholly kept or
    // wholly dropped.
    cell("new", 2L)
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir) // seq 1
    val baseline = spark.read.format("graft-kv").option("asOfSeq", "1").load(dir)
    val res = KvCompactor.compact(spark, dir, regions = 1,
      cellPolicy = KvCompactor.CellPolicy(maxVersions = Some(1))) // seq 2
    // only the OLD version drops; the identical copies collapse silently
    res.asInstanceOf[KvCompactor.Compacted].dropped shouldBe 1L
    val now = spark.read.format("graft-kv").load(dir)
    keyedCells(now) shouldBe Set(("k1", "f", "amt", "new", 2L))
    // replica convergence across the pass: the replica's baseline holds
    // BOTH identical copies (it consumed both commits); the drop feed
    // must leave the version standing
    val feed = spark.read.format("graft-kv").option("sinceSeq", "1").load(dir)
    keyedCells(KvDelete.applyVersionMarkers(baseline.unionByName(feed), feed)) shouldBe
      keyedCells(now)
  }

  test("a snapshot anchor makes the CDC span durable across retention + vacuum(0) + truncate") {
    val dir = freshDir("anchor")
    val cells = twoVersions(150)
    cells.filter(col("ts") < 100000).write.format("graft-kv")
      .option("regions", 2).mode("append").save(dir) // seq 0
    // the consumer checkpoints at seq 0 and PINS its anchor
    KvSnapshot.create(spark, dir, "anchor")
    cells.filter(col("ts") >= 100000).write.format("graft-kv")
      .option("regions", 2).mode("append").save(dir) // seq 1 — span content
    // retention pass merges seq 0+1 away and stages drop records (seq 2);
    // the floor rises past the anchor
    val res = KvCompactor.compact(spark, dir, regions = 2,
      cellPolicy = KvCompactor.CellPolicy(maxVersions = Some(1)))
    res.asInstanceOf[KvCompactor.Compacted].dropped shouldBe 150L
    val fs = fsOf(dir)
    val table = new Path(dir)
    // AGGRESSIVE maintenance: zero-grace truncate + vacuum. Without the
    // anchor, seq 1's merged-away adds (the span's content) and — after
    // entry truncation — seq 2's drop files would be reclaimed here.
    Thread.sleep(20) // let the removal clocks fall behind the cutoff
    KvLog.truncate(fs, table, 0L)
    KvVacuum.vacuum(spark, dir, graceMs = 0L) match {
      // r19 observability: the summary SAYS what the anchor is holding —
      // past-grace candidates spared only by the span pin
      case v: KvVacuum.Vacuumed =>
        assert(v.anchorHeldFiles > 0 && v.anchorHeldBytes > 0L,
          s"anchor-held files not surfaced in the vacuum summary: $v")
      case other => fail(s"vacuum did not run: $other")
    }
    // the anchored entries survived truncation (entry 1 and the dropping
    // entry 2), and the span's files survived vacuum
    KvLog.read(fs, table, 1L).isDefined shouldBe true
    KvLog.read(fs, table, 2L).exists(_.dropFiles.nonEmpty) shouldBe true
    // snapshot baseline + anchored feed == current, across it all
    val baseline = spark.read.format("graft-kv")
      .option("snapshot", "anchor").load(dir)
    val feed = spark.read.format("graft-kv").option("sinceSeq", "0").load(dir)
    keyedCells(KvDelete.applyVersionMarkers(baseline.unionByName(feed), feed)) shouldBe
      keyedCells(spark.read.format("graft-kv").load(dir))
    // dropping the snapshot releases the lease: the next truncate+vacuum
    // reclaims the span and the feed refuses with the re-baseline hint
    KvSnapshot.drop(spark, dir, "anchor")
    Thread.sleep(20)
    KvLog.truncate(fs, table, 0L)
    KvVacuum.vacuum(spark, dir, graceMs = 0L)
    val ex = intercept[IllegalStateException] {
      spark.read.format("graft-kv").option("sinceSeq", "0").load(dir).count()
    }
    ex.getMessage should include("named snapshot")
  }

  test("a snapshot anchor lets a below-floor STREAM resume exactly (truncate + vacuum(0) crossed)") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = freshDir("anchor_tail")
    val cells = twoVersions(100)
    cells.filter(col("ts") < 100000).write.format("graft-kv")
      .option("regions", 1).mode("append").save(dir) // seq 0
    // operator pins the consumer's position (consumed through seq 0)
    KvSnapshot.create(spark, dir, "tail_anchor")
    cells.filter(col("ts") >= 100000).write.format("graft-kv")
      .option("regions", 1).mode("append").save(dir) // seq 1 — unconsumed
    // retention pass merges 0+1 and stages drops (seq 2); floor rises
    KvCompactor.compact(spark, dir, regions = 1,
      cellPolicy = KvCompactor.CellPolicy(maxVersions = Some(1)))
      .asInstanceOf[KvCompactor.Compacted].dropped shouldBe 100L
    val fs = fsOf(dir)
    Thread.sleep(20)
    KvLog.truncate(fs, new Path(dir), 0L)
    KvVacuum.vacuum(spark, dir, graceMs = 0L)
    // the stream resumes from the anchor seq: offset (1, 0) is below the
    // floor, but the anchor protected entry 1's adds and entry 2's drop
    // files — the tail ships both (100 v2 puts + 100 drop markers)
    val out = freshDir("anchor_tail_out")
    val ckpt = freshDir("anchor_tail_ckpt")
    val q = spark.readStream.format("graft-kv")
      .option("sinceSeq", "0").load(dir)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val consumed = spark.read.parquet(out)
    consumed.count() shouldBe 200L
    consumed.filter(col("qualifier")
      .startsWith(KvDelete.VersionMarkerPrefix)).count() shouldBe 100L
    // without an anchor the same resume refuses with the recovery hint
    KvSnapshot.drop(spark, dir, "tail_anchor")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q2 = spark.readStream.format("graft-kv")
        .option("sinceSeq", "0").load(dir)
        .writeStream.format("noop")
        .option("checkpointLocation", freshDir("anchor_tail_ckpt2"))
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
    }
    ex.getMessage should include("behind the compaction")
  }

  test("masked scans read VALUE only when exact-version markers are live") {
    val dir = freshDir("value_gate")
    def planOf(df: DataFrame): String = {
      df.collect(): Unit // force AQE to finalize
      df.queryExecution.executedPlan.toString
    }
    Seq(("k1", "f", "a", "v1", 1L), ("k2", "f", "a", "v2", 1L))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir)
    // an ORDINARY row tombstone: the mask is coordinate-only, so the
    // masked scan must not widen the inner row with the fat value column
    KvDelete.deleteRows(spark, dir, Seq("k2").toDF("rowKey"))
    val tombstoned = planOf(spark.read.format("graft-kv").load(dir)
      .select(col("rowKey")))
    tombstoned should include("masked(")
    tombstoned should not include "valueAware"
    keyedCells(spark.read.format("graft-kv").load(dir)) shouldBe
      Set(("k1", "f", "a", "v1", 1L))
    // an EXACT-VERSION marker (replicated retention drop): value-aware
    // matching needs the bytes, so the scan flips to the five-column
    // inner coordinate — and still masks correctly
    Seq(("k1", "f", KvDelete.VersionMarkerPrefix + "a", "v1", 1L))
      .toDF("rowKey", "family", "qualifier", "v", "ts")
      .select(col("rowKey"), col("family"), col("qualifier"),
        encode(col("v"), "UTF-8").as("value"), col("ts"))
      .write.format("graft-kv").option("regions", 1)
      .option("allowTombstones", "true").mode("append").save(dir)
    val versioned = planOf(spark.read.format("graft-kv").load(dir)
      .select(col("rowKey")))
    versioned should include("valueAware")
    spark.read.format("graft-kv").load(dir).count() shouldBe 0L
  }
}
