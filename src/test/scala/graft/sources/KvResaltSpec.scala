package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kv.KvGenerator

/** [[KvResalt]]: in-place salt-layout conversion. The invariant under
  * test everywhere: the LOGICAL table — rows, predicates, versions,
  * history — is indistinguishable across a resalt; only the stored
  * layout (and therefore the physical routing) changes, atomically with
  * the manifest entry that declares it.
  */
class KvResaltSpec extends graft.SparkSpec {

  private val cat = "graftcat_resalt"
  private lazy val wh: String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_resalt_wh"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftKvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private lazy val cells: DataFrame =
    KvGenerator.cells(spark, 2000, 4, "runResalt").cache()

  private def freshDir(name: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_resalt_$name"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    d
  }

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def scan(dir: String): DataFrame =
    spark.read.format("graft-kv").load(dir)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case b: Array[Byte] => new String(b, "UTF-8")
      case x => String.valueOf(x)
    }.mkString("|")).sorted.toSeq

  test("salted -> salted: logical view, predicates, and point pruning survive") {
    val dir = freshDir("s2s")
    KvSalt.saltedWrite(cells, dir, n = 16, regions = 8, mode = "overwrite")
    val fs = fsOf(dir)
    val before = rows(scan(dir))
    val r = KvResalt.resalt(spark, dir, Some(4))
    r shouldBe a[KvResalt.Resalted]
    val res = r.asInstanceOf[KvResalt.Resalted]
    res.from shouldBe Some(16)
    res.to shouldBe Some(4)

    // Resolution flips through the manifest; the registration FILE is
    // stale by design (immutable first registration) and must not win.
    KvSalt.bucketsOf(fs, new Path(dir)) shouldBe Some(16)
    KvSalt.resolveAt(fs, new Path(dir), None) shouldBe Some(4)
    // The recorded property followed the layout.
    KvTableProps.read(fs, new Path(dir)).get("salt_buckets") shouldBe Some("4")

    rows(scan(dir)) shouldBe before
    // Every predicate shape re-expands under the NEW salt.
    Seq(
      col("rowKey") === "00123",
      col("rowKey") >= "00100" && col("rowKey") < "00300",
      col("rowKey").startsWith("017"))
      .foreach { p =>
        rows(scan(dir).filter(p)) shouldBe
          rows(cells.filter(p))
      }
    // A contradicting explicit option is refused — under the RESOLVED
    // (post-resalt) layout, not the stale registration.
    val e = intercept[Exception] {
      spark.read.format("graft-kv").option("saltBuckets", 16).load(dir)
        .collect()
    }
    e.getMessage should include("contradicts")
    // Point Get still prunes below a full scan's partition count.
    val get = scan(dir).filter(col("rowKey") === "00123")
    assert(get.rdd.getNumPartitions < KvLog.liveFiles(fs, new Path(dir)).size
      .max(2))
  }

  test("unsalted -> salted and back: both conversion directions hold") {
    val dir = freshDir("convert")
    cells.write.format("graft-kv").option("regions", 6)
      .mode("overwrite").save(dir)
    val fs = fsOf(dir)
    val before = rows(scan(dir))

    KvResalt.resalt(spark, dir, Some(8)) shouldBe a[KvResalt.Resalted]
    KvSalt.resolveAt(fs, new Path(dir), None) shouldBe Some(8)
    rows(scan(dir)) shouldBe before
    rows(scan(dir).filter(col("rowKey") === "00042")) shouldBe
      rows(cells.filter(col("rowKey") === "00042"))
    // Appends now follow the salted contract end to end.
    KvSalt.saltedWrite(cells.limit(0), dir, n = 8, regions = 2)
    // ... and a mismatching salted append refuses.
    intercept[IllegalArgumentException] {
      KvSalt.saltedWrite(cells.limit(5), dir, n = 16, regions = 2)
    }.getMessage should include("stores 8-bucket")

    KvResalt.resalt(spark, dir, None) shouldBe a[KvResalt.Resalted]
    KvSalt.resolveAt(fs, new Path(dir), None) shouldBe None
    KvTableProps.read(fs, new Path(dir)).get("salt_buckets") shouldBe None
    rows(scan(dir)) shouldBe before
  }

  test("resalt applies and purges delete markers (the major-compaction rule)") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.r")
    cells.createOrReplaceTempView("resalt_marker_cells")
    spark.sql(
      s"""CREATE TABLE $cat.r.marked USING `graft-kv`
         |TBLPROPERTIES ('regions' = '4', 'salt_buckets' = '8')
         |AS SELECT * FROM resalt_marker_cells""".stripMargin)
    spark.sql(s"DELETE FROM $cat.r.marked WHERE rowKey <= '00199'")
    val masked = rows(spark.table(s"$cat.r.marked"))
    val dir = s"$wh/r/marked"
    val fs = fsOf(dir)
    assert(KvLog.liveFileStats(fs, new Path(dir)).values
      .map(_.tombstones).sum > 0, "markers staged")

    val res = spark.sql(s"CALL $cat.sys.resalt(table => 'r.marked', buckets => 2)")
      .collect().head
    res.getString(0) shouldBe "resalted"
    res.getInt(2) shouldBe 8
    res.getInt(3) shouldBe 2

    rows(spark.table(s"$cat.r.marked")) shouldBe masked
    assert(KvLog.liveFileStats(fs, new Path(dir)).values
      .map(_.tombstones).sum == 0L, "resalt physicalizes and purges markers")
    // The catalog's own DDL inspection reflects the new layout.
    val show = spark.sql(s"SHOW TBLPROPERTIES $cat.r.marked").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    show.get("salt_buckets") shouldBe Some("2")
  }

  test("time travel below the resalt resolves the OLD layout; CDC spans cross it mixed") {
    val dir = freshDir("tt")
    KvSalt.saltedWrite(cells, dir, n = 16, regions = 4, mode = "overwrite")
    val fs = fsOf(dir)
    val preSeq = KvLog.latestSeq(fs, new Path(dir))
    val before = rows(scan(dir))
    KvResalt.resalt(spark, dir, Some(4)) shouldBe a[KvResalt.Resalted]

    val asOf = spark.read.format("graft-kv")
      .option("asOfSeq", preSeq).load(dir)
    rows(asOf) shouldBe before
    // The pushed predicate expands under the OLD salt over the old files.
    rows(asOf.filter(col("rowKey") === "00123")) shouldBe
      rows(cells.filter(col("rowKey") === "00123"))
    KvSalt.resolveAt(fs, new Path(dir), Some(preSeq)) shouldBe Some(16)

    // A span starting EXACTLY at the declaration is uniformly the new
    // layout: an append after the resalt is its only content.
    val declSeq = KvSalt.declSeqs(fsOf(dir), new Path(dir)).head
    KvSalt.saltedWrite(cells.limit(7), dir, n = 4, regions = 1)
    val upTo = KvLog.latestSeq(fs, new Path(dir))
    val resumed = spark.read.format("graft-kv")
      .option("sinceSeq", declSeq - 1).load(dir)
    resumed.count() shouldBe 7L

    // r19: a span CROSSING the declaration reads MIXED — each file strips
    // under its own entry's resolved layout — and ships exactly the union
    // of the two non-crossing sub-spans, logical keys on both sides. The
    // fixture: anchor snapshot (durable CDC anchor across the resalt's
    // compaction floor, the r18 rule) → old-salt append → resalt → new-
    // salt append; the span starts at the anchor and crosses everything.
    val dir2 = freshDir("mixed")
    KvSalt.saltedWrite(cells, dir2, n = 16, regions = 4, mode = "overwrite")
    val fs2 = fsOf(dir2)
    val anchorSeq = KvLog.latestSeq(fs2, new Path(dir2))
    KvSnapshot.create(spark, dir2, "anchor")
    val oldSide = KvGenerator.cells(spark, 500, 2, "runResaltOld")
    KvSalt.saltedWrite(oldSide, dir2, n = 16, regions = 2)
    KvResalt.resalt(spark, dir2, Some(4)) shouldBe a[KvResalt.Resalted]
    val decl2 = KvSalt.declSeqs(fs2, new Path(dir2)).head
    KvSalt.saltedWrite(cells.limit(7), dir2, n = 4, regions = 1)
    val upTo2 = KvLog.latestSeq(fs2, new Path(dir2))
    val crossing = spark.read.format("graft-kv")
      .option("sinceSeq", anchorSeq).option("asOfSeq", upTo2).load(dir2)
    val below = spark.read.format("graft-kv")
      .option("sinceSeq", anchorSeq).option("asOfSeq", decl2 - 1).load(dir2)
    val above = spark.read.format("graft-kv")
      .option("sinceSeq", decl2 - 1).option("asOfSeq", upTo2).load(dir2)
    rows(crossing) shouldBe rows(below.unionAll(above))
    // filters stay exact as residuals (nothing pushes on a mixed span)
    rows(crossing.filter(col("rowKey") === "00123")) shouldBe
      rows(below.unionAll(above).filter(col("rowKey") === "00123"))
    // the resalt entry itself contributes no phantom changes: the
    // crossing span's content is the old-salt append plus the new one
    crossing.count() shouldBe (oldSide.count() + 7)

    // r20 (verdict #4): minRowKey/maxRowKey SCOPE a crossing span — the
    // readers enforce the bound on the emitted logical key after each
    // file's own epoch strip, so a scoped crossing read equals the union
    // of the two scoped non-crossing sub-spans (each of which reads
    // under a single layout and takes the stored-form rewrite).
    def scoped(df: org.apache.spark.sql.DataFrameReader) = df
      .option("minRowKey", "00200").option("maxRowKey", "00400")
    val crossingScoped = scoped(spark.read.format("graft-kv")
      .option("sinceSeq", anchorSeq).option("asOfSeq", upTo2)).load(dir2)
    val belowScoped = scoped(spark.read.format("graft-kv")
      .option("sinceSeq", anchorSeq).option("asOfSeq", decl2 - 1)).load(dir2)
    val aboveScoped = scoped(spark.read.format("graft-kv")
      .option("sinceSeq", decl2 - 1).option("asOfSeq", upTo2)).load(dir2)
    rows(crossingScoped) shouldBe rows(belowScoped.unionAll(aboveScoped))
    // ...and equals the unscoped crossing read filtered above the scan
    rows(crossingScoped) shouldBe rows(crossing.filter(
      col("rowKey") >= "00200" && col("rowKey") < "00400"))
    crossingScoped.count() should be > 0L
    // the scope surfaces in the plan for observability
    assert(crossingScoped.queryExecution.executedPlan.toString
      .contains("logicalScope=[00200,00400)"))
  }

  test("mixed-span rowKey scope law: random bounds equal filter-above-the-scan") {
    // The [[KvRowScope]] exactness claim, randomized: for a CDC span
    // crossing a resalt, a scoped read equals the unscoped read filtered
    // above the scan, for arbitrary bound shapes — min-only, max-only,
    // both, empty range, bounds hitting no stored prefix width.
    val dir = freshDir("scopelaw")
    KvSalt.saltedWrite(cells.limit(400), dir, n = 8, regions = 2,
      mode = "overwrite")
    val fs = fsOf(dir)
    val anchorSeq = KvLog.latestSeq(fs, new Path(dir))
    KvSnapshot.create(spark, dir, "anchor_law")
    KvSalt.saltedWrite(KvGenerator.cells(spark, 300, 2, "runScopeLaw"),
      dir, n = 8, regions = 1)
    KvResalt.resalt(spark, dir, Some(2)) shouldBe a[KvResalt.Resalted]
    KvSalt.saltedWrite(cells.limit(60), dir, n = 2, regions = 1)
    val upTo = KvLog.latestSeq(fs, new Path(dir))
    def crossing(opts: (String, String)*) = {
      val r0 = spark.read.format("graft-kv")
        .option("sinceSeq", anchorSeq).option("asOfSeq", upTo)
      opts.foldLeft(r0) { case (r, (k, v)) => r.option(k, v) }.load(dir)
    }
    val unscoped = crossing()
    val rnd = new scala.util.Random(42)
    val keyPool = unscoped.select(col("rowKey")).distinct()
      .collect().map(_.getString(0)).sorted
    def randBound(): String = rnd.nextInt(4) match {
      case 0 => keyPool(rnd.nextInt(keyPool.length)) // an existing key
      case 1 => f"${rnd.nextInt(100000)}%05d"        // arbitrary in-space
      case 2 => "0"                                  // below everything
      case _ => "99999~"                             // above everything
    }
    (1 to 25).foreach { i =>
      val (lo, hi) = (rnd.nextInt(3), randBound(), randBound()) match {
        case (0, a, _) => (Some(a), None)            // min-only
        case (1, _, b) => (None, Some(b))            // max-only
        case (_, a, b) => (Some(a), Some(b))         // both (maybe empty)
      }
      val opts = lo.map("minRowKey" -> _).toSeq ++ hi.map("maxRowKey" -> _)
      val scoped = crossing(opts: _*)
      val expect = Seq(
        lo.map(col("rowKey") >= _), hi.map(col("rowKey") < _))
        .flatten.foldLeft(unscoped)(_ filter _)
      withClue(s"case $i bounds [$lo, $hi): ") {
        rows(scoped) shouldBe rows(expect)
      }
    }
  }

  test("a streaming sinceSeq bridge refuses to cross a salt declaration") {
    // The batch CDC path reads a crossing span MIXED (per-file
    // saltLenOverride); the TAIL strips one salt width for its whole
    // lifetime, and a bridged span already containing the declaration is
    // invisible to the mid-flight guard (declSeqAtStart includes it) —
    // so toMicroBatchStream must refuse at construction, not emit stored
    // salt-prefixed keys silently.
    val dir = freshDir("streammixed")
    KvSalt.saltedWrite(cells.limit(200), dir, n = 8, regions = 2,
      mode = "overwrite")
    val fs = fsOf(dir)
    val anchorSeq = KvLog.latestSeq(fs, new Path(dir))
    KvSnapshot.create(spark, dir, "anchor_stream")
    KvSalt.saltedWrite(cells.limit(50), dir, n = 8, regions = 1)
    KvResalt.resalt(spark, dir, Some(2)) shouldBe a[KvResalt.Resalted]
    KvSalt.saltedWrite(cells.limit(5), dir, n = 2, regions = 1)
    val cp = freshDir("streammixed_cp")
    val q = spark.readStream.format("graft-kv")
      .option("sinceSeq", anchorSeq).load(dir)
      .writeStream.format("memory").queryName("mixed_bridge")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    msgs should include("crosses a salt")
    msgs should include("Split the bridge")

    // A bridge starting EXACTLY at the declaring seq is uniformly the
    // new layout and must still stream (the refusal is span-shaped, not
    // a blanket sinceSeq+resalt ban).
    val declSeq = KvSalt.declSeqs(fs, new Path(dir)).head
    val cp2 = freshDir("streammixed_cp2")
    val q2 = spark.readStream.format("graft-kv")
      .option("sinceSeq", declSeq).load(dir)
      .writeStream.format("memory").queryName("mixed_bridge_above")
      .option("checkpointLocation", cp2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    spark.table("mixed_bridge_above").count() shouldBe
      cells.limit(5).count()
  }

  test("a live tail fails loudly at a salt declaration instead of stripping wrong") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = freshDir("tailguard")
    KvSalt.saltedWrite(cells.limit(300), dir, n = 8, regions = 2,
      mode = "overwrite")
    val stream = new KvTailStream(dir, graft.kv.Cell.schema,
      Array.empty, None,
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    // Catch the stream up to the tip (the caught-up position is the one
    // the compaction-floor check cannot cover: it sits AT the new floor).
    val caughtUp = stream.latestOffset(stream.initialOffset(),
      ReadLimit.allAvailable())
    KvResalt.resalt(spark, dir, Some(2)) shouldBe a[KvResalt.Resalted]
    KvSalt.saltedWrite(cells.limit(5), dir, n = 2, regions = 1)
    val e = intercept[IllegalStateException] {
      stream.latestOffset(caughtUp, ReadLimit.allAvailable())
    }
    e.getMessage should include("salt layout")
    e.getMessage should include("restart")
  }

  test("snapshot reads pin their layout; restore rolls the layout back with the files") {
    val dir = freshDir("snap")
    KvSalt.saltedWrite(cells, dir, n = 16, regions = 4, mode = "overwrite")
    val fs = fsOf(dir)
    val before = rows(scan(dir))
    KvSnapshot.create(spark, dir, "pre")
    KvResalt.resalt(spark, dir, Some(2)) shouldBe a[KvResalt.Resalted]

    // The snapshot's config-recording manifest carries salt=16: its read
    // strips the OLD salt even though the table now stores 2-bucket keys.
    rows(spark.read.format("graft-kv").option("snapshot", "pre").load(dir)) shouldBe
      before
    KvSnapshot.restore(spark, dir, "pre")
    KvSalt.resolveAt(fs, new Path(dir), None) shouldBe Some(16)
    KvTableProps.read(fs, new Path(dir)).get("salt_buckets") shouldBe Some("16")
    rows(scan(dir)) shouldBe before
    rows(scan(dir).filter(col("rowKey") === "00077")) shouldBe
      rows(cells.filter(col("rowKey") === "00077"))
  }

  test("refusals: registered tails, same-layout park, missing table") {
    val dir = freshDir("refuse")
    KvSalt.saltedWrite(cells.limit(100), dir, n = 4, regions = 2,
      mode = "overwrite")
    val fs = fsOf(dir)
    KvLog.recordTail(fs, new Path(dir), "pipe1", 0L)
    intercept[IllegalArgumentException] {
      KvResalt.resalt(spark, dir, Some(2))
    }.getMessage should include("tails are registered")
    KvLog.dropTail(fs, new Path(dir), "pipe1")

    KvResalt.resalt(spark, dir, Some(4)) shouldBe
      KvResalt.Parked("already salted with 4 buckets")
    KvResalt.resalt(spark, freshDir("nope"), Some(4)) shouldBe a[KvResalt.Parked]
  }

  test("a concurrent commit aborts the resalt before anything publishes") {
    val dir = freshDir("race")
    KvSalt.saltedWrite(cells.limit(500), dir, n = 8, regions = 2,
      mode = "overwrite")
    val fs = fsOf(dir)
    val before = rows(scan(dir))
    val liveBefore = KvLog.liveFiles(fs, new Path(dir)).toSet
    KvResalt.prePublishHook = () => {
      // An interleaved old-layout append wins the seq.
      KvSalt.saltedWrite(cells.limit(10), dir, n = 8, regions = 1)
    }
    try {
      KvResalt.resalt(spark, dir, Some(2)) shouldBe a[KvResalt.Aborted]
    } finally KvResalt.prePublishHook = () => ()
    // Nothing changed: layout, declarations, live set (plus the
    // interleaved append), and no staged orphans.
    KvSalt.resolveAt(fs, new Path(dir), None) shouldBe Some(8)
    KvSalt.declSeqs(fs, new Path(dir)) shouldBe Seq.empty
    assert(KvLog.liveFiles(fs, new Path(dir)).toSet.intersect(liveBefore)
      == liveBefore)
    rows(scan(dir)).size shouldBe (before.size + 10)
    // And the retry completes.
    KvResalt.resalt(spark, dir, Some(2)) shouldBe a[KvResalt.Resalted]
    rows(scan(dir)).size shouldBe (before.size + 10)
  }

  test("the in-lock layout expectation fails a commit whose rows predate a resalt") {
    val dir = freshDir("layoutexpect")
    KvSalt.saltedWrite(cells.limit(100), dir, n = 8, regions = 2,
      mode = "overwrite")
    val fs = fsOf(dir)
    KvResalt.resalt(spark, dir, Some(2)) shouldBe a[KvResalt.Resalted]
    // A committer that resolved the layout BEFORE the resalt (wrote
    // 8-bucket rows) must fail terminally at append time — not retry,
    // not publish.
    val e = intercept[IllegalStateException] {
      KvLog.append(fs, new Path(dir), adds = Seq("part-b0000000099-zz.parquet"),
        layoutExpect = Some(Some(8)))
    }
    e.getMessage should include("changed mid-write")
    assert(!KvLog.liveFiles(fs, new Path(dir))
      .contains("part-b0000000099-zz.parquet"))
  }

  test("log truncation never drops a salt declaration") {
    val dir = freshDir("trunc")
    cells.limit(300).write.format("graft-kv").option("regions", 2)
      .mode("overwrite").save(dir)
    // A few appends build a droppable prefix.
    (1 to 3).foreach { _ =>
      cells.limit(50).write.format("graft-kv").option("regions", 1)
        .mode("append").save(dir)
    }
    val fs = fsOf(dir)
    KvResalt.resalt(spark, dir, Some(4)) shouldBe a[KvResalt.Resalted]
    val declSeq = KvSalt.declSeqs(fs, new Path(dir)).head
    // Raise the floor past the declaration with a later major compaction.
    KvSalt.saltedWrite(cells.limit(50), dir, n = 4, regions = 1)
    KvSalt.saltedWrite(cells.limit(50), dir, n = 4, regions = 1)
    KvCompactor.compact(spark, dir, regions = 2) shouldBe a[KvCompactor.Compacted]
    assert(KvLog.floor(fs, new Path(dir)) > declSeq)

    KvLog.truncate(fs, new Path(dir), retentionMs = 0L)
    assert(KvLog.read(fs, new Path(dir), declSeq).exists(_.saltDecl.isDefined),
      "the declaring entry must survive truncation")
    assert(KvLog.earliestSeq(fs, new Path(dir)) == declSeq,
      "the pre-declaration prefix was truncatable and dropped")
    KvSalt.resolveAt(fs, new Path(dir), None) shouldBe Some(4)
  }

  test("ALTER TABLE salt_buckets points at the procedure; CALL converts the catalog table") {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.r")
    cells.limit(400).createOrReplaceTempView("resalt_alter_cells")
    spark.sql(
      s"""CREATE TABLE $cat.r.altme USING `graft-kv`
         |TBLPROPERTIES ('regions' = '2')
         |AS SELECT * FROM resalt_alter_cells""".stripMargin)
    val before = rows(spark.table(s"$cat.r.altme"))
    val e = intercept[Exception] {
      spark.sql(
        s"ALTER TABLE $cat.r.altme SET TBLPROPERTIES ('salt_buckets' = '8')")
    }
    e.getMessage should include("sys.resalt")

    val res = spark.sql(s"CALL $cat.sys.resalt(table => 'r.altme', buckets => 8)")
      .collect().head
    res.getString(0) shouldBe "resalted"
    assert(res.isNullAt(2), "converted FROM unsalted")
    res.getInt(3) shouldBe 8
    rows(spark.table(s"$cat.r.altme")) shouldBe before
    // Plain SQL INSERT keeps working — the sink salts under the new layout.
    spark.sql(s"INSERT INTO $cat.r.altme " +
      "SELECT 'zz001', 'f', 'a', cast('v' as binary), 1L")
    spark.sql(s"SELECT rowKey FROM $cat.r.altme WHERE rowKey = 'zz001'")
      .count() shouldBe 1L
    // And back to unsalted via buckets => 0.
    spark.sql(s"CALL $cat.sys.resalt(table => 'r.altme', buckets => 0)")
      .collect().head.getString(0) shouldBe "resalted"
    rows(spark.table(s"$cat.r.altme")).size shouldBe (before.size + 1)
  }
}
