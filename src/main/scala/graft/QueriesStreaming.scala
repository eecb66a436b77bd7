package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.kv.{KvGenerator, KvTable, RangeLayout}
import graft.ops.{KvPivot, TypedProject}
import graft.schema.SchemaFile
import graft.streaming.StreamingPivot

/** Structured Streaming queries (SURVEY §7.6).
  *
  * One of the domain slices of the [[Queries]] catalog (r18 split —
  * the registry and the DuckDB oracle maps stay in Queries.scala; the
  * self-type gives every slice the shared fixtures without widening
  * their visibility beyond the package).
  */
private[graft] trait QueriesStreaming { self: Queries.type =>
  // ------------------------------------------------- streaming (§7.6)


  /** The A1/A2 pivot as a Structured-Streaming job run to completion over
    * the available files (Trigger.AvailableNow, complete mode) — the result
    * must equal the batch GROUP BY the oracle runs.
    */
  def streamPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = StreamingPivot.eventCellsStream(spark, sfDir)
    val piv = StreamingPivot.windowedPivot(cells, EventCols)
    // 8 state partitions (the stream_pivot_late rule, r21): state here is
    // ~10^4 window*rowKey rows, and every state store pays per-batch commit
    // I/O regardless of row count — size the store count to state VOLUME.
    StreamingPivot.runAvailableNow(piv, "stream_pivot_out",
      shufflePartitions = Some(8))
  }

  private[graft] lazy val streamPivotSql: String = {
    val aggs = EventCols.map { c =>
      s"max_by(CAST(CAST(floor(value*100) AS BIGINT) AS VARCHAR), event_id) FILTER (WHERE event_type = '$c') AS $c"
    }.mkString(", ")
    s"""SELECT (epoch_ns(ts) // 3600000000000) * 3600000000 AS win_start_us,
       |  lpad(CAST(user_id AS VARCHAR), 8, '0') AS rowKey, $aggs
       |FROM events GROUP BY 1, 2""".stripMargin
  }

  /** Stream-static enrichment join + windowed rollup
    * ([[StreamingPivot.enrichedNationCounts]]): batch-parity oracle is the
    * plain join + hourly group — AvailableNow replay covers all input, so
    * the complete-mode result equals the batch answer.
    */
  def streamEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = StreamingPivot.eventsStream(spark, sfDir)
    val dim = KvTable.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    // 8 state partitions: ~10^3 (window, nation) state rows (r21, the
    // state-VOLUME sizing rule — see stream_pivot).
    StreamingPivot.runAvailableNow(
      StreamingPivot.enrichedNationCounts(ev, dim), "stream_enrich_out",
      shufflePartitions = Some(8))
  }

  private[graft] lazy val streamEnrichSql: String =
    """SELECT (epoch_ns(ts) // 3600000000000) * 3600000000 AS win_start_us,
      |  c_nationkey, count(*) AS n_events,
      |  CAST(sum(floor(value * 100)) AS BIGINT) AS val_x100
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2""".stripMargin

  /** The events cell table staged as a WAL: monotonically-named segment
    * files in write order (cell ts ranges), consumed by the `graft-kv`
    * micro-batch tail ([[graft.sources.KvTailStream]]). Segment names seal
    * in lexicographic order — the WAL sequence-id convention the tail's
    * O(1) offset relies on.
    */
  private[graft] def ensureWalSegments(spark: SparkSession, sfDir: String): String =
    artifacts.computeIfAbsent(s"wal_cells|$sfDir", _ => {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val path = artifactPath("wal_cells", sfDir)
      val tmp = path + "_chunks"
      graft.sinks.Sinks.deleteRecursive(spark, path)
      KvTable.eventsAsCells(spark, sfDir)
        .repartitionByRange(6, col("ts"))
        .write.mode("overwrite").parquet(tmp)
      Files.createDirectories(Paths.get(path))
      val parts = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        Files.move(f.toPath, Paths.get(path, f"part-$i%05d.parquet"),
          StandardCopyOption.REPLACE_EXISTING): Unit
      }
      graft.sinks.Sinks.deleteRecursive(spark, tmp)
      path
    })

  /** The table's CHANGE stream through the connector — HBase replication
    * tailing the WAL: `readStream.format("graft-kv")` over the sealed
    * segments, family-scoped at the SOURCE (the replication-peer-config
    * analog; V2 filter pushdown does not reach streaming scans, so scoping
    * is an option the source enforces), replayed 2 segments per micro-batch
    * under Trigger.AvailableNow. The LWW pivot in complete mode converges
    * to the batch table state — same oracle as `kv_pivot_events`, which is
    * the point: a consumer that tailed the log owns the same row state as
    * one that scanned the table.
    *
    * Complete-mode state is O(#rowKeys) — the memstore analog, same bound
    * as `stream_memstore`; at production rates the scale knob is state
    * partition count (see BASELINE.md round-7 note), not state size.
    */
  def streamKvTail(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensureWalSegments(spark, sfDir)
    val cells = spark.readStream.format("graft-kv")
      .option("family", "f").option("maxFilesPerBatch", 2).load(dir)
    val piv = KvPivot.pivot(cells, EventCols)
    // 8 state partitions: complete-mode state is O(#rowKeys) ~ 10^4, and
    // the 3-batch replay pays (stores x batches) commits (r21, the
    // state-VOLUME sizing rule — see stream_pivot).
    StreamingPivot.runAvailableNow(
      piv.select(col("rowKey") +: EventCols.map(c => decode(col(c), "UTF-8").as(c)): _*),
      "stream_kv_tail_out",
      shufflePartitions = Some(8))
  }

  /** The full replication pipe: a `graft-kv` TAIL of the WAL segments
    * streamed INTO a `graft-kv` STREAMING SINK — source and sink of the
    * same connector composed as an HBase replication peer (WAL consumer →
    * bulk-load writer). Each micro-batch epoch seals deterministic
    * range-sorted region files (`part-e<epoch>-<region>.parquet`, the
    * memstore-flush analog; re-committed epochs rename over the same
    * targets, so recovery is exactly-once). The landed table, batch-read
    * back through the connector, must equal the source cell table — which
    * the oracle pins against the raw events.
    */
  def streamKvPipe(spark: SparkSession, sfDir: String): DataFrame = {
    val src = ensureWalSegments(spark, sfDir)
    val dst = artifactPath("kv_pipe_landed", sfDir)
    val cp = dst + "_cp"
    Seq(dst, cp).foreach(graft.sinks.Sinks.deleteRecursive(spark, _))
    val q = spark.readStream.format("graft-kv")
      .option("maxFilesPerBatch", 2).load(src)
      .writeStream.format("graft-kv").option("regions", 4)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start(dst)
    q.awaitTermination()
    spark.read.format("graft-kv").load(dst)
      .select(col("rowKey"), col("family"), col("qualifier"),
        decode(col("value"), "UTF-8").as("value_str"), col("ts"))
  }

  /** r13 (closes the r11 "tail cannot bridge a truncated checkpoint"
    * gap): the streaming CDC RECOVERY BRIDGE end to end. A first tail
    * consumes the table's initial commits and is then LOST (its Spark
    * checkpoint discarded — the disaster the bridge exists for); more
    * commits land; a replacement tail with a FRESH checkpoint resumes
    * from `.option("sinceSeq", <last consumed seq>)`
    * ([[graft.sources.KvTailStream]] initialOffset doc). The landed
    * union must be exactly the full table — no replayed cells, no gaps —
    * which the generator oracle checks cell by cell.
    */
  def kvTailResume(spark: SparkSession, sfDir: String): DataFrame = {
    val base = artifacts.computeIfAbsent(s"tail_resume|$sfDir", _ => {
      val src = artifactPath("tail_resume_src", sfDir)
      val outA = artifactPath("tail_resume_a", sfDir)
      val outB = artifactPath("tail_resume_b", sfDir)
      Seq(src, outA, outB, outA + "_cp", outB + "_cp")
        .foreach(graft.sinks.Sinks.deleteRecursive(spark, _))
      val cells = KvGenerator.cells(spark, GenRecords, GenTasks, "run1")
      def commit(i: Int): Unit =
        cells.filter(pmod(col("ts"), lit(4)) === i)
          .write.format("graft-kv").option("regions", 2)
          .mode("append").save(src)
      (0 until 2).foreach(commit)
      val q1 = spark.readStream.format("graft-kv").load(src)
        .writeStream.format("parquet").option("path", outA)
        .option("checkpointLocation", outA + "_cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q1.awaitTermination()
      val srcPath = new org.apache.hadoop.fs.Path(src)
      val consumed = graft.sources.KvLog.latestSeq(
        srcPath.getFileSystem(spark.sessionState.newHadoopConf()), srcPath)
      // the first pipeline's checkpoint is now LOST; the table moves on
      (2 until 4).foreach(commit)
      val q2 = spark.readStream.format("graft-kv")
        .option("sinceSeq", consumed).load(src)
        .writeStream.format("parquet").option("path", outB)
        .option("checkpointLocation", outB + "_cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q2.awaitTermination()
      s"$outA;$outB"
    })
    val Array(a, b) = base.split(";")
    spark.read.parquet(a).unionByName(spark.read.parquet(b))
      .select(col("rowKey"), col("family"), col("qualifier"),
        decode(col("value"), "UTF-8").as("value"), col("ts"))
  }

  /** The CDC recovery bridge RESOLVED BY NAME over a SALTED catalog
    * table (r14 — pins that name-based streaming composes with
    * everything the path tail has): `readStream.table` tails the
    * catalog table (salt auto-detected and stripped — the stream emits
    * logical keys), the checkpoint is lost, and a replacement tail with
    * a fresh checkpoint resumes from `.option("sinceSeq", …)` by name.
    * The INSERTs sink-salt (catalog injection), so the whole loop —
    * salted write, named tail, salt strip, seq resume — runs without
    * the caller ever seeing a stored key. Oracle: the landed union must
    * be exactly the generator table, cell for cell.
    */
  def kvTailResumeTable(spark: SparkSession, sfDir: String): DataFrame = {
    val outA = artifactPath("ttr_a", sfDir)
    val outB = artifactPath("ttr_b", sfDir)
    val cat = ensureCatalog("tail_resume_tbl", "graftttr_", spark, sfDir) {
      (name, wh) =>
        Seq(outA, outB, outA + "_cp", outB + "_cp")
          .foreach(graft.sinks.Sinks.deleteRecursive(spark, _))
        spark.sql(
          s"""CREATE TABLE $name.corpus.cells (
             |  rowKey STRING, family STRING, qualifier STRING,
             |  value BINARY, ts BIGINT)
             |USING `graft-kv`
             |TBLPROPERTIES ('regions' = '2', 'salt_buckets' = '4')""".stripMargin)
        val cells = KvGenerator.cells(spark, GenRecords, GenTasks, "run1")
        def commit(i: Int): Unit = {
          cells.filter(pmod(col("ts"), lit(4)) === i)
            .createOrReplaceTempView("graft_ttr_src")
          spark.sql(s"INSERT INTO $name.corpus.cells " +
            "SELECT * FROM graft_ttr_src"): Unit
        }
        (0 until 2).foreach(commit)
        val q1 = spark.readStream.table(s"$name.corpus.cells")
          .writeStream.format("parquet").option("path", outA)
          .option("checkpointLocation", outA + "_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q1.awaitTermination()
        val dir = new org.apache.hadoop.fs.Path(s"$wh/corpus/cells")
        val consumed = graft.sources.KvLog.latestSeq(
          dir.getFileSystem(spark.sessionState.newHadoopConf()), dir)
        // the first tail's checkpoint is LOST; the table moves on
        (2 until 4).foreach(commit)
        val q2 = spark.readStream.option("sinceSeq", consumed)
          .table(s"$name.corpus.cells")
          .writeStream.format("parquet").option("path", outB)
          .option("checkpointLocation", outB + "_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q2.awaitTermination()
    }
    cat: Unit
    spark.read.parquet(outA).unionByName(spark.read.parquet(outB))
      .select(col("rowKey"), col("family"), col("qualifier"),
        decode(col("value"), "UTF-8").as("value"), col("ts"))
  }

  private[graft] lazy val streamKvPipeSql: String =
    """SELECT lpad(CAST(user_id AS VARCHAR), 8, '0') AS rowKey,
      |  'f' AS family, event_type AS qualifier,
      |  CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) AS value_str,
      |  event_id AS ts
      |FROM events""".stripMargin

  /** The replication pipe LANDING SALTED (r14): the same WAL tail as
    * [[streamKvPipe]], but `writeStream.toTable` into a `salt_buckets`
    * catalog table — the sink applies the salt per epoch
    * ([[graft.sources.KvCellSink]] KvStreamSaltedWriterFactory), and the
    * read-back by name strips it. Same oracle as the unsalted pipe: the
    * salt must be invisible end to end, streaming included.
    */
  def kvSaltedStream(spark: SparkSession, sfDir: String): DataFrame = {
    // staged OUTSIDE the ensureCatalog closure: nested computeIfAbsent
    // on the artifacts map would be a ConcurrentHashMap recursive update
    val src = ensureWalSegments(spark, sfDir)
    val cat = ensureCatalog("salted_stream", "graftsst_", spark, sfDir) {
      (name, _) =>
        val cp = artifactPath("salted_stream_cp", sfDir)
        graft.sinks.Sinks.deleteRecursive(spark, cp)
        spark.sql(
          s"""CREATE TABLE $name.corpus.cells (
             |  rowKey STRING, family STRING, qualifier STRING,
             |  value BINARY, ts BIGINT)
             |USING `graft-kv`
             |TBLPROPERTIES ('regions' = '2', 'salt_buckets' = '4')""".stripMargin)
        val q = spark.readStream.format("graft-kv")
          .option("maxFilesPerBatch", 3).load(src)
          .writeStream.option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable(s"$name.corpus.cells")
        q.awaitTermination()
    }
    spark.table(s"$cat.corpus.cells")
      .select(col("rowKey"), col("family"), col("qualifier"),
        decode(col("value"), "UTF-8").as("value_str"), col("ts"))
  }

  /** Phoenix-style secondary index maintained ON THE WRITE PATH: the base
    * table's WAL tailed (scoped to the indexed qualifier at the SOURCE),
    * each write transformed into an index cell — rowKey = the zero-padded
    * indexed VALUE (byte order == numeric order, the Phoenix value-encoding
    * rule), qualifier/value = the base rowKey pointer — and streamed into a
    * second `graft-kv` table through the epoch-sealing sink. The index is
    * therefore itself a sorted-region KV table: a value-range lookup scans
    * it with rowKey-range REGION PRUNING, broadcasts the candidate base
    * keys into a semi join, and RE-CHECKS the current value on the base
    * pivot (a write index holds every version; the recheck drops candidates
    * whose current value moved out of range — completeness holds because
    * the current value was itself a write). Same oracle as
    * `kv_index_lookup`: the stream-maintained index must answer exactly
    * what the batch-built one does.
    */
  def streamKvIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val src = ensureWalSegments(spark, sfDir)
    val idxDir = artifacts.computeIfAbsent(s"stream_idx|$sfDir", _ => {
      val path = artifactPath("kv_stream_idx", sfDir)
      val cp = path + "_cp"
      Seq(path, cp).foreach(graft.sinks.Sinks.deleteRecursive(spark, _))
      val q = spark.readStream.format("graft-kv")
        .option("qualifier", "click").option("maxFilesPerBatch", 2).load(src)
        .select(
          lpad(decode(col("value"), "UTF-8").cast("long").cast("string"), 12, "0")
            .as("idxKey"),
          lit("i").as("family"),
          col("rowKey").as("qualifier"),
          encode(col("rowKey"), "UTF-8").as("value"),
          col("ts"))
        .withColumnRenamed("idxKey", "rowKey")
        .writeStream.format("graft-kv").option("regions", 4)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start(path)
      q.awaitTermination()
      path
    })
    val (lo, hi) = (9000L, 12000L)
    val keys = spark.read.format("graft-kv").load(idxDir)
      .filter(col("rowKey") >= lpad(lit(lo).cast("string"), 12, "0") &&
        col("rowKey") < lpad(lit(hi).cast("string"), 12, "0"))
      .select(decode(col("value"), "UTF-8").as("rowKey")).distinct()
    kvPivotEvents(spark, sfDir)
      .join(broadcast(keys), Seq("rowKey"), "left_semi")
      .filter(col("click").cast("long") >= lo && col("click").cast("long") < hi)
  }

  /** HBase `Increment` as streaming state (`Table.incrementColumnValue` —
    * the reference's HBase exposes atomic counters as a first-class op):
    * per (rowKey, qualifier), the running sum of written values as a
    * stateful streaming aggregation. Counter state is one long per cell
    * coordinate — the cheapest possible stateful query, and the AvailableNow
    * replay's final counters must equal the batch SUM, which the oracle
    * pins.
    */
  def streamIncrement(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = StreamingPivot.eventCellsStream(spark, sfDir)
      .select(col("rowKey"), col("qualifier"),
        decode(col("value"), "UTF-8").cast("long").as("delta"))
    // 8 state partitions: one long per cell coordinate, ~10^4 state rows
    // (r21, the state-VOLUME sizing rule — see stream_pivot).
    StreamingPivot.runAvailableNow(
      cells.groupBy(col("rowKey"), col("qualifier"))
        .agg(sum(col("delta")).as("counter"), count(lit(1)).as("n_incr")),
      "stream_increment_out",
      shufflePartitions = Some(8))
  }

  private[graft] lazy val streamIncrementSql: String =
    """SELECT lpad(CAST(user_id AS VARCHAR), 8, '0') AS rowKey,
      |  event_type AS qualifier,
      |  CAST(sum(floor(value * 100)) AS BIGINT) AS counter,
      |  count(*) AS n_incr
      |FROM events GROUP BY 1, 2""".stripMargin

  /** SKETCHES AS STREAMING STATE: per hour window, the SpaceSaving top-3
    * users and the KMV distinct-user count, both living inside the stateful
    * windowed aggregation (TypedImperativeAggregate buffers serialize into
    * the state store like any agg state). At production rates this is the
    * point of the sketch family — per-window state is O(capacity), not
    * O(distinct users), while below capacity the answers stay EXACT, which
    * is what lets the batch oracle pin them here.
    */
  def streamWindowSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{KmvDistinctAgg, SpaceSavingAgg}
    val ev = StreamingPivot.eventsStream(spark, sfDir)
      .select(lpad(col("user_id").cast("string"), 8, "0").as("u"),
        expr("timestamp_micros(ts DIV 1000)").as("eventTime"))
      .withWatermark("eventTime", "1 hour")
    val agg = ev.groupBy(window(col("eventTime"), "1 hour"))
      .agg(SpaceSavingAgg.heavyHitters(col("u"), capacity = 4096, k = 3).as("top"),
        KmvDistinctAgg.kmvDistinct(col("u")).as("n_users"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("n_users"), col("top"))
    // 8 state partitions: per-window sketch state is O(capacity) per store
    // (r21, the state-VOLUME sizing rule — see stream_pivot). Below-capacity
    // exactness is partition-count-independent: SpaceSaving partials stay
    // exact while distinct terms <= capacity, KMV is a set function.
    StreamingPivot.runAvailableNow(agg, "stream_window_sketch_out",
      shufflePartitions = Some(8))
      .select(col("win_start_us"), col("n_users"), posexplode(col("top")))
      .select(col("win_start_us"), col("n_users"),
        (col("pos") + 1).cast("long").as("rk"),
        col("col.term").as("u"), col("col.cnt").as("n_events"))
  }

  private[graft] lazy val streamWindowSketchSql: String =
    """WITH b AS (SELECT (epoch_ns(ts) // 3600000000000) * 3600000000 AS win_start_us,
      |             lpad(CAST(user_id AS VARCHAR), 8, '0') AS u, count(*) AS c
      |           FROM events GROUP BY 1, 2),
      |r AS (SELECT win_start_us, u, c,
      |        row_number() OVER (PARTITION BY win_start_us ORDER BY c DESC, u) AS rk,
      |        count(*) OVER (PARTITION BY win_start_us) AS nu
      |      FROM b)
      |SELECT win_start_us, nu::BIGINT AS n_users, rk::BIGINT AS rk, u,
      |  c::BIGINT AS n_events
      |FROM r WHERE rk <= 3""".stripMargin

  /** The windowed pivot under ALLOWED LATENESS in APPEND mode: the same
    * events replayed with adjacent time-range chunks swapped (micro-batches
    * out of event-time order), watermark delay = the staged disorder bound.
    * Append emission is the strict test — a window row emits exactly once,
    * when the watermark proves it complete, so late rows must land in
    * not-yet-emitted window state. Punctuation waves finalize every real
    * window at end of replay; they carry a real qualifier (a sentinel type
    * would be filter-pushed below the watermark node and never counted)
    * but never emit — their own window lies beyond the final watermark.
    * Same batch oracle as `stream_pivot`.
    */
  def streamPivotLate(spark: SparkSession, sfDir: String): DataFrame = {
    val (dir, lateNs) = ensurePivotLateDir(spark, sfDir)
    val cells = spark.readStream
      .schema(KvTable.EventsParquetSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .select(KvTable.eventCellColumns :+
        expr("timestamp_micros(ts DIV 1000)").as("eventTime"): _*)
    val piv = StreamingPivot.windowedPivot(cells, EventCols,
      watermark = s"${lateNs / 1000000L + 2} milliseconds")
    // 8 state partitions, not the session's 32: a 7-batch replay pays
    // (state stores × batches) commits regardless of rows, and the state
    // here is ~10^4 window×rowKey rows — size to state VOLUME (the
    // stream_join rule). Measured 13-15 s → 5-6 s on the same replay.
    StreamingPivot.runAvailableNow(piv, "stream_pivot_late_out",
      org.apache.spark.sql.streaming.OutputMode.Append(),
      shufflePartitions = Some(8))
  }

  /** Exactly-once ingest over at-least-once delivery
    * ([[StreamingPivot.dedupedHourlyCounts]]): the staged multi-chunk
    * replay with every 10th event REDELIVERED (a second streaming leg
    * unioned in — the retry/replay duplication every ingest pipeline
    * sees), deduped within the watermark, then counted hourly per type.
    * The oracle aggregates the clean batch table: any surviving duplicate
    * inflates a count and hash-mismatches, so the gate proves the dedup
    * delivered exactly-once semantics — not just "ran".
    */
  def streamIngestDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val (dir, lateNs) = ensurePivotLateDir(spark, sfDir)
    def leg = spark.readStream
      .schema(KvTable.EventsParquetSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val atLeastOnce = leg.union(leg.filter(col("event_id") % 10 === 0))
    val counts = StreamingPivot.dedupedHourlyCounts(atLeastOnce,
      watermark = s"${lateNs / 1000000L + 2} milliseconds")
    StreamingPivot.runAvailableNow(counts, "stream_ingest_dedup_out",
      org.apache.spark.sql.streaming.OutputMode.Append(),
      shufflePartitions = Some(8))
  }

  private[graft] lazy val streamIngestDedupSql: String =
    """SELECT (epoch_ns(ts) // 3600000000000) * 3600000000 AS win_start_us,
      |  event_type, count(*) AS n_events,
      |  CAST(sum(floor(value * 100)) AS BIGINT) AS val_x100
      |FROM events GROUP BY 1, 2""".stripMargin

  private[graft] def ensureJoinDir(spark: SparkSession, sfDir: String): String =
    artifacts.computeIfAbsent(s"join_dir|$sfDir", _ =>
      StreamingPivot.stageEventsOrdered(
        KvTable.eventsRaw(spark, s"$sfDir/events.parquet"), nChunks = 4))

  /** Stream-stream interval join ([[StreamingPivot.intervalJoin]]) over a
    * genuine multi-batch replay: clicks and purchases read as two file
    * streams off the same time-ordered 4-chunk staging
    * (`maxFilesPerTrigger=1`), so pairs straddling chunk boundaries must
    * survive in join state across micro-batches. Batch-parity oracle is the
    * plain interval join in micros arithmetic.
    */
  def streamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensureJoinDir(spark, sfDir)
    def side(tpe: String) = spark.readStream
      .schema(KvTable.EventsParquetSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .filter(col("event_type") === tpe)
    // 8 state partitions: a stream-stream join keeps 4 state stores per
    // partition, each paying per-batch commit I/O regardless of rows — size
    // to the rate × gap state volume (tiny here), not the session default.
    StreamingPivot.runAvailableNow(
      StreamingPivot.intervalJoin(side("click"), side("purchase")),
      "stream_join_out",
      org.apache.spark.sql.streaming.OutputMode.Append(),
      shufflePartitions = Some(8))
  }

  private[graft] lazy val streamJoinSql: String =
    """SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id,
      |  epoch_ns(a.ts) // 1000 AS click_us,
      |  epoch_ns(b.ts) // 1000 AS purchase_us,
      |  CAST(floor(b.value * 100) AS BIGINT) AS val_x100
      |FROM events a JOIN events b
      |  ON a.event_type = 'click' AND b.event_type = 'purchase'
      |  AND a.user_id = b.user_id
      |  AND epoch_ns(b.ts) // 1000 >= epoch_ns(a.ts) // 1000
      |  AND epoch_ns(b.ts) // 1000 <= epoch_ns(a.ts) // 1000 + 14400000000""".stripMargin

  /** Streaming exact dedup: distinct (rowKey, qualifier) pairs maintained as
    * streaming state, run to batch parity (append mode).
    */
  def streamDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = StreamingPivot.eventCellsStream(spark, sfDir)
    // 8 state partitions: one entry per distinct pair, ~10^4 state rows
    // (r21, the state-VOLUME sizing rule — see stream_pivot).
    StreamingPivot.runAvailableNow(
      StreamingPivot.distinctKeys(cells, Seq("rowKey", "qualifier")),
      "stream_dedup_out",
      org.apache.spark.sql.streaming.OutputMode.Append(),
      shufflePartitions = Some(8))
  }

  private[graft] lazy val streamDedupSql: String =
    """SELECT DISTINCT lpad(CAST(user_id AS VARCHAR), 8, '0') AS rowKey,
      |  event_type AS qualifier
      |FROM events""".stripMargin

  /** Gap-based sessionization (1-hour gap) via flatMapGroupsWithState in
    * LIVE-STREAM mode: the events replay as multiple micro-batches
    * (`maxFilesPerTrigger=1` over time-ordered chunk files), so session
    * state genuinely carries across batches and event-time timeouts flush
    * idle tails mid-stream; oracle = the batch window-function formulation.
    */
  def streamSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val gap = SessionGapNanos
    val dir = ensureSessionDir(spark, sfDir)
    val raw = spark.readStream
      .schema("user_id BIGINT, event_id BIGINT, tsNanos BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("eventTime", expr("timestamp_micros(tsNanos DIV 1000)"))
      .withWatermark("eventTime", "0 seconds")
      .as[StreamingPivot.SessionEvent]
    // State volume is one open-tail per user (~10^3-10^4): 8 state
    // partitions, not 32 — a 5-batch replay pays per-store per-batch
    // commit I/O (the stream_join sizing rule).
    StreamingPivot.runAvailableNow(
      StreamingPivot.Sessionize(raw, gapNanos = gap).toDF(),
      "stream_sessions_out",
      org.apache.spark.sql.streaming.OutputMode.Append(),
      shufflePartitions = Some(8))
  }

  /** Sessionization under ALLOWED LATENESS: the same events replayed with
    * adjacent time-range chunks swapped (every batch after the first is
    * out of event-time order), watermark delay = the staged disorder bound,
    * through [[StreamingPivot.SessionizeLate]]'s buffering state machine.
    * Same batch oracle as `stream_sessions` — lateness handling must not
    * change the sessions, only survive the disorder.
    */
  def streamSessionsLate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val gap = SessionGapNanos
    val (dir, lateNs) = ensureSessionLateDir(spark, sfDir)
    val raw = spark.readStream
      .schema("user_id BIGINT, event_id BIGINT, tsNanos BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("eventTime", expr("timestamp_micros(tsNanos DIV 1000)"))
      .withWatermark("eventTime", s"${lateNs / 1000000L + 2} milliseconds")
      .as[StreamingPivot.SessionEvent]
    StreamingPivot.runAvailableNow(
      StreamingPivot.SessionizeLate(raw, gapNanos = gap).toDF(),
      "stream_sessions_late_out",
      org.apache.spark.sql.streaming.OutputMode.Append(),
      shufflePartitions = Some(8))
  }

  private[graft] lazy val streamSessionsSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS t FROM events),
      |x AS (SELECT user_id, t, event_id,
      |        lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev
      |      FROM e),
      |s AS (SELECT user_id, t, event_id,
      |        CASE WHEN prev IS NULL OR t - prev > 3600000000000 THEN 1 ELSE 0 END AS brk
      |      FROM x),
      |g AS (SELECT user_id, t,
      |        (sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
      |                        ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS sid
      |      FROM s)
      |SELECT user_id, sid AS session_idx, count(*) AS n_events,
      |  min(t) // 1000 AS start_us, max(t) // 1000 AS end_us
      |FROM g GROUP BY 1, 2""".stripMargin

  /** The mapGroupsWithState memstore (latest cell per qualifier per rowKey)
    * run to batch parity — equals the batch pivot plus the max cell ts.
    */
  def streamMemstore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = StreamingPivot.eventCellsStream(spark, sfDir)
      .select(col("rowKey"), col("qualifier"),
        decode(col("value"), "UTF-8").as("value"), col("ts").as("cellTs"))
      .as[StreamingPivot.CellEvent]
    val snap = StreamingPivot.LatestCells(cells).toDF()
    // Update-mode memory sink appends one snapshot per key per batch; the
    // per-key version counter picks the newest deterministically whatever
    // the batching (single-batch here, but not assumed).
    StreamingPivot.runAvailableNow(snap, "stream_memstore_out",
        org.apache.spark.sql.streaming.OutputMode.Update(),
        // 8 state partitions: O(#rowKeys) ~ 10^4 state rows (r21, the
        // state-VOLUME sizing rule — see stream_pivot)
        shufflePartitions = Some(8))
      .groupBy(col("rowKey"))
      .agg(max_by(struct(col("qualifiers"), col("lastTs")), col("version")).as("s"))
      .select(col("rowKey") +:
        EventCols.map(c => col("s.qualifiers").getItem(c).as(c)) :+
        col("s.lastTs").as("last_ts"): _*)
  }

  /** The VERSIONED memstore run to batch parity: newest 2 versions per
    * (rowKey, qualifier) retained in streaming state — the streaming twin
    * of `kv_versions_retain` and the general form of `stream_memstore`
    * (which is k=1). The newest snapshot per key explodes to one row per
    * retained version.
    */
  def streamMemstoreVersions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = StreamingPivot.eventCellsStream(spark, sfDir)
      .select(col("rowKey"), col("qualifier"),
        decode(col("value"), "UTF-8").as("value"), col("ts").as("cellTs"))
      .as[StreamingPivot.CellEvent]
    val snap = StreamingPivot.VersionedCells(cells, k = 2).toDF()
    StreamingPivot.runAvailableNow(snap, "stream_memstore_versions_out",
        org.apache.spark.sql.streaming.OutputMode.Update(),
        // 8 state partitions: k=2 versions per coordinate, ~10^4 state
        // rows (r21, the state-VOLUME sizing rule — see stream_pivot)
        shufflePartitions = Some(8))
      .groupBy(col("rowKey"))
      .agg(max_by(col("cells"), col("version")).as("cells"))
      .select(col("rowKey"), explode(col("cells")).as(Seq("qualifier", "vs")))
      .select(col("rowKey"), col("qualifier"),
        posexplode(col("vs")).as(Seq("pos", "v")))
      .select(col("rowKey"), col("qualifier"),
        (col("pos") + 1).cast("long").as("version"),
        col("v.value").as("value"), col("v.ts").as("ts"))
  }

  private[graft] lazy val streamMemstoreVersionsSql: String =
    """SELECT lpad(CAST(user_id AS VARCHAR), 8, '0') AS rowKey,
      |  event_type AS qualifier,
      |  row_number() OVER (PARTITION BY user_id, event_type
      |    ORDER BY event_id DESC,
      |             CAST(CAST(floor(value*100) AS BIGINT) AS VARCHAR))::BIGINT AS version,
      |  CAST(CAST(floor(value*100) AS BIGINT) AS VARCHAR) AS value,
      |  event_id AS ts
      |FROM events
      |QUALIFY version <= 2""".stripMargin

  private[graft] lazy val streamMemstoreSql: String = {
    val aggs = EventCols.map { c =>
      s"max_by(CAST(CAST(floor(value*100) AS BIGINT) AS VARCHAR), event_id) FILTER (WHERE event_type = '$c') AS $c"
    }.mkString(", ")
    s"""SELECT lpad(CAST(user_id AS VARCHAR), 8, '0') AS rowKey, $aggs,
       |  max(event_id) AS last_ts
       |FROM events GROUP BY 1""".stripMargin
  }

}
