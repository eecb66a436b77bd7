package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming analog of the export pipeline (SURVEY §2.12, §7.6):
  * the reference is batch MapReduce only — this gives its A1/A2 pivot an
  * incremental mode it never had.
  *
  *  - [[windowedPivot]]: declarative watermark + windowed aggregation —
  *    one pivoted KV row per (event-time window, rowKey), last-write-wins
  *    per qualifier, incremental state managed by Spark (the scale path:
  *    state store per key-window, late data bounded by the watermark).
  *  - [[LatestCells]]: `mapGroupsWithState` — a continuously-maintained
  *    latest-cell-per-qualifier map per rowKey, i.e. the HBase *memstore*
  *    restated as typed streaming state (custom-state escape hatch for
  *    semantics windows can't express).
  *
  * Batch/stream parity: `Trigger.AvailableNow` over the same files makes the
  * streaming result comparable (and oracle-checked, `stream_pivot`) against
  * the batch GROUP BY — same plan semantics, different execution mode.
  */
object StreamingPivot {

  /** The file streaming source requires a *directory*; stage the single
    * parquet file into a fresh temp dir via symlink (testdata is read-only).
    */
  private def asStreamDir(file: String): String = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_stream_")
    dir.toFile.deleteOnExit()
    Files.createSymbolicLink(dir.resolve(Paths.get(file).getFileName), Paths.get(file))
    dir.toString
  }

  /** The raw events table as a stream (`ts` = epoch nanos, long). */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(graft.kv.KvTable.EventsParquetSchema)
      .parquet(asStreamDir(s"$sfDir/events.parquet"))

  /** The events table as a *stream* of KV cells (same mapping as
    * KvTable.eventsAsCells plus an event-time column). `ts DIV 1000` stays
    * in integer arithmetic — epoch nanos exceed 2^52, double division would
    * lose microseconds.
    */
  def eventCellsStream(spark: SparkSession, sfDir: String): DataFrame =
    eventsStream(spark, sfDir)
      .select(graft.kv.KvTable.eventCellColumns :+
        expr("timestamp_micros(ts DIV 1000)").as("eventTime"): _*)

  /** Watermarked, windowed A1/A2: per (window, rowKey), the max-ts value
    * of each schema qualifier. Emits `win_start_us` (epoch micros of the
    * window start) so downstream schemas stay engine-neutral.
    */
  def windowedPivot(
      cells: DataFrame,
      columns: Seq[String],
      windowDur: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    // Same hash-aggregable LWW as the batch pivot (KvPivot): the custom
    // aggregate keeps the stateful agg ObjectHash-based instead of sorting
    // every micro-batch.
    val aggs = columns.map { c =>
      graft.functions.MaxByTsAgg.maxByTs(
        col("value"), when(col("qualifier") === c, col("ts"))).as(c)
    }
    cells
      .filter(col("qualifier").isin(columns: _*))
      .withWatermark("eventTime", watermark)
      .groupBy(window(col("eventTime"), windowDur), col("rowKey"))
      .agg(aggs.head, aggs.tail: _*)
      .select(unix_micros(col("window.start")).as("win_start_us") +:
        col("rowKey") +: columns.map(c => decode(col(c), "UTF-8").as(c)): _*)
  }

  /** Run a streaming DataFrame to completion over the currently-available
    * input (batch parity mode) and return the full result.
    */
  def runAvailableNow(df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val spark = df.sparkSession
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Streaming exact dedup: the set of distinct key tuples seen so far —
    * in-flight dedup for an ingest pipeline (state = one entry per distinct
    * tuple; with a watermark column in `cols` the state would age out —
    * unbounded here because batch-parity runs are finite). Projecting to
    * exactly the dedup columns keeps the result a deterministic SET:
    * `dropDuplicates` over wider rows would keep an arbitrary first arrival
    * per key, which no oracle could replay.
    */
  def distinctKeys(cells: DataFrame, cols: Seq[String]): DataFrame =
    cells.select(cols.map(col): _*).dropDuplicates(cols)

  // ------------------------------------------------- sessionization

  case class SessionEvent(user_id: Long, event_id: Long, tsNanos: Long)
  case class SessionRow(
      user_id: Long, session_idx: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /** Gap-based sessionization: a user's events split into sessions wherever
    * consecutive event times are more than `gapNanos` apart — the grouping
    * pass a behavioral-training pipeline runs before sampling
    * conversations/sessions. `flatMapGroupsWithState` is the custom-state
    * escape hatch (sessions are not expressible as watermarked windows:
    * boundaries depend on the data, not the clock).
    *
    * Batch-parity mode (Trigger.AvailableNow, one batch) delivers each key's
    * full event iterator at once, so state never carries across batches and
    * the result equals the batch window formulation the oracle runs. In a
    * live stream the same state type holds the open session tail per key and
    * an event-time timeout flushes it — same merge logic, documented here
    * rather than exercised (the harness compares against batch SQL).
    */
  object Sessionize {
    def apply(events: Dataset[SessionEvent], gapNanos: Long): Dataset[SessionRow] = {
      import events.sparkSession.implicits._
      events.groupByKey(_.user_id)
        .flatMapGroupsWithState[List[SessionRow], SessionRow](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (user: Long, it: Iterator[SessionEvent], state: GroupState[List[SessionRow]]) =>
            // Batch-parity guard: this formulation sessionizes each key's
            // FULL event set in one call. If the source ever splits a key
            // across micro-batches (maxFilesPerTrigger, restart from a
            // checkpoint), per-batch sessionization would be silently wrong
            // — fail loudly instead. (The live-stream variant would keep the
            // open session tail in this state with an event-time timeout.)
            if (state.exists)
              throw new IllegalStateException(
                s"Sessionize batch-parity run saw key $user in a second " +
                  "micro-batch; single-batch input required")
            state.update(Nil)
            // Sort once per key per batch: session boundaries need time order.
            val ts = it.map(e => (e.tsNanos, e.event_id)).toArray.sorted
            val out = List.newBuilder[SessionRow]
            var idx = 0L; var n = 0L; var start = 0L; var last = Long.MinValue
            ts.foreach { case (t, _) =>
              if (n > 0 && t - last > gapNanos) {
                out += SessionRow(user, idx, n, start / 1000, last / 1000)
                idx += 1; n = 0
              }
              if (n == 0) start = t
              n += 1; last = t
            }
            if (n > 0) out += SessionRow(user, idx, n, start / 1000, last / 1000)
            out.result().iterator
        }
    }
  }

  // ------------------------------------------------- custom state (memstore)

  case class CellEvent(rowKey: String, qualifier: String, value: String, cellTs: Long)

  /** Latest cell per qualifier for one rowKey — the memstore row. `version`
    * counts state updates for this key: strictly increasing per key across
    * batches, so downstream consumers of an update-mode sink (which appends
    * one snapshot per key per batch) can pick the newest snapshot
    * deterministically — `lastTs` alone cannot (a late cell for another
    * qualifier changes content without raising the max ts).
    */
  case class RowSnapshot(
      rowKey: String, qualifiers: Map[String, String], lastTs: Long, version: Long)

  object LatestCells {

    type State = (Long, Map[String, (String, Long)]) // (version, cells)

    /** LWW merge of new cells into the per-key state. */
    def update(
        key: String,
        events: Iterator[CellEvent],
        state: GroupState[State]): RowSnapshot = {
      val (version, prev) = state.getOption.getOrElse((0L, Map.empty[String, (String, Long)]))
      val next = events.foldLeft(prev) { (m, e) =>
        m.get(e.qualifier) match {
          case Some((_, ts)) if ts >= e.cellTs => m // stale write loses
          case _ => m.updated(e.qualifier, (e.value, e.cellTs))
        }
      }
      state.update((version + 1, next))
      RowSnapshot(key, next.map { case (q, (v, _)) => q -> v },
        if (next.isEmpty) 0L else next.values.map(_._2).max, version + 1)
    }

    /** The streaming memstore: one snapshot row per rowKey per batch. */
    def apply(cells: Dataset[CellEvent]): Dataset[RowSnapshot] = {
      import cells.sparkSession.implicits._
      cells.groupByKey(_.rowKey)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
          (k: String, it: Iterator[CellEvent], s: GroupState[State]) =>
            update(k, it, s))
    }
  }
}
