package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.internal.Logging
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Micro-batch streaming over a `graft-kv` table directory — the HBase
  * WAL-tail / replication analog (an HBase replication peer consumes the
  * write-ahead log in sequence-id order; SURVEY §2.1's scan surface covers
  * the at-rest table, this covers the table's CHANGE stream).
  *
  * Two admission modes, chosen by whether the table carries a manifest log
  * ([[KvLog]] — every `graft-kv` sink commit writes one):
  *
  *  - **Log mode** (manifest present): the offset is a position in the
  *    segment log — `(entry seq, files consumed within that entry)` — and a
  *    micro-batch admits files by probing entries `seq, seq+1, …` with one
  *    `getFileStatus` each. Cost per batch is O(new commits), with ZERO
  *    directory listings (KvStreamSpec pins this with a counting
  *    filesystem); delivery order is COMMIT order, atomically published by
  *    the entry rename, so neither file-name conventions nor
  *    listing-visibility order carry correctness weight. Entries are
  *    immutable, so re-planning a recovered batch re-reads the same files.
  *    A position below the table's compaction horizon fails loudly —
  *    those segments were merged away (the Kafka log-start-offset
  *    contract; a production deployment would instead gate compaction on
  *    tail progress, as HBase gates WAL cleanup on replication peers).
  *
  *  - **Legacy mode** (no manifest: externally-staged directories): the
  *    round-7 behavior — the offset is the last consumed file NAME and each
  *    batch lists the directory and takes names above the watermark.
  *    Appenders must seal lexicographically increasing names, and the
  *    filesystem must list with strong consistency (a later-named file must
  *    never be visible while an earlier one is still in flight) — both
  *    assumptions the manifest log exists to remove. A warning is logged
  *    once per stream.
  *
  * Scale/architecture notes:
  *  - `SupportsTriggerAvailableNow`: the end position is pinned ONCE at
  *    query start, so a bounded replay ("catch up to now, then stop") is
  *    deterministic even while writers keep appending.
  *  - Admission control (`maxFilesPerBatch` option): bounds per-batch work
  *    like the file source's `maxFilesPerTrigger` — and in log mode it
  *    splits WITHIN a large commit's entry (one bulk-load commit can seal
  *    thousands of region files; the tail still paces them).
  *  - The batch scan's pushdown surface is REUSED verbatim: family /
  *    qualifier / ts predicates reach the parquet record reader, and rowKey
  *    bounds prune whole segments from a batch's partition list (a
  *    replication consumer that only watches a key range never schedules
  *    the other regions' segments).
  *
  * Offsets are exclusive-start / inclusive-end: a batch covers files
  * strictly after `start` up to and including `end`.
  */
private[sources] class KvTailStream(
    path: String, required: StructType, pushed: Array[Filter],
    maxFilesPerBatch: Option[Int], confBroadcast: SerializableConfiguration)
    extends MicroBatchStream with SupportsTriggerAvailableNow with Logging {

  def this(path: String, required: StructType, pushed: Array[Filter],
      maxFilesPerBatch: Option[Int]) =
    this(path, required, pushed, maxFilesPerBatch, KvScanBuilder.activeConf)

  private def conf: Configuration = confBroadcast.value
  private val tableDir = new Path(path)
  private def fs = tableDir.getFileSystem(conf)

  // ------------------------------------------------------------ log mode

  /** Position in the segment log: entries `< seq` fully consumed, first
    * `idx` files of entry `seq` consumed.
    */
  private case class LogPos(seq: Long, idx: Int) {
    def encode: String = s"log:$seq:$idx"
  }

  private def decodePos(watermark: String): Option[LogPos] =
    if (!watermark.startsWith("log:")) None
    else watermark.split(":") match {
      case Array(_, s, i) => Some(LogPos(s.toLong, i.toInt))
      case _ => throw new IllegalStateException(
        s"graft-kv tail: malformed log offset '$watermark'")
    }

  /** Walk log entries from `pos`, collecting up to `maxFiles` file names
    * (compaction entries contribute none — their contents were delivered by
    * the original appends). Probes sequentially; O(entries visited), no
    * listing. Returns the admitted files and the advanced position.
    */
  private def advance(pos: LogPos, maxFiles: Int, capSeq: Long): (Seq[Path], LogPos) = {
    val hz = KvLog.horizon(fs, tableDir)
    if (pos.seq < hz) throw new IllegalStateException(
      s"graft-kv tail: offset at log entry ${pos.seq} is behind the compaction " +
        s"horizon $hz of $path — the segments were merged away. Restart the " +
        "tail from a fresh checkpoint (or gate compaction on tail progress).")
    val files = Seq.newBuilder[Path]
    var taken = 0
    var cur = pos
    var entry = KvLog.read(fs, tableDir, cur.seq)
    while (entry.isDefined && cur.seq <= capSeq && taken < maxFiles) {
      val adds = if (entry.get.compact) Nil else entry.get.adds
      val room = maxFiles - taken
      val slice = adds.slice(cur.idx, cur.idx + room)
      files ++= slice.map(new Path(tableDir, _))
      taken += slice.length
      if (cur.idx + slice.length < adds.length) {
        cur = LogPos(cur.seq, cur.idx + slice.length) // capped mid-entry
      } else {
        cur = LogPos(cur.seq + 1, 0)
        entry = if (cur.seq <= capSeq) KvLog.read(fs, tableDir, cur.seq) else None
      }
    }
    (files.result(), cur)
  }

  // --------------------------------------------------------- legacy mode

  @volatile private var warnedLegacy = false

  /** Region-file names after `watermark`, name-sorted (segment order). */
  private def segmentsAfter(watermark: String): Seq[Path] = {
    if (!warnedLegacy) {
      warnedLegacy = true
      logWarning(s"graft-kv tail of $path has no manifest log: falling back " +
        "to directory-listing admission (O(all segments) per batch). This " +
        "requires lexicographically increasing segment names and strongly " +
        "consistent listing; tables written by the graft-kv sink carry a " +
        "manifest and need neither.")
    }
    fs.listStatus(tableDir).map(_.getPath)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .filter(_.getName > watermark)
      .sortBy(_.getName).toSeq
  }

  // ---------------------------------------------------------- offset API

  /** End pinned by Trigger.AvailableNow at query start: last log seq in log
    * mode (one `_latest` read + O(1) probes), last segment name in legacy.
    */
  @volatile private var availableNowEnd: Option[String] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(
      if (KvLog.exists(fs, tableDir)) KvLog.latestSeq(fs, tableDir).toString
      else segmentsAfter("").lastOption.fold("")(_.getName))

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerBatch.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[KvWalOffset].watermark
    val maxFiles = limit match {
      case m: ReadMaxFiles => m.maxFiles()
      case _ => Int.MaxValue
    }
    decodePos(from) match {
      case Some(pos) =>
        val cap = availableNowEnd.map(_.toLong).getOrElse(Long.MaxValue)
        val (files, next) = advance(pos, maxFiles, cap)
        if (files.isEmpty) start else KvWalOffset(next.encode)
      case None =>
        val pending = availableNowEnd match {
          case Some(capName) => segmentsAfter(from).filter(_.getName <= capName)
          case None => segmentsAfter(from)
        }
        val taken = pending.take(maxFiles)
        if (taken.isEmpty) start else KvWalOffset(taken.last.getName)
    }
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "graft-kv tail uses admission control; latestOffset(start, limit) is the entry point")

  /** Files in `(start, end]`, region-pruned by pushed rowKey bounds the
    * same way the batch scan prunes — per batch, because each batch plans
    * its own partition list. Log entries are immutable, so a recovered
    * batch re-plans the exact same file set.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[KvWalOffset].watermark
    val hi = end.asInstanceOf[KvWalOffset].watermark
    val files = (decodePos(lo), decodePos(hi)) match {
      case (Some(from), Some(to)) => advanceTo(from, to)._1
      case _ => segmentsAfter(lo).filter(_.getName <= hi)
    }
    val bounds = KvFilters.rowKeyBounds(pushed)
    val kept =
      if (bounds.isEmpty) files
      else files.filter { f =>
        KvFilters.fileRowKeyRange(f, conf) match {
          case Some((kLo, kHi)) => KvFilters.intersects(bounds, kLo, kHi)
          case None => true
        }
      }
    kept.map(f => KvFilePartition(f.toString)).toArray
  }

  /** Files strictly between two log positions (exclusive start, inclusive
    * end — the batch contract).
    */
  private def advanceTo(from: LogPos, to: LogPos): (Seq[Path], LogPos) = {
    val files = Seq.newBuilder[Path]
    var cur = from
    while (cur.seq < to.seq || (cur.seq == to.seq && cur.idx < to.idx)) {
      val entry = KvLog.read(fs, tableDir, cur.seq).getOrElse(
        throw new IllegalStateException(
          s"graft-kv tail: log entry ${cur.seq} of $path vanished mid-plan"))
      val adds = if (entry.compact) Nil else entry.adds
      val until = if (cur.seq == to.seq) to.idx else adds.length
      files ++= adds.slice(cur.idx, until).map(new Path(tableDir, _))
      cur = if (until >= adds.length && cur.seq < to.seq) LogPos(cur.seq + 1, 0)
            else LogPos(cur.seq, until)
      if (cur.seq == to.seq && cur.idx >= to.idx) return (files.result(), cur)
    }
    (files.result(), cur)
  }

  // Same direct-to-InternalRow reader as the batch scan: filter-only
  // columns materialized for the record filter, not emitted.
  override def createReaderFactory(): PartitionReaderFactory = {
    val filterCols = pushed.toSeq.flatMap(_.references).distinct
    val projNames = (required.fieldNames ++ filterCols).distinct.toSeq
    KvReaderFactory(projNames, required.fieldNames.toSeq,
      KvFilters.toParquet(pushed), confBroadcast)
  }

  override def initialOffset(): Offset =
    if (KvLog.exists(fs, tableDir)) KvWalOffset(LogPos(0, 0).encode)
    else KvWalOffset("")

  override def deserializeOffset(json: String): Offset = KvWalOffset(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def toString: String =
    s"GraftKvTail path=$path pushed=[${pushed.mkString(", ")}]"
}

/** The tail's offset: a constant-size watermark — `log:<seq>:<idx>` (log
  * mode: position in the segment manifest) or the last consumed segment
  * name (legacy listing mode). `json()` is the raw string — the offset log
  * stores it verbatim and [[KvTailStream.deserializeOffset]] restores it.
  */
private[sources] case class KvWalOffset(watermark: String) extends Offset {
  override def json(): String = watermark
}
