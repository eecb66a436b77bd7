package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming over a `graft-kv` table directory — the HBase
  * WAL-tail / replication analog (an HBase replication peer consumes the
  * write-ahead log in sequence-id order; SURVEY §2.1's scan surface covers
  * the at-rest table, this covers the table's CHANGE stream).
  *
  * The WAL is modeled as the table directory's region files consumed in
  * NAME order: appenders must write lexicographically increasing file names
  * (the WAL sequence-id analog — each segment seals before the next opens).
  * That convention buys an O(1) offset: the watermark is the last consumed
  * file NAME, not a seen-files set — the checkpoint stays constant-size when
  * a 100-TB table has accumulated millions of segments, and a restart
  * resumes with one string comparison per listed file.
  *
  * Scale/architecture notes:
  *  - `SupportsTriggerAvailableNow`: the end watermark is pinned ONCE at
  *    query start, so a bounded replay ("catch up to now, then stop") is
  *    deterministic even while writers keep appending.
  *  - Admission control (`maxFilesPerBatch` option): bounds per-batch work
  *    like the file source's `maxFilesPerTrigger` — state-store commit
  *    cadence and task count per micro-batch stay flat regardless of how
  *    far behind the tail is.
  *  - The batch scan's pushdown surface is REUSED verbatim: family /
  *    qualifier / ts predicates reach the parquet record reader, and rowKey
  *    bounds prune whole segments from a batch's partition list (a
  *    replication consumer that only watches a key range never schedules
  *    the other regions' segments).
  *
  * Offsets are exclusive-start / inclusive-end: a batch covers files with
  * `start.watermark < name <= end.watermark`.
  */
private[sources] class KvTailStream(
    path: String, required: StructType, pushed: Array[Filter],
    maxFilesPerBatch: Option[Int])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val conf = new Configuration()

  /** Region-file names after `watermark`, name-sorted (segment order). */
  private def segmentsAfter(watermark: String): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).map(_.getPath)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .filter(_.getName > watermark)
      .sortBy(_.getName).toSeq
  }

  /** End watermark pinned by Trigger.AvailableNow at query start. */
  @volatile private var availableNowEnd: Option[String] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(segmentsAfter("").lastOption.fold("")(_.getName))

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerBatch.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[KvWalOffset].watermark
    val pending = availableNowEnd match {
      case Some(cap) => segmentsAfter(from).filter(_.getName <= cap)
      case None => segmentsAfter(from)
    }
    val taken = limit match {
      case m: ReadMaxFiles => pending.take(m.maxFiles())
      case _ => pending
    }
    if (taken.isEmpty) start else KvWalOffset(taken.last.getName)
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "graft-kv tail uses admission control; latestOffset(start, limit) is the entry point")

  /** Files in `(start, end]`, region-pruned by pushed rowKey bounds the
    * same way the batch scan prunes — per batch, because each batch plans
    * its own partition list.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[KvWalOffset].watermark
    val hi = end.asInstanceOf[KvWalOffset].watermark
    val files = segmentsAfter(lo).filter(_.getName <= hi)
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

  // Same direct-to-InternalRow reader as the batch scan: filter-only
  // columns materialized for the record filter, not emitted.
  override def createReaderFactory(): PartitionReaderFactory = {
    val filterCols = pushed.toSeq.flatMap(_.references).distinct
    val projNames = (required.fieldNames ++ filterCols).distinct.toSeq
    KvReaderFactory(projNames, required.fieldNames.toSeq,
      KvFilters.toParquet(pushed))
  }

  override def initialOffset(): Offset = KvWalOffset("")
  override def deserializeOffset(json: String): Offset = KvWalOffset(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def toString: String =
    s"GraftKvTail path=$path pushed=[${pushed.mkString(", ")}]"
}

/** The tail's offset: the last consumed segment NAME (constant-size,
  * unlike a seen-files map). `json()` is the raw name — the offset log
  * stores it verbatim and [[KvTailStream.deserializeOffset]] restores it.
  */
private[sources] case class KvWalOffset(watermark: String) extends Offset {
  override def json(): String = watermark
}
