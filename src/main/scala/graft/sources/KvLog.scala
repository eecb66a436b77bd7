package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The table's segment MANIFEST LOG — the WAL sequence directory of the
  * `graft-kv` connector (HBase's WAL file list + an LSM MANIFEST in one).
  *
  * Why it exists (the 100-TB argument): the tail's previous admission path
  * called `fs.listStatus` on the WHOLE table directory every micro-batch and
  * filtered names above the watermark — O(all segments) per batch, which at
  * the millions of segments a long-lived table accumulates is the dominant
  * cost on an object store and a throttling magnet. The log inverts that:
  * every sink COMMIT appends one immutable, sequence-numbered entry listing
  * the files it sealed, and a reader resumes by probing `seq+1, seq+2, …`
  * with one `getFileStatus` each — O(new commits), ZERO directory listings
  * in the steady state (KvStreamSpec counts the calls under a counting
  * filesystem to pin this).
  *
  * It is also the ATOMICITY boundary the directory never was: a listing can
  * surface a later-named file while an earlier one from the same commit is
  * still invisible (eventually-consistent stores, mid-commit reads), which
  * would silently skip data under a name watermark. An entry is written to a
  * temp name and RENAMED into place, so a commit's whole file set becomes
  * visible in one atomic step and delivery order is COMMIT order — file
  * names no longer carry any correctness weight (they were load-bearing for
  * the legacy listing mode, where batch `part-r-*` names sorted below
  * streaming `part-e*` names and could pin a watermark past future epochs).
  *
  * Layout under `<table>/_log/`:
  *  - `%020d`-named entry files, seq starting at 0, one per commit;
  *  - `_latest`: the last committed seq (an O(1) bootstrap hint — readers
  *    self-heal by probing forward, so a torn/stale `_latest` only costs
  *    extra probes, never correctness);
  *  - `_horizon`: seq of the last COMPACTION entry. A compaction entry's
  *    `adds` are the complete live file set at that point (major
  *    compaction), so it doubles as a log CHECKPOINT: live-set replay starts
  *    there, and a tail positioned BELOW the horizon has lost segments to
  *    compaction and must fail loudly (the Kafka log-start-offset contract).
  *
  * Entry format (text, one directive per line after the header):
  * {{{
  *   v1 append writer=<queryId>:<epochId>     // writer tag optional
  *   v1 compact
  *   +<fileName>                              // sealed (or live, for compact)
  *   -<fileName>                              // removed by compaction
  * }}}
  *
  * The writer tag makes streaming epoch re-commits IDEMPOTENT: a recovered
  * query re-running `commit(epoch)` finds its own tag on the latest entry
  * and skips the duplicate append (an epoch replay is always of the latest
  * committed epoch — Spark checkpoints an epoch before starting the next).
  *
  * Single-writer assumption: one committing writer per table at a time (the
  * HBase model — one WAL appender per region server; bulk loads coordinate).
  * Concurrent commits would race the seq allocation; the rename-into-place
  * write makes the race DETECTABLE (the second rename fails), not silent.
  */
private[sources] object KvLog {

  val LogDirName = "_log"
  private val LatestName = "_latest"
  private val HorizonName = "_horizon"

  case class Entry(
      seq: Long, compact: Boolean, writer: Option[String],
      adds: Seq[String], removes: Seq[String])

  private def logDir(table: Path) = new Path(table, LogDirName)
  private def entryPath(table: Path, seq: Long) =
    new Path(logDir(table), f"$seq%020d")

  def exists(fs: FileSystem, table: Path): Boolean =
    fs.exists(logDir(table))

  /** Last committed seq, -1 when the log is empty. Reads the `_latest` hint
    * then probes FORWARD until the first missing entry — a stale hint
    * (crash between entry rename and hint update) self-heals at the cost of
    * the missed probes only.
    */
  def latestSeq(fs: FileSystem, table: Path): Long = {
    val hint = readLong(fs, new Path(logDir(table), LatestName)).getOrElse(-1L)
    var seq = hint
    while (fs.exists(entryPath(table, seq + 1))) seq += 1
    seq
  }

  /** Seq of the last compaction entry, -1 when none. */
  def horizon(fs: FileSystem, table: Path): Long =
    readLong(fs, new Path(logDir(table), HorizonName)).getOrElse(-1L)

  def read(fs: FileSystem, table: Path, seq: Long): Option[Entry] = {
    val p = entryPath(table, seq)
    if (!fs.exists(p)) None
    else {
      val lines = readText(fs, p).split("\n").toSeq.filter(_.nonEmpty)
      val header = lines.head.split(" ")
      require(header(0) == "v1", s"graft-kv log: unknown entry version in $p")
      val writer = header.drop(2).collectFirst {
        case w if w.startsWith("writer=") => w.stripPrefix("writer=")
      }
      Some(Entry(seq, compact = header(1) == "compact", writer,
        adds = lines.tail.collect { case l if l.startsWith("+") => l.tail },
        removes = lines.tail.collect { case l if l.startsWith("-") => l.tail }))
    }
  }

  /** Append an entry at `latest + 1` (temp-write + rename = atomic publish,
    * then the `_latest` hint). Returns the allocated seq. When `writer` is
    * set and already tags the latest entry, the append is a streaming epoch
    * REPLAY and is skipped (returns the existing seq).
    */
  def append(fs: FileSystem, table: Path, adds: Seq[String],
      removes: Seq[String] = Nil, compact: Boolean = false,
      writer: Option[String] = None): Long = {
    val latest = latestSeq(fs, table)
    if (writer.isDefined && latest >= 0 &&
        read(fs, table, latest).exists(_.writer == writer)) return latest
    val seq = latest + 1
    val kind = if (compact) "compact" else "append"
    val tag = writer.fold("")(w => s" writer=$w")
    val body = (s"v1 $kind$tag" +:
      (adds.map("+" + _) ++ removes.map("-" + _))).mkString("", "\n", "\n")
    val tmp = new Path(logDir(table), s".tmp-${UUID.randomUUID().toString.take(8)}")
    writeText(fs, tmp, body)
    if (!fs.rename(tmp, entryPath(table, seq)))
      throw new IllegalStateException(
        s"graft-kv log: concurrent commit detected at seq $seq of $table")
    writeText(fs, new Path(logDir(table), LatestName), seq.toString)
    if (compact) writeText(fs, new Path(logDir(table), HorizonName), seq.toString)
    seq
  }

  /** Drop the whole log (table truncate). */
  def reset(fs: FileSystem, table: Path): Unit =
    fs.delete(logDir(table), true): Unit

  /** The live data-file set by log replay, starting at the horizon
    * checkpoint (a compaction entry's adds are the complete live set, so
    * replay cost is O(commits since last compaction), not O(all commits)).
    */
  def liveFiles(fs: FileSystem, table: Path): Seq[String] = {
    val latest = latestSeq(fs, table)
    val from = math.max(horizon(fs, table), 0L)
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    (from to latest).foreach { seq =>
      read(fs, table, seq).foreach { e =>
        e.removes.foreach(live -= _)
        live ++= e.adds
      }
    }
    live.toSeq.sorted
  }

  /** The table's data files as Paths: log replay when a log exists, else a
    * directory listing (legacy/externally-staged tables). Every batch-scan
    * planning site shares this so log-carrying tables are read from their
    * MANIFEST (immune to stray files from an interrupted compaction) while
    * foreign tables keep working.
    */
  def dataFiles(fs: FileSystem, table: Path): Seq[Path] =
    if (exists(fs, table)) liveFiles(fs, table).map(new Path(table, _))
    else fs.listStatus(table).map(_.getPath)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName).toSeq

  private def readLong(fs: FileSystem, p: Path): Option[Long] =
    try { if (fs.exists(p)) Some(readText(fs, p).trim.toLong) else None }
    catch { case _: NumberFormatException => None } // torn hint: self-heal by probing

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeText(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}
