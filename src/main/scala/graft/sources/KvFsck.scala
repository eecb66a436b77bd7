package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Consistency check for a `graft-kv` table — the `hbck` analog: does the
  * MANIFEST's view of the table agree with the FILESYSTEM, and is every
  * byte on disk accounted for? Read-only: the check never repairs (vacuum
  * is the one deleter; a missing live file has no safe automatic fix).
  *
  * Accounting model: every `part-*.parquet` under the table root is
  * exactly one of
  *  - LIVE — in the manifest's current live set,
  *  - PENDING REMOVAL — removed by some entry, awaiting vacuum grace
  *    ([[KvLog.removalTimes]]; in-flight readers may still be on it),
  *  - SNAPSHOT-PINNED — referenced only by a named snapshot
  *    ([[KvSnapshot]]; vacuum skips it until the snapshot drops),
  *  - ORPHAN — referenced by nothing (a crash stray; vacuum-eligible
  *    after grace).
  * `liveMissing` / `snapshotMissing` count files the manifest/snapshots
  * reference that are NOT on disk — the two states that mean data loss
  * (vacuum reclaiming below a pin would have to have raced, or an
  * operator deleted files by hand). `boundsInverted` counts manifest
  * stats with minKey > maxKey — impossible from the sink's writers, so a
  * nonzero value means a corrupted or hand-edited log.
  *
  * Scale shape: one manifest replay + one directory listing + set
  * arithmetic, all driver-side metadata — no data file is opened, so the
  * check costs the same on a 100-TB table as on a test fixture.
  */
object KvFsck {

  case class Report(
      liveFiles: Long,
      liveMissing: Long,
      statsCoverage: Long,
      bloomCoverage: Long,
      pendingRemovals: Long,
      snapshotPinned: Long,
      snapshotMissing: Long,
      orphans: Long,
      scratchDirs: Long,
      logEntries: Long,
      boundsInverted: Long) {
    /** No referenced file is missing and no manifest stat is corrupt. */
    def healthy: Boolean =
      liveMissing == 0 && snapshotMissing == 0 && boundsInverted == 0
    /** The (check, value) rows a report prints / the fsck query emits. */
    def rows: Seq[(String, Long)] = Seq(
      "live_files" -> liveFiles,
      "live_missing" -> liveMissing,
      "stats_coverage" -> statsCoverage,
      "bloom_coverage" -> bloomCoverage,
      "pending_removals" -> pendingRemovals,
      "snapshot_pinned" -> snapshotPinned,
      "snapshot_missing" -> snapshotMissing,
      "orphans" -> orphans,
      "scratch_dirs" -> scratchDirs,
      "log_entries" -> logEntries,
      "bounds_inverted" -> boundsInverted,
      "healthy" -> (if (healthy) 1L else 0L))
  }

  def check(spark: SparkSession, path: String): Report = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(dir), s"graft-kv fsck: no table at $path")
    require(KvLog.exists(fs, dir),
      s"graft-kv fsck: $path has no manifest log — consistency is undefined " +
        "for legacy/externally-staged directories (every file is 'live')")
    val live = KvLog.liveFiles(fs, dir).toSet
    val stats = KvLog.liveFileStats(fs, dir)
    val removals = KvLog.removalTimes(fs, dir).keySet
    val snapRefs = KvSnapshot.referencedFiles(fs, dir)
    val listing = fs.listStatus(dir)
    val onDisk = listing.map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet")).toSet
    val scratch = listing.filter(_.isDirectory).map(_.getPath.getName)
      .count(n => n.startsWith("_tmp_") || n.startsWith("_compact_"))
    Report(
      liveFiles = live.size,
      liveMissing = (live -- onDisk).size,
      statsCoverage = live.count(stats.contains),
      bloomCoverage = live.count(f => stats.get(f).exists(_.bloom.isDefined)),
      pendingRemovals = (removals & onDisk -- live).size,
      snapshotPinned = (snapRefs & onDisk -- live -- removals).size,
      snapshotMissing = (snapRefs -- onDisk).size,
      orphans = (onDisk -- live -- removals -- snapRefs).size,
      scratchDirs = scratch,
      logEntries = KvLog.history(fs, dir).size,
      boundsInverted = stats.valuesIterator.count(s =>
        s.minKey.zip(s.maxKey).exists { case (lo, hi) => lo > hi }))
  }
}
