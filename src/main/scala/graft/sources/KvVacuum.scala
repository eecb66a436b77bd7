package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** GARBAGE COLLECTION for `graft-kv` tables — deletes files the manifest
  * does not reference (the Delta VACUUM analog; HBase's equivalent is the
  * HFile cleaner chain). The log's crash-safety story deliberately LEAKS
  * files instead of risking data: a compaction that dies between staging
  * and publish leaves renamed `part-c*` files and a `_compact_*` scratch
  * dir; a compaction that dies between publish and its deletes leaves the
  * merged-away originals; an epoch whose log append crashed leaves sealed
  * targets. All are invisible (every reader plans from the manifest), so
  * correctness never depends on this pass — it reclaims bytes, nothing
  * else. That one-sidedness is what makes it safe to run anytime.
  *
  * The GRACE PERIOD is the only correctness-adjacent knob: a batch commit
  * renames its sealed files into place BEFORE appending its log entry, so
  * a zero-grace vacuum racing that window would delete a commit in flight.
  * Files younger than `graceMs` are never touched (Delta's retention
  * check, same reasoning). In-flight scans planned before a vacuum hold
  * pre-publish file lists the same way they do across compaction's
  * deletes — the grace period is also their read window.
  *
  * Scale shape: one `listStatus` of the table root (bounded region
  * metadata, driver-side — the same cost every scan-planning pass pays)
  * plus one manifest replay; deletes are per-stray, not per-live-file.
  * Requires a manifest: on a legacy directory every file is only
  * discoverable by listing, so "unreferenced" is undefined and vacuum
  * refuses rather than guesses.
  */
object KvVacuum {

  sealed trait Result
  case class Vacuumed(deletedFiles: Int, deletedBytes: Long, scratchDirs: Int)
      extends Result
  case class Skipped(reason: String) extends Result

  def vacuum(spark: SparkSession, path: String, graceMs: Long = 24L * 3600 * 1000)
      : Result = {
    require(graceMs >= 0, "graft-kv vacuum: grace must be non-negative")
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return Skipped(s"no table at $path")
    if (!KvLog.exists(fs, dir)) return Skipped(
      s"$path has no manifest log: unreferenced files are undefined on a " +
        "legacy directory (every part-* file there IS the table)")
    val live = KvLog.liveFiles(fs, dir).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    var files = 0
    var bytes = 0L
    var dirs = 0
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      val expired = st.getModificationTime < cutoff
      if (st.isDirectory && n.startsWith("_compact_") && expired) {
        fs.delete(st.getPath, true): Unit
        dirs += 1
      } else if (st.isFile && n.startsWith("part-") && n.endsWith(".parquet")
          && !live.contains(n) && expired) {
        bytes += st.getLen
        fs.delete(st.getPath, false): Unit
        files += 1
      }
    }
    Vacuumed(files, bytes, dirs)
  }
}
