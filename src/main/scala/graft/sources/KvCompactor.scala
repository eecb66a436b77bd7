package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** COMPACTION for `graft-kv` tables — the HBase compaction cycle the write
  * path implies (CreateTable.java:28,56-57 sizes regions at 100 GB under
  * `ConstantSizeRegionSplitPolicy`; memstore flushes — our streaming epochs
  * — pile up small HFiles until a compaction merges them): a long-tailed
  * streaming sink seals one small segment set per epoch forever, so without
  * compaction a table's file count grows without bound and every scan pays
  * O(all epochs) open costs.
  *
  * The merge itself is the ENGINE's own write path: read the mergeable
  * segments, write them back through the `graft-kv` sink — [[KvWrite]]'s
  * `RequiresDistributionAndOrdering` re-range-partitions on rowKey into
  * `regions` files sorted by (rowKey, qualifier), i.e. the merged output is
  * by construction the bulk-load layout. At scale the merge shuffles the
  * merged bytes ONCE, amortized against every later scan opening `regions`
  * files instead of epochs × regions.
  *
  * Tail gating — the HBase WAL-cleanup / replication-peer contract, which
  * also makes compaction PARTIAL: a REGISTERED tail ([[KvTailStream]]
  * `tailId` option) records the log seq below which it is durably
  * committed, and because Spark acknowledges a batch's source commit while
  * running the NEXT batch, a live tail's mark structurally trails the log
  * end — compaction must never wait for marks to pass the tip (they only do
  * while data flows). Instead it merges ONLY segments attributed below the
  * gating floor `min(tail marks)` and CARRIES newer entries' files into the
  * checkpoint entry unmerged: tails at or above the floor keep replaying
  * from the original segments, fresh tails start from the checkpoint's
  * complete live set, and nothing ever waits on an idle pipeline. With no
  * registered tails the floor is the log end and compaction is the full
  * major pass ([[KvLog.floor]] == horizon).
  *
  * Publish protocol (all-or-nothing against [[KvLog]]):
  *  1. stage the merged files in a scratch dir under the table (invisible:
  *     manifest readers plan from the log, and the name filter skips it),
  *  2. rename them in as `part-c<seq>-<region>.parquet` keyed by the
  *     PRE-ALLOCATED seq,
  *  3. append ONE `compact` entry — adds = merged + carried (the complete
  *     live set, making the entry a log CHECKPOINT), removes = every
  *     merged-away segment, floor = the gating floor; `expectSeq` aborts
  *     pre-publish if a concurrent commit moved the log,
  *  4. delete ONLY the (now empty) scratch dir. The merged-away segments
  *     are NOT deleted here: manifest readers planned from here on never
  *     see them, but an in-flight scan planned pre-publish may still hold
  *     their paths — physical reclamation is [[KvVacuum]]'s job, whose
  *     grace period runs from this entry's publish time
  *     ([[KvLog.removalTimes]]), giving every pre-publish reader a full
  *     grace window to finish (the Delta OPTIMIZE/VACUUM split). A crash
  *     at any earlier step leaves stray files no manifest entry references
  *     — invisible to every reader, reclaimed by the same vacuum pass.
  */
object KvCompactor {

  sealed trait Result
  /** Compaction published at log `seq`: `merged` segments → `into` files. */
  case class Compacted(seq: Long, merged: Int, into: Int) extends Result
  /** Compaction did not run; `reason` says why (not an error — parking on
    * tail progress or an already-compact table is the normal idle state).
    */
  case class Parked(reason: String) extends Result

  def compact(spark: SparkSession, path: String, regions: Int): Result = {
    require(regions > 0, "graft-kv compaction: regions must be positive")
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return Parked(s"no table at $path")
    KvLog.seedFromDirIfNeeded(fs, dir) // legacy table: manifest first
    val latest = KvLog.latestSeq(fs, dir)
    if (latest < 0) return Parked("empty table: nothing to compact")
    val marks = KvLog.tailPositions(fs, dir)
    // The gating floor: merge strictly below the slowest registered tail;
    // with none registered, below the log end + 1 (full major compaction).
    val gate = if (marks.isEmpty) latest + 1 else marks.values.min
    if (KvLog.horizon(fs, dir) == latest && KvLog.floor(fs, dir) == latest &&
        gate > latest)
      return Parked(s"already compacted at seq $latest")
    val (mergeSet, carrySet) =
      KvLog.liveFilesWithSeq(fs, dir).partition(_._2 < gate)
    if (mergeSet.size < 2)
      return Parked(
        if (marks.isEmpty) "nothing to merge: fewer than 2 compactable segments"
        else s"registered tails gate compaction below seq $gate: " +
          marks.toSeq.sorted.map { case (id, m) => s"$id@$m" }.mkString(", "))

    val expectSeq = latest + 1
    val tmp = new Path(dir, s"_compact_${UUID.randomUUID().toString.take(8)}")
    val cellCols = graft.kv.Cell.schema.fieldNames.map(org.apache.spark.sql.functions.col)
    spark.read.parquet(mergeSet.map(f => s"$path/${f._1}"): _*)
      .select(cellCols.toIndexedSeq: _*)
      .write.format("graft-kv").option("regions", regions)
      .mode("overwrite").save(tmp.toString)
    val merged = KvLog.dataFiles(fs, tmp).zipWithIndex.map { case (f, i) =>
      val target = new Path(dir, f"part-c$expectSeq%010d-$i%05d.parquet")
      if (!fs.rename(f, target)) throw new IllegalStateException(
        s"graft-kv compaction: staging rename to $target failed")
      target.getName
    }
    val seq = KvLog.append(fs, dir, adds = merged ++ carrySet.map(_._1),
      removes = mergeSet.map(_._1), compact = true,
      expectSeq = Some(expectSeq), floor = Some(math.min(gate, expectSeq)))
    // Merged-away segments stay on disk for in-flight readers (see the
    // publish protocol above); only the emptied scratch dir goes now.
    fs.delete(tmp, true)
    Compacted(seq, merged = mergeSet.size, into = merged.size)
  }
}
