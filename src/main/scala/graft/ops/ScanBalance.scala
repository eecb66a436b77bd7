package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism floor for effectively-unsplittable inputs (opt guide
  * §2.5 "input skew — one huge unsplittable file … repartition immediately
  * after the read").
  *
  * Parquet scans parallelize at ROW-GROUP granularity: a planned split only
  * does work when it contains a row-group midpoint, so a table written as
  * one row group executes as ONE task no matter how many splits the planner
  * cuts — and everything narrow above the scan (explode fan-outs, codec
  * mapPartitions, tokenize/shingle projections, partial aggregation) rides
  * that single task while the other cores idle. The bench fixtures are
  * exactly this shape (one row group per table), and a freshly-ingested
  * single-file drop at production scale is too.
  *
  * `ensureMinParallelism` hash-repartitions on a DETERMINISTIC key (stable
  * under task retries, unlike round-robin over a non-deterministic source —
  * SPARK-38388) to `defaultParallelism` partitions, but ONLY when the
  * planned scan parallelism is below that: a table that already scans wider
  * than the core count (the 100-TB case — thousands of row groups) passes
  * through untouched, no exchange. The partition-count consult is one
  * driver-side physical-plan build, no job. The explicit partition count
  * (rather than a bare `repartition(key)`) keeps AQE from byte-coalescing
  * the exchange back to one partition — the downstream work is CPU-heavy
  * per row, which byte-based coalescing cannot see.
  */
object ScanBalance {

  /** Memoized planned-parallelism decisions: the `df.rdd` consult builds a
    * full physical plan (analysis → optimization → file listing), ~50-100 ms
    * of driver time that would otherwise land inside every timed query that
    * reads the same table. Keyed per (table version, target) the same way
    * KvTable memoizes the ts encoding — path@mtime:len — so an overwritten
    * fixture re-decides instead of reusing a stale answer.
    */
  private val decisions =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Test hook: drop all memoized decisions. */
  private[graft] def clearCache(): Unit = decisions.clear()

  def ensureMinParallelism(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }

  /** [[ensureMinParallelism]] with the under-parallel consult memoized per
    * table version (`path` must be the scanned file/directory). Use from
    * per-query loaders over a fixed table; use the uncached form when the
    * frame is not a plain table scan.
    */
  def ensureMinParallelismFor(df: DataFrame, key: Column, path: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val cacheKey = try {
      val p = new org.apache.hadoop.fs.Path(path)
      val st = p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
        .getFileStatus(p)
      s"$path@${st.getModificationTime}:${st.getLen}#$target"
    } catch { case _: java.io.IOException => s"$path#$target" }
    val under = decisions.computeIfAbsent(cacheKey,
      _ => df.rdd.getNumPartitions < target)
    if (under) df.repartition(target, key) else df
  }
}
