package graft.kv

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D1/O1: the reference's pre-split region layout and total-order write path.
  *
  * `CreateTable` pre-splits the table into N regions at keys
  * `lpad(i * (32767 / N), 5, '0')` (CreateTable.java:61-74), and
  * `PopulateTable` writes HFiles through `TotalOrderPartitioner` + a sorting
  * reducer (PopulateTable.java:68) so each region's file is globally sorted.
  *
  * Spark restatement: explicit split points → `repartitionByRange` with the
  * same boundaries' count + `sortWithinPartitions` (Spark's `RangePartitioner`
  * samples boundaries like `TotalOrderPartitioner`'s partition file). Region
  * membership itself is a deterministic expression over the key so it can be
  * asserted (and oracle-checked) independently of Spark's sampled boundaries.
  */
object RangeLayout {

  /** The reference's split keys: `leftPad(counter, 5, '0')` where counter
    * steps by `Short.MaxValue / regionCount` (CreateTable.java:61-73). The
    * first region is unbounded below, so N regions ⇒ N-1 split points.
    */
  def splitPoints(regionCount: Int): Seq[String] = {
    val regionRange = Short.MaxValue / regionCount
    (1 until regionCount).map(i => leftPad5(i.toLong * regionRange))
  }

  private def leftPad5(n: Long): String = f"$n%05d"

  /** Deterministic region id of a key prefix under the reference's split
    * scheme: number of split points ≤ key (byte-lexicographic, which for
    * zero-padded numerics equals numeric order).
    */
  def regionOf(keyRoot: Column, regionCount: Int): Column = {
    val regionRange = Short.MaxValue / regionCount
    least(floor(keyRoot.cast("long") / regionRange), lit(regionCount - 1)).cast("int")
  }

  /** The physical write layout: one range partition per "region", sorted by
    * (rowKey, qualifier) within — the HFile invariant (PopulateTable.java:68).
    */
  def layout(cells: DataFrame, regionCount: Int): DataFrame =
    cells.repartitionByRange(regionCount, col("rowKey"))
      .sortWithinPartitions(col("rowKey"), col("qualifier"))

  /** The PERSISTED form of the write layout (completes the K5 bulk-load
    * story): a bucketed catalog table, hash-bucketed on rowKey and sorted by
    * (rowKey, qualifier) inside each bucket file — the HFile invariant as
    * catalog metadata, so a later session can pivot it with ZERO exchanges
    * ([[readBucketed]] → `KvPivot.pivotPresorted`).
    *
    * The `repartition(buckets, rowKey)` ahead of the write uses the same
    * murmur3-pmod hash as the bucket spec, so every task holds exactly one
    * bucket's rows and each bucket lands in ONE file — the condition under
    * which Spark trusts the on-disk sort.
    */
  def persistBucketed(
      cells: DataFrame, table: String, buckets: Int, path: String): Unit = {
    val spark = cells.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    graft.sinks.Sinks.deleteRecursive(spark, path)
    cells.repartition(buckets, col("rowKey"))
      .write.format("parquet")
      .bucketBy(buckets, "rowKey")
      .sortBy("rowKey", "qualifier")
      .option("path", path)
      .saveAsTable(table)
  }

  /** Read a [[persistBucketed]] table with the bucket-per-partition layout
    * GUARANTEED: `autoBucketedScan` would silently fall back to size-based
    * file splits (packing several sorted bucket files into one partition)
    * for plans that declare no partitioning requirement — `mapPartitions`
    * consumers like `pivotPresorted` declare none, so the bucketed scan must
    * be pinned on for the plan consuming this DataFrame.
    *
    * The conf is read at PLAN time of the (lazy) downstream query, so a
    * set/restore around `spark.table` would undo itself before execution.
    * Isolate it in a CLONED session instead: `newSession()` shares the
    * SparkContext and catalog (the bucketed table stays visible) but owns
    * its SQLConf, so the flip lives exactly as long as plans built on the
    * returned DataFrame and the caller's session is never mutated.
    */
  def readBucketed(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame = {
    val reader = spark.newSession()
    // newSession() starts from builder-time confs only; replay the caller's
    // effective runtime confs so tuning done via spark.conf.set (e.g. a
    // broadcast threshold) still governs plans over the returned DataFrame.
    // Static/non-modifiable entries are skipped — they are identical anyway
    // because both sessions share one SparkContext.
    spark.conf.getAll.foreach { case (k, v) =>
      try reader.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    reader.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    reader.table(table)
  }
}
