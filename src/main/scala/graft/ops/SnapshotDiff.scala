package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between two snapshots of a KV table (extension of the
  * reference's export family, SURVEY §7.6): what an incremental exporter
  * would ship instead of the reference's full-table re-export
  * (ExportHBaseTableToParquet.java:48-66 always rescans everything).
  *
  * Each side is first LWW-resolved per cell coordinate (A2 semantics,
  * [[KvPivot]]'s merge rule), then the two states are compared with ONE
  * co-partitioned full-outer join:
  *
  *   - coordinate only in `newer`          → `insert`
  *   - coordinate only in `older`          → `delete`
  *   - in both with different cell value   → `update`
  *   - identical                           → dropped (not a change)
  *
  * Scale shape: both aggregations and the join hash on the SAME key pair
  * (rowKey, qualifier), so Catalyst reuses the aggregation exchanges for the
  * join — exactly two shuffles total, each 16-byte-keyed, no broadcast
  * (both sides are table-sized). At 100 TB this is the minimal movement any
  * exact diff needs: one pass over each snapshot.
  */
object SnapshotDiff {

  /** Latest surviving value per (rowKey, qualifier): max ts wins, value
    * bytes break exact-ts ties deterministically (the A2 rule) — the same
    * hash-aggregable [[graft.functions.MaxByTsAgg]] the pivot uses, so the
    * diff never degrades to SortAggregate on the binary value column.
    */
  private def resolve(cells: DataFrame): DataFrame =
    cells.groupBy(col("rowKey"), col("qualifier"))
      .agg(graft.functions.MaxByTsAgg.maxByTs(col("value"), col("ts")).as("value"))

  /** [[diff]] over CATALOG-RESOLVED kv scans ([[graft.sources.KvRead]]):
    * when the two sides share a certified key-range layout — a table and
    * its clone, a snapshot and the unchanged current version — the
    * reported `KeyGroupedPartitioning` resolves and the whole diff plans
    * with ZERO exchanges (both aggregations and the join ride the region
    * layout); any layout disagreement falls back to the ordinary
    * two-shuffle plan with identical results. Options are the usual scan
    * options per side (`snapshot`, `asOfSeq`, ...).
    */
  def diffTables(spark: org.apache.spark.sql.SparkSession,
      olderPath: String, newerPath: String,
      olderOptions: Map[String, String] = Map.empty,
      newerOptions: Map[String, String] = Map.empty): DataFrame =
    diff(graft.sources.KvRead.cells(spark, olderPath, olderOptions),
      graft.sources.KvRead.cells(spark, newerPath, newerOptions))

  /** Diff rows: (rowKey, qualifier, change, old_value, new_value). */
  def diff(older: DataFrame, newer: DataFrame): DataFrame = {
    val o = resolve(older).select(
      col("rowKey"), col("qualifier"), col("value").as("old_value"))
    val n = resolve(newer).select(
      col("rowKey"), col("qualifier"), col("value").as("new_value"))
    o.join(n, Seq("rowKey", "qualifier"), "full_outer")
      .withColumn("change",
        when(col("old_value").isNull, lit("insert"))
          .when(col("new_value").isNull, lit("delete"))
          .otherwise(lit("update")))
      .filter(col("old_value").isNull || col("new_value").isNull ||
        col("old_value") =!= col("new_value"))
      .select(col("rowKey"), col("qualifier"), col("change"),
        col("old_value"), col("new_value"))
  }
}
