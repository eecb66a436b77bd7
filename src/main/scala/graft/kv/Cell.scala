package graft.kv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's fundamental data abstraction: one HBase-style cell.
  *
  * Mirrors the reference's KV model (SURVEY §1.1): a cell is
  * `(rowKey, family, qualifier, value: bytes, ts)` — the `KeyValue` consumed by
  * every exporter (reference ExportHBaseTableToDelimiteredTxt.java:151,159-163).
  * Cell timestamps drive last-write-wins dedup (A2); the reference gets that
  * implicitly from scan order, we make it explicit and deterministic.
  */
case class Cell(
    rowKey: String,
    family: String,
    qualifier: String,
    value: Array[Byte],
    ts: Long)

object Cell {
  /** Canonical cell schema (SURVEY §1.4). */
  val schema: StructType = StructType(Seq(
    StructField("rowKey", StringType, nullable = false),
    StructField("family", StringType, nullable = false),
    StructField("qualifier", StringType, nullable = false),
    StructField("value", BinaryType, nullable = true),
    StructField("ts", LongType, nullable = false)))
}

/** Loaders that present parquet-backed data as KV cell tables.
  *
  * The environment has no HBase cluster (SURVEY §7.1), so the HBase surface is
  * *modeled*: any table can be viewed as a stream of cells. `events` is the
  * realistic mapping (user ≈ rowKey, event_type ≈ qualifier, event_id ≈ cell
  * timestamp — strictly increasing with `ts`, so last-write-wins is
  * deterministic).
  */
object KvTable {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet` stores `ts` as TIMESTAMP(NANOS), which Spark 4 rejects
    * during schema inference ([PARQUET_TYPE_ILLEGAL]). An explicit schema with
    * `ts: long` (raw epoch nanos) skips footer inference; `tsNanos` keeps the
    * name honest.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.schema(StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType))))
      .parquet(s"$sfDir/events.parquet")
      .withColumnRenamed("ts", "tsNanos")

  /** `events` viewed as a cell table. The rowKey is the zero-padded user id
    * (byte-lexicographic order == numeric order, like the reference's
    * `lpad(keyRoot, 5, '0')` keys, CreateTable.java:69).
    *
    * Value encoding is `floor(value*100)` rendered as a decimal string — NOT
    * `%.2f` formatting, whose half-up/half-even rounding differs between
    * engines; `floor` over IEEE doubles is bit-identical in Spark and DuckDB,
    * keeping the oracle hash-stable.
    */
  def eventsAsCells(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events").select(
      lpad(col("user_id").cast(StringType), 8, "0").as("rowKey"),
      lit("f").as("family"),
      col("event_type").as("qualifier"),
      encode(floor(col("value") * 100).cast(StringType), "UTF-8").as("value"),
      col("event_id").as("ts"))
}
