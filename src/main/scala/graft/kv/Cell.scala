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

  /** `lineitem` viewed as a *typed* cell table: 3 cells per line item with
    * binary-encoded values (big-endian long/int like HBase `Bytes`, plus
    * UTF-8 strings) — exercises the Avro-dialect typed decode path
    * (ExportHBaseTableToAvro.java:199-209).
    *
    * The synthetic lineitem can contain fully-duplicated key 4-tuples (two
    * physical rows, same rowKey, different quantities). Those are modeled as
    * two *writes* to the same cell, and LWW needs a deterministic winner: each
    * cell's ts is monotonic in its own value, so the max-ts cell is the
    * max-value cell — reproducible in the oracle as `GROUP BY key` + `max`.
    */
  /** The lineitem composite row key (zero-padded so byte order == numeric
    * order, shared by the cell loader and the unpivot query).
    */
  def lineitemKey: org.apache.spark.sql.Column =
    concat_ws("|",
      lpad(col("l_orderkey").cast(StringType), 10, "0"),
      lpad(col("l_linenumber").cast(StringType), 2, "0"),
      lpad(col("l_partkey").cast(StringType), 8, "0"),
      lpad(col("l_suppkey").cast(StringType), 6, "0"))

  def lineitemAsCells(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.ByteCodecs._
    val li = table(spark, sfDir, "lineitem")
    // r21 (opt guide §2.4/§2.5): hash-repartition the UNEXPLODED rows on
    // rowKey before the 3-way cell fan-out. Every consumer of this loader
    // pivots on rowKey, and groupBy(rowKey) REUSES this exchange (same key,
    // same partition count) — the plan keeps exactly ONE Exchange; what
    // moves is which side of it the heavy work runs on. Why it matters:
    // the fixture is a single parquet row group, so the scan — and with it
    // the explode, the binary encodes and the pivot's partial aggregation —
    // executes as ONE task no matter how many splits are planned (a split
    // only does work when it contains a row-group midpoint). Shuffling the
    // pre-explode rows (rowKey + 3 narrow source columns, one row per line
    // item) moves the fan-out and all aggregation to the parallel side
    // while shuffling FEWER bytes than the old partial-agg plan did (600k
    // narrow rows vs 600k groups of 4 serialized agg buffers; the 3:1 cell
    // collapse the map-side combine bought is equally achieved by shuffling
    // before the fan-out). Measured at sf0.1: pivot 4.4 s → 2.2 s.
    li.select(
        lineitemKey.as("rowKey"),
        col("l_quantity"), col("l_linenumber"), col("l_returnflag"))
      .repartition(col("rowKey"))
      .select(
        col("rowKey"),
        explode(array(
          struct(lit("qty").as("qualifier"),
            longToBinary(floor(col("l_quantity"))).as("value"),
            floor(col("l_quantity")).cast("long").as("ts")),
          struct(lit("ln").as("qualifier"),
            intToBinary(col("l_linenumber")).as("value"),
            col("l_linenumber").cast("long").as("ts")),
          struct(lit("flag").as("qualifier"),
            encode(col("l_returnflag"), "UTF-8").as("value"),
            ascii(col("l_returnflag")).cast("long").as("ts")))).as("cell"))
      .select(col("rowKey"), lit("c").as("family"),
        col("cell.qualifier").as("qualifier"), col("cell.value").as("value"),
        col("cell.ts").as("ts"))
  }

  /** The engine-internal raw events schema: `ts` = epoch NANOS as long.
    * Every consumer (batch loaders, streaming sources, staging writers)
    * sees exactly this shape; [[eventsRaw]] normalizes whatever the fixture
    * physically stores into it.
    */
  val EventsParquetSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Whether the events parquet at `path` stores `ts` with a parquet
    * TIMESTAMP logical type Spark can infer (micros/millis — read as a
    * timestamp and converted), versus the legacy fixture whose
    * TIMESTAMP(NANOS) column Spark 4 refuses to infer
    * ([PARQUET_TYPE_ILLEGAL]) and which is therefore force-read as raw
    * epoch-nanos long. The fixture's physical encoding has changed across
    * harness regenerations (round 9 shipped 11 wrong queries by assuming
    * raw nanos against a timestamp[us] file), so the unit is derived from
    * the file's LOGICAL type, never assumed. Memoized per
    * (path, mtime, length) — NOT per path alone, so a fixture overwritten
    * with a different ts encoding within one JVM re-infers instead of
    * silently reusing the stale decision (the exact wrong-units failure
    * class this code exists to prevent). Cost: one driver-side
    * `getFileStatus` per lookup, one footer inference per distinct file
    * version.
    */
  private val tsIsLogicalTimestamp =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Test hook: drop all memoized encoding decisions. */
  private[graft] def clearTsEncodingCache(): Unit = tsIsLogicalTimestamp.clear()

  private def storesLogicalTimestamp(spark: SparkSession, path: String): Boolean = {
    val key = try {
      val p = new org.apache.hadoop.fs.Path(path)
      val st = p.getFileSystem(spark.sessionState.newHadoopConf()).getFileStatus(p)
      s"$path@${st.getModificationTime}:${st.getLen}"
    } catch { case _: java.io.IOException => path } // unstat-able: fall back
    tsIsLogicalTimestamp.computeIfAbsent(key, _ =>
      try {
        spark.read.parquet(path).schema("ts").dataType match {
          case TimestampType | TimestampNTZType => true
          case _ => false
        }
      } catch {
        // Inference rejects TIMESTAMP(NANOS) — exactly the legacy raw-long case.
        case _: org.apache.spark.sql.AnalysisException => false
      })
  }

  /** The schema to hand a reader of the raw fixture file (streaming file
    * sources REQUIRE an explicit schema, so inference alone can't decide):
    * the inferred one when the file stores a logical timestamp, the forced
    * raw-long one otherwise. Pair with [[normalizeRawEvents]].
    */
  private[graft] def eventsReadSchema(spark: SparkSession, path: String): StructType =
    if (storesLogicalTimestamp(spark, path)) spark.read.parquet(path).schema
    else EventsParquetSchema

  /** Normalize a raw events relation (read with [[eventsReadSchema]]) to
    * [[EventsParquetSchema]]: a logical-timestamp `ts` becomes epoch nanos
    * (`unix_micros * 1000`; NTZ is interpreted in the session time zone,
    * UTC in every entry point, matching the oracle's `epoch_ns`); a raw
    * long passes through. Works identically on batch and streaming frames.
    */
  private[graft] def normalizeRawEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
          .select(EventsParquetSchema.fieldNames.toIndexedSeq.map(col): _*)
      case _ => df
    }

  /** The raw events relation in engine shape (ts = epoch nanos long),
    * whatever the fixture's physical encoding.
    */
  def eventsRaw(spark: SparkSession, path: String): DataFrame =
    normalizeRawEvents(
      spark.read.schema(eventsReadSchema(spark, path)).parquet(path))

  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsRaw(spark, s"$sfDir/events.parquet")
      .withColumnRenamed("ts", "tsNanos")

  /** The events→cells column mapping, shared by the batch loader and the
    * streaming source so batch/stream parity can't silently drift.
    *
    * The rowKey is the zero-padded user id (byte-lexicographic order ==
    * numeric order, like the reference's `lpad(keyRoot, 5, '0')` keys,
    * CreateTable.java:69). Value encoding is `floor(value*100)` rendered as
    * a decimal string — NOT `%.2f` formatting, whose half-up/half-even
    * rounding differs between engines; `floor` over IEEE doubles is
    * bit-identical in Spark and DuckDB, keeping the oracle hash-stable.
    */
  def eventCellColumns: Seq[org.apache.spark.sql.Column] = Seq(
    lpad(col("user_id").cast(StringType), 8, "0").as("rowKey"),
    lit("f").as("family"),
    col("event_type").as("qualifier"),
    encode(floor(col("value") * 100).cast(StringType), "UTF-8").as("value"),
    col("event_id").as("ts"))

  /** `events` viewed as a cell table. */
  def eventsAsCells(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events").select(eventCellColumns: _*)
}
