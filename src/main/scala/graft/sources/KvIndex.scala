package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MAINTAINED GLOBAL SECONDARY INDEXES for `graft-kv` tables — the
  * Phoenix global-index shape (an index IS another HBase table whose row
  * key leads with the indexed value), built Spark-native on the engine's
  * own machinery:
  *
  *  - The index is a full `graft-kv` table at `<table>/_index/<name>`:
  *    index cells are `rowKey = <padded value>|<base rowKey>`,
  *    `qualifier = "k"`, `value = base rowKey` — so a VALUE range scan is
  *    a plain index rowKey range scan (manifest bounds prune regions, the
  *    parquet record filter prunes rows), a value point lookup
  *    bloom-prunes, and every lifecycle verb (compact to fold re-inserted
  *    duplicates, vacuum, snapshot) works on the index unchanged.
  *  - Maintenance is INCREMENTAL over the manifest CDC feed: `refresh`
  *    reads the base span `(indexed seq, latest]` (`sinceSeq`+`asOfSeq` —
  *    the same feed `kv_incremental_pivot` consumes), appends the delta's
  *    index cells, and records the new covered seq. Cost is O(changes),
  *    never O(table).
  *  - Correctness does NOT depend on freshness. A lookup is
  *    index-candidates ∪ tail-candidates, then VERIFY:
  *      1. index range scan → candidate base keys (the index may be
  *         STALE — updated rows leave old-value entries behind, deletes
  *         leave entries for masked rows; both are filtered next),
  *      2. base CDC tail `(indexed seq, latest]` → candidates the index
  *         has not absorbed yet (bounded by maintenance lag),
  *      3. re-read the candidates from the BASE table (bounded `In`
  *         pushdown → per-key bloom-pruned gets; join fallback above the
  *         cap), compute the current last-write-wins value, and keep only
  *         rows whose CURRENT value matches.
  *    Stale entries can only cost false candidates, never wrong results —
  *    the non-transactional-index contract Phoenix documents, made safe
  *    by verification instead of a synchronous write path.
  *
  * Values are compared as strings; `pad` left-zero-pads the value in the
  * index rowKey so decimal strings order numerically (the fixture shape).
  * Values containing the `|` separator are refused at build time.
  *
  * A base-table RESALT ([[KvResalt]]) breaks the CDC spans the refresh
  * rides (declaration-crossing refusal): `refresh` detects it and
  * REBUILDS; `lookup` falls back to a full base scan for the tail part
  * until the rebuild lands — slower, never wrong.
  *
  * Scale shape: the index is a fraction of one column's bytes; refresh
  * is one bounded CDC read + one sorted append; a lookup is two pruned
  * scans plus candidate-count driver work capped at `InPushdownCap`.
  */
object KvIndex {

  val DirName = "_index"

  /** Default bound on candidates routed through the pushed `In` filter
    * (per-key bloom-pruned gets). Above it the verification joins instead
    * — one base family scan, still correct, no driver blow-up.
    */
  val InPushdownCap = 5000

  case class Meta(name: String, family: String, qualifier: String,
      pad: Int, asOfSeq: Long)

  sealed trait RefreshResult
  case class Refreshed(fromSeq: Long, toSeq: Long) extends RefreshResult
  case class Fresh(seq: Long) extends RefreshResult
  /** The CDC span crossed a salt-layout change: the index was rebuilt. */
  case class Rebuilt(toSeq: Long) extends RefreshResult

  private val NamePattern = "[A-Za-z0-9][A-Za-z0-9._-]{0,127}".r

  private def requireValidName(name: String): Unit =
    require(NamePattern.pattern.matcher(name).matches(),
      s"graft-kv index: invalid name '$name' (letters, digits, . _ -; " +
        "max 128 chars; must start alphanumeric)")

  private def indexRoot(table: Path) = new Path(table, DirName)
  def indexDir(table: Path, name: String): Path = {
    requireValidName(name)
    new Path(indexRoot(table), name)
  }
  private def metaPath(table: Path, name: String) =
    new Path(indexDir(table, name), "_idxmeta")

  private def writeMeta(fs: FileSystem, table: Path, m: Meta): Unit =
    KvLog.writeText(fs, metaPath(table, m.name),
      s"v1 family=${m.family} qualifier=${m.qualifier} pad=${m.pad} " +
        s"asOf=${m.asOfSeq}\n")

  def meta(fs: FileSystem, table: Path, name: String): Option[Meta] = {
    val text = try Some(KvLog.readText(fs, metaPath(table, name))) catch {
      case _: java.io.FileNotFoundException => None
    }
    text.map { t =>
      val toks = t.trim.split("\\s+")
      require(toks.headOption.contains("v1"),
        s"graft-kv index: unknown meta version for '$name'")
      def tok(k: String): String = toks.collectFirst {
        case s if s.startsWith(s"$k=") => s.stripPrefix(s"$k=")
      }.getOrElse(throw new IllegalStateException(
        s"graft-kv index: meta for '$name' lacks $k"))
      Meta(name, tok("family"), tok("qualifier"), tok("pad").toInt,
        tok("asOf").toLong)
    }
  }

  /** All indexes on the table (empty when none). */
  def list(fs: FileSystem, table: Path): Seq[Meta] = {
    val root = indexRoot(table)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
      .flatMap(meta(fs, table, _))
  }

  /** Delete the index. Returns false when it didn't exist. */
  def drop(spark: SparkSession, path: String, name: String): Boolean = {
    val table = new Path(path)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(indexDir(table, name), true)
  }

  /** The padded index-key prefix of one value. */
  private def paddedValue(v: org.apache.spark.sql.Column, pad: Int) =
    if (pad > 0) lpad(v, pad, "0") else v

  /** Base cells → index cells. The `|` check runs per row inside the
    * build/refresh job: a separator inside a value would corrupt range
    * semantics silently, so it fails the statement instead.
    */
  private def indexCells(base: DataFrame, m: Meta): DataFrame = {
    val v = decode(col("value"), "UTF-8")
    val checked = when(v.contains("|"),
      raise_error(lit("graft-kv index: indexed value contains the '|' " +
        "separator — unsupported for a string-ordered index")))
      .otherwise(v)
    base.select(
      concat(paddedValue(checked, m.pad), lit("|"), col("rowKey")).as("rowKey"),
      lit("i").as("family"),
      lit("k").as("qualifier"),
      encode(col("rowKey"), "UTF-8").as("value"),
      col("ts").as("ts"))
  }

  private def baseCells(spark: SparkSession, path: String, m: Meta,
      options: Map[String, String]): DataFrame = {
    var r = spark.read.format("graft-kv")
    options.foreach { case (k, v) => r = r.option(k, v) }
    r.load(path)
      .filter(col("family") === m.family && col("qualifier") === m.qualifier)
  }

  /** Build the index over the CURRENT table version. `pad` left-zero-pads
    * values in index keys (use the longest decimal width for numeric
    * string values; 0 = raw string order).
    */
  def create(spark: SparkSession, path: String, name: String,
      family: String, qualifier: String, pad: Int = 0,
      regions: Int = 4): Meta = {
    requireValidName(name)
    val table = new Path(path)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    require(KvLog.exists(fs, table),
      s"graft-kv index: $path has no manifest log (write through the " +
        "graft-kv sink first)")
    require(meta(fs, table, name).isEmpty,
      s"graft-kv index: '$name' already exists on $path (drop it first)")
    require(pad >= 0 && pad <= 256, s"graft-kv index: pad must be in [0, 256]")
    // Pin the covered version BEFORE reading, so concurrent appends land
    // ABOVE the recorded seq and the first refresh (or the lookup tail)
    // picks them up — never silently skipped.
    val latest = KvLog.latestSeq(fs, table)
    require(latest >= 0, s"graft-kv index: $path is empty — nothing to index")
    val m = Meta(name, family, qualifier, pad, latest)
    val dir = indexDir(table, name)
    fs.delete(dir, true) // a torn previous create (no meta) is replaced
    indexCells(
      baseCells(spark, path, m, Map("asOfSeq" -> latest.toString)), m)
      .write.format("graft-kv").option("regions", regions)
      .mode("overwrite").save(dir.toString)
    writeMeta(fs, table, m)
    m
  }

  /** Absorb the base span `(m.asOfSeq, latest]` into the index. */
  def refresh(spark: SparkSession, path: String, name: String): RefreshResult = {
    val table = new Path(path)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val m = meta(fs, table, name).getOrElse(throw new IllegalArgumentException(
      s"graft-kv index: no index '$name' on $path"))
    val latest = KvLog.latestSeq(fs, table)
    if (latest <= m.asOfSeq) return Fresh(m.asOfSeq)
    val dir = indexDir(table, name)
    if (spanCrossesLayoutChange(fs, table, m.asOfSeq, latest)) {
      // The base changed key layout under the span (KvResalt): the CDC
      // feed refuses to mix the two sides, so rebuild from the current
      // version instead (the index stores LOGICAL keys — only the span
      // mechanics break, never the index semantics).
      val regions = math.max(1, KvLog.liveFiles(fs, dir).size)
      drop(spark, path, name)
      create(spark, path, name, m.family, m.qualifier, m.pad, regions)
      Rebuilt(KvLog.latestSeq(fs, table))
    } else {
      val delta = baseCells(spark, path, m, Map(
        "sinceSeq" -> m.asOfSeq.toString, "asOfSeq" -> latest.toString))
      indexCells(delta, m).write.format("graft-kv")
        .mode("append").save(dir.toString)
      writeMeta(fs, table, m.copy(asOfSeq = latest))
      Refreshed(m.asOfSeq, latest)
    }
  }

  /** Whether the base span `(since, latest]` crosses a salt declaration
    * the CDC read would refuse — the same boundary rule the scan applies
    * (a declaration at exactly `since + 1` has nothing below it and
    * passes). Probed EAGERLY here because the scan's refusal only fires
    * at plan time, far from this decision point.
    */
  private def spanCrossesLayoutChange(fs: org.apache.hadoop.fs.FileSystem,
      table: Path, since: Long, latest: Long): Boolean =
    KvSalt.declsIn(fs, table, since, latest).exists(_ != since + 1)

  /** Verified lookup: base keys and their CURRENT (last-write-wins,
    * delete-masked) value for `m.qualifier`, restricted to values in
    * `[lo, hi)` (string order after padding — numeric order for decimal
    * values under an adequate `pad`). Returns `(rowKey, value)` with the
    * value decoded to a string.
    */
  def lookup(spark: SparkSession, path: String, name: String,
      lo: String, hi: String, inPushdownCap: Int = InPushdownCap): DataFrame = {
    val table = new Path(path)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val m = meta(fs, table, name).getOrElse(throw new IllegalArgumentException(
      s"graft-kv index: no index '$name' on $path"))
    def padLit(v: String) =
      if (m.pad > 0) ("0" * math.max(0, m.pad - v.length)) + v else v
    val (loPad, hiPad) = (padLit(lo), padLit(hi))

    // 1. Index candidates: a rowKey range scan on the index table —
    //    manifest bounds + record filter prune; value() carries the base
    //    key so no string parsing on the hot path.
    val idxCand = spark.read.format("graft-kv")
      .load(indexDir(table, name).toString)
      .filter(col("rowKey") >= loPad && col("rowKey") < hiPad)
      .select(decode(col("value"), "UTF-8").as("rowKey"))

    // 2. Tail candidates: base changes the index has not absorbed.
    //    Bounded by maintenance lag; falls back to a full base scan when
    //    the span crossed a salt-layout change (rare; refresh rebuilds).
    def inRange(df: DataFrame): DataFrame = {
      val pv = paddedValue(decode(col("value"), "UTF-8"), m.pad)
      df.filter(pv >= loPad && pv < hiPad).select(col("rowKey"))
    }
    // Probed eagerly (the scan's own refusal fires at plan time): a span
    // crossing a layout change serves the tail from a full scan instead
    // — slower, never wrong; the next refresh rebuilds the index.
    val tailCand =
      if (spanCrossesLayoutChange(fs, table, m.asOfSeq,
          KvLog.latestSeq(fs, table)))
        inRange(baseCells(spark, path, m, Map.empty))
      else inRange(
        baseCells(spark, path, m, Map("sinceSeq" -> m.asOfSeq.toString)))

    val candidates = idxCand.unionByName(tailCand).distinct()

    // 3. Verify against the base's CURRENT view. Bounded candidate sets
    //    go back as a pushed In — per-key bloom-pruned gets, the
    //    point-lookup shape; larger sets verify via a join over one
    //    family scan (still correct — the index then only saved the
    //    driver the value filter, which is the honest cost of a
    //    low-selectivity query).
    val keys = candidates.limit(inPushdownCap + 1).collect().map(_.getString(0))
    val verified =
      if (keys.length <= inPushdownCap && keys.nonEmpty) {
        baseCells(spark, path, m, Map.empty)
          .filter(col("rowKey").isin(keys.toIndexedSeq: _*))
      } else if (keys.isEmpty) {
        import spark.implicits._
        return Seq.empty[(String, String)].toDF("rowKey", "value")
      } else {
        baseCells(spark, path, m, Map.empty)
          .join(candidates, Seq("rowKey"), "left_semi")
      }
    verified
      .groupBy(col("rowKey"))
      .agg(decode(graft.functions.MaxByTsAgg.maxByTs(col("value"), col("ts")),
        "UTF-8").as("value"))
      .filter(paddedValue(col("value"), m.pad) >= loPad &&
        paddedValue(col("value"), m.pad) < hiPad)
  }
}
