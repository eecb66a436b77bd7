package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** PATH-ADDRESSED catalog — the bridge that gives the engine's own
  * path-level reads STORAGE-PARTITIONED JOINS.
  *
  * Spark converts a scan's reported `KeyGroupedPartitioning` into a
  * catalyst partitioning only when the scan's relation carries a catalog
  * able to load the named transform function ([[KvRegionLayout]] doc) —
  * `spark.read.format("graft-kv").load(path)` has no catalog, so every
  * path-based kv⋈kv join (snapshot diff, table⋈clone, an index lookup's
  * verification join) fell back to the shuffled plan even when both
  * layouts certified. This catalog closes that gap WITHOUT inventing
  * names for internal reads: the table identifier IS the path
  * (`graft_path.p.`/data/t``), resolution is nothing but
  * `new KvCellTable(path)`, and [[loadFunction]] serves the same
  * `grange_<token>` region functions [[GraftKvCatalog]] does.
  *
  * [[KvRead.cells]] is the one intended entry point — it registers the
  * catalog in the session conf (idempotent) and hides the identifier
  * quoting. The catalog is read-only infrastructure: creating, altering
  * or dropping tables through it is refused (use the warehouse catalog
  * or the path API), and it is deliberately NOT meant for end-user SQL —
  * a user-facing named table belongs in [[GraftKvCatalog]].
  *
  * At scale this is pure planning metadata: resolution costs nothing
  * (no filesystem access until the scan plans), and the payoff is the
  * exchange a 100-TB diff or verification join no longer needs.
  */
class GraftKvPathCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  /** One fixed namespace (`p`); the table name is the filesystem path. */
  private def requirePathIdent(ident: Identifier): String = {
    if (ident.namespace().toSeq != Seq(GraftKvPathCatalog.Namespace))
      throw new NoSuchTableException(ident)
    ident.name()
  }

  override def tableExists(ident: Identifier): Boolean =
    try {
      val p = new Path(requirePathIdent(ident))
      KvLog.exists(p.getFileSystem(
        SparkSession.active.sessionState.newHadoopConf()), p)
    } catch { case _: NoSuchTableException => false }

  override def loadTable(ident: Identifier): Table = {
    val path = requirePathIdent(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new KvCellTable(path)
  }

  /** SQL time travel parity with [[GraftKvCatalog]]: `VERSION AS OF`
    * takes a manifest log seq, `TIMESTAMP AS OF` resolves through the
    * entries' publish instants — injected as the scan's read options
    * ([[KvTimeTravel]], shared with the warehouse catalog so the unit
    * and validation contracts cannot diverge).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = requirePathIdent(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new KvCellTable(path, KvTimeTravel.versionOptions(version))
  }

  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = requirePathIdent(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new KvCellTable(path, KvTimeTravel.timestampOptions(timestamp))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq(GraftKvPathCatalog.Namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  private def readOnly(): Nothing = throw new UnsupportedOperationException(
    s"graft-kv path catalog '$catalogName' is read-only resolution " +
      "infrastructure — create/alter/drop tables through the warehouse " +
      "catalog (GraftKvCatalog) or the path API")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = readOnly()
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly()
  override def dropTable(ident: Identifier): Boolean = readOnly()
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly()

  /** Same region-function loader as [[GraftKvCatalog.loadFunction]]. */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace().isEmpty && KvRegionLayout.isRegionFnName(ident.name()))
      KvRegionUnbound(ident.name())
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array.empty
}

object GraftKvPathCatalog {
  val CatalogName = "graft_path"
  val Namespace = "p"
}

/** The one place SQL time-travel arguments become scan options — both
  * catalogs resolve through it, so the seq validation and the
  * micros→millis unit contract stay mechanically identical.
  */
private[sources] object KvTimeTravel {

  /** `VERSION AS OF <v>`: the manifest log seq, as the `asOfSeq` option. */
  def versionOptions(version: String): Map[String, String] = {
    val seq = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft-kv catalog: VERSION AS OF takes a manifest log seq " +
          s"(a number), got '$version' (named snapshots are read with the " +
          "path API's snapshot option)")
    }
    Map("asOfSeq" -> seq.toString)
  }

  /** `TIMESTAMP AS OF`: Spark hands MICROSECONDS since epoch; the scan's
    * `asOfTime` option takes millis.
    */
  def timestampOptions(micros: Long): Map[String, String] =
    Map("asOfTime" -> (micros / 1000L).toString)
}

/** Catalog-resolved kv reads for the engine's own operators. */
object KvRead {

  /** The cells of `path` as a CATALOG-RESOLVED scan: identical rows and
    * pushdown behavior to `spark.read.format("graft-kv").load(path)`,
    * plus a resolvable region function — so a certified layout's
    * reported partitioning becomes a catalyst `KeyGroupedPartitioning`
    * and same-layout joins co-locate (and, with
    * `spark.sql.sources.v2.bucketing.shuffle.enabled`, a small other
    * side shuffles TO this scan's layout instead of both sides moving).
    * `options` are the usual scan options (asOfSeq / snapshot / ...).
    */
  def cells(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val key = s"spark.sql.catalog.${GraftKvPathCatalog.CatalogName}"
    if (!spark.conf.getOption(key).contains(classOf[GraftKvPathCatalog].getName))
      spark.conf.set(key, classOf[GraftKvPathCatalog].getName)
    var r = spark.read
    options.foreach { case (k, v) => r = r.option(k, v) }
    // identifier quoting: backquotes double inside a quoted identifier
    val quoted = path.replace("`", "``")
    r.table(s"${GraftKvPathCatalog.CatalogName}." +
      s"${GraftKvPathCatalog.Namespace}.`$quoted`")
  }
}
