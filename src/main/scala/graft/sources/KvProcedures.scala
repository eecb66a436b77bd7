package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL LIFECYCLE VERBS for `graft-kv` catalogs — DSv2 stored procedures
  * (`ProcedureCatalog`, the Spark 4 CALL surface), so the maintenance
  * operations a mutable table NEEDS are reachable from pure SQL, exactly
  * where the DML that creates the need lives:
  *
  * {{{
  *   CALL cat.sys.compact(table => 'ns.t')            -- purge markers/versions
  *   CALL cat.sys.vacuum(table => 'ns.t', grace_ms => 0)
  *   CALL cat.sys.snapshot(table => 'ns.t', name => 'pre_migration')
  *   CALL cat.sys.restore(table => 'ns.t', name => 'pre_migration')
  *   CALL cat.sys.clone(table => 'ns.t', name => 'pre', target => 'ns.t2')
  *   CALL cat.sys.drop_snapshot(table => 'ns.t', name => 'pre')
  *   CALL cat.sys.maintain(table => 'ns.t')           -- one policy pass
  *   CALL cat.sys.fsck(table => 'ns.t')               -- health report row
  *   CALL cat.sys.history(table => 'ns.t')            -- manifest commit log
  *   CALL cat.sys.truncate_log(table => 'ns.t', retention_ms => 0)
  *   CALL cat.sys.repair(table => 'ns.t', actions => 'adoptOrphans')
  *   CALL cat.sys.resalt(table => 'ns.t', buckets => 16)  -- 0 = unsalt
  *   CALL cat.sys.create_index(table => 'ns.t', name => 'by_amt',
  *                             family => 'f', qualifier => 'amt', pad => 8)
  *   CALL cat.sys.refresh_index(table => 'ns.t', name => 'by_amt')
  *   CALL cat.sys.drop_index(table => 'ns.t', name => 'by_amt')
  *   CALL cat.sys.indexes(table => 'ns.t')    -- one row per index
  *   CALL cat.sys.verify_index(table => 'ns.t', name => 'by_amt')
  * }}}
  *
  * The reference's operational surface is CLI programs run beside the
  * data (CreateTable/PopulateTable, App.java:14-30); a SQL user of the
  * catalog should not have to leave SQL (or find the table's directory)
  * to compact the table their marker DELETEs tombstoned — the engine's
  * own error messages say "compact first", so the verb must be reachable
  * from the same session. Each procedure is a thin shim over the
  * path-level API ([[KvCompactor]], [[KvVacuum]], [[KvSnapshot]],
  * [[KvFsck]]) and returns its result as ONE summary row (a `LocalScan`
  * — driver-side metadata, no job), so `CALL` output is inspectable and
  * scriptable. `table` is the catalog-relative `namespace.table` name;
  * resolution applies the catalog's own identifier grammar, never raw
  * path interpolation.
  *
  * At 100 TB: the procedures add nothing to the data path — they run
  * the same distributed compaction/vacuum jobs the CLI verbs run; only
  * argument resolution and the summary row are driver-side.
  */
private[sources] object KvProcedures {

  val Namespace = "sys"

  val Names: Seq[String] = Seq("compact", "vacuum", "snapshot", "restore",
    "clone", "drop_snapshot", "maintain", "fsck", "history", "truncate_log",
    "repair", "resalt", "create_index", "refresh_index", "drop_index",
    "indexes", "verify_index")

  def load(warehouse: Path, name: String): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "compact" => Some(new CompactProc(warehouse))
      case "vacuum" => Some(new VacuumProc(warehouse))
      case "snapshot" => Some(new SnapshotProc(warehouse))
      case "restore" => Some(new RestoreProc(warehouse))
      case "clone" => Some(new CloneProc(warehouse))
      case "drop_snapshot" => Some(new DropSnapshotProc(warehouse))
      case "maintain" => Some(new MaintainProc(warehouse))
      case "fsck" => Some(new FsckProc(warehouse))
      case "history" => Some(new HistoryProc(warehouse))
      case "truncate_log" => Some(new TruncateLogProc(warehouse))
      case "repair" => Some(new RepairProc(warehouse))
      case "resalt" => Some(new ResaltProc(warehouse))
      case "create_index" => Some(new CreateIndexProc(warehouse))
      case "refresh_index" => Some(new RefreshIndexProc(warehouse))
      case "drop_index" => Some(new DropIndexProc(warehouse))
      case "indexes" => Some(new IndexesProc(warehouse))
      case "verify_index" => Some(new VerifyIndexProc(warehouse))
      case _ => None
    }

  /** Shared shape: stateless, binds to itself, side-effecting (never
    * `isDeterministic`), resolves the `table` argument (always parameter
    * 0) under the catalog's warehouse with the catalog's identifier
    * grammar.
    */
  private sealed abstract class KvProcedure(warehouse: Path)
      extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false

    protected def spark: SparkSession = SparkSession.active

    protected def tableParam: ProcedureParameter =
      ProcedureParameter.in("table", StringType)
        .comment("catalog-relative name: namespace.table").build()

    /** One identifier grammar for EVERY name argument (table, clone
      * target): the same checks the catalog proper applies, so no
      * procedure argument can path-escape the warehouse.
      */
    protected def resolveName(qualified: String, what: String): Path = {
      val parts = qualified.split("\\.")
      require(parts.length == 2,
        s"${name()}: $what must be namespace.table, got '$qualified'")
      parts.foreach { seg =>
        require(GraftKvCatalog.IdentifierRe.pattern.matcher(seg).matches(),
          s"${name()}: invalid identifier '$seg' in '$qualified'")
      }
      new Path(new Path(warehouse, parts(0)), parts(1))
    }

    protected def tableDir(input: InternalRow): Path = {
      require(!input.isNullAt(0), s"${name()}: table must not be NULL")
      val qualified = input.getUTF8String(0).toString
      val dir = resolveName(qualified, "table")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      require(fs.exists(dir), s"${name()}: no table at $qualified")
      dir
    }

    protected def oneRow(values: Array[Any]): java.util.Iterator[Scan] =
      rowsOut(Seq(values))

    /** Multi-row LocalScan — driver-side METADATA rows only (history
      * entries, repair summaries), never data: data-bearing reads go
      * through the ordinary distributed scan by table name.
      */
    protected def rowsOut(out: Seq[Array[Any]]): java.util.Iterator[Scan] = {
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] =
          out.map(vals => new GenericInternalRow(vals): InternalRow).toArray
      }
      java.util.Collections.singletonList(scan).iterator()
    }

    protected def resultSchema: StructType
  }

  private final class CompactProc(warehouse: Path) extends KvProcedure(warehouse) {
    override def name(): String = "compact"
    override def description(): String =
      "major compaction: merge live segments, apply+purge delete markers, " +
        "enforce TTL/version policy"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("regions", IntegerType).defaultValue("NULL")
        .comment("output region count; defaults to the table's recorded " +
          "regions property").build(),
      ProcedureParameter.in("enforce_policy", BooleanType)
        .defaultValue("true")
        .comment("apply the table's declared ttl_ms/versions retention " +
          "during the rewrite (the HBase compaction-scanner contract); " +
          "false = logical-view-preserving merge only").build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("result", StringType, nullable = false),
      StructField("seq", LongType, nullable = true),
      StructField("merged", IntegerType, nullable = true),
      StructField("into", IntegerType, nullable = true),
      StructField("dropped_cells", LongType, nullable = true)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      // Explicit argument > the table's recorded `regions` property >
      // SIZE-DERIVED (ceil(merged bytes / target), [[KvCompactor
      // .compactTo]] — the ConstantSizeRegionSplitPolicy analog
      // KvMaintenance already applies). A fixed-count fallback would
      // squeeze an ADOPTED multi-TB path table, compacted by name for
      // the first time, into that many monolith regions.
      val props = KvTableProps.read(fs, dir)
      // The verb's contract says "enforce TTL/version policy": the
      // table's DECLARED retention (`ttl_ms` / `versions` TBLPROPERTIES)
      // rides the rewrite — an explicit major with a non-noop policy
      // rewrites even a single-segment / already-compacted table (the
      // HBase force-major shape; KvCompactor's policyForced gate).
      // `enforce_policy => false` opts out (a pure logical-view-
      // preserving merge), and the result surfaces the cells the policy
      // actually removed — the rewrite is physically destructive, so
      // the operator sees the side effect instead of inferring it.
      val enforce = input.isNullAt(2) || input.getBoolean(2)
      val cellPolicy =
        if (!enforce) KvCompactor.CellPolicy()
        else KvCompactor.CellPolicy(
          dropBelowTs = props.get("ttl_ms").map(_.toLong)
            .map(System.currentTimeMillis() - _),
          maxVersions = props.get("versions").map(_.toInt))
      val result =
        (if (!input.isNullAt(1)) Some(input.getInt(1))
         else props.get("regions").map(_.toInt)) match {
          case Some(regions) => KvCompactor.compact(spark, dir.toString,
            regions, cellPolicy = cellPolicy)
          case None => KvCompactor.compactTo(spark, dir.toString,
            props.get("maintain_target_region_bytes").map(_.toLong)
              .getOrElse(128L * 1024 * 1024), cellPolicy = cellPolicy)
        }
      result match {
        case KvCompactor.Compacted(seq, merged, into, dropped) =>
          oneRow(Array[Any](UTF8String.fromString("compacted"),
            seq, merged, into, dropped))
        case KvCompactor.Parked(reason) =>
          oneRow(Array[Any](UTF8String.fromString(s"parked: $reason"),
            null, null, null, null))
        case KvCompactor.Aborted(reason) =>
          oneRow(Array[Any](UTF8String.fromString(s"aborted: $reason"),
            null, null, null, null))
      }
    }
  }

  private final class ResaltProc(warehouse: Path) extends KvProcedure(warehouse) {
    override def name(): String = "resalt"
    override def description(): String =
      "rewrite the table into a different salt layout (buckets => 0 " +
        "converts to unsalted) — the honest form of ALTER salt_buckets"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("buckets", IntegerType)
        .comment("target salt bucket count; 0 = unsalted").build(),
      ProcedureParameter.in("regions", IntegerType).defaultValue("NULL")
        .comment("output region count; defaults to the table's recorded " +
          "regions property, else sized from live bytes").build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("result", StringType, nullable = false),
      StructField("seq", LongType, nullable = true),
      StructField("from_buckets", IntegerType, nullable = true),
      StructField("to_buckets", IntegerType, nullable = true),
      StructField("files", IntegerType, nullable = true)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      require(!input.isNullAt(1), "resalt: buckets must not be NULL")
      val buckets = input.getInt(1)
      require(buckets >= 0, s"resalt: buckets must be >= 0, got $buckets")
      val to = if (buckets == 0) None else Some(buckets)
      val regions = if (input.isNullAt(2)) None else Some(input.getInt(2))
      KvResalt.resalt(spark, dir.toString, to, regions) match {
        case KvResalt.Resalted(seq, from, t, files) =>
          oneRow(Array[Any](UTF8String.fromString("resalted"), seq,
            from.map(Int.box).orNull, t.map(Int.box).orNull, files))
        case KvResalt.Parked(reason) =>
          oneRow(Array[Any](UTF8String.fromString(s"parked: $reason"),
            null, null, null, null))
        case KvResalt.Aborted(reason) =>
          oneRow(Array[Any](UTF8String.fromString(s"aborted: $reason"),
            null, null, null, null))
      }
    }
  }

  private final class CreateIndexProc(warehouse: Path)
      extends KvProcedure(warehouse) {
    override def name(): String = "create_index"
    override def description(): String =
      "build a maintained global secondary index on one (family, " +
        "qualifier) — value-range lookups become pruned index scans"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("name", StringType).build(),
      ProcedureParameter.in("family", StringType).build(),
      ProcedureParameter.in("qualifier", StringType).build(),
      ProcedureParameter.in("pad", IntegerType).defaultValue("0")
        .comment("left-zero-pad width for numeric string values; 0 = raw")
        .build(),
      ProcedureParameter.in("regions", IntegerType).defaultValue("4").build(),
      ProcedureParameter.in("include", StringType).defaultValue("NULL")
        .comment("comma-separated qualifiers to COVER (Phoenix INCLUDE): " +
          "the index is maintained exactly and fresh lookups serve " +
          "index-only, base untouched").build(),
      ProcedureParameter.in("composite", StringType).defaultValue("NULL")
        .comment("additional KEY components after the leading qualifier, " +
          "as comma-separated qual:pad pairs (Phoenix composite shape); " +
          "a composite index is always covered").build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("result", StringType, nullable = false),
      StructField("covered_seq", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      def csv(i: Int): Seq[String] =
        if (input.isNullAt(i)) Nil
        else input.getUTF8String(i).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
      val rest = csv(7).map { pair =>
        pair.split(":") match {
          case Array(q, p) => (q, p.toInt)
          case Array(q) => (q, 0)
          case _ => throw new IllegalArgumentException(
            s"graft-kv: composite component '$pair' is not qual[:pad]")
        }
      }
      val m = KvIndex.create(spark, dir.toString,
        input.getUTF8String(1).toString, input.getUTF8String(2).toString,
        input.getUTF8String(3).toString, input.getInt(4), input.getInt(5),
        include = csv(6), rest = rest)
      oneRow(Array[Any](UTF8String.fromString(
        (if (m.composite) "created composite" else "created") +
          (if (m.covered && !m.composite) " covered" else "")), m.asOfSeq))
    }
  }

  private final class RefreshIndexProc(warehouse: Path)
      extends KvProcedure(warehouse) {
    override def name(): String = "refresh_index"
    override def description(): String =
      "absorb base-table changes into the index (incremental over the " +
        "manifest CDC feed; rebuilds across a salt-layout change)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam, ProcedureParameter.in("name", StringType).build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("result", StringType, nullable = false),
      StructField("from_seq", LongType, nullable = true),
      StructField("to_seq", LongType, nullable = true)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      KvIndex.refresh(spark, dir.toString,
          input.getUTF8String(1).toString) match {
        case KvIndex.Refreshed(from, to) =>
          oneRow(Array[Any](UTF8String.fromString("refreshed"), from, to))
        case KvIndex.Fresh(seq) =>
          oneRow(Array[Any](UTF8String.fromString("fresh"), seq, seq))
        case KvIndex.Rebuilt(to) =>
          oneRow(Array[Any](UTF8String.fromString(
            "rebuilt: the span crossed a salt-layout change"), null, to))
      }
    }
  }

  private final class DropIndexProc(warehouse: Path)
      extends KvProcedure(warehouse) {
    override def name(): String = "drop_index"
    override def description(): String = "delete a secondary index"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam, ProcedureParameter.in("name", StringType).build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("result", StringType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      val dropped = KvIndex.drop(spark, dir.toString,
        input.getUTF8String(1).toString)
      oneRow(Array[Any](UTF8String.fromString(
        if (dropped) "dropped" else "no such index")))
    }
  }

  private final class IndexesProc(warehouse: Path)
      extends KvProcedure(warehouse) {
    override def name(): String = "indexes"
    override def description(): String =
      "list the table's secondary indexes and their covered seq"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam)
    override val resultSchema: StructType = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("family", StringType, nullable = false),
      StructField("qualifier", StringType, nullable = false),
      StructField("pad", IntegerType, nullable = false),
      StructField("as_of_seq", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      // composite metas render the comma-joined component list in the
      // qualifier column (the leading pad in `pad` — per-component pads
      // live in the meta file)
      rowsOut(KvIndex.list(fs, dir).map(m => Array[Any](
        UTF8String.fromString(m.name), UTF8String.fromString(m.family),
        UTF8String.fromString(m.keyQuals.mkString(",")), m.pad, m.asOfSeq)))
    }
  }

  private final class VerifyIndexProc(warehouse: Path)
      extends KvProcedure(warehouse) {
    override def name(): String = "verify_index"
    override def description(): String =
      "index scrutiny: audit the superset invariant lookups rest on " +
        "(missing entries = rebuild needed; stale = expected debris)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam, ProcedureParameter.in("name", StringType).build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("result", StringType, nullable = false),
      StructField("covered_seq", LongType, nullable = false),
      StructField("current_rows", LongType, nullable = false),
      StructField("missing", LongType, nullable = false),
      StructField("stale", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      val s = KvIndex.scrutiny(spark, dir.toString,
        input.getUTF8String(1).toString)
      oneRow(Array[Any](UTF8String.fromString(
        if (s.missing == 0) "consistent"
        else s"INCONSISTENT: ${s.missing} current rows unindexed — " +
          "rebuild (drop_index + create_index)"),
        s.coveredSeq, s.current, s.missing, s.stale))
    }
  }

  private final class VacuumProc(warehouse: Path) extends KvProcedure(warehouse) {
    override def name(): String = "vacuum"
    override def description(): String =
      "delete unreferenced data files past the grace period"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("grace_ms", LongType)
        .defaultValue((24L * 3600 * 1000).toString)
        .comment("retired files younger than this are kept (default 24h)")
        .build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("result", StringType, nullable = false),
      StructField("deleted_files", IntegerType, nullable = true),
      StructField("deleted_bytes", LongType, nullable = true),
      StructField("scratch_dirs", IntegerType, nullable = true)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      val grace = if (input.isNullAt(1)) 24L * 3600 * 1000 else input.getLong(1)
      KvVacuum.vacuum(spark, dir.toString, grace) match {
        case v: KvVacuum.Vacuumed =>
          oneRow(Array[Any](UTF8String.fromString("vacuumed"),
            v.deletedFiles, v.deletedBytes, v.scratchDirs))
        case KvVacuum.Skipped(reason) =>
          oneRow(Array[Any](UTF8String.fromString(s"skipped: $reason"),
            null, null, null))
      }
    }
  }

  private final class SnapshotProc(warehouse: Path) extends KvProcedure(warehouse) {
    override def name(): String = "snapshot"
    override def description(): String =
      "pin the current live set under a name (metadata-only, any table size)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("name", StringType).build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("files", IntegerType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      require(!input.isNullAt(1), "snapshot: name must not be NULL")
      val info = KvSnapshot.create(spark, dir.toString,
        input.getUTF8String(1).toString)
      oneRow(Array[Any](UTF8String.fromString(info.name), info.seq,
        info.files.size))
    }
  }

  private final class RestoreProc(warehouse: Path) extends KvProcedure(warehouse) {
    override def name(): String = "restore"
    override def description(): String =
      "reset the live set to a named snapshot (one manifest commit; " +
        "history preserved)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("name", StringType).build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("restored_seq", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      require(!input.isNullAt(1), "restore: name must not be NULL")
      val seq = KvSnapshot.restore(spark, dir.toString,
        input.getUTF8String(1).toString)
      oneRow(Array[Any](seq))
    }
  }

  private final class CloneProc(warehouse: Path) extends KvProcedure(warehouse) {
    override def name(): String = "clone"
    override def description(): String =
      "materialize a named snapshot as a NEW catalog table (copies the " +
        "pinned files + the snapshot-time config)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("name", StringType)
        .comment("snapshot to clone").build(),
      ProcedureParameter.in("target", StringType)
        .comment("catalog-relative name for the clone: namespace.table")
        .build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("target", StringType, nullable = false),
      StructField("cloned_seq", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      require(!input.isNullAt(1), "clone: name must not be NULL")
      require(!input.isNullAt(2), "clone: target must not be NULL")
      val target = input.getUTF8String(2).toString
      val dest = resolveName(target, "target")
      val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
      require(fs.exists(dest.getParent),
        s"clone: namespace ${dest.getParent.getName} does not exist " +
          "(CREATE NAMESPACE first)")
      // destination-emptiness is cloneTo's own guard — not duplicated here
      val seq = KvSnapshot.cloneTo(spark, dir.toString,
        input.getUTF8String(1).toString, dest.toString)
      oneRow(Array[Any](UTF8String.fromString(target), seq))
    }
  }

  private final class DropSnapshotProc(warehouse: Path)
      extends KvProcedure(warehouse) {
    override def name(): String = "drop_snapshot"
    override def description(): String =
      "unpin a named snapshot: its files become ordinary vacuum candidates"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("name", StringType).build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("dropped", BooleanType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      require(!input.isNullAt(1), "drop_snapshot: name must not be NULL")
      oneRow(Array[Any](KvSnapshot.drop(spark, dir.toString,
        input.getUTF8String(1).toString)))
    }
  }

  private final class MaintainProc(warehouse: Path)
      extends KvProcedure(warehouse) {
    override def name(): String = "maintain"
    override def description(): String =
      "one idempotent policy pass: minor-compact past the segment " +
        "threshold, vacuum past the grace — the scheduled-housekeeping verb"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("max_segments", IntegerType).defaultValue("NULL")
        .comment("compact only when live segments exceed this; defaults " +
          "to the table's recorded maintain_max_segments").build(),
      ProcedureParameter.in("target_region_bytes", LongType)
        .defaultValue("NULL").build(),
      ProcedureParameter.in("grace_ms", LongType).defaultValue("NULL")
        .build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("compaction", StringType, nullable = false),
      StructField("vacuum", StringType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      // Explicit argument > the table's RECORDED policy > the engine
      // default — the same precedence CompactProc applies to regions: an
      // operator's bare `CALL sys.maintain(table => ...)` runs the policy
      // the table itself declared, not a surprise default.
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val recorded = KvTableProps.maintainPolicyOf(
        KvTableProps.read(fs, dir) + ("maintain" -> "true"))
        .getOrElse(KvMaintenance.Policy())
      val policy = recorded.copy(
        maxSegments =
          if (input.isNullAt(1)) recorded.maxSegments else input.getInt(1),
        targetRegionBytes = if (input.isNullAt(2)) recorded.targetRegionBytes
          else input.getLong(2),
        vacuumGraceMs =
          if (input.isNullAt(3)) recorded.vacuumGraceMs else input.getLong(3))
      val r = KvMaintenance.maintain(spark, dir.toString, policy)
      oneRow(Array[Any](UTF8String.fromString(r.compaction.toString),
        UTF8String.fromString(r.vacuum.toString)))
    }
  }

  /** `CALL sys.history(table => 'ns.t')` — the Delta `DESCRIBE HISTORY`
    * analog by NAME: every retained manifest entry in seq order with its
    * kind, writer tag, and add/remove counts ([[KvLog.history]]). This is
    * the version list `VERSION AS OF <seq>` and `sinceSeq` reads address
    * into, so a SQL session can pick its travel/CDC points without
    * leaving SQL or finding the table's directory. Driver-side metadata
    * replay, O(retained log length); no data file opened.
    */
  private final class HistoryProc(warehouse: Path) extends KvProcedure(warehouse) {
    override def name(): String = "history"
    override def description(): String =
      "commit history from the manifest log: one row per retained entry " +
        "(the version list VERSION AS OF / sinceSeq reads address)"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam)
    override val resultSchema: StructType = StructType(Seq(
      StructField("seq", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("writer", StringType, nullable = false),
      StructField("n_adds", LongType, nullable = false),
      StructField("n_removes", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      require(KvLog.exists(fs, dir),
        s"history: no manifest log at ${input.getUTF8String(0)} " +
          "(legacy/externally-staged directory)")
      rowsOut(KvLog.history(fs, dir).map {
        case (seq, kind, writer, nAdds, nRemoves) =>
          Array[Any](seq, UTF8String.fromString(kind),
            UTF8String.fromString(writer), nAdds, nRemoves)
      })
    }
  }

  /** `CALL sys.truncate_log(table => 'ns.t', retention_ms => n)` —
    * [[KvLog.truncate]] by name: drop expired pre-floor entries (and idle
    * writer-epoch hints) so a long-lived table's log stays bounded.
    * Refused-as-zero when the horizon checkpoint cannot anchor garbage
    * attribution, same as the path API.
    */
  private final class TruncateLogProc(warehouse: Path)
      extends KvProcedure(warehouse) {
    override def name(): String = "truncate_log"
    override def description(): String =
      "drop manifest entries below the compaction floor older than the " +
        "retention (history/time-travel for those versions ends)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("retention_ms", LongType)
        .defaultValue((24L * 3600 * 1000).toString)
        .comment("entries younger than this are kept (default 24h)").build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("truncated_entries", IntegerType, nullable = false),
      StructField("history_starts_at", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val retention =
        if (input.isNullAt(1)) 24L * 3600 * 1000 else input.getLong(1)
      val dropped = KvLog.truncate(fs, dir, retention)
      oneRow(Array[Any](dropped, KvLog.earliestSeq(fs, dir)))
    }
  }

  /** `CALL sys.repair(table => 'ns.t', actions => 'forgetMissing,...')` —
    * the hbck2 analog by name ([[KvFsck.repair]]): every action is opted
    * into EXPLICITLY because each encodes an operator judgment (accept
    * data loss / surface orphan bytes / abandon an unreadable pin) the
    * engine must not make on its own. `CALL sys.fsck` first; the report
    * says which actions apply.
    */
  private final class RepairProc(warehouse: Path) extends KvProcedure(warehouse) {
    override def name(): String = "repair"
    override def description(): String =
      "hbck2-style explicit repair: comma-separated actions from " +
        "forgetMissing | adoptOrphans | dropBrokenSnapshots"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("actions", StringType)
        .comment("comma-separated: forgetMissing, adoptOrphans, " +
          "dropBrokenSnapshots").build())
    override val resultSchema: StructType = StructType(Seq(
      StructField("forgot", IntegerType, nullable = false),
      StructField("adopted", IntegerType, nullable = false),
      StructField("dropped_snapshots", IntegerType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      require(!input.isNullAt(1), "repair: actions must not be NULL")
      val actions = input.getUTF8String(1).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSet
      val known = Set("forgetMissing", "adoptOrphans", "dropBrokenSnapshots")
      require(actions.nonEmpty && actions.subsetOf(known),
        s"repair: actions must be from ${known.mkString(", ")}, got " +
          s"'${input.getUTF8String(1)}'")
      val r = KvFsck.repair(spark, dir.toString,
        forgetMissing = actions("forgetMissing"),
        adoptOrphans = actions("adoptOrphans"),
        dropBrokenSnapshots = actions("dropBrokenSnapshots"))
      oneRow(Array[Any](r.forgotten.size, r.adopted.size,
        r.droppedSnapshots.size))
    }
  }

  private final class FsckProc(warehouse: Path) extends KvProcedure(warehouse) {
    override def name(): String = "fsck"
    override def description(): String =
      "manifest/file health report (driver-side metadata; opens no data file)"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam)

    // Schema and row both derive from [[KvFsck.Report.rows]] — a Report
    // field added or reordered flows through automatically instead of
    // silently swapping positionally-matched columns here.
    private val metricNames: Seq[String] =
      KvFsck.Report(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).rows
        .map(_._1).filterNot(_ == "healthy")

    override val resultSchema: StructType = StructType(
      StructField("healthy", BooleanType, nullable = false) +:
        metricNames.map(StructField(_, LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(input)
      val r = KvFsck.check(spark, dir.toString)
      val byName = r.rows.toMap
      oneRow(((r.healthy: Any) +: metricNames.map(n => byName(n): Any)).toArray)
    }
  }
}
