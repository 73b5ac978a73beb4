package graft.catalog.spark

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{Snapshot, SnapshotCatalog}

/** Spark V2 `TableCatalog` over [[graft.catalog.SnapshotCatalog]] — gives
  * the engine the reference's exact SQL operating surface without an
  * Iceberg runtime:
  *
  * {{{
  *   spark.sql.catalog.snapcat           = graft.catalog.spark.SnapCatalogPlugin
  *   spark.sql.catalog.snapcat.warehouse = /path/to/warehouse
  *
  *   SHOW TABLES IN snapcat.db                      -- 1_collect_src_snapshots.py:52
  *   SELECT * FROM snapcat.db.t                     -- current state
  *   SELECT * FROM snapcat.db.t VERSION AS OF 2     -- snapshot-id time travel
  *   SELECT * FROM snapcat.db.t TIMESTAMP AS OF '...'  -- as-of-timestamp
  *   CREATE NAMESPACE snapcat.db2                   -- 3_create_dst_tables.py:73-77
  *   CREATE TABLE snapcat.db2.t (c INT)             -- 3_create_dst_tables.py:79-92
  * }}}
  *
  * Reads delegate to Spark's own vectorized Parquet `FileTable` over the
  * snapshot's file list, so pushdown/pruning/codegen are stock. Writes go
  * through the library API (`SnapshotCatalog.append/overwrite`) — the SQL
  * write path is intentionally not wired in this round.
  */
class SnapCatalogPlugin extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active
  private def cat: SnapshotCatalog = new SnapshotCatalog(spark, warehouse)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  // ---- namespaces ----

  override def listNamespaces(): Array[Array[String]] =
    cat.listNamespaces().map(db => Array(db)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (cat.namespaceExists(namespace.head)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (namespace.length != 1 || !cat.namespaceExists(namespace.head))
      throw new NoSuchNamespaceException(namespace)
    Map("location" -> s"$warehouse/${namespace.head}").asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    require(namespace.length == 1, "snapcat namespaces are single-level")
    cat.createNamespace(namespace.head)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    require(namespace.length == 1, "snapcat namespaces are single-level")
    if (!cat.namespaceExists(namespace.head)) return false
    if (cat.listTables(namespace.head).nonEmpty && !cascade)
      throw new IllegalStateException(s"namespace ${namespace.head} is not empty")
    cat.dropNamespace(namespace.head) // recursive: removes tables + dir
    true
  }

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.length != 1 || !cat.namespaceExists(namespace.head))
      throw new NoSuchNamespaceException(namespace)
    cat.listTables(namespace.head).map(t => Identifier.of(namespace, t)).toArray
  }

  /** Combines a lazily built read delegate ([[ParquetTable]]) with the SQL
    * write path via the V1 write bridge: `InsertableRelation.insert` routes
    * straight into the catalog's commit protocol, so `INSERT INTO` =
    * `append` commit and `INSERT OVERWRITE` = `overwrite` commit — each SQL
    * write is one new snapshot, exactly like the library API.
    *
    * The delegate is a thunk so read-path constraints (the partitioned
    * multi-snapshot-dir basePath limitation) surface only when a SCAN is
    * built — writes must keep working on a table whose current snapshot is
    * temporarily unreadable via SQL. */
  private final class SnapTable(tableName: String, tableSchema: StructType,
      val mkReadDelegate: () => ParquetTable, db: String, table: String,
      override val recordCount: Long)
      extends Table with SupportsRead
      with org.apache.spark.sql.connector.catalog.SupportsWrite with HasRecordCount {

    override def name(): String = tableName
    override def schema(): StructType = tableSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
      // the reference's exact reader API: spark.read.option("snapshot-id", id)
      // .table(t) (`5_migrate_tables_data.py:72-74`) / "as_of_snapshot_id"
      // (`2_collect_database_schema_info.py:151-153`) — reader options land
      // here, so time travel works through DataFrameReader verbatim.
      val requested = Option(options.get("snapshot-id"))
        .orElse(Option(options.get("as_of_snapshot_id")))
      requested match {
        case Some(v) =>
          val snapId = try v.toLong catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"snapshot-id option must be numeric, got '$v'")
          }
          snapshotTable(Identifier.of(Array(db), table), cat.snapshotAt(db, table, snapId))
            .asInstanceOf[SnapTable].mkReadDelegate().newScanBuilder(options)
        case None => mkReadDelegate().newScanBuilder(options)
      }
    }

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder with SupportsTruncate {
        private var overwriteAll = false
        override def truncate(): WriteBuilder = { overwriteAll = true; this }
        override def build(): Write = new V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: DataFrame, ignored: Boolean): Unit =
                if (overwriteAll) cat.overwrite(db, table, data)
                else cat.append(db, table, data)
            }
        }
      }
  }

  private def snapshotTable(ident: Identifier, snap: Snapshot): Table = {
    val db = ident.namespace().head
    val table = ident.name()
    val root = java.nio.file.Paths.get(warehouse, db, table)
    def mkDelegate(): ParquetTable = {
      val files = snap.files.map(f => root.resolve(f).toString)
      val meta = cat.meta(db, table)
      // Hive-style partition dirs resolve via basePath; multi-snapshot-dir
      // file lists of PARTITIONED tables can't share one basePath — compact
      // first (compaction rewrites into a single snapshot dir). Read-path
      // only: evaluated when a scan is built, never for writes.
      val opts: Map[String, String] =
        if (meta.partitionCols.isEmpty || snap.files.isEmpty) Map.empty
        else {
          val dirs = snap.files.map(_.split("/").take(2).mkString("/")).distinct
          if (dirs.size > 1) throw new UnsupportedOperationException(
            s"partitioned table $db.$table spans ${dirs.size} snapshot dirs; " +
              "run compact() to consolidate before SQL reads")
          Map("basePath" -> root.resolve(dirs.head).toString)
        }
      ParquetTable(s"$catalogName.$db.$table", spark,
        new CaseInsensitiveStringMap(opts.asJava), files,
        Some(snap.schema), classOf[ParquetFileFormat])
    }
    new SnapTable(s"$catalogName.$db.$table", snap.schema, () => mkDelegate(), db, table,
      snap.recordCount)
  }

  /** The `<table>.snapshots` metadata relation the reference scans
    * (`spark.table("cat.db.t.snapshots")`, `1_collect_src_snapshots.py:61-62`)
    * — resolved as identifier namespace [db, t] + name "snapshots" and
    * served as a driver-local scan (the log is KB-sized metadata). */
  private final class SnapshotsMetaTable(db: String, table: String)
      extends Table with SupportsRead {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
    import org.apache.spark.sql.connector.read.{LocalScan, Scan}
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String

    private val tableSchema = StructType(Seq(
      StructField("snapshot_id", LongType),
      StructField("committed_at", TimestampType),
      StructField("operation", StringType),
      StructField("summary", MapType(StringType, StringType))))

    override def name(): String = s"$catalogName.$db.$table.snapshots"
    override def schema(): StructType = tableSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new Scan with LocalScan {
        override def readSchema(): StructType = tableSchema
        override def rows(): Array[InternalRow] =
          cat.snapshotList(db, table).map { s =>
            val micros = java.time.Instant.parse(s.committedAt)
            val ts = micros.getEpochSecond * 1000000L + micros.getNano / 1000L
            val keys = s.summary.keys.toArray.map(k => UTF8String.fromString(k): Any)
            val vals = s.summary.values.toArray.map(v => UTF8String.fromString(v): Any)
            InternalRow(s.snapshotId, ts, UTF8String.fromString(s.operation),
              ArrayBasedMapData(keys, vals))
          }.toArray
      }
  }

  override def loadTable(ident: Identifier): Table = {
    // metadata-table addressing: snapcat.db.t.snapshots
    if (ident.namespace().length == 2 && ident.name() == "snapshots" &&
      cat.tableExists(ident.namespace()(0), ident.namespace()(1))) {
      return new SnapshotsMetaTable(ident.namespace()(0), ident.namespace()(1))
    }
    checkExists(ident)
    snapshotTable(ident, cat.currentSnapshot(ident.namespace().head, ident.name()))
  }

  /** VERSION AS OF <snapshotId> (`5_migrate_tables_data.py:72-74` surface). */
  override def loadTable(ident: Identifier, version: String): Table = {
    checkExists(ident)
    val snapId = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"snapcat VERSION AS OF takes a numeric snapshot id, got '$version'")
    }
    snapshotTable(ident, cat.snapshotAt(ident.namespace().head, ident.name(), snapId))
  }

  /** TIMESTAMP AS OF — micros since epoch (Spark converts literals). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    checkExists(ident)
    val ts = java.time.Instant.EPOCH.plusNanos(timestamp * 1000L)
    val db = ident.namespace().head
    val snap = cat.snapshotList(db, ident.name())
      .filter(s => !java.time.Instant.parse(s.committedAt).isAfter(ts))
      .maxByOption(_.snapshotId)
      .getOrElse(throw new NoSuchTableException(ident))
    snapshotTable(ident, snap)
  }

  private def checkExists(ident: Identifier): Unit = {
    if (ident.namespace().length != 1 ||
      !cat.tableExists(ident.namespace().head, ident.name()))
      throw new NoSuchTableException(ident)
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 && cat.tableExists(ident.namespace().head, ident.name())

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(ident.namespace().length == 1, "snapcat namespaces are single-level")
    val partCols = partitions.map { t =>
      require(t.name == "identity", s"only identity partitioning supported, got $t")
      t.references.head.fieldNames.mkString(".")
    }
    cat.createTable(ident.namespace().head, ident.name(), schema,
      partCols.toSeq, properties.asScala.toMap)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported; use the library API")

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    cat.dropTable(ident.namespace().head, ident.name())
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE not supported")
}
