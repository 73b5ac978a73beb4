package graft.catalog.spark

import java.nio.file.Paths
import java.time.Instant
import java.util.{Iterator => JIterator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.SnapshotCatalog

/** The SQL maintenance surface: `CALL snapcat.system.<proc>(...)` through
  * Spark 4's DSv2 `ProcedureCatalog`. The procedure set mirrors the shape
  * of Iceberg's published Spark procedures (`rewrite_data_files`,
  * `expire_snapshots`, `remove_orphan_files`, `rollback_to_snapshot`,
  * `create_tag`/`create_branch`, `fast_forward`, `add_files`, plus the
  * WAP pair `publish_staged`/`discard_staged` — public API surface,
  * reimplemented over this catalog's own verbs), so the entire
  * maintenance lifecycle AND the write-audit-publish cycle (staging armed
  * by the `write.wap.enabled` table property on INSERT) run from SQL
  * without dropping to the library.
  *
  * Each procedure is ONE existing [[SnapshotCatalog]] verb behind the same
  * CommitMutex as the library path — no new commit semantics here, only a
  * SQL door to the audited ones. Results come back as rows through
  * [[LocalScan]] (driver-local, KB-sized: snapshot ids, reclaimed counts,
  * orphan paths), so `spark.sql("CALL ...")` yields a DataFrame the caller
  * can assert on or join into an ops report. Scale posture: every verb's
  * heavy lifting (rewrites, sweeps) is the catalog's already-distributed
  * implementation; the procedure layer itself never touches data.
  *
  * Reference cite: the reference drives maintenance from operator-run CLI
  * scripts (e.g. `6_*.py` verification passes); a SQL-native surface is
  * what its users would reach for on a warehouse they can only speak SQL
  * to.
  */
object SnapProcedures {

  /** Declarative procedure: parameters, result schema, and a body from the
    * bound argument row to result rows. `bind` ignores the caller-supplied
    * input type — Spark's ProcedureArgumentCoercion casts arguments to the
    * declared parameter types before `call` runs. */
  private final class Proc(
      procName: String,
      procDescription: String,
      val params: Seq[ProcedureParameter],
      resultSchema: StructType,
      body: InternalRow => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDescription
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false // every call commits/sweeps
    override def call(input: InternalRow): JIterator[Scan] = {
      val out = body(input).toArray
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = out
        override def description(): String = s"graft procedure $procName"
      }
      java.util.List.of(scan).iterator()
    }
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType, sql: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(sql).build()

  /** `table` arguments are 'db.table' strings — the procedure namespace is
    * `system`, so the target table can't ride the identifier itself. */
  private def dbTable(input: InternalRow, ordinal: Int): (String, String) = {
    require(!input.isNullAt(ordinal), "table argument must not be null")
    val s = input.getUTF8String(ordinal).toString
    s.split('.') match {
      case Array(db, t) if db.nonEmpty && t.nonEmpty => (db, t)
      case _ => throw new IllegalArgumentException(
        s"table argument must be 'db.table', got '$s'")
    }
  }

  private def str(input: InternalRow, ordinal: Int): Option[String] =
    if (input.isNullAt(ordinal)) None else Some(input.getUTF8String(ordinal).toString)

  private def row(values: Any*): InternalRow = new GenericInternalRow(values.toArray)
  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private val snapshotResult = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = true),
    StructField("operation", StringType, nullable = false)))

  /** Build the procedure set against a catalog instance. A fresh seq per
    * call keeps the closures bound to the caller's warehouse. */
  def all(cat: => SnapshotCatalog): Map[String, UnboundProcedure] = {
    def proc(name: String, description: String, params: Seq[ProcedureParameter],
        result: StructType)(body: InternalRow => Seq[InternalRow]): (String, UnboundProcedure) =
      name -> new Proc(name, description, params, result, body)

    Map(
      proc("compact",
        "rewrite the current snapshot into num_files files (folds MoR deletes, recomputes stats)",
        Seq(in("table", StringType), inDefault("num_files", IntegerType, "1")),
        snapshotResult) { input =>
        val (db, t) = dbTable(input, 0)
        val snap = cat.compact(db, t, input.getInt(1))
        Seq(row(snap.snapshotId, utf8("compact")))
      },

      proc("zorder",
        "rewrite the current snapshot z-ordered on the given comma-separated columns",
        Seq(in("table", StringType), in("columns", StringType),
          inDefault("num_files", IntegerType, "1")),
        snapshotResult) { input =>
        val (db, t) = dbTable(input, 0)
        val cols = str(input, 1).getOrElse(
          throw new IllegalArgumentException("columns must not be null"))
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val snap = cat.compactZOrder(db, t, cols, input.getInt(2))
        Seq(row(snap.snapshotId, utf8("zorder")))
      },

      proc("rewrite_small_files",
        "bin-pack only sub-threshold files into ~target_bytes outputs; large files " +
          "carry verbatim; optional predicate scopes the pack to admitted files",
        Seq(in("table", StringType), in("small_bytes", LongType),
          in("target_bytes", LongType),
          inDefault("predicate", StringType, "NULL")),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = true),
          StructField("rewritten", BooleanType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val scope = str(input, 3).map(org.apache.spark.sql.functions.expr)
        cat.rewriteSmallFiles(db, t, input.getLong(1), input.getLong(2),
          scope) match {
          case Some(snap) => Seq(row(snap.snapshotId, true))
          case None       => Seq(row(null, false)) // <2 small files: no commit
        }
      },

      proc("compact_where",
        "rewrite only the files the SQL predicate admits (footer stats + " +
          "bucket/transform dirs select them) into num_files outputs; " +
          "everything else carries verbatim - partition-scoped maintenance",
        Seq(in("table", StringType), in("predicate", StringType),
          inDefault("num_files", IntegerType, "1")),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = true),
          StructField("rewritten", BooleanType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val pred = str(input, 1).getOrElse(
          throw new IllegalArgumentException("predicate must not be null"))
        cat.compactWhere(db, t, org.apache.spark.sql.functions.expr(pred),
          input.getInt(2)) match {
          case Some(snap) => Seq(row(snap.snapshotId, true))
          case None       => Seq(row(null, false)) // <2 admitted files
        }
      },

      proc("rewrite_position_deletes",
        "fold positional delete files into a sorted deduplicated range-sharded set; " +
          "data files untouched; optional predicate scopes to shards covering admitted files",
        Seq(in("table", StringType),
          inDefault("predicate", StringType, "NULL")),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = true),
          StructField("rewritten_delete_files", IntegerType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val scope = str(input, 1).map(org.apache.spark.sql.functions.expr)
        cat.compactDeleteFiles(db, t, scope) match {
          case Some(s) => Seq(row(s.snapshotId,
            s.summary("rewritten_delete_files").toInt))
          case None => Seq(row(null, 0)) // <2 admitted positional delete files
        }
      },

      proc("convert_equality_deletes",
        "materialize equality-delete shards into consolidated positional shards " +
          "(coverage-exact); data files untouched, reads drop the key-hash joins; " +
          "optional predicate scopes to shards covering admitted files",
        Seq(in("table", StringType),
          inDefault("predicate", StringType, "NULL")),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = true),
          StructField("converted_delete_files", IntegerType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val scope = str(input, 1).map(org.apache.spark.sql.functions.expr)
        cat.convertEqualityDeletes(db, t, scope) match {
          case Some(s) => Seq(row(s.snapshotId,
            s.summary("converted_delete_files").toInt))
          case None => Seq(row(null, 0)) // no equality shards admitted
        }
      },

      proc("clone_table",
        "zero-copy clone of the source's current (or as-of historical) " +
          "snapshot as a new table: data files hard-link at the same " +
          "relative paths (independent lifecycles - expire/GC on either " +
          "side never corrupts the other); history, tags, branches do not carry",
        Seq(in("source", StringType), in("target", StringType),
          inDefault("as_of_snapshot_id", LongType, "NULL")),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("files", LongType, nullable = false)))) { input =>
        val (sdb, st) = dbTable(input, 0)
        val (tdb, tt) = dbTable(input, 1)
        val asOf = if (input.isNullAt(2)) None else Some(input.getLong(2))
        val snap = cat.cloneTable(sdb, st, tdb, tt, asOf)
        Seq(row(snap.snapshotId, snap.files.size.toLong))
      },

      proc("rewrite_manifests",
        "consolidate the current snapshot's manifest shards into one; stats-only commit, no data rewritten",
        Seq(in("table", StringType)),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = true),
          StructField("rewritten_manifests", IntegerType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        cat.rewriteManifests(db, t) match {
          case Some(s) => Seq(row(s.snapshotId,
            s.summary("rewritten_manifests").toInt))
          case None => Seq(row(null, 0)) // already a single shard
        }
      },

      proc("rebuild_blooms",
        "backfill bloom sidecars for files lacking them (adopted / pre-property); stats-only commit, no data rewritten",
        Seq(in("table", StringType)),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = true),
          StructField("bloomed_files", IntegerType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        cat.rebuildBlooms(db, t) match {
          case Some(s) => Seq(row(s.snapshotId, s.summary("bloomed_files").toInt))
          case None    => Seq(row(null, 0)) // every file already bloomed
        }
      },

      proc("create_view",
        "create (or with replace=true, version-bump) a versioned SQL view; body analyzed now, cycles refused",
        Seq(in("view", StringType), in("sql", StringType),
          inDefault("replace", BooleanType, "false"),
          inDefault("column_aliases", StringType, "NULL")),
        StructType(Seq(
          StructField("view", StringType, nullable = false),
          StructField("version", IntegerType, nullable = false)))) { input =>
        val (db, v) = dbTable(input, 0)
        val sql = str(input, 1).getOrElse(
          throw new IllegalArgumentException("sql must not be null"))
        val replace = !input.isNullAt(2) && input.getBoolean(2)
        val aliases = str(input, 3).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val meta = cat.createView(db, v, sql, aliases, Map.empty, replace)
        Seq(row(utf8(s"$db.$v"), meta.current))
      },

      proc("maintain",
        "one-call steady-state maintenance: convert eq deletes, fold delete shards, " +
          "bin-pack small files, consolidate manifests, expire old snapshots, sweep " +
          "orphans; optional predicate scopes the data/delete rewrites to admitted " +
          "files (expire/orphans stay table-wide - they reclaim, never rewrite)",
        Seq(in("table", StringType),
          inDefault("small_bytes", LongType, "33554432"),      // 32 MB
          inDefault("target_bytes", LongType, "134217728"),    // 128 MB
          inDefault("keep_last", IntegerType, "5"),
          inDefault("predicate", StringType, "NULL")),
        StructType(Seq(
          StructField("action", StringType, nullable = false),
          StructField("detail", StringType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val small = input.getLong(1)
        val target = input.getLong(2)
        val keep = input.getInt(3)
        val scope = str(input, 4).map(org.apache.spark.sql.functions.expr)
        // ORDER MATTERS: equality shards convert to positions FIRST
        // (record_count comes back exact, reads drop the key-hash joins
        // — the eq-heavy CDC table is exactly the one running nightly
        // maintenance), then positional folding consolidates the
        // converted state; bin-pack before delete-shard folding would
        // re-home covered rows; manifests consolidate the final shape;
        // expire + orphan sweep reclaim everything the preceding commits
        // stranded.
        val converted = cat.convertEqualityDeletes(db, t, scope)
          .map(s => s"converted at snapshot ${s.snapshotId}")
          .getOrElse("no equality shards")
        val folded = cat.compactDeleteFiles(db, t, scope)
          .map(s => s"folded to snapshot ${s.snapshotId}").getOrElse("nothing to fold")
        val packed = cat.rewriteSmallFiles(db, t, small, target, scope)
          .map(s => s"packed to snapshot ${s.snapshotId}").getOrElse("no small files")
        val manifests = cat.rewriteManifests(db, t)
          .map(s => s"rewritten at snapshot ${s.snapshotId}").getOrElse("single shard already")
        val expired = s"${cat.expireSnapshots(db, t, keep)} data files reclaimed"
        val orphans = s"${cat.removeOrphanFiles(db, t).size} orphan files swept"
        Seq(
          row(utf8("convert_equality_deletes"), utf8(converted)),
          row(utf8("rewrite_position_deletes"), utf8(folded)),
          row(utf8("rewrite_small_files"), utf8(packed)),
          row(utf8("rewrite_manifests"), utf8(manifests)),
          row(utf8("expire_snapshots"), utf8(expired)),
          row(utf8("remove_orphan_files"), utf8(orphans)))
      },

      proc("audit_table",
        "evaluate expect.<name> table-property predicates against a snapshot (default current); one scan, per-expectation violation counts",
        Seq(in("table", StringType), inDefault("snapshot_id", LongType, "NULL")),
        StructType(Seq(
          StructField("expectation", StringType, nullable = false),
          StructField("violations", LongType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val id = if (input.isNullAt(1)) -1L else input.getLong(1)
        cat.auditExpectations(db, t, id).map { case (n, c) => row(utf8(n), c) }
      },

      proc("create_materialized_view",
        "materialize a view body into a backing table with per-base snapshot high-waters; reads serve the table",
        Seq(in("view", StringType), in("sql", StringType),
          inDefault("replace", BooleanType, "false"),
          inDefault("partition_by", StringType, "NULL")),
        StructType(Seq(
          StructField("view", StringType, nullable = false),
          StructField("version", IntegerType, nullable = false),
          StructField("backing_table", StringType, nullable = false)))) { input =>
        val (db, v) = dbTable(input, 0)
        val sql = str(input, 1).getOrElse(
          throw new IllegalArgumentException("sql must not be null"))
        val replace = !input.isNullAt(2) && input.getBoolean(2)
        val pt = str(input, 3).toSeq
          .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
        val meta = cat.createMaterializedView(db, v, sql, replace, pt)
        Seq(row(utf8(s"$db.$v"), meta.current,
          utf8(s"$db.${cat.mvTableName(v)}")))
      },

      proc("refresh_materialized_view",
        "bring a materialized view forward: 'incremental' appends just the base delta when the shape allows, else 'full' rebuild",
        Seq(in("view", StringType)),
        StructType(Seq(
          StructField("mode", StringType, nullable = false),
          StructField("rows_added", LongType, nullable = false)))) { input =>
        val (db, v) = dbTable(input, 0)
        val (mode, rows) = cat.refreshMaterializedView(db, v)
        Seq(row(utf8(mode), rows))
      },

      proc("refresh_materialized_views",
        "bring EVERY materialized view of a namespace forward (the nightly-maintenance sweep): one row per MV with the mode its shape earned; plain views skip",
        Seq(in("namespace", StringType)),
        StructType(Seq(
          StructField("view", StringType, nullable = false),
          StructField("mode", StringType, nullable = false),
          StructField("rows_added", LongType, nullable = false)))) { input =>
        val db = str(input, 0).getOrElse(
          throw new IllegalArgumentException("namespace must not be null"))
        cat.listViews(db).flatMap { v =>
          cat.loadView(db, v).filter(_.properties.contains("materialized")).map { _ =>
            val (mode, rows) = cat.refreshMaterializedView(db, v)
            row(utf8(s"$db.$v"), utf8(mode), rows)
          }
        }
      },

      proc("create_vector_index",
        "build a persistent IVF vector index over table's id/vector columns: " +
          "frozen centroids in <name>_cent, assignments hive-partitioned by cell " +
          "(probes read nprobe/nlist of the files); pq_m > 0 stores m-byte " +
          "product-quantization codes + codebooks instead of vectors (topK " +
          "re-ranks against the base); maintain with refresh_vector_index",
        Seq(in("table", StringType), in("index", StringType),
          in("id_col", StringType), in("vec_col", StringType),
          inDefault("nlist", IntegerType, "64"),
          inDefault("iters", IntegerType, "2"),
          inDefault("sample_mod", LongType, "0"),
          inDefault("pq_m", IntegerType, "0"),
          inDefault("pq_bits", IntegerType, "8")),
        StructType(Seq(
          StructField("index", StringType, nullable = false),
          StructField("nlist", IntegerType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val name = str(input, 1).getOrElse(
          throw new IllegalArgumentException("index must not be null"))
        val idCol = str(input, 2).getOrElse(
          throw new IllegalArgumentException("id_col must not be null"))
        val vecCol = str(input, 3).getOrElse(
          throw new IllegalArgumentException("vec_col must not be null"))
        val nlist = input.getInt(4)
        val pq = if (input.getInt(7) > 0) Some((input.getInt(7), input.getInt(8)))
          else None
        graft.ops.VectorIndex.create(cat, db, t, name, idCol, vecCol,
          nlist, input.getInt(5), input.getLong(6), pq)
        Seq(row(utf8(s"$db.$name"), nlist))
      },

      proc("refresh_vector_index",
        "advance a vector index to its base table's current snapshot from per-commit " +
          "metadata (churn-sized; never retrains): mode fresh|incremental|full",
        Seq(in("index", StringType)),
        StructType(Seq(
          StructField("mode", StringType, nullable = false),
          StructField("commits", LongType, nullable = false)))) { input =>
        val (db, name) = dbTable(input, 0)
        val (mode, commits) = graft.ops.VectorIndex.refresh(cat, db, name)
        Seq(row(utf8(mode), commits))
      },

      proc("rebuild_vector_index",
        "deliberate retrain-and-reassign at the base's current snapshot — the answer " +
          "to centroid drift (watch cell occupancy skew via the index table itself)",
        Seq(in("index", StringType)),
        StructType(Seq(StructField("rebuilt", BooleanType, nullable = false)))) { input =>
        val (db, name) = dbTable(input, 0)
        graft.ops.VectorIndex.rebuild(cat, db, name)
        Seq(row(true))
      },

      proc("create_text_index",
        "build a persistent inverted text index over table's id/text columns: " +
          "postings hive-partitioned by term-hash bucket (a query reads only its " +
          "own terms' bucket directories), BM25 corpus scalars folded as table " +
          "properties; maintain with refresh_text_index",
        Seq(in("table", StringType), in("index", StringType),
          in("id_col", StringType), in("text_col", StringType),
          inDefault("nbuckets", IntegerType, "256")),
        StructType(Seq(
          StructField("index", StringType, nullable = false),
          StructField("nbuckets", IntegerType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val name = str(input, 1).getOrElse(
          throw new IllegalArgumentException("index must not be null"))
        val idCol = str(input, 2).getOrElse(
          throw new IllegalArgumentException("id_col must not be null"))
        val textCol = str(input, 3).getOrElse(
          throw new IllegalArgumentException("text_col must not be null"))
        val nb = input.getInt(4)
        graft.ops.TextIndex.create(cat, db, t, name, idCol, textCol, nb)
        Seq(row(utf8(s"$db.$name"), nb))
      },

      proc("create_dedup_index",
        "build a persistent MinHash near-dup index over table's id/text columns: " +
          "banded signature rows hive-partitioned by band-hash bucket (a probe " +
          "batch reads only its own sketches' bucket directories; the corpus is " +
          "never re-sketched per call); maintain with refresh_dedup_index",
        Seq(in("table", StringType), in("index", StringType),
          in("id_col", StringType), in("text_col", StringType),
          inDefault("nbuckets", IntegerType, "64")),
        StructType(Seq(
          StructField("index", StringType, nullable = false),
          StructField("nbuckets", IntegerType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val name = str(input, 1).getOrElse(
          throw new IllegalArgumentException("index must not be null"))
        val idCol = str(input, 2).getOrElse(
          throw new IllegalArgumentException("id_col must not be null"))
        val textCol = str(input, 3).getOrElse(
          throw new IllegalArgumentException("text_col must not be null"))
        val nb = input.getInt(4)
        graft.ops.DedupIndex.create(cat, db, t, name, idCol, textCol,
          nbuckets = nb)
        Seq(row(utf8(s"$db.$name"), nb))
      },

      proc("refresh_dedup_index",
        "advance a MinHash near-dup index to its base table's current snapshot " +
          "from per-commit metadata (churn-sized; never re-sketches the " +
          "unchanged corpus): mode fresh|incremental|full",
        Seq(in("index", StringType)),
        StructType(Seq(
          StructField("mode", StringType, nullable = false),
          StructField("commits", LongType, nullable = false)))) { input =>
        val (db, name) = dbTable(input, 0)
        val (mode, commits) = graft.ops.DedupIndex.refresh(cat, db, name)
        Seq(row(utf8(mode), commits))
      },

      proc("refresh_indexes",
        "bring EVERY persistent index of a namespace forward (the nightly-" +
          "maintenance sweep, the index twin of refresh_materialized_views): " +
          "one row per vector/text/dedup index with the mode its range earned",
        Seq(in("namespace", StringType)),
        StructType(Seq(
          StructField("index", StringType, nullable = false),
          StructField("kind", StringType, nullable = false),
          StructField("mode", StringType, nullable = false),
          StructField("commits", LongType, nullable = false)))) { input =>
        val db = str(input, 0).getOrElse(
          throw new IllegalArgumentException("namespace must not be null"))
        cat.listTables(db).sorted.flatMap { t =>
          val props = cat.meta(db, t).properties
          if (props.contains(graft.ops.VectorIndex.PropBase)) {
            val (mode, n) = graft.ops.VectorIndex.refresh(cat, db, t)
            Some(row(utf8(s"$db.$t"), utf8("vector"), utf8(mode), n))
          } else if (props.contains(graft.ops.TextIndex.PropBase)) {
            val (mode, n) = graft.ops.TextIndex.refresh(cat, db, t)
            Some(row(utf8(s"$db.$t"), utf8("text"), utf8(mode), n))
          } else if (props.contains(graft.ops.DedupIndex.PropBase)) {
            val (mode, n) = graft.ops.DedupIndex.refresh(cat, db, t)
            Some(row(utf8(s"$db.$t"), utf8("dedup"), utf8(mode), n))
          } else None
        }
      },

      proc("refresh_text_index",
        "advance a text index to its base table's current snapshot from per-commit " +
          "metadata (churn-sized; never re-tokenizes the unchanged corpus): " +
          "mode fresh|incremental|full",
        Seq(in("index", StringType)),
        StructType(Seq(
          StructField("mode", StringType, nullable = false),
          StructField("commits", LongType, nullable = false)))) { input =>
        val (db, name) = dbTable(input, 0)
        val (mode, commits) = graft.ops.TextIndex.refresh(cat, db, name)
        Seq(row(utf8(mode), commits))
      },

      proc("drop_view",
        "drop a versioned SQL view (its whole history)",
        Seq(in("view", StringType)),
        StructType(Seq(StructField("dropped", BooleanType, nullable = false)))) { input =>
        val (db, v) = dbTable(input, 0)
        Seq(row(cat.dropView(db, v)))
      },

      proc("restore_view",
        "re-point a view at a historical version (recorded as a NEW version; history is append-only)",
        Seq(in("view", StringType), in("version", IntegerType)),
        StructType(Seq(
          StructField("view", StringType, nullable = false),
          StructField("version", IntegerType, nullable = false)))) { input =>
        val (db, v) = dbTable(input, 0)
        val meta = cat.restoreView(db, v, input.getInt(1))
        Seq(row(utf8(s"$db.$v"), meta.current))
      },

      proc("show_views",
        "list the versioned SQL views of a namespace",
        Seq(in("namespace", StringType)),
        StructType(Seq(
          StructField("view", StringType, nullable = false),
          StructField("current_version", IntegerType, nullable = false)))) { input =>
        val db = str(input, 0).getOrElse(
          throw new IllegalArgumentException("namespace must not be null"))
        cat.listViews(db).flatMap(n => cat.loadView(db, n).map(m =>
          row(utf8(s"$db.$n"), m.current)))
      },

      proc("view_versions",
        "a view's full version history (Iceberg view-spec versioning)",
        Seq(in("view", StringType)),
        StructType(Seq(
          StructField("version", IntegerType, nullable = false),
          StructField("created_at", StringType, nullable = false),
          StructField("is_current", BooleanType, nullable = false),
          StructField("sql", StringType, nullable = false)))) { input =>
        val (db, v) = dbTable(input, 0)
        val meta = cat.loadView(db, v).getOrElse(
          throw new NoSuchElementException(s"no such view: $db.$v"))
        meta.versions.sortBy(_.version).map(ver =>
          row(ver.version, utf8(ver.timestampUtc),
            ver.version == meta.current, utf8(ver.sql)))
      },

      proc("analyze_ndv",
        "compute per-column NDV sketches from the current live rows (one merged scan); stats-only commit feeding CBO distinctCount",
        Seq(in("table", StringType), inDefault("columns", StringType, "NULL")),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = true),
          StructField("column", StringType, nullable = true),
          StructField("ndv", LongType, nullable = true)))) { input =>
        val (db, t) = dbTable(input, 0)
        val cols = str(input, 1).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        cat.analyzeNdv(db, t, cols) match {
          case Some(s) =>
            s.summary.toSeq.filter(_._1.startsWith("ndv."))
              .filterNot(_._1 == "ndv.snapshot").sortBy(_._1)
              .map { case (k, v) =>
                row(s.snapshotId, utf8(k.stripPrefix("ndv.")), v.toLong) }
          case None => Seq(row(null, null, null)) // no analyzable columns
        }
      },

      proc("analyze_histogram",
        "compute equi-height per-column histograms from the current live rows (two scans); stats-only commit feeding CBO selectivity",
        Seq(in("table", StringType), inDefault("columns", StringType, "NULL"),
          inDefault("bins", IntegerType, "64")),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = true),
          StructField("column", StringType, nullable = true),
          StructField("bins", IntegerType, nullable = true)))) { input =>
        val (db, t) = dbTable(input, 0)
        val cols = str(input, 1).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val bins = input.getInt(2)
        cat.analyzeHistogram(db, t, cols, bins) match {
          case Some(s) =>
            s.summary.toSeq.filter(_._1.startsWith("hist.")).sortBy(_._1)
              .map { case (k, v) =>
                val nb = graft.catalog.Json.parse(v)
                  .asInstanceOf[graft.catalog.JObj].arr("b").size
                row(s.snapshotId, utf8(k.stripPrefix("hist.")), nb) }
          case None => Seq(row(null, null, null))
        }
      },

      proc("expire_snapshots",
        "drop old snapshots (count- or time-based) and GC unreferenced files; refs always survive",
        Seq(in("table", StringType), inDefault("keep_last", IntegerType, "1"),
          inDefault("older_than", StringType, "NULL")),
        StructType(Seq(
          StructField("deleted_data_files", IntegerType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val keepLast = input.getInt(1)
        val deleted = str(input, 2) match {
          case Some(ts) => cat.expireSnapshotsOlderThan(db, t, Instant.parse(ts), keepLast)
          case None     => cat.expireSnapshots(db, t, keepLast)
        }
        Seq(row(deleted))
      },

      proc("remove_orphan_files",
        "delete files under the table root no snapshot references (crashed-write debris)",
        Seq(in("table", StringType)),
        StructType(Seq(
          StructField("orphan_path", StringType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        cat.removeOrphanFiles(db, t).map(p => row(utf8(p)))
      },

      proc("rollback",
        "re-point the table at an earlier snapshot without rewriting history",
        Seq(in("table", StringType), in("snapshot_id", LongType)),
        snapshotResult) { input =>
        val (db, t) = dbTable(input, 0)
        val snap = cat.rollback(db, t, input.getLong(1))
        Seq(row(snap.snapshotId, utf8("rollback")))
      },

      proc("create_tag",
        "name a snapshot (default: the current one) for VERSION AS OF reads and expiry protection",
        Seq(in("table", StringType), in("name", StringType),
          inDefault("snapshot_id", LongType, "NULL")),
        StructType(Seq(
          StructField("ref", StringType, nullable = false),
          StructField("snapshot_id", LongType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val tag = str(input, 1).getOrElse(
          throw new IllegalArgumentException("tag name must not be null"))
        val id = if (input.isNullAt(2)) cat.currentSnapshotId(db, t) else input.getLong(2)
        cat.createTag(db, t, tag, id)
        Seq(row(utf8(tag), id))
      },

      proc("create_branch",
        "open a writable branch from a snapshot (default: the current one)",
        Seq(in("table", StringType), in("name", StringType),
          inDefault("from_snapshot_id", LongType, "NULL")),
        StructType(Seq(
          StructField("ref", StringType, nullable = false),
          StructField("from_snapshot_id", LongType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val branch = str(input, 1).getOrElse(
          throw new IllegalArgumentException("branch name must not be null"))
        val from = if (input.isNullAt(2)) None else Some(input.getLong(2))
        cat.createBranch(db, t, branch, from)
        Seq(row(utf8(branch), from.getOrElse(cat.currentSnapshotId(db, t))))
      },

      proc("fast_forward",
        "publish a branch head to main as an O(KB) pointer commit (ancestry-checked)",
        Seq(in("table", StringType), in("branch", StringType)),
        snapshotResult) { input =>
        val (db, t) = dbTable(input, 0)
        val branch = str(input, 1).getOrElse(
          throw new IllegalArgumentException("branch name must not be null"))
        val snap = cat.fastForward(db, t, branch)
        Seq(row(snap.snapshotId, utf8("fast_forward")))
      },

      proc("create_changelog_view",
        "register a temp view of row-level changes between two snapshots (_change_type tagged)",
        Seq(in("table", StringType), in("view_name", StringType),
          inDefault("from_snapshot_id", LongType, "NULL"),
          inDefault("to_snapshot_id", LongType, "NULL")),
        StructType(Seq(
          StructField("view_name", StringType, nullable = false)))) { input =>
        val (db, t) = dbTable(input, 0)
        val view = str(input, 1).getOrElse(
          throw new IllegalArgumentException("view_name must not be null"))
        val from = if (input.isNullAt(2)) cat.entryLog(db, t).head.snapshotId
          else input.getLong(2)
        val to = if (input.isNullAt(3)) cat.currentSnapshotId(db, t)
          else input.getLong(3)
        cat.readChangelog(db, t, from, to).createOrReplaceTempView(view)
        Seq(row(utf8(view)))
      },

      proc("publish_staged",
        "make the pending staged (WAP) snapshot the published state - an O(KB) pointer commit",
        Seq(in("table", StringType), inDefault("snapshot_id", LongType, "NULL")),
        snapshotResult) { input =>
        val (db, t) = dbTable(input, 0)
        val id = if (input.isNullAt(1)) cat.pendingStagedId(db, t).getOrElse(
          throw new IllegalArgumentException(s"no pending staged snapshot on $db.$t"))
        else input.getLong(1)
        val snap = cat.publishStaged(db, t, id)
        Seq(row(snap.snapshotId, utf8("publish_staged")))
      },

      proc("discard_staged",
        "reject the pending staged (WAP) snapshot - restores the published head as current",
        Seq(in("table", StringType), inDefault("snapshot_id", LongType, "NULL")),
        snapshotResult) { input =>
        val (db, t) = dbTable(input, 0)
        val id = if (input.isNullAt(1)) cat.pendingStagedId(db, t).getOrElse(
          throw new IllegalArgumentException(s"no pending staged snapshot on $db.$t"))
        else input.getLong(1)
        val snap = cat.discardStaged(db, t, id)
        Seq(row(snap.snapshotId, utf8("discard_staged")))
      },

      proc("recover_transactions",
        "complete or roll back crash-interrupted multi-table transactions " +
          "(prepared intents publish, preparing intents discard their stages)",
        Seq.empty,
        StructType(Seq(
          StructField("transaction_id", StringType, nullable = false)))) { _ =>
        cat.recoverTransactions().map(id => row(utf8(id)))
      },

      proc("consistent_cut",
        "a cross-table transactionally-consistent snapshot cut (comma-" +
          "separated db.table list); time-travel to the returned ids",
        Seq(in("tables", StringType)),
        StructType(Seq(
          StructField("table", StringType, nullable = false),
          StructField("snapshot_id", LongType, nullable = false)))) { input =>
        val list = str(input, 0).getOrElse(
          throw new IllegalArgumentException("tables must not be null"))
        val keys = list.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { s =>
          s.split("\\.") match {
            case Array(d, t) => (d, t)
            case _ => throw new IllegalArgumentException(
              s"expected db.table, got '$s'")
          }
        }
        cat.consistentSnapshotIds(keys).toSeq.sorted.map { case ((d, t), id) =>
          row(utf8(s"$d.$t"), id) }
      },

      proc("adopt_files",
        "adopt externally-written parquet by same-FS rename (zero copy); mode append|overwrite",
        Seq(in("table", StringType), in("source_dir", StringType),
          inDefault("mode", StringType, "'append'")),
        snapshotResult) { input =>
        val (db, t) = dbTable(input, 0)
        val src = str(input, 1).getOrElse(
          throw new IllegalArgumentException("source_dir must not be null"))
        val mode = str(input, 2).getOrElse("append")
        val snap = cat.adoptFiles(db, t, Paths.get(src), mode)
        Seq(row(snap.snapshotId, utf8("adopt_files")))
      }
    )
  }
}
