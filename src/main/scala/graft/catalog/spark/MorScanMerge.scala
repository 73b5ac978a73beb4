package graft.catalog.spark

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.{Decimal, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarBatch, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String

/** READER-LEVEL merge-on-read for the bucketed V2 scan (the Iceberg
  * `DeleteFilter` design, re-expressed for Spark's DSv2): position deletes
  * are applied INSIDE each covered file's partition reader instead of by a
  * logical anti-join rewrite, so the scan keeps reporting
  * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * and storage-partitioned joins stay exchange-free over tables with live
  * deletes — without this, one 100-row MoR delete on a 100-TB bucketed
  * fact table would put a full-table shuffle back into every co-bucketed
  * join until compact().
  *
  * Mechanics:
  *  - covered data files are scanned through a sub-scan whose schema
  *    carries Spark's magic parquet row-index column
  *    ([[MorScanMerge.RowIdxCol]]) — both parquet read paths populate it
  *    with the row's ABSOLUTE ordinal in its file, correct under file
  *    splits and row-group skipping (so predicate pushdown stays on);
  *  - each covered file's partitions are re-grouped one-file-per-partition
  *    ([[MorFilePartition]]) so a task knows which file's dead positions
  *    apply; TASKS load those positions straight from the delete-shard
  *    parquet — the Iceberg executor-side pattern: no driver collect, no
  *    broadcast, row-group + record skipping on the shard's `_file` column
  *    (shards are written sorted by `(_file, _pos)`);
  *  - the columnar handoff SURVIVES live deletes (r7): a merged partition
  *    reads the inner vectorized batches and re-exposes each through a
  *    SELECTION VECTOR — dead ordinals dropped, surviving ones remapped by
  *    [[SelectedColumnVector]] with zero copying (batches with no dead
  *    rows re-project the inner vectors directly). `supportColumnarReads`
  *    therefore stays uniformly whatever the stock parquet factory
  *    reports, so whole-stage codegen keeps consuming ColumnarBatch over
  *    a bucketed fact table with a 100-row delete — previously one tiny
  *    delete de-vectorized every scan until compact(). Equality deletes
  *    keep the logical rewrite (their key columns need not be in the
  *    read schema).
  */
object MorScanMerge {
  /** Spark's reserved temporary column name: a NULLABLE BIGINT field of
    * this name in a parquet read schema is filled with each row's file
    * ordinal by the readers themselves
    * (`ParquetRowIndexUtil.findRowIndexColumnIndexInSchema`). */
  val RowIdxCol = "_tmp_metadata_row_index"

  /** Key-tuple set of one EQUALITY-delete parquet file, generalized to
    * COMPOSITE keys (r8 — (tenant_id, row_id)-shaped CDC keys merge
    * in-scan too): each record becomes one normalized tuple over `cols`,
    * null elements included (null-safe equality — a null key component
    * kills rows whose component is null). Values normalize to Long
    * (int32/int64) or String (binary/UTF8), the same normalization
    * [[EqMatcher]] applies to scanned rows, so matching is type-exact.
    * Tuples are `java.util.ArrayList` for element-wise equals/hashCode.
    * Executor-side, bounded by the eq file's tuple count (the CDC key
    * frame — KBs). */
  def eqKeyTuples(path: String, cols: Seq[String], conf: Configuration)
      : java.util.HashSet[java.util.ArrayList[AnyRef]] = {
    val set = new java.util.HashSet[java.util.ArrayList[AnyRef]]()
    val reader = ParquetReader
      .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(path))
      .withConf(conf).build()
    try {
      var g = reader.read()
      while (g != null) {
        val t = new java.util.ArrayList[AnyRef](cols.length)
        cols.foreach { c =>
          val fi = g.getType.getFieldIndex(c)
          if (g.getFieldRepetitionCount(fi) == 0) t.add(null)
          else {
            val prim = g.getType.getFields.get(fi).asPrimitiveType().getPrimitiveTypeName
            import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
            val v: AnyRef = prim match {
              case INT32  => java.lang.Long.valueOf(g.getInteger(fi, 0).toLong)
              case INT64  => java.lang.Long.valueOf(g.getLong(fi, 0))
              case BINARY => g.getString(fi, 0)
              case other => throw new IllegalStateException(
                s"unsupported equality-delete key type $other in $path")
            }
            t.add(v)
          }
        }
        set.add(t)
        g = reader.read()
      }
    } finally reader.close()
    set
  }

  /** Dead positions of one data file, read from its covering delete
    * shards — executor-side, bounded by that file's dead-row count. */
  def deadPositions(shards: Seq[String], relFile: String,
      conf: Configuration): java.util.HashSet[java.lang.Long] = {
    val dead = new java.util.HashSet[java.lang.Long]()
    val pred = FilterCompat.get(
      FilterApi.eq(FilterApi.binaryColumn("_file"), Binary.fromString(relFile)))
    shards.foreach { s =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(s))
        .withConf(conf).withFilter(pred).build()
      try {
        var g = reader.read()
        while (g != null) {
          // record-level filtering already applied the predicate; the
          // explicit re-check keeps correctness independent of it
          if (g.getString("_file", 0) == relFile) dead.add(g.getLong("_pos", 0))
          g = reader.read()
        }
      } finally reader.close()
    }
    dead
  }

  /** Re-group a parquet batch's partitions so each holds ONE file's
    * chunks, tagged with the file's table-root-relative path and covering
    * shards. Splits of a file may stay in separate partitions (row
    * indexes are absolute). Files not in `shardsFor`'s domain keep flowing
    * too (empty shard list = nothing dead). `eqShardsFor` lists the
    * EQUALITY-delete files covering a file as (absolute path, key columns)
    * pairs — composite keys supported, applied tuple-wise in the reader.
    * `newEqShardsFor` carries a SECOND eq set per file, used only by the
    * CDC pre-image reader ([[EqDeadRowsReaderFactory]]): the commit's NEW
    * eq shards, matched positively while `eqShardsFor`'s prior coverage
    * filters to rows still alive before the commit. */
  def perFilePartitions(parts: Array[InputPartition], rootPrefix: String,
      shardsFor: String => Seq[String],
      eqShardsFor: String => Seq[(String, Seq[String])] = _ => Seq.empty,
      newEqShardsFor: String => Seq[(String, Seq[String])] = _ => Seq.empty)
      : Array[InputPartition] =
    parts.flatMap {
      case fp: FilePartition =>
        fp.files.groupBy(_.filePath.toPath.toUri.getPath).toSeq.sortBy(_._1)
          .map { case (abs, fs) =>
            val rel = abs.stripPrefix(rootPrefix)
            MorFilePartition(rel, shardsFor(rel), FilePartition(fp.index, fs),
              eqShardsFor(rel), newEqShardsFor(rel))
          }
      case other =>
        throw new IllegalStateException(
          s"expected FilePartition from the parquet batch, got ${other.getClass}")
    }

  /** One loaded equality-delete matcher over a sub-scan schema: key
    * ordinals, their Spark types (drive row/vector value normalization to
    * the same Long/String domain [[eqKeyTuples]] produced), and the key
    * tuple set. The probe tuple is REUSED across rows (single-threaded
    * per partition reader; `HashSet.contains` does not retain its
    * argument), so the per-row cost is normalization + one hash lookup,
    * no allocation. */
  final class EqMatcher(ords: Array[Int],
      dts: Array[org.apache.spark.sql.types.DataType],
      set: java.util.HashSet[java.util.ArrayList[AnyRef]]) extends Serializable {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    private[this] val probe = {
      val p = new java.util.ArrayList[AnyRef](ords.length)
      var i = 0; while (i < ords.length) { p.add(null); i += 1 }
      p
    }
    def deadRow(row: InternalRow): Boolean = {
      var i = 0
      while (i < ords.length) {
        val o = ords(i)
        probe.set(i,
          if (row.isNullAt(o)) null
          else dts(i) match {
            case IntegerType => java.lang.Long.valueOf(row.getInt(o).toLong)
            case LongType    => java.lang.Long.valueOf(row.getLong(o))
            case StringType  => row.getUTF8String(o).toString
            case other => throw new IllegalStateException(s"unsupported eq key type $other")
          })
        i += 1
      }
      set.contains(probe)
    }
    def deadVec(b: ColumnarBatch, row: Int): Boolean = {
      var i = 0
      while (i < ords.length) {
        val v = b.column(ords(i))
        probe.set(i,
          if (v.isNullAt(row)) null
          else dts(i) match {
            case IntegerType => java.lang.Long.valueOf(v.getInt(row).toLong)
            case LongType    => java.lang.Long.valueOf(v.getLong(row))
            case StringType  => v.getUTF8String(row).toString
            case other => throw new IllegalStateException(s"unsupported eq key type $other")
          })
        i += 1
      }
      set.contains(probe)
    }
  }

  /** Load the [[EqMatcher]]s for one file's covering eq shards, resolving
    * key ordinals/types against `schema` (the sub-scan's schema — key
    * columns are force-included there by every caller). */
  def eqMatchersFor(shards: Seq[(String, Seq[String])], schema: StructType,
      conf: Configuration): Seq[EqMatcher] =
    shards.map { case (path, cols) =>
      new EqMatcher(cols.map(schema.fieldIndex).toArray,
        cols.map(c => schema(c).dataType).toArray,
        eqKeyTuples(path, cols, conf))
    }

  /** The stable row-id expression of one file's rows for a CDC reader:
    * `coalesce(physical __rid, first_row_id + row_index)` — the same
    * identity [[graft.catalog.SnapshotCatalog]]'s `readVisibleWithRid`
    * serves, computed task-side from the file's frid base (metadata the
    * driver resolved at planning). A file with neither a physical `__rid`
    * column nor a recorded base yields null (identity degrades, never
    * breaks). `dirtySchema` must carry both `__rid` and [[RowIdxCol]]. */
  def ridExpr(dirtySchema: StructType, relFile: String,
      frids: Map[String, Long]): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, BoundReference, Coalesce, Literal}
    import org.apache.spark.sql.types.LongType
    val idxOrd = dirtySchema.fieldIndex(RowIdxCol)
    val physOrd = dirtySchema.fieldIndex("__rid")
    val derived = frids.get(relFile) match {
      case Some(b) =>
        new Add(Literal(b, LongType), BoundReference(idxOrd, LongType, nullable = true))
      case None => Literal(null, LongType)
    }
    Coalesce(Seq(BoundReference(physOrd, LongType, nullable = true), derived))
  }
}

/** One covered file's chunk(s): the delegate partition reads this file
  * only, `shards` are the position-delete parquet files whose `covers`
  * include it, and `eqShards` the covering equality-delete files as
  * (path, key columns) — composite keys supported. `newEqShards` is the
  * CDC pre-image reader's positive-match set (a commit's NEW eq shards);
  * empty everywhere else. */
final case class MorFilePartition(relFile: String, shards: Seq[String],
    delegate: InputPartition,
    eqShards: Seq[(String, Seq[String])] = Seq.empty,
    newEqShards: Seq[(String, Seq[String])] = Seq.empty) extends InputPartition {
  override def preferredLocations(): Array[String] = delegate.preferredLocations()
}

/** Reader factory applying position deletes in-task: reads the row-idx
  * sub-scan, drops rows whose index is dead, projects the output back to
  * the scan's visible column order (`perm` maps output ordinal to
  * sub-scan ordinal). Columnar support mirrors the inner factory's: a
  * columnar merged read filters each inner ColumnarBatch through a
  * selection vector ([[SelectedColumnVector]]); the row path keeps the
  * per-row skip. `confMap` rebuilds a hadoop Configuration task-side
  * (Configuration itself is not serializable). */
final class MorMergingReaderFactory(
    inner: PartitionReaderFactory,
    dirtySchema: StructType,
    outNames: Array[String],
    confMap: Map[String, String]) extends PartitionReaderFactory {

  private val idxOrd = dirtySchema.fieldIndex(MorScanMerge.RowIdxCol)
  private val perm = outNames.map(dirtySchema.fieldIndex)

  private def hadoopConf: Configuration = {
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  private def deadFor(mp: MorFilePartition): java.util.HashSet[java.lang.Long] =
    MorScanMerge.deadPositions(mp.shards, mp.relFile, hadoopConf)

  private def eqFor(mp: MorFilePartition): Seq[MorScanMerge.EqMatcher] =
    if (mp.eqShards.isEmpty) Seq.empty
    else MorScanMerge.eqMatchersFor(mp.eqShards, dirtySchema, hadoopConf)

  private def eqDeadRow(eqs: Seq[MorScanMerge.EqMatcher], row: InternalRow): Boolean =
    eqs.exists(_.deadRow(row))

  private def eqDeadVec(eqs: Seq[MorScanMerge.EqMatcher], b: ColumnarBatch, i: Int): Boolean =
    eqs.exists(_.deadVec(b, i))

  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(p.asInstanceOf[MorFilePartition].delegate)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val mp = p.asInstanceOf[MorFilePartition]
    val dead = deadFor(mp)
    val eqs = eqFor(mp)
    val r = inner.createReader(mp.delegate)
    val proj = UnsafeProjection.create(perm.map(i =>
      BoundReference(i, dirtySchema(i).dataType, dirtySchema(i).nullable)).toIndexedSeq)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (r.next()) {
          val row = r.get()
          if (!dead.contains(row.getLong(idxOrd)) && !eqDeadRow(eqs, row)) {
            cur = row; return true
          }
        }
        false
      }
      override def get(): InternalRow = proj(cur)
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val mp = p.asInstanceOf[MorFilePartition]
    val dead = deadFor(mp)
    val eqs = eqFor(mp)
    val r = inner.createColumnarReader(mp.delegate)
    new PartitionReader[ColumnarBatch] {
      private var out: ColumnarBatch = _
      override def next(): Boolean = {
        while (r.next()) {
          val b = r.get()
          val n = b.numRows()
          val idx = b.column(idxOrd)
          // one pass over the row-index vector builds the selection; a
          // batch with nothing dead re-projects the inner vectors with
          // ZERO copying and zero per-access indirection (the common case
          // once most of a covered file's row groups are clean)
          val sel = new Array[Int](n)
          var k = 0
          var i = 0
          while (i < n) {
            if (!dead.contains(idx.getLong(i)) &&
                (eqs.isEmpty || !eqDeadVec(eqs, b, i))) { sel(k) = i; k += 1 }
            i += 1
          }
          if (k > 0) {
            val cols: Array[ColumnVector] =
              if (k == n) perm.map(o => b.column(o))
              else {
                val s = java.util.Arrays.copyOf(sel, k)
                perm.map(o => new SelectedColumnVector(b.column(o), s): ColumnVector)
              }
            out = new ColumnarBatch(cols, k)
            return true
          }
          // fully-dead batch: keep pulling
        }
        false
      }
      override def get(): ColumnarBatch = out
      override def close(): Unit = r.close()
    }
  }
}

/** CDC delete-side reader: emits ONLY the rows a commit's NEW delete
  * shards killed — the inverse of [[MorMergingReaderFactory]]'s filter —
  * as pre-image rows tagged with a constant `_change_type` column. This
  * is what makes a STREAMING changelog computable from per-file scans:
  * a position-delete commit's retracted rows are exactly its shard
  * positions read back from the (write-once) data file, no table diff
  * needed. `out` is the pruned output schema; fields it names that are
  * not in `dirtySchema` must be the tag column. Row-based by design —
  * CDC streams are consumed row-wise. */
final class DeadRowsReaderFactory(
    inner: PartitionReaderFactory,
    dirtySchema: StructType,
    out: StructType,
    tagCol: String,
    tag: String,
    confMap: Map[String, String],
    ridCol: Option[String] = None,
    frids: Map[String, Long] = Map.empty) extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.unsafe.types.UTF8String

  private val idxOrd = dirtySchema.fieldIndex(MorScanMerge.RowIdxCol)

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val mp = p.asInstanceOf[MorFilePartition]
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val dead = MorScanMerge.deadPositions(mp.shards, mp.relFile, conf)
    val r = inner.createReader(mp.delegate)
    val proj = UnsafeProjection.create(out.fields.map { f =>
      if (f.name == tagCol)
        Literal(UTF8String.fromString(tag), org.apache.spark.sql.types.StringType)
      else if (ridCol.contains(f.name))
        MorScanMerge.ridExpr(dirtySchema, mp.relFile, frids)
      else {
        val i = dirtySchema.fieldIndex(f.name)
        BoundReference(i, dirtySchema(i).dataType, dirtySchema(i).nullable)
      }
    }.toIndexedSeq)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (r.next()) {
          val row = r.get()
          if (dead.contains(row.getLong(idxOrd))) { cur = row; return true }
        }
        false
      }
      override def get(): InternalRow = proj(cur)
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    throw new UnsupportedOperationException("CDC delete partitions are row-based")
}

/** CDC pre-image reader for EQUALITY-delete commits (r8): emits the rows
  * a commit's NEW eq-delete shards killed — rows of the covered
  * (write-once) data files that were ALIVE at the commit's parent
  * snapshot (not position-dead, not matched by a prior eq shard) and
  * match one of the NEW shards' key tuples — tagged `delete`. This is
  * what lets a `.changes` stream serve the commits the engine's own CDC
  * apply sink writes ([[graft.streaming.EventStream.applyCdcEpoch]]'s
  * zero-scan `deleteMoREq`), so a replica table can itself be a CDC
  * source (cascaded replication). Coverage is exact because data files
  * are write-once and eq coverage is pinned at commit time to the files
  * present then — later appends are never covered. Work per partition is
  * one covered-file scan + KB-bounded shard loads, the same posture as
  * [[DeadRowsReaderFactory]]. */
final class EqDeadRowsReaderFactory(
    inner: PartitionReaderFactory,
    dirtySchema: StructType,
    out: StructType,
    tagCol: String,
    tag: String,
    confMap: Map[String, String],
    ridCol: Option[String] = None,
    frids: Map[String, Long] = Map.empty) extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.unsafe.types.UTF8String

  private val idxOrd = dirtySchema.fieldIndex(MorScanMerge.RowIdxCol)

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val mp = p.asInstanceOf[MorFilePartition]
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    // prior coverage = alive-at-parent filter; new shards = positive match
    val priorDead = MorScanMerge.deadPositions(mp.shards, mp.relFile, conf)
    val priorEqs = MorScanMerge.eqMatchersFor(mp.eqShards, dirtySchema, conf)
    val newEqs = MorScanMerge.eqMatchersFor(mp.newEqShards, dirtySchema, conf)
    val r = inner.createReader(mp.delegate)
    val proj = UnsafeProjection.create(out.fields.map { f =>
      if (f.name == tagCol)
        Literal(UTF8String.fromString(tag), org.apache.spark.sql.types.StringType)
      else if (ridCol.contains(f.name))
        MorScanMerge.ridExpr(dirtySchema, mp.relFile, frids)
      else {
        val i = dirtySchema.fieldIndex(f.name)
        BoundReference(i, dirtySchema(i).dataType, dirtySchema(i).nullable)
      }
    }.toIndexedSeq)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (r.next()) {
          val row = r.get()
          if (!priorDead.contains(row.getLong(idxOrd)) &&
              !priorEqs.exists(_.deadRow(row)) &&
              newEqs.exists(_.deadRow(row))) { cur = row; return true }
        }
        false
      }
      override def get(): InternalRow = proj(cur)
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    throw new UnsupportedOperationException("CDC delete partitions are row-based")
}

/** CDC insert-side reader: passes the inner rows through, re-projected to
  * `out` with the constant `_change_type` tag appended. */
final class TaggingReaderFactory(
    inner: PartitionReaderFactory,
    dataSchema: StructType,
    out: StructType,
    tagCol: String,
    tag: String) extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.unsafe.types.UTF8String

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = inner.createReader(p)
    val proj = UnsafeProjection.create(out.fields.map { f =>
      if (f.name == tagCol)
        Literal(UTF8String.fromString(tag), org.apache.spark.sql.types.StringType)
      else {
        val i = dataSchema.fieldIndex(f.name)
        BoundReference(i, dataSchema(i).dataType, dataSchema(i).nullable)
      }
    }.toIndexedSeq)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = r.next()
      override def get(): InternalRow = proj(r.get())
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    throw new UnsupportedOperationException("CDC insert partitions are row-based")
}

/** CDC insert-side reader for ROW-LINEAGE tables: like
  * [[TaggingReaderFactory]] but fed one-file-per-partition
  * ([[MorFilePartition]], empty shard lists) so each task can compute its
  * rows' stable `_row_id` via [[MorScanMerge.ridExpr]] — the id a
  * `readWithRowIds` of the committed snapshot would serve, emitted with
  * the insert image so a CDC consumer keys on identity from day one. */
final class RidTaggingReaderFactory(
    inner: PartitionReaderFactory,
    dirtySchema: StructType,
    out: StructType,
    tagCol: String,
    tag: String,
    ridCol: String,
    frids: Map[String, Long]) extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.expressions.Literal

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val mp = p.asInstanceOf[MorFilePartition]
    val r = inner.createReader(mp.delegate)
    val proj = UnsafeProjection.create(out.fields.map { f =>
      if (f.name == tagCol)
        Literal(UTF8String.fromString(tag), org.apache.spark.sql.types.StringType)
      else if (f.name == ridCol)
        MorScanMerge.ridExpr(dirtySchema, mp.relFile, frids)
      else {
        val i = dirtySchema.fieldIndex(f.name)
        BoundReference(i, dirtySchema(i).dataType, dirtySchema(i).nullable)
      }
    }.toIndexedSeq)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = r.next()
      override def get(): InternalRow = proj(r.get())
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    throw new UnsupportedOperationException("CDC insert partitions are row-based")
}

/** A [[ColumnVector]] view through a selection vector: output ordinal `i`
  * reads the wrapped vector's ordinal `sel(i)`. This is how a MoR-merged
  * partition stays columnar under live deletes — the Iceberg/Arrow
  * selection-vector idea applied to Spark's vectorized handoff: no
  * buffer is copied, dead rows simply become unreachable. Struct children
  * wrap lazily with the SAME selection (parquet struct children share the
  * parent's ordinals); arrays/maps delegate whole — their offsets live in
  * the returned [[ColumnarArray]]/[[ColumnarMap]] against the INNER
  * child, which stays unwrapped. Lifecycle: the inner reader owns the
  * buffers, so `close()` is a no-op. */
final class SelectedColumnVector(inner: ColumnVector, sel: Array[Int])
    extends ColumnVector(inner.dataType) {
  private[this] val childCache =
    new java.util.HashMap[Integer, SelectedColumnVector]()
  override def close(): Unit = ()
  // conservative: the selection may have dropped every null, but hasNull
  // is only a fast-path hint — isNullAt stays exact
  override def hasNull: Boolean = inner.hasNull
  override def numNulls(): Int = {
    var n = 0
    var i = 0
    while (i < sel.length) { if (inner.isNullAt(sel(i))) n += 1; i += 1 }
    n
  }
  override def isNullAt(i: Int): Boolean = inner.isNullAt(sel(i))
  override def getBoolean(i: Int): Boolean = inner.getBoolean(sel(i))
  override def getByte(i: Int): Byte = inner.getByte(sel(i))
  override def getShort(i: Int): Short = inner.getShort(sel(i))
  override def getInt(i: Int): Int = inner.getInt(sel(i))
  override def getLong(i: Int): Long = inner.getLong(sel(i))
  override def getFloat(i: Int): Float = inner.getFloat(sel(i))
  override def getDouble(i: Int): Double = inner.getDouble(sel(i))
  override def getArray(i: Int): ColumnarArray = inner.getArray(sel(i))
  override def getMap(i: Int): ColumnarMap = inner.getMap(sel(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    inner.getDecimal(sel(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String = inner.getUTF8String(sel(i))
  override def getBinary(i: Int): Array[Byte] = inner.getBinary(sel(i))
  override def getChild(ordinal: Int): ColumnVector = {
    var c = childCache.get(ordinal)
    if (c == null) {
      c = new SelectedColumnVector(inner.getChild(ordinal), sel)
      childCache.put(ordinal, c)
    }
    c
  }
}
