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
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

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
  *  - the whole scan degrades to ROW-based reads while deletes are live
  *    (Spark requires uniform columnar support across a batch, and a
  *    filtered partition cannot cheaply emit ColumnarBatch) — the parquet
  *    reader is still vectorized inside, only the columnar handoff is
  *    lost; compact() restores it. Equality deletes keep the logical
  *    rewrite (their key columns need not be in the read schema).
  */
object MorScanMerge {
  /** Spark's reserved temporary column name: a NULLABLE BIGINT field of
    * this name in a parquet read schema is filled with each row's file
    * ordinal by the readers themselves
    * (`ParquetRowIndexUtil.findRowIndexColumnIndexInSchema`). */
  val RowIdxCol = "_tmp_metadata_row_index"

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
    * too (empty shard list = nothing dead). */
  def perFilePartitions(parts: Array[InputPartition], rootPrefix: String,
      shardsFor: String => Seq[String]): Array[InputPartition] =
    parts.flatMap {
      case fp: FilePartition =>
        fp.files.groupBy(_.filePath.toPath.toUri.getPath).toSeq.sortBy(_._1)
          .map { case (abs, fs) =>
            val rel = abs.stripPrefix(rootPrefix)
            MorFilePartition(rel, shardsFor(rel), FilePartition(fp.index, fs))
          }
      case other =>
        throw new IllegalStateException(
          s"expected FilePartition from the parquet batch, got ${other.getClass}")
    }
}

/** One covered file's chunk(s): the delegate partition reads this file
  * only, and `shards` are the delete-shard parquet files whose `covers`
  * include it. */
final case class MorFilePartition(relFile: String, shards: Seq[String],
    delegate: InputPartition) extends InputPartition {
  override def preferredLocations(): Array[String] = delegate.preferredLocations()
}

/** Reader factory applying position deletes in-task: reads the row-idx
  * sub-scan's rows, drops rows whose index is dead, projects the output
  * back to the scan's visible column order (`perm` maps output ordinal to
  * sub-scan ordinal). `confMap` rebuilds a hadoop Configuration task-side
  * (Configuration itself is not serializable). */
final class MorMergingReaderFactory(
    inner: PartitionReaderFactory,
    dirtySchema: StructType,
    outNames: Array[String],
    confMap: Map[String, String]) extends PartitionReaderFactory {

  private val idxOrd = dirtySchema.fieldIndex(MorScanMerge.RowIdxCol)
  private val perm = outNames.map(dirtySchema.fieldIndex)

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val mp = p.asInstanceOf[MorFilePartition]
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val dead = MorScanMerge.deadPositions(mp.shards, mp.relFile, conf)
    val r = inner.createReader(mp.delegate)
    val proj = UnsafeProjection.create(perm.map(i =>
      BoundReference(i, dirtySchema(i).dataType, dirtySchema(i).nullable)).toIndexedSeq)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (r.next()) {
          val row = r.get()
          if (!dead.contains(row.getLong(idxOrd))) { cur = row; return true }
        }
        false
      }
      override def get(): InternalRow = proj(cur)
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    throw new UnsupportedOperationException("MoR-merged partitions are row-based")
}

/** Forces row-based reads on a stock factory — the uniform-columnar rule:
  * a batch mixing merged (row-only) and clean partitions must report
  * row-based support everywhere; the parquet reader stays vectorized
  * internally, only the columnar handoff is dropped. */
final case class RowOnlyReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = false
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    inner.createReader(p)
  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    throw new UnsupportedOperationException("row-only factory")
}
