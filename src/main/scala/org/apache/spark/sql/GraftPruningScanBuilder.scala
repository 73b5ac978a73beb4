package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A [[ScanBuilder]] that adds FILE-LEVEL data skipping in front of Spark's
  * stock parquet scan: pushed-down filters are evaluated against per-file
  * footer stats (recorded in the snapshot log at commit time) and files
  * that provably cannot match are dropped from the scan's file list BEFORE
  * any task is planned — Iceberg-manifest pruning, one tier above parquet's
  * executor-side row-group skipping.
  *
  * Lives in this package because [[SupportsPushDownCatalystFilters]] (the
  * interface `FileScanBuilder` uses for V2 filter pushdown) is
  * `private[sql]`; same convention as [[GraftColumnBridge]]. Everything
  * else delegates to the real [[ParquetTable]] scan builder over the
  * pruned file list, so pushdown, column pruning, vectorization and codegen
  * are exactly the stock parquet path.
  *
  * `files` maps each absolute file path to its recorded stats (None when
  * the committing writer had none — those files are always scanned).
  * `mayMatch(stats, conjuncts)` is the conservative skip test
  * (graft.catalog.FileStats.mayMatch over every conjunct).
  */
/** Bridge-side helper: build a pushed-down, column-pruned parquet Batch
  * over an explicit file list (the per-bucket sub-scans of
  * graft.catalog.spark.BucketedScan — [[SupportsPushDownCatalystFilters]]
  * is `private[sql]`, so the replay of pushed filters must happen here). */
object GraftScanUtils {
  /** Pushed-down, column-pruned stock parquet [[Scan]] over an explicit
    * file list — the building block for per-bucket sub-scans AND per-dir
    * union scans (partitioned tables spanning several snapshot dirs). */
  def parquetScanFor(spark: SparkSession, name: String, files: Seq[String],
      schema: StructType, options: CaseInsensitiveStringMap,
      pushed: Seq[Expression],
      required: Option[StructType]): Scan = {
    val builder = ParquetTable(name, spark, options, files, Some(schema),
      classOf[ParquetFileFormat]).newScanBuilder(options)
    builder.asInstanceOf[SupportsPushDownCatalystFilters].pushFilters(pushed)
    required.foreach(builder.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns)
    builder.build()
  }

  def parquetBatchFor(spark: SparkSession, name: String, files: Seq[String],
      schema: StructType, options: CaseInsensitiveStringMap,
      pushed: Seq[Expression],
      required: Option[StructType]): org.apache.spark.sql.connector.read.Batch =
    parquetScanFor(spark, name, files, schema, options, pushed, required).toBatch
}

class GraftPruningScanBuilder(
    spark: SparkSession,
    tableName: String,
    files: Seq[(String, Option[Map[String, String]])],
    schema: StructType,
    options: CaseInsensitiveStringMap,
    mayMatch: (Map[String, String], Seq[Expression]) => Boolean,
    // (scan, keptFiles, pushedFilters, requiredSchema) — lets wrappers
    // (bucketed scans, per-dir union scans) rebuild sub-scans WITHOUT
    // losing the file pruning and pushdown this builder computed
    wrapScan: (Scan, Seq[String], Seq[Expression], Option[StructType]) => Scan =
      (s, _, _, _) => s,
    // restricts which files the INNER (template) builder is constructed
    // over — a partitioned table spanning several snapshot dirs has no
    // single basePath, so its template builds over one dir's files (it only
    // negotiates pushdown/pruning and provides readSchema) while wrapScan
    // receives the FULL kept list to assemble per-dir sub-scans
    planFiles: Seq[String] => Seq[String] = identity,
    // report EVERY filter as a post-scan residual. Required when snapshot
    // dirs have MIXED layouts (hive-laid appends + flat rewrite dirs): a
    // hive-laid template would report partition filters as consumed, but a
    // flat sub-scan stores the partition column in file CONTENT and can
    // only apply the filter advisorily — Spark must keep exact evaluation
    // above the scan (which also keeps the filter's columns in the read
    // schema). Sub-scans still consume the pushed filters internally for
    // partition-dir pruning and row-group skipping.
    allResidual: Boolean = false,
    // path-level skip test, computed once per build from the pushed
    // conjuncts (bucketed tables prune whole __bucket=b/ dirs on
    // bucket-key equality — graft.catalog.BucketPruning)
    keepByPath: Seq[Expression] => String => Boolean = _ => _ => true)
  extends ScanBuilder
  with SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns {

  private var pushedExprs: Seq[Expression] = Nil
  private var required: Option[StructType] = None

  private def mkInner(paths: Seq[String]) =
    ParquetTable(tableName, spark, options, paths, Some(schema), classOf[ParquetFileFormat])
      .newScanBuilder(options)

  // answers the pushdown protocol over the plannable file list (cheap: file
  // index construction only); the pruned builder is built at build() time,
  // when all conjuncts are known
  private lazy val probe = mkInner(planFiles(files.map(_._1)))

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushedExprs = filters
    val residual = probe.asInstanceOf[SupportsPushDownCatalystFilters].pushFilters(filters)
    if (allResidual) filters else residual
  }

  override def pushedFilters(): Array[Predicate] =
    probe.asInstanceOf[SupportsPushDownCatalystFilters].pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = Some(requiredSchema)
  }

  override def build(): Scan = {
    val pathOk = keepByPath(pushedExprs)
    val kept = files.collect {
      case (p, st) if pathOk(p) && st.forall(m => mayMatch(m, pushedExprs)) => p
    }
    val inner = mkInner(planFiles(kept))
    inner.asInstanceOf[SupportsPushDownCatalystFilters].pushFilters(pushedExprs)
    required.foreach(inner.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns)
    wrapScan(inner.build(), kept, pushedExprs, required)
  }
}
