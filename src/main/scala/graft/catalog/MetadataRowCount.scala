package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Exact row counts WITHOUT a Spark job, where metadata can serve them:
  * a snapcat table answers from its snapshot log (O(1)); a bare parquet
  * scan answers from file footers (one KB-sized metadata read per file,
  * driver-side, bounded). Callers that need a size parameter — e.g.
  * [[graft.ops.Similarity.ivfTopK]]'s derived training-sample rate —
  * check here first and fall back to a distributed `count()` only when
  * metadata cannot answer. */
object MetadataRowCount {

  /** Past this many files the driver-side footer loop costs more than the
    * distributed count it replaces — let the caller run the job. */
  private val MaxFooterFiles = 4096

  def exact(df: DataFrame): Option[Long] = {
    // cardinality-preserving wrappers don't change the count
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case Project(exprs, child) if exprs.forall(_.deterministic) => strip(child)
      case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => strip(a.child)
      case other => other
    }
    // the ANALYZED plan: both relation flavors are still bare there (the
    // optimizer rewrites V2 relations into scan relations), and any
    // cardinality-changing operator (Filter, Limit, ...) is visibly in
    // the way so strip() stops and we decline
    strip(df.queryExecution.analyzed) match {
      case r: DataSourceV2Relation => r.table match {
        case h: graft.catalog.spark.HasRecordCount if h.recordCount >= 0 =>
          // reader-option time travel redirects the scan to another
          // snapshot while the Table keeps current-state stats
          val redirected = r.options != null &&
            (r.options.containsKey("snapshot-id") ||
              r.options.containsKey("as_of_snapshot_id"))
          if (redirected) None else Some(h.recordCount)
        case _ => None
      }
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] &&
            fs.location.inputFiles.length <= MaxFooterFiles =>
          val conf = df.sparkSession.sessionState.newHadoopConf()
          try Some(fs.location.inputFiles.iterator.map(f =>
            FileStats.rowCountFromFooter(new org.apache.hadoop.fs.Path(f), conf)).sum)
          catch { case _: Exception => None } // unreadable footer -> let the job decide
        case _ => None
      }
      case _ => None
    }
  }
}
