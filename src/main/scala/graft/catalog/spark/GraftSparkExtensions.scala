package graft.catalog.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan

/** Table implementations that can answer an exact row count from metadata. */
trait HasRecordCount {
  /** Exact current row count, or -1 if unknown. */
  def recordCount: Long
}

/** Metadata-served `count(*)`: rewrites an unfiltered, ungrouped COUNT over
  * a snapcat table into a literal row from the snapshot log — the Iceberg
  * manifest-count optimization (SURVEY §4: the reference leans on Iceberg
  * serving `count()` from metadata at `5_migrate_tables_data.py:76`,
  * `6_verify_data_integrity.py:74-75`). At 100 TB this turns a full scan
  * into an O(1) log lookup.
  *
  * Deliberately surgical: fires only when
  *   - the aggregate has NO grouping expressions,
  *   - EVERY output is an alias of `count(1)`/`count(*)` (no distinct, no
  *     filter clause),
  *   - the child is a BARE [[DataSourceV2Relation]] over a table exposing
  *     [[HasRecordCount]] with a known count — any Filter/Project in
  *     between means the count is no longer the table count, so the rule
  *     leaves the plan alone.
  */
object MetadataCountRule extends Rule[LogicalPlan] {

  private def isCountStar(e: AggregateExpression): Boolean = e match {
    case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // NOTE: guard-style match — `Aggregate(Nil, ...)` would silently never
    // fire (groupingExpressions is an empty ArraySeq in the optimizer, and
    // the `Nil` pattern only matches scala.Nil).
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
          agg.aggregateExpressions.forall {
            case Alias(ae: AggregateExpression, _) => isCountStar(ae)
            case _ => false
          } =>
      metadataCount(agg.child) match {
        case Some(n) =>
          LocalRelation(agg.output.map(_.toAttribute),
            Seq(InternalRow(Seq.fill(agg.aggregateExpressions.size)(n): _*)))
        case None => agg
      }
  }

  /** The table's metadata count, ONLY when the child is provably the whole
    * table: a bare relation, or a scan relation whose scan carries zero
    * pushed/partition/data filters (a consumed partition filter would make
    * the table count wrong). */
  private def metadataCount(child: LogicalPlan): Option[Long] = {
    def fromRelation(rel: DataSourceV2Relation): Option[Long] = {
      // reader options can redirect the SCAN to another snapshot
      // (spark.read.option("snapshot-id", ...)); the Table object still
      // carries the CURRENT snapshot's count — never serve it then.
      val redirected = rel.options != null &&
        (rel.options.containsKey("snapshot-id") || rel.options.containsKey("as_of_snapshot_id"))
      rel.table match {
        case h: HasRecordCount if !redirected && h.recordCount >= 0 => Some(h.recordCount)
        case _ => None
      }
    }
    child match {
      // projections never change cardinality (ColumnPruning inserts one
      // under the aggregate inside the same optimizer batch) — look through
      case Project(_, grandchild) => metadataCount(grandchild)
      case rel: DataSourceV2Relation => fromRelation(rel)
      case DataSourceV2ScanRelation(rel, scan: ParquetScan, _, _, _)
          if scan.pushedFilters.isEmpty && scan.partitionFilters.isEmpty &&
            scan.dataFilters.isEmpty =>
        fromRelation(rel)
      case _ => None
    }
  }
}

/** Session extensions entry point:
  * `spark.sql.extensions=graft.catalog.spark.GraftSparkExtensions`. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => MetadataCountRule)
}
