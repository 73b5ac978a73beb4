package graft.catalog

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-column min/max statistics carried in the snapshot summary
  * (`min.<col>` / `max.<col>` keys) — the Iceberg-manifest-stats idea:
  * computed in the SAME `Observation` pass as the commit's row count, so
  * they cost zero extra scans, and served back by
  * [[graft.catalog.spark.MetadataCountRule]] for unfiltered min/max/count
  * aggregates (an O(1) log lookup instead of a 100-TB scan).
  *
  * Only types with engine-stable canonical string round-trips participate:
  * integrals, float/double (`toString` round-trips exactly), and strings
  * (compared in UTF-8 binary order, matching Spark's ordering). A column
  * with all-null data simply has no stat (min/max ignore nulls).
  */
object ColumnStats {

  def statable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case FloatType | DoubleType => true
    case StringType => true
    case _ => false
  }

  /** Observation metrics (`min.<col>` / `max.<col>` rows) -> summary keys.
    * Null metrics (empty or all-null input) are dropped. */
  def fromMetrics(cols: Seq[String], metrics: Map[String, Any]): Map[String, String] =
    cols.flatMap { c =>
      Seq(s"min.$c", s"max.$c").flatMap { k =>
        metrics.get(k) match {
          case Some(v) if v != null => Some(k -> v.toString)
          case _ => None
        }
      }
    }.toMap

  /** Merge the previous snapshot's stats with a fresh append's: an append
    * snapshot still references the previous files, so its bounds are the
    * union's. A bound present on only ONE side survives only when the other
    * side provably has no values: prev empty, prev all-null for the column
    * (`nullcol.<col>` provenance recorded by `evolveSchema` — old files
    * null-fill an evolved column), or the fresh frame all-null. A previous
    * snapshot WITH rows but WITHOUT a recorded stat or provenance yields no
    * stat (a stale bound would be silently wrong). The `nullcol` marker is
    * carried forward while the column still has no values anywhere and
    * dropped the moment a bound exists (the bound supersedes it). */
  def merge(prevSummary: Map[String, String], fresh: Map[String, String],
      schema: StructType, prevRowCount: Long): Map[String, String] = {
    val cols = schema.fields.filter(f => statable(f.dataType))
    cols.flatMap { f =>
      val prevAllNull = prevSummary.contains("nullcol." + f.name)
      val bounds = Seq(("min." + f.name, true), ("max." + f.name, false)).flatMap {
        case (k, isMin) =>
          (prevSummary.get(k), fresh.get(k)) match {
            case (Some(p), Some(n)) =>
              val takeP = if (isMin) !gt(f.dataType, p, n) else gt(f.dataType, p, n)
              Some(k -> (if (takeP) p else n))
            case (None, Some(n)) if prevRowCount == 0 || prevAllNull => Some(k -> n)
            case (Some(p), None) => Some(k -> p) // fresh frame all-null for the col
            case _ => None
          }
      }
      val marker =
        if (prevAllNull && bounds.isEmpty) Seq(("nullcol." + f.name) -> "true")
        else Seq.empty
      bounds ++ marker
    }.toMap
  }

  /** Snapshot-level stats for a PARTIAL-REWRITE commit (prune-aware
    * delete/update): the carried files' exact per-file footer bounds fold
    * with the rewrite's fresh Observation stats.
    *
    * Numeric bounds only: parquet footer bounds for binary/string columns
    * may be writer-truncated — valid as outer bounds for pruning, but the
    * snapshot summary serves min/max as EXACT answers
    * (MetadataCountRule), so strings get no summary stats on these
    * commits. A carried file missing a numeric bound must be provably
    * all-null for the column (nulls == rows) or the column's stats are
    * dropped. */
  def mergeWithFileBounds(fresh: Map[String, String], carryFiles: Seq[String],
      fileStats: Map[String, Map[String, String]], schema: StructType): Map[String, String] = {
    val perFile = carryFiles.map(fileStats.get)
    val allCarriedHaveStats = !perFile.exists(_.isEmpty)
    val ms = perFile.flatten
    def provablyAllNull(m: Map[String, String], col: String): Boolean =
      (m.get(s"nulls.$col"), m.get("rows")) match {
        case (Some(n), Some(r)) => n == r
        case _ => false
      }
    schema.fields.filter(f => statable(f.dataType)).flatMap { f =>
      if (!allCarriedHaveStats) Seq.empty // a carried file without stats
      else if (f.dataType == StringType) {
        // footer string bounds may be writer-truncated: never serve them as
        // exact — but DO carry the provable-all-null marker, so a later
        // append can still adopt its fresh bounds as exact
        if (!fresh.contains(s"min.${f.name}") && ms.forall(provablyAllNull(_, f.name)))
          Seq(s"nullcol.${f.name}" -> "true")
        else Seq.empty
      } else {
        val allNullOk = ms.forall { m =>
          (m.contains(s"min.${f.name}") && m.contains(s"max.${f.name}")) ||
            provablyAllNull(m, f.name)
        }
        if (!allNullOk) Seq.empty
        else {
          val mins = ms.flatMap(_.get(s"min.${f.name}")) ++ fresh.get(s"min.${f.name}")
          val maxs = ms.flatMap(_.get(s"max.${f.name}")) ++ fresh.get(s"max.${f.name}")
          val minOut = mins.reduceOption((a, b) => if (gt(f.dataType, a, b)) b else a)
          val maxOut = maxs.reduceOption((a, b) => if (gt(f.dataType, a, b)) a else b)
          val bounds = minOut.map(s"min.${f.name}" -> _).toSeq ++
            maxOut.map(s"max.${f.name}" -> _)
          // numeric column provably empty everywhere -> keep provenance
          if (bounds.isEmpty && ms.forall(provablyAllNull(_, f.name)))
            Seq(s"nullcol.${f.name}" -> "true")
          else bounds
        }
      }
    }.toMap
  }

  /** a > b under the column type's ordering (Spark semantics: NaN sorts
    * LARGEST — primitive `>` would return false for NaN and silently flip
    * merged bounds, so floats compare via java.lang.Double.compare).
    * Shared with [[FileStats]]' footer-bound folding. */
  private[catalog] def gt(dt: DataType, a: String, b: String): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => a.toLong > b.toLong
    case FloatType | DoubleType => java.lang.Double.compare(a.toDouble, b.toDouble) > 0
    case StringType =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) > 0
    case other => throw new IllegalArgumentException(s"no ordering for $other")
  }

  /** Canonical string -> Catalyst INTERNAL value of the column type (for
    * LocalRelation rows in the optimizer rewrite). */
  def internalValue(dt: DataType, s: String): Option[Any] = dt match {
    case ByteType    => Some(s.toByte)
    case ShortType   => Some(s.toShort)
    case IntegerType => Some(s.toInt)
    case LongType    => Some(s.toLong)
    case FloatType   => Some(s.toFloat)
    case DoubleType  => Some(s.toDouble)
    case StringType  => Some(UTF8String.fromString(s))
    case _           => None
  }
}
