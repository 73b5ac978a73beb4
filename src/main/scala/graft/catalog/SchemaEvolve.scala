package graft.catalog

import org.apache.spark.sql.types._

/** Schema-evolution shape rewrites shared by the SQL `ALTER TABLE` surface
  * and library callers: nested-path ADD/DROP COLUMN and safe type
  * WIDENING. Pure `StructType -> StructType` functions with loud
  * validation — committing the result is
  * [[SnapshotCatalog.evolveSchema]]'s job (a pure pointer commit either
  * way: no data file is touched by any of these).
  *
  * The reference captures schemas but never evolves them
  * (`/root/reference/2_collect_database_schema_info.py:173-235` records
  * the string rendering only); semantics here follow Iceberg's
  * schema-evolution rules re-expressed for name-based column mapping. */
object SchemaEvolve {

  /** Type changes the vectorized parquet reader serves WITHOUT rewriting
    * old files (scan-time upcast): the integer family upward,
    * float->double, int-family->double, and decimal PRECISION growth at
    * unchanged scale. Everything else — narrowing, string/numeric
    * crossings, scale changes — would corrupt or break old-file reads and
    * is refused. */
  def isSafeWidening(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (ByteType | ShortType | IntegerType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) => b.scale == a.scale && b.precision > a.precision
    case _ => false
  }

  /** ADD COLUMN at `path` (nested structs supported: `a.b.c` adds `c`
    * inside struct `a.b`). Added columns are nullable by construction —
    * pre-evolution files null-fill them, nested or not. */
  def addAt(schema: StructType, path: Seq[String], dt: DataType): StructType =
    rewriteAt(schema, path, "ADD COLUMN") { (st, leaf) =>
      require(!st.fieldNames.contains(leaf),
        s"column already exists: ${path.mkString(".")}")
      st.add(StructField(leaf, dt, nullable = true))
    }

  /** DROP COLUMN at `path`. Safe under name-based mapping (readers simply
    * never project the dropped pages); a struct must keep at least one
    * field (parquet cannot represent an empty group). */
  def dropAt(schema: StructType, path: Seq[String]): StructType =
    rewriteAt(schema, path, "DROP COLUMN") { (st, leaf) =>
      require(st.fieldNames.contains(leaf), s"no such column: ${path.mkString(".")}")
      val rest = st.fields.filterNot(_.name == leaf)
      require(rest.nonEmpty,
        s"cannot drop '${path.mkString(".")}': it is the last field at that level")
      StructType(rest)
    }

  /** ALTER COLUMN TYPE at `path`, widening promotions only
    * ([[isSafeWidening]]). */
  def widenAt(schema: StructType, path: Seq[String], to: DataType): StructType =
    rewriteAt(schema, path, "ALTER COLUMN TYPE") { (st, leaf) =>
      require(st.fieldNames.contains(leaf), s"no such column: ${path.mkString(".")}")
      val idx = st.fieldIndex(leaf)
      val from = st.fields(idx).dataType
      require(isSafeWidening(from, to),
        s"unsafe type change for ${path.mkString(".")}: ${from.sql} -> ${to.sql} " +
          "(supported: byte/short/int upward to long, float->double, " +
          "byte/short/int->double, decimal precision growth at same scale)")
      StructType(st.fields.updated(idx, st.fields(idx).copy(dataType = to)))
    }

  private def rewriteAt(schema: StructType, path: Seq[String], what: String)(
      leafOp: (StructType, String) => StructType): StructType = {
    require(path.nonEmpty, s"$what: empty field path")
    path match {
      case Seq(leaf) => leafOp(schema, leaf)
      case head +: rest =>
        require(schema.fieldNames.contains(head), s"no such column: $head")
        val idx = schema.fieldIndex(head)
        schema.fields(idx).dataType match {
          case inner: StructType =>
            StructType(schema.fields.updated(idx,
              schema.fields(idx).copy(dataType = rewriteAt(inner, rest, what)(leafOp))))
          case other => throw new IllegalArgumentException(
            s"$what: ${path.mkString(".")} - '$head' is not a struct (${other.sql})")
        }
    }
  }
}
