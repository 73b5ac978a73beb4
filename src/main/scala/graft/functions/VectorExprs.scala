package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over array<float>/array<double> columns.
  *
  * The declarative `aggregate(zip_with(a, b, *), 0d, +)` form evaluates two
  * interpreted lambdas per element — at 125k candidate pairs x 64 dims x 3
  * dots per cosine that is ~50M evals (observed: 5s for the near-dup op at
  * sf0.1). One compiled loop per pair removes that; accumulation is double
  * left-to-right, matching the declarative form bit-for-bit (q27's oracle
  * margin analysis stays valid).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = isFloat(left); val bf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** All `nTables` hyperplane-LSH bucket ids of a vector in ONE eval.
  *
  * The declarative form ([[graft.ops.Similarity.lshBucket]] per table)
  * evaluates nTables x nPlanes separate [[DotProduct]] calls per row — 64
  * expression evals, each re-reading the vector through ArrayData. This
  * kernel reads the vector once and runs the whole plane bank in a tight
  * loop over a precomputed component table (~32 KB at 8x8x64 — built once
  * per executor, not per row).
  *
  * Bit-identical to the declarative form: components come from the same
  * [[graft.ops.Similarity.planeComponent]] integer mix, and each projection
  * accumulates x*y left-to-right in double exactly like [[DotProduct]], so
  * the bucket signs — and therefore the q28/q31 DuckDB oracle replays —
  * are unchanged.
  */
case class HyperplaneBuckets(child: Expression, dim: Int, nPlanes: Int, nTables: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // planes(t*nPlanes + j)(i) == Similarity.planeComponent(t, j, i, dim, nPlanes)
  @transient private lazy val planeTable: Array[Array[Double]] =
    Array.tabulate(nTables * nPlanes) { tj =>
      Array.tabulate(dim) { i =>
        var h = tj.toLong * dim + i + 1L
        h = ((h ^ (h >>> 15)) * 486187739L) & 0xFFFFFFFFL
        h = ((h ^ (h >>> 13)) * 368040263L) & 0xFFFFFFFFL
        h = h ^ (h >>> 16)
        h.toDouble / 4294967296.0 - 0.5
      }
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val isFloat = childIsFloat
    val n = math.min(a.numElements(), dim)
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < nPlanes) {
        val p = planeTable(t * nPlanes + j)
        var acc = 0.0
        i = 0
        while (i < n) { acc += v(i) * p(i); i += 1 }
        if (acc >= 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = java.lang.Long.valueOf(bucket)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object VectorExprs {
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def hyperplaneBuckets(vec: Column, dim: Int, nPlanes: Int, nTables: Int): Column =
    GraftColumnBridge.column(
      HyperplaneBuckets(GraftColumnBridge.expression(vec), dim, nPlanes, nTables))
}
