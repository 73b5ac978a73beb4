package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization kernels (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search" — the FAISS IVF-PQ design, implemented
  * freshly against Spark's expression interfaces).
  *
  * A d-dim vector splits into `m` subspaces; each subspace is vector-
  * quantized against its own 256-entry codebook, so a corpus vector
  * stores as m BYTES instead of d floats — at d=64/m=8 that is 32x less
  * candidate-scan IO, the property that makes the IVF-PQ candidate pass
  * byte-bound rather than vector-bound at 10^9+ rows. Queries score
  * candidates by ASYMMETRIC distance: one per-query lookup table of
  * m x 256 partial dot products, then per candidate just m table reads —
  * no float vector is touched until the exact re-rank of the shortlist.
  *
  * Same kernel discipline as [[DotProduct]]/[[HyperplaneBuckets]]:
  * compiled JVM loops (CodegenFallback), one ArrayData read per row,
  * codebooks held as an executor-local table, never per-row allocation
  * beyond the output. Codebooks ride the expression as a flat constant
  * (m*256*dsub doubles — ~1 MB at the defaults, broadcast with the plan).
  */
object PqExprs {

  /** Flat codebook container: entry(j, c, i) = books(((j*256)+c)*dsub+i).
    * Flattening keeps the expression's constant a single primitive array
    * (cheap to serialize with the plan, cache-friendly in the loops). */
  final case class Codebooks(m: Int, dsub: Int, flat: Array[Double]) {
    require(flat.length == m * 256 * dsub,
      s"codebook shape mismatch: ${flat.length} != $m*256*$dsub")
  }

  def codebooksOf(books: Seq[Seq[Array[Double]]]): Codebooks = {
    val m = books.size
    val dsub = books.head.head.length
    val flat = new Array[Double](m * 256 * dsub)
    var j = 0
    while (j < m) {
      val bj = books(j)
      require(bj.size <= 256, s"subspace $j has ${bj.size} centroids (>256)")
      var c = 0
      while (c < bj.size) {
        System.arraycopy(bj(c), 0, flat, ((j * 256) + c) * dsub, dsub)
        c += 1
      }
      // unused tail entries stay 0 and are never emitted by encode
      // (argmin runs over bj.size only) nor read by ADC (codes < bj.size)
      j += 1
    }
    Codebooks(m, dsub, flat)
  }

  private[functions] def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Encode a vector to its m-byte PQ code: byte j = argmin over the j-th
  * codebook of the sub-vector L2 distance (ties -> lowest code, same rule
  * as the coarse quantizer). `nCents` bounds the argmin when a codebook
  * trained with fewer than 256 centroids. */
case class PqEncode(child: Expression, books: PqExprs.Codebooks, nCents: Int)
    extends UnaryExpression with CodegenFallback {
  import PqExprs._

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val isF = isFloatArr(child)
    val m = books.m; val dsub = books.dsub; val flat = books.flat
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < nCents) {
        val off = ((j * 256) + c) * dsub
        var d = 0.0; var i = 0
        while (i < dsub) {
          val x = readDouble(a, isF, base + i) - flat(off + i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  private def readDouble(a: ArrayData, isF: Boolean, i: Int): Double =
    if (isF) a.getFloat(i).toDouble else a.getDouble(i)

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-QUERY ADC lookup table: lut[j*256 + c] = dot(query_subvec_j,
  * codebook_j_c). Built once per query row (m*256*dsub mults), amortized
  * over every candidate the query scores. */
case class PqLut(child: Expression, books: PqExprs.Codebooks)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val isF = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val m = books.m; val dsub = books.dsub; val flat = books.flat
    val out = new Array[Any](m * 256)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var c = 0
      while (c < 256) {
        val off = ((j * 256) + c) * dsub
        var acc = 0.0; var i = 0
        while (i < dsub) {
          val x = if (isF) a.getFloat(base + i).toDouble else a.getDouble(base + i)
          acc += x * flat(off + i)
          i += 1
        }
        out(j * 256 + c) = java.lang.Double.valueOf(acc)
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Asymmetric distance: approx dot(query, candidate) = sum of m table
  * lookups — the per-candidate cost PQ buys (m adds vs d mults). */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(code: Any, lut: Any): Any = {
    val c = code.asInstanceOf[Array[Byte]]
    val t = lut.asInstanceOf[ArrayData]
    var acc = 0.0
    var j = 0
    while (j < c.length) {
      acc += t.getDouble(j * 256 + (c(j) & 0xFF))
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  def pqEncode(vec: Column, books: PqExprs.Codebooks, nCents: Int): Column =
    GraftColumnBridge.column(
      PqEncode(GraftColumnBridge.expression(vec), books, nCents))
  def pqLut(vec: Column, books: PqExprs.Codebooks): Column =
    GraftColumnBridge.column(PqLut(GraftColumnBridge.expression(vec), books))
  def pqAdc(code: Column, lut: Column): Column =
    GraftColumnBridge.column(
      PqAdc(GraftColumnBridge.expression(code), GraftColumnBridge.expression(lut)))
}
