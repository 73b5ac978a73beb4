package graft.functions

import scala.collection.mutable
import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-kernel expressions for the dedup hot path.
  *
  * Same rationale as [[MinHashSignature]]: the declarative forms
  * (`array_distinct(transform(sequence(...), i -> array_join(slice(...))))`
  * and a 64-lane `aggregate`/`zip_with` vote fold) run as interpreted
  * per-element lambdas. These kernels do one compiled pass per row.
  * Semantics match the declarative versions exactly (q26's DuckDB oracle
  * still passes against `WordShingles` output).
  */

/** Distinct w-word shingles of a space-separated text. */
case class WordShingles(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = math.max(words.length - (w - 1), 1)
    val seen = mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i < n) {
      val end = math.min(i + w, words.length)
      seen += words.slice(i, end).mkString(" ")
      i += 1
    }
    new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** 64-bit SimHash over space-separated tokens (Charikar): bit j of the
  * result is the sign of the sum over tokens of ±1 votes from bit j of the
  * token's hash. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val b = words(i).getBytes("UTF-8")
      val h = (MurmurHash3.bytesHash(b, 0).toLong << 32) |
        (MurmurHash3.bytesHash(b, 1).toLong & 0xFFFFFFFFL)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object TextExprs {
  def wordShingles(text: Column, w: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(text), w))
  def simhash64(text: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(text)))
}
