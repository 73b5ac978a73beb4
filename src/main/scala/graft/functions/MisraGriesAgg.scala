package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter SKETCH as a typed, MERGEABLE aggregate —
  * O(c) state per partition however large the stream, map-side
  * combinable, one scan.
  *
  * Invariant (the classic frequent-items guarantee): after summarizing a
  * stream of n items with c counters, every item with true count
  * > n/(c+1) is PRESENT in the sketch, and each surviving counter
  * understates its true count by at most n/(c+1). The merge keeps the
  * guarantee additive (Agarwal et al., "Mergeable Summaries"): counter
  * maps add, then the (c+1)-th largest value is subtracted from all —
  * the same "cancel one unit of c+1 distinct items" argument as the
  * streaming decrement, so error bounds sum across merged partials.
  *
  * The sketch also carries the exact stream length n (its own lane), so
  * one pass yields both the candidate set and the threshold — see
  * [[graft.ops.HeavyHitters]] for the exact two-pass composition.
  */
final case class MgSummary(n: Long, items: Map[String, Long])

final class MisraGriesAgg[I](c: Int, item: I => String)
    extends Aggregator[I, (Long, mutable.HashMap[String, Long]), MgSummary] {
  require(c > 0, s"counter capacity must be positive, got $c")

  override def zero: (Long, mutable.HashMap[String, Long]) =
    (0L, mutable.HashMap.empty[String, Long])

  override def reduce(b: (Long, mutable.HashMap[String, Long]),
      in: I): (Long, mutable.HashMap[String, Long]) = {
    val it = item(in)
    val m = b._2
    m.get(it) match {
      case Some(v) => m.update(it, v + 1L)
      case None if m.size < c => m.update(it, 1L)
      case None =>
        // decrement-all: one unit of the new item cancels against one
        // unit of each of the c tracked items. O(c), but each pass
        // removes c+1 units of total count, so the amortized cost over
        // the stream is O(1) per item.
        val dead = List.newBuilder[String]
        m.foreachEntry { (k, v) => if (v == 1L) dead += k else m.update(k, v - 1L) }
        dead.result().foreach(m.remove)
    }
    (b._1 + 1L, m)
  }

  override def merge(a: (Long, mutable.HashMap[String, Long]),
      b: (Long, mutable.HashMap[String, Long])): (Long, mutable.HashMap[String, Long]) = {
    val (small, big) = if (a._2.size <= b._2.size) (a._2, b._2) else (b._2, a._2)
    small.foreachEntry { (k, v) => big.update(k, big.getOrElse(k, 0L) + v) }
    if (big.size > c) {
      // subtract the (c+1)-th largest count from every counter: at most
      // c strictly-larger survivors remain, and the subtraction is the
      // merged form of the decrement (guarantee-preserving)
      val d = big.values.toArray.sorted(Ordering[Long].reverse).apply(c)
      val dead = List.newBuilder[String]
      big.foreachEntry { (k, v) => if (v <= d) dead += k else big.update(k, v - d) }
      dead.result().foreach(big.remove)
    }
    (a._1 + b._1, big)
  }

  override def finish(r: (Long, mutable.HashMap[String, Long])): MgSummary =
    MgSummary(r._1, r._2.toMap)

  override def bufferEncoder: Encoder[(Long, mutable.HashMap[String, Long])] =
    Encoders.tuple(Encoders.scalaLong, Encoders.kryo[mutable.HashMap[String, Long]])

  override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
}
