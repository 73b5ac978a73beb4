package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Commutative 128-bit-ish table digest as a typed `Aggregator` — the
  * hardened replacement for the reference's `sum(hash(*))` checksum
  * (`/root/reference/6_verify_data_integrity.py:79-81`) that SURVEY §7
  * flags as the optional custom-aggregate upgrade.
  *
  * Buffer = (row count, wrap-around sum of 64-bit row hashes, XOR-fold of
  * bit-rotated hashes). All three lanes are commutative/associative, so the
  * aggregate is order- and partitioning-insensitive and map-side
  * combinable; JVM long arithmetic wraps (no ANSI overflow, unlike the SQL
  * `sum`). The sum lane catches multiplicity changes the XOR lane cancels
  * on; the rotated-XOR lane catches paired-value swaps the sum misses —
  * jointly far tighter than the reference's 32-bit sum at 100 TB row
  * counts.
  *
  * Input is the 64-bit row hash from [[Fingerprint.rowHash]]:
  * {{{
  *   df.select(Fingerprint.rowHash(df).as("h")).as[Long]
  *     .select(TableDigestAgg.digest128)
  * }}}
  */
final case class Digest128(count: Long, sumLane: Long, xorLane: Long)

object TableDigestAgg extends Aggregator[Long, (Long, Long, Long), Digest128] {

  override def zero: (Long, Long, Long) = (0L, 0L, 0L)

  override def reduce(b: (Long, Long, Long), h: Long): (Long, Long, Long) =
    (b._1 + 1L, b._2 + h, b._3 ^ java.lang.Long.rotateLeft(h, (h & 63L).toInt))

  override def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
    (a._1 + b._1, a._2 + b._2, a._3 ^ b._3)

  override def finish(r: (Long, Long, Long)): Digest128 = Digest128(r._1, r._2, r._3)

  override def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Digest128] = Encoders.product[Digest128]

  /** The aggregator as a TypedColumn over a Dataset[Long] of row hashes. */
  def digest128: TypedColumn[Long, Digest128] = toColumn
}
