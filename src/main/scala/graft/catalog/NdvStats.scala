package graft.catalog

import java.nio.file.{Files, Path}
import java.util.Base64

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.types._

/** Per-column NDV (distinct-count) sketches — the optimizer's missing
  * cardinality input.
  *
  * CBO's join ordering and selectivity math runs on `distinctCount`; the
  * snapshot summary already serves exact rows/min/max/nullCount, but NDV
  * is not computable from footer stats — it needs the VALUES. The classic
  * answers are a full-table `ANALYZE` (Iceberg: a Puffin theta-sketch
  * blob written by `analyze_table`) or nothing. This module does the
  * Iceberg design one better for append-mostly tables: HLL sketches are
  * MERGEABLE, so each commit sketches only its NEW rows — riding the very
  * Observation pass the commit already runs for min/max, ZERO extra scan
  * — and unions with the parent snapshot's sketch. A 100-TB table's NDV
  * stays current for the cost of sketching each day's increment.
  *
  * Storage: the union lives as a write-once JSON sidecar
  * (`ndv/s<id>.json`, col -> base64 sketch, a few KB per column at the
  * default lgK=12 / ~1.6% standard error); the snapshot summary carries
  * only the integer estimates (`ndv.<col>`) plus `ndv.snapshot`, the
  * snapshot whose sidecar holds the current union. Planning reads the
  * summary — never the sidecar, never the lake.
  *
  * Exactness discipline (what a carried estimate MEANS):
  *  - append/compact/overwrite: estimate reflects exactly the live rows
  *    (compact and overwrite re-observe the full state, so they also
  *    RESET any accumulated overcount);
  *  - row-level deletes carry the estimate — an upper bound (HLL cannot
  *    subtract), the safe direction for CBO;
  *  - MoR updates/merges write values the union never saw, so their
  *    commits carry a possibly-stale estimate with `ndv.snapshot` still
  *    naming the last sketched snapshot — `analyze_ndv` (one scan of the
  *    MERGED live rows) refreshes;
  *  - a table armed mid-history has no parent sketch to union with:
  *    appends skip NDV (absent beats silently-undercounted) until
  *    `analyze_ndv` bootstraps the sidecar.
  */
object NdvStats {
  val PropCols = "write.ndv.columns"
  val PropLgK = "write.ndv.lgk"
  val DefaultLgK = 12

  def columnsOf(properties: Map[String, String]): Seq[String] =
    properties.get(PropCols).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  def lgKOf(properties: Map[String, String]): Int =
    properties.get(PropLgK).map(_.toInt).getOrElse(DefaultLgK)

  /** Types Spark's `hll_sketch_agg` accepts. */
  def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType | BinaryType => true
    case _ => false
  }

  def emptySketch(lgK: Int): Array[Byte] =
    new HllSketch(lgK, TgtHllType.HLL_8).toCompactByteArray

  def estimate(bytes: Array[Byte]): Long =
    math.round(HllSketch.heapify(Memory.wrap(bytes)).getEstimate)

  /** Union sketches (associative, lossless at matching lgK; mixed lgK
    * degrades to the smallest — fine, both sides came from this module). */
  def union(lgK: Int, sketches: Seq[Array[Byte]]): Array[Byte] = {
    val u = new Union(lgK)
    sketches.foreach(b => u.update(HllSketch.heapify(Memory.wrap(b))))
    u.getResult(TgtHllType.HLL_8).toCompactByteArray
  }

  // ---- sidecar IO (same posture as bloom sidecars: write-once files
  // under the table root, only pointers/estimates in the log; a missing
  // or corrupt sidecar degrades to "no NDV", never a wrong answer) ----

  def sidecarRel(snapshotId: Long): String = s"ndv/s$snapshotId.json"

  def writeSidecar(root: Path, snapshotId: Long,
      sketches: Map[String, Array[Byte]]): Unit = {
    val p = root.resolve(sidecarRel(snapshotId))
    Files.createDirectories(p.getParent)
    val json = Json.write(JObj(sketches.toVector.sortBy(_._1).map { case (c, b) =>
      c -> (JStr(Base64.getEncoder.encodeToString(b)): JValue) }))
    Files.writeString(p, json)
  }

  def loadSidecar(root: Path, snapshotId: Long): Option[Map[String, Array[Byte]]] =
    try {
      val p = root.resolve(sidecarRel(snapshotId))
      if (!Files.exists(p)) None
      else Some(Json.parse(Files.readString(p)).asInstanceOf[JObj].fields.map {
        case (c, JStr(b64)) => c -> Base64.getDecoder.decode(b64)
        case (c, v) => throw new IllegalStateException(s"bad ndv sidecar entry $c: $v")
      }.toMap)
    } catch { case _: Exception => None } // corrupt sidecar -> no NDV
}
