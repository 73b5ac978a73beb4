package graft.catalog

import java.nio.file.{Files, Path}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.input_file_name
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Per-FILE bloom filters — the data-skipping tier BELOW min/max.
  *
  * Footer [min,max] bounds prune range predicates well, but on a
  * high-cardinality unsorted key (event ids, uuids) every file spans
  * nearly the full key range and a point lookup `WHERE id = X` still
  * plans every file. A per-file bloom filter answers "might this file
  * contain X" probabilistically with NO false negatives, so skipping on
  * a negative is exact — at 100 TB it turns a point lookup from 100k
  * planned tasks into the handful whose bloom admits the key. This is
  * the role Iceberg fills with Puffin blob sidecars; the mechanism here
  * is the same: blooms live as write-once SIDECAR files next to the
  * data (`data/s<id>/_blooms/`), the snapshot log stores only the
  * per-file POINTER (`bloom.<col>` -> sidecar path), and planning loads
  * a bloom lazily — only for files that survived partition/bucket and
  * min/max pruning, only when the predicate is an equality/IN on a
  * bloomed column — through a bounded driver cache.
  *
  * Cost model, stated honestly: building blooms needs the VALUES, not
  * the footer, so an enabled table pays one extra column-scan job over
  * each commit's NEW files (never the table). That is Iceberg's Puffin
  * trade too. Adoption stays zero-copy (adopted files get no blooms —
  * the property that adoption never reads data wins); compact() rewrites
  * through the normal commit path, so compaction backfills them.
  *
  * Enable per table: `write.bloom.columns` = comma-separated column
  * names (integral/string/binary only); `write.bloom.fpp` (default
  * 0.03); `write.bloom.maxbytes` caps one bloom's size (default 256 KB
  * — past it the fpp degrades rather than the log/memory growing).
  */
object BloomStats {
  val PropCols = "write.bloom.columns"
  val PropFpp = "write.bloom.fpp"
  val PropMaxBytes = "write.bloom.maxbytes"
  val DefaultFpp = 0.03
  val DefaultMaxBytes = 256L * 1024

  def columnsOf(properties: Map[String, String]): Seq[String] =
    properties.get(PropCols).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType | BinaryType => true
    case _ => false
  }

  /** One canonical hash per (declared column type, value) on BOTH the
    * build and the probe side: integral -> putLong, string -> utf8
    * bytes, binary -> bytes. The probe sees catalyst literals
    * (UTF8String boxes), the build sees JVM row values — both funnel
    * here so a value can never hash differently on the two sides. */
  private[graft] def putValue(bf: BloomFilter, dt: DataType, v: Any): Unit = (dt, v) match {
    case (ByteType | ShortType | IntegerType | LongType, n: Number) =>
      bf.putLong(n.longValue())
    case (StringType, s: String) => bf.putString(s)
    case (StringType, u: UTF8String) => bf.putString(u.toString)
    case (BinaryType, b: Array[Byte]) => bf.putBinary(b)
    case _ => ()
  }

  /** Probe; `true` (might contain / can't tell) is always safe. */
  def mightContain(bf: BloomFilter, dt: DataType, v: Any): Boolean = (dt, v) match {
    case (ByteType | ShortType | IntegerType | LongType, n: Number) =>
      bf.mightContainLong(n.longValue())
    case (StringType, s: String) => bf.mightContainString(s)
    case (StringType, u: UTF8String) => bf.mightContainString(u.toString)
    case (BinaryType, b: Array[Byte]) => bf.mightContainBinary(b)
    case _ => true
  }

  /** `file:` URI (any slash flavor, %-escapes) -> local path string;
    * plain paths pass through. Serializable-safe (pure function). */
  private def plainPath(reported: String): String =
    if (reported.startsWith("file:"))
      scala.util.Try(
        java.nio.file.Paths.get(java.net.URI.create(reported)).toString)
        .getOrElse(reported.stripPrefix("file:"))
    else reported

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos); bos.toByteArray
  }
  private def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** Build per-(file, column) blooms for a commit's NEW files in ONE
    * Spark job and write them as sidecars under each file's snapshot
    * dir. Returns the extra stats entries to fold into the per-file
    * stats maps: `bloom.<col>` -> table-root-relative sidecar path.
    *
    * Shape at scale: executors build PARTIAL blooms per read-partition
    * (sized up front from the footer row counts, so partials of one
    * file are bit-compatible), a reduceByKey ORs them, and the driver
    * writes the merged sidecars — the shuffle moves bloom BITS (bounded
    * by maxbytes x files x columns), never row values. Files laid under
    * hive partition dirs store partition values in the PATH, so
    * partition columns are excluded by the caller (path pruning already
    * serves them exactly).
    */
  def build(spark: SparkSession, root: Path, files: Seq[String],
      schema: StructType, cols: Seq[String], rowsOf: Map[String, Long],
      fpp: Double, maxBytes: Long): Map[String, Map[String, String]] = {
    val fields = cols.map(c => schema.fields.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"$PropCols names unknown column '$c' (schema: ${schema.fieldNames.mkString(",")})")))
    fields.foreach(f => require(supported(f.dataType),
      s"$PropCols: column '${f.name}' has unsupported type ${f.dataType.sql} " +
        "(integral, string and binary columns only)"))
    if (files.isEmpty) return Map.empty
    val absOf = files.map(f => root.resolve(f).toString).zip(files).toMap
    // input_file_name() reports `file:///...` URIs (escaped path chars,
    // scheme-dependent slash count) — normalize through java.net.URI to
    // the local path spelling absOf is keyed by
    def relOf(reported: String): Option[String] =
      absOf.get(plainPath(reported))
    val dts = fields.map(_.dataType)
    val readSchema = StructType(fields)
    // pre-size each file's blooms from its footer row count — partials
    // of one file MUST agree on (expectedItems, bits) or mergeInPlace
    // refuses (bit size and hash count both derive from the pair). The
    // classic optimal-bits formula, capped: a capped bloom degrades fpp,
    // never memory.
    val sizeOf: Map[String, (Long, Long)] = files.map { f =>
      val n = math.max(64L, rowsOf.getOrElse(f, 4096L))
      val ideal = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
      f -> (n, math.min(math.max(64L, ideal), maxBytes * 8))
    }.toMap
    val bcSize = spark.sparkContext.broadcast(
      sizeOf.map { case (f, s) => root.resolve(f).toString -> s })
    val colCount = cols.size
    val partials = spark.read.schema(readSchema)
      .parquet(files.map(f => root.resolve(f).toString): _*)
      .select(input_file_name() +: fields.map(f =>
        org.apache.spark.sql.functions.col(f.name)): _*)
      .rdd.mapPartitions { it =>
        val acc = mutable.HashMap.empty[(String, Int), BloomFilter]
        it.foreach { row =>
          val file = row.getString(0)
          var i = 0
          while (i < colCount) {
            val v = row.get(i + 1)
            if (v != null) {
              val bf = acc.getOrElseUpdate((file, i), {
                val (n, bits) = bcSize.value.getOrElse(plainPath(file),
                  (4096L, 1L << 15))
                BloomFilter.create(n, bits)
              })
              putValue(bf, dts(i), v)
            }
            i += 1
          }
        }
        acc.iterator.map { case (k, bf) => (k, serialize(bf)) }
      }
      .reduceByKey { (a, b) =>
        val bf = deserialize(a); bf.mergeInPlace(deserialize(b)); serialize(bf)
      }
      .collect()
    // driver writes the merged sidecars: data/s<id>/_blooms/<sha(file)>.<col>.bloom
    // (the _-prefixed dir is invisible to parquet directory listings)
    val out = mutable.HashMap.empty[String, mutable.HashMap[String, String]]
    partials.foreach { case ((reported, colIdx), bytes) =>
      relOf(reported).foreach { rel =>
        val snapDir = rel.split('/').take(2).mkString("/")
        val sha = java.security.MessageDigest.getInstance("SHA-1")
          .digest(rel.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
        val sidecarRel = s"$snapDir/_blooms/$sha.${cols(colIdx)}.bloom"
        val p = root.resolve(sidecarRel)
        Files.createDirectories(p.getParent)
        Files.write(p, bytes)
        out.getOrElseUpdate(rel, mutable.HashMap.empty)
          .put(s"bloom.${cols(colIdx)}", sidecarRel)
      }
    }
    out.map { case (k, v) => k -> v.toMap }.toMap
  }

  // ---- plan-time loading: bounded LRU over immutable sidecars ----

  private val MaxCached = 256 // x 256 KB default cap = <=64 MB driver
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Option[BloomFilter]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Option[BloomFilter]]): Boolean =
        size() > MaxCached
    })

  /** Load a sidecar bloom; None (scan the file) on missing/corrupt —
    * a lost sidecar must degrade to a scan, never fail the query. */
  def load(abs: Path): Option[BloomFilter] = {
    val key = abs.toString
    val cached = cache.get(key)
    if (cached != null) return cached
    val loaded =
      try {
        if (Files.exists(abs)) Some(deserialize(Files.readAllBytes(abs))) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    cache.put(key, loaded)
    loaded
  }

  private[graft] def clearCacheForTest(): Unit = cache.clear()
}
