package graft.catalog

import java.nio.file.Path

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-FILE column statistics — the Iceberg-manifest data-skipping layer.
  *
  * Harvested from the parquet FOOTER at commit time (a metadata-only read:
  * a few KB per file, no data pages touched) and stored in the snapshot
  * log, so scan planning can skip whole files whose [min,max] cannot
  * satisfy the query predicate. At 100 TB this is the difference between
  * scheduling 100k tasks and scheduling the 40 whose key range matches:
  * the skip decision happens on the driver BEFORE any task exists, one
  * tier above parquet's own executor-side row-group skipping (which still
  * pays a task + footer read per file).
  *
  * Keys per file: `rows` (exact row count), and per statable column
  * `min.<c>` / `max.<c>` / `nulls.<c>`. Numeric footer bounds are exact;
  * STRING bounds may be writer-truncated, which keeps them VALID as outer
  * bounds (truncation widens, never narrows) — so they are used for
  * pruning but never served as exact answers.
  */
object FileStats {

  /** Exact row count of one parquet file from its footer — a metadata-only
    * read (KB), no data pages touched. */
  def rowCountFromFooter(file: org.apache.hadoop.fs.Path, conf: Configuration): Long = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum finally reader.close()
  }

  /** The parquet schema (MessageType) of one file's footer — a metadata-
    * only read. Used by file adoption to prove a source directory is
    * schema-HOMOGENEOUS before any file moves: a merged directory read
    * samples one footer plus partition inference and would pass a dir
    * where some files lack a column (those rows read back NULL — silent
    * corruption for a migration path). */
  def footerSchema(file: Path, conf: Configuration): org.apache.parquet.schema.MessageType = {
    val inputFile = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file.toUri), conf)
    val reader = ParquetFileReader.open(inputFile)
    try reader.getFooter.getFileMetaData.getSchema finally reader.close()
  }

  /** Canonical name->type signature of a footer schema, insensitive to
    * field ORDER and repetition flavor (required vs optional): the
    * homogeneity question for adoption is "would every file's columns read
    * back as the same types under the name-based parquet read" — field
    * order differs legitimately across writers, and a required column reads
    * fine through an optional binding. Only a missing or re-TYPED column is
    * the silent-NULL/corruption hazard the gate exists for. Nested groups
    * canonicalize recursively with sorted children. */
  def footerTypeMap(schema: org.apache.parquet.schema.GroupType): Map[String, String] = {
    def sig(t: org.apache.parquet.schema.Type): String =
      if (t.isPrimitive) {
        val p = t.asPrimitiveType
        p.getPrimitiveTypeName.toString +
          Option(p.getLogicalTypeAnnotation).map("/" + _.toString).getOrElse("")
      } else t.asGroupType.getFields.asScala
        .map(f => f.getName + ":" + sig(f)).sorted.mkString("{", ",", "}")
    schema.getFields.asScala.map(f => f.getName -> sig(f)).toMap
  }

  /** Shared bounded I/O pool for batch footer harvesting. Footer reads
    * are independent metadata-only reads (KB each), so a commit of N
    * files harvests them concurrently instead of serially on the driver
    * — at a 300-file commit the serial walk is the single largest
    * post-write driver stall, and on an object store it is N round
    * trips. Dedicated daemon threads, never the JVM-common ForkJoinPool
    * (the clone-pool discipline); capped by `graft.footer.ioThreads`
    * (default min(16, cores)) because the reads are I/O-bound. */
  private lazy val footerPool = {
    // a malformed property degrades to the default thread count — it must
    // never fail every multi-file commit (ADVICE r14)
    val n = math.max(1, sys.props.get("graft.footer.ioThreads")
      .flatMap(_.toIntOption)
      .getOrElse(math.min(16, Runtime.getRuntime.availableProcessors())))
    val seq = new java.util.concurrent.atomic.AtomicInteger()
    java.util.concurrent.Executors.newFixedThreadPool(n, r => {
      val t = new Thread(r, s"graft-footer-io-${seq.incrementAndGet()}")
      t.setDaemon(true)
      t
    })
  }

  /** Harvest [[fromFooter]] stats for many files concurrently on the
    * dedicated footer pool, preserving the input keying. Strict: every
    * read completes or the first failure rethrows (unwrapped). */
  def fromFooters[K](files: Seq[K], resolve: K => Path, schema: StructType,
      conf: Configuration): Map[K, Map[String, String]] =
    if (files.sizeIs <= 1)
      files.map(f => f -> fromFooter(resolve(f), schema, conf)).toMap
    else {
      val futs = files.map(f => f -> footerPool.submit(
        new java.util.concurrent.Callable[Map[String, String]] {
          override def call(): Map[String, String] =
            fromFooter(resolve(f), schema, conf)
        }))
      try futs.map { case (f, fut) => f -> fut.get() }.toMap
      catch {
        case e: java.util.concurrent.ExecutionException =>
          // cancel the not-yet-finished reads before rethrowing — abandoned
          // footer I/O must not keep occupying the shared pool (ADVICE r14)
          futs.foreach(_._2.cancel(true))
          throw e.getCause
      }
    }

  /** Harvest the stats of one parquet file from its footer. Columns whose
    * chunk statistics are absent/unusable in ANY row group simply get no
    * min/max keys (missing stats disable pruning, never break it). */
  def fromFooter(file: Path, schema: StructType, conf: Configuration): Map[String, String] = {
    val inputFile = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file.toUri), conf)
    val reader = ParquetFileReader.open(inputFile)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val out = Map.newBuilder[String, String]
      out += ("rows" -> blocks.map(_.getRowCount).sum.toString)
      // on-disk size, for bin-pack maintenance (rewriteSmallFiles) — the
      // same length the open() already stat'ed, no extra filesystem call
      out += ("bytes" -> inputFile.getLength.toString)
      schema.fields.filter(f => ColumnStats.statable(f.dataType)).foreach { f =>
        val chunks = blocks.map(_.getColumns.asScala.find(_.getPath.toDotString == f.name))
        // every row group must expose the column (partition columns and
        // pre-evolution files don't have it -> no stats)
        if (chunks.forall(_.isDefined)) {
          val stats = chunks.flatten.map(c => (c.getStatistics, c.getValueCount))
          val usable = stats.forall { case (s, _) => s != null && !s.isEmpty }
          if (usable) {
            if (stats.forall { case (s, _) => s.isNumNullsSet })
              out += (s"nulls.${f.name}" -> stats.map(_._1.getNumNulls).sum.toString)
            // chunks with values contribute bounds; chunks without must be
            // PROVABLY all-null or the column's bounds are unknowable
            val (withVals, empty) = stats.partition(_._1.hasNonNullValue)
            val emptyProvable = empty.forall { case (s, vc) => s.isNumNullsSet && s.getNumNulls == vc }
            if (withVals.nonEmpty && emptyProvable) {
              val mins = withVals.map(s => canonical(f.dataType, s._1.genericGetMin.asInstanceOf[AnyRef]))
              val maxs = withVals.map(s => canonical(f.dataType, s._1.genericGetMax.asInstanceOf[AnyRef]))
              out += (s"min.${f.name}" -> mins.reduce((a, b) => if (lt(f.dataType, a, b)) a else b))
              out += (s"max.${f.name}" -> maxs.reduce((a, b) => if (lt(f.dataType, a, b)) b else a))
            }
          }
        }
      }
      out.result()
    } finally reader.close()
  }

  /** Footer value -> the same canonical string [[ColumnStats]] uses. */
  private def canonical(dt: DataType, v: AnyRef): String = (dt, v) match {
    case (StringType, b: Binary) => b.toStringUsingUTF8
    case _ => v.toString
  }

  private def lt(dt: DataType, a: String, b: String): Boolean =
    ColumnStats.gt(dt, b, a) // one canonical ordering for all stat folding

  // ------------------------------------------------------------------
  // pruning: may a file with these stats contain a row matching `pred`?
  // ------------------------------------------------------------------

  /** Conservative three-valued evaluation: `false` ONLY when the stats
    * PROVE no row can match (safe to skip the file); any shape this
    * evaluator does not understand — expressions on the value, casts of
    * the COLUMN, UDFs — returns `true` (scan the file). Cast-wrapped
    * LITERALS (the analyzer's type reconciliation, e.g. `id = CAST(150 AS
    * BIGINT)`) are folded first so they still prune.
    *
    * `blooms` resolves a `bloom.<col>` sidecar path from the stats map to
    * its loaded filter (see [[BloomStats]]) — consulted ONLY on equality/
    * IN shapes, AFTER min/max fails to disprove, so the (cached) sidecar
    * read is paid exactly where it can still skip. The default resolver
    * loads nothing: min/max behavior is unchanged for callers without a
    * table root in hand. Bloom negatives are exact (no false negatives by
    * construction), so skipping on one is as sound as a min/max skip. */
  def mayMatch(stats: Map[String, String], schema: StructType, pred: Expression,
      blooms: String => Option[org.apache.spark.util.sketch.BloomFilter] =
        _ => None): Boolean =
    eval(stats, schema, foldLiterals(pred), blooms)

  /** Fold foldable cast chains over literals to plain literals; leave
    * everything else (incl. casts of attributes) untouched. */
  private def foldLiterals(e: Expression): Expression = e match {
    case l: Literal => l
    case c: Cast if c.foldable =>
      try Literal(c.eval(null), c.dataType) catch { case _: Exception => c }
    case other => other.mapChildren(foldLiterals)
  }

  private def eval(stats: Map[String, String], schema: StructType, pred: Expression,
      blooms: String => Option[org.apache.spark.util.sketch.BloomFilter]): Boolean = pred match {
    case And(l, r) => mayMatch(stats, schema, l, blooms) && mayMatch(stats, schema, r, blooms)
    case Or(l, r) => mayMatch(stats, schema, l, blooms) || mayMatch(stats, schema, r, blooms)
    case EqualTo(a, Literal(v, _)) => mayEqual(stats, schema, a, v, blooms)
    case EqualTo(Literal(v, _), a) => mayEqual(stats, schema, a, v, blooms)
    case EqualNullSafe(a, l @ Literal(v, _)) =>
      if (v == null) mayBeNull(stats, a) else mayEqual(stats, schema, a, v, blooms)
    case EqualNullSafe(l @ Literal(v, _), a) =>
      if (v == null) mayBeNull(stats, a) else mayEqual(stats, schema, a, v, blooms)
    case GreaterThan(a, Literal(v, _)) => boundCheck(stats, schema, a, v, cmp => cmp > 0)
    case GreaterThan(Literal(v, _), a) => boundCheck(stats, schema, a, v, cmp => cmp < 0)
    case GreaterThanOrEqual(a, Literal(v, _)) => boundCheck(stats, schema, a, v, cmp => cmp >= 0)
    case GreaterThanOrEqual(Literal(v, _), a) => boundCheck(stats, schema, a, v, cmp => cmp <= 0)
    case LessThan(a, Literal(v, _)) => boundCheck(stats, schema, a, v, cmp => cmp < 0)
    case LessThan(Literal(v, _), a) => boundCheck(stats, schema, a, v, cmp => cmp > 0)
    case LessThanOrEqual(a, Literal(v, _)) => boundCheck(stats, schema, a, v, cmp => cmp <= 0)
    case LessThanOrEqual(Literal(v, _), a) => boundCheck(stats, schema, a, v, cmp => cmp >= 0)
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case Literal(v, _) => mayEqual(stats, schema, a, v, blooms) }
    case i: InSet => i.hset.exists(v => mayEqual(stats, schema, i.child, v, blooms))
    case IsNull(a) => mayBeNull(stats, a)
    case IsNotNull(a) => mayBeNotNull(stats, a)
    case StartsWith(a, Literal(prefix: UTF8String, StringType)) =>
      mayStartWith(stats, a, prefix.toString)
    case _ => true
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: Attribute => Some(a.name)
    case _ => None
  }

  private def field(schema: StructType, name: String): Option[StructField] =
    schema.fields.find(_.name == name)

  /** sign of (statValue - literal) in the column's order; None = can't
    * compare (no pruning). */
  private def compare(dt: DataType, statVal: String, litVal: Any): Option[Int] =
    try {
      (dt, litVal) match {
        case (_, null) => None
        case (StringType, u: UTF8String) =>
          Some(UTF8String.fromString(statVal).compareTo(u))
        case (StringType, _) => None
        case (FloatType | DoubleType, _) =>
          Some(java.lang.Double.compare(statVal.toDouble, litVal.toString.toDouble))
        case _ =>
          // integral column; literal may be any numeric — exact compare
          Some(BigDecimal(statVal).compare(BigDecimal(litVal.toString)))
      }
    } catch { case _: NumberFormatException => None }

  private def mayEqual(stats: Map[String, String], schema: StructType,
      attr: Expression, v: Any,
      blooms: String => Option[org.apache.spark.util.sketch.BloomFilter]): Boolean = {
    if (v == null) return false // EqualTo(_, null) matches no row
    if (!mayBeNotNull(stats, attr)) return false // provably all-null column
    val byBounds = (for {
      name <- attrName(attr)
      f <- field(schema, name)
      mn <- stats.get(s"min.$name"); cMin <- compare(f.dataType, mn, v)
      mx <- stats.get(s"max.$name"); cMax <- compare(f.dataType, mx, v)
    } yield cMin <= 0 && cMax >= 0).getOrElse(true)
    if (!byBounds) return false
    // bounds can't disprove — a per-file bloom still can (point-lookup
    // skipping on unsorted high-cardinality keys; see BloomStats)
    (for {
      name <- attrName(attr)
      f <- field(schema, name)
      sidecar <- stats.get(s"bloom.$name")
      bf <- blooms(sidecar)
    } yield BloomStats.mightContain(bf, f.dataType, v)).getOrElse(true)
  }

  /** keep the file iff SOME value x in [min,max] satisfies `test(sign(x - v))`
    * — checked at the extremes (the predicate families here are monotone). */
  private def boundCheck(stats: Map[String, String], schema: StructType,
      attr: Expression, v: Any, test: Int => Boolean): Boolean = {
    if (!mayBeNotNull(stats, attr)) return false // provably all-null column
    (for {
      name <- attrName(attr)
      f <- field(schema, name)
      mn <- stats.get(s"min.$name"); cMin <- compare(f.dataType, mn, v)
      mx <- stats.get(s"max.$name"); cMax <- compare(f.dataType, mx, v)
    } yield test(cMin) || test(cMax)).getOrElse(true)
  }

  private def mayBeNull(stats: Map[String, String], attr: Expression): Boolean =
    (for {
      name <- attrName(attr)
      n <- stats.get(s"nulls.$name")
    } yield n != "0").getOrElse(true)

  private def mayBeNotNull(stats: Map[String, String], attr: Expression): Boolean =
    (for {
      name <- attrName(attr)
      n <- stats.get(s"nulls.$name")
      rows <- stats.get("rows")
    } yield n != rows).getOrElse(true)

  private def mayStartWith(stats: Map[String, String], attr: Expression,
      prefix: String): Boolean = {
    (for {
      name <- attrName(attr)
      mn <- stats.get(s"min.$name")
      mx <- stats.get(s"max.$name")
    } yield {
      val u = UTF8String.fromString(prefix)
      // s starts with prefix  =>  prefix <= s, and s < prefixSuccessor
      val belowAll = UTF8String.fromString(mx).compareTo(u) < 0
      val aboveAll = prefixSuccessor(prefix) match {
        case Some(succ) => UTF8String.fromString(mn).compareTo(UTF8String.fromString(succ)) >= 0
        case None => false
      }
      !(belowAll || aboveAll)
    }).getOrElse(true)
  }

  /** A string greater (in UTF-8 byte order) than every string with this
    * prefix: last non-maximal CODE POINT incremented, suffix dropped;
    * None if every code point is U+10FFFF. Works on code points, not
    * UTF-16 chars — a char-level increment can land in the surrogate gap
    * (U+D7FF+1 = U+D800), which `UTF8String.fromString` mangles to `?`
    * (0x3F), collapsing the bound below the prefix itself and pruning
    * matching files. An increment landing in D800–DFFF jumps to U+E000
    * (the next valid scalar — looser but sound). */
  private def prefixSuccessor(prefix: String): Option[String] = {
    val cps = prefix.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0 && cps(i) >= 0x10FFFF) i -= 1
    if (i < 0) None
    else {
      val n0 = cps(i) + 1
      val n = if (n0 >= 0xD800 && n0 <= 0xDFFF) 0xE000 else n0
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < i) { sb.appendCodePoint(cps(j)); j += 1 }
      sb.appendCodePoint(n)
      Some(sb.toString)
    }
  }
}

/** BUCKET pruning for bucketed tables: a predicate that pins the bucket
  * key to literals (`k = 19`, `k IN (3, 7)`) admits only the buckets those
  * values pmod into — every file in any other `__bucket=b/` dir is
  * provably unmatchable, no footer stats needed. min/max stats almost
  * never exclude anything on a pmod-distributed key (each bucket's file
  * spans the full key range), so at 100 TB this is what turns a point
  * UPDATE or lookup on a bucketed table from "scan/rewrite every bucket"
  * into "touch 1/n of the candidate files". */
object BucketPruning {

  /** The set of bucket ids rows matching ALL `conjuncts` can live in;
    * None = unconstrained (every bucket may match). Sound, never complete:
    * any shape not understood contributes no constraint. */
  def admissible(conjuncts: Seq[Expression], bucketCol: String,
      nBuckets: Int): Option[Set[Int]] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    def isKey(e: Expression): Boolean = e match {
      case a: Attribute => a.name == bucketCol
      case _ => false
    }
    // NULL keys land in bucket 0 on write; `k = lit` / `k IN (...)` never
    // match null, so a null literal contributes no admissible bucket
    def bucketOf(v: Any): Option[Int] = v match {
      case l: Long => Some((((l % nBuckets) + nBuckets) % nBuckets).toInt)
      case i: Int => bucketOf(i.toLong)
      case s: Short => bucketOf(s.toLong)
      case b: Byte => bucketOf(b.toLong)
      case _ => None // null or non-integral: no conclusion from this value
    }
    val sets = conjuncts.flatMap(split).map(foldLiterals).flatMap {
      case EqualTo(a, Literal(v, _)) if isKey(a) && v != null =>
        bucketOf(v).map(Set(_))
      case EqualTo(Literal(v, _), a) if isKey(a) && v != null =>
        bucketOf(v).map(Set(_))
      case EqualNullSafe(a, Literal(v, _)) if isKey(a) =>
        if (v == null) Some(Set(0)) else bucketOf(v).map(Set(_))
      case EqualNullSafe(Literal(v, _), a) if isKey(a) =>
        if (v == null) Some(Set(0)) else bucketOf(v).map(Set(_))
      case IsNull(a) if isKey(a) => Some(Set(0))
      case In(a, vs) if isKey(a) && vs.forall(_.isInstanceOf[Literal]) =>
        val bs = vs.collect { case Literal(v, _) if v != null => bucketOf(v) }
        // every non-null value must map cleanly or the IN gives no bound
        if (bs.nonEmpty && bs.forall(_.isDefined)) Some(bs.flatten.toSet) else None
      case i: InSet if isKey(i.child) =>
        val bs = i.hset.toSeq.filter(_ != null).map(bucketOf)
        if (bs.nonEmpty && bs.forall(_.isDefined)) Some(bs.flatten.toSet) else None
      case _ => None
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  /** Bucket id a committed file's path encodes, None when un-laid. */
  def bucketIdOf(path: String): Option[Int] =
    BucketDirRe.findFirstMatchIn(path).map(_.group(1).toInt)

  private val BucketDirRe = "__bucket=(\\d+)/".r

  // same literal folding the stat evaluator applies (analyzer-inserted
  // casts around literals must not defeat the match)
  private def foldLiterals(e: Expression): Expression = e match {
    case l: Literal => l
    case c: Cast if c.foldable =>
      try Literal(c.eval(null), c.dataType) catch { case _: Exception => c }
    case other => other.mapChildren(foldLiterals)
  }
}

/** HIDDEN time-transform partitioning (Iceberg's signature model: the
  * table is laid out by `hour(ts)`/`day(ts)` but users only ever query
  * the SOURCE timestamp column — the engine derives the layout value on
  * write and maps timestamp predicates to partition-directory ranges on
  * read). The derived column is `__pt` = floor(epoch_seconds / unit),
  * UTC-fixed (pure epoch arithmetic, no session-timezone calendar), laid
  * out as hive `__pt=N/` dirs exactly like identity partitions.
  *
  * At 100 TB this is what turns `WHERE ts >= yesterday` from a lake scan
  * into planning two days' directories — WITHOUT the user ever knowing a
  * partition column exists (the classic hive mistake this model fixes:
  * nobody forgets to also filter the derived day column, because there
  * isn't one to forget). */
object TimeTransform {

  /** The hidden layout column. */
  val Col = "__pt"

  val Kinds: Set[String] = Set("hour", "day", "month", "year")

  /** Constant-length units only — `month`/`year` are CALENDAR arithmetic
    * (28–31-day months, leap years) and take the [[ptOfMicros]] calendar
    * path instead; asking for their "unit seconds" is a bug. */
  def unitSeconds(kind: String): Long = kind match {
    case "hour" => 3600L
    case "day"  => 86400L
    case other  => throw new IllegalArgumentException(
      s"transform '$other' has no constant unit length")
  }

  /** Partition value of an epoch-MICROS timestamp (catalyst's literal
    * representation). `hour`/`day`: floor division, so pre-1970 instants
    * land in the correct (negative) unit. `month`/`year`: the UTC
    * calendar decomposition (Iceberg's transform semantics — months
    * since 1970-01, years since 1970), which floor division cannot
    * express because the unit length varies. */
  def ptOfMicros(kind: String, micros: Long): Long = kind match {
    case "hour" | "day" =>
      Math.floorDiv(micros, unitSeconds(kind) * 1000000L)
    case "month" | "year" =>
      // floorDiv so a pre-1970 instant maps to the second CONTAINING it
      // (the truncated-toward-zero quotient would shift it one forward)
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), 0, java.time.ZoneOffset.UTC)
      if (kind == "month") (ldt.getYear - 1970).toLong * 12L + (ldt.getMonthValue - 1)
      else (ldt.getYear - 1970).toLong
    case other => throw new IllegalArgumentException(
      s"unsupported partition transform '$other' (supported: ${Kinds.mkString(", ")})")
  }

  /** Write-side derivation, TIME-ZONE-INDEPENDENT in every (column
    * flavor, kind) cell so the layout always matches the UTC-fixed
    * [[ptOfMicros]] the pruning side computes, regardless of
    * `spark.sql.session.timeZone`:
    *
    *  - `hour`/`day` on TIMESTAMP: `floor(epoch_seconds / unit)` — pure
    *    epoch arithmetic (the DOUBLE cast is exact for |sec| < 2^52 and
    *    an exact unit multiple divides to an exact integer, so boundary
    *    instants land deterministically).
    *  - `hour`/`day` on TIMESTAMP_NTZ: the NTZ wall time is read AS UTC
    *    (matching the pruner, which reads NTZ literals' raw micros) via
    *    literal calendar fields — `datediff(date(ts), 1970-01-01)` for
    *    the day ordinal, `* 24 + hour(ts)` for hours. An NTZ→DATE cast
    *    and `hour()` on NTZ are literal field reads, never a session-zone
    *    conversion (the old `cast("timestamp")` route was session-zoned
    *    and had to be refused off UTC).
    *  - `month`/`year` on TIMESTAMP: decompose the UTC wall clock —
    *    `convert_timezone('UTC', ts)` yields the NTZ wall time in UTC
    *    (absolute instant in, target zone explicit; the session zone
    *    never participates), then `year()`/`month()` read literal fields.
    *  - `month`/`year` on TIMESTAMP_NTZ: `year()`/`month()` are already
    *    literal field reads. */
  def ptColumn(kind: String, ts: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val isNtz = dt == TimestampNTZType
    kind match {
      case "hour" | "day" =>
        if (isNtz) {
          val dayPt = datediff(ts.cast("date"), lit("1970-01-01").cast("date"))
            .cast("long")
          if (kind == "day") dayPt
          else dayPt * lit(24L) + hour(ts).cast("long")
        } else floor(ts.cast("double") / lit(unitSeconds(kind).toDouble))
          .cast("long")
      case "month" | "year" =>
        val wall = if (isNtz) ts else convert_timezone(lit("UTC"), ts)
        if (kind == "month")
          ((year(wall) - lit(1970)).cast("long") * lit(12L) +
            (month(wall) - lit(1)).cast("long")).cast("long")
        else (year(wall) - lit(1970)).cast("long")
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform '$other' (supported: ${Kinds.mkString(", ")})")
    }
  }

  /** Partition value a committed file's path encodes, None when un-laid
    * (a pre-adoption flat file prunes conservatively: always kept). */
  def ptIdOf(path: String): Option[Long] =
    PtDirRe.findFirstMatchIn(path).map(_.group(1).toLong)

  private val PtDirRe = "__pt=(-?\\d+)/".r

  /** The inclusive `__pt` interval rows matching ALL `conjuncts` can live
    * in; (None, None) sides are unconstrained. Sound, never complete: any
    * predicate shape not understood contributes no bound (boundary
    * instants resolve to the unit CONTAINING them, which over-admits by
    * at most one directory — never excludes a matching file). */
  def admissibleRange(conjuncts: Seq[Expression], srcCol: String,
      kind: String): (Option[Long], Option[Long]) = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    def isKey(e: Expression): Boolean = e match {
      case a: Attribute => a.name == srcCol
      // the analyzer reconciles NTZ-column-vs-LTZ-literal by casting the
      // COLUMN between timestamp flavors — still the same key
      case c: Cast if (c.dataType == TimestampType ||
          c.dataType == TimestampNTZType) => isKey(c.child)
      case _ => false
    }
    // TIMESTAMP and TIMESTAMP_NTZ literals both carry epoch micros (NTZ
    // interpreted as UTC — consistent with ptColumn's derivation in a
    // UTC session, the library's documented deployment shape)
    object TsLit {
      def unapply(e: Expression): Option[Long] = e match {
        case Literal(l: Long, TimestampType) => Some(l)
        case Literal(l: Long, TimestampNTZType) => Some(l)
        case _ => None
      }
    }
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def raiseLo(p: Long): Unit = lo = Some(lo.fold(p)(math.max(_, p)))
    def lowerHi(p: Long): Unit = hi = Some(hi.fold(p)(math.min(_, p)))
    // strict `ts < X` admits at most the unit containing X - 1µs: at an
    // exact unit boundary that excludes X's whole unit (`ts < midnight`
    // must not plan that day's directory); anywhere inside a unit it
    // degrades to the containing unit, which is sound. Phrased through
    // ptOfMicros so it is exact for CALENDAR units (month/year) too.
    def strictHi(m: Long): Long = ptOfMicros(kind, m - 1)
    conjuncts.flatMap(split).map(foldLits).foreach {
      case GreaterThanOrEqual(a, TsLit(m)) if isKey(a) =>
        raiseLo(ptOfMicros(kind, m))
      case GreaterThan(a, TsLit(m)) if isKey(a) =>
        raiseLo(ptOfMicros(kind, m))
      case LessThanOrEqual(a, TsLit(m)) if isKey(a) =>
        lowerHi(ptOfMicros(kind, m))
      case LessThan(a, TsLit(m)) if isKey(a) =>
        lowerHi(strictHi(m))
      // reversed operand order: lit OP col
      case GreaterThanOrEqual(TsLit(m), a) if isKey(a) =>
        lowerHi(ptOfMicros(kind, m))
      case GreaterThan(TsLit(m), a) if isKey(a) =>
        lowerHi(strictHi(m))
      case LessThanOrEqual(TsLit(m), a) if isKey(a) =>
        raiseLo(ptOfMicros(kind, m))
      case LessThan(TsLit(m), a) if isKey(a) =>
        raiseLo(ptOfMicros(kind, m))
      case EqualTo(a, TsLit(m)) if isKey(a) =>
        raiseLo(ptOfMicros(kind, m)); lowerHi(ptOfMicros(kind, m))
      case EqualTo(TsLit(m), a) if isKey(a) =>
        raiseLo(ptOfMicros(kind, m)); lowerHi(ptOfMicros(kind, m))
      case In(a, vs) if isKey(a) && vs.nonEmpty &&
          vs.forall(v => TsLit.unapply(v).isDefined) =>
        val ms = vs.flatMap(TsLit.unapply)
        raiseLo(ptOfMicros(kind, ms.min)); lowerHi(ptOfMicros(kind, ms.max))
      case _ => ()
    }
    (lo, hi)
  }

  /** Keep decision for one file path under an admissible range. */
  def admits(range: (Option[Long], Option[Long]), path: String): Boolean = {
    val (lo, hi) = range
    ptIdOf(path).forall(p => lo.forall(p >= _) && hi.forall(p <= _))
  }

  // analyzer-inserted casts around literals must not defeat the match
  private[catalog] def foldLits(e: Expression): Expression = e match {
    case l: Literal => l
    case c: Cast if c.foldable =>
      try Literal(c.eval(null), c.dataType) catch { case _: Exception => c }
    case other => other.mapChildren(foldLits)
  }
}

/** Iceberg's `truncate[W]` hidden-partitioning transform on integral and
  * string columns: rows lay out under `__pt=<truncated>/` dirs where the
  * truncated value is `v - (v mod W)` for int/long (floored, so negative
  * values truncate DOWNWARD — the Iceberg spec) and the first `W`
  * characters for strings. The user never sees `__pt`; equality/IN/range
  * predicates on the SOURCE column prune whole directories because
  * truncation is ORDER-PRESERVING (monotone non-decreasing) in both
  * domains — `v >= L` implies `trunc(v) >= trunc(L)`, so a source-range
  * predicate maps to a truncated-range dir predicate soundly.
  *
  * The classic use: `truncate[4](part.p_brand)` groups the brand prefix,
  * `truncate[1000000](order_id)` bins a monotone key into million-row
  * dirs — prefix lookups and id ranges plan only their bins at 100 TB. */
object TruncateTransform {

  /** Kinds string recorded in `transform.kind`. */
  val Kind = "truncate"

  def truncLong(v: Long, w: Long): Long = v - Math.floorMod(v, w)

  /** First `w` CODE POINTS — must match the write side exactly: Spark's
    * `substring(c, 1, w)` counts code points on `UTF8String`, not UTF-16
    * code units, so a java `substring(0, w)` would split surrogate pairs
    * and disagree with the stored `__pt` token for supplementary-plane
    * text (emoji, CJK-B). */
  def truncStr(s: String, w: Int): String = {
    if (s.codePointCount(0, s.length) <= w) s
    else s.substring(0, s.offsetByCodePoints(0, w))
  }

  /** Comparator matching Spark's string order: `UTF8String` compares
    * UTF-8 BYTES (= code-point order), while Java `String.compareTo`
    * compares UTF-16 code units — the two disagree above the BMP
    * (surrogate code units 0xD800–0xDFFF sort below U+E000–U+FFFF in
    * UTF-16 but all supplementary code points sort above every BMP char
    * in UTF-8). All keep-decisions against the source predicate MUST use
    * this order or non-BMP directories get silently dropped. */
  private def u8cmp(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Write-side derivation of the layout value. Int/long: `v - pmod(v,
    * W)` (exact integer arithmetic, floor semantics for negatives).
    * String: `substring(1, W)`. */
  def ptColumn(dt: org.apache.spark.sql.types.DataType, width: Int,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    dt match {
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType =>
        (c.cast("long") - pmod(c.cast("long"), lit(width.toLong))).cast("long")
      case org.apache.spark.sql.types.StringType => substring(c, 1, width)
      case other => throw new IllegalArgumentException(
        s"truncate transform supports INT/BIGINT/STRING columns, got ${other.sql}")
    }
  }

  /** The `__pt` dir token of a committed file path (hive-unescaped), None
    * when un-laid — a pre-adoption flat file prunes conservatively. */
  def ptTokenOf(path: String): Option[String] =
    PtTokRe.findFirstMatchIn(path).map(m =>
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(m.group(1)))

  private val PtTokRe = "__pt=([^/]+)/".r

  /** Hive's null/empty sentinel: rows whose source value was NULL (or
    * the empty string) land here. Always KEPT — a null never matches a
    * predicate so over-admission is the sound direction, and a genuine
    * empty-string value must stay reachable for `col = ''`. */
  private val DefaultPart = "__HIVE_DEFAULT_PARTITION__"

  /** Keep-decision function over `__pt` dir tokens for the conjuncts of a
    * pruning predicate. Sound, never complete: unrecognized predicate
    * shapes contribute no constraint; un-laid files and the hive default
    * partition always keep. */
  def admissible(conjuncts: Seq[Expression], srcCol: String, width: Int,
      dt: org.apache.spark.sql.types.DataType): String => Boolean = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    def isKey(e: Expression): Boolean = e match {
      case a: Attribute => a.name == srcCol
      case c: Cast => isKey(c.child) // widening casts the analyzer inserts
      case _ => false
    }
    object LongLit {
      def unapply(e: Expression): Option[Long] = e match {
        case Literal(i: Int, IntegerType) => Some(i.toLong)
        case Literal(l: Long, LongType) => Some(l)
        case _ => None
      }
    }
    object StrLit {
      def unapply(e: Expression): Option[String] = e match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
          Some(s.toString)
        case _ => None
      }
    }
    val preds = conjuncts.flatMap(split).map(TimeTransform.foldLits)
    dt match {
      case IntegerType | LongType =>
        val w = width.toLong
        var lo: Option[Long] = None
        var hi: Option[Long] = None
        var inSet: Option[Set[Long]] = None
        def raiseLo(p: Long): Unit = lo = Some(lo.fold(p)(math.max(_, p)))
        def lowerHi(p: Long): Unit = hi = Some(hi.fold(p)(math.min(_, p)))
        preds.foreach {
          case GreaterThanOrEqual(a, LongLit(v)) if isKey(a) => raiseLo(truncLong(v, w))
          case GreaterThan(a, LongLit(v)) if isKey(a) => raiseLo(truncLong(v, w))
          case LessThanOrEqual(a, LongLit(v)) if isKey(a) => lowerHi(truncLong(v, w))
          // strict `v < X` at an exact bin boundary excludes X's bin
          case LessThan(a, LongLit(v)) if isKey(a) => lowerHi(truncLong(v - 1, w))
          case GreaterThanOrEqual(LongLit(v), a) if isKey(a) => lowerHi(truncLong(v, w))
          case GreaterThan(LongLit(v), a) if isKey(a) => lowerHi(truncLong(v - 1, w))
          case LessThanOrEqual(LongLit(v), a) if isKey(a) => raiseLo(truncLong(v, w))
          case LessThan(LongLit(v), a) if isKey(a) => raiseLo(truncLong(v, w))
          case EqualTo(a, LongLit(v)) if isKey(a) =>
            raiseLo(truncLong(v, w)); lowerHi(truncLong(v, w))
          case EqualTo(LongLit(v), a) if isKey(a) =>
            raiseLo(truncLong(v, w)); lowerHi(truncLong(v, w))
          case In(a, vs) if isKey(a) && vs.nonEmpty &&
              vs.forall(v => LongLit.unapply(v).isDefined) =>
            val s = vs.flatMap(LongLit.unapply).map(truncLong(_, w)).toSet
            inSet = Some(inSet.fold(s)(_ intersect s))
          case _ => ()
        }
        tok =>
          tok == DefaultPart || tok.toLongOption.forall(p =>
            lo.forall(p >= _) && hi.forall(p <= _) && inSet.forall(_.contains(p)))
      case StringType =>
        // all bounds compared in UTF-8 byte order (u8cmp) — Spark's
        // string order — never Java's UTF-16 code-unit order
        var lo: Option[String] = None
        var hi: Option[String] = None
        var inSet: Option[Set[String]] = None
        var prefixes: List[String] = Nil
        def raiseLo(p: String): Unit =
          lo = Some(lo.fold(p)(cur => if (u8cmp(cur, p) >= 0) cur else p))
        def lowerHi(p: String): Unit =
          hi = Some(hi.fold(p)(cur => if (u8cmp(cur, p) <= 0) cur else p))
        preds.foreach {
          // truncation is monotone in code-point order: v >= L  =>
          // trunc(v) >= trunc(L) (strict bounds keep the closed truncated
          // bound — one extra dir class at most, sound)
          case GreaterThanOrEqual(a, StrLit(v)) if isKey(a) => raiseLo(truncStr(v, width))
          case GreaterThan(a, StrLit(v)) if isKey(a) => raiseLo(truncStr(v, width))
          case LessThanOrEqual(a, StrLit(v)) if isKey(a) => lowerHi(truncStr(v, width))
          case LessThan(a, StrLit(v)) if isKey(a) => lowerHi(truncStr(v, width))
          case GreaterThanOrEqual(StrLit(v), a) if isKey(a) => lowerHi(truncStr(v, width))
          case GreaterThan(StrLit(v), a) if isKey(a) => lowerHi(truncStr(v, width))
          case LessThanOrEqual(StrLit(v), a) if isKey(a) => raiseLo(truncStr(v, width))
          case LessThan(StrLit(v), a) if isKey(a) => raiseLo(truncStr(v, width))
          case EqualTo(a, StrLit(v)) if isKey(a) =>
            raiseLo(truncStr(v, width)); lowerHi(truncStr(v, width))
          case EqualTo(StrLit(v), a) if isKey(a) =>
            raiseLo(truncStr(v, width)); lowerHi(truncStr(v, width))
          // StartsWith: a prefix with >= W code points pins the dir
          // exactly (the token IS the first W cps of any matching value).
          // A shorter prefix means every matching value's token EXTENDS
          // it — enforce the prefix directly rather than a padded upper
          // bound (U+FFFF padding is unsound in UTF-8 order: "a𐀀"
          // extends "a" yet exceeds "a￿").
          case StartsWith(a, StrLit(v)) if isKey(a) =>
            if (v.codePointCount(0, v.length) >= width) {
              raiseLo(truncStr(v, width)); lowerHi(truncStr(v, width))
            } else prefixes ::= v
          case In(a, vs) if isKey(a) && vs.nonEmpty &&
              vs.forall(v => StrLit.unapply(v).isDefined) =>
            val s = vs.flatMap(StrLit.unapply).map(truncStr(_, width)).toSet
            inSet = Some(inSet.fold(s)(_ intersect s))
          case _ => ()
        }
        tok =>
          tok == DefaultPart ||
            (lo.forall(u8cmp(tok, _) >= 0) && hi.forall(u8cmp(tok, _) <= 0) &&
              inSet.forall(_.contains(tok)) && prefixes.forall(tok.startsWith(_)))
      case _ => _ => true // unsupported type: never created, but degrade safely
    }
  }
}
