package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{ColumnStats, FileStats}

/** Property-based soundness proofs for the data-skipping and stats-merge
  * logic — the two components where a subtle bug silently returns WRONG
  * ANSWERS at scale rather than failing:
  *
  *  - `FileStats.mayMatch` must NEVER say `false` (skip the file) when some
  *    row in the file actually satisfies the predicate: generate random
  *    file contents, derive the true stats, evaluate random predicates both
  *    ways and check skip => no-row-matches.
  *  - `ColumnStats.merge` bounds must contain every value on both sides.
  */
class PruningPropertySpec extends AnyFunSuite {

  /** scalacheck drive without the scalatestplus bridge (offline build):
    * 300 cases per property, failure rendered with the shrunk args. */
  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  private val schema = StructType(Seq(
    StructField("x", LongType), StructField("s", StringType)))

  private val genLongOpt: Gen[Option[Long]] =
    Gen.frequency(8 -> Gen.chooseNum(-50L, 50L).map(Some(_)), 2 -> Gen.const(None))
  private val genStrOpt: Gen[Option[String]] =
    Gen.frequency(
      8 -> Gen.oneOf("a", "ab", "b", "ba", "z", "", "aa", "zz").map(Some(_)),
      2 -> Gen.const(None))

  private case class FileRows(xs: Seq[Option[Long]], ss: Seq[Option[String]])

  private val genFile: Gen[FileRows] = for {
    n <- Gen.chooseNum(1, 12)
    xs <- Gen.listOfN(n, genLongOpt)
    ss <- Gen.listOfN(n, genStrOpt)
  } yield FileRows(xs, ss)

  /** The stats the footer harvest would produce for these rows. */
  private def statsOf(f: FileRows): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    b += ("rows" -> f.xs.size.toString)
    val xv = f.xs.flatten
    if (xv.nonEmpty) { b += ("min.x" -> xv.min.toString); b += ("max.x" -> xv.max.toString) }
    b += ("nulls.x" -> f.xs.count(_.isEmpty).toString)
    val sv = f.ss.flatten
    implicit val ord: Ordering[String] =
      Ordering.comparatorToOrdering((a: String, c: String) =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(c)))
    if (sv.nonEmpty) { b += ("min.s" -> sv.min); b += ("max.s" -> sv.max) }
    b += ("nulls.s" -> f.ss.count(_.isEmpty).toString)
    b.result()
  }

  private val xAttr = AttributeReference("x", LongType)()
  private val sAttr = AttributeReference("s", StringType)()

  private def lit(v: Long): Literal = Literal(v, LongType)
  private def lit(v: String): Literal = Literal(UTF8String.fromString(v), StringType)

  private val genLeaf: Gen[Expression] = Gen.oneOf(
    Gen.chooseNum(-55L, 55L).map(v => EqualTo(xAttr, lit(v)): Expression),
    Gen.chooseNum(-55L, 55L).map(v => GreaterThan(xAttr, lit(v)): Expression),
    Gen.chooseNum(-55L, 55L).map(v => LessThanOrEqual(xAttr, lit(v)): Expression),
    Gen.oneOf("a", "ab", "b", "c", "zz", "").map(v => EqualTo(sAttr, lit(v)): Expression),
    Gen.oneOf("a", "b", "z").map(v => GreaterThan(sAttr, lit(v)): Expression),
    Gen.oneOf("a", "ab", "z").map(v => StartsWith(sAttr, lit(v)): Expression),
    Gen.const(IsNull(xAttr): Expression),
    Gen.const(IsNotNull(sAttr): Expression),
    Gen.listOfN(3, Gen.chooseNum(-55L, 55L)).map(vs =>
      In(xAttr, vs.map(v => lit(v): Expression)): Expression))

  private val genPred: Gen[Expression] = for {
    a <- genLeaf; b <- genLeaf; c <- genLeaf
    shape <- Gen.chooseNum(0, 3)
  } yield shape match {
    case 0 => a
    case 1 => And(a, b)
    case 2 => Or(a, b)
    case 3 => And(a, Or(b, c))
  }

  /** Ground-truth row evaluation (SQL three-valued; match = TRUE). */
  private def rowMatches(x: Option[Long], s: Option[String], e: Expression): Option[Boolean] =
    e match {
      case And(l, r) => (rowMatches(x, s, l), rowMatches(x, s, r)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (rowMatches(x, s, l), rowMatches(x, s, r)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case EqualTo(a, Literal(v, _)) => value(x, s, a).map(_ == v)
      case GreaterThan(a, Literal(v, dt)) => value(x, s, a).map(cmp(_, v, dt) > 0)
      case LessThanOrEqual(a, Literal(v, dt)) => value(x, s, a).map(cmp(_, v, dt) <= 0)
      case In(a, vs) => value(x, s, a).map(av => vs.exists { case Literal(v, _) => av == v })
      case IsNull(a) => Some(value(x, s, a).isEmpty)
      case IsNotNull(a) => Some(value(x, s, a).nonEmpty)
      case StartsWith(a, Literal(v: UTF8String, _)) =>
        value(x, s, a).map(_.asInstanceOf[UTF8String].toString.startsWith(v.toString))
      case other => sys.error(s"unhandled $other")
    }

  private def value(x: Option[Long], s: Option[String], a: Expression): Option[Any] =
    a match {
      case ar: AttributeReference if ar.name == "x" => x.map(v => v: Any)
      case ar: AttributeReference if ar.name == "s" => s.map(v => UTF8String.fromString(v): Any)
      case other => sys.error(s"unhandled attr $other")
    }

  private def cmp(a: Any, b: Any, dt: DataType): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case other => sys.error(s"unhandled cmp $other in $dt")
  }

  test("mayMatch is SOUND: a skipped file provably contains no matching row") {
    check(Prop.forAll(genFile, genPred) { (f, pred) =>
      val stats = statsOf(f)
      val skip = !FileStats.mayMatch(stats, schema, pred)
      val anyRowMatches = f.xs.zip(f.ss).exists { case (x, s) =>
        rowMatches(x, s, pred).contains(true)
      }
      // skipping is only ever allowed when NO row matches
      Prop(!(skip && anyRowMatches)) :| s"stats=$stats pred=$pred skipped a matching file"
    })
  }

  test("mayMatch stays SOUND with blooms: a bloomed skip never drops a matching row") {
    // real BloomFilters built from the file's actual values through the
    // SAME canonicalization the commit-time builder uses (putValue); the
    // probe side sees catalyst literals (UTF8String boxes). Soundness
    // here is exactly bloom no-false-negatives + canonicalization
    // agreement between the two sides — the property a hash mismatch
    // (e.g. int literal vs long column) would break silently.
    check(Prop.forAll(genFile, genPred) { (f, pred) =>
      import org.apache.spark.util.sketch.BloomFilter
      val bx = BloomFilter.create(64, 0.03)
      f.xs.flatten.foreach(v => graft.catalog.BloomStats.putValue(bx, LongType, v))
      val bs = BloomFilter.create(64, 0.03)
      f.ss.flatten.foreach(v => graft.catalog.BloomStats.putValue(bs, StringType, v))
      val stats = statsOf(f) + ("bloom.x" -> "x", "bloom.s" -> "s")
      val blooms: String => Option[BloomFilter] =
        { case "x" => Some(bx); case "s" => Some(bs); case _ => None }
      val skip = !FileStats.mayMatch(stats, schema, pred, blooms)
      val anyRowMatches = f.xs.zip(f.ss).exists { case (x, s) =>
        rowMatches(x, s, pred).contains(true)
      }
      Prop(!(skip && anyRowMatches)) :| s"stats=$stats pred=$pred bloomed-skip dropped a match"
    })
  }

  test("merge bounds contain every value from both sides") {
    val dSchema = StructType(Seq(StructField("d", DoubleType)))
    val genVals = Gen.nonEmptyListOf(Gen.chooseNum(-100, 100).map(_ / 4.0))
    check(Prop.forAll(genVals, genVals) { (prevVals, freshVals) =>
      val prev = Map("min.d" -> prevVals.min.toString, "max.d" -> prevVals.max.toString)
      val fresh = Map("min.d" -> freshVals.min.toString, "max.d" -> freshVals.max.toString)
      val merged = ColumnStats.merge(prev, fresh, dSchema, prevRowCount = prevVals.size.toLong)
      val all = prevVals ++ freshVals
      Prop(merged("min.d").toDouble <= all.min && merged("max.d").toDouble >= all.max) :|
        s"merged=$merged all=[${all.min},${all.max}]"
    })
  }

  // ---- hidden time-transform partitioning: directory pruning soundness

  /** Abstract timestamp predicate over one column — rendered BOTH as the
    * catalyst conjuncts [[graft.catalog.TimeTransform.admissibleRange]]
    * consumes and as a direct Scala evaluator, so the property needs no
    * Spark session. */
  private sealed trait TsPred
  private case class TsGe(m: Long) extends TsPred
  private case class TsGt(m: Long) extends TsPred
  private case class TsLe(m: Long) extends TsPred
  private case class TsLt(m: Long) extends TsPred
  private case class TsEq(m: Long) extends TsPred
  private case class TsIn(ms: List[Long]) extends TsPred

  private val tsAttr = AttributeReference("ts", TimestampType)()
  private def tsLit(m: Long) = Literal(m, TimestampType)
  private def toExpr(p: TsPred, flip: Boolean): Expression = p match {
    // flip renders the literal-on-the-left spelling of the same predicate
    case TsGe(m) => if (flip) LessThanOrEqual(tsLit(m), tsAttr) else GreaterThanOrEqual(tsAttr, tsLit(m))
    case TsGt(m) => if (flip) LessThan(tsLit(m), tsAttr) else GreaterThan(tsAttr, tsLit(m))
    case TsLe(m) => if (flip) GreaterThanOrEqual(tsLit(m), tsAttr) else LessThanOrEqual(tsAttr, tsLit(m))
    case TsLt(m) => if (flip) GreaterThan(tsLit(m), tsAttr) else LessThan(tsAttr, tsLit(m))
    case TsEq(m) => if (flip) EqualTo(tsLit(m), tsAttr) else EqualTo(tsAttr, tsLit(m))
    case TsIn(ms) => In(tsAttr, ms.map(tsLit))
  }
  private def holds(p: TsPred, m: Long): Boolean = p match {
    case TsGe(b) => m >= b
    case TsGt(b) => m > b
    case TsLe(b) => m <= b
    case TsLt(b) => m < b
    case TsEq(b) => m == b
    case TsIn(bs) => bs.contains(m)
  }

  // micros clustered around unit boundaries — the exact-boundary algebra
  // (ts < midnight excludes the day; ts >= midnight starts it) is where
  // an off-by-one would hide
  private val dayU = 86400L * 1000000L
  private val genMicros: Gen[Long] = for {
    day <- Gen.chooseNum(-3L, 3L)
    off <- Gen.frequency(
      3 -> Gen.const(0L),
      2 -> Gen.oneOf(Seq(-1L, 1L)),
      5 -> Gen.chooseNum(-dayU + 1, dayU - 1))
  } yield day * dayU + off
  private val genTsPred: Gen[TsPred] = Gen.oneOf(
    genMicros.map(TsGe.apply), genMicros.map(TsGt.apply), genMicros.map(TsLe.apply),
    genMicros.map(TsLt.apply), genMicros.map(TsEq.apply),
    Gen.nonEmptyListOf(genMicros).map(l => TsIn(l.take(4))))

  test("transform dir pruning never excludes a matching row's partition") {
    import graft.catalog.TimeTransform
    val genCase = for {
      kind <- Gen.oneOf("day", "hour")
      nPreds <- Gen.chooseNum(1, 3)
      preds <- Gen.listOfN(nPreds, genTsPred)
      flip <- Gen.oneOf(true, false)
      rows <- Gen.nonEmptyListOf(genMicros)
    } yield (kind, preds, flip, rows)
    check(Prop.forAll(genCase) { c =>
      val (kind, preds, flip, rows) = c
      val conjuncts = preds.map(toExpr(_, flip))
      val range = TimeTransform.admissibleRange(conjuncts, "ts", kind)
      // boundary values of the predicates themselves are the adversarial
      // rows — always include them and their neighbors
      val probe = rows ++ preds.flatMap {
        case TsGe(m) => Seq(m - 1, m, m + 1); case TsGt(m) => Seq(m - 1, m, m + 1)
        case TsLe(m) => Seq(m - 1, m, m + 1); case TsLt(m) => Seq(m - 1, m, m + 1)
        case TsEq(m) => Seq(m); case TsIn(ms) => ms
      }
      val bad = probe.filter(m => preds.forall(holds(_, m))).filterNot { m =>
        val path = s"data/s1/__pt=${TimeTransform.ptOfMicros(kind, m)}/f.parquet"
        TimeTransform.admits(range, path)
      }
      Prop(bad.isEmpty) :| s"kind=$kind range=$range excluded matching rows at $bad"
    })
  }

  test("un-laid paths and un-prunable predicates always admit") {
    import graft.catalog.TimeTransform
    // a flat (pre-adoption) file has no __pt dir: always kept
    val r = TimeTransform.admissibleRange(
      Seq(GreaterThanOrEqual(tsAttr, tsLit(dayU))), "ts", "day")
    assert(TimeTransform.admits(r, "data/s1/part-0001.parquet"))
    // predicates on OTHER columns contribute no constraint
    val other = AttributeReference("x", LongType)()
    val r2 = TimeTransform.admissibleRange(
      Seq(GreaterThan(other, Literal(5L, LongType))), "ts", "day")
    assert(r2 == (None, None))
    assert(TimeTransform.admits(r2, "data/s1/__pt=-99/f.parquet"))
  }
}
