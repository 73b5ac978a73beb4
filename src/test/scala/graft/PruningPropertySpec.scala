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
}
