package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** EXACT edit-distance join: all pairs whose Levenshtein distance is at
  * most `k`, without ever forming the all-pairs product.
  *
  * Candidate generation is DELETION-NEIGHBORHOOD BANDING (the published
  * FastSS / SymSpell scheme — Bocek et al., "Fast Similarity Search in
  * Large Dictionaries", 2007): every string emits the set of strings
  * reachable by deleting at most `k` characters. If `ed(a, b) <= k` then
  * an optimal alignment has at most `k` operations, and dropping each
  * operation's touched character from its side (both sides for a
  * substitution, one for an insert/delete) leaves a COMMON subsequence
  * reachable by at most `k` deletions from either string — so the two
  * neighborhoods intersect and the banded equi-join has EXACT recall by
  * construction. Candidates then verify with Spark's built-in
  * `levenshtein(l, r, threshold)` (codegen'd, early-exits past the
  * threshold band), so precision is exact too.
  *
  * 100-TB shape: candidate generation and the verify run over DISTINCT
  * strings only (the SymSpell serving layout — vocabulary-sized state,
  * not row-sized: a trillion-row key column repeats its terms massively),
  * and the only wide operations are the variant-keyed equi-join plus the
  * final id-expansion joins — never documents on the wire, never a cross
  * product. |neighborhood| is C(len, <=k) (len+1 keys at k=1), which is
  * why the op targets SHORT join keys — titles, URLs, codes, names; for
  * long text use [[Dedup]]'s MinHash banding instead (the published
  * division of labor: FastSS for keys, LSH for documents).
  *
  * NULL DISCIPLINE: null strings participate in no pair (a distance to
  * null is undefined); documented, matching SQL `levenshtein` which
  * returns null. Empty strings are legitimate values (ed("", s) = len(s))
  * and band correctly — "" is in every neighborhood of radius >= len.
  */
object FuzzyJoin {

  /** Hard ceiling on the deletion radius: neighborhood size is
    * C(len, <=k), so k beyond 3 explodes on anything but tiny codes. */
  val MaxK = 3

  /** All distinct strings reachable from `s` by AT MOST `k` single
    * character deletions (radius-0 — `s` itself — included), as an array
    * column. Pure built-in collection lambdas (flatten/transform/
    * array_distinct over `substr`), so generation stays inside
    * whole-stage codegen — no UDF.
    *
    * One round maps every length-L variant to its L single-deletion
    * children (`concat(substr(v, 1, i-1), substr(v, i+1, len))`); k
    * rounds with a distinct-fold reach exactly the radius-<=k
    * neighborhood (deletion order is irrelevant, duplicates collapse). */
  private[ops] def deletionNeighborhood(s: Column, k: Int): Column = {
    val emptyArr = array().cast(ArrayType(StringType))
    var acc: Column = array(s)
    for (_ <- 1 to k) {
      val children = flatten(transform(acc, v =>
        when(length(v) > 0,
          transform(sequence(lit(1), length(v)), i =>
            concat(v.substr(lit(1), i - lit(1)),
              v.substr(i + lit(1), length(v)))))
          .otherwise(emptyArr)))
      acc = array_distinct(concat(acc, children))
    }
    acc
  }

  /** Distinct-string pairs (s_a < s_b lexically) within distance `k`:
    * the whole banding + verify pipeline runs over DISTINCT strings, so
    * a dup-heavy corpus (or any corpus at scale — key columns repeat
    * massively) pays candidate work proportional to its VOCABULARY, not
    * its row count. Exactly the SymSpell serving layout: neighborhoods
    * are per-distinct-term state. */
  private def distinctStringPairs(strs: DataFrame, k: Int): DataFrame = {
    val keyed = strs.select(col("__fj_s"),
      explode(deletionNeighborhood(col("__fj_s"), k)).as("__fj_v"))
    val a = keyed.select(col("__fj_v"), col("__fj_s").as("__fj_sa"))
    val b = keyed.select(col("__fj_v"), col("__fj_s").as("__fj_sb"))
    // two strings sharing m variants meet m times: collapse candidates
    // BEFORE the verify so the (cheap but quadratic-in-len) distance
    // kernel runs once per pair; length gate first (free), then the
    // thresholded exact verify — levenshtein(l, r, k) early-exits to -1
    a.join(b, Seq("__fj_v"))
      .where(col("__fj_sa") < col("__fj_sb"))
      .select("__fj_sa", "__fj_sb")
      .dropDuplicates("__fj_sa", "__fj_sb")
      .where(abs(length(col("__fj_sa")) - length(col("__fj_sb"))) <= k)
      .withColumn("__fj_d", levenshtein(col("__fj_sa"), col("__fj_sb"), k))
      .where(col("__fj_d") >= 0)
  }

  /** All pairs (id_a, id_b, dist) with `id_a < id_b` and
    * `levenshtein(s_a, s_b) <= k`, exact in both directions. `idCol` must
    * be an orderable, unique row identifier (its type is preserved); rows
    * with a null string are excluded (see null discipline above).
    *
    * Dup-heavy exactness AND efficiency: candidate generation and the
    * distance verify run over DISTINCT strings only; surviving string
    * pairs expand back to id pairs through two keyed joins (each id
    * carries exactly one string, so every id pair arises from exactly one
    * ordered string pair — no dedup needed), and exact-duplicate pairs
    * (distance 0) come from a per-string id self-join. */
  def pairs(df: DataFrame, idCol: Column, strCol: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= MaxK, s"k must be in [1, $MaxK], got $k")
    val base = df.select(idCol.as("__fj_id"), strCol.cast("string").as("__fj_s"))
      .where(col("__fj_s").isNotNull)
    val cand = distinctStringPairs(base.select("__fj_s").distinct(), k)
    // expand distinct-string pairs to id pairs; both id orientations of a
    // string pair fold into id_a < id_b via least/greatest
    val idsA = base.select(col("__fj_s").as("__fj_sa"), col("__fj_id").as("__fj_ia"))
    val idsB = base.select(col("__fj_s").as("__fj_sb"), col("__fj_id").as("__fj_ib"))
    val cross = cand.join(idsA, Seq("__fj_sa")).join(idsB, Seq("__fj_sb"))
      .select(least(col("__fj_ia"), col("__fj_ib")).as("id_a"),
        greatest(col("__fj_ia"), col("__fj_ib")).as("id_b"),
        col("__fj_d").cast("long").as("dist"))
    // exact duplicates: distance-0 pairs among ids sharing one string
    val da = base.select(col("__fj_s"), col("__fj_id").as("id_a"))
    val db = base.select(col("__fj_s"), col("__fj_id").as("id_b"))
    val dup0 = da.join(db, Seq("__fj_s"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("dist"))
    cross.unionByName(dup0)
  }

  /** Two-table variant: rows of `left` matched to rows of `right` within
    * distance `k` — record-linkage blocking with exact guarantees.
    * Output: (left_id, right_id, dist); both id types preserved. Same
    * vocabulary discipline as [[pairs]]: banding + verify over the two
    * DISTINCT string sets, id expansion after. */
  def join(left: DataFrame, leftId: Column, leftStr: Column,
      right: DataFrame, rightId: Column, rightStr: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= MaxK, s"k must be in [1, $MaxK], got $k")
    val lBase = left.select(leftId.as("left_id"), leftStr.cast("string").as("__fj_sa"))
      .where(col("__fj_sa").isNotNull)
    val rBase = right.select(rightId.as("right_id"), rightStr.cast("string").as("__fj_sb"))
      .where(col("__fj_sb").isNotNull)
    def neigh(df: DataFrame, sName: String) =
      df.select(col(sName)).distinct().select(col(sName),
        explode(deletionNeighborhood(col(sName), k)).as("__fj_v"))
    val cand = neigh(lBase, "__fj_sa").join(neigh(rBase, "__fj_sb"), Seq("__fj_v"))
      .select("__fj_sa", "__fj_sb")
      .dropDuplicates("__fj_sa", "__fj_sb")
      .where(abs(length(col("__fj_sa")) - length(col("__fj_sb"))) <= k)
      .withColumn("__fj_d", levenshtein(col("__fj_sa"), col("__fj_sb"), k))
      .where(col("__fj_d") >= 0)
    cand.join(lBase, Seq("__fj_sa")).join(rBase, Seq("__fj_sb"))
      .select(col("left_id"), col("right_id"), col("__fj_d").cast("long").as("dist"))
  }
}
