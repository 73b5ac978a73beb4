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
  * 100-TB shape: the only wide operation is an equi-join keyed by variant
  * string — shuffle volume is O(rows * |neighborhood|) small keys, never
  * documents and never a cross product. |neighborhood| is C(len, <=k)
  * (len+1 keys at k=1), which is why the op targets SHORT join keys —
  * titles, URLs, codes, names; for long text use [[Dedup]]'s MinHash
  * banding instead (that is the published division of labor: FastSS for
  * keys, LSH for documents). Exactly-duplicate strings all share their
  * own variant-0 key, so dup-heavy corpora should collapse to canonical
  * representatives first (exact dedup) to keep that key's bucket small.
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

  /** All pairs (id_a, id_b, dist) with `id_a < id_b` and
    * `levenshtein(s_a, s_b) <= k`, exact in both directions. `idCol` must
    * be an orderable row identifier (its type is preserved); rows with a
    * null string are excluded (see null discipline above). */
  def pairs(df: DataFrame, idCol: Column, strCol: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= MaxK, s"k must be in [1, $MaxK], got $k")
    val base = df.select(idCol.as("__fj_id"), strCol.cast("string").as("__fj_s"))
      .where(col("__fj_s").isNotNull)
    val keyed = base.select(col("__fj_id"), col("__fj_s"),
      explode(deletionNeighborhood(col("__fj_s"), k)).as("__fj_v"))
    val a = keyed.select(col("__fj_v"),
      col("__fj_id").as("id_a"), col("__fj_s").as("__fj_sa"))
    val b = keyed.select(col("__fj_v"),
      col("__fj_id").as("id_b"), col("__fj_s").as("__fj_sb"))
    // two strings sharing m variants meet m times: collapse candidates
    // BEFORE the verify so the (cheap but quadratic-in-len) distance
    // kernel runs once per pair
    val cand = a.join(b, Seq("__fj_v"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__fj_sa", "__fj_sb")
      .dropDuplicates("id_a", "id_b")
    // length gate first (free), then the thresholded exact verify:
    // levenshtein(l, r, k) early-exits to -1 past the band
    cand
      .where(abs(length(col("__fj_sa")) - length(col("__fj_sb"))) <= k)
      .withColumn("__fj_d", levenshtein(col("__fj_sa"), col("__fj_sb"), k))
      .where(col("__fj_d") >= 0)
      .select(col("id_a"), col("id_b"), col("__fj_d").cast("long").as("dist"))
  }

  /** Two-table variant: rows of `left` matched to rows of `right` within
    * distance `k` — record-linkage blocking with exact guarantees.
    * Output: (left_id, right_id, dist); both id types preserved. */
  def join(left: DataFrame, leftId: Column, leftStr: Column,
      right: DataFrame, rightId: Column, rightStr: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= MaxK, s"k must be in [1, $MaxK], got $k")
    def side(df: DataFrame, id: Column, s: Column, idName: String, sName: String) =
      df.select(id.as(idName), s.cast("string").as(sName))
        .where(col(sName).isNotNull)
        .select(col(idName), col(sName),
          explode(deletionNeighborhood(col(sName), k)).as("__fj_v"))
    val a = side(left, leftId, leftStr, "left_id", "__fj_sa")
    val b = side(right, rightId, rightStr, "right_id", "__fj_sb")
    a.join(b, Seq("__fj_v"))
      .select("left_id", "right_id", "__fj_sa", "__fj_sb")
      .dropDuplicates("left_id", "right_id")
      .where(abs(length(col("__fj_sa")) - length(col("__fj_sb"))) <= k)
      .withColumn("__fj_d", levenshtein(col("__fj_sa"), col("__fj_sb"), k))
      .where(col("__fj_d") >= 0)
      .select(col("left_id"), col("right_id"), col("__fj_d").cast("long").as("dist"))
  }
}
