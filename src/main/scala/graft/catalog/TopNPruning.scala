package graft.catalog

/** The TOP-N bound-pruning walk, generic over the pruning granule — used
  * at the FILE tier (per-file footer stats, GraftPruningScanBuilder) and
  * at the SHARD tier (per-shard [[ShardSummary]] folds, the two-level
  * planner), which is what lets `ORDER BY c LIMIT n` on a 10^6-file
  * sort-ordered table skip whole manifest shards unread before the file
  * tier ever sees a stat.
  *
  * Each item is `(key, stats)` with the stat-map key scheme both tiers
  * share (`rows`, `min.<c>`/`max.<c>`, `nulls.<c>`). MULTI-column
  * orderings prune through per-item BOX bounds: with each column's bounds
  * oriented along its sort direction, any fully-non-null row of an item
  * sits between the item's lo tuple and hi tuple in the LEXICOGRAPHIC
  * query order (coordinate-wise bounds imply tuple bounds). No clustering
  * assumption is needed for soundness — on overlapping boxes nothing
  * prunes, which is merely unhelpful.
  *
  * Null discipline per column: a NULLS LAST column's null rows escape the
  * hi-tuple bound, so they are deducted from the item's coverage
  * contribution (unknown counts contribute 0 — coverage only shrinks);
  * leading-column nulls keep the single-column rules (nulls-first rows
  * are global top candidates; nulls-last rows need the global feasibility
  * check). A NULLS FIRST column's null rows sort earlier than the bounded
  * tuple, so the hi bound still covers them — but the lo bound does not,
  * so exclusion additionally requires every nulls-first column's null
  * count to be provably zero. Writer-truncated string bounds stay sound:
  * only outer-bound validity is used on both sides of the walk. */
object TopNPruning {

  /** Keep-set of `items` for `ORDER BY cols LIMIT n`: every item whose
    * rows could reach the top-n. `cols` are `(name, ascending,
    * nullsFirst)`; `gtOf` is the canonical stat-string ordering per
    * column (None = column unprunable -> everything kept). Items missing
    * `rows` make coverage unprovable -> everything kept; items missing
    * bounds are kept and contribute nothing. */
  def prune[K](items: Seq[(K, Map[String, String])],
      cols: Seq[(String, Boolean, Boolean)], n: Int,
      gtOf: String => Option[(String, String) => Boolean]): Seq[K] = {
    val kept0 = items.map(_._1)
    val k = cols.size
    val gts = cols.map { case (c, _, _) => gtOf(c).getOrElse(return kept0) }
    final case class F(key: K, lo: Option[Seq[String]], hi: Option[Seq[String]],
      nulls: Seq[Option[Long]], rows: Long)
    val fs = items.map { case (key, st) =>
      val rows = st.get("rows").map(_.toLong).getOrElse(return kept0)
      // orient bounds along each column's ORDER: lo_i = first-sorting bound
      val los = cols.map { case (c, asc, _) =>
        st.get(if (asc) s"min.$c" else s"max.$c") }
      val his = cols.map { case (c, asc, _) =>
        st.get(if (asc) s"max.$c" else s"min.$c") }
      F(key,
        if (los.forall(_.isDefined)) Some(los.map(_.get)) else None,
        if (his.forall(_.isDefined)) Some(his.map(_.get)) else None,
        cols.map { case (c, _, _) => st.get(s"nulls.$c").map(_.toLong) }, rows)
    }
    // before(a, b): tuple a sorts strictly before tuple b in query order
    def before(a: Seq[String], b: Seq[String]): Boolean = {
      var i = 0
      while (i < k) {
        val asc = cols(i)._2
        val gt = gts(i)
        if (if (asc) gt(b(i), a(i)) else gt(a(i), b(i))) return true
        if (if (asc) gt(a(i), b(i)) else gt(b(i), a(i))) return false
        i += 1
      }
      false
    }
    if (!cols.head._3) {
      // leading nulls sort LAST: they reach the top-n only when non-null
      // rows cannot fill it — then prune nothing (needs all counts known)
      val nonNull = fs.map(f => f.nulls.head.map(f.rows - _).getOrElse(return kept0))
      if (nonNull.sum < n) return kept0
    }
    // global null contribution (leading nulls-first: every such row is a
    // top candidate wherever it lives; unknown counts contribute 0)
    val n0 = if (cols.head._3) fs.flatMap(_.nulls.head).sum else 0L
    // coverage contribution: rows provably at-or-before the item's hi
    // tuple — leading nulls deducted always (first-rows live in n0,
    // last-rows escape hi), tail NULLS LAST nulls deducted (they escape
    // hi), tail NULLS FIRST nulls covered (they sort before the bound).
    // Over-deduction of multi-null rows only shrinks coverage: sound.
    def contribution(f: F): Long = {
      var c = f.nulls.head.map(f.rows - _).getOrElse(0L)
      var i = 1
      while (i < k) {
        if (!cols(i)._3) c -= f.nulls(i).getOrElse(return 0L)
        i += 1
      }
      math.max(c, 0L)
    }
    // candidate cutoffs: the items' far bound tuples, walked in query order
    val bounded = fs.filter(f => f.lo.isDefined && f.hi.isDefined)
      .sortWith((a, b) => before(a.hi.get, b.hi.get))
    var acc = n0
    var cutoff: Option[Seq[String]] = None
    val it = bounded.iterator
    while (cutoff.isEmpty && it.hasNext) {
      val f = it.next()
      acc += contribution(f)
      if (acc >= n) cutoff = Some(f.hi.get)
    }
    cutoff match {
      case None => kept0 // cannot prove n rows before any bound
      case Some(t) =>
        // exclude only items whose EVERY possible row sits strictly
        // beyond the cutoff: lo tuple after T, and provably no null rows
        // in any nulls-first column that would leapfrog it
        val nullsFirstIdx = cols.zipWithIndex.collect { case ((_, _, true), i) => i }
        fs.filter { f =>
          val boundOut = f.lo.exists(lo => before(t, lo))
          val nullSafe = nullsFirstIdx.forall(i => f.nulls(i).contains(0L))
          !(boundOut && nullSafe)
        }.map(_.key)
    }
  }
}
