package graft.catalog

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.StructType

/** Per-MANIFEST-SHARD pruning summary — the second metadata tier of
  * two-level scan planning (Iceberg's manifest-list idea re-expressed for
  * this catalog's pointer log).
  *
  * A shard is the unit of commit metadata ([[Manifest]]): the files one
  * snapshot added, or a consolidated rewrite's whole partition of the
  * inventory. At the 10^6-file regime the driver cost of a FIRST plan is
  * dominated by parsing every shard's JSON file inventory before file-level
  * skipping ([[FileStats]]) can see a single stat. The fix is to record,
  * in the pointer log itself (`shard_summaries`, keyed by shard name), an
  * O(columns)-sized fold of each shard's per-file stats — then a predicate
  * that provably excludes every file a shard COULD hold skips the shard
  * UNREAD. Planning cost becomes O(matching shards), not O(all files):
  * a `day = X` pin on a 10^7-file table parses the handful of shards whose
  * summary admits X and never opens the rest.
  *
  * Soundness is inherited from the file tier by construction: every folded
  * key is a WIDENING of its files' values (min of mins / max of maxes /
  * sums), so [[FileStats.mayMatch]] over the fold can only be MORE
  * permissive than over any member file — a shard is skipped only when
  * every file in it would have been skipped. Keys are folded only when
  * EVERY file contributes (a file without the stat makes the column's fold
  * unknowable — that key is simply absent, and absence never skips).
  * Summaries are pure derivations of write-once shards: computed once at
  * commit, valid forever.
  *
  * Fields:
  *  - `fileCount`: shard size; 0 = provably matches nothing.
  *  - `stats`: the folded stat map, same key scheme the file tier uses
  *    (`rows` summed, `nulls.<c>` summed, `min.<c>`/`max.<c>` range-folded
  *    with the canonical per-type ordering, hive `col=value` path values of
  *    partition columns folded in as bounds). Per-file-only keys (`bytes`,
  *    `bloom.<c>`, row-lineage bases) never fold.
  *  - `buckets`: the distinct `__bucket=b/` ids, present only when EVERY
  *    file carries one (and the set is small) — bucket-key equality skips
  *    whole shards of foreign buckets.
  *  - `ptTokens`: the distinct `__pt=<v>/` hidden-transform tokens under
  *    the same every-file/small-set discipline — a time- or
  *    truncate-transform predicate skips shards of foreign periods.
  *  - `dirs`: the distinct top-level snapshot dirs the shard's files live
  *    under (for layout questions answered without the inventory).
  */
final case class ShardSummary(
    fileCount: Int,
    stats: Map[String, String],
    buckets: Option[Seq[Int]],
    ptTokens: Option[Seq[String]],
    dirs: Option[Seq[String]]) {

  def toJson: JObj = Json.obj(
    (Vector(
      "n"     -> (Json.num(fileCount.toLong): JValue),
      "stats" -> (Json.fromStrMap(stats): JValue)) ++
      buckets.map(bs => "buckets" ->
        (JArr(bs.toVector.map(b => Json.num(b.toLong): JValue)): JValue)).toVector ++
      ptTokens.map(ts => "pt" ->
        (JArr(ts.toVector.map(JStr(_): JValue)): JValue)).toVector ++
      dirs.map(ds => "dirs" ->
        (JArr(ds.toVector.map(JStr(_): JValue)): JValue)).toVector): _*)
}

object ShardSummary {

  /** Above this many distinct values a token set is dropped (None =
    * unconstraining) rather than bloating the pointer log — pruning
    * degrades to the folded min/max keys, never breaks. */
  val TokenCap = 64

  def fromJson(o: JObj): ShardSummary = ShardSummary(
    fileCount = o.long("n").toInt,
    stats = o.strMap("stats"),
    buckets = o.get("buckets") match {
      case Some(JArr(vs)) => Some(vs.collect { case JNum(n) => n.toInt })
      case _ => None
    },
    ptTokens = o.get("pt") match {
      case Some(JArr(vs)) => Some(vs.collect { case JStr(s) => s })
      case _ => None
    },
    dirs = o.get("dirs") match {
      case Some(JArr(vs)) => Some(vs.collect { case JStr(s) => s })
      case _ => None
    })

  /** Hive `col=value` path segments of one file, as exact min=max bounds —
    * the same derivation the file tier's pruning makes (partition columns
    * live in the PATH, not the footer). The null sentinel contributes
    * nothing (a null-partition file has no bound for the column). */
  private def pathVals(f: String, partCols: Set[String],
      schema: StructType): Map[String, String] =
    if (partCols.isEmpty) Map.empty
    else f.split('/').iterator.flatMap { seg =>
      val i = seg.indexOf('=')
      if (i <= 0) Iterator.empty
      else {
        val k = seg.substring(0, i)
        val v = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(seg.substring(i + 1))
        if (partCols.contains(k) && schema.fieldNames.contains(k) &&
            v != "__HIVE_DEFAULT_PARTITION__")
          Iterator(s"min.$k" -> v, s"max.$k" -> v)
        else Iterator.empty
      }
    }.toMap

  /** Fold one shard's inventory into its summary. Pure function of the
    * write-once [[Manifest]] (plus the schema for type-aware bound
    * ordering and the partition columns for path-value bounds), so the
    * result is computed once at commit and never revisited. */
  def of(m: Manifest, schema: StructType, partitionCols: Seq[String]): ShardSummary = {
    val n = m.files.size
    if (n == 0) // rows=0 keeps the LIMIT/TopN coverage walks provable
      return ShardSummary(0, Map("rows" -> "0"), Some(Nil), Some(Nil), Some(Nil))
    val pcols = partitionCols.toSet
    val perFile: Seq[Map[String, String]] =
      m.files.map(f => m.fileStats.getOrElse(f, Map.empty) ++ pathVals(f, pcols, schema))
    val out = Map.newBuilder[String, String]
    // `rows` and `nulls.<c>`: exact sums, present only when every file has
    // the key (a partial sum would understate and could fake an all-null
    // or zero-null proof)
    def sumKey(key: String): Unit = {
      val vs = perFile.map(_.get(key))
      if (vs.forall(_.isDefined)) {
        try out += (key -> vs.map(_.get.toLong).sum.toString)
        catch { case _: NumberFormatException => () }
      }
    }
    sumKey("rows")
    val allKeys = perFile.iterator.flatMap(_.keysIterator).toSet
    allKeys.filter(_.startsWith("nulls.")).foreach(sumKey)
    // min/max: range fold under the column type's canonical ordering —
    // the widened bound pair the file tier's evaluator already treats as
    // outer bounds (writer-truncated string stats have the same contract)
    allKeys.filter(_.startsWith("min.")).map(_.stripPrefix("min.")).foreach { c =>
      schema.fields.find(_.name == c).foreach { fld =>
        val mins = perFile.map(_.get(s"min.$c"))
        val maxs = perFile.map(_.get(s"max.$c"))
        if (mins.forall(_.isDefined) && maxs.forall(_.isDefined)) {
          try {
            out += (s"min.$c" -> mins.map(_.get)
              .reduce((a, b) => if (ColumnStats.gt(fld.dataType, a, b)) b else a))
            out += (s"max.$c" -> maxs.map(_.get)
              .reduce((a, b) => if (ColumnStats.gt(fld.dataType, a, b)) a else b))
          } catch { case _: Exception => () } // unorderable type: no fold
        }
      }
    }
    def tokenSet(tok: String => Option[String]): Option[Seq[String]] = {
      val ts = m.files.map(tok)
      if (!ts.forall(_.isDefined)) None
      else {
        val d = ts.map(_.get).distinct
        if (d.size > TokenCap) None else Some(d.sorted)
      }
    }
    val buckets = {
      val bs = m.files.map(BucketPruning.bucketIdOf)
      if (!bs.forall(_.isDefined)) None
      else {
        val d = bs.map(_.get).distinct
        if (d.size > TokenCap) None else Some(d.sorted)
      }
    }
    val pt = tokenSet(TruncateTransform.ptTokenOf)
    val dirs = {
      val d = m.files.map(_.split("/").take(2).mkString("/")).distinct
      if (d.size > TokenCap) None else Some(d.sorted)
    }
    ShardSummary(n, out.result(), buckets, pt, dirs)
  }

  /** May ANY file of a shard with this summary match? The shard-level
    * mirror of the file tier's keep test: bucket-id admissibility, hidden
    * transform token admissibility, then [[FileStats.mayMatch]] over the
    * folded stats (no bloom tier — blooms are per-file sidecars and do
    * not fold). `false` means every file the shard could hold is provably
    * unmatchable and the shard is never opened. */
  def mayMatch(s: ShardSummary, schema: StructType, preds: Seq[Expression],
      bucketAdm: Option[Set[Int]], ptAdm: Option[String => Boolean]): Boolean = {
    if (s.fileCount == 0) return false
    val bucketOk = (bucketAdm, s.buckets) match {
      case (Some(adm), Some(ids)) => ids.exists(adm.contains)
      case _ => true
    }
    val ptOk = (ptAdm, s.ptTokens) match {
      case (Some(adm), Some(ts)) => ts.exists(adm)
      case _ => true
    }
    bucketOk && ptOk &&
      preds.forall(p => FileStats.mayMatch(s.stats, schema, p))
  }
}
