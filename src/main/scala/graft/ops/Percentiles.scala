package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** EXACT grouped quantiles at scale without a per-group full sort — the
  * histogram-then-pick design (the q58 rewrite, factored out so callers
  * and the high-cardinality gate share one implementation):
  *
  *  1. one pass computes per-group min/max bounds;
  *  2. one pass histograms each group's values into `nBuckets` equi-width
  *     buckets — bucket assignment is a BROADCAST JOIN against the
  *     group-sized bounds frame (never an O(groups) literal fold, which
  *     would blow up codegen and the driver at high cardinality);
  *  3. the driver locates each quantile's boundary RANKS inside their
  *     buckets from the O(groups × occupied-buckets) counts;
  *  4. one final pass sorts ONLY the picked (group, bucket) cells — a
  *     tiny fraction of the data — and serves the boundary values, which
  *     interpolate exactly like SQL `quantile_cont` (type-7).
  *
  * Driver state is O(groups × quantiles) picks plus the histogram counts
  * — never row data. Cost is three scans and a window over the picked
  * cells only; a naive `percentile()` aggregate buffers every group's
  * values in executor memory, which dies at 100 TB group sizes.
  *
  * Values ride DOUBLEs: exact for integer-cents-style inputs below 2^52,
  * so results match DuckDB's `quantile_cont` bit-for-bit there. */
object Percentiles {

  /** Exact grouped quantiles of `valueCol` (numeric, cast to double)
    * per `groupCol` (string; NULL is a group like any other). Returns
    * one row per group: `groupCol, outNames...` with `outNames(i)` =
    * the `qs(i)` quantile.
    *
    * Two rank-location regimes, switched on GROUP CARDINALITY so driver
    * state stays bounded: up to `maxDriverCells / nBuckets` groups the
    * histogram counts collect and the driver locates boundary ranks (the
    * cheapest plan for the common few-groups/100-TB-group-sizes shape);
    * past it, [[groupedQuantilesDistributed]] locates ranks with a
    * cumulative-count window — O(1) driver state at ANY group count (a
    * per-domain percentile over 10^6 domains must not push ~10^9
    * histogram entries through the driver). */
  def groupedQuantiles(input: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double], outNames: Seq[String], nBuckets: Int = 1024,
      maxDriverCells: Long = 1L << 20): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0,1]: $qs")
    require(outNames.length == qs.length,
      s"${outNames.length} output names for ${qs.length} quantiles")
    require(nBuckets >= 2, s"need at least 2 buckets, got $nBuckets")
    val spark = input.sparkSession
    val nB = nBuckets
    val data = input
      .select(col(s"`$groupCol`").cast("string").as("g"),
        col(s"`$valueCol`").cast("double").as("c"))
      .where(col("c").isNotNull)
    // group-cardinality probe: collect bounds only up to the driver
    // budget +1 (the aggregate runs either way; the LIMIT caps what
    // reaches the driver). A truncated probe proves high cardinality.
    val groupCap = math.max(1L, maxDriverCells / nB).toInt
    val boundRows = data.groupBy("g").agg(min("c").as("__mn"), max("c").as("__mx"))
      .limit(groupCap + 1).collect()
    if (boundRows.length > groupCap)
      return groupedQuantilesDistributed(data, groupCol, qs, outNames, nB)
    val bounds = boundRows.map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // Bucket assignment, two regimes. FEW groups (the common analytic
    // shape): inline the collected bounds as a literal CASE fold — no
    // broadcast exchange on either downstream job, the cheapest plan.
    // MANY groups: a BROADCAST JOIN against a locally-rebuilt bounds
    // frame (the aggregate must not re-execute when the join
    // materializes) — an O(groups) literal fold would blow up codegen
    // and the driver. Null-safe group match (<=>) in both: a NULL group
    // value must still get a bucket — plain === would leave its rows
    // NULL-bucketed and NPE in the histogram collect.
    val bucketed =
      if (bounds.size <= 16) {
        val bucketCol = bounds.foldLeft(lit(null).cast("int")) {
          case (acc, (g, (mn, mx))) => when(col("g") <=> lit(g),
            least(greatest(width_bucket(col("c"), lit(mn), lit(mx + 1.0), lit(nB)),
              lit(1)), lit(nB)).cast("int")).otherwise(acc)
        }
        data.withColumn("b", bucketCol).select("g", "c", "b")
      } else {
        val boundsLocal = spark.createDataFrame(
          spark.sparkContext.parallelize(
            bounds.toSeq.map { case (g, (mn, mx)) => Row(g, mn, mx) }, 1),
          StructType(Seq(StructField("__bg", StringType, nullable = true),
            StructField("__mn", DoubleType, nullable = false),
            StructField("__mx", DoubleType, nullable = false))))
        data.join(broadcast(boundsLocal), col("g") <=> col("__bg"), "inner")
          .withColumn("b", least(greatest(
            width_bucket(col("c"), col("__mn"), col("__mx") + lit(1.0), lit(nB)),
            lit(1)), lit(nB)).cast("int"))
          .select("g", "c", "b")
      }
    val hist = bucketed.groupBy("g", "b").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // driver: locate each quantile's boundary ranks in their buckets
    final case class Pick(g: String, b: Int, localRank: Long, globalRank: Long)
    // Option ordering: a NULL group sorts first instead of NPE-ing sorted
    val groups = bounds.keys.toSeq.sortBy(Option(_))
    val perGroup = groups.map { g =>
      val bs = (1 to nB).map(b => b -> hist.getOrElse((g, b), 0L))
      val n = bs.map(_._2).sum
      def locate(rank: Long): Pick = {
        var cum = 0L
        var res: Pick = null
        val it = bs.iterator
        while (res == null && it.hasNext) {
          val (b, cnt) = it.next()
          if (rank <= cum + cnt) res = Pick(g, b, rank - cum, rank) else cum += cnt
        }
        if (res == null)
          throw new IllegalStateException(s"rank $rank beyond group size $cum")
        res
      }
      val ranks = qs.flatMap { p =>
        val pos = (n - 1) * p
        Seq(math.floor(pos).toLong + 1, math.ceil(pos).toLong + 1)
      }.distinct
      g -> (n, ranks.map(locate))
    }.toMap
    val picks = perGroup.values.flatMap(_._2).toSeq
    // sentinel for the NULL group in the string join key (concat_ws
    // SKIPS nulls, which would collapse "null#5" to "5"). The isin lists
    // compile to InSet hash probes above the conversion threshold — no
    // O(groups) expression tree.
    def gkey(g: String): String = if (g == null) "\u0000null" else g
    val neededKeys = picks.map(p => s"${gkey(p.g)}#${p.b}").distinct
    val w = Window.partitionBy("g", "b").orderBy("c")
    val picked = bucketed
      .where(concat_ws("#", coalesce(col("g"), lit("\u0000null")), col("b"))
        .isin(neededKeys: _*))
      .withColumn("rn", row_number().over(w))
      .where(col("rn").isin(picks.map(_.localRank).distinct: _*))
      .select("g", "b", "rn", "c").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2).toLong) -> r.getDouble(3))
      .toMap
    def valueAt(g: String, rank: Long): Double = {
      val p = perGroup(g)._2.find(_.globalRank == rank).get
      picked((g, p.b, p.localRank))
    }
    val out = groups.map { g =>
      val n = perGroup(g)._1
      val vals = qs.map { p =>
        val pos = (n - 1) * p
        val lo = math.floor(pos).toLong + 1 // ranks are 1-based
        val hi = math.ceil(pos).toLong + 1
        val frac = pos - math.floor(pos)
        // same arithmetic shape as quantile_cont: (1-frac)·lo + frac·hi
        (1.0 - frac) * valueAt(g, lo) + (if (hi != lo) frac * valueAt(g, hi) else 0.0)
      }
      Row.fromSeq(g +: vals)
    }
    val schema = StructType(StructField(groupCol, StringType, nullable = true) +:
      outNames.map(n => StructField(n, DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1), schema)
  }

  /** The HIGH-CARDINALITY lane: identical semantics (same buckets, same
    * type-7 interpolation arithmetic), rank location fully distributed —
    * the driver never sees a histogram, a pick, or a value.
    *
    *  1. one pass computes per-group (min, max, n) — kept as a FRAME and
    *     broadcast into bucket assignment;
    *  2. the (group, bucket) histogram gets a cumulative-count window per
    *     group; each quantile's boundary ranks (floor/ceil of (n-1)q + 1)
    *     land in exactly the bucket whose (cumPrev, cum] interval holds
    *     them — an explode + range filter, no driver walk;
    *  3. picked cells semi-join back to the bucketed rows, a per-cell
    *     row_number window serves each rank's VALUE, and one grouped
    *     aggregate folds lo/hi values into the interpolation.
    *
    * `data` arrives pre-normalized as (g STRING, c DOUBLE not-null). */
  private def groupedQuantilesDistributed(data: DataFrame, groupCol: String,
      qs: Seq[Double], outNames: Seq[String], nB: Int): DataFrame = {
    val bounds = data.groupBy("g")
      .agg(min("c").as("__mn"), max("c").as("__mx"), count(lit(1)).as("__n"))
      .withColumnRenamed("g", "__bg")
    val bucketed = data.join(broadcast(bounds), col("g") <=> col("__bg"), "inner")
      .withColumn("b", least(greatest(
        width_bucket(col("c"), col("__mn"), col("__mx") + lit(1.0), lit(nB)),
        lit(1)), lit(nB)).cast("int"))
      .select("g", "c", "b")
    val wcum = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = bucketed.groupBy("g", "b").agg(count(lit(1)).as("cnt"))
      .join(broadcast(bounds), col("g") <=> col("__bg"), "inner")
      .withColumn("cum", sum("cnt").over(wcum))
      .withColumn("cumPrev", col("cum") - col("cnt"))
    // each quantile contributes its floor and ceil boundary ranks; the
    // range filter drops every (rank, bucket) pair but the containing one
    val pickStructs = array(qs.zipWithIndex.flatMap { case (q, i) => Seq(
      struct(lit(i).as("qi"), lit(true).as("lo"),
        (floor((col("__n") - 1) * lit(q)) + 1).cast("long").as("r")),
      struct(lit(i).as("qi"), lit(false).as("lo"),
        (ceil((col("__n") - 1) * lit(q)) + 1).cast("long").as("r")))
    }: _*)
    val picks = hist.withColumn("pk", explode(pickStructs))
      .where(col("pk.r") > col("cumPrev") && col("pk.r") <= col("cum"))
      .select(col("g").as("__pg"), col("b").as("__pb"),
        col("pk.qi").as("qi"), col("pk.lo").as("lo"), col("__n").as("n"),
        (col("pk.r") - col("cumPrev")).as("lr"))
    // only the picked cells' rows are ever ranked — a tiny fraction of
    // the data, exactly like the driver lane's final pass
    val cells = picks.select(col("__pg"), col("__pb")).distinct()
    val wrn = Window.partitionBy("g", "b").orderBy("c")
    val ranked = bucketed
      .join(cells, col("g") <=> col("__pg") && col("b") === col("__pb"), "left_semi")
      .withColumn("rn", row_number().over(wrn))
    val vals = ranked.join(picks,
        col("g") <=> col("__pg") && col("b") === col("__pb") &&
          col("rn") === col("lr"), "inner")
      .select(col("g"), col("qi"), col("lo"), col("n"), col("c"))
    // fold lo/hi per group into the type-7 interpolation — the same
    // (1-frac)·lo + frac·hi arithmetic as the driver lane, so the two
    // regimes agree bit-for-bit
    val aggs = qs.indices.flatMap { i => Seq(
      max(when(col("qi") === i && col("lo"), col("c"))).as(s"__lo$i"),
      max(when(col("qi") === i && !col("lo"), col("c"))).as(s"__hi$i"))
    } :+ first("n").as("__gn")
    val folded = vals.groupBy("g").agg(aggs.head, aggs.tail: _*)
    val outCols = qs.zipWithIndex.map { case (q, i) =>
      val pos = (col("__gn") - 1) * lit(q)
      val frac = pos - floor(pos)
      ((lit(1.0) - frac) * col(s"__lo$i") +
        when(frac > 0.0, frac * col(s"__hi$i")).otherwise(lit(0.0)))
        .as(outNames(i))
    }
    folded.select((col("g").as(groupCol) +: outCols).toIndexedSeq: _*)
  }
}
