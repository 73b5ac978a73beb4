package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-keyed joins Spark's built-in operators don't express directly:
  * as-of (latest-state lookup) and point-in-interval (range) joins.
  *
  * Both are composed from existing shuffle/window operators — preference
  * (a) of the custom-operator ladder — so Catalyst keeps pushdown, AQE and
  * whole-stage codegen; neither materializes a cartesian or per-key loop.
  *
  * No reference counterpart (the reference pipeline is batch snapshot
  * migration only); semantics follow the public as-of/range-join surfaces
  * of kdb/Pandas `merge_asof` and DuckDB `ASOF JOIN`.
  */
object TemporalJoin {

  /** Backward as-of join: for every left row, adopt `rightValueCols` from
    * the single right row with the greatest `rightTs <= leftTs` in the same
    * key group (ties on `rightTs` broken by `rightTiebreak` ascending, so
    * the result is deterministic); left rows with no predecessor keep NULLs
    * — LEFT OUTER semantics.
    *
    * Plan shape: ONE shuffle. Both sides union into a single stream tagged
    * by side, sorted per key by (ts, side) — right rows first at equal ts,
    * so a state change AT the left timestamp is visible — and each left row
    * reads the latest non-null right payload via `last(ignoreNulls)` over a
    * running window. Versus the naive inequality join (O(left × right) per
    * key, then an argmax), this is sort-merge cost: at 100 TB the union
    * shuffles each side exactly once and the window is a single sort per
    * partition. A pathologically hot key serializes into one task's sort
    * (same bound as any per-key window); pre-filtering right to the columns
    * named keeps the carried payload minimal.
    *
    * SQL null semantics: right rows with a NULL key or NULL timestamp can
    * never be "the latest state" and are dropped up front; left rows always
    * survive.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightValueCols: Seq[String],
      rightTiebreak: Option[String] = None): DataFrame = {
    val clash = rightValueCols.filter(left.columns.contains)
    require(clash.isEmpty,
      s"rightValueCols collide with left columns: ${clash.mkString(",")}")
    require(rightValueCols.nonEmpty, "rightValueCols must name at least one column")

    val leftRest = left.columns.toSeq.filterNot(keys.contains)
    val tieName = "_asof_tie"
    val rightClean = right.where(
      keys.map(k => col(s"`$k`").isNotNull).reduce(_ && _) && col(s"`$rightTs`").isNotNull)

    val lpart = left.select(
      keys.map(k => col(s"`$k`")) ++
        Seq(col(s"`$leftTs`").as("_ts"), lit(1).as("_side"),
          lit(null).cast("long").as(tieName)) ++
        leftRest.map(c => col(s"`$c`")) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rpart = rightClean.select(
      keys.map(k => col(s"`$k`")) ++
        Seq(col(s"`$rightTs`").as("_ts"), lit(0).as("_side"),
          rightTiebreak.map(t => col(s"`$t`").cast("long"))
            .getOrElse(lit(0L)).as(tieName)) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValueCols.map(c => col(s"`$c`")): _*)

    val w = Window.partitionBy(keys.map(c => col(s"`$c`")): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col(tieName).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightValueCols.foldLeft(lpart.unionByName(rpart)) { (d, c) =>
      d.withColumn(c, last(col(s"`$c`"), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 1).drop("_ts", "_side", tieName)
  }

  /** Integer floor-division column (exact for any sign — `div` truncates
    * toward zero, which would mis-bin negative epochs). */
  private def floorDiv(c: String, d: Long) =
    expr(s"CAST(`$c` AS BIGINT) div ${d}L + (CASE WHEN CAST(`$c` AS BIGINT) % ${d}L < 0 THEN -1 ELSE 0 END)")

  /** Point-in-interval (range) join: every (interval row, point row) pair
    * in the same key group with `startCol <= pointTs < endCol` — INNER,
    * end-exclusive. Timestamps are integral epoch units (any resolution,
    * both sides alike).
    *
    * Plan shape: the classic binning rewrite of an inequality join. Points
    * map to the single width-`binWidth` bin containing their timestamp;
    * intervals replicate to each bin they overlap; the join is then a plain
    * EQUI-join on (keys, bin) with the exact range predicate re-applied.
    * A point lies in exactly one bin, so each qualifying pair appears
    * exactly once — no dedup pass. Versus a raw theta-join (a broadcast
    * nested loop or worse at 100 TB), this shuffles each side once, hash-
    * partitioned, and AQE sizes the reducers. Choose `binWidth` near the
    * typical interval length: replication is ceil(len/binWidth)+1 copies
    * per interval; `maxBinsPerInterval` fails loudly (cluster-side, before
    * the join inflates) when an outlier interval would fan out past it.
    */
  def pointIntervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointTs: String, startCol: String, endCol: String, binWidth: Long,
      pointValueCols: Seq[String] = Seq.empty,
      maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val clash = (pointTs +: pointValueCols).filter(intervals.columns.contains)
    require(clash.isEmpty,
      s"point columns collide with interval columns: ${clash.mkString(",")}")

    val pb = points.select(
      keys.map(k => col(s"`$k`")) ++
        Seq(floorDiv(pointTs, binWidth).as("_bin"), col(s"`$pointTs`")) ++
        pointValueCols.map(c => col(s"`$c`")): _*)
    // end-exclusive: the last occupied bin is the one holding end-1
    val iv = intervals
      .withColumn("_bin_lo", floorDiv(startCol, binWidth))
      .withColumn("_bin_hi", floorDiv(endCol, binWidth) -
        when(expr(s"CAST(`$endCol` AS BIGINT) % ${binWidth}L") === 0, 1).otherwise(0))
      .withColumn("_bin", explode(when(col("_bin_hi") < col("_bin_lo"),
          array().cast("array<bigint>")) // empty interval: no bins, no matches
        .when(col("_bin_hi") - col("_bin_lo") >= maxBinsPerInterval,
          expr(s"raise_error(concat('interval spans more than $maxBinsPerInterval bins: ', " +
            s"CAST(`$startCol` AS STRING), '..', CAST(`$endCol` AS STRING), " +
            s"' at binWidth $binWidth — raise binWidth or maxBinsPerInterval'))"))
        .otherwise(sequence(col("_bin_lo"), col("_bin_hi")))))
      .drop("_bin_lo", "_bin_hi")

    iv.join(pb, keys :+ "_bin")
      .where(col(s"`$pointTs`") >= col(s"`$startCol`") &&
        col(s"`$pointTs`") < col(s"`$endCol`"))
      .drop("_bin")
  }
}
