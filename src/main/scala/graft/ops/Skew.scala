package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation: two-phase salted groupBy.
  *
  * A plain `groupBy(key)` over data where a handful of keys dominate sends
  * each hot key's entire volume to ONE reducer — the straggler that decides
  * job wall-clock at 100 TB. Salting spreads each key over `saltBuckets`
  * partial groups (phase 1), then merges the per-salt partials (phase 2).
  * Correct for decomposable aggregates (sum/count/min/max here; avg =
  * sum/count downstream). AQE's skew-join handling covers joins; this is
  * the aggregation-side equivalent, kept explicit because AQE does not
  * re-salt a single giant group.
  *
  * Cost model: phase 1 shuffles the same rows but over saltBuckets x
  * reducers (no hot spot); phase 2 shuffles only keys x saltBuckets partial
  * rows — negligible. Worth it when key skew is heavy; measurably wasteful
  * when data is uniform (two shuffles), so it is an explicit operator, not
  * a default.
  */
object Skew {

  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: Column,
      saltBuckets: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    val salted = df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
    salted
      .groupBy(keys: _*)
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("cnt"))
  }
}
