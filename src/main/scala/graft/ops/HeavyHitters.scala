package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAgg

/** EXACT distributed heavy hitters in two scans — the composition that
  * turns the Misra–Gries SKETCH into an exact answer:
  *
  *   1. One scan folds every partition into an O(k) [[MisraGriesAgg]]
  *      summary (map-side combinable; the merged sketch also carries the
  *      exact stream length n). The frequent-items invariant guarantees
  *      every item with true count > n/k SURVIVES a capacity-(k-1)
  *      sketch — the candidate set can over-approximate but never miss.
  *   2. One scan counts the (at most k-1) candidates exactly — the
  *      corpus filters by a broadcast-literal IN over the candidate set,
  *      so the second pass aggregates a thin sliver with map-side
  *      combine — and the threshold `cnt * k > n` keeps exactly the true
  *      heavy hitters.
  *
  * The result is therefore EXACTLY `{item : count(item) * k > n}` — a
  * set a SQL engine can state independently — while the distributed
  * state is O(k) per partition instead of O(distinct items): the
  * `groupBy(item).count().filter(...)` equivalent shuffles the full
  * vocabulary (billions of keys in a crawl corpus); this shuffles k
  * counters per partition plus one sliver aggregation.
  */
object HeavyHitters {

  /** Candidate-set ceiling: the sketch output (and the literal IN list
    * the second pass builds from it) lives on the driver. */
  val MaxK = 100000

  /** Items of `itemCol` whose count strictly exceeds n/k, with their
    * exact counts: (item, cnt), descending. */
  def exact(df: DataFrame, itemCol: Column, k: Int): DataFrame = {
    require(k > 1 && k <= MaxK, s"k must be in [2, $MaxK], got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(itemCol.cast("string").as("item")).as[String]
    // pass 1: sketch + exact n in ONE row on the driver (O(k) by the
    // aggregate's construction — never vocabulary-sized)
    val s = items.select(new MisraGriesAgg(k - 1).toColumn).head()
    val cands = s.items.keys.toSeq.sorted
    if (cands.isEmpty)
      return items.toDF("item").limit(0)
        .select(col("item"), lit(0L).as("cnt"))
    // pass 2: exact counts of the candidate sliver only. Small candidate
    // sets ride an IN literal (pushes to the scan as a filter); large
    // ones a broadcast semi-join (an IN over 10^5 strings bloats the
    // plan and codegen instead of helping)
    val sliver =
      if (cands.length <= 1024) items.toDF("item").where(col("item").isin(cands: _*))
      else {
        val candDf = broadcast(items.sparkSession
          .createDataset(cands)(org.apache.spark.sql.Encoders.STRING).toDF("item"))
        items.toDF("item").join(candDf, Seq("item"), "left_semi")
      }
    sliver
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > s.n)
      .orderBy(col("cnt").desc, col("item"))
  }
}
