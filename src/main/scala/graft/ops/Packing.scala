package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated into a
  * token stream and the stream is cut into fixed `window`-token context
  * chunks (concat-then-chunk — the standard pretraining packing; documents
  * straddle chunk boundaries rather than leaving tail padding).
  *
  * The assignment is a pure function of (stream, order, token counts):
  * chunk k covers token offsets [k*window, (k+1)*window), and a document
  * occupies the chunks its token span intersects — so any engine (or the
  * DuckDB oracle) derives the identical packing from a running token sum.
  *
  * Scale shape: packing is sequential BY CONSTRUCTION within a stream (each
  * document's offset depends on every predecessor), so `streamCols` is the
  * parallelism unit — real pipelines pack per shard/language/source bucket,
  * thousands of independent streams at 100 TB, each a single partition sort
  * here (one shuffle). A single global stream would serialize into one
  * task's sort; callers wanting that use the two-pass range-partitioned
  * prefix-sum (per-partition totals -> broadcast offsets), the same pattern
  * as the q58 percentile rewrite. No reference counterpart; derived from
  * the public packing recipe (GPT-style concat-and-chunk).
  */
object Packing {

  /** Per-document chunk assignment. Adds:
    *   - `tok_start`  — the doc's first token's offset in its stream
    *   - `first_chunk`/`n_chunks` — chunks the doc's span intersects
    *     (a zero-token doc occupies no chunk: n_chunks = 0).
    */
  def packChunks(df: DataFrame, streamCols: Seq[String], orderCol: String,
      tokensCol: Column, window: Long): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val w = Window.partitionBy(streamCols.map(c => col(s"`$c`")): _*)
      .orderBy(col(s"`$orderCol`"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_tok", tokensCol.cast("long"))
      .withColumn("tok_start", sum(col("_tok")).over(w) - col("_tok"))
      .withColumn("first_chunk", floor(col("tok_start") / window))
      .withColumn("n_chunks",
        when(col("_tok") === 0, 0L)
          .otherwise(floor((col("tok_start") + col("_tok") - 1) / window)
            - col("first_chunk") + 1))
      .drop("_tok")
  }
}
