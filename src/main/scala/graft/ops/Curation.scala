package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation selection operators (north-star surface; no reference
  * counterpart — public Spark API only).
  */
object Curation {

  /** Greedy per-group token-budget selection: within each group (domain,
    * language, source), rank documents best-first by `quality` (descending,
    * ties broken by ascending `idCol` for determinism) and keep the longest
    * prefix whose running `tokens` sum stays within `budget` — the "take
    * the best N tokens per domain" step of assembling a training mix.
    *
    * Strictly greedy prefix semantics: a document is kept iff the running
    * sum INCLUDING it is <= budget; once one document overflows, everything
    * ranked after it is dropped too (no skip-and-backfill — backfilling
    * makes membership depend on global knapsack choices that are neither
    * reproducible under data drift nor expressible as one pass).
    *
    * Output: the kept rows with `rank` (1-based, best first) and
    * `cum_tokens` attached.
    *
    * 100-TB shape: ONE window pass partitioned by the group columns —
    * groups (domains/sources) are the parallelism unit, exactly like
    * [[Packing.packChunks]]'s streams; a real corpus has thousands of
    * domains, so every task stays busy and no single reducer sees more
    * than one domain's documents. For a LOW-cardinality grouping over a
    * huge corpus, pre-aggregate per (group, quality-bucket) first or split
    * the group key — the operator deliberately does not silently
    * re-partition, because the cumsum is order-defining. */
  def selectToBudget(df: DataFrame, groupCols: Seq[String], idCol: String,
      quality: Column, tokens: Column, budget: Long): DataFrame = {
    require(groupCols.nonEmpty, "selectToBudget needs at least one group column")
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(groupCols.map(c => col(s"`$c`")): _*)
      .orderBy(quality.desc, col(s"`$idCol`").asc)
    // "kept iff own cumsum is within budget" equals the prefix semantics
    // above only because tokens are non-negative — enforce that on the
    // data path itself (the guarded value IS what the window sums, so the
    // check can never be pruned away)
    val tok = tokens.cast("long")
    val guarded = when(tok.isNull || tok < 0L,
      raise_error(concat(lit("selectToBudget: null or negative token count: "),
        coalesce(tok.cast("string"), lit("null"))))).otherwise(tok)
    df.withColumn("_tok", guarded)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens",
        sum(col("_tok")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum_tokens") <= budget)
      .drop("_tok")
  }
}
