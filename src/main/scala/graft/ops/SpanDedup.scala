package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT duplicate-SPAN detection and scrubbing — the substring-level
  * dedup tier (Lee et al. 2021, "Deduplicating Training Data Makes
  * Language Models Better": exact duplicated sequences inside otherwise
  * distinct documents are what document-level dedup cannot see —
  * boilerplate, licenses, quoted chunks — and they measurably hurt LM
  * quality). The reference pipeline has no counterpart; this is part of
  * the training-data surface.
  *
  * Lee et al. build a monolithic suffix array; the distributed shape
  * here is the standard k-gram-anchor approximation: a maximal run of
  * tokens >= k long duplicated anywhere in the corpus is exactly the
  * union of its duplicated k-grams, so marking every k-gram occurring
  * more than once (corpus-wide, within-document repeats included) and
  * merging overlapping/adjacent marks per document reconstructs every
  * duplicated span of length >= k precisely (spans shorter than k are
  * below the threshold by definition).
  *
  * 100-TB shape: tokenize and hash map-side — the ONLY shuffled tuple is
  * (gram_hash, doc_id, pos), ~24 bytes/gram, never text; duplicate
  * marking is one window count over the hash (one shuffle, no driver
  * state, no collected gram lists — a boilerplate gram seen 10^6 times
  * is just a big window partition, AQE-splittable); span merging is one
  * window per document. Hashes are 64-bit (xxhash64): a collision marks
  * a unique gram as duplicated (never the reverse) — at 2^32 grams the
  * expected corpus-wide collision count is ~1, an acceptable
  * over-scrub for a quality pipeline and the trade every distributed
  * implementation makes.
  *
  * Tokenization is whitespace-split with empties dropped — deliberately
  * reproducible by the DuckDB oracle (regexp_split_to_array) so the
  * whole operator is gate-able end to end. Positions are 0-based token
  * indices; span_end is exclusive.
  */
object SpanDedup {

  /** Whitespace token array, empty tokens dropped (leading/multiple
    * whitespace), exactly `list_filter(regexp_split_to_array(t,'\s+'))`. */
  private def toks(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= lit(""))

  /** Maximal duplicated token spans per document:
    * (doc_id, span_start, span_end) — 0-based, end-exclusive. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2, got $minTokens")
    val k = minTokens
    val grams = docs
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("ts"))
      .withColumn("n", size(col("ts")))
      .where(col("n") >= k)
      // one k-gram anchor per start position, hashed MAP-SIDE: the gram
      // string never reaches a shuffle
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n") - k)).as("pos"),
        col("ts"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        xxhash64(concat_ws(" ", slice(col("ts"), col("pos") + 1, lit(k)))).as("h"))
    // duplicated anywhere (other docs OR a repeat inside the same doc)
    val marked = grams
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
      .where(col("cnt") > 1)
      .select("doc_id", "pos")
    // merge overlapping/adjacent anchors into maximal spans: anchors p,q
    // (p<q) belong to one span iff q <= p + k (their k-token windows
    // touch) — classic gaps-and-islands, one window per doc
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    marked
      .withColumn("prev", lag("pos", 1).over(byDoc))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") > col("prev") + k, 1L).otherwise(0L))
      .withColumn("island", sum("brk").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("span_start"), (max("pos") + k).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** Scrub: re-emit every document with ALL duplicated spans removed
    * (tokens re-joined with single spaces — the same normalization the
    * tokenizer applied; documents without duplicated spans pass through
    * token-identically). Aggressive form: every occurrence goes, the
    * usual choice for a quality gate; keep-one-occurrence is a policy
    * layer above this primitive. */
  def scrubDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int): DataFrame = {
    val spans = duplicateSpans(docs, idCol, textCol, minTokens)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("spans"))
    docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("ts"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("spans").isNull, concat_ws(" ", col("ts")))
          .otherwise(concat_ws(" ",
            filter(col("ts"), (_, i) =>
              !exists(col("spans"), sp =>
                i.cast("long") >= sp("s") && i.cast("long") < sp("e")))))
          .as("text_scrubbed"))
  }
}
