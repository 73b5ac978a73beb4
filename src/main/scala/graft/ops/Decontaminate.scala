package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents whose word n-grams
  * overlap an evaluation/benchmark set (the pretraining hygiene step that
  * keeps eval answers out of the training corpus; no reference counterpart —
  * derived from the public Spark API and published practice, e.g. the GPT-3
  * 13-gram and Llama n-gram-overlap decontamination procedures).
  *
  * 100-TB shape: the benchmark side is SMALL by construction (eval suites
  * are KBs–MBs, the corpus is the 100 TB), so the distinct benchmark n-gram
  * set is broadcast — the corpus side never shuffles its shingle stream
  * anywhere; it explodes per-row, probes the broadcast hash set, and
  * aggregates per document with map-side combine on the (doc, hit) partials.
  * One narrow pass over the corpus + one small agg shuffle keyed by doc id.
  */
object Decontaminate {

  /** Per-document benchmark n-gram overlap counts.
    *
    * Returns `idCols… , n_shingles, n_overlap`: the number of DISTINCT
    * word `n`-grams in the document ([[Dedup.wordShingles]] semantics:
    * documents shorter than `n` words contribute their whole text as one
    * shingle) and how many of them appear in ANY benchmark document.
    * Every corpus row appears in the output (zero overlap included) — a
    * decontamination gate must make an explicit keep/drop decision for
    * every document, not just the contaminated ones.
    */
  def overlapCounts(corpus: DataFrame, idCols: Seq[String], textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    val benchGrams = benchmark
      .select(explode(Dedup.wordShingles(col(s"`$benchTextCol`"), n)).as("gram"))
      .distinct()
      .withColumn("_hit", lit(1L))
    val ids = idCols.map(c => col(s"`$c`"))
    // wordShingles emits >= 1 shingle for every non-null text, so the
    // explode never drops a document
    val grams = corpus
      .select(ids :+ Dedup.wordShingles(col(s"`$textCol`"), n).as("_grams"): _*)
      .withColumn("n_shingles", size(col("_grams")).cast("long"))
      .select(ids ++ Seq(col("n_shingles"), explode(col("_grams")).as("gram")): _*)
    grams
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy(ids: _*)
      .agg(max(col("n_shingles")).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_overlap"))
  }

  /** Decontaminated view of the corpus: rows whose overlap stays BELOW the
    * contamination threshold — a document is dropped when at least
    * `minOverlap` of its distinct n-grams appear in the benchmark set. */
  def clean(corpus: DataFrame, idCols: Seq[String], textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int,
      minOverlap: Long): DataFrame = {
    val flagged = overlapCounts(corpus, idCols, textCol, benchmark, benchTextCol, n)
      .where(col("n_overlap") >= minOverlap)
      .select(idCols.map(c => col(s"`$c`")): _*)
    corpus.join(flagged, idCols, "left_anti")
  }
}
