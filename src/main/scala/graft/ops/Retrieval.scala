package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over a document corpus: Okapi BM25 ranking
  * (Robertson & Spärck Jones probabilistic relevance framework, with the
  * Lucene-style non-negative idf variant) and per-group TF-IDF keyword
  * extraction. The retrieval layer a RAG/dedup pipeline puts next to the
  * embedding ANN path ([[Similarity]]) — lexical recall catches what
  * cosine misses.
  *
  * Scale shape (100 TB corpus, thousands of queries):
  *  - the corpus is tokenized ONCE into an inverted postings skeleton
  *    `(term, doc_id, tf)` — one explode + one hash aggregation; the
  *    gram stream never shuffles raw text, only (doc_id, term) keys;
  *  - document-frequency and corpus totals (N, avgdl) are term- and
  *    1-row-bounded aggregates over the skeleton;
  *  - the QUERY side is small by definition — its term table broadcasts,
  *    so scoring is a broadcast join against the postings followed by
  *    one (query, doc) aggregation: no shuffle wider than the postings
  *    that actually match a query term;
  *  - top-k per query is a rank-window — Spark's WindowGroupLimit pushes
  *    the limit into the shuffle (per-partition top-k, then merge).
  *
  * Everything is oracle-checkable by value: scores quantize at 1e-4
  * (`floor(score * 1e4)`, the q104 discipline) so cross-engine floating
  * summation order cannot flip a compare, and ties break on doc_id.
  */
object Retrieval {

  /** Whitespace tokens, lowercased, empty-dropped — one shared tokenizer
    * so corpus and query agree on what a "term" is (shared with the
    * persistent [[TextIndex]], whose stored postings and query side must
    * tokenize identically to both this module and each other). */
  private[ops] def toks(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= lit(""))

  /** Inverted postings `(doc_id, term, tf)` plus per-document length
    * `dl` (total token count, carried on every posting so scoring needs
    * no second join against a doc-length table). */
  private[ops] def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("ts"))
      .select(col("doc_id"), size(col("ts")).as("dl"), explode(col("ts")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

  /** BM25 top-k: for each row of `queries` (an id column + a text
    * column), the `k` highest-scoring documents.
    *
    * Returns `(query_id, doc_id, score_q, rank)` where `score_q =
    * floor(1e4 * sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)))`
    * over the query's DISTINCT terms, with the Lucene/trec_eval idf
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` (always positive, so a
    * stop-word-heavy query can't score a document negative). Documents
    * sharing no term with a query simply don't appear. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val post = postings(docs, idCol, textCol)
    // corpus stats: df is term-bounded; N/avgdl are ONE row, broadcast
    // onto the postings by cross join (never a driver collect)
    val df_ = post.groupBy("term").agg(count(lit(1)).as("df"))
    val tot = post.groupBy("doc_id").agg(first("dl").as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    // query side: DISTINCT terms (BM25 scores a term once; duplicated
    // query words must not double-score), small by definition ->
    // broadcast both the terms and their matched df rows
    val qTerms = queries
      .select(col(qIdCol).as("query_id"), explode(toks(col(qTextCol))).as("term"))
      .distinct()
    val qWithDf = qTerms.join(df_, "term") // unseen query terms match nothing
    val scored = post
      .join(broadcast(qWithDf), "term")
      .crossJoin(broadcast(tot))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(floor(sum("contrib") * 1e4).cast("long").as("score_q"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_q").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Per-group TF-IDF keyword extraction: the `k` most characteristic
    * terms of each group (e.g. each `source` of a crawl) — terms frequent
    * IN the group but rare ACROSS groups.
    *
    * `tfidf_q = floor(1e4 * tf_g * ln(G / gf))` where `tf_g` is the
    * term's count within the group, `G` the number of groups and `gf`
    * the number of groups containing the term. Returns
    * `(group, term, tf, tfidf_q, rank)`, rank 1..k per group, ties on
    * term. A term present in EVERY group scores exactly 0 (ln 1). */
  def tfIdfTopTerms(docs: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val terms = docs
      .select(col(groupCol).as("group"), explode(toks(col(textCol))).as("term"))
      .groupBy("group", "term").agg(count(lit(1)).as("tf"))
    // group-frequency per term is VOCABULARY-sized — one row per distinct
    // term in the corpus, easily 10^8-10^9 on a web crawl (typos, URLs,
    // code) — so it must NOT be force-broadcast: both sides are already
    // keyed by `term`, a plain equi-join lets AQE pick broadcast only
    // when gf actually fits. The total group count IS 1 row: broadcast.
    val gf = terms.groupBy("term").agg(count(lit(1)).as("gf"))
    val ng = terms.select("group").distinct().agg(count(lit(1)).as("n_groups"))
    val scored = terms
      .join(gf, "term")
      .crossJoin(broadcast(ng))
      .withColumn("tfidf_q",
        floor(col("tf") * log(col("n_groups").cast("double") / col("gf")) * 1e4)
          .cast("long"))
    val w = Window.partitionBy("group")
      .orderBy(col("tfidf_q").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("group", "term", "tf", "tfidf_q", "rank")
  }

  /** HYBRID RETRIEVAL SERVED FROM MAINTAINED INDEXES (r13): BM25 from a
    * persistent [[TextIndex]] + cosine ANN from a persistent
    * [[graft.ops.VectorIndex]] over the SAME corpus table, fused by
    * [[rrfFuse]] — the production hybrid-search serving shape, where
    * BOTH retrieval paths read churn-maintained index tables instead of
    * re-deriving anything from the corpus. One CDC history maintains
    * both indexes ([[graft.streaming.MvMaintainer]] tails it), so the
    * whole hybrid stack lags ingest by one micro-batch: the lexical leg
    * reads the query terms' bucket directories, the semantic leg the
    * probed cells' partitions — at 10^10 docs neither leg touches the
    * corpus. Returns `(query_id, doc_id, rrf_q, rank)`. */
  def hybridIndexTopK(cat: graft.catalog.SnapshotCatalog, db: String,
      textIndex: String, vecIndex: String, queries: DataFrame,
      qIdCol: String, qTextCol: String, qVecCol: String,
      k: Int, nprobe: Int, fuseK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75, refine: Int = 4): DataFrame = {
    val lexId = cat.meta(db, textIndex).properties(TextIndex.PropIdCol)
    val lex = TextIndex.topK(cat, db, textIndex, queries, qIdCol, qTextCol,
        k, k1, b)
      .select(col("query_id"), col(s"`$lexId`").as("doc_id"), col("rank"))
    // `refine` rides into the ANN leg so a PQ-coded vector index composes
    // here exactly like a flat one: the ADC shortlist widens by the
    // factor and the exact re-rank against the base at the pin decides
    // the leg's ranking (a covering refine reproduces the flat answer
    // bit-for-bit — the q160 exactness argument, now reachable from the
    // hybrid surface). Flat indexes ignore it.
    val sem = VectorIndex.topK(cat, db, vecIndex, queries, qIdCol, qVecCol,
        k, nprobe, refine = refine)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, sem), fuseK, k)
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009) — the
    * standard hybrid-retrieval combiner: fuse N per-query rankings (e.g.
    * BM25 lexical + embedding-cosine semantic) into one, scoring each
    * (query, doc) as `sum_systems 1/(k + rank)`. Rank-based, so the
    * systems' incomparable score scales never need calibration — the
    * reason RRF is the default fusion in production hybrid search.
    *
    * Every input frame carries `(query_id, doc_id, rank)`; a document
    * absent from a system simply contributes nothing. Scale shape: the
    * inputs are already top-k-bounded per query, so the union + one
    * (query, doc) aggregation + a rank window move O(queries * k *
    * systems) rows — never the corpus.
    *
    * Engine-portable by construction: each contribution quantizes to the
    * INTEGER `floor(1e9 / (k + rank))` before summing, so the fused
    * score is an exact integer sum — no floating summation order, no
    * cross-engine drift — and ties break on doc_id. Returns
    * `(query_id, doc_id, rrf_q, rank)`, rank 1..topK per query. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 0, s"k must be non-negative, got $k")
    require(topK > 0, s"topK must be positive, got $topK")
    val unioned = rankings.map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_.unionByName(_))
    val fused = unioned
      .withColumn("c",
        floor(lit(1000000000.0) / (lit(k.toLong) + col("rank"))).cast("long"))
      .groupBy("query_id", "doc_id").agg(sum("c").as("rrf_q"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_q").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
  }
}
