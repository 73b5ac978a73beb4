package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star surface): brute-force cosine
  * top-k as the exact baseline, and random-hyperplane LSH bucketing as the
  * approximate scale path.
  *
  * Scale posture (100 TB of vectors):
  *   - queries are broadcast (small side of the product); the corpus is
  *     streamed once, partition-parallel;
  *   - the top-k window (`row_number <= k` over query partitions) is
  *     executed by Spark's WindowGroupLimit as a per-partition running
  *     top-k — only k rows per partition per query survive the shuffle;
  *   - the LSH variant prunes the corpus product to same-bucket candidates;
  *     buckets are the shuffle key.
  * All vector math is `zip_with`/`aggregate` over array columns in double —
  * codegen'd, no UDFs.
  */
object Similarity {

  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Native compiled dot (double accumulation, handles float/double arrays)
    * — the `aggregate(zip_with(...))` form is interpreted per element; see
    * [[graft.functions.DotProduct]]. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k neighbors for each query vector.
    * `queries` must be small (it is broadcast). Norms are computed ONCE per
    * row on each side before the product — not per pair. Output:
    * (query_id, neighbor_id, rank). */
  def cosineTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String, k: Int): DataFrame = {
    val c = corpus.select(col(corpusId), col(corpusVec), norm(col(corpusVec)).as("_cn"))
    val q = queries.select(col(queryId), col(queryVec), norm(col(queryVec)).as("_qn"))
    val sims = c.crossJoin(broadcast(q))
      .where(col(corpusId) =!= col(queryId))
      .select(col(queryId).as("query_id"), col(corpusId).as("neighbor_id"),
        (dot(col(corpusVec), col(queryVec)) / (col("_cn") * col("_qn"))).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Deterministic random hyperplanes (seeded), as a literal column. */
  private def planes(dim: Int, nPlanes: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-of-projection LSH bucket id (Charikar hyperplane hashing):
    * bit j = [v . plane_j >= 0]. Vectors in the same bucket are cosine-close
    * with high probability. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int = 16, seed: Long = 42L): Column = {
    val v = toDouble(vec)
    val ps = planes(dim, nPlanes, seed)
    ps.zipWithIndex.map { case (p, j) =>
      when(dot(v, typedLit(p)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket,
    * then exact cosine re-rank. Trades recall for a corpus-product prune —
    * the scale path when the corpus no longer admits a full scan per query.
    * Returns (query_id, neighbor_id, rank). */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, dim: Int, nPlanes: Int = 8): DataFrame = {
    val bucketed = corpus.select(col(corpusId), col(corpusVec),
      norm(col(corpusVec)).as("_cn"), lshBucket(col(corpusVec), dim, nPlanes).as("bucket"))
    val qb = queries.select(col(queryId), col(queryVec),
      norm(col(queryVec)).as("_qn"), lshBucket(col(queryVec), dim, nPlanes).as("bucket"))
    val sims = bucketed.join(broadcast(qb), Seq("bucket"))
      .where(col(corpusId) =!= col(queryId))
      .select(col(queryId).as("query_id"), col(corpusId).as("neighbor_id"),
        (dot(col(corpusVec), col(queryVec)) / (col("_cn") * col("_qn"))).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold within LSH buckets
    * (the embedding flavor of Dedup). */
  def embeddingNearDup(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double, nPlanes: Int = 8): DataFrame = {
    val b = corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("_n"),
      lshBucket(col(vecCol), dim, nPlanes).as("bucket"))
    val a = b.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("v_a"), col("_n").as("n_a"))
    val c = b.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("v_b"), col("_n").as("n_b"))
    a.join(c, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))).as("sim"))
      .where(col("sim") >= minCosine)
  }
}
