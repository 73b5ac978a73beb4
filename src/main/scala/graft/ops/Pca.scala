package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * step of an embedding pipeline (compact ANN indexes, cheaper similarity,
  * whitened features for clustering/SemDeDup).
  *
  * Scale shape (100 TB of vectors, dimension d in the dozens-to-hundreds):
  * training is ONE distributed pass computing the moment statistics —
  * per-partition `(n, sum[d], gram[d*d])` accumulators combined by a
  * fixed-size reduce — so the driver ever holds O(d²) doubles (32 KB at
  * d=64), never vectors. The eigendecomposition runs driver-side on the
  * d×d covariance (power iteration with deflation — deterministic: fixed
  * LCG init, fixed iteration count, sign-canonicalized so the largest-
  * magnitude coordinate is positive). Projection is a compiled
  * [[graft.functions.VectorExprs.dotProduct]] against LITERAL component
  * vectors — `pc_j = dot(x, c_j) - dot(mean, c_j)` — row-local, zero
  * shuffle, and exactly replayable by any engine holding the same
  * literals (the mean-side dot folds to one scalar constant).
  *
  * Learning is spec-gated (eigenvectors are not SQL-expressible); the
  * PROJECTION is oracle-gated by embedding the learned components as
  * literals (the BPE-oracle discipline). */
object Pca {

  /** Trained state: the mean vector, top-k unit components (sign fixed:
    * the largest-|coordinate| entry is positive), and their eigenvalues
    * (variance explained, descending). */
  final case class PcaModel(mean: Array[Double], components: Seq[Array[Double]],
      eigenvalues: Seq[Double]) {
    /** `dot(mean, c_j)` — the scalar the projection subtracts. */
    def meanOffset(j: Int): Double = Pca.dot(mean, components(j))
  }

  private[graft] def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Hard ceiling on the embedding dimension: the per-partition gram
    * accumulator is d² doubles (32 MB at d=2048, and every executor
    * holds one per task) — beyond this, per-partition moments stop being
    * "small fixed-size state" and the one-pass design needs a blocked
    * formulation instead. Refuse loudly rather than OOM an executor. */
  val MaxDim = 2048

  /** One-pass moment statistics + driver-side eigendecomposition.
    * `iters` power-iteration steps per component (default converges far
    * past double precision for well-separated spectra). Null vectors are
    * skipped; ragged dimensions refuse loudly; d is capped at [[MaxDim]]
    * (see there). */
  def train(corpus: DataFrame, vecCol: String, k: Int, iters: Int = 100): PcaModel = {
    require(k > 0, s"k must be positive, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(s"`$vecCol`").cast("array<double>"))
      .where(col(s"`$vecCol`").isNotNull).as[Seq[Double]]
    val d = vecs.head(1).headOption.map(_.length).getOrElse(
      throw new IllegalArgumentException(s"no vectors in $vecCol"))
    require(k <= d, s"k=$k exceeds dimension $d")
    require(d <= MaxDim,
      s"embedding dimension $d exceeds Pca.MaxDim=$MaxDim: the per-partition " +
        s"gram accumulator is d² doubles (${d.toLong * d * 8 / (1 << 20)} MB " +
        "at this d) - reduce the dimension upstream (e.g. slice or pre-project) " +
        "or raise the design to a blocked covariance pass")
    def combine(a: (Long, Array[Double], Array[Double]),
        b: (Long, Array[Double], Array[Double])): (Long, Array[Double], Array[Double]) = {
      val s = new Array[Double](d)
      val g = new Array[Double](d * d)
      var i = 0
      while (i < d) { s(i) = a._2(i) + b._2(i); i += 1 }
      i = 0
      while (i < d * d) { g(i) = a._3(i) + b._3(i); i += 1 }
      (a._1 + b._1, s, g)
    }
    // per-partition moment accumulators, combined in a FIXED BINARY TREE
    // keyed by partition index (pair idx with idx^1 each round): every
    // reduceByKey key holds at most TWO accumulators, and two-operand
    // double addition is commutative, so the floating-point sums — and
    // hence the learned components — are bit-identical across runs
    // regardless of task completion order (a plain reduce combines in
    // arrival order and is not). The driver only ever materializes the
    // final (1 + d + d*d) doubles.
    var acc = vecs.rdd.mapPartitionsWithIndex { (idx, it) =>
      var cnt = 0L
      val s = new Array[Double](d)
      val g = new Array[Double](d * d)
      it.foreach { v =>
        require(v.length == d, s"ragged embedding: ${v.length} != $d")
        cnt += 1
        var i = 0
        while (i < d) {
          val xi = v(i)
          s(i) += xi
          var j = 0
          while (j < d) { g(i * d + j) += xi * v(j); j += 1 }
          i += 1
        }
      }
      Iterator.single((idx, (cnt, s, g)))
    }
    var width = math.max(1, acc.getNumPartitions)
    while (width > 1) {
      width = (width + 1) / 2
      acc = acc.map { case (i, v) => (i / 2, v) }
        .reduceByKey(combine _, math.max(1, width))
    }
    val (n, sum, gram) = acc.values.collect() match {
      case Array(one) => one
      case Array() => (0L, new Array[Double](d), new Array[Double](d * d))
      case many => many.foldLeft((0L, new Array[Double](d),
        new Array[Double](d * d)))(combine) // defensive; width loop makes 1
    }
    require(n > 1, s"PCA needs at least 2 vectors, got $n")
    val mean = sum.map(_ / n)
    // population covariance: E[xxᵀ] - mean meanᵀ
    val cov = Array.tabulate(d * d)(i => gram(i) / n - mean(i / d) * mean(i % d))
    // power iteration + deflation, deterministic throughout
    val comps = Seq.newBuilder[Array[Double]]
    val eigs = Seq.newBuilder[Double]
    (0 until k).foreach { _ =>
      var v = Array.tabulate(d) { i =>
        // fixed LCG init: never the zero vector, no RNG state
        var h = i.toLong * 6364136223846793005L + 1442695040888963407L
        h ^= h >>> 33
        (h & 0xFFFF).toDouble / 65536.0 + 0.5
      }
      def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
      val found = comps.result()
      // Gram-Schmidt against the components already found: deflation
      // alone leaves numerical residue that a near-zero tail eigenvalue
      // would amplify into a non-orthogonal direction
      def reorth(a: Array[Double]): Array[Double] = {
        val out = a.clone()
        found.foreach { c =>
          val p = dot(out, c)
          var i = 0
          while (i < d) { out(i) -= p * c(i); i += 1 }
        }
        out
      }
      v = reorth(v)
      val nv = norm(v); v = v.map(_ / nv)
      (0 until iters).foreach { _ =>
        val w = new Array[Double](d)
        var i = 0
        while (i < d) {
          var acc = 0.0; var j = 0
          while (j < d) { acc += cov(i * d + j) * v(j); j += 1 }
          w(i) = acc; i += 1
        }
        val o = reorth(w)
        val on = norm(o)
        if (on > 0) v = o.map(_ / on)
      }
      val lambda = {
        val w = new Array[Double](d)
        var i = 0
        while (i < d) {
          var acc = 0.0; var j = 0
          while (j < d) { acc += cov(i * d + j) * v(j); j += 1 }
          w(i) = acc; i += 1
        }
        dot(v, w)
      }
      // sign canon: the largest-|coordinate| entry positive (eigenvectors
      // are sign-ambiguous; a canonical choice keeps training replayable)
      val am = v.indices.maxBy(i => math.abs(v(i)))
      if (v(am) < 0) v = v.map(-_)
      comps += v
      eigs += lambda
      // deflate: cov -= λ v vᵀ
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { cov(i * d + j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
    }
    PcaModel(mean, comps.result(), eigs.result())
  }

  /** Project `vecCol` onto the model's components: adds `pc0..pc{k-1}`
    * columns, `pc_j = dot(x, c_j) - dot(mean, c_j)` — compiled dot
    * against literal arrays, row-local, no shuffle. */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      outPrefix: String = "pc"): DataFrame =
    model.components.zipWithIndex.foldLeft(df) { case (acc, (c, j)) =>
      acc.withColumn(s"$outPrefix$j",
        graft.functions.VectorExprs.dotProduct(
          col(s"`$vecCol`").cast("array<double>"), typedLit(c.toSeq)) -
          lit(model.meanOffset(j)))
    }
}
