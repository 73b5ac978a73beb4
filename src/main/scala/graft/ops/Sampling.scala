package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is a liability at 100 TB: a retried task
  * re-rolls its rows (a re-run of a failed stage silently changes the
  * sample), a backfill draws a different subset than the original run, and
  * train/val membership can drift between pipeline versions. Every
  * operator here instead derives its decision from a HASH of a stable key
  * column — the same row lands on the same side of every split, forever,
  * on any engine (md5 is bit-portable, unlike Spark's Murmur3 `hash()`),
  * which also makes the operators oracle-checkable in DuckDB.
  *
  * All decisions are per-row projections (no shuffle, no state): at
  * 100 TB a split/sample is a narrow map over the scan, and Catalyst
  * pushes the sample filter below wide plans wherever legal.
  */
object Sampling {

  /** 2^32 — the sample space of [[hashPoint]]. */
  val Space: Long = 1L << 32

  /** Deterministic point in [0, 2^32) for a key: the first 8 hex chars of
    * md5(key as string). Uniform for any key distribution (cryptographic
    * avalanche), reproducible across engines and runs. NULL keys hash as
    * the empty string (colliding with a genuine "" key — acceptable for a
    * sampling decision): a NULL must land in a deterministic split/sample
    * like every other row, not silently vanish from filters (`NULL < t` is
    * NULL) or pile into the last split branch. */
  def hashPoint(key: Column): Column =
    conv(substring(md5(coalesce(key.cast("string"), lit(""))
      .cast("binary")), 1, 8), 16, 10).cast("long")

  /** Assign each row to train/val/test by fraction of the hash space.
    * Fractions are taken as exact 2^32-ths, so engine float rounding can
    * never flip a boundary row. */
  def assignSplit(key: Column, trainFrac: Double, valFrac: Double): Column = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1,
      s"bad split fractions: train=$trainFrac val=$valFrac")
    val t = (trainFrac * Space).toLong
    val v = ((trainFrac + valFrac) * Space).toLong
    val p = hashPoint(key)
    when(p < t, "train").when(p < v, "val").otherwise("test")
  }

  /** Keep a deterministic ~`frac` of rows (hash-threshold filter). */
  def sample(df: DataFrame, key: Column, frac: Double): DataFrame =
    df.where(hashPoint(key) < (frac * Space).toLong)

  /** Deterministic global shuffle for a training export: order the corpus
    * by a seed-salted hash of the key — a reproducible pseudo-random
    * permutation (same seed -> same order across runs, retries, and
    * engines; a different seed -> an independent permutation per epoch).
    * One range-shuffle (`orderBy`: sampled range partitioner +
    * per-partition sort — every task busy, no single reducer); downstream
    * writers preserve the order within each output file. Hash ties break
    * by the key, then by EVERY remaining column — non-orderable columns
    * (maps, and arrays/structs containing them) participate through their
    * JSON rendering, which is a pure function of the stored row, so the
    * permutation is TOTAL on all distinguishable rows, metadata maps
    * included (fully identical rows are interchangeable — any order of
    * them is the same output). */
  def shuffleDeterministic(df: DataFrame, key: Column, seed: Long): DataFrame = {
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => orderable(f.dataType))
      case _ => true
    }
    val rest = df.schema.fields.map { f =>
      if (orderable(f.dataType)) col(s"`${f.name}`").asc
      // maps have no sort order; their JSON rendering (a pure function of
      // the stored row) does — rows differing only in a metadata map
      // still order reproducibly
      else to_json(col(s"`${f.name}`")).asc
    }
    df.orderBy(
      hashPoint(concat(key.cast("string"), lit(":"), lit(seed.toString))).asc +:
        key.asc +: rest.toIndexedSeq: _*)
  }

  /** Per-stratum deterministic downsample: each stratum value keeps its
    * own fraction (absent strata keep `defaultFrac`). The common corpus
    * rebalance — "keep 10% of English, all of the tail languages" — as one
    * per-row filter, no groupBy, no join, no second pass. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultFrac: Double = 1.0): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultFrac * Space).toLong)) {
      case (acc, (value, frac)) =>
        when(stratum === value, lit((frac * Space).toLong)).otherwise(acc)
    }
    df.where(hashPoint(key) < threshold)
  }

  /** Deterministic weighted resampling — the pretraining "epoch mixing"
    * materialization: emit each row `floor(weight)` times, plus one more
    * copy iff `hashPoint(key)` lands below the weight's fractional part of
    * the hash space, so a domain weighted 2.4 sees every document twice and
    * a deterministic ~40% of them a third time. Expected copies = weight
    * EXACTLY; membership of the fractional copy is stable across retries,
    * backfills, and engines (same md5 hash as every sampler here), unlike
    * `rand()`-based mixing where a re-run silently reshuffles epochs.
    *
    * Weights below 1 downsample (rows may emit zero copies); `copy_idx`
    * (0-based) distinguishes repeats so downstream packing/shuffling can
    * spread copies apart.
    *
    * 100-TB shape: a narrow per-row `explode(sequence(...))` — no shuffle,
    * no state; output volume is the mixed corpus size, which is the
    * irreducible cost of materialized mixing. (For weights that are all
    * integers the sequence is constant-folded per row; fractional weights
    * add one hash comparison.) */
  def resampleWeighted(df: DataFrame, key: Column, weight: Column): DataFrame = {
    val base = floor(weight).cast("long")
    // fractional-part threshold in exact 2^32-ths, floored (not cast) so
    // the oracle's floor() agrees bit-for-bit
    val extraThreshold = floor((weight - floor(weight)) * lit(Space.toDouble)).cast("long")
    val copies = base + when(hashPoint(key) < extraThreshold, 1L).otherwise(0L)
    // copies = 0 -> NULL sequence -> explode drops the row (weight < 1
    // downsampling); explicit step so sequence(0, -1) can never infer a
    // descending range
    df.withColumn("copy_idx",
      explode(when(copies > lit(0L), sequence(lit(0L), copies - 1, lit(1L)))))
  }

  /** MULTILINGUAL TEMPERATURE SAMPLING (the XLM-R / mT5 α-smoothing
    * recipe): resample so group l's share moves from its empirical
    * p_l = n_l/N toward q_l ∝ n_l^α — α < 1 upsamples tail languages
    * and downsamples the head, keeping the EXPECTED corpus size at N
    * (per-group expected copies c_l = N·q_l/n_l, realized per row by
    * [[resampleWeighted]]'s deterministic fractional-copy rule, so the
    * epoch mix is stable across retries and engines).
    *
    * Cross-engine exactness discipline: group sizes come from ONE count
    * aggregation (one row per language — metadata-sized, but never
    * collected: the weights BROADCAST-JOIN back onto the corpus); n_l^α
    * quantizes to the integer grid floor(n_l^α · 2^20) BEFORE summing,
    * so Σ is an exact integer in a double regardless of summation
    * order; and the weight evaluates in the fixed shape
    * (N/n_l)·(s_l/S) — every step a single correctly-rounded IEEE op,
    * so an oracle replaying the identical expression lands on the
    * identical copies. α = 0.5 computes via sqrt (correctly rounded BY
    * REQUIREMENT of IEEE 754 — the portable-proof case the q153 gate
    * uses); other α ride pow, correct but only almost-surely
    * grid-identical across libms. */
  def temperatureResample(df: DataFrame, group: Column, key: Column,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val tagged = df.withColumn("__tg", group)
    val powOf = (n: Column) =>
      if (alpha == 0.5) sqrt(n) else pow(n, lit(alpha))
    val w = tagged.groupBy("__tg")
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__s", floor(powOf(col("__n")) * lit(1048576.0)))
    val tot = w.agg(sum(col("__n")).as("__nn"), sum(col("__s")).as("__ss"))
    val weights = w.crossJoin(broadcast(tot))
      .select(col("__tg").as("__wtg"),
        ((col("__nn") / col("__n")) * (col("__s") / col("__ss"))).as("__w"))
    // NULL-SAFE join back: groupBy counts a null group like any other, so
    // rows with a null tag must find their weight too — a plain equi-join
    // would silently drop them from the epoch
    resampleWeighted(
      tagged.join(broadcast(weights), col("__tg") <=> col("__wtg")),
      key, col("__w"))
      .drop("__tg", "__wtg", "__w")
  }
}
