package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.catalog.SnapshotCatalog

/** PERSISTENT, INCREMENTALLY-MAINTAINED VECTOR INDEX — the IVF coarse
  * index as a pair of CATALOG TABLES instead of a per-query training run.
  *
  * [[Similarity.ivfTopK]] (re)derives its index every time the corpus
  * identity changes: right for ad-hoc exploration, wrong for a serving
  * corpus that ingests every hour — at 100 TB the assignment pass alone
  * is a full-corpus scan you don't want to repeat per batch. This module
  * makes the index durable and CHURN-maintained:
  *
  *   - `<name>_cent`: the trained centroids, `(cid BIGINT, c ARRAY<DOUBLE>)`
  *     — `nlist` rows, written once at [[create]] and FROZEN thereafter
  *     (FAISS discipline: assignment must stay comparable across
  *     increments; retraining is an explicit [[rebuild]], never a side
  *     effect). Training reuses [[Similarity.trainIvfCentroids]] — exact
  *     integer-grid Lloyd's, so a SQL oracle replays the centroids from
  *     the base table's initial slice.
  *   - `<name>`: the assignments, `(<id>, cell BIGINT, vec ARRAY<DOUBLE>)`,
  *     HIVE-PARTITIONED BY `cell` — a probe of `nprobe` cells reads
  *     nprobe/nlist of the index FILES (directory pruning, no scan of the
  *     rest), and the stored vector (exact float→double widening) makes
  *     the re-rank self-contained: queries never touch the base table.
  *
  * [[refresh]] advances the index to the base table's current snapshot
  * from PER-COMMIT METADATA (`changeSetsAcrossRange`, the machinery that
  * maintains retractable MVs): inserts assign to the frozen centroids and
  * APPEND (one churn-sized scan), deleted ids retract as an EQUALITY
  * DELETE on the index (merge-on-read — no index file rewritten), updates
  * are the composition. Ranges the metadata walk cannot enumerate
  * (rollback, true rewrites) fall back to a full re-assignment — honest
  * cost, frozen centroids. The refresh never retrains and never rescans
  * the unchanged corpus.
  *
  * The design point this buys at scale: ingest 10^6 vectors into a 10^10
  * corpus and the index advances with one 10^6-row assignment pass + one
  * metadata commit, while queries keep reading nprobe/nlist of the data
  * — the brute-force and retrain-per-query alternatives are both
  * full-corpus work per day.
  */
object VectorIndex {

  val PropBase = "vecindex.base"
  val PropIdCol = "vecindex.id-col"
  val PropVecCol = "vecindex.vec-col"
  val PropNlist = "vecindex.nlist"
  val PropIters = "vecindex.iters"
  val PropSampleMod = "vecindex.sample-mod"
  val PropPin = "vecindex.pinned-snapshot"

  /** Centroid-set size ceiling: [[topK]] collects the centroid table to
    * the driver (it is the probe arithmetic's literal operand) and folds
    * the probed-cell set into a pruning predicate — both are O(nlist),
    * so nlist is a driver-memory knob, not a data-size one. sqrt(10^10)
    * = 10^5 sits exactly at this bound. */
  val MaxNlist = 100000

  /** Probed-cell counts up to this ride an inline IN literal in the scan
    * (static directory pruning, pushed filter); larger sets prune
    * driver-side only ([[SnapshotCatalog.readLatestPruned]]) so a
    * 10^4-value literal never bloats the plan. Tunable for specs. */
  private def maxInlineCells(df: DataFrame): Int =
    df.sparkSession.conf.getOption("graft.vecindex.maxInlineCells")
      .map(_.toInt).getOrElse(1024)

  /** Index (re)trainings this JVM — lets callers assert a refresh stayed
    * incremental (no hidden retrain), mirroring `ivfTrainingCount`. */
  @volatile private[graft] var trainings: Long = 0L
  private[graft] def trainingCount: Long = trainings

  private def centTable(name: String): String = name + "_cent"

  private def indexSchema(idField: StructField): StructType = StructType(Seq(
    idField.copy(nullable = false),
    StructField("cell", LongType, nullable = false),
    StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** One assignment projection: id, frozen-centroid cell, and the vector
    * widened to double (IEEE-exact, so the stored copy re-ranks
    * identically to the base value). Codegen'd end to end — nlist dot
    * products per row, no join, no shuffle beyond the partitioned write. */
  private def assign(rows: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Array[Double]]): DataFrame =
    rows.select(col(idCol),
      Similarity.ivfCell(Similarity.quantize(col(vecCol)), cents).as("cell"),
      Similarity.toDouble(col(vecCol)).as("vec"))

  /** Build the index over `db.baseTable`'s CURRENT snapshot. `sampleMod`
    * bounds the driver-side training sample exactly as in
    * [[Similarity.trainIvfCentroids]] (scale it with the corpus; <= 0
    * derives it from the metadata row count). */
  def create(cat: SnapshotCatalog, db: String, baseTable: String, name: String,
      idCol: String, vecCol: String, nlist: Int, iters: Int = 2,
      sampleMod: Long = 0): Unit = {
    require(nlist > 0 && nlist <= MaxNlist, s"nlist must be in [1, $MaxNlist], got $nlist")
    // check BOTH tables up front: a create that failed between the two
    // leaves an orphan _cent table, and a retry that only checked <name>
    // would wedge on createTable(<name>_cent) — the pair-check plus the
    // failure-path cleanup below makes create retryable
    require(!cat.tableExists(db, name), s"index $db.$name already exists")
    require(!cat.tableExists(db, centTable(name)),
      s"centroid table $db.${centTable(name)} already exists " +
        "(orphan of an interrupted create?) - drop it to retry")
    val base = cat.readLatest(db, baseTable)
    val pin = cat.currentSnapshotId(db, baseTable)
    val mod =
      if (sampleMod > 0) sampleMod
      else math.max(1L, (cat.recordCount(db, baseTable, pin) +
        Similarity.IvfTargetSample - 1) / Similarity.IvfTargetSample)
    val cents = Similarity.trainIvfCentroids(base, idCol, vecCol, nlist, iters, mod)
    trainings += 1

    val spark = base.sparkSession
    val centRows = cents.zipWithIndex.map { case (c, i) =>
      org.apache.spark.sql.Row(i.toLong, c.toSeq) }
    val centSchema = StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("c", ArrayType(DoubleType, containsNull = false), nullable = false)))
    cat.createTable(db, centTable(name), centSchema)
    try {
      cat.append(db, centTable(name),
        spark.createDataFrame(spark.sparkContext.parallelize(centRows, 1), centSchema))

      cat.createTable(db, name, indexSchema(base.schema(idCol)),
        partitionCols = Seq("cell"),
        properties = Map(
          PropBase -> s"$db.$baseTable", PropIdCol -> idCol, PropVecCol -> vecCol,
          PropNlist -> nlist.toString, PropIters -> iters.toString,
          PropSampleMod -> mod.toString, PropPin -> pin.toString))
      cat.append(db, name, assign(base, idCol, vecCol, cents))
    } catch {
      case t: Throwable =>
        // never strand a half-built index: drop whatever this attempt
        // created so the same name can retry cleanly
        try cat.dropTable(db, centTable(name))
        catch { case scala.util.control.NonFatal(_) => () }
        try if (cat.tableExists(db, name)) cat.dropTable(db, name)
        catch { case scala.util.control.NonFatal(_) => () }
        throw t
    }
  }

  /** The frozen centroid set, cid-ordered. The collect is bounded by
    * [[MaxNlist]] rows (enforced at [[create]]) — index metadata, not
    * data. */
  def centroids(cat: SnapshotCatalog, db: String, name: String): Seq[Array[Double]] =
    cat.readLatest(db, centTable(name)).orderBy("cid").collect()
      .map(_.getSeq[Double](1).toArray).toIndexedSeq

  private def state(cat: SnapshotCatalog, db: String, name: String) = {
    val p = cat.meta(db, name).properties
    val Array(bdb, btab) = p(PropBase).split("\\.", 2)
    (bdb, btab, p(PropIdCol), p(PropVecCol), p(PropPin).toLong)
  }

  /** Advance the index to the base table's current snapshot. Returns
    * (mode, commits advanced): "fresh" (nothing to do), "incremental"
    * (per-commit metadata enumerated the exact insert/delete sets), or
    * "full" (non-enumerable range: rollback / true rewrite / schema
    * evolution — one full re-assignment under the FROZEN centroids).
    * Never retrains.
    *
    * The incremental discipline is MULTISET-exact: a pure-append range
    * just assigns and appends the inserts; any range with deletes takes
    * the TOUCHED-ID REPAIR — retract every id the churn names (an
    * equality delete on the index), then re-assign those ids' rows as
    * they stand in the base at cur (one semi-join pass, footer-stat
    * file skipping applies). Id-level delete-then-append would be
    * wrong twice over — an id added AND deleted inside the range would
    * resurrect, and a pre-range duplicate copy of a partially-deleted
    * id would vanish — the repair reads the base's own truth for
    * exactly the churned ids instead (caught by the randomized battery
    * in VectorIndexSpec). */
  def refresh(cat: SnapshotCatalog, db: String, name: String): (String, Long) = {
    val (bdb, btab, idCol, vecCol, pin) = state(cat, db, name)
    val cur = cat.currentSnapshotId(bdb, btab)
    if (cur == pin) return ("fresh", 0L)
    val cents = centroids(cat, db, name)
    val sets =
      try cat.changeSetsAcrossRange(bdb, btab, pin, cur)
      catch { case scala.util.control.NonFatal(_) => None }
    val mode = sets match {
      case Some((ins, del)) =>
        val delIds = del.select(col(idCol))
        if (delIds.isEmpty) {
          val newRows = ins.select(col(idCol), col(vecCol))
          if (!newRows.isEmpty)
            cat.append(db, name, assign(newRows, idCol, vecCol, cents))
        } else {
          val touched = ins.select(col(idCol)).union(delIds).distinct()
          cat.deleteMoREq(db, name, touched)
          val fresh = cat.readLatest(bdb, btab)
            .join(touched, Seq(idCol), "left_semi")
            .select(col(idCol), col(vecCol))
          if (!fresh.isEmpty)
            cat.append(db, name, assign(fresh, idCol, vecCol, cents))
        }
        "incremental"
      case None =>
        cat.overwrite(db, name, assign(cat.readLatest(bdb, btab)
          .select(col(idCol), col(vecCol)), idCol, vecCol, cents))
        "full"
    }
    cat.setProperty(db, name, PropPin, Some(cur.toString))
    (mode, cur - pin)
  }

  /** Top-k cosine neighbors for each (bounded, broadcast) query row,
    * served ENTIRELY from the index: probe each query's `nprobe` nearest
    * frozen cells, read ONLY those cells' partitions (the probed-cell set
    * is at most nlist values — folded into a literal pruning predicate,
    * so the scan skips every other directory), exact-cosine re-rank
    * against the stored vectors. Same semantics as [[Similarity.ivfTopK]]
    * over the base table — candidates sharing the query's id are excluded
    * (`excludeSelf`), ranks tie-break by neighbor id. */
  def topK(cat: SnapshotCatalog, db: String, name: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nprobe: Int, excludeSelf: Boolean = true): DataFrame = {
    val (_, _, idCol, _, _) = state(cat, db, name)
    val cents = centroids(cat, db, name)
    val q = queries.select(col(queryId).as("query_id"),
      Similarity.toDouble(col(queryVec)).as("_qv"),
      Similarity.norm(col(queryVec)).as("_qn"),
      explode(Similarity.ivfProbes(
        Similarity.quantize(col(queryVec)), cents, nprobe)).as("cell"))
    // the union of probed cells is bounded by nlist <= MaxNlist — a
    // metadata-sized collect that becomes a STATIC partition predicate
    // (directory pruning at plan time, no runtime filter needed). Below
    // the inline threshold the literal IN is strictly best; above it the
    // same IN would bloat the plan and codegen (the HeavyHitters lesson),
    // so the literal is used for DRIVER-SIDE file pruning only and never
    // enters the plan — the inner join on `cell` below enforces
    // exactness either way.
    val probed = q.select("cell").distinct().collect().map(_.getLong(0))
      .toIndexedSeq.sorted
    val cellPred = col("cell").isin(probed: _*)
    val idx =
      if (probed.length <= maxInlineCells(queries)) cat.readLatestWhere(db, name, cellPred)
      else cat.readLatestPruned(db, name, cellPred)
    val self: Column =
      if (excludeSelf) idx(idCol) =!= col("query_id") else lit(true)
    val sims = idx.join(broadcast(q), Seq("cell"))
      .where(self)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        (Similarity.dot(col("vec"), col("_qv")) /
          (Similarity.norm(col("vec")) * col("_qn"))).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Per-cell occupancy — the drift monitor. When ingest shifts the data
    * distribution away from the frozen centroids, cells skew; a max/mean
    * ratio past ~8 is the operational cue to [[rebuild]]. O(nlist) rows. */
  def cellStats(cat: SnapshotCatalog, db: String, name: String): DataFrame =
    cat.readLatest(db, name).groupBy("cell").agg(count(lit(1)).as("n"))

  /** Explicit retrain-and-reassign at the base's current snapshot — the
    * deliberate answer to centroid drift. Same params as recorded. */
  def rebuild(cat: SnapshotCatalog, db: String, name: String): Unit = {
    val p = cat.meta(db, name).properties
    val (bdb, btab, idCol, vecCol, _) = state(cat, db, name)
    val nlist = p(PropNlist).toInt
    val iters = p(PropIters).toInt
    val mod = p(PropSampleMod).toLong
    val base = cat.readLatest(bdb, btab)
    val cur = cat.currentSnapshotId(bdb, btab)
    val cents = Similarity.trainIvfCentroids(base, idCol, vecCol, nlist, iters, mod)
    trainings += 1
    import org.apache.spark.sql.Row
    val spark = base.sparkSession
    val centSchema = cat.readLatest(db, centTable(name)).schema
    cat.overwrite(db, centTable(name), spark.createDataFrame(
      spark.sparkContext.parallelize(
        cents.zipWithIndex.map { case (c, i) => Row(i.toLong, c.toSeq) }, 1),
      centSchema))
    cat.overwrite(db, name, assign(base, idCol, vecCol, cents))
    cat.setProperty(db, name, PropPin, Some(cur.toString))
  }
}
