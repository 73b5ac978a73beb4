package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.SnapshotCatalog

/** CONTINUOUS MATERIALIZED-VIEW MAINTENANCE — the "streaming MV" /
  * Delta-Live-Tables shape: instead of a nightly `refresh_materialized_
  * views` sweep, a Structured Streaming query per base table keeps the
  * view fresh commit-by-commit.
  *
  * The design hinges on what the stream is FOR. It is NOT the delta
  * feed: [[SnapshotCatalog.refreshMaterializedView]] already derives its
  * exact delta from the view's recorded pins (per-commit metadata change
  * sets / incremental tails) and advances those pins transactionally
  * under the view lock. Re-deriving the delta from stream batches would
  * duplicate that machinery and break its exactness guarantees. So the
  * CDC stream is tailed purely as a COMMIT SIGNAL: the per-commit
  * micro-batch frame is never acted on — no action, so the pre-image
  * scan behind a `.changes` batch never runs; the micro-batch costs
  * offset bookkeeping only — and each signal folds into one
  * `refreshMaterializedView` call, which does churn-sized work through
  * whichever incremental mode the body's shape earned.
  *
  * Exactly-once falls out of the MV machinery, not sink bookkeeping: a
  * replayed or coalesced signal finds the pins already advanced and
  * returns mode "fresh" (a no-op). Restart from any checkpoint state is
  * therefore safe, and several maintainers (or a concurrent manual
  * refresh) serialize on the view lock without double-applying.
  *
  * At 100 TB this is the difference between freshness-lag = scheduler
  * period and freshness-lag = one micro-batch: each base commit triggers
  * exactly one churn-sized merge, and the signal stream itself moves
  * per-commit METADATA, never table data.
  */
object MvMaintainer {

  /** View/index property naming a DURABLE checkpoint root. Without it
    * each `maintain` call checkpoints into a fresh temp dir — replays
    * stay no-ops (pin-advancement idempotence) but a continuously
    * restarted maintainer re-reads the stream tail from the pin every
    * launch and leaks temp dirs. With it, a restart resumes from the
    * recorded stream offsets: the drained tail is never re-read. One
    * subdirectory per base stream keeps multi-base views safe. */
  val PropCheckpoint = "maintainer.checkpoint"

  private def checkpointDir(props: Map[String, String], tempPrefix: String,
      streamKey: String): String =
    props.get(PropCheckpoint) match {
      case Some(root) =>
        val p = java.nio.file.Paths.get(root, streamKey)
        Files.createDirectories(p)
        p.toString
      case None => Files.createTempDirectory(tempPrefix).toString
    }

  /** Start one maintenance stream per base table of `db.view`.
    *
    * `catalogName` must name a registered [[graft.catalog.spark.SnapCatalogPlugin]]
    * over the same warehouse (it provides the streaming `.changes`
    * source). Each stream starts from the view's recorded pin for its
    * base — the first batch covers exactly the unmaintained backlog.
    * `availableNow = true` drains the backlog and terminates (the
    * catch-up form, also what a scheduled micro-batch job runs);
    * `false` runs continuously. `onRefresh` observes every refresh's
    * (mode, merged-rows) for monitoring/assertions. */
  def maintain(spark: SparkSession, cat: SnapshotCatalog, catalogName: String,
      db: String, view: String, availableNow: Boolean = true,
      onRefresh: (String, Long) => Unit = (_, _) => ()): Seq[StreamingQuery] = {
    val bases = cat.materializedViewBases(db, view)
    require(bases.nonEmpty, s"$db.$view reads no base tables")
    val props = cat.loadView(db, view).get.properties
    bases.map { case (d, t) =>
      // the pin is the snapshot the view already reflects for this base;
      // `starting-snapshot-id` is an exclusive lower bound on both sides
      val pin = props.getOrElse(s"mv.base.$d.$t", "1")
      spark.readStream
        .option("starting-snapshot-id", pin)
        .table(s"$catalogName.$d.$t.changes")
        .writeStream
        .option("checkpointLocation",
          checkpointDir(props, "graft_mvm_ckpt_", s"$d.$t"))
        .foreachBatch { (_: DataFrame, _: Long) =>
          // signal only — the batch frame is deliberately untouched
          val (mode, n) = cat.refreshMaterializedView(db, view)
          onRefresh(mode, n)
        }
        .trigger(if (availableNow) Trigger.AvailableNow()
          else Trigger.ProcessingTime(0L))
        .start()
    }
  }

  /** The same commit-signal discipline for a PERSISTENT VECTOR INDEX
    * ([[graft.ops.VectorIndex]]): tail the base table's CDC stream, fold
    * each signal into `VectorIndex.refresh` — which advances its own pin
    * from per-commit metadata, so replays are no-ops and a restart
    * resumes exactly. An ANN index that lags ingest by one micro-batch
    * instead of one nightly rebuild is the difference between "search
    * finds today's documents" and "search finds yesterday's". */
  def maintainVectorIndex(spark: SparkSession, cat: SnapshotCatalog,
      catalogName: String, db: String, index: String,
      availableNow: Boolean = true,
      onRefresh: (String, Long) => Unit = (_, _) => ()): StreamingQuery =
    maintainIndex(spark, cat, catalogName, db, index, "vector index",
      graft.ops.VectorIndex.PropBase, graft.ops.VectorIndex.PropPin,
      "graft_vixm_ckpt_", () => graft.ops.VectorIndex.refresh(cat, db, index),
      availableNow, onRefresh)

  /** And for a PERSISTENT INVERTED TEXT INDEX ([[graft.ops.TextIndex]]):
    * the same commit signal folds into `TextIndex.refresh`, so lexical
    * search lags ingest by one micro-batch too — both retrieval paths of
    * a hybrid (BM25 + ANN) stack stay fresh off the same CDC stream. */
  def maintainTextIndex(spark: SparkSession, cat: SnapshotCatalog,
      catalogName: String, db: String, index: String,
      availableNow: Boolean = true,
      onRefresh: (String, Long) => Unit = (_, _) => ()): StreamingQuery =
    maintainIndex(spark, cat, catalogName, db, index, "text index",
      graft.ops.TextIndex.PropBase, graft.ops.TextIndex.PropPin,
      "graft_tixm_ckpt_", () => graft.ops.TextIndex.refresh(cat, db, index),
      availableNow, onRefresh)

  /** And for a PERSISTENT MINHASH NEAR-DUP INDEX ([[graft.ops.DedupIndex]]):
    * the commit signal folds into `DedupIndex.refresh`, so continuous
    * ingest dedup ("does this batch near-duplicate the corpus?") probes
    * a sketch that lags the corpus by one micro-batch. */
  def maintainDedupIndex(spark: SparkSession, cat: SnapshotCatalog,
      catalogName: String, db: String, index: String,
      availableNow: Boolean = true,
      onRefresh: (String, Long) => Unit = (_, _) => ()): StreamingQuery =
    maintainIndex(spark, cat, catalogName, db, index, "dedup index",
      graft.ops.DedupIndex.PropBase, graft.ops.DedupIndex.PropPin,
      "graft_dixm_ckpt_", () => graft.ops.DedupIndex.refresh(cat, db, index),
      availableNow, onRefresh)

  /** The shared commit-signal stream behind both index maintainers: the
    * refresh thunk advances the index's own pin from per-commit metadata,
    * so replays are no-ops and a restart resumes exactly (the MV
    * discipline above, verbatim). */
  private def maintainIndex(spark: SparkSession, cat: SnapshotCatalog,
      catalogName: String, db: String, index: String, kind: String,
      basePropKey: String, pinPropKey: String, tempPrefix: String,
      refresh: () => (String, Long), availableNow: Boolean,
      onRefresh: (String, Long) => Unit): StreamingQuery = {
    val props = cat.meta(db, index).properties
    val baseKey = props.getOrElse(basePropKey,
      throw new IllegalArgumentException(s"$db.$index is not a $kind"))
    val Array(bdb, btab) = baseKey.split("\\.", 2)
    val pin = props(pinPropKey)
    spark.readStream
      .option("starting-snapshot-id", pin)
      .table(s"$catalogName.$bdb.$btab.changes")
      .writeStream
      .option("checkpointLocation",
        checkpointDir(props, tempPrefix, s"$bdb.$btab"))
      .foreachBatch { (_: DataFrame, _: Long) =>
        val (mode, n) = refresh()
        onRefresh(mode, n)
      }
      .trigger(if (availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime(0L))
      .start()
  }
}
