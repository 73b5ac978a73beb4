package graft

import java.nio.file.{Files, Paths}
import java.time.Instant

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotCatalog

/** Randomized INVARIANT harness over the commit protocol: drive random
  * operation sequences (append / overwrite / delete / update / upsert /
  * their merge-on-read flavors / compact / z-order / rollback / evolve)
  * against a live catalog and after
  * EVERY commit assert the properties the engine's metadata answers stand
  * on. A summary bound that drifts from the data is served as a WRONG
  * metadata-only answer at scale, so these checks are exactness, not
  * sanity:
  *
  *  - `record_count` equals the actual scan count (or is honestly -1);
  *  - `min.<c>`/`max.<c>` in the summary equal the scanned min/max;
  *  - every file in the log exists on disk;
  *  - time travel to every retained snapshot reproduces ITS recorded count.
  *
  * Fixed seed: failures replay deterministically.
  */
class CatalogInvariantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(rng: Random, n: Int): DataFrame = {
    val base = rng.nextInt(1000).toLong
    (0 until n).map(i => (base + i, rng.nextInt(100).toLong, s"v${rng.nextInt(50)}"))
      .toDF("id", "score", "name")
  }

  private def checkInvariants(cat: SnapshotCatalog, db: String, t: String): Unit = {
    val snap = cat.currentSnapshot(db, t)
    val data = cat.readLatest(db, t)
    val actual = data.agg(
      count(lit(1)), min("id"), max("id"), min("score"), max("score"),
      min("name"), max("name")).head

    if (snap.recordCount >= 0)
      assert(snap.recordCount == actual.getLong(0),
        s"record_count=${snap.recordCount} actual=${actual.getLong(0)} op=${snap.operation}")
    def bound(key: String, idx: Int): Unit =
      snap.summary.get(key).foreach { v =>
        val a = if (actual.isNullAt(idx)) null else actual.get(idx).toString
        assert(v == a, s"$key=$v actual=$a op=${snap.operation} summary=${snap.summary}")
      }
    bound("min.id", 1); bound("max.id", 2)
    bound("min.score", 3); bound("max.score", 4)
    bound("min.name", 5); bound("max.name", 6)

    val root = Paths.get(cat.warehouse, db, t)
    snap.files.foreach(f => assert(Files.exists(root.resolve(f)), s"missing file $f"))

    // row lineage: every visible row has an id, ids never collide, and
    // none exceeds the claimed high-water (re-minting or range reuse
    // after any op interleaving would break all three)
    if (cat.rowLineageEnabled(db, t)) {
      val rids = cat.readWithRowIds(db, t)
        .select("_row_id", "_last_updated_snapshot_id")
      assert(rids.where(col("_row_id").isNull).isEmpty,
        s"null row ids after ${snap.operation}")
      val n = rids.count(); val d = rids.select("_row_id").distinct().count()
      assert(n == d, s"duplicate row ids after ${snap.operation}: $n rows, $d distinct")
      snap.summary.get("next-row-id").map(_.toLong).foreach { next =>
        val mx = rids.agg(max("_row_id")).head
        if (!mx.isNullAt(0))
          assert(mx.getLong(0) < next,
            s"row id ${mx.getLong(0)} >= high-water $next after ${snap.operation}")
      }
      // last-updated: never null, never from the future — any op
      // interleaving that forged or lost freshness breaks one of these
      assert(rids.where(col("_last_updated_snapshot_id").isNull).isEmpty,
        s"null last-updated after ${snap.operation}")
      val mxLu = rids.agg(max("_last_updated_snapshot_id")).head
      if (!mxLu.isNullAt(0))
        assert(mxLu.getLong(0) <= snap.snapshotId,
          s"last-updated ${mxLu.getLong(0)} > current ${snap.snapshotId}")
    }
    snap.deleteFiles.foreach(d =>
      assert(Files.exists(root.resolve(d.path)), s"missing delete file ${d.path}"))

    // time travel to the three most recent retained snapshots (bounded so
    // the harness stays fast; every snapshot gets covered across steps)
    cat.snapshotList(db, t).takeRight(3).foreach { s =>
      if (s.recordCount >= 0)
        assert(cat.readAsOf(db, t, s.snapshotId).count() == s.recordCount,
          s"time travel to ${s.snapshotId} (${s.operation}) count drifted")
    }
  }

  /** Align a random frame to the table's CURRENT schema (evolve adds
    * columns mid-sequence; appends must carry them, null-filled). */
  private def conform(cat: SnapshotCatalog, db: String, t: String,
      df: DataFrame): DataFrame = {
    val schema = cat.currentSnapshot(db, t).schema
    val widened = schema.fields.foldLeft(df) { (d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    widened.select(schema.fieldNames.map(n => col(s"`$n`")).toIndexedSeq: _*)
  }

  test("random operation sequences preserve metadata exactness") {
    runTrials(new Random(20260812L), trial => {
      var tick = 0L
      new SnapshotCatalog(spark,
        Files.createTempDirectory(s"graft_inv_$trial").toString,
        clock = () => { tick += 1; Instant.parse("2026-07-01T00:00:00Z").plusSeconds(tick) })
    }, sqlOk = true)
  }

  test("random operation sequences over the CAS object-store log are behavior-identical") {
    // the whole op mix (CoW + MoR DML, compact/zorder, rollback, evolve)
    // through ObjectStorePointerLogStore + CasCommitMutex with
    // attempt-unique artifact names: every metadata-exactness invariant
    // must hold exactly as under the file-lock default
    runTrials(new Random(20260812L), trial => {
      var tick = 0L
      new SnapshotCatalog(spark,
        Files.createTempDirectory(s"graft_invcas_$trial").toString,
        clock = () => { tick += 1; Instant.parse("2026-07-01T00:00:00Z").plusSeconds(tick) },
        mutex = new graft.catalog.CasCommitMutex,
        log = new graft.catalog.ObjectStorePointerLogStore(
          new graft.catalog.InMemoryObjectStore))
    })
  }

  private def runTrials(rng: Random, mkCat: Int => SnapshotCatalog,
      sqlOk: Boolean = false): Unit = {
    (1 to 3).foreach { trial =>
      val cat = mkCat(trial)
      val t = "t"
      // SQL DML rides a per-trial plugin catalog over the same warehouse
      // (file-backed trials only: the plugin constructs its own catalog
      // instance, which cannot see a trial's in-memory object store)
      val cname = s"invsql_t$trial"
      if (sqlOk) {
        spark.conf.set(s"spark.sql.catalog.$cname",
          "graft.catalog.spark.SnapCatalogPlugin")
        spark.conf.set(s"spark.sql.catalog.$cname.warehouse", cat.warehouse)
      }
      // the WHOLE op mix runs over a row-lineage table: identity
      // invariants (unique, non-null, below the high-water) must hold
      // across every CoW/MoR/rewrite/rollback/expire interleaving
      cat.createTable("db", t, frame(rng, 1).schema,
        properties = Map("row.lineage" -> "true"))
      cat.append("db", t, frame(rng, 40))
      checkInvariants(cat, "db", t)
      (1 to 8).foreach { _ =>
        rng.nextInt(20) match {
          case 0 => cat.append("db", t, conform(cat, "db", t, frame(rng, 10 + rng.nextInt(40))))
          case 1 => cat.overwrite("db", t, conform(cat, "db", t, frame(rng, 10 + rng.nextInt(40))))
          case 2 => cat.delete("db", t, col("score") < (rng.nextInt(60).toLong + 20L))
          case 3 => cat.update("db", t, col("score") > 50L,
            Map("name" -> lit(s"upd${rng.nextInt(10)}")))
          case 4 =>
            val src = conform(cat, "db", t, frame(rng, 10).dropDuplicates("id"))
            cat.upsert("db", t, src, Seq("id"))
          case 5 => cat.compact("db", t, 1 + rng.nextInt(3))
          case 6 =>
            // z-order needs summary bounds for its grid (absent right
            // after a rollback to the empty create snapshot)
            val s = cat.currentSnapshot("db", t).summary
            if (s.contains("min.id") && s.contains("min.score"))
              cat.compactZOrder("db", t, Seq("id", "score"), 1 + rng.nextInt(3))
          case 7 =>
            val ids = cat.snapshotList("db", t).map(_.snapshotId)
            val target = ids(rng.nextInt(ids.size))
            if (target != ids.last) cat.rollback("db", t, target)
          case 8 =>
            val cur = cat.currentSnapshot("db", t).schema
            val name = s"extra${cur.fieldNames.length}"
            if (!cur.fieldNames.contains(name))
              cat.evolveSchema("db", t, cur.add(name, "double"))
          case 9 => cat.deleteMoR("db", t, col("score") < (rng.nextInt(40).toLong + 10L))
          case 10 => cat.updateMoR("db", t, col("score") > (40L + rng.nextInt(40)),
            Map("name" -> lit(s"mor${rng.nextInt(10)}")))
          case 11 =>
            val src = conform(cat, "db", t, frame(rng, 10).dropDuplicates("id"))
            cat.upsertMoR("db", t, src, Seq("id"))
          // r8 stats-only maintenance commits: row-identical by contract,
          // so every invariant must hold verbatim across them
          case 12 => cat.rewriteManifests("db", t)
          case 13 =>
            if (!cat.meta("db", t).properties.contains(
                graft.catalog.BloomStats.PropCols))
              cat.setProperty("db", t,
                graft.catalog.BloomStats.PropCols, Some("id"))
            cat.rebuildBlooms("db", t)
          // r8-cont stats-only commits: NDV + histogram analysis must
          // also be invisible to every invariant
          case 14 => cat.analyzeNdv("db", t, Seq("id"))
          case 15 =>
            // needs at least two distinct boundary values to emit
            cat.analyzeHistogram("db", t, Seq("score"), bins = 4)
          // r10 scoped compaction: row-preserving by contract, so every
          // invariant (incl. identity stability) must hold across it
          case 16 => cat.compactWhere("db", t,
            col("score") < (rng.nextInt(80).toLong + 20L), 1 + rng.nextInt(2))
          // r11 SQL delta DML on the lineage table: identity invariants
          // must hold across the SupportsDelta route too (file-backed
          // trials; the CAS trial maps these to the API twins so RNG
          // consumption — and thus the op sequence — stays identical)
          case 17 =>
            val cut = 40L + rng.nextInt(40)
            val tag = rng.nextInt(10)
            if (sqlOk)
              spark.sql(s"UPDATE $cname.db.t SET name = 'sql$tag' " +
                s"WHERE score > $cut")
            else cat.updateMoR("db", t, col("score") > cut,
              Map("name" -> lit(s"sql$tag")))
          case 18 =>
            val src = conform(cat, "db", t, frame(rng, 8).dropDuplicates("id"))
            if (sqlOk) {
              src.createOrReplaceTempView("inv_sql_src")
              spark.sql(s"MERGE INTO $cname.db.t tt USING inv_sql_src s " +
                "ON tt.id = s.id " +
                "WHEN MATCHED THEN UPDATE SET * " +
                "WHEN NOT MATCHED THEN INSERT *")
            } else cat.upsertMoR("db", t, src, Seq("id"))
          case 19 =>
            // EQUALITY delete by key — later random appends overlap the
            // id space, so interleavings naturally re-insert eq-killed
            // ids and must survive them (the per-file coverage rule);
            // optionally the eq shards convert to positions right after
            val victims = cat.readLatest("db", t)
              .where(col("id") % 3 === rng.nextInt(3).toLong)
              .select("id").distinct().limit(12)
            if (!victims.isEmpty) {
              cat.deleteMoREq("db", t, victims)
              if (rng.nextInt(2) == 0) cat.convertEqualityDeletes("db", t)
            } else { rng.nextInt(2); () } // keep RNG consumption uniform
        }
        checkInvariants(cat, "db", t)
      }
    }
  }
}
