package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** Per-file bloom-filter data skipping ([[graft.catalog.BloomStats]]):
  * point lookups on high-cardinality unsorted keys must plan only the
  * files whose bloom admits the key — the tier below min/max, which
  * cannot exclude anything when every file spans the key range. The
  * soundness bar is the same as min/max pruning: a skip may NEVER drop
  * a row (blooms have no false negatives by construction); every skip
  * assert here is paired with an exact-result assert. */
class BloomSkippingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCat(): (SnapshotCatalog, String) = {
    val dir = Files.createTempDirectory("graft_bloom_").toString
    (new SnapshotCatalog(spark, dir), dir)
  }

  test("point lookup skips files whose bloom excludes the key; results exact") {
    val (cat, _) = freshCat()
    val schema = Seq((0L, "s")).toDF("id", "tag").schema
    cat.createTable("db", "evt", schema,
      properties = Map(BloomStats.PropCols -> "id,tag"))
    // two appends with fully OVERLAPPING [min,max] id ranges (evens vs
    // odds) — min/max alone can prune NOTHING for any point lookup
    cat.append("db", "evt",
      (0L until 200L by 2).map(i => (i, s"t$i")).toDF("id", "tag").coalesce(1))
    cat.append("db", "evt",
      (1L until 200L by 2).map(i => (i, s"t$i")).toDF("id", "tag").coalesce(1))
    val snap = cat.currentSnapshot("db", "evt").snapshotId
    // bloom pointers landed in the per-file stats
    val st = cat.snapshotAt("db", "evt", snap).fileStats
    assert(st.values.forall(m => m.contains("bloom.id") && m.contains("bloom.tag")))

    // an id from the EVEN file: the odd file's bloom must exclude it
    val (kept4, skip4) = cat.pruneFiles("db", "evt", snap, col("id") === 4L)
    assert(kept4.size == 1 && skip4.size == 1,
      s"expected bloom to skip the odd file: kept=$kept4 skipped=$skip4")
    // string column too
    val (keptS, skipS) = cat.pruneFiles("db", "evt", snap, col("tag") === "t7")
    assert(keptS.size == 1 && skipS.size == 1)
    // an absent key can skip BOTH files (fpp permitting, this tiny bloom
    // is exact in practice) — and the result must be empty either way
    assert(cat.readWhere("db", "evt", snap, col("id") === 1000L).count() == 0)

    // SOUNDNESS: every present key must survive pruning with its exact row
    (0L until 200L).foreach { i =>
      val got = cat.readWhere("db", "evt", snap, col("id") === i)
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((i, s"t$i")), s"id=$i got $got")
    }
    // IN-lists probe the bloom per value
    val (keptIn, _) = cat.pruneFiles("db", "evt", snap, col("id").isin(2L, 8L))
    assert(keptIn.size == 1)
    assert(cat.readWhere("db", "evt", snap, col("id").isin(2L, 9L))
      .as[(Long, String)].collect().toSet == Set((2L, "t2"), (9L, "t9")))
  }

  test("lost or corrupt sidecar degrades to a scan, never a wrong answer") {
    val (cat, dir) = freshCat()
    val schema = Seq((0L, "s")).toDF("id", "tag").schema
    cat.createTable("db", "deg", schema,
      properties = Map(BloomStats.PropCols -> "id"))
    cat.append("db", "deg",
      (0L until 50L by 2).map(i => (i, s"t$i")).toDF("id", "tag").coalesce(1))
    cat.append("db", "deg",
      (1L until 50L by 2).map(i => (i, s"t$i")).toDF("id", "tag").coalesce(1))
    val snap = cat.currentSnapshot("db", "deg").snapshotId
    // corrupt every sidecar on disk
    val walk = Files.walk(java.nio.file.Paths.get(dir))
    try walk.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .forEachRemaining { p =>
        if (p.getFileName.toString.endsWith(".bloom"))
          Files.write(p, Array[Byte](1, 2, 3))
      }
    finally walk.close()
    BloomStats.clearCacheForTest()
    // pruning keeps both files (no bloom evidence), results stay exact
    val (kept, skipped) = cat.pruneFiles("db", "deg", snap, col("id") === 4L)
    assert(kept.size == 2 && skipped.isEmpty)
    assert(cat.readWhere("db", "deg", snap, col("id") === 4L)
      .as[(Long, String)].collect().toSeq == Seq((4L, "t4")))
  }

  test("SQL path: property-armed table blooms its INSERTs; DML keeps skipping") {
    val (cat, dir) = freshCat()
    spark.conf.set("spark.sql.catalog.bloomc", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.bloomc.warehouse", dir)
    spark.sql("CREATE TABLE bloomc.db.ev (id BIGINT, tag STRING) " +
      s"TBLPROPERTIES('${BloomStats.PropCols}'='id')")
    spark.sql("INSERT INTO bloomc.db.ev SELECT id * 2, concat('t', id * 2) " +
      "FROM range(0, 100)")
    spark.sql("INSERT INTO bloomc.db.ev SELECT id * 2 + 1, concat('t', id * 2 + 1) " +
      "FROM range(0, 100)")
    val snap = cat.currentSnapshot("db", "ev").snapshotId
    val (kept, skipped) = cat.pruneFiles("db", "ev", snap, col("id") === 42L)
    assert(skipped.nonEmpty, s"bloom should skip odd-id files: kept=$kept")
    assert(spark.sql("SELECT tag FROM bloomc.db.ev WHERE id = 42")
      .as[String].collect().toSeq == Seq("t42"))
    // PLAN-level proof on the SQL path: the point lookup's planned scan
    // carries only the file whose bloom admits the key — the skip happens
    // at planning, before any task exists
    val scan = spark.sql("SELECT tag FROM bloomc.db.ev WHERE id = 42")
      .queryExecution.executedPlan
      .collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.get
    val planned = scan.toBatch.planInputPartitions().length
    assert(planned == 1, s"bloom skip must reach the planned scan: $planned partitions")

    // a MoR UPDATE writes new files through the DML path — they must
    // bloom too, and the lookup stays exact
    spark.sql("UPDATE bloomc.db.ev SET tag = 'updated' WHERE id = 42")
    val snap2 = cat.currentSnapshot("db", "ev").snapshotId
    val st2 = cat.snapshotAt("db", "ev", snap2)
    val newFiles = st2.files.filterNot(cat.snapshotAt("db", "ev", snap).files.contains)
    assert(newFiles.nonEmpty &&
      newFiles.forall(f => st2.fileStats(f).contains("bloom.id")))
    assert(spark.sql("SELECT tag FROM bloomc.db.ev WHERE id = 42")
      .as[String].collect().toSeq == Seq("updated"))
  }

  test("rebuild_blooms backfills adopted files without rewriting data") {
    val (cat, dir) = freshCat()
    val schema = Seq((0L, "s")).toDF("id", "tag").schema
    cat.createTable("db", "ad", schema,
      properties = Map(BloomStats.PropCols -> "id"))
    // adoption is zero-copy BY DESIGN — no data read, so no blooms
    val srcDir = Files.createTempDirectory("graft_bloom_adopt_")
    (0L until 60L by 2).map(i => (i, s"t$i")).toDF("id", "tag")
      .coalesce(1).write.mode("overwrite").parquet(srcDir.toString)
    cat.adoptFiles("db", "ad", srcDir, "append")
    val srcDir2 = Files.createTempDirectory("graft_bloom_adopt2_")
    (1L until 60L by 2).map(i => (i, s"t$i")).toDF("id", "tag")
      .coalesce(1).write.mode("overwrite").parquet(srcDir2.toString)
    cat.adoptFiles("db", "ad", srcDir2, "append")
    val preSnap = cat.currentSnapshot("db", "ad").snapshotId
    assert(cat.snapshotAt("db", "ad", preSnap).fileStats.values
      .forall(m => !m.contains("bloom.id")))
    val (keptPre, _) = cat.pruneFiles("db", "ad", preSnap, col("id") === 4L)
    assert(keptPre.size == 2, "no blooms yet: both files plan")

    // backfill: one scan job over exactly the unbloomed files, one
    // stats-only commit — the file list must be IDENTICAL
    val snap = cat.rebuildBlooms("db", "ad").get
    assert(snap.operation == "rebuild_blooms" &&
      snap.summary("bloomed_files") == "2")
    assert(snap.files == cat.snapshotAt("db", "ad", preSnap).files,
      "stats-only commit must not touch the file list")
    val (kept, skipped) = cat.pruneFiles("db", "ad", snap.snapshotId, col("id") === 4L)
    assert(kept.size == 1 && skipped.size == 1, s"kept=$kept")
    assert(cat.readWhere("db", "ad", snap.snapshotId, col("id") === 4L)
      .as[(Long, String)].collect().toSeq == Seq((4L, "t4")))
    // idempotent: everything bloomed -> no new commit
    assert(cat.rebuildBlooms("db", "ad").isEmpty)
    // row-identical commit: incremental consumers see NOTHING across it
    assert(cat.readIncremental("db", "ad", preSnap, snap.snapshotId).count() == 0)

    // the SQL CALL face drives the same path
    spark.conf.set("spark.sql.catalog.bloomp", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.bloomp.warehouse", dir)
    val r = spark.sql("CALL bloomp.system.rebuild_blooms('db.ad')").collect()
    assert(r.head.isNullAt(0) && r.head.getInt(1) == 0)
  }

  test("partitioned table: partition column excluded, content column bloomed") {
    val (cat, _) = freshCat()
    val df = (0L until 40L).map(i => (i, s"k${i % 4}")).toDF("id", "part")
    cat.createTable("db", "pt", df.schema, partitionCols = Seq("part"),
      properties = Map(BloomStats.PropCols -> "id,part"))
    cat.append("db", "pt", df)
    val snap = cat.currentSnapshot("db", "pt").snapshotId
    val st = cat.snapshotAt("db", "pt", snap).fileStats
    // partition values live in the PATH, not the content — no bloom for
    // them (path pruning is already exact); the id column blooms
    assert(st.values.forall(m => m.contains("bloom.id") && !m.contains("bloom.part")))
    assert(cat.readWhere("db", "pt", snap, col("id") === 17L)
      .select("id").as[Long].collect().toSeq == Seq(17L))
  }
}
