package graft

import java.nio.file.{Files, Paths}
import java.time.Instant

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** SQL row-level DML over LIVE merge-on-read deletes — the SupportsDelta
  * path (Iceberg-v2-style position-delta writes, cf. reference gap: the
  * reference only overwrites, `5_migrate_tables_data.py:80-83`). A table
  * whose snapshot carries delete files hands the rewrite a
  * [[graft.catalog.spark.SnapDeltaOperation]]; the rewritten query reads
  * the MERGED position-tagged scan (MorDeltaScanRule) and task writers
  * commit position deletes + insert deltas adopted as ONE snapshot.
  * Asserts: end-to-end results, the delta commit SHAPE (no data file
  * rewritten, O(matched+inserted) amplification), exact metadata counts,
  * time travel, changelog, partitioned/bucketed layouts, aliased targets,
  * and compact() folding. */
class SqlDeltaDmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog(prefix: String): (SnapshotCatalog, String) = {
    val dir = Files.createTempDirectory("graft_sdl_").toString
    var tick = 0L
    val cat = new SnapshotCatalog(spark, dir,
      clock = () => { tick += 1; Instant.parse("2026-06-01T00:00:00Z").plusSeconds(tick * 3600) })
    spark.conf.set(s"spark.sql.catalog.$prefix", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set(s"spark.sql.catalog.$prefix.warehouse", dir)
    (cat, prefix)
  }

  test("UPDATE / MERGE / DELETE over live MoR deletes, no compact between") {
    val (cat, c) = freshCatalog("sdl1")
    val rows = (1L to 20L).map(k => (k, s"v$k", k * 10)).toDF("id", "name", "score")
    cat.createTable("db", "t", rows.schema)
    cat.append("db", "t", rows.repartition(2))
    cat.deleteMoR("db", "t", col("id") <= 3L) // live deletes: 1,2,3 dead
    val live = cat.currentSnapshot("db", "t")

    // 1. SQL UPDATE over live deletes — pre-r6 this refused with a
    // compact-first hint; now it commits a position delta
    spark.sql(s"UPDATE $c.db.t SET name = 'X' WHERE id = 5")
    val s1 = cat.currentSnapshot("db", "t")
    assert(live.files.forall(s1.files.contains), "no data file rewritten")
    assert(s1.operation == "update")
    assert(s1.summary("record_count") == "17")
    assert(s1.summary("deleted_records") == "1" && s1.summary("added_records") == "1")
    assert(spark.sql(s"SELECT name FROM $c.db.t WHERE id = 5").head.getString(0) == "X")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.db.t").head.getLong(0) == 17)

    // 2. SQL MERGE over live deletes: dead id=2 is NOT MATCHED (re-insert),
    // id=5 updated, id=42 fresh insert
    spark.sql(
      s"""MERGE INTO $c.db.t t
         |USING (SELECT * FROM VALUES (2L, 'revived', 0L), (5L, 'merged', 99L),
         |  (42L, 'new', 1L) AS s(id, name, score)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val s2 = cat.currentSnapshot("db", "t")
    assert(s2.operation == "merge" && s2.summary("record_count") == "19")
    assert(s1.files.forall(s2.files.contains))
    assert(spark.sql(s"SELECT name FROM $c.db.t WHERE id = 5").head.getString(0) == "merged")
    assert(spark.sql(s"SELECT name FROM $c.db.t WHERE id = 2").head.getString(0) == "revived")
    assert(spark.sql(s"SELECT name FROM $c.db.t WHERE id = 42").head.getString(0) == "new")

    // 3. non-translatable SQL DELETE (RLIKE can't downgrade to metadata)
    spark.sql(s"DELETE FROM $c.db.t WHERE name RLIKE '^v1[0-2]$$'") // v10,v11,v12
    val s3 = cat.currentSnapshot("db", "t")
    assert(s3.operation == "delete" && s3.summary("record_count") == "16")
    assert(s3.summary("added_records") == "0" && s3.summary("deleted_records") == "3")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.db.t").head.getLong(0) == 16)

    // time travel across the delta commits stays exact
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.db.t VERSION AS OF ${s1.snapshotId}")
      .head.getLong(0) == 17)
    // changelog over a delta commit is row-exact: 1 delete + 1 insert
    val ch = cat.readChangelog("db", "t", live.snapshotId, s1.snapshotId)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(ch == Map("delete" -> 1L, "insert" -> 1L), ch.toString)
    // compact folds the whole delete tier
    val folded = cat.compact("db", "t", 1)
    assert(folded.deleteFiles.isEmpty && folded.summary("record_count") == "16")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.db.t").head.getLong(0) == 16)
  }

  test("aliased targets route the delta path (SubqueryAlias stripped)") {
    val (cat, c) = freshCatalog("sdl2")
    val rows = (1L to 10L).map(k => (k, k * 2)).toDF("k", "v")
    cat.createTable("db", "a", rows.schema)
    cat.append("db", "a", rows)
    cat.deleteMoR("db", "a", col("k") === 1L)
    val live = cat.currentSnapshot("db", "a")

    spark.sql(s"UPDATE $c.db.a AS x SET v = -1 WHERE x.k = 4")
    val u = cat.currentSnapshot("db", "a")
    assert(live.files.forall(u.files.contains), "aliased UPDATE went delta")
    assert(spark.sql(s"SELECT v FROM $c.db.a WHERE k = 4").head.getLong(0) == -1L)

    // MERGE with an aliased target and a conditional DELETE action
    spark.sql(
      s"""MERGE INTO $c.db.a AS tgt
         |USING (SELECT * FROM VALUES (4L), (7L) AS s(k)) src
         |ON tgt.k = src.k
         |WHEN MATCHED AND tgt.v = -1 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = 0""".stripMargin)
    val m = cat.currentSnapshot("db", "a")
    assert(m.summary("record_count") == "8") // 10 - k1 - k4
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.db.a WHERE k = 4").head.getLong(0) == 0)
    assert(spark.sql(s"SELECT v FROM $c.db.a WHERE k = 7").head.getLong(0) == 0L)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: delete and update actions, delta shape") {
    val (cat, c) = freshCatalog("sdl8")
    val rows = (1L to 20L).map(k => (k, s"n$k")).toDF("k", "v")
    cat.createTable("db", "nms", rows.schema)
    cat.append("db", "nms", rows)
    cat.deleteMoR("db", "nms", col("k") === 1L) // live deletes: delta route
    val live = cat.currentSnapshot("db", "nms")

    // the full three-clause MERGE: matched update, not-matched insert,
    // and not-matched-by-source rows (k not in {2,3,30}) conditionally
    // deleted (k > 15) or marked stale
    spark.sql(
      s"""MERGE INTO $c.db.nms t
         |USING (SELECT * FROM VALUES (2L, 'U2'), (3L, 'U3'), (30L, 'NEW')
         |  AS s(k, v)) s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.k > 15 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""".stripMargin)
    val after = cat.currentSnapshot("db", "nms")
    assert(live.files.forall(after.files.contains), "no data file rewritten")
    assert(after.operation == "merge")
    // survivors: 2..15 (k=1 was dead) + 30; 16..20 deleted by-source
    assert(spark.sql(s"SELECT count(*) FROM $c.db.nms").head.getLong(0) == 15L)
    val vals = spark.sql(s"SELECT k, v FROM $c.db.nms ORDER BY k")
      .as[(Long, String)].collect().toMap
    assert(vals(2L) == "U2" && vals(3L) == "U3" && vals(30L) == "NEW", vals.toString)
    assert((4L to 15L).forall(k => vals(k) == "stale"), vals.toString)
    assert(!(16L to 20L).exists(vals.contains), vals.toString)
  }

  test("write.<op>.mode=merge-on-read opts a CLEAN table into the delta path") {
    val (cat, c) = freshCatalog("sdl3")
    val rows = (1L to 50L).map(k => (k, s"n$k")).toDF("k", "v")
    cat.createTable("db", "opt", rows.schema)
    cat.append("db", "opt", rows)
    cat.setProperty("db", "opt", "write.update.mode", Some("merge-on-read"))
    val before = cat.currentSnapshot("db", "opt")
    spark.sql(s"UPDATE $c.db.opt SET v = 'z' WHERE k <= 2")
    val after = cat.currentSnapshot("db", "opt")
    assert(before.files.forall(after.files.contains),
      "opted-in UPDATE must not rewrite data files")
    assert(after.deleteFiles.map(_.rows).sum == 2)
    assert(after.summary("record_count") == "50")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.db.opt WHERE v = 'z'")
      .head.getLong(0) == 2)
    // DELETE has no opt-in property -> translatable downgrade still rules
    // (position-delete metadata path, not the delta writer)
    spark.sql(s"DELETE FROM $c.db.opt WHERE k = 50")
    assert(cat.currentSnapshot("db", "opt").summary("record_count") == "49")
  }

  test("partitioned table: delta DML lands partition-laid inserts") {
    val (cat, c) = freshCatalog("sdl4")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    cat.createTable("db", "po", orders.schema, partitionCols = Seq("o_orderstatus"))
    cat.append("db", "po", orders)
    val total = orders.count()
    cat.deleteMoR("db", "po", col("o_orderkey") % 100 === 0)
    val dead = orders.where(col("o_orderkey") % 100 === 0).count()
    val live = cat.currentSnapshot("db", "po")

    // UPDATE that MOVES rows across partitions (status X doesn't exist)
    val moved = spark.sql(
      s"SELECT count(*) AS n FROM $c.db.po WHERE o_totalprice > 300000").head.getLong(0)
    assert(moved > 0)
    spark.sql(s"UPDATE $c.db.po SET o_orderstatus = 'X' WHERE o_totalprice > 300000")
    val u = cat.currentSnapshot("db", "po")
    assert(live.files.forall(u.files.contains))
    assert(u.summary("record_count").toLong == total - dead)
    val delta = u.files.filterNot(live.files.toSet)
    assert(delta.nonEmpty && delta.forall(_.contains("o_orderstatus=X/")),
      s"moved copies must land in the new partition dir: $delta")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.db.po WHERE o_orderstatus = 'X'")
      .head.getLong(0) == moved)
    // partition pruning still serves the post-DML snapshot
    val (cands, _) = cat.pruneFiles("db", "po", u.snapshotId, col("o_orderstatus") === "X")
    assert(cands.nonEmpty && cands.forall(_.contains("o_orderstatus=X/")))
  }

  test("bucketed table: delta DML re-lays inserts into __bucket dirs") {
    val (cat, c) = freshCatalog("sdl5")
    val rows = (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
    cat.createBucketedTable("db", "bk", rows.schema, bucketCol = "k", nBuckets = 4)
    cat.appendBucketed("db", "bk", rows)
    cat.deleteMoR("db", "bk", col("k") === 7L)
    val live = cat.currentSnapshot("db", "bk")

    spark.sql(s"UPDATE $c.db.bk SET v = 'x' WHERE k = 19")
    val u = cat.currentSnapshot("db", "bk")
    assert(live.files.forall(u.files.contains))
    val delta = u.files.filterNot(live.files.toSet)
    assert(delta.nonEmpty && delta.forall(_.contains("__bucket=3/")),
      s"pmod(19,4)=3 — the re-inserted copy must land bucketed: $delta")
    assert(u.summary("record_count") == "99")
    assert(spark.sql(s"SELECT v FROM $c.db.bk WHERE k = 19").head.getString(0) == "x")
    // bucket pruning holds over the post-DML snapshot
    val (cands, _) = cat.pruneFiles("db", "bk", u.snapshotId, col("k") === 19L)
    assert(cands.nonEmpty && cands.forall(_.contains("__bucket=3/")))
  }

  test("no-match DML is a pointer-only commit; empty-footprint dirs swept") {
    val (cat, c) = freshCatalog("sdl6")
    val rows = (1L to 10L).map(k => (k, k)).toDF("k", "v")
    cat.createTable("db", "nm", rows.schema)
    cat.append("db", "nm", rows)
    cat.deleteMoR("db", "nm", col("k") === 1L)
    val live = cat.currentSnapshot("db", "nm")
    spark.sql(s"UPDATE $c.db.nm SET v = 0 WHERE k > 999")
    val s = cat.currentSnapshot("db", "nm")
    assert(s.snapshotId == live.snapshotId + 1)
    assert(s.files == live.files && s.deleteFiles == live.deleteFiles)
    assert(s.summary("record_count") == "9")
    // the statement's scratch dirs are gone (no stray sd-* litter)
    val root = Paths.get(cat.warehouse, "db", "nm")
    def sdDirs(sub: String) = {
      val d = root.resolve(sub)
      if (!Files.isDirectory(d)) Seq.empty
      else { val s = Files.list(d); try s.iterator().asScala.toSeq.map(_.getFileName.toString)
        .filter(_.startsWith("sd-")) finally s.close() }
    }
    assert(sdDirs("data").isEmpty && sdDirs("deletes").isEmpty,
      s"scratch dirs must be swept: ${sdDirs("data")} ${sdDirs("deletes")}")
  }

  test("concurrent commit between scan and adoption fails the statement") {
    val (cat, _) = freshCatalog("sdl7")
    val rows = (1L to 10L).map(k => (k, k)).toDF("k", "v")
    cat.createTable("db", "cc", rows.schema)
    cat.append("db", "cc", rows)
    cat.deleteMoR("db", "cc", col("k") === 1L)
    val stale = cat.currentSnapshot("db", "cc").snapshotId - 1
    val e = intercept[IllegalArgumentException] {
      cat.adoptDelta("db", "cc", "update", "sd-x", Nil, "sd-x", Nil, stale)
    }
    assert(e.getMessage.contains("concurrent commit"), e.getMessage)
  }
}
