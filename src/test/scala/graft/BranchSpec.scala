package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** Named branches (Iceberg branch refs): writable lineages invisible to
  * main until fast-forwarded — the generalization of write-audit-publish
  * to long-lived multi-commit audits. */
class BranchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog(): SnapshotCatalog = {
    val dir = Files.createTempDirectory("graft_br_").toString
    var tick = 0L
    new SnapshotCatalog(spark, dir,
      clock = () => { tick += 1; Instant.parse("2026-06-01T00:00:00Z").plusSeconds(tick * 3600) })
  }

  private def base(cat: SnapshotCatalog): Unit = {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    cat.createTable("db", "t", df.schema)
    cat.append("db", "t", df) // snap 2 (published head)
  }

  test("branch commits stay invisible to main; both lineages time-travel") {
    val cat = freshCatalog()
    base(cat)
    cat.createBranch("db", "t", "audit")
    assert(cat.resolveBranch("db", "t", "audit").contains(2L))
    val b1 = cat.appendBranch("db", "t", "audit", Seq((3L, "c")).toDF("id", "name")) // snap 3
    val b2 = cat.appendBranch("db", "t", "audit", Seq((4L, "d")).toDF("id", "name")) // snap 4
    assert(b1.summary("branch.ref") == "audit" && b1.summary("branch.parent") == "2")
    assert(b2.summary("branch.parent") == "3")
    assert(cat.resolveBranch("db", "t", "audit").contains(4L))
    // main is untouched: published head, reads, record count
    assert(cat.currentSnapshotId("db", "t") == 2L)
    assert(cat.readLatest("db", "t").count() == 2)
    // the branch accumulates
    assert(cat.readBranch("db", "t", "audit").select("id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L, 4L))
    assert(cat.recordCount("db", "t", 4L) == 4L)
    // main can advance independently (no pending-stage style blocking)
    cat.append("db", "t", Seq((9L, "z")).toDF("id", "name")) // snap 5
    assert(cat.readLatest("db", "t").count() == 3)
    assert(cat.readBranch("db", "t", "audit").count() == 4)
  }

  test("fastForward publishes the branch as a pointer commit; divergence refuses") {
    val cat = freshCatalog()
    base(cat)
    cat.createBranch("db", "t", "audit")
    cat.appendBranch("db", "t", "audit", Seq((3L, "c")).toDF("id", "name")) // snap 3
    cat.appendBranch("db", "t", "audit", Seq((4L, "d")).toDF("id", "name")) // snap 4
    val ff = cat.fastForward("db", "t", "audit") // snap 5
    assert(ff.operation == "fastforward")
    assert(ff.summary("branch.forwarded") == "audit")
    assert(!ff.summary.contains("branch.ref"), "the published entry must be visible")
    assert(ff.summary("record_count") == "4")
    assert(cat.currentSnapshotId("db", "t") == 5L)
    assert(cat.readLatest("db", "t").select("id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L, 4L))
    // pure pointer commit: the fastforward entry reuses the branch head's
    // manifest shards verbatim
    val entries = cat.entryLog("db", "t")
    assert(entries.last.manifests == entries.find(_.snapshotId == 4L).get.manifests)
    // divergence: branch forked before main advanced -> refuse
    cat.createBranch("db", "t", "fix", fromSnapshotId = Some(2L))
    cat.appendBranch("db", "t", "fix", Seq((7L, "x")).toDF("id", "name"))
    val e = intercept[IllegalArgumentException] { cat.fastForward("db", "t", "fix") }
    assert(e.getMessage.contains("not an ancestor"))
    // already-current branch refuses too
    cat.createBranch("db", "t", "noop")
    val e2 = intercept[IllegalArgumentException] { cat.fastForward("db", "t", "noop") }
    assert(e2.getMessage.contains("already at the published head"))
  }

  test("refs protect from expiry; dropped branch releases its snapshots") {
    val cat = freshCatalog()
    base(cat)
    cat.createBranch("db", "t", "keepme") // at snap 2
    val b = cat.appendBranch("db", "t", "keepme", Seq((3L, "c")).toDF("id", "name")) // 3
    cat.append("db", "t", Seq((4L, "d")).toDF("id", "name")) // snap 4
    cat.append("db", "t", Seq((5L, "e")).toDF("id", "name")) // snap 5
    cat.expireSnapshots("db", "t", keepLast = 1)
    // the branch HEAD survives (ref-protected); interior ancestry releases
    // — safe, because snapshots are self-contained (the head's file list
    // still references every live file, so GC keeps them)
    val ids = cat.entryLog("db", "t").map(_.snapshotId)
    assert(ids == Seq(3L, 5L), s"got $ids")
    assert(cat.readBranch("db", "t", "keepme").count() == 3)
    assert(cat.readLatest("db", "t").count() == 4)
    // dropping the branch releases its snapshots to the next sweep
    cat.dropBranch("db", "t", "keepme")
    cat.expireSnapshots("db", "t", keepLast = 1)
    val after = cat.entryLog("db", "t").map(_.snapshotId)
    assert(after == Seq(5L), s"got $after")
    val branchOnly = b.files.filterNot(cat.snapshotAt("db", "t", 5L).files.toSet)
    branchOnly.foreach { f =>
      assert(!Files.exists(java.nio.file.Paths.get(cat.warehouse, "db", "t", f)),
        s"released branch file $f must be reclaimed")
    }
  }

  test("expire keeps a multi-commit branch's parent chain fastForward-able") {
    val cat = freshCatalog()
    base(cat) // snap 2 published
    cat.createBranch("db", "t", "long")
    cat.appendBranch("db", "t", "long", Seq((3L, "c")).toDF("id", "name")) // 3
    cat.appendBranch("db", "t", "long", Seq((4L, "d")).toDF("id", "name")) // 4
    cat.appendBranch("db", "t", "long", Seq((5L, "e")).toDF("id", "name")) // 5
    cat.expireSnapshots("db", "t", keepLast = 1)
    // interior branch links (3, 4) survive via the head's parent chain —
    // without them a still-legitimate fastForward could not prove ancestry
    val ids = cat.entryLog("db", "t").map(_.snapshotId)
    assert(ids.containsSlice(Seq(3L, 4L, 5L)), s"chain broken: $ids")
    val ff = cat.fastForward("db", "t", "long")
    assert(cat.readLatest("db", "t").count() == 5)
    assert(ff.summary("record_count") == "5")
  }

  test("guards: name collisions, rollback to branch commits, WAP interplay") {
    val cat = freshCatalog()
    base(cat)
    cat.createBranch("db", "t", "b1")
    intercept[IllegalArgumentException] { cat.createBranch("db", "t", "b1") }
    intercept[IllegalArgumentException] { cat.createTag("db", "t", "b1", 2L) }
    cat.createTag("db", "t", "tg", 2L)
    intercept[IllegalArgumentException] { cat.createBranch("db", "t", "tg") }
    intercept[IllegalArgumentException] { cat.createBranch("db", "t", "42") }
    val bc = cat.appendBranch("db", "t", "b1", Seq((3L, "c")).toDF("id", "name"))
    intercept[IllegalArgumentException] { cat.rollback("db", "t", bc.snapshotId) }
    // a pending WAP stage blocks branch commits like every other commit
    cat.stageAppend("db", "t", Seq((8L, "s")).toDF("id", "name"))
    intercept[IllegalArgumentException] {
      cat.appendBranch("db", "t", "b1", Seq((9L, "x")).toDF("id", "name"))
    }
    intercept[IllegalArgumentException] { cat.fastForward("db", "t", "b1") }
  }

  test("SQL: VERSION AS OF 'branch' reads the branch head; refs table lists it") {
    val cat = freshCatalog()
    base(cat)
    cat.createBranch("db", "t", "audit")
    cat.appendBranch("db", "t", "audit", Seq((3L, "c")).toDF("id", "name"))
    spark.conf.set("spark.sql.catalog.brcat", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.brcat.warehouse", cat.warehouse)
    assert(spark.sql("SELECT sum(id) AS s FROM brcat.db.t VERSION AS OF 'audit'")
      .head.getLong(0) == 6L)
    assert(spark.sql("SELECT sum(id) AS s FROM brcat.db.t").head.getLong(0) == 3L,
      "main SQL reads must not see branch commits")
    val refs = spark.sql("SELECT name, type, snapshot_id FROM brcat.db.t.refs ORDER BY name")
      .as[(String, String, Long)].collect().toSeq
    assert(refs == Seq(("audit", "branch", 3L)))
    // history records the true branch parent
    val parents = spark.sql(
      "SELECT snapshot_id, parent_id FROM brcat.db.t.history ORDER BY snapshot_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(parents(3L).contains(2L))
  }

  test("streams: branch rows reach a snapcat tail only at fastForward") {
    val cat = freshCatalog()
    spark.conf.set("spark.sql.catalog.brstream", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.brstream.warehouse", cat.warehouse)
    val seed = Seq((1L, "a")).toDF("id", "name")
    cat.createTable("db", "bs", seed.schema)
    cat.append("db", "bs", seed)
    val q = spark.readStream.option("starting-snapshot-id", "1").table("brstream.db.bs")
      .writeStream.format("memory").queryName("br_tail").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("br_tail").count() == 1)
      cat.createBranch("db", "bs", "audit")
      cat.appendBranch("db", "bs", "audit", Seq((2L, "b")).toDF("id", "name"))
      q.processAllAvailable()
      // branch commits must NOT leak into the published tail
      assert(spark.table("br_tail").count() == 1)
      cat.fastForward("db", "bs", "audit")
      q.processAllAvailable()
      // fastForward is append-exact relative to the published lineage:
      // exactly the branch's rows arrive, and the stream keeps working
      assert(spark.table("br_tail").as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b")))
      cat.append("db", "bs", Seq((3L, "c")).toDF("id", "name"))
      q.processAllAvailable()
      assert(spark.table("br_tail").count() == 3)
    } finally q.stop()
  }

  test("branch of a MoR-deleted table carries the delete set; fastForward preserves it") {
    val cat = freshCatalog()
    val df = spark.range(10).select(col("id"), (col("id") * 2).as("v"))
    cat.createTable("db", "m", df.schema)
    cat.append("db", "m", df)
    cat.deleteMoR("db", "m", col("id") < 3) // snap 3: 7 live rows
    cat.createBranch("db", "m", "aud")
    cat.appendBranch("db", "m", "aud", spark.range(10, 12)
      .select(col("id"), (col("id") * 2).as("v"))) // snap 4 on branch
    assert(cat.readBranch("db", "m", "aud").count() == 9, "deletes apply on the branch")
    assert(cat.readLatest("db", "m").count() == 7)
    val ff = cat.fastForward("db", "m", "aud")
    assert(ff.deleteFiles.nonEmpty)
    assert(cat.readLatest("db", "m").count() == 9)
    assert(cat.readLatest("db", "m").where(col("id") < 3).count() == 0)
  }

  test("SQL: branch-scoped DML via the branch_<name> write identifier") {
    // DELETE FROM cat.db.t.branch_audit / INSERT INTO ... (the Iceberg
    // branch-write convention): commits land branch-marked and invisible
    // to main; fastForward publishes the whole audited lineage
    val cat = freshCatalog()
    val df = (1L to 10L).map(k => (k, s"n$k")).toDF("id", "name")
    cat.createTable("db", "bd", df.schema)
    cat.append("db", "bd", df) // snap 2, published
    cat.createBranch("db", "bd", "audit")
    spark.conf.set("spark.sql.catalog.brdml", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.brdml.warehouse", cat.warehouse)

    // branch DELETE: a MoR pointer commit on the audit lineage
    spark.sql("DELETE FROM brdml.db.bd.branch_audit WHERE id <= 3")
    // branch INSERT: appendBranch through SQL
    spark.sql("INSERT INTO brdml.db.bd.branch_audit VALUES (100L, 'new')")
    // the branch identifier READS the branch head (merged)
    assert(spark.sql("SELECT count(*) AS n FROM brdml.db.bd.branch_audit")
      .head.getLong(0) == 8) // 10 - 3 + 1
    assert(spark.sql("SELECT count(*) AS n FROM brdml.db.bd.branch_audit WHERE id <= 3")
      .head.getLong(0) == 0)
    // VERSION AS OF 'audit' agrees with the identifier route
    assert(spark.sql("SELECT count(*) AS n FROM brdml.db.bd VERSION AS OF 'audit'")
      .head.getLong(0) == 8)
    // main is untouched by both commits
    assert(spark.sql("SELECT count(*) AS n FROM brdml.db.bd").head.getLong(0) == 10)
    assert(cat.readLatest("db", "bd").count() == 10)
    // the branch delete committed position deletes, no data-file rewrite
    val head = cat.snapshotAt("db", "bd",
      cat.resolveBranch("db", "bd", "audit").get)
    assert(head.summary.get("branch.ref").contains("audit"))
    assert(cat.snapshotAt("db", "bd", 2).files.forall(head.files.contains))

    // fastForward publishes: main now serves the audited state
    cat.fastForward("db", "bd", "audit")
    assert(spark.sql("SELECT count(*) AS n FROM brdml.db.bd").head.getLong(0) == 8)
    assert(spark.sql("SELECT count(*) AS n FROM brdml.db.bd WHERE id <= 3")
      .head.getLong(0) == 0)

    // guards: unknown branch; UPDATE/MERGE on a branch refuse with a hint
    val e1 = intercept[Exception] {
      spark.sql("DELETE FROM brdml.db.bd.branch_ghost WHERE id = 1")
    }
    assert(e1.getMessage.toLowerCase.contains("table or view not found") ||
      e1.getMessage.contains("branch_ghost"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("UPDATE brdml.db.bd.branch_audit SET name = 'x' WHERE id = 5")
    }
    assert(e2.getMessage.contains("branch DML covers DELETE and INSERT"), e2.getMessage)
  }
}
