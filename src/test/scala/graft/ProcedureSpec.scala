package graft

import java.nio.file.{Files, Paths}
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotCatalog

/** `CALL proccat.system.<proc>(...)` — the DSv2 ProcedureCatalog surface
  * (SnapProcedures): every maintenance verb reachable from SQL, result
  * rows asserted, error shapes loud. */
class ProcedureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_proc_").toString
    var tick = 0L
    val cat = new SnapshotCatalog(spark, dir,
      clock = () => { tick += 1; Instant.parse("2026-05-01T00:00:00Z").plusSeconds(tick * 3600) })
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    cat.createTable("db", "nation", nation.schema)   // snap 1 @+1h
    cat.append("db", "nation", nation)               // snap 2 @+2h
    cat.append("db", "nation", nation.limit(3))      // snap 3 @+3h
    spark.conf.set("spark.sql.catalog.proccat", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.proccat.warehouse", dir)
    dir
  }
  private def cat = new SnapshotCatalog(spark, wh)

  test("compact: named args, defaulted num_files, result row, effect") {
    val before = cat.currentSnapshotId("db", "nation")
    val res = spark.sql("CALL proccat.system.compact(table => 'db.nation')").collect()
    assert(res.length == 1)
    assert(res.head.getLong(0) == before + 1)
    assert(res.head.getString(1) == "compact")
    assert(cat.currentSnapshot("db", "nation").files.size == 1)
    assert(spark.sql("SELECT sum(n_nationkey) AS s FROM proccat.db.nation")
      .head.getLong(0) == 300 + 0 + 1 + 2) // 25 keys + dup of first 3
  }

  test("rollback: positional args re-point at an old snapshot") {
    wh
    val t = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    cat.createTable("db", "rb", t.schema)
    cat.append("db", "rb", t)                       // snap 2
    cat.append("db", "rb", Seq((3L, "c")).toDF("id", "v")) // snap 3
    val res = spark.sql("CALL proccat.system.rollback('db.rb', 2)").collect()
    assert(res.head.getString(1) == "rollback")
    assert(spark.sql("SELECT count(*) AS c, sum(id) AS s FROM proccat.db.rb")
      .head.getLong(1) == 3L)
  }

  test("expire_snapshots: count-based and time-based (older_than)") {
    wh
    val t = Seq(1L).toDF("id")
    cat.createTable("db", "exp", t.schema)
    cat.append("db", "exp", t)
    cat.append("db", "exp", Seq(2L).toDF("id"))
    cat.overwrite("db", "exp", Seq(9L).toDF("id")) // strands earlier files
    val res = spark.sql(
      "CALL proccat.system.expire_snapshots(table => 'db.exp', keep_last => 1)").collect()
    assert(res.head.getInt(0) >= 2, s"expected >=2 files reclaimed, got ${res.head.getInt(0)}")
    assert(cat.snapshotList("db", "exp").size == 1)
    // time-based: everything is younger than the cutoff -> nothing expires
    val t2 = spark.sql(
      "CALL proccat.system.expire_snapshots(table => 'db.exp', older_than => '1999-01-01T00:00:00Z')")
      .collect()
    assert(t2.head.getInt(0) == 0)
  }

  test("remove_orphan_files returns the swept debris paths") {
    wh
    val t = Seq(1L).toDF("id")
    cat.createTable("db", "orph", t.schema)
    cat.append("db", "orph", t)
    val debris = Paths.get(wh, "db", "orph", "data", "s99")
    Files.createDirectories(debris)
    Files.write(debris.resolve("part-orphan.snappy.parquet"), Array[Byte](1, 2, 3))
    val res = spark.sql("CALL proccat.system.remove_orphan_files('db.orph')").collect()
    assert(res.map(_.getString(0)).exists(_.contains("part-orphan")), res.toSeq.toString)
    assert(!Files.exists(debris.resolve("part-orphan.snappy.parquet")))
    assert(spark.sql("SELECT sum(id) AS s FROM proccat.db.orph").head.getLong(0) == 1L)
  }

  test("create_tag defaults to the current snapshot; VERSION AS OF reads it") {
    wh
    val t = Seq(1L, 2L).toDF("id")
    cat.createTable("db", "tagd", t.schema)
    cat.append("db", "tagd", t) // snap 2 = current
    val res = spark.sql("CALL proccat.system.create_tag('db.tagd', 'golden')").collect()
    assert(res.head.getString(0) == "golden" && res.head.getLong(1) == 2L)
    cat.append("db", "tagd", Seq(3L).toDF("id"))
    assert(spark.sql("SELECT sum(id) AS s FROM proccat.db.tagd VERSION AS OF 'golden'")
      .head.getLong(0) == 3L)
  }

  test("create_branch + fast_forward publish a branch head as a pointer commit") {
    wh
    val t = Seq(1L).toDF("id")
    cat.createTable("db", "brp", t.schema)
    cat.append("db", "brp", t)
    spark.sql("CALL proccat.system.create_branch('db.brp', 'audit')").collect()
    cat.appendBranch("db", "brp", "audit", Seq(7L).toDF("id"))
    // invisible on main until published
    assert(spark.sql("SELECT sum(id) AS s FROM proccat.db.brp").head.getLong(0) == 1L)
    val ff = spark.sql("CALL proccat.system.fast_forward('db.brp', 'audit')").collect()
    assert(ff.head.getString(1) == "fast_forward")
    assert(spark.sql("SELECT sum(id) AS s FROM proccat.db.brp").head.getLong(0) == 8L)
  }

  test("compact_where: scoped rewrite folds only admitted files, rest carry verbatim") {
    wh
    import org.apache.spark.sql.functions._
    // day-transform-partitioned lineage table: three days, several small
    // appends each — "compact yesterday's partition" is THE use case
    def ts(day: Int, h: Int) = java.sql.Timestamp.from(
      Instant.parse(f"2024-03-0$day%dT$h%02d:00:00Z"))
    val rows = (0 until 18).map(i => (i.toLong, ts(1 + i / 6, i % 6)))
      .toDF("id", "t")
    cat.createTransformPartitionedTable("db", "cw", rows.schema, "t", "day",
      properties = Map("row.lineage" -> "true"))
    (0 until 3).foreach { b => // 3 appends x 3 day dirs = 9 files
      cat.appendTransformed("db", "cw",
        rows.where(col("id") % 3 === b).repartition(1))
    }
    val before = cat.currentSnapshot("db", "cw")
    assert(before.files.size == 9, before.files.toString)
    val idsBefore = cat.readWithRowIds("db", "cw").select("id", "_row_id")
      .as[(Long, Long)].collect().toMap
    val rowsBefore = cat.readLatest("db", "cw").drop("__pt")
      .as[(Long, java.sql.Timestamp)].collect().toSet

    val res = spark.sql("CALL proccat.system.compact_where(" +
      "table => 'db.cw', " +
      "predicate => 't >= TIMESTAMP \\'2024-03-02 00:00:00\\' AND " +
      "t < TIMESTAMP \\'2024-03-03 00:00:00\\'', num_files => 1)").collect()
    assert(res.head.getBoolean(1), res.mkString(","))
    val after = cat.currentSnapshot("db", "cw")
    // day-2's three files folded into one; days 1 and 3 carried VERBATIM
    val carried = before.files.filter(f => !f.contains("__pt=19784"))
    assert(carried.forall(after.files.contains), s"${after.files}")
    assert(after.files.count(_.contains("__pt=19784")) == 1, after.files.toString)
    assert(after.files.size == 7, after.files.toString)
    // rows identical, identity preserved through the scoped rewrite
    assert(cat.readLatest("db", "cw").drop("__pt")
      .as[(Long, java.sql.Timestamp)].collect().toSet == rowsBefore)
    assert(cat.readWithRowIds("db", "cw").select("id", "_row_id")
      .as[(Long, Long)].collect().toMap == idsBefore, "scoped compact re-minted ids")

    // nothing admitted (or a single file): no commit, rewritten=false
    val none = spark.sql("CALL proccat.system.compact_where(" +
      "table => 'db.cw', predicate => 't >= TIMESTAMP \\'2030-01-01 00:00:00\\'')").collect()
    assert(!none.head.getBoolean(1))
    assert(cat.currentSnapshotId("db", "cw") == after.snapshotId)
  }

  test("refresh_materialized_views sweeps every MV of a namespace") {
    val c = cat
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "tag")
    c.createTable("mvs", "base", a.schema)
    c.append("mvs", "base", a)
    c.createMaterializedView("mvs", "m1", "SELECT tag FROM proccat.mvs.base")
    c.createMaterializedView("mvs", "m2",
      "SELECT tag, count(*) AS n FROM proccat.mvs.base GROUP BY tag")
    c.createView("mvs", "plain", "SELECT id FROM proccat.mvs.base") // skipped
    c.append("mvs", "base", Seq((3L, "x")).toDF("id", "tag"))
    val res = spark.sql(
      "CALL proccat.system.refresh_materialized_views('mvs')").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(res == Seq(("mvs.m1", "incremental"), ("mvs.m2", "incremental_agg")), res)
    // both views serve the post-append state; a second sweep is all-fresh
    assert(spark.sql("SELECT count(*) FROM proccat.mvs.m1").head.getLong(0) == 3L)
    assert(spark.sql("SELECT n FROM proccat.mvs.m2 WHERE tag = 'x'")
      .head.getLong(0) == 2L)
    val again = spark.sql(
      "CALL proccat.system.refresh_materialized_views('mvs')").collect()
    assert(again.forall(_.getString(1) == "fresh"), again.mkString(","))
  }

  test("rewrite_small_files: no-op below two small files reports rewritten=false") {
    wh
    val t = Seq(1L).toDF("id")
    cat.createTable("db", "rsf", t.schema)
    cat.append("db", "rsf", t) // one file only
    val res = spark.sql(
      "CALL proccat.system.rewrite_small_files('db.rsf', 1048576, 134217728)").collect()
    assert(res.head.isNullAt(0) && !res.head.getBoolean(1))
    // two tiny appends -> a real bin-pack commit
    cat.append("db", "rsf", Seq(2L).toDF("id"))
    val res2 = spark.sql(
      "CALL proccat.system.rewrite_small_files('db.rsf', 1048576, 134217728)").collect()
    assert(!res2.head.isNullAt(0) && res2.head.getBoolean(1))
    assert(spark.sql("SELECT sum(id) AS s FROM proccat.db.rsf").head.getLong(0) == 3L)
  }

  test("adopt_files: zero-copy adoption through SQL") {
    wh
    val ext = Files.createTempDirectory("graft_proc_adopt_").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(ext)
    val schema = spark.read.parquet(ext).schema
    cat.createTable("db", "adp", schema)
    val res = spark.sql(
      s"CALL proccat.system.adopt_files('db.adp', '$ext')").collect()
    assert(res.head.getString(1) == "adopt_files")
    assert(spark.sql("SELECT count(*) AS c, sum(id) AS s FROM proccat.db.adp")
      .head.getLong(1) == 3L)
  }

  test("rewrite_position_deletes folds stacked delete files; reads identical") {
    wh
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    cat.createTable("db", "rpd", nation.schema)
    cat.append("db", "rpd", nation)
    import org.apache.spark.sql.functions.col
    cat.deleteMoR("db", "rpd", col("n_nationkey") % 5 === 0)  // shard 1
    cat.deleteMoR("db", "rpd", col("n_nationkey") === 1)      // shard 2
    cat.deleteMoR("db", "rpd", col("n_nationkey") === 7)      // shard 3
    val before = cat.readLatest("db", "rpd")
      .select("n_nationkey").as[Int].collect().sorted.toSeq
    val pre = cat.currentSnapshot("db", "rpd")
    assert(pre.deleteFiles.count(_.isPositional) == 3)
    val res = spark.sql(
      "CALL proccat.system.rewrite_position_deletes('db.rpd')").collect()
    assert(res.head.getInt(1) == 3, res.toSeq.toString)
    val post = cat.currentSnapshot("db", "rpd")
    // one consolidated positional delete file, same data files, exact count
    assert(post.deleteFiles.count(_.isPositional) == 1)
    assert(post.files == pre.files)
    assert(post.recordCount == pre.recordCount)
    assert(cat.readLatest("db", "rpd")
      .select("n_nationkey").as[Int].collect().sorted.toSeq == before)
    // nothing left to fold: no-op result row
    val again = spark.sql(
      "CALL proccat.system.rewrite_position_deletes('db.rpd')").collect()
    assert(again.head.isNullAt(0) && again.head.getInt(1) == 0)
  }

  test("create_changelog_view: row diffs queryable as a temp view from SQL") {
    wh
    val t = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    cat.createTable("db", "chv", t.schema)
    cat.append("db", "chv", t)                              // 2
    cat.delete("db", "chv",
      org.apache.spark.sql.functions.col("id") === 1L)      // 3 (CoW rewrite)
    cat.append("db", "chv", Seq((9L, "z")).toDF("id", "v")) // 4
    val res = spark.sql(
      "CALL proccat.system.create_changelog_view('db.chv', 'chv_changes', 2, 4)").collect()
    assert(res.head.getString(0) == "chv_changes")
    val rows = spark.sql(
      "SELECT _change_type, id FROM chv_changes ORDER BY _change_type, id")
      .as[(String, Long)].collect().toSeq
    assert(rows == Seq(("delete", 1L), ("insert", 9L)), rows.toString)
  }

  test("write-audit-publish never leaves SQL: property-staged INSERT, publish, discard") {
    wh
    val t = Seq((1L, "base")).toDF("id", "v")
    cat.createTable("db", "wapq", t.schema)
    cat.append("db", "wapq", t) // snap 2: published base state
    // arm staging from SQL (Iceberg's write.wap.enabled pattern)
    spark.sql("ALTER TABLE proccat.db.wapq SET TBLPROPERTIES('write.wap.enabled'='true')")
    spark.sql("INSERT INTO proccat.db.wapq VALUES (2, 'good')") // snap 3, STAGED
    // staged rows are invisible to every current-state read…
    assert(spark.sql("SELECT count(*) AS c FROM proccat.db.wapq").head.getLong(0) == 1L)
    // …but the audit job can time-travel to the staged id and validate
    val staged = cat.pendingStagedId("db", "wapq").get
    assert(spark.sql(
      s"SELECT count(*) AS c FROM proccat.db.wapq VERSION AS OF $staged")
      .head.getLong(0) == 2L)
    // audit passes -> publish via CALL; snapshot_id defaults to the pending
    val pub = spark.sql("CALL proccat.system.publish_staged('db.wapq')").collect()
    assert(pub.head.getString(1) == "publish_staged")
    assert(spark.sql("SELECT count(*) AS c FROM proccat.db.wapq").head.getLong(0) == 2L)
    // a second staged batch fails its audit -> discard restores the head
    spark.sql("INSERT INTO proccat.db.wapq VALUES (3, 'bad')")
    assert(spark.sql("SELECT count(*) AS c FROM proccat.db.wapq").head.getLong(0) == 2L)
    val disc = spark.sql("CALL proccat.system.discard_staged('db.wapq')").collect()
    assert(disc.head.getString(1) == "discard_staged")
    assert(spark.sql("SELECT id FROM proccat.db.wapq ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L))
    // with nothing pending, the defaulted call fails loudly
    val none = intercept[Exception] {
      spark.sql("CALL proccat.system.publish_staged('db.wapq')").collect()
    }
    assert(none.getMessage.contains("no pending staged"), none.getMessage)
    // disarm: plain INSERT publishes directly again
    spark.sql("ALTER TABLE proccat.db.wapq UNSET TBLPROPERTIES('write.wap.enabled')")
    spark.sql("INSERT INTO proccat.db.wapq VALUES (4, 'direct')")
    assert(spark.sql("SELECT count(*) AS c FROM proccat.db.wapq").head.getLong(0) == 3L)
  }

  test("rewrite_manifests consolidates shards; history and consumers unaffected") {
    wh
    import spark.implicits._
    val t = Seq((1L, "a")).toDF("id", "v")
    cat.createTable("db", "rm", t.schema)
    (0 until 4).foreach(i =>
      cat.append("db", "rm", Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val pre = cat.currentSnapshot("db", "rm").snapshotId
    def currentShards(): Seq[String] = {
      val log = graft.catalog.Json.parse(java.nio.file.Files.readString(
        java.nio.file.Paths.get(wh, "db", "rm", "_snapshots", "log.json")))
        .asInstanceOf[graft.catalog.JObj]
      log.arr("entries").last.asInstanceOf[graft.catalog.JObj]
        .arr("manifests").collect { case graft.catalog.JStr(s) => s }
    }
    assert(currentShards().size == 4, "one delta shard per append")

    val r = spark.sql("CALL proccat.system.rewrite_manifests('db.rm')").collect()
    assert(r.head.getInt(1) == 4)
    assert(currentShards().size == 1, "current snapshot rides ONE shard")
    // row-identical: same data, history intact, nothing for consumers
    assert(cat.readLatest("db", "rm").as[(Long, String)].collect().sorted.toSeq
      == (0 until 4).map(i => (i.toLong, s"v$i")))
    assert(cat.readAsOf("db", "rm", pre).count() == 4)
    assert(cat.readIncremental("db", "rm", pre,
      cat.currentSnapshot("db", "rm").snapshotId).count() == 0)
    // idempotent: already one shard -> no commit
    val r2 = spark.sql("CALL proccat.system.rewrite_manifests('db.rm')").collect()
    assert(r2.head.isNullAt(0) && r2.head.getInt(1) == 0)
    // appends after the rewrite go back to one delta shard on top
    cat.append("db", "rm", Seq((9L, "v9")).toDF("id", "v"))
    assert(currentShards().size == 2)
    assert(cat.readLatest("db", "rm").count() == 5)
  }

  test("INSERT OVERWRITE stages under write.wap.enabled too") {
    // an overwrite replaces MORE state than an append, so bypassing the
    // audit gate there (what the plugin did before) would let exactly the
    // most destructive SQL write skip write-audit-publish
    wh
    import spark.implicits._
    val t = Seq((1L, "base"), (2L, "base")).toDF("id", "v")
    cat.createTable("db", "wapo", t.schema)
    cat.append("db", "wapo", t)
    spark.sql("ALTER TABLE proccat.db.wapo SET TBLPROPERTIES('write.wap.enabled'='true')")
    spark.sql("INSERT OVERWRITE proccat.db.wapo VALUES (9, 'replacement')")
    // pre-overwrite state keeps serving until the audit publishes…
    assert(spark.sql("SELECT count(*) AS c FROM proccat.db.wapo").head.getLong(0) == 2L)
    val staged = cat.pendingStagedId("db", "wapo").get
    assert(spark.sql(
      s"SELECT v FROM proccat.db.wapo VERSION AS OF $staged")
      .as[String].collect().toSeq == Seq("replacement"))
    spark.sql("CALL proccat.system.publish_staged('db.wapo')").collect()
    assert(spark.sql("SELECT id FROM proccat.db.wapo")
      .as[Long].collect().toSeq == Seq(9L))
    // a failed-audit overwrite discards back to the published head
    spark.sql("INSERT OVERWRITE proccat.db.wapo VALUES (777, 'bad')")
    spark.sql("CALL proccat.system.discard_staged('db.wapo')").collect()
    assert(spark.sql("SELECT id FROM proccat.db.wapo")
      .as[Long].collect().toSeq == Seq(9L))
  }

  test("error shapes: unknown procedure, wrong namespace, malformed table") {
    wh
    // Spark wraps loadProcedure failures as FAILED_TO_LOAD_ROUTINE with the
    // full identifier; our explanatory message rides the cause chain
    val unknown = intercept[Exception] {
      spark.sql("CALL proccat.system.no_such_proc('db.nation')").collect()
    }
    assert(unknown.getMessage.contains("no_such_proc"), unknown.getMessage)
    val badNs = intercept[Exception] {
      spark.sql("CALL proccat.other.compact('db.nation')").collect()
    }
    assert(badNs.getMessage.contains("other"), badNs.getMessage)
    val badTable = intercept[Exception] {
      spark.sql("CALL proccat.system.compact('nodots')").collect()
    }
    assert(badTable.getMessage.contains("db.table"), badTable.getMessage)
  }

  test("expectations gate the WAP publish; audit_table reports counts") {
    import org.apache.spark.sql.functions._
    val c = cat
    val a = Seq((1L, 50L), (2L, 60L)).toDF("id", "score")
    c.createTable("db", "wapexp", a.schema, properties = Map(
      "write.wap.enabled" -> "true",
      "expect.score_positive" -> "score > 0",
      "expect.id_not_null" -> "id IS NOT NULL"))
    c.append("db", "wapexp", a) // direct pre-WAP seed? staged — publish it
    // (wap.enabled stages library appends too? library append commits
    // directly; only the SQL INSERT path stages. Seed is published.)
    assert(c.readLatest("db", "wapexp").count() == 2)

    // clean staged batch publishes
    val st1 = c.stageAppend("db", "wapexp", Seq((3L, 70L)).toDF("id", "score"))
    spark.sql(s"CALL proccat.system.publish_staged('db.wapexp', ${st1.snapshotId})")
    assert(c.readLatest("db", "wapexp").count() == 3)

    // a violating batch is REFUSED at publish with per-expectation counts
    val st2 = c.stageAppend("db", "wapexp",
      Seq((4L, -5L), (5L, -6L)).toDF("id", "score"))
    val e = intercept[Exception] {
      spark.sql(s"CALL proccat.system.publish_staged('db.wapexp', ${st2.snapshotId})")
    }
    assert(e.getMessage.contains("score_positive") &&
      e.getMessage.contains("2 rows"), e.getMessage)
    // still staged, table unchanged; audit of the staged snapshot shows both
    assert(c.readLatest("db", "wapexp").count() == 3)
    val audit = spark.sql(
        s"CALL proccat.system.audit_table('db.wapexp', ${st2.snapshotId})")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit == Map("id_not_null" -> 0L, "score_positive" -> 2L), audit.toString)
    // current snapshot audits clean
    val cur = spark.sql("CALL proccat.system.audit_table('db.wapexp')")
      .collect().map(r => r.getLong(1)).sum
    assert(cur == 0L)
    // discard clears the lane; a fixed batch publishes
    c.discardStaged("db", "wapexp", st2.snapshotId)
    val st3 = c.stageAppend("db", "wapexp", Seq((4L, 5L)).toDF("id", "score"))
    spark.sql(s"CALL proccat.system.publish_staged('db.wapexp', ${st3.snapshotId})")
    assert(c.readLatest("db", "wapexp").count() == 4)
  }

  test("maintain: one call runs the full steady-state battery; reads identical") {
    import org.apache.spark.sql.functions._
    val c = cat
    val a = (0 until 200).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    c.createTable("db", "mnt", a.schema)
    c.append("db", "mnt", a.repartition(4))
    c.append("db", "mnt", (200 until 220).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    c.deleteMoR("db", "mnt", col("id") % 7 === 0)
    c.deleteMoR("db", "mnt", col("id") === 3L)
    // an eq-heavy CDC table is exactly the one running nightly maintain:
    // the sweep must retire the eq debt too (r13)
    c.deleteMoREq("db", "mnt", Seq(11L, 12L).toDF("id"))
    val before = c.readLatest("db", "mnt").select("id").as[Long].collect().sorted.toSeq
    val res = spark.sql("CALL proccat.system.maintain('db.mnt', keep_last => 1)")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(res.keySet == Set("convert_equality_deletes", "rewrite_position_deletes",
      "rewrite_small_files", "rewrite_manifests", "expire_snapshots",
      "remove_orphan_files"), res.toString)
    assert(res("convert_equality_deletes").contains("converted"), res.toString)
    assert(res("rewrite_position_deletes").contains("folded"), res.toString)
    val after = c.readLatest("db", "mnt").select("id").as[Long].collect().sorted.toSeq
    assert(after == before, "maintenance must be row-invisible")
    assert(c.snapshotList("db", "mnt").size == 1, "expire kept only the head")
    val finalDeletes = c.currentSnapshot("db", "mnt").deleteFiles
    assert(finalDeletes.forall(_.isPositional), "eq debt must be retired")
    assert(c.recordCount("db", "mnt",
      c.currentSnapshot("db", "mnt").snapshotId) == before.length.toLong,
      "record_count exact again after the conversion")
  }

  test("expect.mode=commit refuses a violating frame BEFORE any write; streaming inherits") {
    import org.apache.spark.sql.functions._
    val c = cat
    val a = Seq((1L, 10L)).toDF("id", "score")
    c.createTable("db", "expc", a.schema, properties = Map(
      "expect.mode" -> "commit",
      "expect.score_positive" -> "score > 0"))
    c.append("db", "expc", a)
    val before = c.currentSnapshotId("db", "expc")
    val e = intercept[IllegalStateException] {
      c.append("db", "expc", Seq((2L, -1L)).toDF("id", "score"))
    }
    assert(e.getMessage.contains("score_positive") &&
      e.getMessage.contains("expect.mode=commit"), e.getMessage)
    // refused BEFORE any bytes landed: same snapshot, no new data dir
    assert(c.currentSnapshotId("db", "expc") == before)
    assert(c.readLatest("db", "expc").count() == 1)
    // the streaming sink commits through append(): a violating epoch
    // fails the same way, a clean one lands
    val bad = intercept[IllegalStateException] {
      graft.streaming.EventStream.appendEpoch(c, "db", "expc", "q")(
        Seq((3L, -9L)).toDF("id", "score"), 0L)
    }
    assert(bad.getMessage.contains("score_positive"))
    graft.streaming.EventStream.appendEpoch(c, "db", "expc", "q")(
      Seq((3L, 9L)).toDF("id", "score"), 1L)
    assert(c.readLatest("db", "expc").count() == 2)
    // compact never re-validates pre-existing rows (maintenance must not
    // brick): drop the property guard first to plant a legacy violation
    c.setProperty("db", "expc", "expect.mode", None)
    c.append("db", "expc", Seq((4L, -2L)).toDF("id", "score"))
    c.setProperty("db", "expc", "expect.mode", Some("commit"))
    c.compact("db", "expc", numFiles = 1)
    assert(c.readLatest("db", "expc").count() == 3)
  }

  test("write.target-records-per-file caps file size on every commit") {
    import org.apache.spark.sql.functions._
    val c = cat
    val a = (0 until 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    c.createTable("db", "sized", a.schema,
      properties = Map("write.target-records-per-file" -> "100"))
    c.append("db", "sized", a.repartition(1)) // one task, cap must split it
    val files = c.currentSnapshot("db", "sized").files
    assert(files.size >= 5, s"500 rows at cap 100 from one task: ${files.size} files")
    // compact to 2 files: the cap splits each 250-row output again
    c.compact("db", "sized", numFiles = 2)
    assert(c.currentSnapshot("db", "sized").files.size >= 5)
    assert(c.readLatest("db", "sized").count() == 500)
  }

  test("scoped maintain: rewrites touch only admitted files, out-of-scope carries verbatim (r13)") {
    import org.apache.spark.sql.functions._
    val c = cat
    val a = (0 until 100).map(i => (i.toLong, if (i < 50) "p0" else "p1", s"v$i"))
      .toDF("id", "part", "v")
    c.createTable("db", "smnt", a.schema, partitionCols = Seq("part"))
    c.append("db", "smnt", a.repartition(4)) // several small files per partition
    c.deleteMoR("db", "smnt", col("id") === 3L)  // p0 positions
    c.deleteMoR("db", "smnt", col("id") === 7L)  // p0 positions
    c.deleteMoREq("db", "smnt", Seq(60L).toDF("id")) // p1 eq shard
    c.deleteMoR("db", "smnt", col("id") === 61L) // p1 positions
    val pre = c.currentSnapshot("db", "smnt")
    val p1Files = pre.files.filter(_.contains("part=p1")).toSet
    val before = c.readLatest("db", "smnt").select("id").as[Long].collect().sorted.toSeq

    // scope to p0: p0's positional shards fold and its small files pack;
    // p1's DATA files and its eq shard carry byte-identical
    val res = spark.sql("CALL proccat.system.maintain('db.smnt', " +
      "small_bytes => 33554432, keep_last => 100, predicate => 'part = \\'p0\\'')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(res("rewrite_position_deletes").contains("folded"), res.toString)
    assert(res("rewrite_small_files").contains("packed"), res.toString)
    val post = c.currentSnapshot("db", "smnt")
    assert(p1Files.subsetOf(post.files.toSet),
      "out-of-scope partition's data files must carry verbatim")
    assert(post.deleteFiles.exists(!_.isPositional),
      "out-of-scope eq shard must survive a p0-scoped maintain")
    val after = c.readLatest("db", "smnt").select("id").as[Long].collect().sorted.toSeq
    assert(after == before, "scoped maintenance must be row-invisible")
  }

  test("vector index lifecycle from SQL: create, refresh modes, rebuild") {
    import org.apache.spark.sql.functions._
    val c = cat
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c.createTable("db", "vemb", emb.schema)
    c.append("db", "vemb", emb.where(col("vec_id") % 2 === 0))
    val created = spark.sql("CALL proccat.system.create_vector_index(" +
      "table => 'db.vemb', index => 'vix', id_col => 'vec_id', " +
      "vec_col => 'embedding', nlist => 8, sample_mod => 3)").collect()
    assert(created.head.getString(0) == "db.vix" && created.head.getInt(1) == 8)
    assert(c.tableExists("db", "vix") && c.tableExists("db", "vix_cent"))
    // fresh, then incremental across churn, commits counted
    assert(spark.sql("CALL proccat.system.refresh_vector_index('db.vix')")
      .head.getString(0) == "fresh")
    c.deleteMoR("db", "vemb", col("vec_id") % 10 === 0)
    c.append("db", "vemb", emb.where(col("vec_id") % 2 === 1))
    val r = spark.sql("CALL proccat.system.refresh_vector_index('db.vix')").head
    assert(r.getString(0) == "incremental" && r.getLong(1) == 2L)
    assert(c.readLatest("db", "vix").count() ==
      c.readLatest("db", "vemb").count())
    // deliberate rebuild retrains and re-pins
    assert(spark.sql("CALL proccat.system.rebuild_vector_index('db.vix')")
      .head.getBoolean(0))
    assert(spark.sql("CALL proccat.system.refresh_vector_index('db.vix')")
      .head.getString(0) == "fresh")
    // PQ variant from SQL (r13): codes + codebooks persist, refresh rides
    // the same lifecycle
    spark.sql("CALL proccat.system.create_vector_index(" +
      "table => 'db.vemb', index => 'vpq', id_col => 'vec_id', " +
      "vec_col => 'embedding', nlist => 8, sample_mod => 3, pq_m => 16)")
    assert(c.tableExists("db", "vpq_books"))
    assert(c.readLatest("db", "vpq").schema.fieldNames.contains("code"))
    c.append("db", "vemb", emb.where(col("vec_id") % 10 === 0))
    assert(spark.sql("CALL proccat.system.refresh_vector_index('db.vpq')")
      .head.getString(0) == "incremental")
    assert(c.readLatest("db", "vpq").count() == c.readLatest("db", "vemb").count())
  }

  test("text index lifecycle from SQL + the refresh_indexes namespace sweep (r13)") {
    import org.apache.spark.sql.functions._
    val c = cat
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    c.createTable("db", "tdocs", docs.schema)
    c.append("db", "tdocs", docs.where(col("doc_id") % 2 === 0))
    val created = spark.sql("CALL proccat.system.create_text_index(" +
      "table => 'db.tdocs', index => 'tix', id_col => 'doc_id', " +
      "text_col => 'text', nbuckets => 16)").collect()
    assert(created.head.getString(0) == "db.tix" && created.head.getInt(1) == 16)
    assert(spark.sql("CALL proccat.system.refresh_text_index('db.tix')")
      .head.getString(0) == "fresh")
    // churn BOTH index bases, then one sweep advances everything
    c.deleteMoR("db", "tdocs", col("doc_id") % 10 === 0)
    c.append("db", "tdocs", docs.where(col("doc_id") % 2 === 1))
    c.append("db", "vemb", spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(0))
    val sweep = spark.sql("CALL proccat.system.refresh_indexes('db')")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(sweep.exists(_ == (("db.tix", "text", "incremental"))), sweep.toSeq)
    assert(sweep.count(_._2 == "vector") >= 2, sweep.toSeq) // vix + vpq swept
    assert(sweep.forall(r => r._3 == "fresh" || r._3 == "incremental"), sweep.toSeq)
    // the sweep is idempotent: a second pass finds everything fresh
    assert(spark.sql("CALL proccat.system.refresh_indexes('db')")
      .collect().forall(_.getString(2) == "fresh"))
    // index content equals a recount of the churned base
    val n = c.readLatest("db", "tdocs")
      .where(length(trim(col("text"))) > 0).count()
    assert(c.readLatest("db", "tix").select("doc_id").distinct().count() == n)
  }

  test("dedup index lifecycle from SQL + the refresh_indexes sweep (r13)") {
    import org.apache.spark.sql.functions._
    val c = cat
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    c.createTable("db", "ddocs", docs.schema)
    c.append("db", "ddocs", docs.where(col("doc_id") % 2 === 0))
    val created = spark.sql("CALL proccat.system.create_dedup_index(" +
      "table => 'db.ddocs', index => 'dix', id_col => 'doc_id', " +
      "text_col => 'text', nbuckets => 16)").collect()
    assert(created.head.getString(0) == "db.dix" && created.head.getInt(1) == 16)
    assert(spark.sql("CALL proccat.system.refresh_dedup_index('db.dix')")
      .head.getString(0) == "fresh")
    c.deleteMoR("db", "ddocs", col("doc_id") % 10 === 0)
    c.append("db", "ddocs", docs.where(col("doc_id") % 2 === 1))
    assert(spark.sql("CALL proccat.system.refresh_dedup_index('db.dix')")
      .head.getString(0) == "incremental")
    // the namespace sweep reports it as a dedup index and is idempotent
    val sweep = spark.sql("CALL proccat.system.refresh_indexes('db')")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(sweep.exists(r => r._1 == "db.dix" && r._2 == "dedup" && r._3 == "fresh"),
      sweep.toSeq)
    // one banded row set per live doc: 32 bands each
    val live = c.readLatest("db", "ddocs").count()
    assert(c.readLatest("db", "dix").count() == live * 32)
  }

  test("clone_table: zero-copy clone via CALL, readable and independent") {
    wh
    val c = cat
    val res = spark.sql(
      "CALL proccat.system.clone_table('db.nation', 'db.nation_clone')").collect()
    assert(res.length == 1 && res.head.getLong(1) > 0)
    assert(spark.sql("SELECT sum(n_nationkey) AS s FROM proccat.db.nation_clone")
      .head.getLong(0) ==
      spark.sql("SELECT sum(n_nationkey) AS s FROM proccat.db.nation").head.getLong(0))
    // divergence: inserts into the clone never reach the source
    val matched = spark.sql(
      "SELECT count(*) AS c FROM proccat.db.nation WHERE n_nationkey < 2")
      .head.getLong(0)
    spark.sql("INSERT INTO proccat.db.nation_clone " +
      "SELECT n_nationkey + 100, n_name, n_regionkey " +
      "FROM proccat.db.nation WHERE n_nationkey < 2")
    assert(spark.sql("SELECT count(*) AS c FROM proccat.db.nation_clone").head.getLong(0)
      == spark.sql("SELECT count(*) AS c FROM proccat.db.nation").head.getLong(0) + matched)
    // existing target refuses
    val e = intercept[Exception](
      spark.sql("CALL proccat.system.clone_table('db.nation', 'db.nation_clone')").collect())
    assert(e.getMessage.contains("exists"), e.getMessage)

    // as-of clone via CALL: a historical snapshot becomes a live table
    val t = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    c.createTable("db", "clsrc", t.schema)          // snap 1
    c.append("db", "clsrc", t)                      // snap 2
    c.append("db", "clsrc", Seq((3L, "c")).toDF("id", "v")) // snap 3
    val asOf = spark.sql("CALL proccat.system.clone_table('db.clsrc', " +
      "'db.clsrc_v2', as_of_snapshot_id => 2)").collect()
    assert(asOf.head.getLong(0) == 2L)
    assert(spark.sql("SELECT id FROM proccat.db.clsrc_v2 ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L))
  }
}
