package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotCatalog

/** SQL surface through the V2 TableCatalog plugin: the exact statements the
  * reference issues (`SHOW TABLES IN cat.db`, snapshot-id time travel,
  * `CREATE NAMESPACE`, `CREATE TABLE`) against our catalog. */
class SnapCatalogPluginSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_sqlcat_").toString
    var tick = 0L
    val cat = new SnapshotCatalog(spark, dir,
      clock = () => { tick += 1; Instant.parse("2026-04-01T00:00:00Z").plusSeconds(tick * 3600) })
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    cat.createTable("db1", "nation", nation.schema)      // snap 1 @+1h
    cat.append("db1", "nation", nation)                  // snap 2 @+2h
    cat.overwrite("db1", "nation", nation.limit(5))      // snap 3 @+3h
    spark.conf.set("spark.sql.catalog.snapcat", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.snapcat.warehouse", dir)
    dir
  }

  test("SHOW TABLES and SELECT current state") {
    wh
    val tables = spark.sql("SHOW TABLES IN snapcat.db1").select("tableName")
      .as[String].collect().toSeq
    assert(tables == Seq("nation"))
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.db1.nation").head.getLong(0) == 5)
  }

  test("VERSION AS OF reads historic snapshots") {
    wh
    // sum() not count(): MetadataCountRule would serve bare counts from the
    // log — these assertions must exercise the historic file-list SCAN
    assert(spark.sql("SELECT sum(n_nationkey) AS s, count(*) AS c FROM snapcat.db1.nation VERSION AS OF 2")
      .head.getLong(1) == 25)
    assert(spark.sql("SELECT sum(n_nationkey) AS s, count(*) AS c FROM snapcat.db1.nation VERSION AS OF 3")
      .head.getLong(1) == 5)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM snapcat.db1.nation VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("99"))
  }

  test("TIMESTAMP AS OF resolves <= semantics") {
    wh
    // sum forces the scan (see VERSION AS OF test note)
    assert(spark.sql(
      "SELECT sum(n_nationkey) AS s, count(*) AS c FROM snapcat.db1.nation TIMESTAMP AS OF '2026-04-01 02:30:00'")
      .head.getLong(1) == 25, "between append and overwrite -> full snapshot")
    assert(spark.sql(
      "SELECT sum(n_nationkey) AS s, count(*) AS c FROM snapcat.db1.nation TIMESTAMP AS OF '2026-04-01 12:00:00'")
      .head.getLong(1) == 5)
  }

  test("predicate pushdown reaches the parquet scan through the plugin") {
    wh
    val df = spark.sql("SELECT n_name FROM snapcat.db1.nation VERSION AS OF 2 WHERE n_nationkey = 7")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_nationkey"), plan.take(1500))
    assert(df.count() == 1)
  }

  test("CREATE NAMESPACE / CREATE TABLE / INSERT-free append via library interop") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.db2")
    spark.sql("CREATE TABLE snapcat.db2.t2 (id BIGINT, flag STRING) PARTITIONED BY (flag)")
    val cat = new SnapshotCatalog(spark, wh)
    assert(cat.tableExists("db2", "t2"))
    assert(cat.meta("db2", "t2").partitionCols == Seq("flag"))
    // library write, SQL read — the interop the reference's dual-catalog
    // sessions rely on (5_migrate_tables_data.py:27-37)
    cat.append("db2", "t2", Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "flag"))
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.db2.t2 WHERE flag = 'a'").head.getLong(0) == 2)
  }

  test("INSERT INTO appends a snapshot; INSERT OVERWRITE replaces state") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbw")
    spark.sql("CREATE TABLE IF NOT EXISTS snapcat.dbw.w (id BIGINT, name STRING)")
    spark.sql("INSERT INTO snapcat.dbw.w VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO snapcat.dbw.w VALUES (3, 'c')")
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbw.w").head.getLong(0) == 3)
    spark.sql("INSERT OVERWRITE snapcat.dbw.w VALUES (9, 'z')")
    assert(spark.sql("SELECT id FROM snapcat.dbw.w").as[Long].collect().toSeq == Seq(9L))
    // every SQL write committed one snapshot; history stays time-travelable
    val cat = new SnapshotCatalog(spark, wh)
    assert(cat.snapshotList("dbw", "w").map(_.operation) ==
      Seq("create", "append", "append", "overwrite"))
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbw.w VERSION AS OF 3").head.getLong(0) == 3)
  }

  test("CTAS creates and populates in one statement") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbw")
    spark.sql(
      """CREATE TABLE snapcat.dbw.nation_copy AS
        |SELECT * FROM snapcat.db1.nation VERSION AS OF 2""".stripMargin)
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbw.nation_copy").head.getLong(0) == 25)
  }

  test(".snapshots metadata table serves the reference's stage-1 query shape") {
    wh
    // the exact access pattern of 1_collect_src_snapshots.py:61-70
    val rows = spark.sql(
      """SELECT snapshot_id, operation, CAST(summary['record_count'] AS BIGINT) AS records
        |FROM snapcat.db1.nation.snapshots ORDER BY committed_at""".stripMargin)
      .as[(Long, String, Long)].collect().toSeq
    assert(rows == Seq((1L, "create", 0L), (2L, "append", 25L), (3L, "overwrite", 5L)))
  }

  test("partitioned table is readable AND writable across multi-dir snapshots") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbp")
    spark.sql("CREATE TABLE snapcat.dbp.p (id BIGINT, flag STRING) PARTITIONED BY (flag)")
    spark.sql("INSERT INTO snapcat.dbp.p VALUES (1, 'a')")
    spark.sql("INSERT INTO snapcat.dbp.p VALUES (2, 'b')")   // 2 snapshot dirs now
    spark.sql("INSERT INTO snapcat.dbp.p VALUES (3, 'a')")   // 3 dirs
    // multi-snapshot-dir partitioned reads assemble one pushed+pruned V2
    // sub-scan per dir (UnionDirScan) — no compaction required, and the
    // plan keeps scan-level pushdown (the round-3 V1 bridge lost it).
    // sum(id) forces the scan: a bare partition-filtered count(*) now
    // serves from per-file metadata (r13, MetadataCountRule)
    val filtered = spark.sql(
      "SELECT count(*) AS c, sum(id) AS s FROM snapcat.dbp.p WHERE flag = 'a'")
    assert(filtered.head.getLong(0) == 2)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("RowDataSourceScan"), plan.take(1500)) // no V1 bridge
    assert(plan.contains("BatchScan"), plan.take(1500))
    assert(spark.sql("SELECT sum(id) AS s FROM snapcat.dbp.p").head.getLong(0) == 6)
    // compaction still consolidates back to the single vectorized scan
    new SnapshotCatalog(spark, wh).compact("dbp", "p", numFiles = 1)
    val df = spark.sql("SELECT count(*) AS c FROM snapcat.dbp.p WHERE flag = 'a'")
    assert(df.head.getLong(0) == 2)
  }

  test("SQL UPDATE and MERGE work on a partitioned MULTI-dir table") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbpm")
    spark.sql("CREATE TABLE snapcat.dbpm.p (id BIGINT, flag STRING) PARTITIONED BY (flag)")
    spark.sql("INSERT INTO snapcat.dbpm.p VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO snapcat.dbpm.p VALUES (3, 'a'), (4, 'c')") // 2 snapshot dirs
    // the rewrite scan unions per-dir candidate sub-scans — previously
    // rejected with "run compact() first"
    spark.sql("UPDATE snapcat.dbpm.p SET flag = 'z' WHERE id IN (2, 3)")
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbpm.p WHERE flag = 'z'")
      .head.getLong(0) == 2)
    assert(spark.sql("SELECT sum(id) AS s FROM snapcat.dbpm.p").head.getLong(0) == 10)
    // MERGE over the (now again multi-dir) shape: one more append first
    spark.sql("INSERT INTO snapcat.dbpm.p VALUES (5, 'a')")
    spark.sql(
      """MERGE INTO snapcat.dbpm.p t USING (SELECT CAST(5 AS BIGINT) AS id, 'm' AS flag
        |UNION ALL SELECT CAST(6 AS BIGINT), 'm') s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbpm.p WHERE flag = 'm'")
      .head.getLong(0) == 2)
    assert(spark.sql("SELECT sum(id) AS s FROM snapcat.dbpm.p").head.getLong(0) == 21)
    // complex DELETE (non-translatable predicate) on the multi-dir shape
    spark.sql("DELETE FROM snapcat.dbpm.p WHERE id % 2 = 0")
    assert(spark.sql("SELECT sum(id) AS s FROM snapcat.dbpm.p").head.getLong(0) == 9)
  }

  test("df.write.saveAsTable: create-on-write, append, overwrite keep snapshot history") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbs")
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    df1.write.saveAsTable("snapcat.dbs.st")                      // CTAS shape
    assert(spark.table("snapcat.dbs.st").count() == 2)
    df1.write.mode("append").saveAsTable("snapcat.dbs.st")       // append
    assert(spark.table("snapcat.dbs.st").count() == 4)
    // the reference's literal write: mode("overwrite").saveAsTable
    // (5_migrate_tables_data.py:80-83) -> ONE overwrite commit
    Seq((9L, "z")).toDF("id", "name").write.mode("overwrite").saveAsTable("snapcat.dbs.st")
    assert(spark.table("snapcat.dbs.st").as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    val ops = new SnapshotCatalog(spark, wh).snapshotList("dbs", "st").map(_.operation)
    assert(ops == Seq("create", "append", "append", "overwrite"), ops.toString)
    // history survives the replace: pre-overwrite snapshot still readable
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbs.st VERSION AS OF 3").head.getLong(0) == 4)
  }

  test("DESCRIBE TABLE EXTENDED shows partitioning, provider and location") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbd")
    spark.sql("CREATE TABLE snapcat.dbd.d (id BIGINT, flag STRING) PARTITIONED BY (flag)")
    val rows = spark.sql("DESCRIBE TABLE EXTENDED snapcat.dbd.d")
      .select("col_name", "data_type").as[(String, String)].collect().toSeq
    // the partition column is listed under the "# Partition Information"
    // section header (the rows the reference parses at
    // 2_collect_database_schema_info.py:186-197)
    val partIdx = rows.indexWhere(_._1 == "# Partition Information")
    assert(partIdx >= 0, rows.toString)
    assert(rows.drop(partIdx).contains(("flag", "string")), rows.toString)
    val byName = rows.toMap
    assert(byName.get("Provider").contains("snapcat"))
    assert(byName("Location").contains("/dbd/d"))
  }

  test("ALTER TABLE ADD COLUMN evolves schema; time travel crosses the boundary") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbe")
    spark.sql("CREATE TABLE snapcat.dbe.e (id BIGINT)")
    spark.sql("INSERT INTO snapcat.dbe.e VALUES (1), (2)")
    spark.sql("ALTER TABLE snapcat.dbe.e ADD COLUMN score DOUBLE")
    spark.sql("INSERT INTO snapcat.dbe.e VALUES (3, 1.5)")
    // current read: old files null-fill the evolved column
    val cur = spark.sql("SELECT id, score FROM snapcat.dbe.e ORDER BY id")
      .as[(Long, Option[Double])].collect().toSeq
    assert(cur == Seq((1L, None), (2L, None), (3L, Some(1.5))))
    // pre-evolution snapshot serves the OLD schema
    val old = spark.sql("SELECT * FROM snapcat.dbe.e VERSION AS OF 2")
    assert(old.schema.fieldNames.toSeq == Seq("id"))
    assert(old.count() == 2)
    val ops = new SnapshotCatalog(spark, wh).snapshotList("dbe", "e").map(_.operation)
    assert(ops == Seq("create", "append", "evolve", "append"))
    // properties round-trip
    spark.sql("ALTER TABLE snapcat.dbe.e SET TBLPROPERTIES ('k' = 'v')")
    assert(spark.sql("DESCRIBE TABLE EXTENDED snapcat.dbe.e")
      .where($"col_name" === "Table Properties").head.getString(1).contains("k=v"))
  }

  test("ALTER TABLE DROP COLUMN narrows the schema; time travel keeps the old one") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbdc")
    spark.sql("CREATE TABLE snapcat.dbdc.t (id BIGINT, note STRING)")
    spark.sql("INSERT INTO snapcat.dbdc.t VALUES (1, 'keep?'), (2, 'nope')")
    spark.sql("ALTER TABLE snapcat.dbdc.t DROP COLUMN note")
    val cur = spark.table("snapcat.dbdc.t")
    assert(cur.schema.fieldNames.toSeq == Seq("id"))
    assert(cur.count() == 2)
    // files untouched: the pre-drop snapshot still serves the column
    val old = spark.sql("SELECT * FROM snapcat.dbdc.t VERSION AS OF 2")
    assert(old.schema.fieldNames.toSeq == Seq("id", "note"))
    assert(old.where($"note" === "nope").count() == 1)
    // appends after the drop use the narrow schema
    spark.sql("INSERT INTO snapcat.dbdc.t VALUES (3)")
    assert(spark.table("snapcat.dbdc.t").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // partition columns cannot be dropped
    spark.sql("CREATE TABLE snapcat.dbdc.p (id BIGINT, flag STRING) PARTITIONED BY (flag)")
    val e = intercept[Exception] { spark.sql("ALTER TABLE snapcat.dbdc.p DROP COLUMN flag") }
    assert(e.getMessage.contains("partition"), e.getMessage)
  }

  test("SQL UPDATE works on a partitioned single-dir table; appends still mix") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbpu")
    spark.sql("CREATE TABLE snapcat.dbpu.p (id BIGINT, flag STRING) PARTITIONED BY (flag)")
    spark.sql("INSERT INTO snapcat.dbpu.p VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    // rewrite lands flat files with the partition column as data — reads
    // resolve it from file content instead of dir names
    spark.sql("UPDATE snapcat.dbpu.p SET flag = 'z' WHERE id = 2")
    assert(spark.sql("SELECT flag FROM snapcat.dbpu.p WHERE id = 2").head.getString(0) == "z")
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbpu.p WHERE flag = 'a'").head.getLong(0) == 2)
    // a later partitionBy append mixes hive-laid and flat snapshot dirs
    spark.sql("INSERT INTO snapcat.dbpu.p VALUES (4, 'a')")
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbpu.p WHERE flag = 'a'").head.getLong(0) == 3)
    assert(spark.sql("SELECT sum(id) AS s FROM snapcat.dbpu.p").head.getLong(0) == 10)
  }

  test("DROP NAMESPACE removes the namespace, not just its tables") {
    wh
    spark.sql("CREATE NAMESPACE snapcat.db9")
    assert(spark.sql("SHOW NAMESPACES IN snapcat").as[String].collect().contains("db9"))
    spark.sql("DROP NAMESPACE snapcat.db9")
    assert(!spark.sql("SHOW NAMESPACES IN snapcat").as[String].collect().contains("db9"))
  }

  test("VERSION AS OF resolves tag names through SQL") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    cat.createTag("db1", "nation", "pre_overwrite", 2)
    assert(spark.sql(
      "SELECT sum(n_nationkey) AS s, count(*) AS c FROM snapcat.db1.nation VERSION AS OF 'pre_overwrite'")
      .head.getLong(1) == 25)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM snapcat.db1.nation VERSION AS OF 'nope'").collect()
    }
    assert(e.getMessage.contains("tag"), e.getMessage)
    cat.dropTag("db1", "nation", "pre_overwrite")
  }

  test("non-numeric VERSION AS OF gets a clear error") {
    wh
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM snapcat.db1.nation VERSION AS OF 'main'").collect()
    }
    assert(e.getMessage.contains("numeric snapshot id"), e.getMessage)
  }

  test("spark.read.option(snapshot-id).table — the reference's literal reader API") {
    wh
    // 5_migrate_tables_data.py:72-74 verbatim call shape
    val asOf2 = spark.read.option("snapshot-id", 2).table("snapcat.db1.nation")
    assert(asOf2.count() == 25)
    // 2_collect_database_schema_info.py:151-153 option alias
    val asOf3 = spark.read.option("as_of_snapshot_id", "3").table("snapcat.db1.nation")
    assert(asOf3.count() == 5)
    val e = intercept[Exception] {
      spark.read.option("snapshot-id", "zzz").table("snapcat.db1.nation").collect()
    }
    assert(e.getMessage.contains("numeric"), e.getMessage)
  }

  test("unfiltered count(*) is served from snapshot metadata, not a scan") {
    wh
    val df = spark.sql("SELECT count(*) AS c FROM snapcat.db1.nation")
    assert(df.head.getLong(0) == 5)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LocalRelation") && !optimized.contains("RelationV2"),
      s"expected metadata-served count, got:\n$optimized")
    // historic snapshot counts come from that snapshot's log entry
    val dfv = spark.sql("SELECT count(*) AS c FROM snapcat.db1.nation VERSION AS OF 2")
    assert(dfv.head.getLong(0) == 25)
    assert(dfv.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    // a filter disables the rewrite: plan keeps the scan, result stays exact
    val filtered = spark.sql("SELECT count(*) AS c FROM snapcat.db1.nation WHERE n_nationkey > 2")
    assert(filtered.queryExecution.optimizedPlan.toString.contains("RelationV2"))
    assert(filtered.head.getLong(0) == 2)
  }

  test("unfiltered min/max are served from snapshot column stats, not a scan") {
    wh
    val df = spark.sql(
      "SELECT count(*) AS c, min(n_nationkey) AS mn, max(n_nationkey) AS mx, max(n_name) AS mxn FROM snapcat.db1.nation")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LocalRelation") && !optimized.contains("RelationV2"),
      s"expected metadata-served min/max, got:\n$optimized")
    // current snapshot = overwrite with nation.limit(5) -> keys 0..4
    val r = df.head
    assert((r.getLong(0), r.getInt(1), r.getInt(2)) == ((5L, 0, 4)))
    // the values must equal what a real scan computes
    val scanned = spark.sql(
      "SELECT max(n_name) AS mxn FROM snapcat.db1.nation WHERE n_nationkey >= 0").head.getString(0)
    assert(r.getString(3) == scanned)
    // historic snapshot serves ITS stats (full 25-nation append)
    val hist = spark.sql(
      "SELECT min(n_nationkey) AS mn, max(n_nationkey) AS mx FROM snapcat.db1.nation VERSION AS OF 2")
    assert(hist.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    assert((hist.head.getInt(0), hist.head.getInt(1)) == ((0, 24)))
    // a filter disables the rewrite; result stays exact
    val filtered = spark.sql(
      "SELECT min(n_nationkey) AS mn FROM snapcat.db1.nation WHERE n_nationkey > 2")
    assert(filtered.queryExecution.optimizedPlan.toString.contains("RelationV2"))
    assert(filtered.head.getInt(0) == 3)
    // a non-bare-column aggregate disables the rewrite; result stays exact
    val expr = spark.sql("SELECT min(n_nationkey + 1) AS mn FROM snapcat.db1.nation")
    assert(expr.queryExecution.optimizedPlan.toString.contains("RelationV2"))
    assert(expr.head.getInt(0) == 1)
  }

  test("SQL scans skip whole files via per-file footer stats") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbfs")
    spark.sql("CREATE TABLE snapcat.dbfs.t (id BIGINT, name STRING)")
    val cat = new SnapshotCatalog(spark, wh)
    cat.append("dbfs", "t", (1L to 100L).map(i => (i, s"a$i")).toDF("id", "name").repartition(1))
    cat.append("dbfs", "t", (101L to 200L).map(i => (i, s"b$i")).toDF("id", "name").repartition(1))
    cat.append("dbfs", "t", (201L to 300L).map(i => (i, s"c$i")).toDF("id", "name").repartition(1))

    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b.inputPartitions.flatMap {
          case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
          case _ => Seq.empty[String]
        }.distinct.size
      }.getOrElse(sys.error("no BatchScanExec in plan"))

    // selective predicate plans ONE of the three files — the skip decision
    // happens at plan time, before any task exists
    val sel = spark.sql("SELECT name FROM snapcat.dbfs.t WHERE id = 150")
    assert(scannedFiles(sel) == 1, sel.queryExecution.executedPlan.toString.take(800))
    assert(sel.as[String].collect().toSeq == Seq("b150"))
    // row-group pushdown is still the stock parquet path underneath
    assert(sel.queryExecution.executedPlan.toString.contains("PushedFilters"))
    // unselective predicate keeps all files
    assert(scannedFiles(spark.sql("SELECT * FROM snapcat.dbfs.t WHERE id > 0")) == 3)
    // provably-empty result plans zero files and still answers correctly
    val none = spark.sql("SELECT * FROM snapcat.dbfs.t WHERE id = 999")
    assert(scannedFiles(none) == 0)
    assert(none.count() == 0)
    // time travel prunes against THAT snapshot's stats
    val tt = spark.sql("SELECT count(*) AS c FROM snapcat.dbfs.t VERSION AS OF 2 WHERE id = 50")
    assert(tt.head.getLong(0) == 1)
  }

  test("runtime filter() re-prunes a partitioned scan to the matching files") {
    wh
    import org.apache.spark.sql.GraftTestV2
    import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String

    val cat = new SnapshotCatalog(spark, wh)
    cat.createTable("dbrf", "f", Seq((1L, "a")).toDF("id", "flag").schema,
      partitionCols = Seq("flag"))
    // one append, three hive partition dirs in one snapshot dir
    cat.append("dbrf", "f",
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "a")).toDF("id", "flag").coalesce(1))

    def files(b: org.apache.spark.sql.connector.read.Batch): Set[String] =
      b.planInputPartitions().flatMap {
        case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
        case _ => Seq.empty[String]
      }.toSet

    val scan = spark.table("snapcat.dbrf.f").queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan }.get
    val rf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
    assert(rf.filterAttributes().map(_.fieldNames().head).toSeq == Seq("flag"))
    val before = files(scan.toBatch)
    assert(before.size == 3, before.toString)

    // the DPP shape: IN over the build side's key values, arriving after
    // planning — the SAME stable Batch must re-plan to the matching files
    rf.filter(Array(GraftTestV2.inPredicate("flag", StringType,
      UTF8String.fromString("a"))))
    val after = files(scan.toBatch)
    assert(after.size == 1, after.toString)
    assert(after.head.contains("flag=a"), after.toString)

    // a predicate shape the translator doesn't understand prunes NOTHING
    // (sound fallback) — rebuild from the original scan state first
    val scan2 = spark.table("snapcat.dbrf.f").queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan }.get
    scan2.asInstanceOf[SupportsRuntimeV2Filtering].filter(
      Array(GraftTestV2.opaquePredicate("ALWAYS_TRUE")))
    assert(files(scan2.toBatch).size == 3)
  }

  test("runtime filter() narrows a MULTI-dir partitioned scan per sub-scan") {
    wh
    import org.apache.spark.sql.GraftTestV2
    import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String

    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbrfm")
    spark.sql("CREATE TABLE snapcat.dbrfm.f (id BIGINT, flag STRING) PARTITIONED BY (flag)")
    spark.sql("INSERT INTO snapcat.dbrfm.f VALUES (1, 'a')")
    spark.sql("INSERT INTO snapcat.dbrfm.f VALUES (2, 'b')") // second snapshot dir

    val scan = spark.table("snapcat.dbrfm.f").queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan }.get
    val before = scan.toBatch.planInputPartitions().length
    assert(before == 2, s"expected one partition per dir, got $before")
    scan.asInstanceOf[SupportsRuntimeV2Filtering].filter(Array(
      GraftTestV2.inPredicate("flag", StringType, UTF8String.fromString("a"))))
    val after = scan.toBatch.planInputPartitions().length
    assert(after == 1, s"runtime filter should drop the flag=b dir's sub-scan, got $after")
  }

  test("runtime filter on the bucket key drops whole buckets, SPJ partitioning intact") {
    wh
    import org.apache.spark.sql.GraftTestV2
    import org.apache.spark.sql.connector.read.{SupportsReportPartitioning, SupportsRuntimeV2Filtering}
    import org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.types.LongType

    val cat = new SnapshotCatalog(spark, wh)
    cat.createBucketedTable("dbrb", "f",
      Seq((1L, "x")).toDF("k", "v").schema, "k", nBuckets = 4)
    cat.appendBucketed("dbrb", "f", (1L to 40L).map(i => (i, s"v$i")).toDF("k", "v"))

    val scan = spark.table("snapcat.dbrb.f").queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan }.get
    // the wrapper must still report the bucket partitioning (SPJ contract)
    assert(scan.asInstanceOf[SupportsReportPartitioning].outputPartitioning()
      .isInstanceOf[KeyGroupedPartitioning])
    val before = scan.toBatch.planInputPartitions().length
    assert(before > 1, s"expected several bucket partitions, got $before")
    // runtime IN pinning the bucket key to one value -> one bucket survives
    scan.asInstanceOf[SupportsRuntimeV2Filtering].filter(Array(
      GraftTestV2.inPredicate("k", LongType, Long.box(7L))))
    val after = scan.toBatch.planInputPartitions()
    assert(after.length < before,
      s"bucket pruning must drop buckets: $before -> ${after.length}")
    // surviving partitions still carry their bucket key (HasPartitionKey)
    assert(after.forall(_.isInstanceOf[
      org.apache.spark.sql.connector.read.HasPartitionKey]))
  }

  test("runtime filter on a declared SORT column prunes files via footer stats") {
    wh
    import org.apache.spark.sql.GraftTestV2
    import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.types.LongType

    val cat = new SnapshotCatalog(spark, wh)
    val df = spark.range(0, 4000).toDF("k")
      .withColumn("k", (col("k") * 2654435761L) % 4000)
      .withColumn("v", col("k") * 2).repartition(4)
    cat.createTable("dbrsort", "f", df.schema)
    cat.setProperty("dbrsort", "f", "write.sort-order", Some("k"))
    val saved = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val snap = try cat.append("dbrsort", "f", df)
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", saved)
    assert(snap.files.size > 1, "range-clustered append must produce several files")

    def freshScan() = spark.table("snapcat.dbrsort.f").queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan }.get
    val scan = freshScan()
    val rf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
    assert(rf.filterAttributes().map(_.fieldNames().head).toSeq == Seq("k"),
      "the declared sort column must be advertised for runtime filtering")
    val before = scan.toBatch.planInputPartitions().length
    // a selective join-key IN set lands entirely in one file's [min,max]
    rf.filter(Array(GraftTestV2.inPredicate("k", LongType, Long.box(7L))))
    val after = scan.toBatch.planInputPartitions().length
    assert(after < before,
      s"footer-stat runtime pruning must drop clustered files: $before -> $after")

    // a HUGE IN (arity > the exact threshold) collapses to its [min,max]
    // range before the skip tiers — still prunes files outside the range
    val scan2 = freshScan()
    val lo = 0L until 1500L // contiguous low range, arity 1500 > 1024
    scan2.asInstanceOf[SupportsRuntimeV2Filtering].filter(Array(
      GraftTestV2.inPredicate("k", LongType, lo.map(Long.box): _*)))
    val after2 = scan2.toBatch.planInputPartitions().length
    assert(after2 < before,
      s"range-collapsed runtime IN must still prune: $before -> $after2")
    // correctness is untouched: the join above re-evaluates; here just
    // assert the pruned scan still serves every in-range row
    assert(spark.table("snapcat.dbrsort.f").where(col("k") < 1500).count() == 1500)
  }

  test("broadcast join injects dynamic partition pruning into the snapcat scan") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    cat.createTable("dbdpp", "fact",
      Seq((1L, "a", 1.0)).toDF("id", "flag", "v").schema, partitionCols = Seq("flag"))
    cat.append("dbdpp", "fact", (1L to 60L).map(i =>
      (i, Seq("a", "b", "c")(i.toInt % 3), i * 1.0)).toDF("id", "flag", "v"))
    cat.createTable("dbdpp", "dim", Seq(("a", "keep")).toDF("flag", "label").schema)
    cat.append("dbdpp", "dim",
      Seq(("a", "keep"), ("b", "drop"), ("c", "drop")).toDF("flag", "label"))

    val saved = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val joined = spark.sql(
        """SELECT /*+ BROADCAST(d) */ sum(f.id) AS s
          |FROM snapcat.dbdpp.fact f JOIN snapcat.dbdpp.dim d ON f.flag = d.flag
          |WHERE d.label = 'keep'""".stripMargin)
      val expect = (1L to 60L).filter(_ % 3 == 0).sum // flag 'a' <=> i%3==0
      assert(joined.head.getLong(0) == expect)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"expected a dynamic pruning runtime filter on the fact scan:\n${plan.take(2000)}")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", v)
        case None => spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
      }
    }
  }

  test(".manifests metadata table shows shard reuse from the pointer log") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    cat.createTable("dbmf", "t", Seq((1L, "a")).toDF("id", "v").schema)
    cat.append("dbmf", "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    cat.append("dbmf", "t", Seq((3L, "c")).toDF("id", "v").coalesce(1))
    val rows = spark.sql(
      """SELECT path, file_count, record_count, added_snapshot_id, referenced_by
        |FROM snapcat.dbmf.t.manifests ORDER BY path""".stripMargin)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(("m2.json", 1L, 2L, 2L, 2L), ("m3.json", 1L, 1L, 3L, 1L)), rows.toString)
  }

  test(".all_files metadata table: every retained snapshot's files, deduped with ref spans") {
    wh
    import org.apache.spark.sql.functions.col
    val cat = new SnapshotCatalog(spark, wh)
    cat.createTable("dbaf", "t", Seq((1L, "a")).toDF("id", "v").schema)
    cat.append("dbaf", "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)) // s2
    cat.append("dbaf", "t", Seq((3L, "c")).toDF("id", "v").coalesce(1))            // s3
    cat.deleteMoR("dbaf", "t", col("id") === 1L)                                   // s4
    cat.overwrite("dbaf", "t", Seq((9L, "z")).toDF("id", "v").coalesce(1))         // s5
    val rows = spark.sql(
      """SELECT content, first_snapshot_id, last_snapshot_id, ref_count
        |FROM snapcat.dbaf.t.all_files ORDER BY file_path""".stripMargin)
      .as[(String, Long, Long, Long)].collect().toSeq
    // first append's file: referenced by s2, s3, s4; second by s3, s4;
    // the overwrite file by s5 only; the delete shard by s4 (its
    // _deletes/ path sorts after data/)
    assert(rows == Seq(
      ("data", 2L, 4L, 3L), ("data", 3L, 4L, 2L),
      ("data", 5L, 5L, 1L), ("position-deletes", 4L, 4L, 1L)), rows.toString)
    // the CURRENT .files view sees only the overwrite's file
    assert(spark.sql("SELECT count(*) FROM snapcat.dbaf.t.files").head.getLong(0) == 1L)
  }

  test("scan statistics are snapshot-exact and carry column min/max/nulls") {
    wh
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val cat = new SnapshotCatalog(spark, wh)
    val data = Seq((Some(5L), "x"), (Some(17L), "y"), (None, "z")).toDF("id", "name")
    cat.createTable("dbst", "t", data.schema)
    cat.append("dbst", "t", data)

    val scan = spark.table("snapcat.dbst.t").queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan }.get
    val st = scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
    assert(st.numRows().getAsLong == 3, "exact row count from the log")
    val byName = st.columnStats().entrySet().iterator()
    var idStats: Option[org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = None
    while (byName.hasNext) {
      val e = byName.next()
      if (e.getKey.describe() == "id") idStats = Some(e.getValue)
    }
    assert(idStats.isDefined, st.columnStats().toString)
    assert(idStats.get.min().get() == 5L && idStats.get.max().get() == 17L)
    assert(idStats.get.nullCount().getAsLong == 1L)

    // catalyst plan statistics see the exact row count (CBO input surface)
    val planStats = spark.table("snapcat.dbst.t").queryExecution.optimizedPlan.stats
    assert(planStats.rowCount.contains(BigInt(3)), planStats.toString)

    // a FILTERED scan must NOT report the table-wide exact count — the
    // snapshot rowCount would be an exact-looking overcount for the pruned
    // scan; the delegate's size-tracking estimate takes over
    val filtered = spark.sql("SELECT * FROM snapcat.dbst.t WHERE id = 5")
      .queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan }.get
    val fst = filtered.asInstanceOf[SupportsReportStatistics].estimateStatistics()
    assert(!fst.numRows().isPresent || fst.numRows().getAsLong != 3,
      "filtered scan must not claim the unfiltered row count")
  }

  test("row-level rewrite clears debris from a crashed prior attempt") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbcr")
    spark.sql("CREATE TABLE snapcat.dbcr.t (id BIGINT, name STRING)")
    spark.sql("INSERT INTO snapcat.dbcr.t VALUES (1, 'a'), (2, 'b')")
    // simulate a crashed earlier rewrite: stale parquet already sits in the
    // NEXT snapshot dir (s3) that the coming UPDATE will claim
    val cat = new SnapshotCatalog(spark, wh)
    val root = java.nio.file.Paths.get(wh, "dbcr", "t")
    val dead = root.resolve("data").resolve("s3")
    Files.createDirectories(dead)
    Files.copy(root.resolve(cat.currentSnapshot("dbcr", "t").files.head),
      dead.resolve("stale.parquet"))
    spark.sql("UPDATE snapcat.dbcr.t SET name = 'X' WHERE id = 1")
    // the stale file must NOT have been adopted into the commit
    assert(spark.table("snapcat.dbcr.t").count() == 2)
    assert(cat.currentSnapshot("dbcr", "t").recordCount == 2)
  }

  test("streaming read tails a PARTITIONED table (per-dir hive batches)") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbsp")
    spark.sql("CREATE TABLE snapcat.dbsp.p (id BIGINT, flag STRING) PARTITIONED BY (flag)")
    spark.sql("INSERT INTO snapcat.dbsp.p VALUES (1, 'a')") // pre-stream: not tailed
    val q = spark.readStream.table("snapcat.dbsp.p")
      .writeStream.format("memory").queryName("p_tail").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("p_tail").count() == 0, "tail starts at the current snapshot")
      // one trigger covering TWO appended snapshot dirs, partition values
      // resolved from each dir's own hive layout
      spark.sql("INSERT INTO snapcat.dbsp.p VALUES (2, 'b'), (3, 'a')")
      spark.sql("INSERT INTO snapcat.dbsp.p VALUES (4, 'c')")
      q.processAllAvailable()
      val got = spark.table("p_tail").as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(got == Seq((2L, "b"), (3L, "a"), (4L, "c")), got.toString)
    } finally q.stop()
  }

  test("SQL UPDATE rewrites through the row-level operation path") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbup")
    spark.sql("CREATE TABLE snapcat.dbup.t (id BIGINT, name STRING, score DOUBLE)")
    spark.sql("INSERT INTO snapcat.dbup.t VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")
    spark.sql("UPDATE snapcat.dbup.t SET name = 'X', score = score * 10 WHERE id >= 2")
    val rows = spark.sql("SELECT id, name, score FROM snapcat.dbup.t ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq
    assert(rows == Seq((1L, "a", 1.0), (2L, "X", 20.0), (3L, "X", 30.0)))
    val cat = new SnapshotCatalog(spark, wh)
    assert(cat.currentSnapshot("dbup", "t").operation == "update")
    // row count + numeric stats adopted from the rewrite's footers
    assert(cat.currentSnapshot("dbup", "t").recordCount == 3)
    assert(cat.currentSnapshot("dbup", "t").summary.get("max.score").contains("30.0"))
    // pre-update state stays time-travelable
    assert(spark.sql("SELECT name FROM snapcat.dbup.t VERSION AS OF 2 WHERE id = 2")
      .head.getString(0) == "b")
  }

  test("SQL UPDATE rewrites only the files whose stats admit the condition") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbfg")
    spark.sql("CREATE TABLE snapcat.dbfg.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO snapcat.dbfg.t VALUES (1, 'a'), (2, 'b')") // s2: ids 1-2
    spark.sql("INSERT INTO snapcat.dbfg.t VALUES (10, 'c'), (11, 'd')") // s3: ids 10-11
    spark.sql("INSERT INTO snapcat.dbfg.t VALUES (20, 'e'), (21, 'f')") // s4: ids 20-21
    val cat = new SnapshotCatalog(spark, wh)
    val before = cat.currentSnapshot("dbfg", "t")
    spark.sql("UPDATE snapcat.dbfg.t SET v = 'X' WHERE id = 10")
    val after = cat.currentSnapshot("dbfg", "t")
    // files whose footer stats exclude id=10 carry over VERBATIM (no
    // rewrite); only files whose [min.id, max.id] admits 10 are rewritten
    val candidates = before.files.filter { f =>
      val st = before.fileStats(f)
      st("min.id").toLong <= 10L && 10L <= st("max.id").toLong
    }
    val untouchedBefore = before.files.filterNot(candidates.contains)
    assert(candidates.nonEmpty && untouchedBefore.nonEmpty)
    assert(untouchedBefore.forall(after.files.contains))
    assert(candidates.forall(f => !after.files.contains(f)))
    assert(after.files.exists(_.startsWith("data/rw-")))
    // data correct, count exact, carried per-file stats intact
    assert(spark.sql("SELECT v FROM snapcat.dbfg.t WHERE id = 10").head.getString(0) == "X")
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbfg.t WHERE v <> 'X'")
      .head.getLong(0) == 5)
    assert(after.recordCount == 6)
    assert(untouchedBefore.forall(after.fileStats.contains))
    assert(after.summary.get("min.id").contains("1"))
    assert(after.summary.get("max.id").contains("21"))
  }

  test("complex SQL DELETE prunes files via its translatable conjunct") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbfd")
    spark.sql("CREATE TABLE snapcat.dbfd.t (id BIGINT)")
    spark.sql("INSERT INTO snapcat.dbfd.t VALUES (1), (2)") // s2
    spark.sql("INSERT INTO snapcat.dbfd.t VALUES (20), (21)") // s3
    val cat = new SnapshotCatalog(spark, wh)
    val before = cat.currentSnapshot("dbfd", "t")
    // id % 2 = 1 is untranslatable -> row-level rewrite; the pushable
    // id >= 20 conjunct still prunes the s2 files out of the rewrite
    spark.sql("DELETE FROM snapcat.dbfd.t WHERE id >= 20 AND id % 2 = 1")
    val after = cat.currentSnapshot("dbfd", "t")
    assert(spark.sql("SELECT id FROM snapcat.dbfd.t ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 20L))
    val s2Files = before.files.filter(_.startsWith("data/s2/"))
    assert(s2Files.nonEmpty && s2Files.forall(after.files.contains))
    assert(!after.files.exists(_.startsWith("data/s3/")))
  }

  test("adoptRewrite refuses a carry computed against a moved snapshot") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbcc")
    spark.sql("CREATE TABLE snapcat.dbcc.t (id BIGINT)")
    spark.sql("INSERT INTO snapcat.dbcc.t VALUES (1)")
    val cat = new SnapshotCatalog(spark, wh)
    val cur = cat.currentSnapshot("dbcc", "t").snapshotId
    val err = intercept[IllegalArgumentException] {
      cat.adoptRewrite("dbcc", "t", "update", "rw-bogus",
        expectSnapshotId = Some(cur - 1))
    }
    assert(err.getMessage.contains("concurrent commit"))
  }

  test("SQL MERGE INTO upserts through the row-level operation path") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbmg")
    spark.sql("CREATE TABLE snapcat.dbmg.t (id BIGINT, name STRING)")
    spark.sql("INSERT INTO snapcat.dbmg.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(
      """MERGE INTO snapcat.dbmg.t t
        |USING (SELECT * FROM VALUES (2, 'B2'), (3, 'c') AS s(id, name)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.name = s.name
        |WHEN NOT MATCHED THEN INSERT (id, name) VALUES (s.id, s.name)""".stripMargin)
    val rows = spark.sql("SELECT id, name FROM snapcat.dbmg.t ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "a"), (2L, "B2"), (3L, "c")))
    val cat = new SnapshotCatalog(spark, wh)
    assert(cat.currentSnapshot("dbmg", "t").operation == "merge")
    // WHEN MATCHED DELETE works too
    spark.sql(
      """MERGE INTO snapcat.dbmg.t t
        |USING (SELECT * FROM VALUES (1, 'x') AS s(id, name)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.sql("SELECT id FROM snapcat.dbmg.t ORDER BY id")
      .as[Long].collect().toSeq == Seq(2L, 3L))
  }

  test("SQL DELETE with a non-translatable predicate uses the rewrite path") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbdx")
    spark.sql("CREATE TABLE snapcat.dbdx.t (id BIGINT)")
    spark.sql("INSERT INTO snapcat.dbdx.t VALUES (1), (2), (3), (4), (5), (6)")
    // id % 2 = 0 has no V1 filter translation -> SupportsDelete.canDeleteWhere
    // is never offered it; the plan falls back to the row-level rewrite
    spark.sql("DELETE FROM snapcat.dbdx.t WHERE id % 2 = 0")
    assert(spark.sql("SELECT id FROM snapcat.dbdx.t ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 3L, 5L))
    val cat = new SnapshotCatalog(spark, wh)
    assert(cat.currentSnapshot("dbdx", "t").operation == "delete")
  }

  test("SQL DELETE FROM commits a copy-on-write delete snapshot") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbdel")
    spark.sql("CREATE TABLE snapcat.dbdel.t (id BIGINT, name STRING)")
    spark.sql("INSERT INTO snapcat.dbdel.t VALUES (1, 'a'), (2, 'b'), (3, 'a'), (4, NULL)")
    spark.sql("DELETE FROM snapcat.dbdel.t WHERE name = 'a'")
    // NULL-name row survives (predicate is NULL, not TRUE)
    assert(spark.sql("SELECT id FROM snapcat.dbdel.t ORDER BY id")
      .as[Long].collect().toSeq == Seq(2L, 4L))
    val cat = new SnapshotCatalog(spark, wh)
    assert(cat.currentSnapshot("dbdel", "t").operation == "delete")
    // pre-delete snapshot stays time-travelable through SQL
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbdel.t VERSION AS OF 2").head.getLong(0) == 4)
    // compound predicates translate too
    spark.sql("DELETE FROM snapcat.dbdel.t WHERE id > 1 AND id IN (2, 3)")
    assert(spark.sql("SELECT id FROM snapcat.dbdel.t").as[Long].collect().toSeq == Seq(4L))
  }

  test("aborted RTAS restores the previous partition spec and properties") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbr")
    spark.sql("CREATE TABLE snapcat.dbr.r (id BIGINT, flag STRING) PARTITIONED BY (flag)")
    spark.sql("INSERT INTO snapcat.dbr.r VALUES (1, 'a')")
    val cat = new SnapshotCatalog(spark, wh)
    val before = cat.meta("dbr", "r")
    // a frame whose EXECUTION throws: stageReplace has already applied the
    // new spec (the staged write partitionBys against it), so the abort
    // path must restore the old meta — otherwise the table is left with
    // the NEW spec over the OLD data and the next append partitionBys a
    // column the data is not laid out under
    val bad = spark.range(2).select($"id",
      when($"id" < 0, lit("x")).otherwise(expr("raise_error('boom')")).as("name"))
    intercept[Exception] {
      bad.write.mode("overwrite").partitionBy("name").saveAsTable("snapcat.dbr.r")
    }
    val after = cat.meta("dbr", "r")
    assert(after.partitionCols == before.partitionCols, after.toString)
    assert(after.properties == before.properties)
    // old data still readable under the restored spec
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbr.r WHERE flag = 'a'").head.getLong(0) == 1)
  }

  test("ALTER TABLE is all-or-nothing: failing change list applies nothing") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dba")
    spark.sql("CREATE TABLE snapcat.dba.a (id BIGINT)")
    // one V2 call carrying a property set AND a failing AddColumn: the
    // property mutation must not be persisted (the plugin validates the
    // whole change list before applying side effects)
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    val plugin = new graft.catalog.spark.SnapCatalogPlugin
    plugin.initialize("snapx", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh)))
    intercept[Exception] {
      plugin.alterTable(Identifier.of(Array("dba"), "a"),
        TableChange.setProperty("p1", "v1"),
        TableChange.addColumn(Array("id"), org.apache.spark.sql.types.LongType)) // duplicate
    }
    val cat = new SnapshotCatalog(spark, wh)
    assert(!cat.meta("dba", "a").properties.contains("p1"),
      "partial ALTER TABLE persisted a property from a failing statement")
    // multi-column SQL ADD COLUMNS with one bad entry adds neither
    intercept[Exception] {
      spark.sql("ALTER TABLE snapcat.dba.a ADD COLUMNS (ok STRING, id BIGINT)")
    }
    assert(spark.table("snapcat.dba.a").schema.fieldNames.toSeq == Seq("id"))
  }

  test("co-bucketed tables join WITHOUT a shuffle (storage-partitioned join)") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    import spark.implicits._
    val facts = (1L to 200L).map(k => (k, s"f$k")).toDF("k", "fv")
    val dims = (1L to 50L).map(k => (k, s"d$k")).toDF("k", "dv")
    cat.createBucketedTable("dbb", "facts", facts.schema, bucketCol = "k", nBuckets = 4)
    cat.createBucketedTable("dbb", "dims", dims.schema, bucketCol = "k", nBuckets = 4)
    cat.appendBucketed("dbb", "facts", facts)
    cat.appendBucketed("dbb", "dims", dims)

    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a non-broadcast join
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def assertSpj(expectRows: Int): Unit = {
        val joined = spark.sql(
          """SELECT f.k, f.fv, d.dv FROM snapcat.dbb.facts f
            |JOIN snapcat.dbb.dims d ON f.k = d.k""".stripMargin)
        val rows = joined.as[(Long, String, String)].collect().sortBy(_._1)
        assert(rows.length == expectRows)
        assert(rows.head == ((1L, "f1", "d1")) && rows.last == ((50L, "f50", "d50")))
        val shuffles = joined.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(shuffles.isEmpty,
          s"expected a storage-partitioned join with zero exchanges, got:\n" +
            joined.queryExecution.executedPlan.toString.take(2000))
        // r7: both sides keep the COLUMNAR handoff, live deletes included
        // (merged partitions filter dead ordinals via selection vectors)
        val scans = joined.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        }
        assert(scans.size == 2 && scans.forall(_.supportsColumnar),
          "SPJ scans must stay columnar: " + scans.map(_.supportsColumnar))
      }
      assertSpj(expectRows = 50)
      // a second append puts facts across TWO snapshot dirs: each bucket's
      // batch unions per-dir sub-scans, so SPJ survives appends (round 3
      // required compact() first on this shape)
      cat.appendBucketed("dbb", "facts",
        (301L to 320L).map(k => (k, s"f$k")).toDF("k", "fv"))
      assertSpj(expectRows = 50)
      // MoR DML over the bucketed table: the delete-set anti-join
      // broadcasts (preserving the scan's key-grouped partitioning) and
      // the re-inserted copies land back in __bucket dirs — SPJ must
      // survive with zero exchanges over the merged read
      cat.updateMoR("dbb", "facts", col("k") === 10L,
        Map("fv" -> lit("f10")))
      assertSpj(expectRows = 50)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("db.t.changes relation serves the row-level changelog (options + defaults)") {
    wh
    import java.time.Instant
    val dir = java.nio.file.Files.createTempDirectory("graft_chg_").toString
    var tick = 0L
    val cat = new SnapshotCatalog(spark, dir,
      clock = () => { tick += 1; Instant.parse("2026-06-01T00:00:00Z").plusSeconds(tick) })
    spark.conf.set("spark.sql.catalog.chg", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.chg.warehouse", dir)
    val t0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    cat.createTable("db", "tc", t0.schema)          // 1
    cat.append("db", "tc", t0)                      // 2
    cat.deleteMoR("db", "tc", col("id") === 2L)     // 3
    cat.append("db", "tc", Seq((4L, "d")).toDF("id", "v")) // 4
    // defaults: creation -> current, pure SQL
    val full = spark.sql(
      "SELECT _change_type, id FROM chg.db.tc.changes ORDER BY _change_type, id")
      .as[(String, Long)].collect().toSeq
    assert(full == Seq(("insert", 1L), ("insert", 3L), ("insert", 4L)), full.toString)
    // explicit range over the delete: the killed row comes back tagged
    val ranged = spark.read.option("from-snapshot-id", "2")
      .option("to-snapshot-id", "4").table("chg.db.tc.changes")
      .select("_change_type", "id").as[(String, Long)].collect().sorted.toSeq
    assert(ranged == Seq(("delete", 2L), ("insert", 4L)), ranged.toString)
    // agrees with the library changelog exactly
    val lib = cat.readChangelog("db", "tc", 2, 4)
      .select("_change_type", "id").as[(String, Long)].collect().sorted.toSeq
    assert(ranged == lib)
    // bad option fails loudly
    val e = intercept[Exception] {
      spark.read.option("from-snapshot-id", "xyz").table("chg.db.tc.changes").collect()
    }
    assert(e.getMessage.contains("numeric"), e.getMessage)
  }

  test("bucketed SQL lifecycle: CREATE PARTITIONED BY bucket, INSERT, hidden layout") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbbq")
    spark.sql("CREATE TABLE snapcat.dbbq.t (k BIGINT, v STRING) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO snapcat.dbbq.t VALUES (1, 'a'), (2, 'b'), (9, 'c')")
    // the derived __bucket layout column is hidden from SQL
    assert(spark.table("snapcat.dbbq.t").schema.fieldNames.toSeq == Seq("k", "v"))
    assert(spark.sql("SELECT k, v FROM snapcat.dbbq.t ORDER BY k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b"), (9L, "c")))
    // but the data really is laid out in bucket dirs (1 -> b1, 9 -> b1, 2 -> b2)
    val cat = new SnapshotCatalog(spark, wh)
    assert(cat.currentSnapshot("dbbq", "t").files.nonEmpty)
    assert(cat.currentSnapshot("dbbq", "t").files.forall(_.contains("__bucket=")))
    // NULL keys land in bucket 0 and stay VISIBLE to bucketed reads
    spark.sql("INSERT INTO snapcat.dbbq.t VALUES (NULL, 'n')")
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbbq.t").head.getLong(0) == 4)
    // a second append spans snapshot dirs: reads stay correct (per-dir
    // bucket batches union) and the hidden column stays hidden
    assert(spark.table("snapcat.dbbq.t").schema.fieldNames.toSeq == Seq("k", "v"))
    assert(spark.sql("SELECT sum(k) AS s FROM snapcat.dbbq.t").head.getLong(0) == 12)
    // SQL UPDATE rides the rewrite path; its output is re-laid into
    // __bucket=b/ dirs before adoption, so the layout survives
    spark.sql("UPDATE snapcat.dbbq.t SET v = 'x' WHERE k = 1")
    assert(spark.sql("SELECT v FROM snapcat.dbbq.t WHERE k = 1").head.getString(0) == "x")
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbbq.t").head.getLong(0) == 4)
    assert(cat.currentSnapshot("dbbq", "t").files.forall(_.contains("__bucket=")))
    // ...but a TRANSLATABLE SQL DELETE rides the layout-preserving
    // deleteWhere path and works
    spark.sql("DELETE FROM snapcat.dbbq.t WHERE k = 9")
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbbq.t").head.getLong(0) == 3)
    assert(cat.currentSnapshot("dbbq", "t").files.forall(_.contains("__bucket=")))
    // dropping the bucket source column would brick the table: rejected
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE snapcat.dbbq.t DROP COLUMN k")
    }
    assert(e2.getMessage.contains("bucket source"), e2.getMessage)
    // library row-level ops preserve the layout
    cat.delete("dbbq", "t", col("k") === 2L)
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbbq.t").head.getLong(0) == 2)
    assert(cat.currentSnapshot("dbbq", "t").files.forall(_.contains("__bucket=")))
  }

  test("SQL MERGE on a BUCKETED table re-lays its output; SPJ survives the rewrite") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val facts = (1L to 100L).map(k => (k, s"f$k")).toDF("k", "fv")
    val dims = (1L to 30L).map(k => (k, s"d$k")).toDF("k", "dv")
    cat.createBucketedTable("dbrw", "facts", facts.schema, bucketCol = "k", nBuckets = 4)
    cat.createBucketedTable("dbrw", "dims", dims.schema, bucketCol = "k", nBuckets = 4)
    cat.appendBucketed("dbrw", "facts", facts)
    cat.appendBucketed("dbrw", "dims", dims)

    // MERGE rides the group-based rewrite: upserts land, layout survives
    spark.sql(
      """MERGE INTO snapcat.dbrw.facts t
        |USING (SELECT * FROM VALUES (1L, 'updated'), (999L, 'inserted') AS s(k, fv)) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.fv = s.fv
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT fv FROM snapcat.dbrw.facts WHERE k = 1").head.getString(0) == "updated")
    assert(spark.sql("SELECT fv FROM snapcat.dbrw.facts WHERE k = 999").head.getString(0) == "inserted")
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbrw.facts").head.getLong(0) == 101)
    assert(cat.currentSnapshot("dbrw", "facts").files.forall(_.contains("__bucket=")),
      cat.currentSnapshot("dbrw", "facts").files.mkString("\n"))

    // non-translatable DELETE takes the rewrite path too (rlike defeats
    // the filter translator), and the re-laid output keeps the layout
    spark.sql("DELETE FROM snapcat.dbrw.facts WHERE fv RLIKE 'f1[02]$'")
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbrw.facts").head.getLong(0) == 99)
    assert(cat.currentSnapshot("dbrw", "facts").files.forall(_.contains("__bucket=")))

    // the rewritten table still storage-partition-joins with ZERO exchanges
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = spark.sql(
        """SELECT f.k, f.fv, d.dv FROM snapcat.dbrw.facts f
          |JOIN snapcat.dbrw.dims d ON f.k = d.k""".stripMargin)
      assert(joined.count() == 28) // k=10,12 deleted from facts
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        "expected zero exchanges after the bucketed rewrite, got:\n" +
          joined.queryExecution.executedPlan.toString.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucket-key equality prunes whole buckets from scans and rewrites") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val rows = (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
    cat.createBucketedTable("dbbp", "t", rows.schema, bucketCol = "k", nBuckets = 4)
    cat.appendBucketed("dbbp", "t", rows)
    val snapId = cat.currentSnapshot("dbbp", "t").snapshotId
    val before = cat.currentSnapshot("dbbp", "t").files.toSet
    assert((0 to 3).forall(b => before.exists(_.contains(s"__bucket=$b/"))), before)

    // pruneFiles: k = 19 can only live in bucket pmod(19,4) = 3 — every
    // other bucket's file is untouchable by PATH alone (min/max spans the
    // full key range in every bucket, so stats alone could prune nothing)
    val (cands, untouched) = cat.pruneFiles("dbbp", "t", snapId, col("k") === 19L)
    assert(cands.nonEmpty && cands.forall(_.contains("__bucket=3/")), cands)
    // every other bucket's file pruned by path; footer min/max may prune
    // MORE (within bucket 3), never less
    assert(before.filterNot(_.contains("__bucket=3/")).subsetOf(untouched.toSet))
    // IN pins a bucket SET
    val (cands2, _) = cat.pruneFiles("dbbp", "t", snapId, col("k").isin(1L, 2L))
    assert(cands2.forall(f => f.contains("__bucket=1/") || f.contains("__bucket=2/")), cands2)

    // end-to-end through SQL: the UPDATE rewrites ONLY bucket 3; the other
    // three buckets' files carry over byte-identical (same paths)
    spark.sql("UPDATE snapcat.dbbp.t SET v = 'x' WHERE k = 19")
    val after = cat.currentSnapshot("dbbp", "t").files.toSet
    assert(before.filterNot(_.contains("__bucket=3/")).subsetOf(after),
      s"untouched buckets must carry verbatim:\nbefore=$before\nafter=$after")
    // every freshly written file belongs to bucket 3 — nothing outside the
    // admissible bucket was rewritten
    val fresh = after -- before
    assert(fresh.nonEmpty && fresh.forall(_.contains("__bucket=3/")), fresh)
    assert(spark.sql("SELECT v FROM snapcat.dbbp.t WHERE k = 19").head.getString(0) == "x")
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbbp.t").head.getLong(0) == 100)
    // a filtered read sees every surviving row (pruning is advisory for
    // candidates, never for results)
    assert(spark.sql("SELECT count(*) AS c FROM snapcat.dbbp.t WHERE k IN (19, 20, 21)")
      .head.getLong(0) == 3)
  }

  test("unsupported DDL errors clearly") {
    wh
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE snapcat.db1.nation RENAME COLUMN n_name TO nn")
    }
    assert(e.getMessage.toLowerCase.contains("not supported"), e.getMessage)
  }

  test("files/refs/history metadata tables serve the log without touching data") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    cat.createTable("db1", "meta_t", nation.schema)
    cat.append("db1", "meta_t", nation)            // snap 2
    cat.append("db1", "meta_t", nation.limit(5))   // snap 3
    cat.createTag("db1", "meta_t", "v1", 2L)

    // .files: current snapshot's inventory with per-file stats
    val files = spark.sql(
      "SELECT file_path, snapshot_dir, record_count FROM snapcat.db1.meta_t.files ORDER BY file_path")
      .collect()
    assert(files.length == cat.currentSnapshot("db1", "meta_t").files.size)
    assert(files.map(_.getLong(2)).sum == 30, "footer row counts add up")
    assert(files.forall(r => r.getString(0).startsWith(r.getString(1))))

    // .refs: the tag surface
    val refs = spark.sql("SELECT name, type, snapshot_id FROM snapcat.db1.meta_t.refs").collect()
    assert(refs.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      == Seq(("v1", "tag", 2L)))

    // .history: linear lineage, exactly one current
    val hist = spark.sql(
      "SELECT snapshot_id, parent_id, is_current FROM snapcat.db1.meta_t.history ORDER BY snapshot_id")
      .collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(hist.head.isNullAt(1) && hist.last.getLong(1) == 2L)
    assert(hist.count(_.getBoolean(2)) == 1 && hist.last.getBoolean(2))

    // a bucketed table's .files exposes the bucket ids
    val bdf = (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v")
    cat.createBucketedTable("db1", "meta_b", bdf.schema, bucketCol = "k", nBuckets = 4)
    cat.appendBucketed("db1", "meta_b", bdf)
    val buckets = spark.sql("SELECT DISTINCT bucket FROM snapcat.db1.meta_b.files ORDER BY bucket")
      .collect().map(_.getInt(0)).toSeq
    assert(buckets == Seq(0, 1, 2, 3))
  }

  test(".partitions metadata table serves per-partition counts from the log alone") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val df = (1L to 90L).map(i => (i, if (i % 3 == 0) "A" else "B")).toDF("id", "par")
    cat.createTable("db1", "part_m", df.schema, partitionCols = Seq("par"))
    cat.append("db1", "part_m", df)
    // second append: partition values must MERGE across snapshot dirs
    cat.append("db1", "part_m", df.where(col("par") === "A"))
    val rows = spark.sql(
      "SELECT `partition`, file_count, record_count FROM snapcat.db1.part_m.partitions ORDER BY `partition`")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(r => (r._1, r._3)).toSeq ==
      Seq(("par=A", 60L), ("par=B", 60L)), rows.mkString(","))
    // par=A holds files from both snapshot dirs
    assert(rows.head._2 >= 2)

    // total_bytes folds per-file footer sizes (sums to the real on-disk total)
    val bytes = spark.sql(
      "SELECT sum(total_bytes) AS b FROM snapcat.db1.part_m.partitions")
      .head.getLong(0)
    val snap = cat.currentSnapshot("db1", "part_m")
    assert(bytes == snap.files
      .map(f => snap.fileStats(f)("bytes").toLong).sum && bytes > 0)

    // unpartitioned table: one NULL-partition row covering everything
    cat.createTable("db1", "part_u", df.schema)
    cat.append("db1", "part_u", df)
    val u = spark.sql(
      "SELECT `partition`, record_count FROM snapcat.db1.part_u.partitions").collect()
    assert(u.length == 1 && u.head.isNullAt(0) && u.head.getLong(1) == 90L)
  }

  test("RENAME TABLE moves identity, keeps history, and crosses namespaces") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    cat.createTable("db1", "ren_src", nation.schema)
    cat.append("db1", "ren_src", nation)                 // snap 2
    cat.overwrite("db1", "ren_src", nation.limit(3))     // snap 3

    // the RENAME TO target is resolved inside the source's catalog — Spark
    // rejects a catalog-qualified target before it reaches the plugin
    spark.sql("ALTER TABLE snapcat.db1.ren_src RENAME TO db1.ren_dst")
    assert(!cat.tableExists("db1", "ren_src"))
    // full history (not just current state) survives the rename: time
    // travel against the NEW identifier reaches the pre-rename snapshots
    assert(spark.sql("SELECT sum(n_nationkey) AS s, count(*) AS c FROM snapcat.db1.ren_dst VERSION AS OF 2")
      .head.getLong(1) == 25)
    assert(spark.table("snapcat.db1.ren_dst").count() == 3)
    // and the renamed table stays writable (meta names were rewritten)
    cat.append("db1", "ren_dst", nation.limit(2))
    assert(spark.table("snapcat.db1.ren_dst").count() == 5)

    // cross-namespace move
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.ren_ns")
    spark.sql("ALTER TABLE snapcat.db1.ren_dst RENAME TO ren_ns.ren_dst")
    assert(spark.table("snapcat.ren_ns.ren_dst").count() == 5)
    assert(cat.meta("ren_ns", "ren_dst").database == "ren_ns")

    // clear errors on both failure shapes
    val missing = intercept[Exception] {
      spark.sql("ALTER TABLE snapcat.db1.no_such RENAME TO db1.x")
    }
    assert(missing.getMessage.toLowerCase.contains("cannot be found"), missing.getMessage)
    cat.createTable("db1", "ren_clash", nation.schema)
    val clash = intercept[Exception] {
      spark.sql("ALTER TABLE snapcat.ren_ns.ren_dst RENAME TO db1.ren_clash")
    }
    assert(clash.getMessage.toLowerCase.contains("exists"), clash.getMessage)
  }

  test("ALTER NAMESPACE SET/UNSET PROPERTIES round-trips and is all-or-nothing") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.nsprops COMMENT 'raw zone'")
    // 'owner'/'comment'/'location' are parser-reserved namespace property
    // names in Spark — exercise ordinary user properties
    spark.sql("ALTER NAMESPACE snapcat.nsprops SET PROPERTIES ('team' = 'etl', 'tier' = 'bronze')")
    val desc = spark.sql("DESCRIBE NAMESPACE EXTENDED snapcat.nsprops").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("Properties").contains("team") && desc("Properties").contains("etl"), desc)
    spark.sql("ALTER NAMESPACE snapcat.nsprops UNSET PROPERTIES ('tier')")
    val cat = new SnapshotCatalog(spark, wh)
    assert(cat.namespaceProperties("nsprops").get("team").contains("etl"))
    assert(!cat.namespaceProperties("nsprops").contains("tier"))
    // location is derived from the warehouse layout, never persisted state
    assert(spark.sql("DESCRIBE NAMESPACE snapcat.nsprops").collect()
      .exists(r => r.getString(0) == "Location" && r.getString(1).contains("nsprops")))
    // ...and trying to SET it fails loudly instead of silently no-opping
    // (SET LOCATION reaches the plugin as a SetProperty("location") change;
    // the SET PROPERTIES spelling is already parser-rejected)
    val e = intercept[Exception] {
      spark.sql("ALTER NAMESPACE snapcat.nsprops SET LOCATION '/elsewhere'")
    }
    assert(e.getMessage.contains("derived"), e.getMessage)
  }

  test("GROUP BY partition count(*) serves from metadata; unsound shapes refuse") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    // INT partition col (exercises the token cast), two appends = two
    // snapshot dirs — a scan would be a real multi-dir union
    val d1 = Seq((1, 10L), (1, 11L), (2, 20L)).toDF("grp", "v")
    val d2 = Seq((2, 21L), (3, 30L)).toDF("grp", "v")
    cat.createTable("dbpc", "t", d1.schema, partitionCols = Seq("grp"))
    cat.append("dbpc", "t", d1)
    cat.append("dbpc", "t", d2)
    def served(sql: String): Boolean = {
      val p = spark.sql(sql).queryExecution.optimizedPlan.toString
      p.contains("LocalRelation") && !p.contains("RelationV2")
    }
    val q = "SELECT grp, count(*) AS n FROM snapcat.dbpc.t GROUP BY grp ORDER BY grp"
    assert(served(q), "partition-grouped count must serve from metadata")
    assert(spark.sql(q).as[(Int, Long)].collect().toSeq ==
      Seq((1, 2L), (2, 2L), (3, 1L)))
    // refusals — each keeps the scan and stays exact
    val byV = "SELECT v, count(*) AS n FROM snapcat.dbpc.t GROUP BY v ORDER BY v"
    assert(!served(byV), "non-partition grouping must scan")
    assert(spark.sql(byV).count() == 5)
    val withSum = "SELECT grp, count(*) AS n, sum(v) AS s FROM snapcat.dbpc.t GROUP BY grp ORDER BY grp"
    assert(!served(withSum), "a non-count aggregate must scan")
    assert(spark.sql(withSum).as[(Int, Long, Long)].collect().toSeq ==
      Seq((1, 2L, 21L), (2, 2L, 41L), (3, 1L, 30L)))
    val filtered = "SELECT grp, count(*) AS n FROM snapcat.dbpc.t WHERE v > 10 GROUP BY grp"
    assert(!served(filtered), "a non-partition-column filter must scan")
    // a PARTITION-column-only filter admits whole files row-exactly:
    // global and grouped forms both serve from metadata
    val globalF = "SELECT count(*) AS n FROM snapcat.dbpc.t WHERE grp = 2"
    assert(served(globalF), "partition-filtered global count must serve")
    assert(spark.sql(globalF).head.getLong(0) == 2L)
    val groupedF = "SELECT grp, count(*) AS n FROM snapcat.dbpc.t " +
      "WHERE grp >= 2 GROUP BY grp ORDER BY grp"
    assert(served(groupedF), "partition-filtered grouped count must serve")
    assert(spark.sql(groupedF).as[(Int, Long)].collect().toSeq ==
      Seq((2, 2L), (3, 1L)))
    // an all-excluding filter still yields the global count-0 row
    val none = "SELECT count(*) AS n FROM snapcat.dbpc.t WHERE grp = 99"
    assert(served(none) && spark.sql(none).head.getLong(0) == 0L)
    // live MoR deletes make footer counts overstate visible rows: refuse
    cat.deleteMoR("dbpc", "t", col("v") === 11L)
    assert(!served(q), "live MoR deletes must force the scan")
    assert(spark.sql(q).as[(Int, Long)].collect().toSeq ==
      Seq((1, 1L), (2, 2L), (3, 1L)))
    // compaction folds the deletes into plain hive-laid files: the serve
    // resumes, now over the post-delete footer counts
    cat.compact("dbpc", "t", 1)
    assert(served(q), "post-compaction the metadata serve must resume")
    assert(spark.sql(q).as[(Int, Long)].collect().toSeq ==
      Seq((1, 1L), (2, 2L), (3, 1L)))
  }

  test("LIMIT truncates the scan to a row-covering file prefix") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val d = (0L until 90L).map(i => (i, s"r$i")).toDF("id", "s")
    cat.createTable("dblim", "t", d.schema)
    for (k <- 0 until 3)
      cat.append("dblim", "t", d.where(col("id") % 3 === k).repartition(3))
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b.inputPartitions.flatMap {
          case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
          case _ => Seq.empty[String]
        }.distinct.size
      }.getOrElse(sys.error("no BatchScanExec in plan"))
    val full = scannedFiles(spark.sql("SELECT * FROM snapcat.dblim.t"))
    assert(full >= 9, s"fixture should span many files, got $full")
    // an unfiltered preview plans a row-covering PREFIX, not the table
    val lim = spark.sql("SELECT * FROM snapcat.dblim.t LIMIT 3")
    assert(scannedFiles(lim) < full,
      s"limit must truncate the file list: ${scannedFiles(lim)} of $full")
    assert(lim.count() == 3)
    // a bigger-than-prefix limit covers exactly enough files
    val lim40 = spark.sql("SELECT * FROM snapcat.dblim.t LIMIT 40")
    assert(scannedFiles(lim40) < full && lim40.count() == 40)
    // a limit past the table keeps everything and returns everything
    assert(spark.sql("SELECT * FROM snapcat.dblim.t LIMIT 500").count() == 90)
    // a filter disables truncation (matching rows per file unknowable)
    val f = spark.sql("SELECT * FROM snapcat.dblim.t WHERE id >= 30 LIMIT 7")
    assert(f.count() == 7)
    // live MoR deletes disarm it: footer counts overstate visible rows
    cat.deleteMoR("dblim", "t", col("id") < 45)
    assert(spark.sql("SELECT * FROM snapcat.dblim.t LIMIT 50").count() == 45)
  }

  test("ORDER BY + LIMIT prunes files by footer bounds, stays exact") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    // v tracks id (clustered once range-partitioned); nulls only in the
    // first range so later files carry provably-zero null counts
    val d = (0L until 90L)
      .map(i => (i, if (i == 5L || i == 23L) Option.empty[Long] else Option(i * 3)))
      .toDF("id", "v")
    cat.createTable("dbtn", "t", d.schema)
    for (r <- Seq((0L, 30L), (30L, 60L), (60L, 90L)))
      cat.append("dbtn", "t",
        d.where(col("id") >= r._1 && col("id") < r._2)
          .repartitionByRange(3, col("id")))
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b.inputPartitions.flatMap {
          case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
          case _ => Seq.empty[String]
        }.distinct.size
      }.getOrElse(sys.error("no BatchScanExec in plan"))
    def vals(df: org.apache.spark.sql.DataFrame): Seq[Option[Long]] =
      df.select("v").as[Option[Long]].collect().toSeq
    val full = scannedFiles(spark.sql("SELECT v FROM snapcat.dbtn.t"))
    assert(full >= 9, s"fixture should span many files, got $full")
    // ASC (nulls FIRST): the two nulls + the two smallest values — the
    // later ranges' files are bound-excluded (null counts provably zero)
    val asc = spark.sql("SELECT v FROM snapcat.dbtn.t ORDER BY v LIMIT 4")
    assert(scannedFiles(asc) < full,
      s"top-n must prune bound-excluded files: ${scannedFiles(asc)} of $full")
    assert(vals(asc) == Seq(None, None, Some(0L), Some(3L)))
    // DESC (nulls LAST): the four largest values from the tail files
    val desc = spark.sql("SELECT v FROM snapcat.dbtn.t ORDER BY v DESC LIMIT 4")
    assert(scannedFiles(desc) < full)
    assert(vals(desc) == Seq(Some(267L), Some(264L), Some(261L), Some(258L)))
    // a filter disables the pruning; values stay exact
    assert(vals(spark.sql("SELECT v FROM snapcat.dbtn.t WHERE id >= 10 " +
      "ORDER BY v LIMIT 3")) == Seq(None, Some(30L), Some(33L)))
    // live MoR deletes disarm it (footer bounds describe dead rows too)
    cat.deleteMoR("dbtn", "t", col("id") < 2L)
    assert(vals(spark.sql("SELECT v FROM snapcat.dbtn.t ORDER BY v LIMIT 4"))
      == Seq(None, None, Some(6L), Some(9L)))
  }

  test("randomized top-n battery: pruned results equal sort truth") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val rnd = new scala.util.Random(23)
    // UNCLUSTERED values + random nulls: bounds overlap heavily, so
    // pruning rarely helps — exactness must hold regardless
    val rows = (0L until 120L).map { i =>
      (i, if (rnd.nextInt(10) == 0) Option.empty[Long]
          else Option(rnd.nextInt(1000).toLong))
    }
    val d = rows.toDF("id", "v")
    cat.createTable("dbtn", "fuzz", d.schema)
    for (k <- 0 until 4)
      cat.append("dbtn", "fuzz", d.where(col("id") % 4 === k).repartition(2))
    val vs = rows.map(_._2)
    def truth(asc: Boolean, n: Int): Seq[Option[Long]] = {
      val (nulls, defined) = vs.partition(_.isEmpty)
      val sorted = defined.sortBy(_.get)
      val ord = if (asc) nulls ++ sorted else sorted.reverse ++ nulls
      ord.take(n)
    }
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(30)
      val asc = rnd.nextBoolean()
      val got = spark.sql(s"SELECT v FROM snapcat.dbtn.fuzz ORDER BY v " +
          s"${if (asc) "" else "DESC "}LIMIT $n")
        .select("v").as[Option[Long]].collect().toSeq
      // ties make row choice nondeterministic; the VALUE multiset is exact
      assert(got.sorted == truth(asc, n).sorted,
        s"trial $trial (asc=$asc n=$n): $got vs ${truth(asc, n)}")
    }
  }

  test("COMPOSITE ORDER BY + LIMIT prunes files through box bounds, stays exact") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    // (day, v) clustered on BOTH columns: each day spans two files split
    // by v, so a composite leaderboard needs the tuple-bound argument —
    // a single-column day bound alone cannot separate the two files of
    // the top day
    val d = (0L until 90L).map(i => (i, i / 30L, i % 30L)).toDF("id", "day", "v")
    cat.createTable("dbtn", "comp", d.schema)
    cat.append("dbtn", "comp", d.repartitionByRange(6, col("day"), col("v")))
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b.inputPartitions.flatMap {
          case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
          case _ => Seq.empty[String]
        }.distinct.size
      }.getOrElse(sys.error("no BatchScanExec in plan"))
    val full = scannedFiles(spark.sql("SELECT v FROM snapcat.dbtn.comp"))
    assert(full >= 6, s"fixture should span many files, got $full")
    val top = spark.sql("SELECT day, v FROM snapcat.dbtn.comp " +
      "ORDER BY day DESC, v DESC LIMIT 5")
    assert(scannedFiles(top) < full,
      s"composite top-n must prune: ${scannedFiles(top)} of $full")
    assert(top.as[(Long, Long)].collect().toSeq ==
      (0 until 5).map(i => (2L, (29 - i).toLong)))
    // mixed directions stay exact (and sound on any clustering)
    val mixed = spark.sql("SELECT day, v FROM snapcat.dbtn.comp " +
      "ORDER BY day DESC, v ASC LIMIT 5")
    assert(mixed.as[(Long, Long)].collect().toSeq ==
      (0 until 5).map(i => (2L, i.toLong)))
  }

  test("randomized COMPOSITE top-n battery: any direction/null-order mix equals sort truth") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val rnd = new scala.util.Random(471)
    // unclustered, tie-heavy small domains + random nulls in BOTH columns:
    // the null-discipline corners (nulls-last escaping the hi bound,
    // nulls-first leapfrogging the lo bound, tail-column nulls) must all
    // stay exact regardless of what the pruning does
    val rows = (0L until 150L).map { i =>
      (i,
        if (rnd.nextInt(8) == 0) Option.empty[Long] else Option(rnd.nextInt(5).toLong),
        if (rnd.nextInt(8) == 0) Option.empty[Long] else Option(rnd.nextInt(40).toLong))
    }
    val d = rows.toDF("id", "a", "b")
    cat.createTable("dbtn", "cfuzz", d.schema)
    for (k <- 0 until 5)
      cat.append("dbtn", "cfuzz", d.where(col("id") % 5 === k)
        .repartitionByRange(2, col("a"), col("b")))
    def cmp1(x: Option[Long], y: Option[Long], asc: Boolean, nf: Boolean): Int =
      (x, y) match {
        case (None, None) => 0
        case (None, _) => if (nf) -1 else 1
        case (_, None) => if (nf) 1 else -1
        case (Some(p), Some(q)) => if (asc) p.compare(q) else q.compare(p)
      }
    for (trial <- 1 to 10) {
      val n = 1 + rnd.nextInt(25)
      val (ascA, nfA) = (rnd.nextBoolean(), rnd.nextBoolean())
      val (ascB, nfB) = (rnd.nextBoolean(), rnd.nextBoolean())
      def dir(asc: Boolean, nf: Boolean) =
        (if (asc) "ASC" else "DESC") + (if (nf) " NULLS FIRST" else " NULLS LAST")
      val got = spark.sql("SELECT a, b FROM snapcat.dbtn.cfuzz ORDER BY " +
          s"a ${dir(ascA, nfA)}, b ${dir(ascB, nfB)} LIMIT $n")
        .as[(Option[Long], Option[Long])].collect().toSeq
      val truth = rows.map(r => (r._2, r._3)).sortWith { (x, y) =>
        val c = cmp1(x._1, y._1, ascA, nfA)
        (if (c != 0) c else cmp1(x._2, y._2, ascB, nfB)) < 0
      }.take(n)
      // ties beyond (a, b) make row choice nondeterministic; the value
      // multiset is exact
      assert(got.sorted == truth.sorted,
        s"trial $trial (a ${dir(ascA, nfA)}, b ${dir(ascB, nfB)}, n=$n): " +
          s"$got vs $truth")
    }
  }

  test("unfiltered count(col) serves from folded footer null counts") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val d = Seq((1L, Option(5L)), (2L, Option.empty[Long]), (3L, Option(7L)))
      .toDF("id", "b")
    cat.createTable("dbnc", "t", d.schema)
    cat.append("dbnc", "t", d)
    cat.append("dbnc", "t", Seq((4L, Option.empty[Long])).toDF("id", "b"))
    val q = "SELECT count(b) AS nb, count(*) AS n FROM snapcat.dbnc.t"
    val df = spark.sql(q)
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("LocalRelation") && !p.contains("RelationV2"),
      s"count(col) must serve from folded null counts, got:\n$p")
    assert(df.collect().head.toSeq == Seq(2L, 4L))
    // live MoR deletes make the fold unprovable: refuse (the plan keeps
    // the MoR-merged scan — no LocalRelation leaf), stay exact
    cat.deleteMoR("dbnc", "t", col("id") === 1L)
    val df2 = spark.sql(q)
    assert(!df2.queryExecution.optimizedPlan.toString.contains("LocalRelation"),
      "live MoR deletes must force the scan")
    assert(df2.collect().head.toSeq == Seq(1L, 3L))
  }

  test("per-group min/max/count(col) serve from footer stats; unsafe types refuse") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val d1 = Seq((1, 10L, Option(5L), "x", 1.5), (1, 11L, Option.empty[Long], "y", 2.5),
      (2, 20L, Option.empty[Long], "z", 0.5)).toDF("grp", "v", "b", "s", "f")
    val d2 = Seq((2, 21L, Option(9L), "w", 3.5), (3, 30L, Option.empty[Long], "q", 4.5))
      .toDF("grp", "v", "b", "s", "f")
    cat.createTable("dbpc", "stats", d1.schema, partitionCols = Seq("grp"))
    cat.append("dbpc", "stats", d1)
    cat.append("dbpc", "stats", d2)
    def served(sql: String): Boolean = {
      val p = spark.sql(sql).queryExecution.optimizedPlan.toString
      p.contains("LocalRelation") && !p.contains("RelationV2")
    }
    val q = "SELECT grp, count(*) AS n, count(b) AS nb, min(v) AS mn, " +
      "max(v) AS mx, max(b) AS mb FROM snapcat.dbpc.stats GROUP BY grp ORDER BY grp"
    assert(served(q), "integral per-group stats must serve from metadata")
    val got = spark.sql(q).collect().map(r => (r.getInt(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(got == Seq((1, 2L, 1L, 10L, 11L, Some(5L)),
      (2, 2L, 1L, 20L, 21L, Some(9L)), (3, 1L, 0L, 30L, 30L, None)),
      s"got $got")
    // a partition-filtered GLOBAL extremum serves too
    val g = "SELECT min(v) AS mn, max(b) AS mb FROM snapcat.dbpc.stats WHERE grp = 2"
    assert(served(g))
    assert(spark.sql(g).collect().head.getLong(0) == 20L)
    // string and floating-point data columns refuse (truncation / NaN
    // ambiguity) — the scan stays and the values stay exact
    val sMin = "SELECT grp, min(s) AS ms FROM snapcat.dbpc.stats GROUP BY grp ORDER BY grp"
    assert(!served(sMin), "string footer bounds must not serve as answers")
    assert(spark.sql(sMin).collect().map(_.getString(1)).toSeq == Seq("x", "w", "q"))
    val fMin = "SELECT grp, min(f) AS mf FROM snapcat.dbpc.stats GROUP BY grp"
    assert(!served(fMin), "float footer bounds must not serve as answers")
    // sum still refuses wholesale
    assert(!served("SELECT grp, sum(v) AS sv FROM snapcat.dbpc.stats GROUP BY grp"))
  }

  test("randomized layout battery: partition counts always equal scan truth") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val df0 = (0 until 120).map(i => (i % 7, i.toLong)).toDF("grp", "v")
    cat.createTable("dbpc", "fuzz", df0.schema, partitionCols = Seq("grp"))
    cat.append("dbpc", "fuzz", df0.where(col("v") % 2 === 0))
    val rnd = new scala.util.Random(13)
    var servedSteps = 0
    for (step <- 1 to 12) {
      rnd.nextInt(3) match {
        case 0 => // duplicate rows are fine — counts are the invariant
          cat.append("dbpc", "fuzz", df0.where(col("v") % 5 === rnd.nextInt(5)))
        case 1 =>
          cat.deleteMoR("dbpc", "fuzz", col("v") % (2 + rnd.nextInt(5)) === 0)
        case 2 =>
          cat.compact("dbpc", "fuzz", 1 + rnd.nextInt(3))
      }
      val thresh = if (rnd.nextBoolean()) Some(rnd.nextInt(7)) else None
      val where = thresh.map(t => s" WHERE grp >= $t").getOrElse("")
      val sqlq = "SELECT grp, count(*) AS n, count(v) AS nv, min(v) AS mn, " +
        s"max(v) AS mx FROM snapcat.dbpc.fuzz$where GROUP BY grp"
      val df = spark.sql(sqlq)
      val got = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
      val base = cat.readLatest("dbpc", "fuzz")
      val truth = thresh.map(t => base.where(col("grp") >= t)).getOrElse(base)
        .groupBy("grp").agg(count(lit(1)), count(col("v")), min("v"), max("v"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got == truth, s"step $step ($sqlq): got $got want $truth")
      val p = df.queryExecution.optimizedPlan.toString
      if (p.contains("LocalRelation") && !p.contains("RelationV2")) servedSteps += 1
    }
    assert(servedSteps > 0, "battery never exercised the metadata serve (vacuous)")
  }

  test("randomized transform battery: date_trunc counts always equal scan truth") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    // events over ~20 days; unique ids so deleteMoR churn is clean
    val base = (0L until 400L).map(i =>
      (i, java.sql.Timestamp.valueOf(f"2024-03-${1 + (i % 20).toInt}%02d " +
        f"${(i % 24).toInt}%02d:00:00")))
    val df0 = base.toDF("id", "t")
    cat.createTransformPartitionedTable("dbtt", "fuzz", df0.schema, "t", "day")
    cat.appendTransformed("dbtt", "fuzz", df0.where(col("id") % 2 === 0))
    val rnd = new scala.util.Random(31)
    var servedSteps = 0
    for (step <- 1 to 10) {
      rnd.nextInt(3) match {
        case 0 =>
          cat.appendTransformed("dbtt", "fuzz",
            df0.where(col("id") % 7 === rnd.nextInt(7)))
        case 1 =>
          cat.deleteMoR("dbtt", "fuzz", col("id") % (3 + rnd.nextInt(5)) === 0)
        case 2 =>
          cat.compact("dbtt", "fuzz", 1 + rnd.nextInt(3))
      }
      val ranged = rnd.nextBoolean()
      val where = if (ranged)
        " WHERE t >= TIMESTAMP'2024-03-05 00:00:00' AND t < TIMESTAMP'2024-03-15 00:00:00'"
      else ""
      val sqlq = "SELECT date_trunc('DAY', t) AS d, count(*) AS n " +
        s"FROM snapcat.dbtt.fuzz$where GROUP BY 1"
      val df = spark.sql(sqlq)
      val got = df.collect().map(r => (String.valueOf(r.get(0)), r.getLong(1))).toSet
      val b = cat.readLatest("dbtt", "fuzz")
      val truth = (if (ranged) b.where(col("t") >= lit("2024-03-05 00:00:00").cast("timestamp")
          && col("t") < lit("2024-03-15 00:00:00").cast("timestamp")) else b)
        .groupBy(date_trunc("DAY", col("t")).as("d")).count()
        .collect().map(r => (String.valueOf(r.get(0)), r.getLong(1))).toSet
      assert(got == truth, s"step $step ($sqlq): got $got want $truth")
      val p = df.queryExecution.optimizedPlan.toString
      if (p.contains("LocalRelation") && !p.contains("RelationV2")) servedSteps += 1
    }
    assert(servedSteps > 0, "battery never exercised the transform serve (vacuous)")
  }

  test("GROUP BY date_trunc over a days(ts) table serves from __pt metadata") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS snapcat.dbtt")
    spark.sql("CREATE TABLE snapcat.dbtt.ev (id BIGINT, t TIMESTAMP) " +
      "PARTITIONED BY (days(t))")
    spark.sql("INSERT INTO snapcat.dbtt.ev VALUES " +
      "(1, TIMESTAMP'2024-01-01 03:00:00'), (2, TIMESTAMP'2024-01-01 23:59:59'), " +
      "(3, TIMESTAMP'2024-01-02 00:00:00')")
    spark.sql("INSERT INTO snapcat.dbtt.ev VALUES (5, TIMESTAMP'2024-02-05 12:00:00')")
    def served(sql: String): Boolean = {
      val p = spark.sql(sql).queryExecution.optimizedPlan.toString
      p.contains("LocalRelation") && !p.contains("RelationV2")
    }
    def rows(sql: String): Seq[(String, Long, Long)] =
      spark.sql(sql).collect()
        .map(r => (String.valueOf(r.get(0)), r.getLong(1), r.getLong(2))).toSeq
    val q = "SELECT date_trunc('DAY', t) AS d, count(*) AS n, count(t) AS nt " +
      "FROM snapcat.dbtt.ev GROUP BY 1 ORDER BY d"
    assert(served(q), "daily counts over days(ts) must serve from metadata")
    assert(rows(q) == Seq(
      ("2024-01-01 00:00:00.0", 2L, 2L), ("2024-01-02 00:00:00.0", 1L, 1L),
      ("2024-02-05 00:00:00.0", 1L, 1L)))
    // CAST(t AS DATE) is the same day bucketing
    val qd = "SELECT CAST(t AS DATE) AS d, count(*) AS n, count(t) AS nt " +
      "FROM snapcat.dbtt.ev GROUP BY 1 ORDER BY d"
    assert(served(qd))
    assert(rows(qd) == Seq(("2024-01-01", 2L, 2L),
      ("2024-01-02", 1L, 1L), ("2024-02-05", 1L, 1L)))
    // monthly rollup is a coarsening of the day layout: still served
    val qm = "SELECT date_trunc('MONTH', t) AS m, count(*) AS n, count(t) AS nt " +
      "FROM snapcat.dbtt.ev GROUP BY 1 ORDER BY m"
    assert(served(qm))
    assert(rows(qm) == Seq(
      ("2024-01-01 00:00:00.0", 3L, 3L), ("2024-02-01 00:00:00.0", 1L, 1L)))
    // hourly is FINER than the layout: refuse, scan stays exact
    val qh = "SELECT date_trunc('HOUR', t) AS h, count(*) AS n " +
      "FROM snapcat.dbtt.ev GROUP BY 1"
    assert(!served(qh), "finer-than-layout grouping must scan")
    assert(spark.sql(qh).count() == 4)
    // a non-timestamp filter refuses
    assert(!served("SELECT date_trunc('DAY', t) AS d, count(*) AS n " +
      "FROM snapcat.dbtt.ev WHERE id > 1 GROUP BY 1"))
    // a UNIT-ALIGNED half-open time range admits whole day units exactly:
    // grouped and global forms both serve
    val qr = "SELECT date_trunc('DAY', t) AS d, count(*) AS n, count(t) AS nt " +
      "FROM snapcat.dbtt.ev WHERE t >= TIMESTAMP'2024-01-01 00:00:00' " +
      "AND t < TIMESTAMP'2024-01-02 00:00:00' GROUP BY 1"
    assert(served(qr), "aligned day range must serve")
    assert(rows(qr) == Seq(("2024-01-01 00:00:00.0", 2L, 2L)))
    val qg = "SELECT count(*) AS n FROM snapcat.dbtt.ev " +
      "WHERE t >= TIMESTAMP'2024-01-01 00:00:00' AND t < TIMESTAMP'2024-02-01 00:00:00'"
    assert(served(qg), "aligned global range must serve")
    assert(spark.sql(qg).head.getLong(0) == 3L)
    // an all-excluding aligned range still yields the count-0 row
    val qz = "SELECT count(*) AS n FROM snapcat.dbtt.ev " +
      "WHERE t >= TIMESTAMP'2030-01-01 00:00:00'"
    assert(served(qz) && spark.sql(qz).head.getLong(0) == 0L)
    // a bound INSIDE a unit could split that unit's rows: refuse, exact
    val qmis = "SELECT count(*) AS n FROM snapcat.dbtt.ev " +
      "WHERE t >= TIMESTAMP'2024-01-01 12:00:00'"
    assert(!served(qmis), "a mid-unit bound must scan")
    assert(spark.sql(qmis).head.getLong(0) == 3L)
    // a non-UTC session's calendar days differ from the UTC layout: refuse
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try assert(!served(q), "non-UTC session must scan")
    finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    // NULL source timestamps fold into ordinal 0 on write — a table whose
    // snapshot touches __pt=0 must refuse wholesale (the 1970 bucket
    // could hide null rows), and the scan must give the null group
    spark.sql("CREATE TABLE snapcat.dbtt.evnull (id BIGINT, t TIMESTAMP) " +
      "PARTITIONED BY (days(t))")
    spark.sql("INSERT INTO snapcat.dbtt.evnull VALUES " +
      "(1, TIMESTAMP'2024-01-01 03:00:00'), (2, NULL)")
    val qn = "SELECT date_trunc('DAY', t) AS d, count(*) AS n, count(t) AS nt " +
      "FROM snapcat.dbtt.evnull GROUP BY 1 ORDER BY d"
    assert(!served(qn), "a snapshot touching ordinal 0 must scan")
    assert(rows(qn) == Seq(("null", 1L, 0L), ("2024-01-01 00:00:00.0", 1L, 1L)))
    // live MoR deletes refuse; the scan stays exact
    val cat = new SnapshotCatalog(spark, wh)
    cat.deleteMoR("dbtt", "ev", col("id") === 2L)
    assert(!served(q), "live MoR deletes must force the scan")
    assert(rows(q) == Seq(
      ("2024-01-01 00:00:00.0", 1L, 1L), ("2024-01-02 00:00:00.0", 1L, 1L),
      ("2024-02-05 00:00:00.0", 1L, 1L)))
  }

  test("GROUP BY partition count serves the null partition exactly") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val rows = Seq(("a", 1L), ("a", 2L), (null, 3L), ("b", 4L), (null, 5L))
      .toDF("tag", "v")
    cat.createTable("dbpc", "tnull", rows.schema, partitionCols = Seq("tag"))
    cat.append("dbpc", "tnull", rows)
    val df = spark.sql(
      "SELECT tag, count(*) AS n FROM snapcat.dbpc.tnull GROUP BY tag")
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("LocalRelation") && !p.contains("RelationV2"), p)
    assert(df.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toSet ==
      Set(Some("a") -> 2L, Some("b") -> 1L, None -> 2L))
  }

  test("INSERT OVERWRITE: dynamic mode replaces touched partitions, static replaces all") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val init = Seq((1L, "g0"), (2L, "g0"), (11L, "g1"), (21L, "g2")).toDF("id", "grp")
    cat.createTable("dyno", "t", init.schema, partitionCols = Seq("grp"))
    cat.append("dyno", "t", init)
    val before = cat.currentSnapshot("dyno", "t")
    val saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      spark.sql("INSERT OVERWRITE snapcat.dyno.t VALUES " +
        "(CAST(100 AS BIGINT), 'g2'), (CAST(200 AS BIGINT), 'g3')")
      val after = cat.currentSnapshot("dyno", "t")
      assert(after.operation == "dynamic-overwrite")
      // untouched partitions carried verbatim (same file paths)
      assert(before.files.filterNot(_.contains("grp=g2")).toSet
        .subsetOf(after.files.toSet))
      assert(spark.sql("SELECT id FROM snapcat.dyno.t ORDER BY id")
        .as[Long].collect().toSeq == Seq(1L, 2L, 11L, 100L, 200L))

      // writeTo().overwritePartitions() — the DataFrameWriterV2 spelling
      Seq((300L, "g3")).toDF("id", "grp")
        .writeTo("snapcat.dyno.t").overwritePartitions()
      assert(spark.sql("SELECT id FROM snapcat.dyno.t ORDER BY id")
        .as[Long].collect().toSeq == Seq(1L, 2L, 11L, 100L, 300L))

      // an UNPARTITIONED table under the dynamic session conf degrades to
      // the full replace instead of refusing
      cat.createTable("dyno", "flat", init.schema)
      cat.append("dyno", "flat", init)
      spark.sql("INSERT OVERWRITE snapcat.dyno.flat VALUES (CAST(7 AS BIGINT), 'x')")
      assert(spark.sql("SELECT id FROM snapcat.dyno.flat").as[Long].collect().toSeq
        == Seq(7L))

      // hidden-transform layout: dynamic overwrite replaces whole DAYS
      spark.sql("CREATE TABLE snapcat.dyno.ev (id BIGINT, t TIMESTAMP) " +
        "PARTITIONED BY (days(t))")
      spark.sql("INSERT INTO snapcat.dyno.ev VALUES " +
        "(CAST(1 AS BIGINT), TIMESTAMP'2026-01-01 05:00:00')," +
        "(CAST(2 AS BIGINT), TIMESTAMP'2026-01-02 06:00:00')")
      spark.sql("INSERT OVERWRITE snapcat.dyno.ev VALUES " +
        "(CAST(9 AS BIGINT), TIMESTAMP'2026-01-02 23:00:00')")
      assert(spark.sql("SELECT id FROM snapcat.dyno.ev ORDER BY id")
        .as[Long].collect().toSeq == Seq(1L, 9L),
        "day 2026-01-02 replaced, day 2026-01-01 carried")

      // bucketed layouts refuse dynamic overwrite loudly
      cat.createBucketedTable("dyno", "bkt", init.schema, bucketCol = "id", nBuckets = 2)
      val e = intercept[Exception](
        spark.sql("INSERT OVERWRITE snapcat.dyno.bkt VALUES (CAST(1 AS BIGINT), 'g0')"))
      assert(e.getMessage.contains("bucket"), e.getMessage)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)

    // static mode (the default) keeps full-replace semantics
    spark.sql("INSERT OVERWRITE snapcat.dyno.t VALUES (CAST(42 AS BIGINT), 'only')")
    assert(spark.sql("SELECT id FROM snapcat.dyno.t").as[Long].collect().toSeq
      == Seq(42L))
  }

  test("static INSERT OVERWRITE ... PARTITION replaces only the named partition") {
    wh
    val cat = new SnapshotCatalog(spark, wh)
    val init = Seq((1L, "g0"), (11L, "g1"), (21L, "g2")).toDF("id", "grp")
    cat.createTable("dyno", "sow", init.schema, partitionCols = Seq("grp"))
    cat.append("dyno", "sow", init)
    val before = cat.currentSnapshot("dyno", "sow")
    spark.sql("INSERT OVERWRITE snapcat.dyno.sow PARTITION (grp = 'g1') " +
      "VALUES (CAST(100 AS BIGINT))")
    val after = cat.currentSnapshot("dyno", "sow")
    assert(after.operation == "overwrite-where")
    assert(before.files.filterNot(_.contains("grp=g1")).forall(after.files.contains),
      "untouched partitions carry verbatim through the static partition overwrite")
    assert(spark.sql("SELECT id FROM snapcat.dyno.sow ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 21L, 100L))

    // the DataFrameWriterV2 spelling: overwrite(condition)
    Seq((200L, "g2"), (201L, "g3")).toDF("id", "grp")
      .writeTo("snapcat.dyno.sow").overwrite(col("grp") === "g2")
    assert(spark.sql("SELECT id FROM snapcat.dyno.sow ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 100L, 200L, 201L),
      "condition rows replaced; insert is not constrained to the condition")
  }
}
