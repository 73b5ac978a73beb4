package graft

import java.nio.file.Files
import java.time.Instant

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.SnapshotCatalog
import graft.stages.{IntegrityVerifier, Migrator, SchemaCapture, SnapshotCollector, AsOfResolver, DataVerificationResult}

/** Deterministic snapshot-catalog fixture shared by the catalog-surface
  * queries in [[SparkEntry]].
  *
  * Builds, once per (JVM, sfDir): a source warehouse containing
  *   - `tpch.orders`: snapshot 1 `create` (empty) -> snapshot 2 `append`
  *     (full orders, 2 files) -> snapshot 3 `overwrite` (only status-F
  *     orders, 2 files) — the multi-snapshot history the reference's
  *     time-travel surface exists for;
  *   - `tpch.nation`: create -> append (1 file);
  * then migrates the PRE-overwrite state (snapshot 2) into a destination
  * warehouse via the stage-5 Migrator and integrity-verifies it (stage 6) —
  * so every catalog query below runs against state produced by the actual
  * pipeline, and the DuckDB oracles can predict it from the raw parquet.
  *
  * Everything is pinned deterministic: commit timestamps tick a fixed clock
  * (2026-03-01 + 1h per commit), file counts are fixed by `repartition(n)`
  * before each commit.
  */
object WarehouseFixture {

  final case class Fixture(
      src: SnapshotCatalog,
      dst: SnapshotCatalog,
      verification: Seq[DataVerificationResult],
      expiredFileCount: Int)

  private val cache = TrieMap.empty[String, Fixture]

  def forDir(spark: SparkSession, sfDir: String): Fixture =
    cache.getOrElseUpdate(sfDir, build(spark, sfDir))

  /** CSV/JSON/ORC copies of a documents projection, for the non-parquet
    * source formats (built once per sfDir; deterministic single file). */
  private val sourceCache = TrieMap.empty[String, (String, String, String)]

  private def formatSources(spark: SparkSession, sfDir: String): (String, String, String) =
    sourceCache.getOrElseUpdate(sfDir, {
      val base = Files.createTempDirectory("graft_src_fmt_").toString
      val proj = table(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      proj.coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$base/csv")
      proj.coalesce(1).write.mode("overwrite").json(s"$base/json")
      proj.coalesce(1).write.mode("overwrite").orc(s"$base/orc")
      (s"$base/csv", s"$base/json", s"$base/orc")
    })

  def csvJsonSources(spark: SparkSession, sfDir: String): (String, String) = {
    val (c, j, _) = formatSources(spark, sfDir)
    (c, j)
  }

  def orcSource(spark: SparkSession, sfDir: String): String = formatSources(spark, sfDir)._3

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  private def newCat(spark: SparkSession): SnapshotCatalog = {
    var tick = 0L
    new SnapshotCatalog(spark, Files.createTempDirectory("graft_fixture_").toString,
      clock = () => { tick += 1; Instant.parse("2026-03-01T00:00:00Z").plusSeconds(tick * 3600) })
  }

  private def build(spark: SparkSession, sfDir: String): Fixture = {
    val src = newCat(spark)
    val dst = newCat(spark)

    val orders = table(spark, sfDir, "orders")
    val nation = table(spark, sfDir, "nation")

    src.createTable("tpch", "orders", orders.schema)                     // snap 1 @+1h
    src.append("tpch", "orders", orders.repartition(2))                  // snap 2 @+2h: full
    src.createTable("tpch", "nation", nation.schema)                     // snap 1 @+3h
    src.append("tpch", "nation", nation.repartition(1))                  // snap 2 @+4h
    src.overwrite("tpch", "orders",
      orders.where(col("o_orderstatus") === "F").repartition(2))         // snap 3 @+5h: F-only

    // pipeline stages 1-2-5-6 against the pre-overwrite cutoff (between the
    // nation append @+4h and the orders overwrite @+5h)
    val snaps = SnapshotCollector.run(src, "tpch")
    val resolved = AsOfResolver.resolve(snaps, "2026-03-01T04:30:00Z")
    val infos = SchemaCapture.run(src, "tpch", resolved)
    Migrator.run(src, dst, infos)
    val verification = IntegrityVerifier.run(src, dst, infos)

    // maintenance surface, in its own namespace so the tpch pipeline state
    // above stays exactly as the q03..q10 oracles predict:
    // - maint.orders_small: 2 appends of 4 files each, then compact -> 2
    src.createTable("maint", "orders_small", orders.schema)
    src.append("maint", "orders_small", orders.repartition(4))
    src.append("maint", "orders_small", orders.repartition(4))
    src.compact("maint", "orders_small", numFiles = 2)
    // - maint.exp: create/append/overwrite history, then expire all but last
    src.createTable("maint", "exp", orders.schema)
    src.append("maint", "exp", orders.repartition(2))
    src.overwrite("maint", "exp",
      orders.where(col("o_orderstatus") === "F").repartition(1))
    val expDeleted = src.expireSnapshots("maint", "exp", keepLast = 1)

    // - maint.orders_part: Hive-partitioned by o_orderstatus (the partition
    //   spec the reference records but never applies; we apply it)
    src.createTable("maint", "orders_part", orders.schema,
      partitionCols = Seq("o_orderstatus"))
    src.append("maint", "orders_part", orders)

    // - maint.orders_adopt: zero-copy adoption — externally-written parquet
    //   joins the table by rename (adoptFiles), never a rewrite
    src.createTable("maint", "orders_adopt", orders.schema)
    val adoptSrc = Files.createTempDirectory("graft_adopt_src_")
    orders.where(col("o_orderstatus") === "F").repartition(2)
      .write.mode("overwrite").parquet(adoptSrc.toString)
    src.adoptFiles("maint", "orders_adopt", adoptSrc, "append")

    // - maint.orders_sorted: declared sort order — every commit
    //   range-clusters on o_orderkey so per-file bounds are disjoint
    src.createTable("maint", "orders_sorted", orders.schema)
    src.setProperty("maint", "orders_sorted", "write.sort-order", Some("o_orderkey"))
    src.append("maint", "orders_sorted", orders.repartition(4))

    // - row-level operations (Iceberg DELETE/MERGE surface, copy-on-write):
    //   orders_del: DELETE the open orders; orders_up: matched F rows
    //   replaced with doubled totals + new keys inserted (the canonical
    //   MERGE shape); orders_rb: overwrite then roll back to the full state
    src.createTable("maint", "orders_del", orders.schema)
    src.append("maint", "orders_del", orders.repartition(2))
    src.delete("maint", "orders_del", col("o_orderstatus") === "O")

    // - orders_mor: MERGE-ON-READ deletes — two STACKED position-delete
    //   commits (no data file rewritten; the commit shape is asserted in
    //   MorDeleteSpec). Reads merge the recorded positions lazily; q88
    //   oracles the merged result
    src.createTable("maint", "orders_mor", orders.schema)
    src.append("maint", "orders_mor", orders.repartition(2))
    src.deleteMoR("maint", "orders_mor", col("o_orderstatus") === "O")
    src.deleteMoR("maint", "orders_mor", col("o_orderkey") % 10 === 0)

    // - orders_widen: TYPE-WIDENING history — created narrow (int key,
    //   float price), widened to (bigint, double) via a pointer commit,
    //   then appended wide rows. Old files read through the parquet
    //   upcast; q89 oracles the mixed history
    val ow = orders.select(col("o_orderkey").cast("int").as("o_orderkey"),
      col("o_orderstatus"), col("o_totalprice").cast("float").as("o_totalprice"))
    src.createTable("maint", "orders_widen", ow.schema)
    src.append("maint", "orders_widen", ow.repartition(2))
    src.evolveSchema("maint", "orders_widen",
      graft.catalog.SchemaEvolve.widenAt(
        graft.catalog.SchemaEvolve.widenAt(ow.schema,
          Seq("o_orderkey"), org.apache.spark.sql.types.LongType),
        Seq("o_totalprice"), org.apache.spark.sql.types.DoubleType))
    src.append("maint", "orders_widen", orders.select(
      (col("o_orderkey") + 4000000000L).as("o_orderkey"),
      col("o_orderstatus"), col("o_totalprice")).repartition(2))

    // - orders_nested: NESTED struct evolution — info struct gains a
    //   `disc` field mid-history; old files null-fill it (q90)
    val onn = orders.select(col("o_orderkey"),
      struct(col("o_orderstatus").as("st"), col("o_totalprice").as("tp")).as("info"))
    src.createTable("maint", "orders_nested", onn.schema)
    src.append("maint", "orders_nested", onn.repartition(2))
    src.evolveSchema("maint", "orders_nested",
      graft.catalog.SchemaEvolve.addAt(onn.schema,
        Seq("info", "disc"), org.apache.spark.sql.types.LongType))
    src.append("maint", "orders_nested", orders.select(
      (col("o_orderkey") + 4000000000L).as("o_orderkey"),
      struct(col("o_orderstatus").as("st"), col("o_totalprice").as("tp"),
        (col("o_orderkey") % 7).as("disc")).as("info")).repartition(2))

    // - orders_morup: MERGE-ON-READ update — matched rows die as
    //   positions, updated copies append; one commit, no candidate
    //   rewrite (q91)
    src.createTable("maint", "orders_morup", orders.schema)
    src.append("maint", "orders_morup", orders.repartition(2))
    src.updateMoR("maint", "orders_morup", col("o_orderstatus") === "P",
      Map("o_totalprice" -> (col("o_totalprice") * 2)))

    src.createTable("maint", "orders_up", orders.schema)
    src.append("maint", "orders_up", orders.repartition(2))
    val upSource = orders.where(col("o_orderstatus") === "F")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .unionByName(orders.where(col("o_orderstatus") === "P")
        .withColumn("o_orderkey", col("o_orderkey") + 4000000000L))
    src.upsert("maint", "orders_up", upSource, keys = Seq("o_orderkey"))

    // - orders_upmor: the SAME merge shape committed MERGE-ON-READ —
    //   matched keys die as positions, the source appends as the delta;
    //   no target file rewritten (q92 restates it with q52's oracle)
    src.createTable("maint", "orders_upmor", orders.schema)
    src.append("maint", "orders_upmor", orders.repartition(2))
    src.upsertMoR("maint", "orders_upmor", upSource, keys = Seq("o_orderkey"))

    // - orders_sqldml: SQL row-level DML over LIVE MoR deletes (the
    //   SupportsDelta delta-write path, r6): %10 keys die as positions,
    //   then SQL UPDATE doubles P totals and SQL MERGE zeroes keys 1,2
    //   and inserts a fresh key — three commits, NO compact between, no
    //   data file rewritten (shape asserted in SqlDeltaDmlSpec); q93
    //   oracles the merged end state
    src.createTable("maint", "orders_sqldml", orders.schema)
    src.append("maint", "orders_sqldml", orders.repartition(2))
    src.deleteMoR("maint", "orders_sqldml", col("o_orderkey") % 10 === 0)
    spark.conf.set("spark.sql.catalog.snapdml", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.snapdml.warehouse", src.warehouse)
    spark.sql(
      """UPDATE snapdml.maint.orders_sqldml
        |SET o_totalprice = o_totalprice * 2 WHERE o_orderstatus = 'P'""".stripMargin)
    spark.sql(
      """MERGE INTO snapdml.maint.orders_sqldml t
        |USING (SELECT * FROM VALUES
        |    (CAST(1 AS BIGINT), CAST(0.0 AS DOUBLE)),
        |    (CAST(2 AS BIGINT), CAST(0.0 AS DOUBLE)),
        |    (CAST(4000000001 AS BIGINT), CAST(123.0 AS DOUBLE))
        |  AS v(k, p)) s
        |ON t.o_orderkey = s.k
        |WHEN MATCHED THEN UPDATE SET o_totalprice = s.p
        |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice, o_orderdate, o_orderpriority)
        |  VALUES (s.k, CAST(0 AS BIGINT), 'X', s.p,
        |    TIMESTAMP'2026-01-01 00:00:00', '0-NEW')""".stripMargin)

    // - orders_inc: the scheduled-compaction CDC shape (r7) — append the
    //   full table, MoR-delete the %10 keys, compact (materializes the
    //   deletes and rewrites EVERY file), then append a key-shifted F
    //   batch. readIncremental across the compact serves exactly the
    //   post-compact append — the rewrite's moved rows cancel under the
    //   changelog-insert-side diff (q95); the streaming tail treats the
    //   compact as a no-op (StreamingSpec)
    src.createTable("maint", "orders_inc", orders.schema)               // 1
    src.append("maint", "orders_inc", orders.repartition(2))            // 2
    src.deleteMoR("maint", "orders_inc", col("o_orderkey") % 10 === 0)  // 3
    src.compact("maint", "orders_inc", numFiles = 2)                    // 4
    src.append("maint", "orders_inc",
      orders.where(col("o_orderstatus") === "F")
        .withColumn("o_orderkey", col("o_orderkey") + 4000000000L)
        .repartition(2))                                                // 5

    // - orders_wapsql: the full write-audit-publish cycle WITHOUT LEAVING
    //   SQL (r7): write.wap.enabled arms staging, INSERT INTO stages the F
    //   batch (invisible until audited), CALL publish_staged lands it as a
    //   pointer commit; the O batch stages and CALL discard_staged rejects
    //   it. q96 oracles the end state = orders + the published F copy
    src.createTable("maint", "orders_wapsql", orders.schema)
    src.append("maint", "orders_wapsql", orders.repartition(1))
    spark.sql("ALTER TABLE snapdml.maint.orders_wapsql " +
      "SET TBLPROPERTIES('write.wap.enabled'='true')")
    spark.sql("INSERT INTO snapdml.maint.orders_wapsql " +
      s"SELECT * FROM parquet.`$sfDir/orders.parquet` WHERE o_orderstatus = 'F'")
    spark.sql("CALL snapdml.system.publish_staged('maint.orders_wapsql')")
    spark.sql("INSERT INTO snapdml.maint.orders_wapsql " +
      s"SELECT * FROM parquet.`$sfDir/orders.parquet` WHERE o_orderstatus = 'O'")
    spark.sql("CALL snapdml.system.discard_staged('maint.orders_wapsql')")

    // - orders_bykey: range-partitioned files (disjoint o_orderkey ranges)
    //   so per-file footer stats can prove whole files unmatchable — the
    //   data-skipping demonstration table (q55)
    src.createTable("maint", "orders_bykey", orders.schema)
    src.append("maint", "orders_bykey",
      orders.repartitionByRange(4, col("o_orderkey")))

    // - orders_bloom: bloom-armed point-lookup table (r8) — two appends
    //   with fully OVERLAPPING o_orderkey ranges (evens/odds), so min/max
    //   bounds can never exclude a file and only the per-file bloom
    //   sidecars skip (q101; the skip itself is asserted in
    //   BloomSkippingSpec — the oracle proves result exactness)
    src.createTable("maint", "orders_bloom", orders.schema,
      properties = Map(graft.catalog.BloomStats.PropCols -> "o_orderkey"))
    src.append("maint", "orders_bloom",
      orders.where(col("o_orderkey") % 2 === 0).repartition(1))
    src.append("maint", "orders_bloom",
      orders.where(col("o_orderkey") % 2 === 1).repartition(1))

    // - orders_z: z-order-clustered on (o_orderkey, o_custkey) so BOTH
    //   key dimensions skip files (q56)
    src.createTable("maint", "orders_z", orders.schema)
    src.append("maint", "orders_z", orders.repartition(2))
    src.compactZOrder("maint", "orders_z", Seq("o_orderkey", "o_custkey"), numFiles = 8)

    // - spj.*: co-bucketed orders/customer for the storage-partitioned
    //   join query (q62) — both bucketed pmod(custkey, 4)
    val customer = table(spark, sfDir, "customer")
    src.createBucketedTable("spj", "orders_b", orders.schema,
      bucketCol = "o_custkey", nBuckets = 4)
    src.appendBucketed("spj", "orders_b", orders)
    src.createBucketedTable("spj", "customer_b", customer.schema,
      bucketCol = "c_custkey", nBuckets = 4)
    src.appendBucketed("spj", "customer_b", customer)

    src.createTable("maint", "orders_rb", orders.schema)
    src.append("maint", "orders_rb", orders.repartition(2))
    src.overwrite("maint", "orders_rb",
      orders.where(col("o_orderstatus") === "F").repartition(1))
    src.rollback("maint", "orders_rb", toSnapshotId = 2)

    // - maint.orders_bin: 6 small files + 1 larger one, then a TARGETED
    //   bin-pack rewrite: the threshold is the big file's own size, so the
    //   6 smalls fold into one output and the big file carries verbatim
    //   (q77 asserts the history; the spec asserts byte-identical carry)
    src.createTable("maint", "orders_bin", orders.schema)
    src.append("maint", "orders_bin", orders.repartition(6))
    val binBig = src.append("maint", "orders_bin", orders.repartition(1))
    val binBigBytes = binBig.files.filterNot(
        src.snapshotAt("maint", "orders_bin", binBig.snapshotId - 1).files.toSet)
      .map(f => binBig.fileStats(f)("bytes").toLong).min
    src.rewriteSmallFiles("maint", "orders_bin",
      smallBytes = binBigBytes, targetBytes = Long.MaxValue / 4)

    // - orders_evo: changelog ACROSS ADDITIVE SCHEMA EVOLUTION (r8) —
    //   append, MoR-delete the %10 keys (so the diff's exceptAll branch
    //   engages), ADD COLUMN o_disc, then append a wide key-shifted F
    //   batch. The changelog (2, current] serves the diff in the evolved
    //   schema: pre-evolution pre-images null-fill o_disc (q100)
    src.createTable("maint", "orders_evo", orders.schema)               // 1
    src.append("maint", "orders_evo", orders.repartition(2))            // 2
    src.deleteMoR("maint", "orders_evo", col("o_orderkey") % 10 === 0)  // 3
    src.evolveSchema("maint", "orders_evo",
      graft.catalog.SchemaEvolve.addAt(orders.schema,
        Seq("o_disc"), org.apache.spark.sql.types.LongType))            // 4
    src.append("maint", "orders_evo",
      orders.where(col("o_orderstatus") === "F")
        .withColumn("o_orderkey", col("o_orderkey") + 4000000000L)
        .withColumn("o_disc", col("o_orderkey") % 7)
        .repartition(2))                                                // 5

    // - orders_cdceq: the streaming-CDC-across-equality-deletes shape
    //   (r8) — append the full table, a single-key eq delete (%10 keys),
    //   a COMPOSITE-key eq delete ((key, status) tuples: %7 F rows), then
    //   a key-shifted F append. The `.changes` STREAM serves all four
    //   commits (q99): eq-killed pre-images enumerate from the write-once
    //   covered files, the second eq delete's pre-images exclude rows the
    //   first already killed (alive-at-parent filtering)
    src.createTable("maint", "orders_cdceq", orders.schema)             // 1
    src.append("maint", "orders_cdceq", orders.repartition(2))          // 2
    src.deleteMoREq("maint", "orders_cdceq",
      orders.where(col("o_orderkey") % 10 === 0)
        .select("o_orderkey").distinct())                               // 3
    src.deleteMoREq("maint", "orders_cdceq",
      orders.where(col("o_orderkey") % 7 === 0 && col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderstatus").distinct())              // 4
    src.append("maint", "orders_cdceq",
      orders.where(col("o_orderstatus") === "F")
        .withColumn("o_orderkey", col("o_orderkey") + 4000000000L)
        .repartition(2))                                                // 5

    // - maint.orders_wap: one full write-audit-publish cycle (stage the
    //   F batch, audit passes -> publish) and one failed audit (stage the
    //   O batch -> discard); q72 asserts the whole visibility history
    src.createTable("maint", "orders_wap", orders.schema)                // 1
    src.append("maint", "orders_wap", orders.repartition(1))             // 2
    val stF = src.stageAppend("maint", "orders_wap",
      orders.where(col("o_orderstatus") === "F").repartition(1))         // 3 staged
    src.publishStaged("maint", "orders_wap", stF.snapshotId)             // 4
    val stO = src.stageAppend("maint", "orders_wap",
      orders.where(col("o_orderstatus") === "O").repartition(1))         // 5 staged
    src.discardStaged("maint", "orders_wap", stO.snapshotId)             // 6

    Fixture(src, dst, verification, expDeleted)
  }
}
