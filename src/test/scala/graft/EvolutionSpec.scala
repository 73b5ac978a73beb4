package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** Schema + partition-spec evolution beyond add/drop-column: safe type
  * WIDENING (old files read through the parquet upcast — no rewrite),
  * NESTED struct field add/drop, and partition-spec changes that apply to
  * new snapshots only. */
class EvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog(): SnapshotCatalog = {
    val dir = Files.createTempDirectory("graft_evo_").toString
    var tick = 0L
    new SnapshotCatalog(spark, dir,
      clock = () => { tick += 1; Instant.parse("2026-07-01T00:00:00Z").plusSeconds(tick * 3600) })
  }

  private def sqlCat(cat: SnapshotCatalog, name: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", cat.warehouse)
  }

  test("type widening: int->long / float->double across a file history") {
    val cat = freshCatalog()
    val narrow = Seq((1, 1.5f), (2, 2.5f)).toDF("k", "v")
    cat.createTable("db", "w", narrow.schema)
    cat.append("db", "w", narrow) // snap 2: files under (int, float)
    sqlCat(cat, "evo")
    spark.sql("ALTER TABLE evo.db.w ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE evo.db.w ALTER COLUMN v TYPE DOUBLE")
    // widened appends land under the new types
    cat.append("db", "w", Seq((5000000000L, 9.25)).toDF("k", "v"))
    val cur = cat.currentSnapshot("db", "w")
    assert(cur.schema("k").dataType == LongType && cur.schema("v").dataType == DoubleType)
    // OLD files read through the reader upcast - no rewrite happened
    val rows = cat.readLatest("db", "w").as[(Long, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 1.5), (2L, 2.5), (5000000000L, 9.25)))
    // SQL agg over the mixed history
    assert(spark.sql("SELECT sum(k) AS s FROM evo.db.w").head.getLong(0) == 5000000003L)
    // time travel serves the PRE-widening schema
    assert(cat.snapshotAt("db", "w", 2L).schema("k").dataType == IntegerType)
    assert(cat.readAsOf("db", "w", 2L).schema("k").dataType == IntegerType)
    // file-skipping stats recorded under int still prune under long
    val (kept, skipped) = cat.pruneFiles("db", "w", cur.snapshotId, col("k") > 4000000000L)
    assert(skipped.nonEmpty, "old files must prune for an out-of-range long predicate")
    assert(cat.readLatestWhere("db", "w", col("k") > 4000000000L).count() == 1)
  }

  test("type widening: unsafe changes refuse loudly") {
    val cat = freshCatalog()
    val df = Seq((1L, "a", 2.5)).toDF("k", "s", "d")
    cat.createTable("db", "u", df.schema)
    cat.append("db", "u", df)
    sqlCat(cat, "evo2")
    // two refusal layers: Spark's analyzer pre-gates plainly-invalid
    // changes (narrowing, string/numeric crossings) with
    // NOT_SUPPORTED_CHANGE_COLUMN before the catalog ever sees them...
    for (stmt <- Seq(
      "ALTER TABLE evo2.db.u ALTER COLUMN k TYPE INT",      // narrowing
      "ALTER TABLE evo2.db.u ALTER COLUMN s TYPE BIGINT",   // crossing
      "ALTER TABLE evo2.db.u ALTER COLUMN d TYPE FLOAT")) { // narrowing
      val e = intercept[Exception] { spark.sql(stmt) }
      assert(e.getMessage.contains("unsafe type change") ||
        e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), s"$stmt -> ${e.getMessage}")
    }
    // ...and the catalog refuses upcasts Spark would allow but old parquet
    // files cannot serve losslessly (long -> double drops precision)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE evo2.db.u ALTER COLUMN k TYPE DOUBLE")
    }
    assert(e2.getMessage.contains("unsafe type change"), e2.getMessage)
    // the failed statements committed nothing
    assert(cat.currentSnapshot("db", "u").operation == "append")
  }

  test("nested struct field add/drop with null-fill across history") {
    val cat = freshCatalog()
    val df = spark.range(3).select(col("id"),
      struct(col("id").cast("string").as("name"), (col("id") * 2).as("score")).as("info"))
    cat.createTable("db", "n", df.schema)
    cat.append("db", "n", df) // snap 2
    sqlCat(cat, "evo3")
    spark.sql("ALTER TABLE evo3.db.n ADD COLUMN info.flag BIGINT")
    // old files null-fill the nested field; new files carry it
    cat.append("db", "n", spark.range(3, 5).select(col("id"),
      struct(col("id").cast("string").as("name"), (col("id") * 2).as("score"),
        (col("id") % 2).as("flag")).as("info")))
    val got = spark.sql(
      "SELECT id, info.flag AS f FROM evo3.db.n ORDER BY id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq((0L, None), (1L, None), (2L, None), (3L, Some(1L)), (4L, Some(0L))))
    // nested drop: the column disappears from current reads, survives in history
    spark.sql("ALTER TABLE evo3.db.n DROP COLUMN info.score")
    val fields = cat.currentSnapshot("db", "n").schema("info")
      .dataType.asInstanceOf[StructType].fieldNames.toSeq
    assert(fields == Seq("name", "flag"))
    assert(spark.sql("SELECT sum(info.flag) AS s FROM evo3.db.n").head.getLong(0) == 1L)
    assert(cat.readAsOf("db", "n", 2L).select("info.score").count() == 3)
    // guards: non-struct parent, missing parent, last-field drop
    intercept[Exception] { spark.sql("ALTER TABLE evo3.db.n ADD COLUMN id.sub INT") }
    intercept[Exception] { spark.sql("ALTER TABLE evo3.db.n ADD COLUMN ghost.sub INT") }
    spark.sql("ALTER TABLE evo3.db.n DROP COLUMN info.flag")
    val e = intercept[Exception] { spark.sql("ALTER TABLE evo3.db.n DROP COLUMN info.name") }
    assert(e.getMessage.contains("last field"))
  }

  test("changelog + incremental + changes stream span an additive evolution") {
    // r8: a CDC range spanning the engine's OWN DDL (ADD COLUMN, type
    // widening) serves the diff in the `to` schema — pre-evolution
    // pre-images null-fill added columns, widened values upcast — instead
    // of refusing; only an incompatible change (drop-then-retype) still
    // fails, actionably.
    val cat = freshCatalog()
    val df0 = Seq((1L, "a"), (2L, "b"), (10L, "k")).toDF("id", "v")
    cat.createTable("db", "ev", df0.schema)                    // 1
    cat.append("db", "ev", df0)                                // 2
    cat.deleteMoR("db", "ev", col("id") === 10L)               // 3: coverage change
    cat.evolveSchema("db", "ev",
      SchemaEvolve.addAt(df0.schema, Seq("n"), LongType))      // 4: ADD COLUMN
    cat.append("db", "ev", Seq((3L, "c", 30L)).toDF("id", "v", "n")) // 5
    // changelog across the evolution: served in the TO schema, the
    // pre-evolution delete pre-image null-fills n
    val ch = cat.readChangelog("db", "ev", 2, 5)
      .select("_change_type", "id", "v", "n")
      .as[(String, Long, String, Option[Long])].collect().sortBy(r => (r._2, r._1)).toSeq
    assert(ch == Seq(("insert", 3L, "c", Some(30L)), ("delete", 10L, "k", None)),
      ch.toString)
    // incremental across the evolution (the exceptAll fallback branch —
    // coverage changed in range)
    val inc = cat.readIncremental("db", "ev", 2, 5)
      .select("id", "n").as[(Long, Option[Long])].collect().toSeq
    assert(inc == Seq((3L, Some(30L))), inc.toString)
    // the changes STREAM across the evolution: old commits' rows serve
    // under the current schema (n null-filled), the evolution commit
    // itself is a no-op batch
    sqlCat(cat, "evo5")
    val q = spark.readStream.option("starting-snapshot-id", "1")
      .table("evo5.db.ev.changes")
      .writeStream.format("memory").queryName("evo_feed").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val feed = spark.table("evo_feed")
      .select("_change_type", "id", "v", "n")
      .as[(String, Long, String, Option[Long])].collect()
      .sortBy(r => (r._2, r._1)).toSeq
    assert(feed == Seq(("insert", 1L, "a", None), ("insert", 2L, "b", None),
      ("insert", 3L, "c", Some(30L)), ("delete", 10L, "k", None),
      ("insert", 10L, "k", None)), feed.toString)
    // WIDENING endpoints: narrow files' pre-images upcast in the diff
    val n0 = Seq((1, 1.5f), (2, 2.5f)).toDF("k", "v")
    cat.createTable("db", "ev2", n0.schema)                     // 1
    cat.append("db", "ev2", n0)                                 // 2
    cat.evolveSchema("db", "ev2",
      SchemaEvolve.widenAt(SchemaEvolve.widenAt(n0.schema,
        Seq("k"), LongType), Seq("v"), DoubleType))             // 3
    cat.deleteMoR("db", "ev2", col("k") === 1L)                 // 4
    val ch2 = cat.readChangelog("db", "ev2", 2, 4)
      .select("_change_type", "k", "v").as[(String, Long, Double)].collect().toSeq
    assert(ch2 == Seq(("delete", 1L, 1.5d)), ch2.toString)
    // INCOMPATIBLE endpoints (drop then re-add retyped): refuse, actionably
    val d0 = Seq((1L, "x")).toDF("id", "s")
    cat.createTable("db", "ev3", d0.schema)                     // 1
    cat.append("db", "ev3", d0)                                 // 2
    cat.evolveSchema("db", "ev3",
      SchemaEvolve.dropAt(d0.schema, Seq("s")), allowDrop = true) // 3
    cat.compact("db", "ev3", 1)            // 4: files rewritten post-drop
    cat.evolveSchema("db", "ev3",
      SchemaEvolve.addAt(StructType(Seq(StructField("id", LongType))),
        Seq("s"), LongType))                                    // 5: s STRING->BIGINT
    cat.append("db", "ev3", Seq((2L, 20L)).toDF("id", "s"))     // 6
    val e = intercept[IllegalArgumentException] {
      cat.readChangelog("db", "ev3", 2,
        cat.currentSnapshot("db", "ev3").snapshotId).collect()
    }
    assert(e.getMessage.contains("incompatible schema change"), e.getMessage)
  }

  test("partition spec evolution: new spec for new snapshots, exact mixed reads") {
    val cat = freshCatalog()
    val a = Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "x", "p1")).toDF("id", "cat", "part")
    cat.createTable("db", "p", a.schema, partitionCols = Seq("part"))
    cat.append("db", "p", a) // snap 2: hive-laid on part=
    cat.evolvePartitionSpec("db", "p", Seq("cat"))
    val b = Seq((4L, "x", "p3"), (5L, "y", "p3")).toDF("id", "cat", "part")
    cat.append("db", "p", b) // snap 3: hive-laid on cat=
    val snap = cat.currentSnapshot("db", "p")
    // layouts really differ on disk
    assert(snap.files.exists(_.contains("part=")) && snap.files.exists(_.contains("cat=")))
    // full read exact across the mixed layout
    assert(cat.readLatest("db", "p").select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L, 5L))
    // predicates on OLD and NEW partition columns both stay exact
    assert(cat.readLatestWhere("db", "p", col("part") === "p1").count() == 2)
    assert(cat.readLatestWhere("db", "p", col("cat") === "y").count() == 2)
    // SQL across the mixed layout, filters on both layouts' keys
    sqlCat(cat, "evo4")
    assert(spark.sql("SELECT sum(id) AS s FROM evo4.db.p WHERE part = 'p3'")
      .head.getLong(0) == 9L)
    assert(spark.sql("SELECT sum(id) AS s FROM evo4.db.p WHERE cat = 'x'")
      .head.getLong(0) == 8L)
    // the table now reports the evolved spec
    assert(cat.meta("db", "p").partitionCols == Seq("cat"))
    // guards
    intercept[IllegalArgumentException] { cat.evolvePartitionSpec("db", "p", Seq("ghost")) }
    intercept[IllegalArgumentException] { cat.evolvePartitionSpec("db", "p", Seq("cat")) }
  }

  test("column DEFAULT values: create, add-with-default, set/drop default") {
    val cat = freshCatalog()
    sqlCat(cat, "evdef")

    // CREATE TABLE with a DEFAULT: INSERTs that omit the column (or say
    // DEFAULT) fill it; explicit values win
    spark.sql("CREATE TABLE evdef.db.d (k BIGINT, region STRING DEFAULT 'emea')")
    spark.sql("INSERT INTO evdef.db.d (k) VALUES (1)")
    spark.sql("INSERT INTO evdef.db.d VALUES (2, DEFAULT), (3, 'apac')")
    assert(spark.sql("SELECT k, region FROM evdef.db.d ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "emea"), (2L, "emea"), (3L, "apac")))

    // ALTER TABLE ADD COLUMN ... DEFAULT: rows in PRE-EVOLUTION files
    // serve the frozen initial default (not null) through SQL AND the
    // library read; post-evolution explicit NULLs stay null
    val base = Seq((10L, "a"), (11L, "b")).toDF("k", "v")
    cat.createTable("db", "t", base.schema)
    cat.append("db", "t", base) // files WITHOUT the column
    spark.sql("ALTER TABLE evdef.db.t ADD COLUMN score BIGINT DEFAULT 7")
    assert(spark.sql("SELECT k, score FROM evdef.db.t ORDER BY k")
      .as[(Long, Option[Long])].collect().toSeq ==
      Seq((10L, Some(7L)), (11L, Some(7L))),
      "pre-evolution rows must serve the initial default")
    assert(cat.readLatest("db", "t").select("k", "score")
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq ==
      Seq((10L, Some(7L)), (11L, Some(7L))),
      "the library read path must serve it too")
    spark.sql("INSERT INTO evdef.db.t (k, v) VALUES (12, 'c')") // current default
    spark.sql("INSERT INTO evdef.db.t VALUES (13, 'd', NULL)")  // explicit null
    assert(spark.sql("SELECT k, score FROM evdef.db.t ORDER BY k")
      .as[(Long, Option[Long])].collect().toSeq ==
      Seq((10L, Some(7L)), (11L, Some(7L)), (12L, Some(7L)), (13L, None)),
      "explicit NULL written after the ALTER must stay null")

    // SET DEFAULT changes the WRITE default only — pre-evolution rows
    // keep serving the frozen initial default
    spark.sql("ALTER TABLE evdef.db.t ALTER COLUMN score SET DEFAULT 99")
    spark.sql("INSERT INTO evdef.db.t (k, v) VALUES (14, 'e')")
    assert(spark.sql("SELECT k, score FROM evdef.db.t ORDER BY k")
      .as[(Long, Option[Long])].collect().toSeq ==
      Seq((10L, Some(7L)), (11L, Some(7L)), (12L, Some(7L)), (13L, None),
        (14L, Some(99L))))

    // DROP DEFAULT: new INSERTs omitting the column go null; old rows
    // still serve the initial default
    spark.sql("ALTER TABLE evdef.db.t ALTER COLUMN score DROP DEFAULT")
    spark.sql("INSERT INTO evdef.db.t (k, v) VALUES (15, 'f')")
    val fin = spark.sql("SELECT k, score FROM evdef.db.t ORDER BY k")
      .as[(Long, Option[Long])].collect().toSeq
    assert(fin == Seq((10L, Some(7L)), (11L, Some(7L)), (12L, Some(7L)),
      (13L, None), (14L, Some(99L)), (15L, None)), fin.toString)

    // defaults survive MoR deletes (the merged read path) and compact
    cat.deleteMoR("db", "t", col("k") === 11L)
    assert(spark.sql("SELECT k, score FROM evdef.db.t WHERE k = 10")
      .as[(Long, Option[Long])].head() == ((10L, Some(7L))))
    cat.compact("db", "t", numFiles = 1)
    assert(spark.sql("SELECT k, score FROM evdef.db.t ORDER BY k")
      .as[(Long, Option[Long])].collect().toSeq ==
      Seq((10L, Some(7L)), (12L, Some(7L)), (13L, None), (14L, Some(99L)),
        (15L, None)),
      "compact must MATERIALIZE the defaults it read (rewritten files carry them)")

    // an expression default folds to a constant at ALTER time
    spark.sql("ALTER TABLE evdef.db.t ADD COLUMN bonus BIGINT DEFAULT 2 + 3")
    assert(spark.sql("SELECT bonus FROM evdef.db.t WHERE k = 10")
      .as[Option[Long]].head() == Some(5L))
  }
}
