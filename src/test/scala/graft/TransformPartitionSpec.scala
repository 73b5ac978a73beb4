package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{SnapshotCatalog, TimeTransform}

/** HIDDEN time-transform partitioning (Iceberg's signature model): the
  * table lays out under `__pt=N/` dirs derived from `day(ts)`/`hour(ts)`,
  * the SQL surface never shows `__pt`, and timestamp predicates on the
  * SOURCE column prune whole directories. */
class TransformPartitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCat(): (SnapshotCatalog, String) = {
    val wh = Files.createTempDirectory("graft_tp_").toString
    var tick = 0L
    (new SnapshotCatalog(spark, wh, clock = () =>
      { tick += 1; Instant.parse("2026-08-01T00:00:00Z").plusSeconds(tick * 60) }), wh)
  }

  private def ts(day: Int, hour: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.from(Instant.parse(
      f"2024-01-$day%02dT$hour%02d:00:00Z"))

  // 4 days x 6 rows
  private def rows = (0 until 24).map { i =>
    (i.toLong, ts(1 + i / 6, i % 6), s"v$i")
  }.toDF("id", "t", "tag")

  test("layout, derivation, and visible-schema hiding") {
    val (cat, wh) = freshCat()
    cat.createTransformPartitionedTable("db", "ev", rows.schema, "t", "day")
    cat.appendTransformed("db", "ev", rows)
    // hive dirs per day: 2024-01-01 = epoch day 19723
    val dirs = Files.list(java.nio.file.Paths.get(wh, "db", "ev", "data", "s2"))
      .iterator(); val names = scala.collection.mutable.Set.empty[String]
    while (dirs.hasNext) names += dirs.next().getFileName.toString
    assert((19723 to 19726).forall(d => names.contains(s"__pt=$d")), names.toString)

    // library read materializes __pt; values match floorDiv arithmetic
    val got = cat.readLatest("db", "ev").select("id", "__pt")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 24)
    assert((0 until 24).forall(i => got(i.toLong) == 19723L + i / 6), got.toString)

    // SQL hides __pt entirely
    spark.conf.set("spark.sql.catalog.tpcat", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.tpcat.warehouse", wh)
    assert(spark.table("tpcat.db.ev").columns.toSeq == Seq("id", "t", "tag"))
    assert(spark.sql("SELECT count(*) FROM tpcat.db.ev").as[Long].head() == 24L)
    // DESCRIBE reports the TRANSFORM, not the hidden column
    val parts = spark.sessionState.catalogManager.catalog("tpcat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "ev"))
      .partitioning().map(_.toString).toSeq
    assert(parts == Seq("days(t)"), parts.toString)
  }

  test("timestamp range predicates prune whole day directories") {
    val (cat, _) = freshCat()
    cat.createTransformPartitionedTable("db", "ev", rows.schema, "t", "day")
    cat.appendTransformed("db", "ev", rows.repartition(1))
    val snap = cat.currentSnapshot("db", "ev")
    // one file per occupied day dir (repartition(1) -> partitionBy splits)
    assert(snap.files.size == 4, snap.files.toString)

    def kept(cond: org.apache.spark.sql.Column): Seq[String] =
      cat.pruneFiles("db", "ev", snap.snapshotId, cond)._1

    // a 2-day window keeps exactly 2 dirs' files
    val midRange = kept(col("t") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
      col("t") < lit("2024-01-04 00:00:00").cast("timestamp"))
    assert(midRange.size == 2, midRange.toString)
    assert(midRange.forall(f => f.contains("__pt=19724") || f.contains("__pt=19725")),
      midRange.toString)
    // boundary instant inside a day over-admits that day only (sound)
    val eq = kept(col("t") === lit("2024-01-03 02:00:00").cast("timestamp"))
    assert(eq.size == 1 && eq.head.contains("__pt=19725"), eq.toString)
    // un-prunable predicate (modulo is opaque to stats + dirs) keeps all
    assert(kept(col("id") % 2 === 0).size == 4)
    // results stay exact after pruning
    assert(cat.readLatestWhere("db", "ev",
        col("t") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
        col("t") < lit("2024-01-04 00:00:00").cast("timestamp"))
      .count() == 12L)
  }

  test("SQL lifecycle: CREATE PARTITIONED BY days(ts), INSERT derives, reads prune") {
    val (cat, wh) = freshCat()
    spark.conf.set("spark.sql.catalog.tpsql", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.tpsql.warehouse", wh)
    spark.sql("CREATE TABLE tpsql.db.ev (id BIGINT, t TIMESTAMP, tag STRING) " +
      "PARTITIONED BY (days(t))")
    assert(cat.meta("db", "ev").transformSpec.contains(("t", "day")))
    rows.createOrReplaceTempView("tp_rows")
    spark.sql("INSERT INTO tpsql.db.ev SELECT * FROM tp_rows")
    // the insert derived __pt and laid out day dirs
    assert(cat.currentSnapshot("db", "ev").files
      .forall(_.contains("__pt=")), cat.currentSnapshot("db", "ev").files.toString)
    // SQL range query answers exactly; the scan plans only matching days
    val n = spark.sql("SELECT count(*) FROM tpsql.db.ev " +
      "WHERE t >= TIMESTAMP '2024-01-02 00:00:00' " +
      "AND t < TIMESTAMP '2024-01-04 00:00:00'").as[Long].head()
    assert(n == 12L)
    val scanDesc = spark.sql("SELECT * FROM tpsql.db.ev " +
      "WHERE t >= TIMESTAMP '2024-01-02 00:00:00' " +
      "AND t < TIMESTAMP '2024-01-04 00:00:00'")
      .queryExecution.executedPlan.toString
    // neither excluded day's directory appears in the planned scan
    assert(!scanDesc.contains("__pt=19723") && !scanDesc.contains("__pt=19726"),
      scanDesc.take(3000))
  }

  test("MoR delete + upsert keep the layout; compact preserves day dirs") {
    val (cat, _) = freshCat()
    cat.createTransformPartitionedTable("db", "ev", rows.schema, "t", "day")
    cat.appendTransformed("db", "ev", rows)
    cat.deleteMoR("db", "ev", col("id") === 3L)
    assert(cat.readLatest("db", "ev").count() == 23L)
    // upsert: replacement + a brand-new row land under their day dirs
    cat.upsertMoR("db", "ev",
      Seq((0L, ts(1, 0), "VXX"), (99L, ts(9, 1), "NEW")).toDF("id", "t", "tag"),
      keys = Seq("id"))
    val after = cat.readLatest("db", "ev")
    assert(after.count() == 24L)
    assert(after.where(col("id") === 0L).select("tag").as[String].head() == "VXX")
    assert(cat.currentSnapshot("db", "ev").files.exists(_.contains("__pt=19731")),
      "new row's day dir missing: " + cat.currentSnapshot("db", "ev").files)
    // compact folds deletes and keeps the hive layout
    cat.compact("db", "ev", numFiles = 1)
    val files = cat.currentSnapshot("db", "ev").files
    assert(files.forall(_.contains("__pt=")), files.toString)
    assert(cat.readLatest("db", "ev").count() == 24L)
    assert(cat.readLatest("db", "ev").where(col("id") === 3L).count() == 0L)
  }

  test("streaming tail and CDC stream hide __pt and serve appends exactly") {
    val (cat, wh) = freshCat()
    cat.createTransformPartitionedTable("db", "st", rows.schema, "t", "day")
    cat.appendTransformed("db", "st", rows.where(col("id") < 12))
    spark.conf.set("spark.sql.catalog.tpst", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.tpst.warehouse", wh)
    val q = spark.readStream.option("starting-snapshot-id", "1")
      .table("tpst.db.st")
      .writeStream.format("memory").queryName("tp_tail").outputMode("append").start()
    try {
      q.processAllAvailable()
      cat.appendTransformed("db", "st", rows.where(col("id") >= 12))
      q.processAllAvailable()
      val got = spark.table("tp_tail")
      assert(got.columns.toSeq == Seq("id", "t", "tag"), got.columns.toSeq.toString)
      assert(got.count() == 24L)
      assert(got.select(sum("id")).as[Long].head() == (0 until 24).sum.toLong)
    } finally q.stop()
    // CDC relation over the same history: all inserts, __pt hidden
    val chg = spark.sql(
      "SELECT _change_type, count(*) AS n FROM tpst.db.st.changes GROUP BY 1")
      .as[(String, Long)].collect().toMap
    assert(chg == Map("insert" -> 24L), chg.toString)
  }

  test("hour transform, pre-1970 floor, and creation guards") {
    val (cat, _) = freshCat()
    val hr = (0 until 6).map(i => (i.toLong, ts(1, i % 3), s"h$i"))
      .toDF("id", "t", "tag")
    cat.createTransformPartitionedTable("db", "hr", hr.schema, "t", "hour")
    cat.appendTransformed("db", "hr", hr)
    val pts = cat.readLatest("db", "hr").select("__pt").distinct()
      .as[Long].collect().toSet
    assert(pts == Set(19723L * 24, 19723L * 24 + 1, 19723L * 24 + 2), pts.toString)

    // floor semantics: a pre-1970 instant lands in the NEGATIVE day
    assert(TimeTransform.ptOfMicros("day", -1L) == -1L)
    assert(TimeTransform.ptOfMicros("day", 0L) == 0L)

    intercept[IllegalArgumentException] {
      cat.createTransformPartitionedTable("db", "bad", hr.schema, "tag", "day")
    }
    intercept[IllegalArgumentException] {
      cat.createTransformPartitionedTable("db", "bad", hr.schema, "t", "week")
    }
  }

  test("month/year transforms: calendar arithmetic, leap/pre-1970 edges, pruning") {
    // calendar ordinals, hand-checked (months since 1970-01 / years
    // since 1970; floorDiv semantics put pre-1970 instants in the unit
    // CONTAINING them)
    def mic(s: String): Long = Instant.parse(s).toEpochMilli * 1000L
    assert(TimeTransform.ptOfMicros("month", mic("2024-01-15T12:00:00Z")) == 648L)
    assert(TimeTransform.ptOfMicros("month", mic("2024-02-29T23:59:59Z")) == 649L,
      "leap day lands in February")
    assert(TimeTransform.ptOfMicros("month", mic("2024-03-01T00:00:00Z")) == 650L)
    assert(TimeTransform.ptOfMicros("month", mic("1969-12-31T23:59:59Z")) == -1L,
      "pre-1970 instant lands in the month containing it")
    assert(TimeTransform.ptOfMicros("month", mic("1969-07-01T00:00:00Z")) == -6L)
    assert(TimeTransform.ptOfMicros("year", mic("2024-06-01T00:00:00Z")) == 54L)
    assert(TimeTransform.ptOfMicros("year", mic("1969-01-01T00:00:00Z")) == -1L)
    assert(TimeTransform.ptOfMicros("year", mic("1970-01-01T00:00:00Z")) == 0L)

    val (cat, wh) = freshCat()
    val mrows = Seq(
      (1L, "2024-01-05T03:00:00Z"), (2L, "2024-01-25T03:00:00Z"),
      (3L, "2024-02-10T03:00:00Z"), (4L, "2024-02-29T03:00:00Z"),
      (5L, "2024-03-01T00:00:00Z"), (6L, "2024-04-11T03:00:00Z"))
      .map { case (i, s) => (i, java.sql.Timestamp.from(Instant.parse(s))) }
      .toDF("id", "t")
    cat.createTransformPartitionedTable("db", "mo", mrows.schema, "t", "month")
    cat.appendTransformed("db", "mo", mrows.repartition(1))
    // write-side derivation matches the calendar ordinal
    val pts = cat.readLatest("db", "mo").select("id", "__pt")
      .as[(Long, Long)].collect().toMap
    assert(pts == Map(1L -> 648L, 2L -> 648L, 3L -> 649L, 4L -> 649L,
      5L -> 650L, 6L -> 651L), pts.toString)

    val snap = cat.currentSnapshot("db", "mo")
    assert(snap.files.size == 4, snap.files.toString) // one per month dir
    def kept(cond: org.apache.spark.sql.Column): Seq[String] =
      cat.pruneFiles("db", "mo", snap.snapshotId, cond)._1
    // a Feb window prunes to exactly the Feb dir — calendar month length
    // (leap 2024: Feb 29 included) handled exactly
    val feb = kept(col("t") >= lit("2024-02-01 00:00:00").cast("timestamp") &&
      col("t") < lit("2024-03-01 00:00:00").cast("timestamp"))
    assert(feb.size == 1 && feb.forall(_.contains("__pt=649")), feb.toString)
    // strict upper bound AT a month boundary excludes the boundary month
    val janOnly = kept(col("t") < lit("2024-02-01 00:00:00").cast("timestamp"))
    assert(janOnly.size == 1 && janOnly.forall(_.contains("__pt=648")), janOnly.toString)
    // one microsecond past the boundary admits February
    val febIn = kept(col("t") < lit("2024-02-01 00:00:00.000001").cast("timestamp"))
    assert(febIn.size == 2, febIn.toString)

    // SQL lifecycle: months(ts) parses, DESCRIBE reports it, reads prune
    spark.conf.set("spark.sql.catalog.tpmo", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.tpmo.warehouse", wh)
    spark.sql("CREATE TABLE tpmo.db.mo2 (id BIGINT, t TIMESTAMP) " +
      "PARTITIONED BY (months(t))")
    spark.sql("INSERT INTO tpmo.db.mo2 SELECT id, t FROM tpmo.db.mo")
    assert(spark.table("tpmo.db.mo2").columns.toSeq == Seq("id", "t"))
    val parts = spark.sessionState.catalogManager.catalog("tpmo")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "mo2"))
      .partitioning().map(_.toString).toSeq
    assert(parts == Seq("months(t)"), parts.toString)
    assert(spark.sql("SELECT count(*) FROM tpmo.db.mo2 WHERE " +
      "t >= TIMESTAMP '2024-02-01 00:00:00' AND t < TIMESTAMP '2024-03-01 00:00:00'")
      .as[Long].head() == 2L)

    // year granularity
    val yrows = Seq((1L, "1969-06-01T00:00:00Z"), (2L, "2023-12-31T23:59:59Z"),
      (3L, "2024-01-01T00:00:00Z"))
      .map { case (i, s) => (i, java.sql.Timestamp.from(Instant.parse(s))) }
      .toDF("id", "t")
    cat.createTransformPartitionedTable("db", "yr", yrows.schema, "t", "year")
    cat.appendTransformed("db", "yr", yrows.repartition(1))
    assert(cat.readLatest("db", "yr").select("id", "__pt")
      .as[(Long, Long)].collect().toMap ==
      Map(1L -> -1L, 2L -> 53L, 3L -> 54L))
  }

  test("truncate[W] transform: long binning, string prefixes, dir pruning") {
    import graft.catalog.TruncateTransform
    // Iceberg floor semantics: negatives truncate DOWNWARD
    assert(TruncateTransform.truncLong(17L, 5L) == 15L)
    assert(TruncateTransform.truncLong(-1L, 5L) == -5L)
    assert(TruncateTransform.truncLong(-5L, 5L) == -5L)
    assert(TruncateTransform.truncStr("abcdef", 4) == "abcd")
    assert(TruncateTransform.truncStr("ab", 4) == "ab")

    val (cat, wh) = freshCat()
    // LONG binning: ids 0..49 in bins of 10
    val lrows = (0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "tag")
    cat.createTruncatePartitionedTable("db", "tl", lrows.schema, "id", 10)
    cat.appendTransformed("db", "tl", lrows.repartition(1))
    val snapL = cat.currentSnapshot("db", "tl")
    assert(snapL.files.size == 5, snapL.files.toString) // one per bin dir
    def keptL(cond: org.apache.spark.sql.Column): Seq[String] =
      cat.pruneFiles("db", "tl", snapL.snapshotId, cond)._1
    val eq = keptL(col("id") === 23L)
    assert(eq.size == 1 && eq.forall(_.contains("__pt=20")), eq.toString)
    val rng = keptL(col("id") >= 15L && col("id") < 30L)
    assert(rng.size == 2, rng.toString) // bins 10 and 20; strict <30 excludes bin 30
    val inp = keptL(col("id").isin(3L, 47L))
    assert(inp.size == 2 &&
      inp.forall(f => f.contains("__pt=0") || f.contains("__pt=40")), inp.toString)

    // STRING prefixes: brands bin by 4-char prefix; nulls land default
    val srows = Seq((1L, "BR41x"), (2L, "BR41y"), (3L, "BR42a"),
      (4L, "CZ10"), (5L, null.asInstanceOf[String])).toDF("id", "brand")
    cat.createTruncatePartitionedTable("db", "ts", srows.schema, "brand", 4)
    cat.appendTransformed("db", "ts", srows.repartition(1))
    val snapS = cat.currentSnapshot("db", "ts")
    def keptS(cond: org.apache.spark.sql.Column): Seq[String] =
      cat.pruneFiles("db", "ts", snapS.snapshotId, cond)._1
    val sEq = keptS(col("brand") === "BR41x")
    assert(sEq.forall(f => f.contains("__pt=BR41") || f.contains("DEFAULT")), sEq.toString)
    assert(sEq.size < snapS.files.size, s"$sEq of ${snapS.files}")
    // prefix (LIKE 'BR%') constrains the dir range; the default dir stays
    val sPre = keptS(col("brand").startsWith("BR"))
    assert(!sPre.exists(_.contains("__pt=CZ10")), sPre.toString)
    // reads stay exact over the pruned scan (null row only in the full read)
    assert(cat.readLatestWhere("db", "ts", col("brand").startsWith("BR41"))
      .count() == 2L)
    assert(cat.readLatest("db", "ts").count() == 5L)

    // SQL lifecycle: truncate(4, brand) parses, DESCRIBE reports, reads work
    spark.conf.set("spark.sql.catalog.tptr", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.tptr.warehouse", wh)
    spark.sql("CREATE TABLE tptr.db.ts2 (id BIGINT, brand STRING) " +
      "PARTITIONED BY (truncate(4, brand))")
    spark.sql("INSERT INTO tptr.db.ts2 SELECT id, brand FROM tptr.db.ts")
    assert(spark.table("tptr.db.ts2").columns.toSeq == Seq("id", "brand"))
    val parts = spark.sessionState.catalogManager.catalog("tptr")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "ts2"))
      .partitioning().map(_.toString).toSeq
    assert(parts.head.contains("truncate"), parts.toString)
    assert(spark.sql("SELECT count(*) FROM tptr.db.ts2 WHERE brand = 'BR41x'")
      .as[Long].head() == 1L)
    assert(spark.sql("SELECT count(*) FROM tptr.db.ts2").as[Long].head() == 5L)

    // guards: non-truncatable type, bad width
    intercept[IllegalArgumentException] {
      cat.createTruncatePartitionedTable("db", "bad",
        Seq((1.0, "x")).toDF("d", "tag").schema, "d", 4)
    }
    intercept[IllegalArgumentException] {
      cat.createTruncatePartitionedTable("db", "bad", lrows.schema, "id", 0)
    }
  }

  test("non-UTC sessions: every (flavor, kind) cell derives and prunes in UTC") {
    val (cat, _) = freshCat()
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      // TIMESTAMP under month: 2024-02-01T02:30Z is February in UTC but
      // Jan 31 21:30 on the New-York wall clock — the derivation must
      // read the UTC calendar, not the session calendar
      val mrows = Seq(
        (1L, "2024-01-31T23:30:00Z"), // Jan in both calendars
        (2L, "2024-02-01T02:30:00Z"), // Feb UTC, Jan NY — the skew cell
        (3L, "2024-03-05T12:00:00Z"))
        .map { case (i, s) => (i, java.sql.Timestamp.from(Instant.parse(s))) }
        .toDF("id", "t")
      cat.createTransformPartitionedTable("db", "m", mrows.schema, "t", "month")
      cat.appendTransformed("db", "m", mrows.repartition(1))
      val pts = cat.readLatest("db", "m").select("id", "__pt")
        .as[(Long, Long)].collect().toMap
      assert(pts == Map(1L -> 648L, 2L -> 649L, 3L -> 650L), pts.toString)
      // pruning maps a UTC-February window to exactly the Feb dir
      val snap = cat.currentSnapshot("db", "m")
      val febPred =
        col("t") >= lit(java.sql.Timestamp.from(Instant.parse("2024-02-01T00:00:00Z"))) &&
        col("t") < lit(java.sql.Timestamp.from(Instant.parse("2024-03-01T00:00:00Z")))
      val feb = cat.pruneFiles("db", "m", snap.snapshotId, febPred)._1
      assert(feb.size == 1 && feb.head.contains("__pt=649"), feb.toString)
      assert(cat.readLatestWhere("db", "m", febPred)
        .select("id").as[Long].collect().toSeq == Seq(2L))

      // TIMESTAMP_NTZ under day: the wall time IS the partition key
      // (read as UTC micros, matching the pruner's literal handling) —
      // no session-zone cast may slip in
      val ntz = Seq((1L, "2024-01-01T05:00:00"), (2L, "2024-01-02T01:00:00"))
        .toDF("id", "s")
        .withColumn("t", col("s").cast("timestamp_ntz")).drop("s")
      cat.createTransformPartitionedTable("db", "d", ntz.schema, "t", "day")
      cat.appendTransformed("db", "d", ntz.repartition(1))
      assert(cat.readLatest("db", "d").select("id", "__pt")
        .as[(Long, Long)].collect().toMap == Map(1L -> 19723L, 2L -> 19724L))

      // TIMESTAMP_NTZ under hour
      cat.createTransformPartitionedTable("db", "h", ntz.schema, "t", "hour")
      cat.appendTransformed("db", "h", ntz.repartition(1))
      assert(cat.readLatest("db", "h").select("id", "__pt")
        .as[(Long, Long)].collect().toMap ==
        Map(1L -> (19723L * 24 + 5), 2L -> (19724L * 24 + 1)))

      // TIMESTAMP under day (epoch arithmetic, was always TZ-free)
      cat.createTransformPartitionedTable("db", "ld", mrows.schema, "t", "day")
      cat.appendTransformed("db", "ld", mrows.repartition(1))
      assert(cat.readLatest("db", "ld").select("id", "__pt")
        .as[(Long, Long)].collect().toMap ==
        Map(1L -> 19753L, 2L -> 19754L, 3L -> 19787L))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("truncate[W] strings: UTF-8 order and code-point widths above the BMP") {
    import graft.catalog.TruncateTransform
    val supp = new String(Character.toChars(0x10000)) // U+10000, surrogate pair
    // truncation counts CODE POINTS (matching Spark's substring) — a
    // UTF-16 substring would split the pair
    assert(TruncateTransform.truncStr("a" + supp + "bc", 2) == "a" + supp)
    assert(TruncateTransform.truncStr(supp + supp + supp, 2) == supp + supp)
    assert(TruncateTransform.truncStr("￿q", 2) == "￿q")

    val (cat, _) = freshCat()
    val rows = Seq(
      (1L, "a" + supp + "zzz"), // token "a𐀀": extends prefix "a", above "a￿" in UTF-8
      (2L, supp + "xy"),        // token "𐀀x": above U+FFFF in UTF-8, below in UTF-16
      (3L, "￿q"),          // token "￿q": straddles the boundary from below
      (4L, "bb"))               // plain BMP control row
      .toDF("id", "s")
    cat.createTruncatePartitionedTable("db", "sp", rows.schema, "s", 2)
    cat.appendTransformed("db", "sp", rows.repartition(1))
    val snap = cat.currentSnapshot("db", "sp")
    assert(snap.files.size == 4, snap.files.toString)
    def kept(cond: org.apache.spark.sql.Column): Seq[String] =
      cat.pruneFiles("db", "sp", snap.snapshotId, cond)._1

    // LIKE 'a%': the dir holding "a𐀀…" must be kept (the old padded
    // upper bound "a￿" silently dropped it)
    assert(kept(col("s").startsWith("a")).exists(_.contains("__pt=a")),
      kept(col("s").startsWith("a")).toString)
    assert(cat.readLatestWhere("db", "sp", col("s").startsWith("a"))
      .select("id").as[Long].collect().toSeq == Seq(1L))

    // s >= '￿': in UTF-8 byte order the supplementary dir sorts ABOVE
    // U+FFFF (UTF-16 code-unit order puts it below → wrongly pruned)
    val geRes = cat.readLatestWhere("db", "sp", col("s") >= "￿")
      .select("id").as[Long].collect().toSet
    assert(geRes == Set(2L, 3L), geRes.toString)
    // and the pruner still prunes: the pure-BMP "bb" dir is excluded
    val geKept = kept(col("s") >= "￿")
    assert(!geKept.exists(_.contains("__pt=bb")), geKept.toString)

    // the reverse direction: s <= '￿' keeps BMP rows, excludes the
    // supplementary dir, and reads stay exact
    val leRes = cat.readLatestWhere("db", "sp", col("s") <= "￿")
      .select("id").as[Long].collect().toSet
    assert(leRes == Set(1L, 4L), leRes.toString)
    assert(!kept(col("s") <= "￿").exists(_.contains(s"__pt=$supp")),
      kept(col("s") <= "￿").toString)

    // equality on a supplementary-prefixed value plans only its dir
    val eqKept = kept(col("s") === (supp + "xy"))
    assert(eqKept.size <= 2, eqKept.toString) // its dir (+ default at most)
    assert(cat.readLatestWhere("db", "sp", col("s") === (supp + "xy"))
      .count() == 1L)
  }
}
