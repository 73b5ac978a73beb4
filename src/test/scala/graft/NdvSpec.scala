package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotCatalog

/** NDV sketches: commit-time HLL unions feeding CBO's distinctCount.
  * HLL at lgK=12 has ~1.6% relative standard error (sparse-mode coupon
  * collisions bite even at a few hundred values), so estimates assert
  * within 5%; only single-digit cardinalities are exact. */
class NdvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def close(est: Long, truth: Long): Boolean =
    math.abs(est - truth.toDouble) / truth <= 0.05

  private def freshCat(): (SnapshotCatalog, String) = {
    val wh = Files.createTempDirectory("graft_ndv_").toString
    var tick = 0L
    (new SnapshotCatalog(spark, wh, clock = () =>
      { tick += 1; Instant.parse("2026-06-01T00:00:00Z").plusSeconds(tick * 60) }), wh)
  }

  test("append-path auto-union: per-commit sketches accumulate without a rescan") {
    val (cat, _) = freshCat()
    val a = (0 until 500).map(i => (i.toLong, s"t${i % 3}")).toDF("id", "tag")
    cat.createTable("db", "t", a.schema,
      properties = Map("write.ndv.columns" -> "id,tag"))
    cat.append("db", "t", a)
    val s1 = cat.currentSnapshot("db", "t")
    assert(close(s1.summary("ndv.id").toLong, 500L), s1.summary)
    assert(s1.summary("ndv.tag").toLong == 3L)
    assert(s1.summary("ndv.snapshot").toLong == s1.snapshotId)

    // overlapping append: union counts the distinct of the UNION, not the sum
    cat.append("db", "t", (250 until 750).map(i => (i.toLong, s"t${i % 5}")).toDF("id", "tag"))
    val s2 = cat.currentSnapshot("db", "t")
    assert(close(s2.summary("ndv.id").toLong, 750L), s2.summary)
    assert(s2.summary("ndv.tag").toLong == 5L)

    // overwrite resets to exactly the new state
    cat.overwrite("db", "t", (0 until 10).map(i => (i.toLong, "x")).toDF("id", "tag"))
    val s3 = cat.currentSnapshot("db", "t")
    assert(s3.summary("ndv.id").toLong == 10L)
    assert(s3.summary("ndv.tag").toLong == 1L)
  }

  test("MoR delete carries the estimate (upper bound); compact resets it exactly") {
    val (cat, _) = freshCat()
    val a = (0 until 400).map(i => (i.toLong, i % 7)).toDF("id", "grp")
    cat.createTable("db", "d", a.schema,
      properties = Map("write.ndv.columns" -> "id"))
    cat.append("db", "d", a)
    val sketched = cat.currentSnapshot("db", "d")
    cat.deleteMoR("db", "d", col("id") >= 100L)
    val afterDel = cat.currentSnapshot("db", "d")
    // carried verbatim: HLL cannot subtract; upper bound is the safe side
    val carried = afterDel.summary("ndv.id").toLong
    assert(close(carried, 400L))
    assert(afterDel.summary("ndv.snapshot").toLong == sketched.snapshotId,
      "ndv.snapshot must keep naming the last sketched snapshot")
    // compact re-observes the merged live rows -> exact again
    cat.compact("db", "d", numFiles = 1)
    assert(close(cat.currentSnapshot("db", "d").summary("ndv.id").toLong, 100L))
  }

  test("mid-history arming skips NDV until analyze_ndv bootstraps; then unions resume") {
    val (cat, _) = freshCat()
    val a = (0 until 300).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    cat.createTable("db", "b", a.schema)
    cat.append("db", "b", a) // unsketched history
    cat.setProperty("db", "b", "write.ndv.columns", Some("id"))
    cat.append("db", "b", (300 until 350).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val s = cat.currentSnapshot("db", "b")
    assert(!s.summary.contains("ndv.id"),
      "an append onto unsketched history must emit NOTHING (absent beats undercounted)")
    val analyzed = cat.analyzeNdv("db", "b").get
    assert(close(analyzed.summary("ndv.id").toLong, 350L))
    // row-identical stats-only commit: incremental consumers see nothing
    assert(cat.readIncremental("db", "b", s.snapshotId, analyzed.snapshotId).count() == 0L)
    // subsequent appends union against the bootstrap sidecar
    cat.append("db", "b", (340 until 360).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    assert(close(cat.currentSnapshot("db", "b").summary("ndv.id").toLong, 360L))
  }

  test("larger-cardinality union stays within HLL error; analyze defaults to supported columns") {
    val (cat, _) = freshCat()
    val n = 120000
    val a = (0 until n).map(i => (i.toLong, (i % 1000).toString)).toDF("id", "s")
    cat.createTable("db", "big", a.schema)
    cat.append("db", "big", a)
    val s = cat.analyzeNdv("db", "big").get // no cols, no property: all supported
    val est = s.summary("ndv.id").toLong
    assert(math.abs(est - n.toDouble) / n < 0.05, s"ndv.id=$est for $n distinct")
    assert(close(s.summary("ndv.s").toLong, 1000L))
  }

  test("analyze_histogram: equi-height bins see skew; carry + overwrite-reset; CBO + SQL") {
    val (cat, wh) = freshCat()
    // heavy skew: 0..99 uniform plus 900 extra rows at id=5
    val rows = (0 until 100).map(_.toLong) ++ Seq.fill(900)(5L)
    val a = rows.map(i => (i, s"v$i")).toDF("id", "v")
    cat.createTable("db", "h", a.schema)
    cat.append("db", "h", a)
    val s = cat.analyzeHistogram("db", "h", bins = 8).get
    val json = graft.catalog.Json.parse(s.summary("hist.id"))
      .asInstanceOf[graft.catalog.JObj]
    val bins = json.arr("b").map(_.asInstanceOf[graft.catalog.JArr].values)
    assert(bins.nonEmpty && bins.size <= 8, s"got ${bins.size} bins")
    // equi-height: the skewed value compresses its bin's [lo, hi] span —
    // the first bin must end at (or before) the skew point
    val firstHi = bins.head(1).asInstanceOf[graft.catalog.JNum].value
    assert(firstHi <= 5.0 + 1e-9, s"first bin hi=$firstHi should hug the skew at 5")
    // v is non-numeric: no histogram for it
    assert(!s.summary.contains("hist.v"))

    // carries across append, resets on overwrite
    cat.append("db", "h", Seq((200L, "x")).toDF("id", "v"))
    assert(cat.currentSnapshot("db", "h").summary.contains("hist.id"))
    cat.overwrite("db", "h", Seq((1L, "y")).toDF("id", "v"))
    assert(!cat.currentSnapshot("db", "h").summary.contains("hist.id"),
      "overwrite replaces the data wholesale; a carried histogram would be wrong")
    // a constant column yields NO histogram (and no empty commit)
    assert(cat.analyzeHistogram("db", "h", bins = 4).isEmpty)

    // optimizer + SQL surfaces, on real data again
    cat.overwrite("db", "h", a)
    cat.analyzeHistogram("db", "h", bins = 4)
    spark.conf.set("spark.sql.catalog.histcat", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.histcat.warehouse", wh)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val st = spark.table("histcat.db.h").queryExecution.optimizedPlan.stats
        .attributeStats.find(_._1.name == "id").map(_._2)
      assert(st.flatMap(_.histogram).isDefined, s"optimizer must see the histogram: $st")
      val called = spark.sql("CALL histcat.system.analyze_histogram('db.h', 'id', 8)")
        .collect()
      assert(called.length == 1 && called(0).getString(1) == "id", called.mkString(","))
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("CBO serves distinctCount from the log; SQL CALL analyze_ndv works") {
    val (cat, wh) = freshCat()
    val a = (0 until 600).map(i => (i.toLong, s"k${i % 12}")).toDF("id", "k")
    cat.createTable("db", "c", a.schema,
      properties = Map("write.ndv.columns" -> "id,k"))
    cat.append("db", "c", a)
    spark.conf.set("spark.sql.catalog.ndvcat", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set("spark.sql.catalog.ndvcat.warehouse", wh)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val df = spark.table("ndvcat.db.c")
      val attrStats = df.queryExecution.optimizedPlan.stats.attributeStats
      val byName = attrStats.map { case (attr, st) => attr.name -> st }
      val servedId = byName.get("id").flatMap(_.distinctCount).map(_.toLong)
      assert(servedId.exists(close(_, 600L)),
        s"optimizer must see ndv.id~600, got $byName")
      assert(byName.get("k").flatMap(_.distinctCount).map(_.toLong).contains(12L))

      // SQL surface: CALL returns one row per column with the estimate
      val called = spark.sql("CALL ndvcat.system.analyze_ndv('db.c')")
        .collect().map(r => (r.getString(1), r.getLong(2))).toMap
      assert(close(called("id"), 600L) && called("k") == 12L, called.toString)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }
}
