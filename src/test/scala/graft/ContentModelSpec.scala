package graft

import java.nio.file.Files
import java.time.Instant

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotCatalog

/** DIFFERENTIAL content model: drive random operation sequences against a
  * catalog table while maintaining the expected ROW MULTISET in plain
  * driver-side Scala, and compare the full contents after every commit
  * (plus time travel against the recorded model history).
  *
  * This is strictly stronger than the metadata-exactness battery
  * ([[CatalogInvariantSpec]]): a wrong-results bug whose effect is
  * consistent between the count path and the read path — the round-12
  * equality-delete retro-kill was exactly that class — slips past
  * count/bounds checks but cannot slip past an independent model. The
  * model implements each operation's SEMANTIC (filter, key-kill,
  * update-map, overwrite, content-preserving maintenance), never the
  * engine's mechanism.
  */
class ContentModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type R = (Long, Long, String)
  private type P = (Long, Option[String], Long) // (id, grp, score)

  private def readAll(cat: SnapshotCatalog): Seq[R] =
    cat.readLatest("db", "t").select("id", "score", "name")
      .as[R].collect().sorted.toSeq

  test("random op sequences match the driver-side content model, time travel included") {
    val rng = new Random(20260815L)
    (1 to 3).foreach { trial =>
      var tick = 0L
      val cat = new SnapshotCatalog(spark,
        Files.createTempDirectory(s"graft_cm_$trial").toString,
        clock = () => { tick += 1; Instant.parse("2026-08-01T00:00:00Z").plusSeconds(tick) })
      def frame(n: Int): Seq[R] = {
        val base = rng.nextInt(60).toLong
        (0 until n).map(i => (base + i, rng.nextInt(100).toLong, s"v${rng.nextInt(20)}"))
      }
      var model: Vector[R] = frame(30).toVector
      cat.createTable("db", "t", model.toDF("id", "score", "name").schema)
      cat.append("db", "t", model.toDF("id", "score", "name"))
      // model state per snapshot id, for time-travel checks
      val history = scala.collection.mutable.Map(
        cat.currentSnapshotId("db", "t") -> model)

      (1 to 14).foreach { step =>
        val opn = rng.nextInt(11)
        opn match {
          case 0 => // append — ids overlap earlier (and eq-killed) ranges
            val f = frame(5 + rng.nextInt(15))
            cat.append("db", "t", f.toDF("id", "score", "name"))
            model = model ++ f
          case 1 => // CoW delete by predicate
            val c = rng.nextInt(60).toLong + 20L
            cat.delete("db", "t", col("score") < c)
            model = model.filterNot(_._2 < c)
          case 2 => // MoR positional delete by predicate
            val c = rng.nextInt(40).toLong + 10L
            cat.deleteMoR("db", "t", col("score") >= c)
            model = model.filterNot(_._2 >= c)
          case 3 => // MoR equality delete by key set
            val m = rng.nextInt(4).toLong + 2L
            val r = rng.nextInt(m.toInt).toLong
            val victims = model.map(_._1).distinct.filter(id => id % m == r)
            if (victims.nonEmpty) {
              cat.deleteMoREq("db", "t", victims.toDF("id"))
              model = model.filterNot(row => victims.contains(row._1))
            }
          case 4 => // CoW update
            val c = rng.nextInt(80).toLong
            val tag = s"u${rng.nextInt(10)}"
            cat.update("db", "t", col("score") > c, Map("name" -> lit(tag)))
            model = model.map(row => if (row._2 > c) (row._1, row._2, tag) else row)
          case 5 => // MoR update
            val c = rng.nextInt(80).toLong
            val tag = s"m${rng.nextInt(10)}"
            cat.updateMoR("db", "t", col("score") <= c, Map("name" -> lit(tag)))
            model = model.map(row => if (row._2 <= c) (row._1, row._2, tag) else row)
          case 6 => // content-preserving maintenance (r13: the scoped and
            // forced-multi-shard variants exercise the ranged writes and
            // the out-of-scope carry — all must stay row-invisible)
            rng.nextInt(5) match {
              case 0 => cat.compact("db", "t", 1 + rng.nextInt(2))
              case 1 => cat.convertEqualityDeletes("db", "t")
              case 2 => cat.compactDeleteFiles("db", "t")
              case 3 =>
                val c = rng.nextInt(100).toLong
                cat.convertEqualityDeletes("db", "t", Some(col("score") < c))
              case 4 =>
                spark.conf.set("graft.maintenance.deadRowsPerShard",
                  (1 + rng.nextInt(8)).toString)
                try cat.compactDeleteFiles("db", "t",
                  Some(col("score") >= rng.nextInt(100).toLong))
                finally spark.conf.unset("graft.maintenance.deadRowsPerShard")
            }
          case 7 => // overwrite replaces everything
            val f = frame(10 + rng.nextInt(20))
            cat.overwrite("db", "t", f.toDF("id", "score", "name"))
            model = f.toVector
          case 8 => // re-insert EXACT copies of recently-removed rows (the
            // sequence-rule stressor): rows in no-longer-visible state
            val gone = history.values.flatten.toSet -- model.toSet
            if (gone.nonEmpty) {
              val back = gone.toSeq.sorted.take(1 + rng.nextInt(5))
              cat.append("db", "t", back.toDF("id", "score", "name"))
              model = model ++ back
            }
          case 9 => // rollback to a random recorded snapshot: the model IS
            // that snapshot's recorded state (pure pointer commit)
            val sid = history.keys.toSeq.sorted.apply(rng.nextInt(history.size))
            if (sid != cat.currentSnapshotId("db", "t")) {
              cat.rollback("db", "t", toSnapshotId = sid)
              model = history(sid)
            }
          case 10 => // MoR upsert keyed on id: every copy of a matched id
            // dies, the source's single copy inserts
            val src = frame(6).groupBy(_._1).map(_._2.head).toSeq.sorted
            cat.upsertMoR("db", "t", src.toDF("id", "score", "name"), Seq("id"))
            val srcIds = src.map(_._1).toSet
            model = model.filterNot(r => srcIds.contains(r._1)) ++ src
        }
        val got = readAll(cat)
        assert(got == model.sorted.toSeq,
          s"trial $trial step $step op $opn: content diverged from the model " +
            s"(${got.size} vs ${model.size} rows)")
        history(cat.currentSnapshotId("db", "t")) = model
        // time travel: one random recorded snapshot must reproduce ITS model
        val (sid, m) = history.toSeq(rng.nextInt(history.size))
        val tt = cat.readAsOf("db", "t", sid).select("id", "score", "name")
          .as[R].collect().sorted.toSeq
        assert(tt == m.sorted.toSeq,
          s"trial $trial step $step: time travel to $sid diverged")
      }
    }
  }

  /** The partitioned-table battery: DYNAMIC PARTITION OVERWRITE composed
    * with every delete flavor, maintenance, and the null partition — the
    * model replaces exactly the grp values the incoming frame touches.
    * Trial 2 runs the whole sequence under `write.distribution-mode=hash`
    * (clustered writes must change only the layout, never content). */
  test("partitioned content model: dynamic overwrite composes with DML + maintenance") {
    val rng = new Random(20260816L)
    (1 to 3).foreach { trial =>
      var tick = 0L
      val cat = new SnapshotCatalog(spark,
        Files.createTempDirectory(s"graft_pcm_$trial").toString,
        clock = () => { tick += 1; Instant.parse("2026-08-02T00:00:00Z").plusSeconds(tick) })
      var nextId = 0L
      def frame(n: Int): Seq[P] = (0 until n).map { _ =>
        nextId += 1
        val grp = if (rng.nextInt(10) == 0) None else Some(s"g${rng.nextInt(4)}")
        (nextId, grp, rng.nextInt(100).toLong)
      }
      var model: Vector[P] = frame(25).toVector
      val props = if (trial == 2) Map("write.distribution-mode" -> "hash")
        else Map.empty[String, String]
      cat.createTable("db", "p", model.toDF("id", "grp", "score").schema,
        partitionCols = Seq("grp"), properties = props)
      cat.append("db", "p", model.toDF("id", "grp", "score"))
      val history = scala.collection.mutable.Map(
        cat.currentSnapshotId("db", "p") -> model)
      def readAllP(): Seq[P] = cat.readLatest("db", "p")
        .select("id", "grp", "score").as[P].collect().sorted.toSeq

      // mid-sequence zero-copy clones: each records the model at clone
      // time and must still serve it EXACTLY after every later source
      // mutation and a final source-history expiry (hard-link GC
      // independence under randomized histories)
      val clones = scala.collection.mutable.ListBuffer.empty[(String, Vector[P])]

      (1 to 12).foreach { step =>
        val opn = rng.nextInt(9)
        opn match {
          case 0 => // append across partitions (incl. the null one)
            val f = frame(4 + rng.nextInt(10))
            cat.append("db", "p", f.toDF("id", "grp", "score"))
            model = model ++ f
          case 1 => // MoR positional delete
            val c = rng.nextInt(60).toLong + 20L
            cat.deleteMoR("db", "p", col("score") >= c)
            model = model.filterNot(_._3 >= c)
          case 2 => // MoR equality delete by id (covers span partitions)
            val m = rng.nextInt(4).toLong + 2L
            val victims = model.map(_._1).distinct.filter(_ % m == 0L)
            if (victims.nonEmpty) {
              cat.deleteMoREq("db", "p", victims.toDF("id"))
              model = model.filterNot(r => victims.contains(r._1))
            }
          case 3 => // DYNAMIC OVERWRITE: touched grp values replace wholesale
            val f = frame(3 + rng.nextInt(8))
            cat.overwriteDynamic("db", "p", f.toDF("id", "grp", "score"))
            val touched = f.map(_._2).toSet
            model = model.filterNot(r => touched.contains(r._2)) ++ f
          case 4 => // content-preserving maintenance
            rng.nextInt(3) match {
              case 0 => cat.compact("db", "p", 1 + rng.nextInt(2))
              case 1 => cat.convertEqualityDeletes("db", "p")
              case 2 => cat.compactDeleteFiles("db", "p")
            }
          case 5 => // CoW delete
            val c = rng.nextInt(40).toLong
            cat.delete("db", "p", col("score") < c)
            model = model.filterNot(_._3 < c)
          case 6 => // EMPTY dynamic overwrite replaces nothing
            cat.overwriteDynamic("db", "p",
              model.take(0).toDF("id", "grp", "score"))
          case 7 => // FILTER-scoped overwrite: predicate rows die, frame inserts
            val f = frame(2 + rng.nextInt(6))
            if (rng.nextBoolean()) {
              val g = Some(s"g${rng.nextInt(4)}")
              cat.overwriteWhere("db", "p", col("grp") === g.get,
                f.toDF("id", "grp", "score"))
              model = model.filterNot(_._2 == g) ++ f
            } else {
              val c = rng.nextInt(60).toLong + 20L
              cat.overwriteWhere("db", "p", col("score") >= c,
                f.toDF("id", "grp", "score"))
              model = model.filterNot(_._3 >= c) ++ f
            }
          case 8 => // zero-copy clone pins the current model
            val name = s"c$step"
            cat.cloneTable("db", "p", "db2", name)
            clones += ((name, model))
        }
        val got = readAllP()
        assert(got == model.sorted,
          s"trial $trial step $step op $opn: content diverged " +
            s"(${got.size} vs ${model.size} rows)")
        history(cat.currentSnapshotId("db", "p")) = model
        val (sid, m) = history.toSeq(rng.nextInt(history.size))
        val tt = cat.readAsOf("db", "p", sid).select("id", "grp", "score")
          .as[P].collect().sorted.toSeq
        assert(tt == m.sorted, s"trial $trial step $step: time travel to $sid diverged")
      }

      // expire the source down to its head (old files unlink), then every
      // clone must still serve exactly the model it pinned
      cat.expireSnapshots("db", "p", keepLast = 1)
      clones.foreach { case (name, m) =>
        val got = cat.readLatest("db2", name).select("id", "grp", "score")
          .as[P].collect().sorted.toSeq
        assert(got == m.sorted,
          s"trial $trial clone $name diverged after source churn + expiry")
      }
    }
  }

  /** The open-schema ingest battery (`write.merge-schema=true`): random
    * appends each carrying a random SUBSET of known columns plus possibly
    * a brand-new one; the model tracks the evolving column set and each
    * row as a name->value map (absent = NULL). Interleaved MoR deletes and
    * compaction prove the evolved reads stay exact through maintenance. */
  test("schema-merge content model: random wide and narrow appends") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val rng = new Random(20260817L)
    (1 to 3).foreach { trial =>
      var tick = 0L
      val cat = new SnapshotCatalog(spark,
        Files.createTempDirectory(s"graft_smcm_$trial").toString,
        clock = () => { tick += 1; Instant.parse("2026-08-03T00:00:00Z").plusSeconds(tick) })
      var cols: Vector[String] = Vector("c1", "c2")
      var pending = 3 // next fresh column index
      // model: one map per row; absent key = NULL in the evolved schema
      var model: Vector[Map[String, Long]] = Vector.empty
      def mkDf(rows: Seq[Map[String, Long]], rowCols: Seq[String]) = {
        val schema = StructType(rowCols.map(c => StructField(c, LongType, nullable = true)))
        spark.createDataFrame(
          new java.util.ArrayList[Row](rows.map(m =>
            Row.fromSeq(rowCols.map(c => m(c)))).asJava), schema)
      }
      val first = (1 to 10).map(i =>
        Map("c1" -> i.toLong, "c2" -> rng.nextInt(50).toLong))
      cat.createTable("db", "s", mkDf(first, cols).schema,
        properties = Map("write.merge-schema" -> "true"))
      cat.append("db", "s", mkDf(first, cols))
      model = first.toVector

      def readAllS(): Seq[Map[String, Long]] = {
        val snapCols = cat.currentSnapshot("db", "s").schema.fieldNames.toSeq
        cat.readLatest("db", "s").collect().toSeq.map { r =>
          snapCols.zipWithIndex.flatMap { case (c, i) =>
            Option(r.get(i)).map(v => c -> v.asInstanceOf[Long]) }.toMap
        }
      }
      def sortedRows(rs: Seq[Map[String, Long]]): Seq[String] =
        rs.map(m => m.toSeq.sorted.mkString(",")).sorted

      (1 to 10).foreach { step =>
        rng.nextInt(4) match {
          case 0 | 1 => // append a random projection, maybe with a NEW column
            val newCol = if (rng.nextInt(3) == 0) {
              val c = s"c$pending"; pending += 1; Some(c)
            } else None
            val keep = cols.filter(_ => rng.nextBoolean())
            val rowCols = (keep ++ newCol).distinct
            if (rowCols.nonEmpty) {
              val rows = (1 to 3 + rng.nextInt(6)).map(_ =>
                rowCols.map(c => c -> rng.nextInt(100).toLong).toMap)
              cat.append("db", "s", mkDf(rows, rowCols))
              cols = cols ++ newCol
              model = model ++ rows
            }
          case 2 => // MoR delete on the oldest column (always present)
            val c = rng.nextInt(80).toLong
            cat.deleteMoR("db", "s", col("c1") >= c)
            model = model.filterNot(_.get("c1").exists(_ >= c))
          case 3 =>
            cat.compact("db", "s", 1 + rng.nextInt(2))
        }
        assert(cat.currentSnapshot("db", "s").schema.fieldNames.toSeq == cols,
          s"trial $trial step $step: schema diverged")
        val got = sortedRows(readAllS())
        val want = sortedRows(model)
        assert(got == want,
          s"trial $trial step $step: content diverged (${got.size} vs ${want.size})")
      }
    }
  }
}
