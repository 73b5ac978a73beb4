package graft

import java.nio.file.{Files, Paths}
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotCatalog

/** Multi-table atomic transactions: stage-everything (WAP), durable
  * intent, publish-all-or-discard-all, crash recovery in both directions
  * (roll back while preparing, roll forward once prepared), and the
  * consistent cross-table snapshot cut. */
class TransactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCat(): (SnapshotCatalog, String) = {
    val wh = Files.createTempDirectory("graft_txn_").toString
    var tick = 0L
    (new SnapshotCatalog(spark, wh, clock = () =>
      { tick += 1; Instant.parse("2026-08-01T00:00:00Z").plusSeconds(tick * 60) }), wh)
  }

  private def mkTables(cat: SnapshotCatalog): Unit = {
    cat.createTable("db", "fact", Seq((1L, 1L)).toDF("id", "v").schema)
    cat.createTable("db", "dim", Seq((1L, "x")).toDF("k", "s").schema)
    cat.append("db", "fact", Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    cat.append("db", "dim", Seq((1L, "a")).toDF("k", "s"))
  }

  test("atomic success: both tables flip together, pins form a consistent cut") {
    val (cat, _) = freshCat()
    mkTables(cat)
    val factBefore = cat.currentSnapshotId("db", "fact")
    val pins = cat.beginTransaction()
      .append("db", "fact", Seq((3L, 30L)).toDF("id", "v"))
      .append("db", "dim", Seq((2L, "b")).toDF("k", "s"))
      .commit()
    assert(pins.keySet == Set(("db", "fact"), ("db", "dim")))
    assert(cat.readLatest("db", "fact").count() == 3)
    assert(cat.readLatest("db", "dim").count() == 2)
    // the pins ARE the current cut, and time-travel serves them
    assert(cat.consistentSnapshotIds(Seq(("db", "fact"), ("db", "dim"))) == pins)
    assert(cat.readAsOf("db", "fact", pins(("db", "fact"))).count() == 3)
    // no pending stage, no intent debris, next single-table commit works
    assert(cat.pendingStagedId("db", "fact").isEmpty)
    cat.append("db", "fact", Seq((4L, 40L)).toDF("id", "v"))
    assert(cat.currentSnapshotId("db", "fact") > factBefore)
  }

  test("prepare failure rolls everything back: nothing visible, nothing wedged") {
    val (cat, _) = freshCat()
    mkTables(cat)
    val before = (cat.currentSnapshotId("db", "fact"), cat.currentSnapshotId("db", "dim"))
    // second op's frame has an incompatible schema — staging it throws
    val e = intercept[Exception] {
      cat.beginTransaction()
        .append("db", "fact", Seq((3L, 30L)).toDF("id", "v"))
        .append("db", "dim", Seq((2L, 2.5)).toDF("k", "wrong_col"))
        .commit()
    }
    assert(e != null)
    // the fact stage was discarded: current state unchanged, not staged
    assert(cat.readLatest("db", "fact").count() == 2)
    assert(cat.readLatest("db", "dim").count() == 1)
    assert(cat.pendingStagedId("db", "fact").isEmpty)
    assert(cat.pendingStagedId("db", "dim").isEmpty)
    // visible heads moved only by the stage+discard pointer pair; a fresh
    // cut still resolves and subsequent commits work on both tables
    cat.append("db", "fact", Seq((9L, 90L)).toDF("id", "v"))
    cat.append("db", "dim", Seq((9L, "z")).toDF("k", "s"))
    assert(cat.currentSnapshotId("db", "fact") > before._1)
    assert(cat.currentSnapshotId("db", "dim") > before._2)
  }

  test("a violated expectation on ANY table aborts the whole transaction") {
    val (cat, _) = freshCat()
    mkTables(cat)
    cat.setProperty("db", "dim", "expect.nonempty_s", Some("s IS NOT NULL AND s <> ''"))
    val e = intercept[IllegalStateException] {
      cat.beginTransaction()
        .append("db", "fact", Seq((3L, 30L)).toDF("id", "v"))
        .append("db", "dim", Seq((2L, "")).toDF("k", "s"))
        .commit()
    }
    assert(e.getMessage.contains("expectation"), e.getMessage)
    assert(cat.readLatest("db", "fact").count() == 2, "fact must not surface")
    assert(cat.readLatest("db", "dim").count() == 1)
    assert(cat.pendingStagedId("db", "fact").isEmpty)
    assert(cat.pendingStagedId("db", "dim").isEmpty)
  }

  test("crash roll-forward: a 'prepared' intent publishes the remaining stages") {
    val (cat, wh) = freshCat()
    mkTables(cat)
    // simulate the crash window: both stages durable, intent at the
    // commit point, process died before any publish
    val s1 = cat.stageAppend("db", "fact", Seq((3L, 30L)).toDF("id", "v")).snapshotId
    val s2 = cat.stageAppend("db", "dim", Seq((2L, "b")).toDF("k", "s")).snapshotId
    val intent =
      s"""{"status": "prepared", "ops": [
         |  {"db": "db", "table": "fact", "staged": $s1},
         |  {"db": "db", "table": "dim", "staged": $s2}]}""".stripMargin
    val dir = Paths.get(wh, "_txns")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("txn-crashed1.json"), intent)
    assert(cat.readLatest("db", "fact").count() == 2, "staged stays invisible")
    val recovered = cat.recoverTransactions()
    assert(recovered == Seq("txn-crashed1"))
    assert(cat.readLatest("db", "fact").count() == 3)
    assert(cat.readLatest("db", "dim").count() == 2)
    assert(!Files.exists(dir.resolve("txn-crashed1.json")))
    // idempotent: a second run finds nothing
    assert(cat.recoverTransactions().isEmpty)
  }

  test("crash roll-back: a 'preparing' intent discards exactly its own stages") {
    val (cat, wh) = freshCat()
    mkTables(cat)
    val s1 = cat.stageAppend("db", "fact", Seq((3L, 30L)).toDF("id", "v")).snapshotId
    val dir = Paths.get(wh, "_txns")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("txn-crashed2.json"),
      s"""{"status": "preparing", "ops": [{"db": "db", "table": "fact", "staged": $s1}]}""")
    // a BYSTANDER's pending stage on another table, recorded under a
    // WRONG id in a second stale intent — recovery must not touch it
    val sBy = cat.stageAppend("db", "dim", Seq((7L, "q")).toDF("k", "s")).snapshotId
    Files.writeString(dir.resolve("txn-stale.json"),
      s"""{"status": "preparing", "ops": [{"db": "db", "table": "dim", "staged": ${sBy + 500}}]}""")
    cat.recoverTransactions()
    // fact's stage rolled back; the table is unwedged
    assert(cat.pendingStagedId("db", "fact").isEmpty)
    assert(cat.readLatest("db", "fact").count() == 2)
    cat.append("db", "fact", Seq((5L, 50L)).toDF("id", "v"))
    // dim's unrelated pending stage survived (id mismatch = not ours)
    assert(cat.pendingStagedId("db", "dim").contains(sBy))
    cat.publishStaged("db", "dim", sBy)
    assert(cat.readLatest("db", "dim").count() == 2)
  }

  test("beginTransaction auto-recovers; a wedged target refuses loudly otherwise") {
    val (cat, wh) = freshCat()
    mkTables(cat)
    val s1 = cat.stageAppend("db", "fact", Seq((3L, 30L)).toDF("id", "v")).snapshotId
    val dir = Paths.get(wh, "_txns")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("txn-crashed3.json"),
      s"""{"status": "prepared", "ops": [{"db": "db", "table": "fact", "staged": $s1}]}""")
    // beginTransaction completes the predecessor, then this txn lands
    val pins = cat.beginTransaction()
      .append("db", "fact", Seq((4L, 40L)).toDF("id", "v"))
      .commit()
    assert(cat.readLatest("db", "fact").count() == 4) // 2 + crashed 1 + ours 1
    assert(pins(("db", "fact")) == cat.currentSnapshotId("db", "fact"))
    // a FOREIGN pending stage (no intent) refuses the transaction
    val sBy = cat.stageAppend("db", "fact", Seq((8L, 80L)).toDF("id", "v")).snapshotId
    val e = intercept[IllegalArgumentException] {
      cat.beginTransaction().append("db", "fact", Seq((9L, 90L)).toDF("id", "v")).commit()
    }
    assert(e.getMessage.contains("pending staged"), e.getMessage)
    cat.discardStaged("db", "fact", sBy)
  }

  test("deleteMoR participates: the CDC move shape lands atomically or not at all") {
    val (cat, _) = freshCat()
    mkTables(cat)
    // the classic move: append the row to its destination AND delete it
    // from the source, in one transaction
    cat.beginTransaction()
      .append("db", "dim", Seq((2L, "moved")).toDF("k", "s"))
      .deleteMoR("db", "fact", col("id") === 2L)
      .commit()
    assert(cat.readLatest("db", "fact").as[(Long, Long)].collect().toSet
      == Set((1L, 10L)))
    assert(cat.readLatest("db", "dim").count() == 2)
    // a failing member rolls the delete back too: rows stay visible
    val e = intercept[Exception] {
      cat.beginTransaction()
        .deleteMoR("db", "fact", col("id") === 1L)
        .append("db", "dim", Seq((3L, 9.9)).toDF("k", "bad_col"))
        .commit()
    }
    assert(e != null)
    assert(cat.readLatest("db", "fact").count() == 1, "the delete must not surface")
    assert(cat.pendingStagedId("db", "fact").isEmpty)
  }

  test("concurrent transactions in OPPOSITE declared order serialize, never deadlock") {
    val (cat, _) = freshCat()
    cat.createTable("db", "ca", Seq((1L, 1L)).toDF("id", "v").schema)
    cat.createTable("db", "cb", Seq((1L, 1L)).toDF("id", "v").schema)
    // commit() sorts the table set canonically, so two writers declaring
    // {ca, cb} and {cb, ca} acquire in ONE global order — hold-and-wait
    // in opposite orders (the deadlock shape) is impossible by
    // construction. A deadlock here would hang; the await bounds it.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val tasks = Seq(Seq("ca", "cb"), Seq("cb", "ca")).zipWithIndex.map {
        case (order, w) =>
          pool.submit(new java.util.concurrent.Callable[Int] {
            override def call(): Int = {
              for (i <- 0 until 4) {
                val id = w * 1000L + i
                val txn = cat.beginTransaction()
                order.foreach(t =>
                  txn.append("db", t, Seq((id, id)).toDF("id", "v")))
                txn.commit()
              }
              4
            }
          })
      }
      tasks.foreach(f => assert(
        f.get(180, java.util.concurrent.TimeUnit.SECONDS) == 4))
    } finally pool.shutdownNow()
    assert(cat.readLatest("db", "ca").count() == 8)
    assert(cat.readLatest("db", "cb").count() == 8)
    assert(cat.pendingStagedId("db", "ca").isEmpty &&
      cat.pendingStagedId("db", "cb").isEmpty)
  }

  test("randomized battery: visible state equals the successful-txn replay") {
    // the differential-checker pattern pointed at transactions: a seeded
    // interleaving of committing txns, failing txns (schema error /
    // expectation violation), plain commits, MoR-delete members, and
    // both crash-recovery directions — after every step each table's
    // visible rows must equal a driver-side model that applies only the
    // operations that were supposed to survive
    val (cat, wh) = freshCat()
    val tables = Seq("t1", "t2", "t3")
    tables.foreach { t =>
      cat.createTable("db", t, Seq((1L, 1L)).toDF("id", "v").schema)
    }
    cat.setProperty("db", "t2", "expect.v_nonneg", Some("v >= 0"))
    val model = scala.collection.mutable.Map(
      tables.map(t => t -> Vector.empty[(Long, Long)]): _*)
    val rng = new scala.util.Random(20260815L)
    var nextId = 0L
    def batch(n: Int, bad: Boolean = false): Seq[(Long, Long)] = {
      val rows = (nextId until nextId + n).map(i =>
        (i, if (bad) -1L - i else i % 97))
      nextId += n
      rows
    }
    def checkAll(step: Int): Unit = tables.foreach { t =>
      val got = cat.readLatest("db", t).as[(Long, Long)].collect().sorted.toSeq
      assert(got == model(t).sorted,
        s"step $step: $t diverged\n got=$got\nwant=${model(t).sorted}")
      assert(cat.pendingStagedId("db", t).isEmpty, s"step $step: $t wedged")
    }
    for (step <- 1 to 24) {
      rng.nextInt(7) match {
        case 0 => // committing two-table txn
          val Seq(x, y) = rng.shuffle(tables).take(2)
          val (bx, by) = (batch(2 + rng.nextInt(4)), batch(1 + rng.nextInt(3)))
          cat.beginTransaction()
            .append("db", x, bx.toDF("id", "v"))
            .append("db", y, by.toDF("id", "v"))
            .commit()
          model(x) ++= bx; model(y) ++= by
        case 1 => // failing txn: second member has a bad schema
          val Seq(x, y) = rng.shuffle(tables).take(2)
          intercept[Exception] {
            cat.beginTransaction()
              .append("db", x, batch(3).toDF("id", "v"))
              .append("db", y, Seq((nextId, "oops")).toDF("id", "wrong"))
              .commit()
          }
        case 2 => // failing txn: t2's expectation violated
          val x = tables(rng.nextInt(3))
          val e = intercept[Exception] {
            val txn = cat.beginTransaction()
              .append("db", "t2", batch(2, bad = true).toDF("id", "v"))
            (if (x == "t2") txn else txn.append("db", x, batch(2).toDF("id", "v")))
              .commit()
          }
          assert(e.getMessage != null)
        case 3 => // plain single-table commit (control)
          val x = tables(rng.nextInt(3))
          val b = batch(1 + rng.nextInt(5))
          cat.append("db", x, b.toDF("id", "v"))
          model(x) ++= b
        case 4 => // txn with a MoR-delete member
          val Seq(x, y) = rng.shuffle(tables).take(2)
          val m = 3 + rng.nextInt(5)
          val b = batch(2 + rng.nextInt(3))
          cat.beginTransaction()
            .deleteMoR("db", x, col("id") % m === 1)
            .append("db", y, b.toDF("id", "v"))
            .commit()
          model(x) = model(x).filterNot(_._1 % m == 1); model(y) ++= b
        case 5 => // crash roll-FORWARD: prepared intent left behind
          val x = tables(rng.nextInt(3))
          val b = batch(2)
          val sid = cat.stageAppend("db", x, b.toDF("id", "v")).snapshotId
          val dir = java.nio.file.Paths.get(wh, "_txns")
          java.nio.file.Files.createDirectories(dir)
          java.nio.file.Files.writeString(dir.resolve(s"txn-rf$step.json"),
            s"""{"status": "prepared", "ops": [{"db": "db", "table": "$x", "staged": $sid}]}""")
          cat.recoverTransactions()
          model(x) ++= b
        case 6 => // crash roll-BACK: preparing intent left behind
          val x = tables(rng.nextInt(3))
          val sid = cat.stageAppend("db", x, batch(2).toDF("id", "v")).snapshotId
          val dir = java.nio.file.Paths.get(wh, "_txns")
          java.nio.file.Files.createDirectories(dir)
          java.nio.file.Files.writeString(dir.resolve(s"txn-rb$step.json"),
            s"""{"status": "preparing", "ops": [{"db": "db", "table": "$x", "staged": $sid}]}""")
          cat.recoverTransactions()
      }
      checkAll(step)
    }
    // the cut must be stable and serve exactly the model at the end
    val cut = cat.consistentSnapshotIds(tables.map(t => ("db", t)))
    tables.foreach { t =>
      assert(cat.readAsOf("db", t, cut(("db", t))).count() == model(t).size)
    }
  }

  test("one op per table and empty transactions refuse") {
    val (cat, _) = freshCat()
    mkTables(cat)
    intercept[IllegalArgumentException](cat.beginTransaction().commit())
    intercept[IllegalArgumentException] {
      cat.beginTransaction()
        .append("db", "fact", Seq((3L, 30L)).toDF("id", "v"))
        .append("db", "fact", Seq((4L, 40L)).toDF("id", "v"))
        .commit()
    }
    // both refusals left no debris
    assert(cat.pendingStagedId("db", "fact").isEmpty)
    assert(cat.readLatest("db", "fact").count() == 2)
  }
}
