package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotCatalog
import graft.streaming.MvMaintainer

/** Continuous MV maintenance: commit signals fold into incremental
  * refreshes, replays are no-ops, multi-base views serialize on the view
  * lock. */
class MvMaintainerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newCat(name: String): (SnapshotCatalog, String) = {
    val wh = Files.createTempDirectory("graft_mvm_").toString
    var tick = 0L
    val cat = new SnapshotCatalog(spark, wh,
      clock = () => { tick += 1; Instant.parse("2026-05-01T00:00:00Z").plusSeconds(tick * 60) })
    spark.conf.set(s"spark.sql.catalog.$name", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (cat, name)
  }

  private def drain(qs: Seq[org.apache.spark.sql.streaming.StreamingQuery]): Unit =
    qs.foreach(q => assert(q.awaitTermination(180000), "maintainer did not drain"))

  test("maintains an aggregate MV through delete+append churn, incrementally, idempotently") {
    val (cat, cn) = newCat("snapmvm1")
    val df0 = (1L to 40L).map(i => (i, if (i % 3 == 0) "a" else "b", i * 10)).toDF("k", "g", "v")
    cat.createTable("db", "t", df0.schema)
    cat.append("db", "t", df0)
    cat.createMaterializedView("db", "mv",
      "SELECT g, count(*) AS n, sum(v) AS sv FROM db.t GROUP BY g")
    cat.deleteMoR("db", "t", col("k") % 4 === 0)
    cat.append("db", "t", (41L to 50L).map(i => (i, "a", i * 10)).toDF("k", "g", "v"))

    val modes = scala.collection.mutable.ArrayBuffer.empty[String]
    drain(MvMaintainer.maintain(spark, cat, cn, "db", "mv",
      onRefresh = (m, _) => modes.synchronized { modes += m }))
    assert(modes.contains("incremental_agg"), modes.toString)
    assert(!modes.contains("full"), modes.toString)

    val got = spark.sql(s"SELECT g, n, sv FROM $cn.db.mv ORDER BY g")
      .as[(String, Long, Long)].collect().toSeq
    val want = cat.readLatest("db", "t").groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sv")).orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)

    // replaying the maintainer from scratch offsets is a pure no-op
    val modes2 = scala.collection.mutable.ArrayBuffer.empty[String]
    drain(MvMaintainer.maintain(spark, cat, cn, "db", "mv",
      onRefresh = (m, _) => modes2.synchronized { modes2 += m }))
    assert(modes2.forall(_ == "fresh"), modes2.toString)
  }

  test("multi-base join MV: one signal stream per base, both drain, result exact") {
    val (cat, cn) = newCat("snapmvm2")
    val fact = (1L to 30L).map(i => (i, i % 5, i * 100)).toDF("k", "dk", "v")
    val dim = (0L to 4L).map(d => (d, s"d$d")).toDF("dk", "name")
    cat.createTable("db", "fact", fact.schema)
    cat.append("db", "fact", fact)
    cat.createTable("db", "dim", dim.schema)
    cat.append("db", "dim", dim)
    cat.createMaterializedView("db", "jmv",
      "SELECT d.name, count(*) AS n, sum(f.v) AS sv " +
        "FROM db.fact f JOIN db.dim d ON f.dk = d.dk GROUP BY d.name")
    cat.append("db", "fact", Seq((31L, 2L, 7777L)).toDF("k", "dk", "v"))
    cat.append("db", "dim", Seq((5L, "d5")).toDF("dk", "name"))
    cat.append("db", "fact", Seq((32L, 5L, 8888L)).toDF("k", "dk", "v"))

    val modes = scala.collection.mutable.ArrayBuffer.empty[String]
    val qs = MvMaintainer.maintain(spark, cat, cn, "db", "jmv",
      onRefresh = (m, _) => modes.synchronized { modes += m })
    assert(qs.length == 2, "one stream per base")
    drain(qs)
    assert(!modes.contains("full"), modes.toString)

    val got = spark.sql(s"SELECT name, n, sv FROM $cn.db.jmv ORDER BY name")
      .as[(String, Long, Long)].collect().toSeq
    val f = cat.readLatest("db", "fact")
    val d = cat.readLatest("db", "dim")
    val want = f.join(d, "dk").groupBy("name")
      .agg(count(lit(1)).as("n"), sum("v").as("sv")).orderBy("name")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("vector index rides the same commit-signal maintenance") {
    import graft.ops.{Similarity, VectorIndex}
    val (cat, cn) = newCat("snapmvm4")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cat.createTable("db", "emb", emb.schema)
    cat.append("db", "emb", emb.where(col("vec_id") % 2 === 0))
    VectorIndex.create(cat, "db", "emb", "vix", "vec_id", "embedding",
      nlist = 8, iters = 2, sampleMod = 3)
    cat.deleteMoR("db", "emb", col("vec_id") % 10 === 0)
    cat.append("db", "emb", emb.where(col("vec_id") % 2 === 1))

    val modes = scala.collection.mutable.ArrayBuffer.empty[String]
    val t0 = VectorIndex.trainingCount
    val q = MvMaintainer.maintainVectorIndex(spark, cat, cn, "db", "vix",
      onRefresh = (m, _) => modes.synchronized { modes += m })
    assert(q.awaitTermination(180000), "index maintainer did not drain")
    assert(modes.contains("incremental") && !modes.contains("full"), modes.toString)
    assert(VectorIndex.trainingCount == t0, "signal-driven refresh must not retrain")
    // drained index state = from-scratch assignment under frozen centroids
    val cents = VectorIndex.centroids(cat, "db", "vix")
    val want = cat.readLatest("db", "emb")
      .select(col("vec_id"),
        Similarity.ivfCell(Similarity.quantize(col("embedding")), cents).as("cell"))
      .as[(Long, Long)].collect().toSet
    val got = cat.readLatest("db", "vix")
      .select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toSet
    assert(got == want)
    // replay finds nothing to do
    val modes2 = scala.collection.mutable.ArrayBuffer.empty[String]
    val q2 = MvMaintainer.maintainVectorIndex(spark, cat, cn, "db", "vix",
      onRefresh = (m, _) => modes2.synchronized { modes2 += m })
    assert(q2.awaitTermination(180000))
    assert(modes2.forall(_ == "fresh"), modes2.toString)
    // a non-index table refuses loudly
    val e = intercept[IllegalArgumentException] {
      MvMaintainer.maintainVectorIndex(spark, cat, cn, "db", "emb")
    }
    assert(e.getMessage.contains("not a vector index"))
  }

  test("durable checkpoint: a restarted maintainer never re-reads the drained tail (r13)") {
    val (cat, cn) = newCat("snapmvm5")
    val df0 = (1L to 20L).map(i => (i, if (i % 2 == 0) "x" else "y", i)).toDF("k", "g", "v")
    cat.createTable("db", "t", df0.schema)
    cat.append("db", "t", df0)
    cat.createMaterializedView("db", "dmv",
      "SELECT g, count(*) AS n FROM db.t GROUP BY g")
    val ckpt = Files.createTempDirectory("graft_mvm_durable_").toString
    cat.setViewProperties("db", "dmv",
      Map(MvMaintainer.PropCheckpoint -> ckpt), Seq.empty)
    cat.append("db", "t", Seq((21L, "x", 21L)).toDF("k", "g", "v"))
    cat.deleteMoR("db", "t", col("k") === 1)

    val modes1 = scala.collection.mutable.ArrayBuffer.empty[String]
    drain(MvMaintainer.maintain(spark, cat, cn, "db", "dmv",
      onRefresh = (m, _) => modes1.synchronized { modes1 += m }))
    assert(modes1.nonEmpty, "first run must drain the backlog")
    assert(Files.list(java.nio.file.Paths.get(ckpt)).count() > 0,
      "checkpoint root must be populated")

    // restart against the SAME checkpoint with nothing new: the stream
    // resumes from recorded offsets — zero batches, zero refresh calls
    // (a temp-dir maintainer would re-read the tail and log 'fresh'es)
    val modes2 = scala.collection.mutable.ArrayBuffer.empty[String]
    drain(MvMaintainer.maintain(spark, cat, cn, "db", "dmv",
      onRefresh = (m, _) => modes2.synchronized { modes2 += m }))
    assert(modes2.isEmpty, s"drained tail was re-read: $modes2")

    // new commits resume exactly where the checkpoint left off
    cat.append("db", "t", Seq((22L, "y", 22L)).toDF("k", "g", "v"))
    val modes3 = scala.collection.mutable.ArrayBuffer.empty[String]
    drain(MvMaintainer.maintain(spark, cat, cn, "db", "dmv",
      onRefresh = (m, _) => modes3.synchronized { modes3 += m }))
    assert(modes3.nonEmpty && !modes3.contains("full"), modes3.toString)
    val got = spark.sql(s"SELECT g, n FROM $cn.db.dmv ORDER BY g")
      .as[(String, Long)].collect().toSeq
    val want = cat.readLatest("db", "t").groupBy("g")
      .agg(count(lit(1)).as("n")).orderBy("g").as[(String, Long)].collect().toSeq
    assert(got == want)
  }

  test("refuses a plain (non-materialized) view") {
    val (cat, cn) = newCat("snapmvm3")
    val df0 = Seq((1L, "a")).toDF("k", "g")
    cat.createTable("db", "t", df0.schema)
    cat.append("db", "t", df0)
    cat.createView("db", "pv", s"SELECT k FROM $cn.db.t")
    val e = intercept[IllegalArgumentException] {
      MvMaintainer.maintain(spark, cat, cn, "db", "pv")
    }
    assert(e.getMessage.contains("not a materialized view"))
  }

  test("text index rides the same commit-signal maintenance (r13)") {
    import graft.ops.{Retrieval, TextIndex}
    val (cat, cn) = newCat("snapmvm6")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    cat.createTable("db", "docs", docs.schema)
    cat.append("db", "docs", docs.where(col("doc_id") % 2 === 0))
    TextIndex.create(cat, "db", "docs", "tix", "doc_id", "text", nbuckets = 16)
    cat.deleteMoR("db", "docs", col("doc_id") % 10 === 0)
    cat.append("db", "docs", docs.where(col("doc_id") % 2 === 1))

    val modes = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = MvMaintainer.maintainTextIndex(spark, cat, cn, "db", "tix",
      onRefresh = (m, _) => modes.synchronized { modes += m })
    assert(q.awaitTermination(180000), "index maintainer did not drain")
    assert(modes.contains("incremental") && !modes.contains("full"), modes.toString)
    // drained index serves exactly what the recompute operator scores
    val queries = docs.where(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), substring(col("text"), 1, 48).as("qtext"))
    val got = TextIndex.topK(cat, "db", "tix", queries, "qid", "qtext",
        k = 10, k1 = 1.5, b = 0.75)
      .select("query_id", "doc_id", "score_q", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = Retrieval.bm25TopK(cat.readLatest("db", "docs"), "doc_id", "text",
        queries, "qid", "qtext", k = 10, k1 = 1.5, b = 0.75)
      .select("query_id", "doc_id", "score_q", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    // replay finds nothing to do; a non-index table refuses loudly
    val modes2 = scala.collection.mutable.ArrayBuffer.empty[String]
    val q2 = MvMaintainer.maintainTextIndex(spark, cat, cn, "db", "tix",
      onRefresh = (m, _) => modes2.synchronized { modes2 += m })
    assert(q2.awaitTermination(180000))
    assert(modes2.forall(_ == "fresh"), modes2.toString)
    val e = intercept[IllegalArgumentException] {
      MvMaintainer.maintainTextIndex(spark, cat, cn, "db", "docs")
    }
    assert(e.getMessage.contains("not a text index"))
  }

  test("dedup index rides the same commit-signal maintenance (r13)") {
    import graft.ops.{Dedup, DedupIndex}
    val (cat, cn) = newCat("snapmvm7")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    cat.createTable("db", "docs", docs.schema)
    cat.append("db", "docs", docs.where(col("doc_id") % 2 === 0))
    DedupIndex.create(cat, "db", "docs", "dix", "doc_id", "text", nbuckets = 16)
    cat.deleteMoR("db", "docs", col("doc_id") % 10 === 0)
    cat.append("db", "docs", docs.where(col("doc_id") % 2 === 1))

    val modes = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = MvMaintainer.maintainDedupIndex(spark, cat, cn, "db", "dix",
      onRefresh = (m, _) => modes.synchronized { modes += m })
    assert(q.awaitTermination(180000), "index maintainer did not drain")
    assert(modes.contains("incremental") && !modes.contains("full"), modes.toString)
    // the drained index's pairs equal the recompute operator on the base
    val got = DedupIndex.pairs(cat, "db", "dix")
      .select("id_a", "id_b", "inter_sz", "union_sz")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = Dedup.minhashVerifiedPairs(cat.readLatest("db", "docs"),
        "doc_id", "text", w = 5, num = 9, den = 10, numHashes = 64, bands = 32)
      .select("id_a", "id_b", "inter_sz", "union_sz")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    val e = intercept[IllegalArgumentException] {
      MvMaintainer.maintainDedupIndex(spark, cat, cn, "db", "docs")
    }
    assert(e.getMessage.contains("not a dedup index"))
  }
}
