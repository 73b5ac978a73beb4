package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotCatalog
import graft.ops.{Dedup, DedupIndex}

/** The persistent incremental MinHash near-dup index: pair parity with
  * the recompute operator, churn-only maintenance, the batch-vs-corpus
  * probe against brute-force truth, and the bucket-pruned probe scan. */
class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text")

  private def newCat(): SnapshotCatalog = {
    var tick = 0L
    new SnapshotCatalog(spark, Files.createTempDirectory("graft_dix_").toString,
      clock = () => { tick += 1; Instant.parse("2026-04-01T00:00:00Z").plusSeconds(tick * 60) })
  }

  private type Pair = (Long, Long, Long, Long)

  private def fromIndex(cat: SnapshotCatalog): Set[Pair] =
    DedupIndex.pairs(cat, "dd", "idx")
      .select("id_a", "id_b", "inter_sz", "union_sz")
      .as[Pair].collect().toSet

  private def recomputed(corpus: DataFrame): Set[Pair] =
    Dedup.minhashVerifiedPairs(corpus, "doc_id", "text",
        w = 5, num = 9, den = 10, numHashes = 64, bands = 32)
      .select("id_a", "id_b", "inter_sz", "union_sz")
      .as[Pair].collect().toSet

  /** Brute-force batch-vs-corpus truth: ALL cross pairs at Jaccard >=
    * num/den over w=5 word shingles — no banding, no index. */
  private def bruteAgainst(batch: DataFrame, corpus: DataFrame): Set[Pair] = {
    def sh(f: DataFrame, id: String) = f.select(col("doc_id").as(id),
      Dedup.wordShingles(col("text"), 5).as(s"sh_$id"))
    val inter = size(array_intersect(col("sh_b"), col("sh_c"))).cast("long")
    val union = (size(col("sh_b")) + size(col("sh_c"))).cast("long") - inter
    sh(batch, "b").crossJoin(sh(corpus, "c"))
      .select(col("b"), col("c"), inter.as("i"), union.as("u"))
      .where(col("i") * 10 >= col("u") * 9)
      .as[Pair].collect().toSet
  }

  test("within-corpus pairs equal the recompute operator on the same corpus") {
    val cat = newCat()
    cat.createTable("dd", "base", docs.schema)
    cat.append("dd", "base", docs)
    DedupIndex.create(cat, "dd", "base", "idx", "doc_id", "text", nbuckets = 16)
    val got = fromIndex(cat)
    assert(got.nonEmpty, "fixture corpus must contain near-dup pairs")
    assert(got == recomputed(docs))
    assert(DedupIndex.refresh(cat, "dd", "idx") == ("fresh", 0L))
  }

  test("refresh is incremental under append+delete+update churn, stays exact") {
    val cat = newCat()
    cat.createTable("dd", "base", docs.schema)
    cat.append("dd", "base", docs.where(col("doc_id") % 2 === 0))
    DedupIndex.create(cat, "dd", "base", "idx", "doc_id", "text", nbuckets = 16)
    // churn: kill some ids, rewrite one id's text (its bands must move),
    // ingest the odd half
    cat.deleteMoR("dd", "base", col("doc_id") % 10 === 0)
    cat.updateMoR("dd", "base", col("doc_id") === 2,
      Map("text" -> concat(col("text"), lit(" zq zq zq zq zq zq zq zq"))))
    cat.append("dd", "base", docs.where(col("doc_id") % 2 === 1))
    val (mode, commits) = DedupIndex.refresh(cat, "dd", "idx")
    assert(mode == "incremental", s"expected metadata-path refresh, got $mode")
    assert(commits == 3L)
    assert(fromIndex(cat) == recomputed(cat.readLatest("dd", "base")))
    // the rewritten doc's stored bands match a fresh sketch of its new
    // text (update moved the signature, not just the membership)
    val stored = cat.readLatest("dd", "idx").where(col("doc_id") === 2)
      .select("band_idx", "band_hash").as[(Int, Int)].collect().toSet
    val fresh = Dedup.lshBands(
      cat.readLatest("dd", "base").where(col("doc_id") === 2)
        .select(col("doc_id"), Dedup.wordShingles(col("text"), 5).as("sh"))
        .select(col("doc_id"), Dedup.minhashSignature(col("sh"), 64).as("sig")),
      "doc_id", col("sig"), 32, 2)
      .select("band_idx", "band_hash").as[(Int, Int)].collect().toSet
    assert(stored == fresh, "updated doc's stored bands are stale")
  }

  test("non-enumerable range (rollback) falls back to full, stays exact") {
    val cat = newCat()
    cat.createTable("dd", "base", docs.schema)
    cat.append("dd", "base", docs.where(col("doc_id") % 2 === 0))
    DedupIndex.create(cat, "dd", "base", "idx", "doc_id", "text", nbuckets = 16)
    cat.deleteMoR("dd", "base", col("doc_id") % 6 === 0)
    cat.rollback("dd", "base", toSnapshotId = 2)
    val (mode, _) = DedupIndex.refresh(cat, "dd", "idx")
    assert(mode == "full")
    assert(fromIndex(cat) == recomputed(cat.readLatest("dd", "base")))
  }

  test("pairsAgainst equals brute-force truth, including same-id hits") {
    val cat = newCat()
    val corpus = docs.where(col("doc_id") % 2 === 0)
    // the batch holds the odd docs PLUS one doc the corpus already has
    // under the same id — it must report itself (J = 1)
    val batch = docs.where(col("doc_id") % 2 === 1 || col("doc_id") === 4)
    cat.createTable("dd", "base", docs.schema)
    cat.append("dd", "base", corpus)
    DedupIndex.create(cat, "dd", "base", "idx", "doc_id", "text", nbuckets = 16)
    val got = DedupIndex.pairsAgainst(cat, "dd", "idx", batch, "doc_id", "text")
      .select("batch_id", "corpus_id", "inter_sz", "union_sz")
      .as[Pair].collect().toSet
    val want = bruteAgainst(batch, corpus)
    assert(got == want)
    assert(got.exists { case (b, c, _, _) => b == 4L && c == 4L },
      "a batch doc already present under the same id must report itself")
  }

  test("probe scan reads only the batch's band-hash buckets") {
    val cat = newCat()
    cat.createTable("dd", "base", docs.schema)
    cat.append("dd", "base", docs)
    DedupIndex.create(cat, "dd", "base", "idx", "doc_id", "text", nbuckets = 64)
    // one-doc batch: its 32 band hashes probe at most 32 of 64 buckets
    val one = docs.where(col("doc_id") === 7)
    val probe = DedupIndex.pairsAgainst(cat, "dd", "idx", one, "doc_id", "text")
    val probedFiles = probe.inputFiles.filter(_.contains("bucket=")).toSet
    val all = cat.readLatest("dd", "idx").inputFiles
      .filter(_.contains("bucket=")).toSet
    assert(probedFiles.nonEmpty && probedFiles.size < all.size,
      s"probe must prune buckets: read ${probedFiles.size} of ${all.size}")
  }

  test("large probed sets prune driver-side: no giant IN literal in the plan") {
    val cat = newCat()
    cat.createTable("dd", "base", docs.schema)
    cat.append("dd", "base", docs)
    DedupIndex.create(cat, "dd", "base", "idx", "doc_id", "text", nbuckets = 16)
    val batch = docs.where(col("doc_id") % 2 === 1)
    val inline = DedupIndex.pairsAgainst(cat, "dd", "idx", batch, "doc_id", "text")
    val want = inline.select("batch_id", "corpus_id", "inter_sz", "union_sz")
      .as[Pair].collect().toSet
    val inlineFiles = inline.inputFiles.filter(_.contains("bucket=")).toSet
    spark.conf.set("graft.dedupindex.maxInlineBuckets", "2")
    try {
      val pruned = DedupIndex.pairsAgainst(cat, "dd", "idx", batch, "doc_id", "text")
      val plan = pruned.queryExecution.executedPlan.toString
      assert(!plan.matches("(?s).*bucket#\\d+L? IN \\(.*"),
        s"probed-bucket IN literal leaked into the plan:\n${plan.take(4000)}")
      assert(pruned.inputFiles.filter(_.contains("bucket=")).toSet == inlineFiles,
        "driver-side pruning must read exactly the probed partitions")
      assert(pruned.select("batch_id", "corpus_id", "inter_sz", "union_sz")
        .as[Pair].collect().toSet == want)
    } finally spark.conf.unset("graft.dedupindex.maxInlineBuckets")
  }

  test("an empty batch probes nothing and returns the empty typed frame") {
    val cat = newCat()
    cat.createTable("dd", "base", docs.schema)
    cat.append("dd", "base", docs)
    DedupIndex.create(cat, "dd", "base", "idx", "doc_id", "text", nbuckets = 16)
    val r = DedupIndex.pairsAgainst(cat, "dd", "idx", docs.limit(0), "doc_id", "text")
    assert(r.isEmpty)
    assert(r.schema.fieldNames.toSeq ==
      Seq("batch_id", "corpus_id", "inter_sz", "union_sz"))
  }

  test("scoped pairs(where) equals the unscoped result filtered to scope-touching pairs") {
    val cat = newCat()
    cat.createTable("dd", "base", docs.schema)
    cat.append("dd", "base", docs)
    DedupIndex.create(cat, "dd", "base", "idx", "doc_id", "text", nbuckets = 16)
    val all = fromIndex(cat)
    assert(all.nonEmpty, "fixture corpus must contain near-dup pairs")
    // several scope shapes, including one matching nothing
    val scopes: Seq[(org.apache.spark.sql.Column, Long => Boolean)] = Seq(
      (col("doc_id") % 4 === 0, id => id % 4 == 0),
      (col("doc_id") < 40L, id => id < 40L),
      (col("doc_id") === -1L, _ => false))
    scopes.foreach { case (where, inScope) =>
      val got = DedupIndex.pairs(cat, "dd", "idx", where)
        .select("id_a", "id_b", "inter_sz", "union_sz").as[Pair].collect().toSet
      val want = all.filter(p => inScope(p._1) || inScope(p._2))
      assert(got == want, s"scope $where: ${got.size} vs ${want.size}")
    }
    // non-vacuity: at least one scope saw pairs on both sides of the cut
    assert(all.exists(p => p._1 % 4 == 0 || p._2 % 4 == 0))
    assert(all.exists(p => !(p._1 % 4 == 0 || p._2 % 4 == 0)))
    // the scoped lane reads only the probed buckets' index files, never
    // the whole index (the probe-pruning reuse the scoped form exists
    // for) — witnessed on a finer-bucketed twin where one doc's 32 band
    // hashes cannot cover the 64 directories
    DedupIndex.create(cat, "dd", "base", "idx64", "doc_id", "text", nbuckets = 64)
    val allFiles = cat.readLatest("dd", "idx64").inputFiles.toSet
    val scopedFiles = DedupIndex.pairs(cat, "dd", "idx64", col("doc_id") === 4L)
      .inputFiles.toSet.intersect(allFiles)
    assert(scopedFiles.size < allFiles.size,
      s"scoped probe read ${scopedFiles.size} of ${allFiles.size} index files")
  }

  test("randomized churn battery: stored bands track the base exactly") {
    val cat = newCat()
    cat.createTable("dd", "base", docs.schema)
    cat.append("dd", "base", docs.where(col("doc_id") % 3 === 0))
    DedupIndex.create(cat, "dd", "base", "idx", "doc_id", "text", nbuckets = 16)
    // the index id-keys its repair, so the battery keeps ids UNIQUE (the
    // documented contract): appends re-ingest only currently-dead ids
    var live = docs.where(col("doc_id") % 3 === 0)
      .select("doc_id").as[Long].collect().toSet
    val allIds = docs.select("doc_id").as[Long].collect().toSet
    // full-state parity: the stored (id, band_idx, band_hash) multiset
    // must equal a FRESH sketch of the base as it stands — a stricter
    // invariant than pair parity (any stale/duplicated/lost band fails)
    def assertBandsExact(step: Int): Unit = {
      val stored = cat.readLatest("dd", "idx")
        .groupBy("doc_id", "band_idx", "band_hash").count()
        .as[(Long, Int, Int, Long)].collect().toSet
      val fresh = Dedup.lshBands(
        cat.readLatest("dd", "base")
          .select(col("doc_id"), Dedup.wordShingles(col("text"), 5).as("sh"))
          .select(col("doc_id"), Dedup.minhashSignature(col("sh"), 64).as("sig")),
        "doc_id", col("sig"), 32, 2)
        .groupBy("doc_id", "band_idx", "band_hash").count()
        .as[(Long, Int, Int, Long)].collect().toSet
      assert(stored == fresh, s"stored bands diverged from base at step $step")
    }
    val rnd = new scala.util.Random(11)
    for (step <- 1 to 10) {
      rnd.nextInt(4) match {
        case 0 =>
          val m = 2 + rnd.nextInt(6); val r = rnd.nextInt(m)
          val dead = (allIds -- live).filter(_ % m == r)
          if (dead.nonEmpty) {
            cat.append("dd", "base",
              docs.where(col("doc_id").isin(dead.toSeq: _*)))
            live ++= dead
          }
        case 1 =>
          val m = 2 + rnd.nextInt(6); val r = rnd.nextInt(m)
          cat.deleteMoR("dd", "base", col("doc_id") % m === r)
          live --= live.filter(_ % m == r)
        case 2 =>
          val m = 2 + rnd.nextInt(9); val r = rnd.nextInt(m)
          cat.updateMoR("dd", "base", col("doc_id") % m === r,
            Map("text" -> concat(col("text"), lit(s" churn$step churn$step"))))
        case 3 =>
          // a COMPACTION in the range is row-preserving — the metadata
          // walk sees through it and the refresh must stay incremental
          if (step % 2 == 0) cat.compact("dd", "base", 2)
          val (mode, _) = DedupIndex.refresh(cat, "dd", "idx")
          assert(mode != "full", s"step $step: metadata path must hold, got $mode")
      }
      if (step % 3 == 0) {
        DedupIndex.refresh(cat, "dd", "idx")
        assertBandsExact(step)
      }
    }
    DedupIndex.refresh(cat, "dd", "idx")
    assertBandsExact(99)
    assert(fromIndex(cat) == recomputed(cat.readLatest("dd", "base")))
  }

  test("create is retryable: a failed attempt never strands the name") {
    val cat = newCat()
    cat.createTable("dd", "base", docs.schema)
    cat.append("dd", "base", docs)
    intercept[Exception] { // no such text column: fails after the existence check
      DedupIndex.create(cat, "dd", "base", "idx", "doc_id", "no_such_col")
    }
    assert(!cat.tableExists("dd", "idx"), "failed create must clean up")
    DedupIndex.create(cat, "dd", "base", "idx", "doc_id", "text", nbuckets = 16)
    assert(fromIndex(cat) == recomputed(docs))
  }
}
