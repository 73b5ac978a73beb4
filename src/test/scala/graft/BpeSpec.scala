package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** Distributed BPE vs the hand-computed reference walk of the classic
  * Sennrich corpus (low x5, lower x2, newest x6, widest x3). Pair-count
  * ties break lexicographically, so the whole merge sequence is forced:
  * round 1 ties (e,s)/(s,t)/(t,EOW) at 9 -> (e,s), etc. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w = Bpe.Eow

  private def corpus = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // spread across docs to prove counts aggregate across rows
    words.grouped(4).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
  }

  test("train reproduces the reference merge sequence with lexicographic ties") {
    val (merges, dict) = Bpe.train(corpus, "text", numMerges = 5)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", w), ("l", "o"), ("lo", "w")),
      merges.toString)
    val syms = dict.select("w", "syms").as[(String, Seq[String])].collect().toMap
    assert(syms("low") == Seq("low", w))
    assert(syms("lower") == Seq("low", "e", "r", w))
    assert(syms("newest") == Seq("n", "e", "w", "est" + w))
    assert(syms("widest") == Seq("w", "i", "d", "est" + w))
    dict.unpersist()
  }

  test("train stops early when no pair reaches minFreq") {
    val (merges, dict) = Bpe.train(
      Seq((1L, "ab cd")).toDF("doc_id", "text"), "text", numMerges = 10)
    assert(merges.isEmpty, s"all pairs are singletons: $merges")
    dict.unpersist()
  }

  test("tokenCounts: dictionary words join, NOVEL words get the merges applied") {
    val (merges, dict) = Bpe.train(corpus, "text", numMerges = 5)
    // "lowest" never appeared in training; the merge walk gives
    // l o w e s t EOW -> ... -> [low, estEOW], 2 tokens
    val docs = Seq((1L, "low lower newest lowest"), (2L, "widest widest"))
      .toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, "doc_id", "text", merges, dict)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 4L, 2L + 4L + 4L + 2L), (2L, 2L, 8L)), got.toString)

    val enc = Bpe.encode(docs, "doc_id", "text", merges, dict)
      .as[(Long, Seq[String])].collect().toMap
    assert(enc(1L) == Seq("low", w, "low", "e", "r", w,
      "n", "e", "w", "est" + w, "low", "est" + w), enc(1L).toString)
    dict.unpersist()
  }

  test("greedy left-to-right merge matches the reference on overlaps") {
    val df = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    val syms = Bpe.applyMerges(
      Bpe.wordTable(df, "text"), Seq(("a", "a")))
      .select("w", "syms").as[(String, Seq[String])].collect().toMap
    assert(syms("aaa") == Seq("aa", "a", w))
    assert(syms("aaaa") == Seq("aa", "aa", w))
  }

  test("merge cache: identical provable corpus retrains zero times; sidecar survives a fresh driver") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpec_").toString
    corpus.write.mode("overwrite").parquet(s"$dir/corpus.parquet")
    val docs = spark.read.parquet(s"$dir/corpus.parquet").where(col("doc_id") >= 0)
    spark.conf.set("spark.graft.bpe.mergesDir", s"$dir/sidecar")
    try {
      Bpe.clearMergeCache()
      val t0 = Bpe.bpeTrainings
      val (m1, d1) = Bpe.train(docs, "text", numMerges = 5)
      assert(Bpe.bpeTrainings == t0 + 1)
      d1.unpersist()
      // same provable identity + params: zero new trainings, same merges,
      // dictionary rebuilt equal
      val (m2, d2) = Bpe.train(docs, "text", numMerges = 5)
      assert(Bpe.bpeTrainings == t0 + 1, "cache hit must not retrain")
      assert(m2 == m1)
      assert(d2.select("w", "syms").as[(String, Seq[String])].collect().toMap ==
        Bpe.train(corpus, "text", numMerges = 5)._2
          .select("w", "syms").as[(String, Seq[String])].collect().toMap)
      d2.unpersist()
      // DIFFERENT filter => different identity => retrains
      Bpe.train(spark.read.parquet(s"$dir/corpus.parquet").where(col("doc_id") >= 1),
        "text", numMerges = 5)._2.unpersist()
      assert(Bpe.bpeTrainings == t0 + 3, // +1 for the local-corpus train above
        s"distinct filtered corpus must retrain, got ${Bpe.bpeTrainings - t0}")
      // content-TRANSFORMING projection with the SAME column name: a
      // derived corpus (think normalize(text).as("text")) must NEVER
      // serve the raw corpus's merges — its identity is unprovable
      Bpe.train(docs.select(col("doc_id"), upper(col("text")).as("text")),
        "text", numMerges = 5)._2.unpersist()
      assert(Bpe.bpeTrainings == t0 + 4,
        "content-transforming projection must retrain, not hit the raw corpus's cache")
      // a bare RENAME is also content-identity-breaking for the key
      // (a later filter's name-normalized text would mis-bind): retrain
      Bpe.train(docs.select(col("doc_id"), col("text").as("body")),
        "body", numMerges = 5)._2.unpersist()
      assert(Bpe.bpeTrainings == t0 + 5, "renamed column must retrain")
      // pure column pruning/reorder preserves content: still a cache hit
      Bpe.train(docs.select("text", "doc_id"), "text", numMerges = 5)._2.unpersist()
      assert(Bpe.bpeTrainings == t0 + 5, "column pruning/reorder must still hit")
      // fresh driver simulation: memory tier dropped, sidecar serves
      Bpe.clearMergeCache()
      val (m3, d3) = Bpe.train(docs, "text", numMerges = 5)
      assert(Bpe.bpeTrainings == t0 + 5, "sidecar must serve a fresh driver")
      assert(m3 == m1)
      d3.unpersist()
    } finally spark.conf.unset("spark.graft.bpe.mergesDir")
  }
}
