package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-kernel expressions for the dedup hot path.
  *
  * Same rationale as [[MinHashSignature]]: the declarative forms
  * (`array_distinct(transform(sequence(...), i -> array_join(slice(...))))`
  * and a 64-lane `aggregate`/`zip_with` vote fold) run as interpreted
  * per-element lambdas. These kernels do one compiled pass per row.
  * Semantics match the declarative versions exactly (q26's DuckDB oracle
  * still passes against `WordShingles` output).
  */

/** Distinct w-word shingles of a space-separated text. */
case class WordShingles(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = math.max(words.length - (w - 1), 1)
    val seen = mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i < n) {
      val end = math.min(i + w, words.length)
      seen += words.slice(i, end).mkString(" ")
      i += 1
    }
    new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** 64-bit SimHash over space-separated tokens (Charikar): bit j of the
  * result is the sign of the sum over tokens of ±1 votes from bit j of the
  * token's hash.
  *
  * The per-token hash is the first 8 bytes of standard MD5 (bit b = bit
  * (b mod 4) of hex nibble b/4) — chosen over xxhash/murmur because MD5 is
  * byte-identical in every engine, which makes the whole signature — and
  * therefore the hamming-pair OUTPUT — recomputable by the DuckDB oracle.
  * MD5 costs ~100ns/word vs ~5ns for xxhash; simhash candidate generation
  * is shuffle-bound well before that matters. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val votes = new Array[Int](64)
    val md = SimHash64.digest.get()
    var i = 0
    while (i < words.length) {
      md.reset()
      val d = md.digest(words(i).getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        val c = b >> 2 // hex char index 0..15 (even = high nibble)
        val byte = d(c >> 1) & 0xFF
        val nib = if ((c & 1) == 0) (byte >>> 4) & 0xF else byte & 0xF
        if (((nib >> (b & 3)) & 1) == 1) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** Single-pass language-ID kernel: the declarative form (whole-text
  * `lower` + `split` + one `array_intersect` per language + a CASE chain)
  * re-walks the text ~6 times through interpreted array expressions —
  * ~270us/doc observed at sf0.1. This computes the identical decision in
  * one compiled pass: per-language DISTINCT-marker bitmasks (popcount ==
  * `size(array_intersect(distinct_tokens, markers))` because each marker
  * list is itself distinct), CJK char density on the original text, then
  * the same tie-break chain (first language wins, 'und' when all zero,
  * 'zh' only when cjk > 0 — empty text falls through). Byte-identical to
  * the declarative version, so q23's DuckDB oracle (which mirrors the CASE
  * chain in SQL) remains the correctness gate. */
case class LangId(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  @transient private lazy val langs: Array[String] = markers.map(_._1).toArray
  @transient private lazy val words: Array[Array[String]] =
    markers.map(_._2.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    // CJK density over the ORIGINAL text ([0x4e00,0x9fff] is BMP-only, so
    // Java-char iteration == codepoint iteration for the range test; the
    // denominator is codepoints, matching Spark's length())
    val raw = u.toString
    var cjk = 0L
    var ci = 0
    while (ci < raw.length) {
      val ch = raw.charAt(ci)
      if (ch >= 0x4e00 && ch <= 0x9fff) cjk += 1
      ci += 1
    }
    val nchars = u.numChars().toLong
    if (cjk > 0 && cjk * 5L >= nchars) return UTF8String.fromString("zh")

    // same tokenization as split(lower(text), " "): whole-text lowercase
    // (UTF8String semantics), then literal-space split keeping empties
    val toks = u.toLowerCase.toString.split(" ", -1)
    val masks = new Array[Int](langs.length)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      var l = 0
      while (l < langs.length) {
        val ws = words(l)
        var w = 0
        while (w < ws.length) {
          if (ws(w) == tok) masks(l) |= 1 << w
          w += 1
        }
        l += 1
      }
      t += 1
    }
    var best = 0
    var l = 0
    while (l < langs.length) {
      val s = java.lang.Integer.bitCount(masks(l))
      if (s > best) best = s // strict >: FIRST language wins ties
      l += 1
    }
    if (best == 0) return UTF8String.fromString("und")
    l = 0
    while (l < langs.length) {
      if (java.lang.Integer.bitCount(masks(l)) == best)
        return UTF8String.fromString(langs(l))
      l += 1
    }
    UTF8String.fromString("und") // unreachable
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

/** One-pass repetition-gate statistics (Gopher/RefinedWeb quality signals):
  * `struct(n_words, top_word_count, n_bigrams, dup_bigram_count)` over a
  * space-separated text. Replaces two interpreted `aggregate` folds over
  * `array_sort`ed token/bigram arrays (plus the array materializations)
  * with ONE compiled walk and two per-row hash maps — the maps are bounded
  * by the document's own token count, and no token array ever reaches the
  * row buffer. Semantics match the declarative form exactly (empty text
  * splits to [""] like Spark's `split(text, " ")`; `dup_bigram_count`
  * counts every occurrence of bigrams with multiplicity >= 2). */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.{StructField, StructType}
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("top_word_count", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("dup_bigram_count", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val wc = new java.util.HashMap[String, Long]()
    var top = 0L
    var i = 0
    while (i < toks.length) {
      val c = wc.getOrDefault(toks(i), 0L) + 1L
      wc.put(toks(i), c)
      if (c > top) top = c
      i += 1
    }
    val nBigrams = if (toks.length >= 2) (toks.length - 1).toLong else 0L
    var dup = 0L
    if (nBigrams > 0) {
      val bc = new java.util.HashMap[String, Long]()
      i = 0
      while (i < toks.length - 1) {
        val bg = toks(i) + " " + toks(i + 1)
        bc.put(bg, bc.getOrDefault(bg, 0L) + 1L)
        i += 1
      }
      val it = bc.values().iterator()
      while (it.hasNext) {
        val v = it.next()
        if (v > 1L) dup += v
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length.toLong, top, nBigrams, dup))
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** Unicode normalization (java.text.Normalizer): the corpus-cleaning
  * pass that folds visually-identical byte sequences together BEFORE
  * hashing/dedup/tokenization — "e"+COMBINING ACUTE and precomposed "é"
  * must not be two different shingles, two different dedup keys, or two
  * BPE symbol sequences. `form` is NFC/NFD/NFKC/NFKD (NFC default; NFKC
  * additionally folds compatibility forms — ligatures, fullwidth — the
  * aggressive choice for training corpora). Deterministic and
  * engine-portable (Unicode normalization is specified byte-exactly),
  * so the DuckDB oracle replays it with nfc_normalize. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  private val f = java.text.Normalizer.Form.valueOf(form)
  override def dataType: DataType = StringType
  override def prettyName: String = s"${form.toLowerCase}_normalize"
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, f)) input // fast path: no alloc
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Deflate (zlib, fixed level 6) size of the UTF-8 bytes — the
  * compression-ratio quality signal (Gopher/RefinedWeb): boilerplate and
  * machine-generated repetition compress far better than prose, so
  * `byte_length / deflate_size` is a cheap one-pass repetition gate that
  * catches structures n-gram measures miss. The caller computes the
  * ratio (two integers stay oracle-friendly); exact byte counts are
  * zlib-version-dependent, so this signal is spec-gated by ORDERING
  * properties (repetitive < prose < random), never exact-value-compared
  * across engines. */
case class DeflateSize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_size"
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object TextExprs {
  def wordShingles(text: Column, w: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(text), w))

  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column =
    GraftColumnBridge.column(LangId(GraftColumnBridge.expression(text), markers))
  def simhash64(text: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(text)))
  def repetitionStats(text: Column): Column =
    GraftColumnBridge.column(RepetitionStats(GraftColumnBridge.expression(text)))
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    GraftColumnBridge.column(UnicodeNormalize(GraftColumnBridge.expression(text), form))
  def deflateSize(text: Column): Column =
    GraftColumnBridge.column(DeflateSize(GraftColumnBridge.expression(text)))
}
