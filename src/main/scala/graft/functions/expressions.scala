package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.SalesforceId

/** Static helpers invoked from generated code (must be object-level so the
  * Java codegen can call them via static forwarders).
  */
object ExprUtil {
  def canonicalId(s: UTF8String): UTF8String = {
    if (s == null) return null
    val r = SalesforceId.canonicalOrNull(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Merge-count of common elements between two LEXICOGRAPHICALLY SORTED
    * string arrays — O(n+m), zero allocation, vs array_intersect's
    * per-row hash-set build. Caller must guarantee sorted, distinct input
    * (array_sort(array_distinct(...))).
    */
  def sortedIntersectSize(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    var i = 0; var j = 0; var n = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getUTF8String(i); val y = b.getUTF8String(j)
      val c = x.compareTo(y)
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** Ordered left-fold dot product over two double arrays: acc += a[i]*b[i]
    * for i = 0..n-1 — bit-identical to functions.aggregate(zip_with(a,b,_*_))
    * and to DuckDB's list_reduce over the same element order, but a tight
    * primitive loop instead of per-element interpreted lambda evaluation
    * (HigherOrderFunctions do not participate in codegen, so on a pair-join
    * hot path the HOF form dominates the query cost).
    * Null semantics MATCH the HOF form: a null element on either side, or
    * unequal lengths (zip_with pads with null), yields NULL — not a
    * silently-zeroed term.
    */
  def dotFold(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** 64-bit polynomial rolling hash (base 1000003, seeded) over UTF-8 bytes.
    * Deterministic document fingerprint primitive; stable across JVMs.
    */
  def rollingHash(s: UTF8String): Long = {
    if (s == null) return 0L
    val bytes = s.getBytes
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + bytes(i)
      i += 1
    }
    h
  }

  /** Content-defined chunking (CDC) over a string's UTF-8 bytes — the
    * shift-resistant segmentation used for chunk-level dedup of training
    * corpora: an insertion near the start of a document moves every
    * FIXED-stride chunk boundary after it (so fixed chunking sees all-new
    * chunks), while CDC boundaries are chosen by local content (a rolling
    * window hash hitting 0 mod `div`), so all chunks after the edit
    * realign and dedup still fires.
    *
    * Kernel: O(n) single pass. The w-byte window hash is the polynomial
    * H(p) = Σ b[p-w+j]·B^(w-1-j) mod 2^64 (B = 1000003, unsigned bytes);
    * it rolls by H(p+1) = (H(p) − b[p-w]·B^(w-1))·B + b[p] — one multiply,
    * one subtract, one add per byte, no per-window recompute. A position p
    * (1-based end of the window, w ≤ p ≤ n−1) closes a chunk when
    * H(p) ≡ 0 (mod div); n always closes the last chunk. Each chunk also
    * carries a 64-bit polynomial fingerprint (seeded fold, same family as
    * [[rollingHash]] but over unsigned bytes) so chunk-level dedup joins
    * on a long, never re-shipping chunk text. The DuckDB oracle replays
    * both folds in HUGEINT arithmetic mod 2^64 over the hex-decoded bytes.
    *
    * Returns array<struct<start int, len int, hash long>> (byte offsets);
    * empty array for empty input. All arithmetic is two's-complement
    * wraparound == mod 2^64 on the unsigned reading, so Java longs need no
    * explicit modulus; `div` must be a power of two (masked, not %-ed, to
    * stay correct on the signed representation).
    */
  def cdcChunks(s: UTF8String, w: Int, div: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val B = 1000003L
    var bPow = 1L // B^(w-1) mod 2^64
    var j = 1
    while (j < w) { bPow *= B; j += 1 }
    val mask = (div - 1).toLong
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var start = 0
    def emit(end: Int): Unit = {
      var h = 1125899906842597L
      var i = start
      while (i < end) { h = h * B + (bytes(i) & 0xFF); i += 1 }
      out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](start, end - start, h))
      start = end
    }
    if (n > w) {
      var h = 0L
      var i = 0
      while (i < w) { h = h * B + (bytes(i) & 0xFF); i += 1 }
      // i is now the 1-based end position p of the current window.
      while (i < n) {
        if ((h & mask) == 0L) emit(i)
        h = (h - (bytes(i - w) & 0xFF) * bPow) * B + (bytes(i) & 0xFF)
        i += 1
      }
    }
    emit(n)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Spread the low 31 bits of x so they occupy the even bit positions
    * (the standard mask-shift Morton spreading network).
    */
  def zspread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton/Z-order interleave of the low 31 bits of two longs: a's bits
    * land in the odd positions, b's in the even, so sorting by the result
    * orders rows along the Z space-filling curve over (a, b). Inputs are
    * masked to 31 bits each — the result is ≤62 bits and ALWAYS
    * non-negative, so signed-long ordering equals curve ordering (an
    * unmasked 32nd bit would flip the sign and rotate the curve). Callers
    * pass compact non-negative values (day index, key rank), which is what
    * a clustering key wants anyway.
    */
  def zorder(a: Long, b: Long): Long =
    (zspread(a) << 1) | zspread(b)

  /** Distinct character n-grams (by code point, first-occurrence order) —
    * the tight-loop twin of
    * `array_distinct(transform(sequence(1, len-2), i -> substr(text, i, n)))`,
    * which runs INTERPRETED per element (higher-order functions do not
    * participate in codegen). Returns an empty array when the text is
    * shorter than n, matching DuckDB's empty generate_series.
    */
  def charNgrams(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // ONE forward walk over the UTF-8 bytes with a ring buffer of the
    // last n+1 code-point byte offsets — O(len). A substringSQL(i, n) per
    // position would re-seek from the string start each call: O(len²)
    // per document, which is a real cost on book-length texts.
    val bytes = s.getBytes
    val len = bytes.length
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val offs = new Array[Int](n + 1)
    var cnt = 0
    var i = 0
    while (i < len) {
      offs(cnt % (n + 1)) = i
      // Clamp: a truncated multi-byte sequence at end-of-input must not
      // overshoot the array — the slice below would read past it via
      // Platform unsafe access when hashed/compared.
      i = math.min(i + UTF8String.numBytesForFirstByte(bytes(i)), len)
      cnt += 1
      if (cnt >= n) {
        val start = offs((cnt - n) % (n + 1))
        seen.add(UTF8String.fromBytes(bytes, start, i - start))
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  /** Distinct word w-shingles over a token array: join w consecutive tokens
    * with single spaces; windows are clipped at the end of the array and at
    * least one shingle is emitted (the `sequence(1, greatest(n-w+1, 1))` +
    * `slice` + `concat_ws` shape, de-HOF'd).
    */
  def wordShingles(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = toks.numElements()
    val count = math.max(n - w + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < count) {
      val m = math.min(w, n - i)
      val parts = new Array[UTF8String](m)
      var j = 0
      while (j < m) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 64 bits of md5(s) as a signed long (digest bytes 0..7 big-endian)
    * — bit-identical to the hex-fold form in [[GraftFunctions.md5_64]], one
    * digest call instead of interpreted md5+conv+substring per element.
    */
  def md5Long(s: UTF8String): Long = {
    val d = md5Digest.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (digest(i) & 0xFFL); i += 1 }
    h
  }

  /** md5Long over every element of a string array. */
  def md5LongArray(a: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = md5Long(a.getUTF8String(i)); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** SimHash of a token-hash array: per-bit ±1 votes, bit set iff votes > 0
    * — identical semantics to the aggregate/zip_with HOF fold it replaces,
    * in one allocation-free pass.
    */
  def simhashFold(a: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sh |= (1L << b); b += 1 }
    sh
  }

  /** All MinHash signature slots in ONE pass over the base-hash array:
    * slot p = min over elements of (a(p)·h + c(p)) with two's-complement
    * wraparound, min over SIGNED longs — identical to
    * `array_min(transform(bh, h -> mul_add64(h, a(p), c(p))))` per slot,
    * without 32 interpreted array traversals. Empty input yields all-null
    * slots (array_min of an empty array is null).
    */
  def minhashSigs(bh: org.apache.spark.sql.catalyst.util.ArrayData,
      a: Array[Long], c: Array[Long]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val p = a.length
    val n = bh.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill[Any](p)(null))
    val mins = Array.fill[Long](p)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = bh.getLong(i)
      var j = 0
      while (j < p) {
        val v = a(j) * h + c(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Unicode NFC normalization — the canonicalization multilingual dedup
    * breaks without (é composed vs e + U+0301 decomposed hash apart).
    * Both the JDK's Normalizer and DuckDB's nfc_normalize implement the
    * same Unicode standard, so normalized bytes — and therefore hashes —
    * agree cross-engine (verified: identical md5 for the decomposed
    * probe). Fast path: isNormalized is a scan without allocation, so
    * ASCII/already-NFC corpora pay no copy.
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** All hyperplane band keys of a vector in ONE pass — the codegen twin
    * of d12's per-plane `when(dot_fold(v, plane_b) >= 0, ...)` chain,
    * which pays the HOF setup nBits times per row. Per bit: the SAME
    * left fold as [[dotFold]] (0.0 init, ascending index), so the sign
    * of every dot — and therefore every band key — is bit-identical to
    * the composed form (differential-pinned in ExpressionsSpec). A bit
    * whose dot is undefined (length mismatch, null element) contributes
    * 0, exactly like `when(null >= 0) → otherwise(0)`.
    *
    * `planes` is flattened row-major: planes(bit * dim + i).
    */
  def hyperplaneBands(v: org.apache.spark.sql.catalyst.util.ArrayData,
      planes: Array[Double], dim: Int, bands: Int, rowsPerBand: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val keys = new Array[Long](bands)
    val n = v.numElements()
    val nBits = bands * rowsPerBand
    var bit = 0
    while (bit < nBits) {
      if (n == dim) {
        var acc = 0.0d
        var ok = true
        var i = 0
        while (ok && i < n) {
          if (v.isNullAt(i)) ok = false
          else { acc += v.getDouble(i) * planes(bit * dim + i); i += 1 }
        }
        if (ok && acc >= 0)
          keys(bit / rowsPerBand) |= 1L << (bit % rowsPerBand)
      }
      bit += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(keys)
  }

  /** 64-bucket count histogram of a string array (bucket = hash mod 64).
    * With [[minSum64]] this gives a LOSSLESS upper bound on the size of the
    * intersection of two sets: shared elements land in the same bucket on
    * both sides, so |A∩B| ≤ Σ_b min(histA[b], histB[b]). A set-similarity
    * join screens candidate pairs with that bound (64 int ops) before the
    * O(|A|+|B|) merge-intersect verification.
    */
  def gramHist64(a: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val hist = new Array[Int](64)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      hist(a.getUTF8String(i).hashCode() & 63) += 1
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(hist)
  }

  /** Σ_b min(a[b], b[b]) over two equal-length int arrays. */
  def minSum64(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = a.numElements()
    var s = 0
    var i = 0
    while (i < n) {
      val x = a.getInt(i); val y = b.getInt(i)
      s += (if (x < y) x else y)
      i += 1
    }
    s
  }

  /** Per-frame byte sums of a binary payload: up to `maxFrames` frames of
    * `frameSize` bytes, sum of unsigned byte values per frame — the stub
    * "frame feature" in one tight loop (twin of
    * [[graft.queries.MultimodalOps.sampleFrames]]).
    */
  def frameByteSums(payload: Array[Byte], frameSize: Int, maxFrames: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = payload.length
    val nFrames = math.min(maxFrames, (n + frameSize - 1) / frameSize)
    val out = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      val end = math.min(n, (f + 1) * frameSize)
      var i = f * frameSize
      var sum = 0L
      while (i < end) { sum += payload(i) & 0xFF; i += 1 }
      out(f) = sum
      f += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** All-Pairs/PPJoin prefix of a gram set: order the doc's grams by
    * ascending global document frequency (ties by binary string order —
    * the same total order as ORDER BY df, gram on a string column), keep
    * the first |g| − ceil(t·|g|) + 1. Runs per row against a
    * driver-collected df map, so prefix construction needs NO shuffle at
    * all (vs. a corpus-wide explode + join + window sort).
    */
  def rarePrefix(lang: UTF8String,
      grams: org.apache.spark.sql.catalyst.util.ArrayData,
      df: java.util.Map[String, java.util.HashMap[String, java.lang.Long]],
      tNum: Long, tDen: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = grams.numElements()
    // k = n − ceil(t·n) + 1 in exact integer arithmetic
    val k = (n - ((n * tNum + tDen - 1) / tDen) + 1).toInt
    if (n == 0 || k <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val m = df.get(lang.toString)
    val entries = new Array[(Long, UTF8String)](n)
    var i = 0
    while (i < n) {
      val g = grams.getUTF8String(i)
      val d = if (m == null) Long.MaxValue else {
        val v = m.get(g.toString)
        if (v == null) Long.MaxValue else v.longValue()
      }
      entries(i) = (d, g)
      i += 1
    }
    java.util.Arrays.sort(entries, new java.util.Comparator[(Long, UTF8String)] {
      override def compare(x: (Long, UTF8String), y: (Long, UTF8String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c else x._2.compareTo(y._2)
      }
    })
    val out = new Array[Any](math.min(k, n))
    i = 0
    while (i < out.length) { out(i) = entries(i)._2; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Split a string into one-code-point tokens. NOT `split(s, "")`: the
    * regex split works in UTF-16 units and would shear an astral-plane
    * character (emoji, rare CJK) into two lone surrogates — which the
    * oracle's UTF-8 string_split never does and [[bpeEncode]]'s
    * byte-walk never does. All three must tokenize identically or a BPE
    * merge learned on surrogate halves can never apply at encode time.
    */
  def codePoints(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < len) {
      val step = math.min(UTF8String.numBytesForFirstByte(bytes(i)), len - i)
      out.add(UTF8String.fromBytes(bytes, i, step))
      i += step
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  /** One BPE merge over a token array: every left-to-right non-overlapping
    * adjacent (l, r) becomes the fused token l||r — the i+=2 after a match
    * is what makes a run like [a,a,a] merge to [aa,a], matching both the
    * reference trainer semantics and the oracle's sequential replace.
    */
  def bpeMergePair(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      l: UTF8String, r: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = toks.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && l.equals(toks.getUTF8String(i)) &&
          r.equals(toks.getUTF8String(i + 1))) {
        out.add(UTF8String.concat(l, r))
        i += 2
      } else {
        out.add(toks.getUTF8String(i))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  /** Full-document BPE encode against a trained merge list: whitespace
    * pre-tokenization (space/newline/tab, the trainer's word regex), then
    * per word: split to code-point tokens and apply every merge in rank
    * order, each exhaustively left-to-right ([[bpeMergePair]] semantics —
    * rank-SEQUENTIAL application, the documented graft contract; see
    * BpeOps). One pass per merge over short word arrays beats re-exploding
    * the corpus into words: the encode stays a per-row map — no shuffle,
    * no HOF interpretation — which is the shape that matters when the
    * input is 100 TB of documents rather than the Zipf-compressed word
    * table the trainer iterates.
    */
  def bpeEncode(text: UTF8String, lefts: Array[UTF8String],
      rights: Array[UTF8String]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    val out = new java.util.ArrayList[UTF8String]()
    val word = new java.util.ArrayList[UTF8String]()
    val buf = new java.util.ArrayList[UTF8String]()
    def flush(): Unit = {
      if (!word.isEmpty) {
        var m = 0
        while (m < lefts.length) {
          val l = lefts(m); val r = rights(m)
          buf.clear()
          var i = 0
          val n = word.size()
          while (i < n) {
            if (i + 1 < n && l.equals(word.get(i)) && r.equals(word.get(i + 1))) {
              buf.add(UTF8String.concat(l, r)); i += 2
            } else { buf.add(word.get(i)); i += 1 }
          }
          word.clear(); word.addAll(buf)
          m += 1
        }
        out.addAll(word); word.clear()
      }
    }
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if (b == ' ' || b == '\n' || b == '\t') { flush(); i += 1 }
      else {
        // One code point per token; clamp a truncated multi-byte tail the
        // same way charNgrams does.
        val step = math.min(UTF8String.numBytesForFirstByte(b), len - i)
        word.add(UTF8String.fromBytes(bytes, i, step))
        i += step
      }
    }
    flush()
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }
}

/** Canonicalize a Salesforce id column to its 18-char form; invalid → null.
  * Native expression (with codegen) rather than a Scala UDF so it stays
  * inside whole-stage codegen on the hot path.
  */
case class CanonicalId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "canonical_id"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.canonicalId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ExprUtil.canonicalId($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): CanonicalId =
    copy(child = newChild)
}

/** Unicode NFC normalization (see [[ExprUtil.nfcNormalize]]). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** 64-bit rolling hash of a string column (document fingerprinting). */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

/** Wrapping multiply-add mod 2^64: `a * x + c` with Java two's-complement
  * wraparound (the multiply-shift universal hash family used to derive
  * MinHash permutations from one base hash). A dedicated expression
  * because Column arithmetic runs under ANSI mode and throws on the
  * overflow this hash RELIES on; kept codegen'd so the 32-permutation
  * fan-out stays inside whole-stage codegen. The same arithmetic is
  * reproducible in DuckDB as HUGEINT mod-2^64 folds, which is what makes
  * the MinHash/SimHash operators oracle-checkable at all.
  */
case class MulAdd64(child: Expression, a: Long, c: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mul_add64"

  override def nullSafeEval(input: Any): Any =
    a * input.asInstanceOf[Long] + c

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"(${a}L * $x + ${c}L)")

  override protected def withNewChildInternal(newChild: Expression): MulAdd64 =
    copy(child = newChild)
}

/** Morton/Z-order interleave of two long columns (see [[ExprUtil.zorder]]
  * for the bit contract). The clustering-key primitive behind multi-column
  * data skipping: `repartitionByRange(zorder64(a, b)).sortWithinPartitions`
  * writes files whose (a, b) bounding boxes are small in BOTH dimensions,
  * so parquet min–max stats prune a predicate on EITHER column — where a
  * linear sort only ever prunes its leading column. Codegen'd so the key
  * derivation stays inside the write pipeline's WholeStageCodegen.
  */
case class ZOrder64(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder64"

  override def nullSafeEval(a: Any, b: Any): Any =
    ExprUtil.zorder(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ExprUtil.zorder($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

/** Size of the intersection of two sorted, distinct string arrays
  * (set-similarity verification hot path — merge scan instead of
  * array_intersect's hash-set build per row).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    ExprUtil.sortedIntersectSize(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ExprUtil.sortedIntersectSize($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Ordered-fold dot product of two array<double> columns (codegen'd; see
  * [[ExprUtil.dotFold]] for the FP-order contract).
  */
case class DotFold(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_fold"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = ExprUtil.dotFold(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.ExprUtil.dotFold($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

/** Distinct character n-grams of a string column (tight-loop codegen twin
  * of the transform/substr/array_distinct HOF chain).
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.charNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.charNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** Distinct word w-shingles over a token-array column. */
case class WordShingles(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.wordShingles(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.wordShingles($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** md5-derived 64-bit hash of every element of a string array (the
  * MinHash/SimHash base-hash fan-out without an interpreted HOF lambda).
  */
case class Md5LongArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_64_array"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.md5LongArray(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.md5LongArray($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5LongArray =
    copy(child = newChild)
}

/** SimHash fold of a token-hash array (±1 votes per bit, sign bitmap). */
case class SimhashFold(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_fold"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.simhashFold(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.simhashFold($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashFold =
    copy(child = newChild)
}

/** All multiply-shift MinHash slots in one pass over the base hashes. */
case class MinhashSigs(child: Expression, a: Seq[Long], c: Seq[Long])
    extends UnaryExpression {
  @transient private lazy val aArr = a.toArray
  @transient private lazy val cArr = c.toArray

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.minhashSigs(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], aArr, cArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aName = ctx.addReferenceObj("permA", aArr, "long[]")
    val cName = ctx.addReferenceObj("permC", cArr, "long[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.ExprUtil.minhashSigs($x, $aName, $cName)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

/** One-pass hyperplane band keys (see [[ExprUtil.hyperplaneBands]]):
  * array<double> vector → array<long> of `bands` packed sign-bit keys.
  */
case class HyperplaneBands(child: Expression, planes: Seq[Double], dim: Int,
    bands: Int, rowsPerBand: Int) extends UnaryExpression {
  @transient private lazy val planesArr = planes.toArray

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_bands"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.hyperplaneBands(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      planesArr, dim, bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pName = ctx.addReferenceObj("planes", planesArr, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.ExprUtil.hyperplaneBands($x, $pName, $dim, $bands, $rowsPerBand)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

/** 64-bucket count histogram of a string array (intersection upper-bound
  * screen; see [[ExprUtil.gramHist64]]).
  */
case class GramHist64(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_hist64"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.gramHist64(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.gramHist64($c)")

  override protected def withNewChildInternal(newChild: Expression): GramHist64 =
    copy(child = newChild)
}

/** Σ min over two histogram arrays (intersection upper bound). */
case class MinSum64(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "min_sum64"

  override def nullSafeEval(a: Any, b: Any): Any =
    ExprUtil.minSum64(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprUtil.minSum64($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinSum64 =
    copy(left = newLeft, right = newRight)
}

/** Content-defined chunk spans+fingerprints of a string column (see
  * [[ExprUtil.cdcChunks]]). `div` must be a power of two (the boundary
  * test is a mask); construction enforces it so a bad literal fails at
  * plan time, not with silently-wrong chunking at runtime.
  */
case class CdcChunks(child: Expression, windowBytes: Int, div: Int)
    extends UnaryExpression {
  require(div > 0 && (div & (div - 1)) == 0, s"div must be a power of two, got $div")
  require(windowBytes > 0, s"windowBytes must be positive, got $windowBytes")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("start", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("len", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("hash", LongType, nullable = false))),
      containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.cdcChunks(input.asInstanceOf[UTF8String], windowBytes, div)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ExprUtil.cdcChunks($c, $windowBytes, $div)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** Streaming-generator form of [[CdcChunks]]: emits one row per chunk
  * LAZILY instead of materializing an array<struct> per document. Same
  * boundaries, same fingerprints (differential-tested), but single-pass
  * with O(1) memory per row — the shape that matters when documents are
  * large (a 1 GB document's chunk array would otherwise live on the heap
  * in full before the explode). The chunk fingerprint is folded
  * INCREMENTALLY alongside the boundary scan (reset at each cut), so
  * there is no second pass over chunk bytes at all. Enabled for the
  * registered query via `spark.graft.cdc.generator`; Generate planning
  * comes from the analyzer's ExtractGenerator, exactly like explode.
  * CodegenFallback is the norm for custom Generators (Spark's own
  * non-explode generators are fallback too); the kernel cost is the
  * same tight byte loop either way.
  */
case class CdcChunksGen(child: Expression, windowBytes: Int, div: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(div > 0 && (div & (div - 1)) == 0, s"div must be a power of two, got $div")
  require(windowBytes > 0, s"windowBytes must be positive, got $windowBytes")
  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("chunk_idx", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("chunk_start", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("chunk_len", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("chunk_hash", LongType, nullable = false)))
  override def prettyName: String = "cdc_chunks_gen"

  override protected def withNewChildInternal(newChild: Expression): CdcChunksGen =
    copy(child = newChild)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n == 0) return Iterator.empty
    val w = windowBytes
    val B = 1000003L
    var bPow = 1L
    var j = 1
    while (j < w) { bPow *= B; j += 1 }
    val mask = (div - 1).toLong
    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      private var pos = 0            // bytes consumed
      private var start = 0          // current chunk start
      private var idx = 0            // chunk ordinal
      private var winH = 0L          // rolling window hash (valid once pos >= w)
      private var chunkH = 1125899906842597L // incremental chunk fingerprint
      private var done = false
      override def hasNext: Boolean = !done
      override def next(): org.apache.spark.sql.catalyst.InternalRow = {
        // Advance until a boundary fires or input ends; the chunk
        // fingerprint folds in lockstep, so each byte is touched once.
        var boundary = -1
        while (boundary < 0 && pos < n) {
          val b = bytes(pos) & 0xFF
          chunkH = chunkH * B + b
          winH =
            if (pos < w) winH * B + b
            else (winH - (bytes(pos - w) & 0xFF) * bPow) * B + b
          pos += 1
          // A cut fires strictly inside the input (p ∈ [w, n-1]), after
          // at least one full window.
          if (pos >= w && pos < n && (winH & mask) == 0L) boundary = pos
        }
        val end = if (boundary >= 0) boundary else n
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](idx, start, end - start, chunkH))
        idx += 1
        start = end
        chunkH = 1125899906842597L
        if (boundary < 0) done = true
        row
      }
    }
  }
}

/** Per-frame byte sums over a binary column (see [[ExprUtil.frameByteSums]]). */
case class FrameByteSums(child: Expression, frameSize: Int, maxFrames: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "frame_byte_sums"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.frameByteSums(input.asInstanceOf[Array[Byte]], frameSize, maxFrames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ExprUtil.frameByteSums($c, $frameSize, $maxFrames)")

  override protected def withNewChildInternal(newChild: Expression): FrameByteSums =
    copy(child = newChild)
}

/** Per-row All-Pairs/PPJoin prefix (see [[ExprUtil.rarePrefix]]). The df
  * map is a plain task-closure reference: the char-n-gram vocabulary is
  * bounded by |charset|^n, not corpus size, so the map stays small at any
  * corpus scale (the caller enforces a row cap and falls back to the
  * distributed window path beyond it).
  */
case class RarePrefixExpr(left: Expression, right: Expression,
    df: java.util.HashMap[String, java.util.HashMap[String, java.lang.Long]],
    tNum: Long, tDen: Long)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rare_prefix"

  override def nullSafeEval(l: Any, g: Any): Any =
    ExprUtil.rarePrefix(l.asInstanceOf[UTF8String],
      g.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], df, tNum, tDen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("dfMap", df, "java.util.HashMap")
    defineCodeGen(ctx, ev, (l, g) =>
      s"graft.functions.ExprUtil.rarePrefix($l, $g, $mapRef, ${tNum}L, ${tDen}L)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RarePrefixExpr =
    copy(left = newLeft, right = newRight)
}

/** Code-point tokenization of a string column ([[ExprUtil.codePoints]]). */
case class CodePoints(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "code_points"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.codePoints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.ExprUtil.codePoints($x)")

  override protected def withNewChildInternal(newChild: Expression): CodePoints =
    copy(child = newChild)
}

/** One BPE merge (rank step) over a token-array column — the trainer's
  * apply-merge map ([[ExprUtil.bpeMergePair]]).
  */
case class BpeMergePair(child: Expression, l: String, r: String)
    extends UnaryExpression {
  @transient private lazy val lU = UTF8String.fromString(l)
  @transient private lazy val rU = UTF8String.fromString(r)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_merge_pair"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.bpeMergePair(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], lU, rU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeL", lU, "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("bpeR", rU, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.ExprUtil.bpeMergePair($x, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)
}

/** Full-document BPE encode against a trained merge list
  * ([[ExprUtil.bpeEncode]]): one codegen'd per-row map — the 100 TB apply
  * path, with the merge table riding along as a broadcast-sized reference
  * object instead of a join.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val lefts =
    merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val rights =
    merges.map(m => UTF8String.fromString(m._2)).toArray

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.bpeEncode(input.asInstanceOf[UTF8String], lefts, rights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLefts", lefts,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val rRef = ctx.addReferenceObj("bpeRights", rights,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.ExprUtil.bpeEncode($x, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** Column-level entry points for graft's custom functions. */
object GraftFunctions {
  import org.apache.spark.sql.functions._

  def canonical_id(c: Column): Column =
    GraftSqlShim.column(CanonicalId(GraftSqlShim.expression(c)))

  def code_points(c: Column): Column =
    GraftSqlShim.column(CodePoints(GraftSqlShim.expression(c)))

  def bpe_merge_pair(toks: Column, l: String, r: String): Column =
    GraftSqlShim.column(BpeMergePair(GraftSqlShim.expression(toks), l, r))

  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlShim.column(BpeEncode(GraftSqlShim.expression(text), merges))

  def cdc_chunks(c: Column, windowBytes: Int = 8, div: Int = 32): Column =
    GraftSqlShim.column(CdcChunks(GraftSqlShim.expression(c), windowBytes, div))

  def cdc_chunks_gen(c: Column, windowBytes: Int = 8, div: Int = 32): Column =
    GraftSqlShim.column(CdcChunksGen(GraftSqlShim.expression(c), windowBytes, div))

  def rolling_hash64(c: Column): Column =
    GraftSqlShim.column(RollingHash64(GraftSqlShim.expression(c)))

  /** Wrapping `a * x + c` mod 2^64 over a long column (ANSI-safe). */
  def mul_add64(x: Column, a: Long, c: Long): Column =
    GraftSqlShim.column(MulAdd64(GraftSqlShim.expression(x), a, c))

  /** First 64 bits of md5(c) as a signed long — the avalanche-quality
    * string hash used by the MinHash/SimHash family. Built purely from
    * codegen'd built-ins: two 32-bit hex chunks (conv stays under 2^32,
    * so the ANSI cast cannot overflow) recombined with shift/or (bitwise,
    * wrap-safe). Reproducible in DuckDB as a hex-digit fold over md5(·).
    */
  def md5_64(c: Column): Column = {
    val h = md5(c)
    shiftleft(conv(substring(h, 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(h, 9, 8), 16, 10).cast("long"))
  }

  /** Distinct character n-grams by code point (codegen'd). */
  def char_ngrams(c: Column, n: Int): Column =
    GraftSqlShim.column(CharNgrams(GraftSqlShim.expression(c), n))

  /** Distinct word w-shingles over a token-array column (codegen'd). */
  def word_shingles(toks: Column, w: Int): Column =
    GraftSqlShim.column(WordShingles(GraftSqlShim.expression(toks), w))

  /** [[md5_64]] applied to every element of a string-array column in one
    * tight digest loop (bit-identical values). */
  def md5_64_array(c: Column): Column =
    GraftSqlShim.column(Md5LongArray(GraftSqlShim.expression(c)))

  /** SimHash sign-bitmap of a token-hash array column. */
  def simhash_fold(c: Column): Column =
    GraftSqlShim.column(SimhashFold(GraftSqlShim.expression(c)))

  /** All multiply-shift MinHash signature slots in one pass. */
  def minhash_sigs(bh: Column, a: Seq[Long], c: Seq[Long]): Column =
    GraftSqlShim.column(MinhashSigs(GraftSqlShim.expression(bh), a, c))

  /** 64-bucket count histogram of a string-array column. */
  def gram_hist64(c: Column): Column =
    GraftSqlShim.column(GramHist64(GraftSqlShim.expression(c)))

  /** Σ min of two histogram columns — intersection-size upper bound. */
  def min_sum64(a: Column, b: Column): Column =
    GraftSqlShim.column(MinSum64(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** Per-frame byte sums of a binary column (≤8 frames of 256 bytes). */
  def frame_byte_sums(payload: Column, frameSize: Int = 256, maxFrames: Int = 8): Column =
    GraftSqlShim.column(FrameByteSums(
      GraftSqlShim.expression(payload), frameSize, maxFrames))

  /** Per-row PPJoin prefix slice against a driver-collected df map. */
  def rare_prefix(lang: Column, grams: Column,
      df: java.util.HashMap[String, java.util.HashMap[String, java.lang.Long]],
      tNum: Long, tDen: Long): Column =
    GraftSqlShim.column(RarePrefixExpr(
      GraftSqlShim.expression(lang), GraftSqlShim.expression(grams), df, tNum, tDen))

  /** Morton/Z-order interleave of two long columns — the multi-column
    * clustering key (see [[ZOrder64]]). Integral inputs are cast to long
    * here; the expression itself takes longs.
    */
  def zorder64(a: Column, b: Column): Column =
    GraftSqlShim.column(ZOrder64(
      GraftSqlShim.expression(a.cast("long")),
      GraftSqlShim.expression(b.cast("long"))))

  /** Requires both arrays sorted + distinct. */
  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftSqlShim.column(SortedIntersectSize(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** Ordered-fold dot product of two array<double> columns — same FP
    * result as aggregate(zip_with(a, b, _*_), 0.0, _+_), but codegen'd.
    * Requires equal lengths and no null elements.
    */
  def dot_fold(a: Column, b: Column): Column =
    GraftSqlShim.column(DotFold(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** Unicode NFC normalization (multilingual canonicalization). */
  def nfc_normalize(c: Column): Column =
    GraftSqlShim.column(NfcNormalize(GraftSqlShim.expression(c)))

  /** One-pass packed hyperplane band keys (d12's banding hot path). */
  def hyperplane_bands(v: Column, planes: Seq[Double], dim: Int,
      bands: Int, rowsPerBand: Int): Column =
    GraftSqlShim.column(HyperplaneBands(
      GraftSqlShim.expression(v), planes, dim, bands, rowsPerBand))

  /** 3-char key prefix used for polymorphic-lookup dispatch (SURVEY J5/T8). */
  def key_prefix(c: Column): Column = substring(c, 1, 3)

  /** Boolean-synonym coercion (reference primitivize, amaxa/amaxa.py:349-375):
    * null / {no,n,false,f,0,""} → false; {yes,y,true,t,1} → true;
    * anything else is a row error and yields null here (pair with
    * [[primitivizeBoolError]] for the error channel).
    */
  def primitivizeBool(c: Column): Column = {
    val l = lower(c)
    when(c.isNull || l.isin("no", "n", "false", "f", "0", ""), lit(false))
      .when(l.isin("yes", "y", "true", "t", "1"), lit(true))
      .otherwise(lit(null).cast("boolean"))
  }

  /** Error message column for values primitivizeBool rejects (else null). */
  def primitivizeBoolError(c: Column): Column = {
    val l = lower(c)
    when(
      c.isNotNull &&
        !l.isin("no", "n", "false", "f", "0", "", "yes", "y", "true", "t", "1"),
      concat(lit("Invalid Boolean value "), c))
      .otherwise(lit(null).cast("string"))
  }

  /** Cosine similarity between two array<double> columns, computed with
    * codegen'd higher-order functions (no UDF): dot / (|a|*|b|).
    * Deterministic left-to-right accumulation (functions.aggregate folds
    * in element order), so results are bit-stable across runs/engines that
    * fold in the same order.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x * x))
    // Zero-norm guard: ANSI mode makes 0/0 a DIVIDE_BY_ZERO error, not
    // NaN — an all-zero vector must yield null (excluded by thresholds),
    // not abort the query.
    val den = na * nb
    when(den === 0.0d, lit(null).cast("double")).otherwise(dot / den)
  }
}
