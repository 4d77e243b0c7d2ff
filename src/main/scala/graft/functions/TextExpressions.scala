package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-dedup hash kernels.
  *
  * The HOF formulation (`transform(sequence(...), i => substr...)` then
  * `ascii(substring(...))` per character) evaluates interpreted — one
  * boxed lambda call per shingle position plus a `UTF8String` copy per
  * shingle — and that scan-side loop dominates the dedup tiers' cost
  * (profiled: ~3.5s to shingle-hash a 1.5 MB corpus on 32 cores). These
  * expressions compute the same integers in one tight primitive pass per
  * row, participate in whole-stage codegen, and allocate nothing but the
  * output array. At 100 TB the shingle kernel IS the dedup scan, so this
  * is the difference between a CPU-bound scan and a wire-speed one.
  *
  * Arithmetic parity: identical to `TextOps.hash8` over
  * `TextOps.charShingles` / `TextOps.wordShingles` + `rpad` (same Pow31
  * weights, same single mod), verified by property specs; the DuckDB
  * oracle mirrors are unchanged.
  */
object GraftTextKernels {
  val P: Long = 2147483647L

  /** 31^(w-1) .. 31^0 weights; w ≤ 8 so terms stay far below 2^63. */
  private def weights(w: Int): Array[Long] = {
    val a = new Array[Long](w)
    var i = w - 1
    var acc = 1L
    while (i >= 0) { a(i) = acc; acc *= 31L; i -= 1 }
    a
  }
  private val W8 = weights(8)

  /** Code points of `s` — byte fast path for pure-ASCII strings. */
  private def codePoints(s: UTF8String): Array[Int] = {
    val nb = s.numBytes()
    if (nb == s.numChars()) {
      val b = s.getBytes
      val out = new Array[Int](nb)
      var i = 0
      while (i < nb) { out(i) = b(i) & 0xff; i += 1 }
      out
    } else {
      s.toString.codePoints().toArray
    }
  }

  /** All k-char-shingle polynomial hashes of `s`:
    * out(i) = (Σ_j cp(i+j)·31^(k-1-j)) mod 2³¹-1 — exactly
    * `hash8(charShingles(s, k)(i))` for k = 8. */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val cp = codePoints(s)
    val m = cp.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val w = if (k == 8) W8 else weights(k)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h += cp(i + j) * w(j); j += 1 }
      out(i) = h % P
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All word n-grams of a single-space-separated string, as contiguous
    * substrings (char-position slices; `UTF8String.substring` counts
    * code points, matching `wordShingles`' concat of tokens). */
  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val nc = s.numChars()
    if (nc == 0) return new GenericArrayData(Array.empty[Any])
    // token start char-offsets
    var nTok = 1
    var i = 0
    // scan for spaces by code point; use the byte fast path when ASCII
    val cp = codePoints(s)
    while (i < cp.length) { if (cp(i) == ' ') nTok += 1; i += 1 }
    val m = nTok - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < cp.length) {
      if (cp(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = cp.length + 1
    val out = new Array[Any](m)
    var g = 0
    while (g < m) {
      out(g) = s.substring(starts(g), starts(g + n) - 1)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Full-length rolling hash of every word n-gram of the single-space-
    * separated string `s`: h ← (h·31 + cp) mod 2³¹-1 per code point,
    * seed 0 — unlike [[wordNgramHash8]] this hashes EVERY character, so
    * distinct n-grams collide only with p≈2⁻³¹. Mirrored in the oracle
    * by `list_reduce(list_prepend(0, list_transform(range(..), ord)),
    * (h,c) -> (h*31+c) % 2147483647)`. */
  def wordNgramHashFull(s: UTF8String, n: Int): ArrayData = {
    val cp = codePoints(s)
    if (cp.length == 0) return new GenericArrayData(Array.emptyLongArray)
    var nTok = 1
    var i = 0
    while (i < cp.length) { if (cp(i) == ' ') nTok += 1; i += 1 }
    val m = nTok - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nTok + 1)
    var t = 1
    starts(0) = 0
    i = 0
    while (i < cp.length) {
      if (cp(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = cp.length + 1
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      val until = starts(g + n) - 1
      var h = 0L
      var j = starts(g)
      while (j < until) { h = (h * 31L + cp(j)) % P; j += 1 }
      out(g) = h
      g += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash permutation constants `h_j(x) = (a_j·x + b_j) mod P`, 16
    * permutations banded 4×4 (band = j/4, slot = j%4). Source of truth
    * for [[graft.ext.TextDedup.Perms]] (derived from these arrays) and
    * the oracle CTE generator — one place to change, no drift. */
  val MinhashA: Array[Long] = Array(
    1000003L, 1000033L, 1000037L, 1000039L, 1000081L, 1000099L, 1000117L,
    1000121L, 1000133L, 1000151L, 1000159L, 1000171L, 1000183L, 1000187L,
    1000193L, 1000199L)
  val MinhashB: Array[Long] = Array(
    12345L, 54321L, 7777L, 3333L, 999L, 111L, 2025L, 4242L, 8888L, 606L,
    909L, 13579L, 24680L, 97531L, 86420L, 55555L)
  /** 31^slot weights for band-hash assembly. */
  private val BandW: Array[Long] = Array(1L, 31L, 961L, 29791L)

  /** The 4 MinHash band hashes of `s` in ONE pass: every k-char shingle
    * hash feeds 16 running minima `min_j (a_j·hv + b_j) mod P`; band b's
    * hash is `Σ_slot min_{4b+slot}·31^slot`. Value-identical to the
    * explode → groupBy(16 × min) formulation ([[graft.ext.TextDedup
    * .minhashBandsFromIndex]], pinned by a parity spec) — min over
    * duplicate shingle occurrences equals min over the distinct set, so
    * skipping the distinct is exact, and computing the signature at the
    * scan removes the corpus-wide (doc, shingle-hash) shuffle entirely.
    * Returns an EMPTY array when the text has no k-shingle (matching the
    * aggregation form, where such docs produce no group). */
  def minhashBandHashes(s: UTF8String, k: Int): ArrayData = {
    val cp = codePoints(s)
    val m = cp.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val w = if (k == 8) W8 else weights(k)
    val mins = Array.fill(16)(Long.MaxValue)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h += cp(i + j) * w(j); j += 1 }
      val hv = h % P
      j = 0
      while (j < 16) {
        val v = (hv * MinhashA(j) + MinhashB(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](4)
    var b = 0
    while (b < 4) {
      out(b) = mins(4 * b) * BandW(0) + mins(4 * b + 1) * BandW(1) +
        mins(4 * b + 2) * BandW(2) + mins(4 * b + 3) * BandW(3)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash over word n-gram features in ONE pass: per n-gram,
    * `hash8(rpad(ngram, 8, ' '))` (identical to [[wordNgramHash8]]) votes
    * ±1 on each of 32 bit positions — one vote per OCCURRENCE, matching
    * the explode → groupBy(32 × conditional sum) formulation
    * ([[graft.ext.TextDedup.simhashFingerprintsAgg]], parity-specced) and
    * the oracle's non-distinct feature CTE. Bit b is set iff its vote sum
    * is strictly positive. Returns -1 when the text has fewer than n
    * tokens (the aggregation form emits no group for such docs; fp is
    * otherwise in [0, 2³²) so the sentinel is unambiguous). */
  def simhash32(s: UTF8String, n: Int): Long = {
    val cp = codePoints(s)
    var nTok = if (cp.length == 0) 0 else 1
    var i = 0
    while (i < cp.length) { if (cp(i) == ' ') nTok += 1; i += 1 }
    val m = nTok - n + 1
    if (m <= 0 || cp.length == 0) return -1L
    val starts = new Array[Int](nTok + 1)
    var t = 1
    starts(0) = 0
    i = 0
    while (i < cp.length) {
      if (cp(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = cp.length + 1
    val votes = new Array[Int](32)
    var g = 0
    while (g < m) {
      val from = starts(g)
      val until = starts(g + n) - 1
      var h = 0L
      var j = 0
      while (j < 8) {
        val c = if (from + j < until) cp(from + j) else ' '.toInt
        h += c * W8(j)
        j += 1
      }
      val hv = h % P
      var b = 0
      while (b < 32) {
        if (((hv >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      g += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Shingle SET hash in ONE pass: `[fingerprint, n_shingles]` where
    * fingerprint = (Σ distinct k-shingle hashes) mod P — the
    * order-independent set-hash of [[shingleHashes]] ∘ distinct ∘ sum,
    * without materializing the hash array or running the interpreted
    * `array_distinct`/`aggregate` HOFs per row. `[0, 0]` when the text
    * has no k-shingle. */
  def shingleSetHash(s: UTF8String, k: Int): ArrayData = {
    val cp = codePoints(s)
    val m = cp.length - k + 1
    if (m <= 0) return new GenericArrayData(Array[Long](0L, 0L))
    val w = if (k == 8) W8 else weights(k)
    val seen = new java.util.HashSet[Long](m * 2)
    var sum = 0L
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h += cp(i + j) * w(j); j += 1 }
      val hv = h % P
      if (seen.add(hv)) sum += hv
      i += 1
    }
    new GenericArrayData(Array[Long](sum % P, seen.size.toLong))
  }

  /** Within-document repetition stats in ONE pass:
    * `[n_tokens, n_distinct_tokens, top_token_count, n_bigrams,
    * n_distinct_bigrams]`. Token identity is the full-length 31-Horner
    * rolling hash (exactly [[wordNgramHashFull]] with n = 1; bigrams with
    * n = 2, hashing the joining space too), so the oracle can reproduce
    * the SAME distinct/frequency semantics — including the ~2⁻³¹ hash
    * collisions — by grouping on the same integers. All zeros for empty
    * text (callers exclude empty docs on both engines). */
  def repetitionStats(s: UTF8String): ArrayData = {
    val cp = codePoints(s)
    if (cp.length == 0)
      return new GenericArrayData(Array[Long](0L, 0L, 0L, 0L, 0L))
    var nTok = 1
    var i = 0
    while (i < cp.length) { if (cp(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok + 1)
    var t = 1
    starts(0) = 0
    i = 0
    while (i < cp.length) {
      if (cp(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = cp.length + 1
    def spanHash(from: Int, until: Int): Long = {
      var h = 0L
      var j = from
      while (j < until) { h = (h * 31L + cp(j)) % P; j += 1 }
      h
    }
    val tokCounts = new java.util.HashMap[Long, Int](nTok * 2)
    var top = 0
    var g = 0
    while (g < nTok) {
      val h = spanHash(starts(g), starts(g + 1) - 1)
      val c = tokCounts.merge(h, 1, (a, b) => a + b)
      if (c > top) top = c
      g += 1
    }
    val nBg = nTok - 1
    val bgSeen = new java.util.HashSet[Long](nBg * 2)
    g = 0
    while (g < nBg) {
      bgSeen.add(spanHash(starts(g), starts(g + 2) - 1))
      g += 1
    }
    new GenericArrayData(Array[Long](nTok.toLong, tokCounts.size.toLong,
      top.toLong, nBg.toLong, bgSeen.size.toLong))
  }

  /** Hash of the first 8 chars (space-padded) of every word n-gram of
    * the single-space-separated string `s` — exactly
    * `hash8(rpad(wordShingles(tokens(s), n)(i), 8, ' '))`. */
  def wordNgramHash8(s: UTF8String, n: Int): ArrayData = {
    val cp = codePoints(s)
    // token start offsets (normText guarantees single-space separation)
    var nTok = if (cp.length == 0) 0 else 1
    var i = 0
    while (i < cp.length) { if (cp(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok + 1)
    var t = 1
    starts(0) = 0
    i = 0
    while (i < cp.length) {
      if (cp(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = cp.length + 1 // sentinel: one past a virtual trailing space
    val m = nTok - n + 1
    if (m <= 0 || cp.length == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      // n-gram g spans cp[starts(g) .. starts(g+n)-2] (joined by the
      // single spaces already in cp); hash its first 8 chars, padding
      // with spaces when shorter.
      val from = starts(g)
      val until = starts(g + n) - 1
      var h = 0L
      var j = 0
      while (j < 8) {
        val c = if (from + j < until) cp(from + j) else ' '.toInt
        h += c * W8(j)
        j += 1
      }
      out(g) = h % P
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<string>` of all word n-grams of a single-space-separated
  * string — the codegen'd form of `wordShingles(tokens(s), n)`. Because
  * the input is `normText`-normalized (single spaces, no leading or
  * trailing), every n-gram is a contiguous slice of the input, so the
  * kernel emits substrings of the original bytes with no per-token
  * concatenation. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.wordNgrams(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftTextKernels.wordNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** `array<long>` of all k-char-shingle polynomial hashes of a string —
  * the codegen'd form of `hash8(explode(charShingles(...)))`'s per-row
  * work. */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.shingleHashes(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftTextKernels.shingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `array<long>` of full-length rolling hashes (31-Horner mod 2³¹-1)
  * of every word n-gram — the 8-byte element form of the exact
  * inverted-index tier: n-gram strings never leave the row. */
case class WordNgramHashFull(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_hash_full"

  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.wordNgramHashFull(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftTextKernels.wordNgramHashFull($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashFull =
    copy(child = newChild)
}

/** `array<long>` of `hash8(rpad(ngram, 8, ' '))` for every word n-gram —
  * the codegen'd form of the SimHash feature extraction. */
case class WordNgramHash8(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_hash8"

  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.wordNgramHash8(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftTextKernels.wordNgramHash8($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHash8 =
    copy(child = newChild)
}

/** `array<long>` `[fingerprint, n_shingles]` — the order-independent
  * set-hash of a document's distinct k-char shingles, one pass, no
  * intermediate array. */
case class ShingleSetHash(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_set_hash"

  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.shingleSetHash(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftTextKernels.shingleSetHash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSetHash =
    copy(child = newChild)
}

/** `array<long>` `[n_tokens, n_distinct_tokens, top_token_count,
  * n_bigrams, n_distinct_bigrams]` of a normalized string — the
  * one-pass repetition profile behind Gopher-style repetition filters. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.repetitionStats(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftTextKernels.repetitionStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** `array<long>` of the 4 MinHash band hashes of a string — the whole
  * LSH signature computed at the scan (no shingle explode, no doc-keyed
  * aggregation). Empty array when the text is shorter than k. */
case class MinHashBandHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_hashes"

  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.minhashBandHashes(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftTextKernels.minhashBandHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandHashes =
    copy(child = newChild)
}

/** `long` 32-bit SimHash fingerprint over word n-gram features, computed
  * at the scan (no feature explode, no vote aggregation); -1 sentinel for
  * texts with no n-gram. */
case class SimHash32(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.simhash32(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftTextKernels.simhash32($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object TextKernelOps {
  /** Column form of [[ShingleHashes]]. */
  def shingleHashes(c: Column, k: Int): Column =
    GraftExpressionBridge.column(ShingleHashes(GraftExpressionBridge.expression(c), k))

  /** Column form of [[WordNgramHash8]]. */
  def wordNgramHash8(c: Column, n: Int): Column =
    GraftExpressionBridge.column(WordNgramHash8(GraftExpressionBridge.expression(c), n))

  /** Column form of [[WordNgrams]]. */
  def wordNgrams(c: Column, n: Int): Column =
    GraftExpressionBridge.column(WordNgrams(GraftExpressionBridge.expression(c), n))

  /** Column form of [[WordNgramHashFull]]. */
  def wordNgramHashFull(c: Column, n: Int): Column =
    GraftExpressionBridge.column(WordNgramHashFull(GraftExpressionBridge.expression(c), n))

  /** Column form of [[MinHashBandHashes]]. */
  def minhashBandHashes(c: Column, k: Int): Column =
    GraftExpressionBridge.column(MinHashBandHashes(GraftExpressionBridge.expression(c), k))

  /** Column form of [[SimHash32]]. */
  def simhash32(c: Column, n: Int): Column =
    GraftExpressionBridge.column(SimHash32(GraftExpressionBridge.expression(c), n))

  /** Column form of [[RepetitionStats]]. */
  def repetitionStats(c: Column): Column =
    GraftExpressionBridge.column(RepetitionStats(GraftExpressionBridge.expression(c)))

  /** Column form of [[ShingleSetHash]]. */
  def shingleSetHash(c: Column, k: Int): Column =
    GraftExpressionBridge.column(ShingleSetHash(GraftExpressionBridge.expression(c), k))
}
