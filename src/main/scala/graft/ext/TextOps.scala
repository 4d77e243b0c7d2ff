package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-data-pipeline extension operators
  * (dedup, fingerprinting, quality/langid analysis). The reference has no
  * text surface (SURVEY.md §2.10) — these extend the engine per the
  * BASELINE.json north star.
  *
  * Everything here is a pure Catalyst `Column` expression — no UDFs — so
  * normalization/shingling/hashing fuse with the parquet scan and run
  * partition-parallel at any scale. Hash arithmetic is integer-only
  * (deterministic across engines AND across partition orders), which is
  * what lets the DuckDB oracle reproduce every value bit-for-bit.
  *
  * The shingling/hashing forms below double as the executable REFERENCE
  * of the hash math: the hot paths run the codegen'd kernels in
  * [[graft.functions]], and parity specs pin those kernels to these
  * formulations value-for-value.
  */
object TextOps {

  /** Mersenne prime 2^31-1: modulus for all shingle/token hashes. Products
    * `a*h` stay < 2^62 for a < 2^31, so the arithmetic never overflows a
    * signed 64-bit long. */
  val HashP = 2147483647L

  /** 31^7 .. 31^0 — polynomial rolling-hash weights over 8 code points. */
  val Pow31: Seq[Long] =
    Seq(27512614111L, 887503681L, 28629151L, 923521L, 29791L, 961L, 31L, 1L)

  /** Canonical text normalization: collapse whitespace runs to a single
    * space, trim, lowercase. Mirrored in oracle SQL as
    * `lower(trim(regexp_replace(text,'\s+',' ','g')))`. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of a normalized text (single-space separated, no
    * empties after [[normText]]). */
  def tokens(c: Column): Column = split(c, " ")

  /** Polynomial hash of the first 8 characters of a string (callers
    * guarantee exactly 8 chars via fixed-size shingles or `rpad`):
    * `Σ ord(s[i]) * 31^(7-i) mod (2^31-1)`. Oracle mirror uses
    * `ord(substr(sh,i,1))` with identical constants. */
  def hash8(c: Column): Column = {
    val terms = Pow31.zipWithIndex.map { case (w, i) =>
      ascii(substring(c, i + 1, 1)).cast("long") * lit(w)
    }
    terms.reduce(_ + _) % lit(HashP)
  }

  /** Fixed-width char shingles: array of every k-char substring of `c`
    * (empty when the text is shorter than k). Mirrored by
    * `generate_series(1, length(t)-k+1)` + `substr` in the oracle. */
  def charShingles(c: Column, k: Int): Column =
    when(length(c) >= k,
      transform(sequence(lit(1), length(c) - (k - 1)),
        i => c.substr(i, lit(k))))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles over a token array: space-joined runs of n
    * consecutive tokens (empty when fewer than n tokens). */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
}
