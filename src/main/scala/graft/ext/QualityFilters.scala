package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Parity

/** Rule-based corpus quality filtering — the C4/Gopher document-filter
  * shape (Raffel et al. 2020 §2.2, Rae et al. 2021 §A1.1): a cascade of
  * cheap per-document rules, each with a named reject reason, applied in
  * a fixed priority order so every rejected document reports the FIRST
  * rule it failed. Beyond the reference (which has no text pipeline);
  * the thresholds are parameters — the defaults are calibrated so every
  * rule fires somewhere on the driver corpus, keeping the whole cascade
  * oracle-testable rather than green-by-vacuity.
  *
  * Scale posture: every rule is a higher-order function over the one
  * split-token array — the entire cascade is a single per-row projection
  * fused with the scan. Zero shuffles, zero joins, no per-doc state
  * beyond the row; at 100 TB this runs at scan speed on any executor
  * count, which is exactly why production corpus filters are built this
  * shape.
  */
object QualityFilters {
  import TextOps._

  /** Filter thresholds. `minTokens`: C4's short-document rule.
    * `meanTokLen` bounds: Gopher's mean-word-length window.
    * `maxLongFrac`: Gopher's long-word-fraction rule (tokens with
    * `longTokLen`+ chars). `minStopwords`: C4's stopword-evidence rule. */
  final case class Thresholds(minTokens: Int = 50,
                              meanTokLenLo: Double = 4.2,
                              meanTokLenHi: Double = 4.8,
                              longTokLen: Int = 7,
                              maxLongFrac: Double = 0.06,
                              minStopwords: Int = 2)

  /** Apply the rule cascade: per-doc metrics, a 0/1 `keep` gate, and the
    * first-failing-rule name in `reject_reason` ('kept' when none fire).
    * Ratio comparisons run on UNROUNDED IEEE doubles (exact integer
    * division is bit-identical across engines); the reported metrics are
    * rounded for the cross-engine hash only. */
  def c4Filter(docs: DataFrame, idCol: String, textCol: String,
               th: Thresholds = Thresholds(),
               carry: Seq[String] = Nil): DataFrame = {
    val toks = tokens(normText(col(textCol)))
    val nTokens = size(toks).cast("long")
    val tokChars = aggregate(toks, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val meanLen = tokChars.cast("double") / nTokens
    val nLong = size(filter(toks, w => length(w) >= th.longTokLen)).cast("long")
    val longFrac = nLong.cast("double") / nTokens
    val nStop = size(filter(toks, w => w.isInCollection(TextAnalysis.Stopwords)))
      .cast("long")

    val rTooShort = nTokens < th.minTokens
    val rWordLen = meanLen < th.meanTokLenLo || meanLen > th.meanTokLenHi
    val rLongFrac = longFrac > th.maxLongFrac
    val rStop = nStop < th.minStopwords

    val reason = when(rTooShort, "too_short")
      .when(rWordLen, "word_len")
      .when(rLongFrac, "long_token_frac")
      .when(rStop, "no_stopwords")
      .otherwise("kept")

    docs.select(col(idCol) +: carry.map(col) :+
      nTokens.as("n_tokens") :+
      Parity.r4(meanLen).as("mean_tok_len") :+
      Parity.r4(longFrac).as("long_frac") :+
      nStop.as("n_stopwords") :+
      when(reason === "kept", 1).otherwise(0).as("keep") :+
      reason.as("reject_reason"): _*)
  }
}
