package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityFiltersSpec extends SparkSpec {
  import spark.implicits._

  // Thresholds chosen so each rule is independently reachable with tiny
  // crafted docs: minTokens=4, mean length window [2.0, 4.0], long
  // tokens are >= 6 chars capped at 25%, and 1 stopword suffices.
  private val th = QualityFilters.Thresholds(
    minTokens = 4, meanTokLenLo = 2.0, meanTokLenHi = 4.0,
    longTokLen = 6, maxLongFrac = 0.25, minStopwords = 1)

  private def run(docs: Seq[(Long, String)]) =
    QualityFilters.c4Filter(docs.toDF("doc_id", "text"), "doc_id", "text", th)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(5), r.getString(6))).toMap

  test("each rule fires on its own violation and kept docs pass") {
    val got = run(Seq(
      1L -> "the cat sat mat",                    // 4 tokens, mean 3.25, ok
      2L -> "a bc",                               // too short
      3L -> "the aa bb cc dd e f g h i j",        // mean len < 2.0
      4L -> "the abcdef fedcba a b c",            // long-token frac > 25%
      5L -> "cat sat mat rat"))                   // no stopword
    assert(got(1L) == ((1, "kept")))
    assert(got(2L) == ((0, "too_short")))
    assert(got(3L) == ((0, "word_len")))
    assert(got(4L) == ((0, "long_token_frac")))
    assert(got(5L) == ((0, "no_stopwords")))
  }

  test("priority order: the first failing rule wins") {
    // Fails too_short AND no_stopwords -> reports too_short.
    val got = run(Seq(10L -> "cat sat"))
    assert(got(10L)._2 == "too_short")
  }

  test("metrics are reported for kept and rejected docs alike") {
    val rows = QualityFilters.c4Filter(
        Seq(1L -> "the cat sat mat").toDF("doc_id", "text"),
        "doc_id", "text", th)
      .collect()
    val r = rows.head
    assert(r.getLong(1) == 4L)                 // n_tokens
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-9) // mean_tok_len
    assert(r.getLong(4) == 1L)                 // n_stopwords ("the")
  }
}
