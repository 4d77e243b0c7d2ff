package graft.ext

import graft.SparkSpec

class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(texts: (Long, String)*) =
    TextClean.piiScrub(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getString(4))).toMap

  test("emails, urls and phones are redacted with typed placeholders") {
    val got = scrub(
      1L -> "write to jane.doe+spam@corp.example.org for details",
      2L -> "docs at https://spark.apache.org/docs/latest today",
      3L -> "call 02-555-1234 or 010-1234-5678 now",
      4L -> "clean text with no pii at all")
    assert(got(1L) == ((1L, 0L, 0L), "write to <EMAIL> for details"))
    assert(got(2L) == ((0L, 1L, 0L), "docs at <URL> today"))
    assert(got(3L) == ((0L, 0L, 2L), "call <PHONE> or <PHONE> now"))
    assert(got(4L) == ((0L, 0L, 0L), "clean text with no pii at all"))
  }

  test("an address inside a url path is swallowed by <URL> (cascade order)") {
    val got = scrub(1L -> "see https://ex.org/u/bob@mail.com/page next")
    val ((nEmail, nUrl, _), clean) = got(1L)
    assert(clean == "see <URL> next") // URL replaced first, email never half-scrubs
    assert(nUrl == 1L)
    assert(nEmail == 1L) // counts are against the ORIGINAL text, per pattern
  }

  test("multiple pii kinds in one document all redact") {
    val got = scrub(1L ->
      "mail a@b.io visit https://x.io call 010-1234-5678 done")
    assert(got(1L) == ((1L, 1L, 1L),
      "mail <EMAIL> visit <URL> call <PHONE> done"))
  }
}
