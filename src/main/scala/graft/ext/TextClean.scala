package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII redaction for a training-data pipeline: scrub emails, URLs, and
  * phone numbers from document text before it reaches a training corpus.
  * Pure per-row `regexp_replace`/`regexp_extract_all` projections — fuse
  * with the scan, zero shuffles, partition-parallel at any corpus size.
  *
  * Patterns are kept inside the syntax subset Java regex and RE2-family
  * engines (the DuckDB oracle) interpret identically — no backreferences,
  * no lookaround — so redaction is engine-reproducible. Replacement ORDER
  * is part of the contract (URLs first, so an address inside a URL path
  * is swallowed by `<URL>` rather than half-scrubbed); match counts are
  * reported against the ORIGINAL text, per pattern, independent of the
  * replacement cascade.
  */
object TextClean {

  /** Lowercased email address (callers normalize case first). */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** http/https URL up to the next whitespace. */
  val UrlPattern = "https?://[^ ]+"

  /** Dashed/spaced phone shapes (2-4 / 3-4 / 4 digit groups). */
  val PhonePattern = "\\b\\d{2,4}[- ]\\d{3,4}[- ]\\d{4}\\b"

  /** Redact PII from `textCol` (already-normalized text): per-doc match
    * counts plus the scrubbed text with `<URL>`/`<EMAIL>`/`<PHONE>`
    * placeholders. */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val clean =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, UrlPattern, "<URL>"),
          EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>")
    docs.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(UrlPattern), lit(0))).cast("long").as("n_urls"),
      size(regexp_extract_all(t, lit(PhonePattern), lit(0))).cast("long").as("n_phones"),
      clean.as("clean_text"))
  }
}
