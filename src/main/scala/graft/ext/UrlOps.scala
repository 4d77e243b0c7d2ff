package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + host extraction — the CHEAPEST tier of the
  * dedup ladder, the one CCNet/RefinedWeb-descent pipelines run FIRST:
  * most crawl duplicates are the same page under a different surface
  * form (scheme, `www.`, trailing slash, query-parameter order,
  * tracking parameters), and collapsing those costs string ops on the
  * `url` column alone — no content hashing, no shingles, no joins. The
  * suite's content ladder (exact md5 → MinHash/SimHash → SemDeDup)
  * starts AFTER this tier (q316 composes them in that order).
  *
  * Canonical form, applied left to right — every step a codegen'd
  * string expression, deterministic and engine-mirrorable:
  *   1. lowercase + trim;
  *   2. strip a leading `http://` / `https://` scheme;
  *   3. strip a leading `www.`;
  *   4. the query begins at the FIRST `?` (a later literal `?` is part
  *      of the query, the WHATWG reading);
  *   5. strip trailing `/` runs from the path;
  *   6. split the query on `&`, drop empty and `utm_*` tracking
  *      params, SORT the rest (param order never distinguishes pages),
  *      re-join with `&` and re-attach with `?` only when non-empty.
  *
  * Fragments (`#…`) are not modeled (the synthetic fixture carries
  * none; a real crawl column would strip them in step 4's spirit).
  */
object UrlOps {

  /** The canonical URL per the 6-step contract above. */
  def canonicalize(url: Column): Column = {
    val lowered = lower(trim(url))
    val noScheme = regexp_replace(lowered, "^https?://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    val parts = split(noWww, "\\?", 2)
    val path = regexp_replace(element_at(parts, 1), "/+$", "")
    val qraw = when(size(parts) > 1, element_at(parts, 2)).otherwise(lit(""))
    val params = filter(split(qraw, "&"),
      p => !p.startsWith("utm_") && p =!= "")
    val sortedQ = array_join(array_sort(params), "&")
    concat(path,
      when(length(sortedQ) > 0, concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** Host of an already-CANONICAL url (scheme stripped, so the host is
    * everything before the first `/`). */
  def hostOf(canonical: Column): Column =
    substring_index(canonical, "/", 1)
}
