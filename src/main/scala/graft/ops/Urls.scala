package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-style dedup — the standard first pass of
  * a web-corpus pipeline (duplicate pages are overwhelmingly re-crawls of
  * the same canonical URL, caught here for the price of a string kernel
  * instead of a content-similarity join).
  *
  * Rules (each a codegen'd regexp step, applied in order):
  *   1. strip the scheme (`http://` / `https://`)
  *   2. lowercase the authority (host:port); the path keeps its case
  *   3. strip a leading `www.`
  *   4. drop the fragment (`#...`)
  *   5. drop `utm_*` tracking parameters (other query params survive);
  *      the match is anchored to a `?`/`&` boundary so a param merely
  *      CONTAINING "utm_" (`xutm_source=v`) or a path segment never
  *      matches, and the name class covers digits/underscores
  *      (`utm_content_2`)
  *   6. tidy separators a dropped param leaves behind (`&&`→`&`,
  *      `?&`→`?`, trailing `?`/`&`, `/?`→`?`) and a trailing slash
  *
  * The whole chain is Column-only — at 100 TB it fuses into the scan with
  * zero shuffle; the dedup itself is then an exact hash groupBy.
  */
object Urls {

  def normalizeUrl(u: Column): Column = {
    val noScheme = regexp_replace(trim(u), "^https?://", "")
    // authority = everything before the first '/', '?' or '#'
    val lowerHost = concat(
      lower(regexp_extract(noScheme, "^[^/?#]*", 0)),
      regexp_replace(noScheme, "^[^/?#]*", ""))
    val noWww = regexp_replace(lowerHost, "^www\\.", "")
    val noFrag = regexp_replace(noWww, "#.*$", "")
    // keep the captured separator; consecutive dropped params leave
    // "??"/"&&" runs that the tidy pass collapses
    val noUtm = regexp_replace(noFrag, "([?&])utm_[A-Za-z0-9_]+=[^&#]*", "$1")
    val tidy = regexp_replace(
      regexp_replace(
        regexp_replace(regexp_replace(noUtm, "&&+", "&"), "\\?&", "?"),
        "[?&]+$", ""),
      "/\\?", "?")
    regexp_replace(tidy, "/$", "")
  }
}
