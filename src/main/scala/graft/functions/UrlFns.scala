package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus deduplication. Crawled corpora
  * carry the same page under many spellings — scheme case, `www.`
  * prefix, tracking query params, trailing slash — and URL-level
  * dedup is the cheapest first pass before any content hashing
  * (reference analog: the toolkit normalizes storage URIs the same
  * way for s3a/s3n, `src/.../format_helpers.py`; here the target is
  * page URLs at corpus scale).
  *
  * Built entirely from codegen'd built-ins (`lower` /
  * `regexp_extract` / `regexp_replace`) — no UDF, so the whole
  * canonicalization stays inside WholeStageCodegen and is pushable
  * like any other expression.
  */
object UrlFns {

  private val SchemeHost = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val AfterHost = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"

  /** Canonical form of an absolute http(s) URL:
    *  - scheme dropped (http/https/case all collapse),
    *  - host lowercased and a leading `www.` stripped (RFC 3986: only
    *    scheme and host are case-insensitive — path case is KEPT),
    *  - `utm_*` tracking params removed, dangling `?`/`&` cleaned,
    *  - one trailing `/` trimmed.
    * Non-URL strings (no `scheme://`) canonicalize to `""` — callers
    * filter or treat empty as "no URL". */
  def canonicalizeUrl(url: Column): Column = {
    val host = regexp_replace(
      lower(regexp_extract(url, SchemeHost, 1)), "^www\\.", "")
    val rest = regexp_extract(url, AfterHost, 1)
    // Strip utm_* params anchored to a real param boundary ('?' or
    // '&') so 'utm_' as a SUBSTRING of another param name
    // ('?xutm_source=1', '&myutm_b=2') is never touched. Three passes
    // because a single regex that consumes the trailing '&' skips
    // consecutive utm params: (1) every non-leading '&utm_…' param
    // consumes its own '&' (consecutive ones each match); (2) a
    // leading '?utm_…&' hands its '?' to the next param; (3) a
    // leading '?utm_…' that is the sole param drops with the '?',
    // preserving any '#fragment'.
    val noAmpUtm = regexp_replace(rest, "&utm_[A-Za-z0-9_]*=[^&#]*", "")
    val noLeadUtm = regexp_replace(noAmpUtm, "\\?utm_[A-Za-z0-9_]*=[^&#]*&", "?")
    val noUtm = regexp_replace(noLeadUtm, "\\?utm_[A-Za-z0-9_]*=[^&#]*(#|$)", "$1")
    val noDangle = regexp_replace(noUtm, "[?&]$", "")
    val noSlash = regexp_replace(noDangle, "/$", "")
    when(host === "", lit("")).otherwise(concat(host, noSlash))
  }
}
