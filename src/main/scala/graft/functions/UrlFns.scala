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
    val noUtm = regexp_replace(rest, "utm_[A-Za-z0-9_]*=[^&#]*&?", "")
    val noDangle = regexp_replace(noUtm, "[?&]$", "")
    val noSlash = regexp_replace(noDangle, "/$", "")
    when(host === "", lit("")).otherwise(concat(host, noSlash))
  }
}
