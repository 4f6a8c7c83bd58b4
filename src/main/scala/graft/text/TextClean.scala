package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.plans.{NfcNormalize, StripAccents}

/** Corpus text cleanup: HTML-to-text extraction and unicode
  * canonicalization — the two passes a web-scraped corpus needs
  * before any dedup/quality stage (reference analog: the toolkit's
  * per-column `modify_column_by_udf` cleanup hooks,
  * awsglue_utils.py:214-233; the transforms here are the
  * LLM-pipeline instantiation).
  *
  * Everything is a pure Column composition over builtin regexp/replace
  * ops (codegen'd, no UDF boundary), so extraction rides the scan; the
  * unicode kernels are native expressions ([[graft.plans.NfcNormalize]],
  * [[graft.plans.StripAccents]]) that also stay in codegen.
  *
  * Patterns use no backreferences and only (?i)/(?s) inline flags, so
  * the same pattern text runs identically on Java regex (Spark) and
  * RE2 (DuckDB oracle) — the portability constraint all graft oracle
  * SQL obeys.
  */
object TextClean {

  /** Extract visible text from HTML: drop script/style subtrees,
    * replace block-closing tags with spaces, strip remaining tags,
    * unescape the five predefined XML entities plus &nbsp; and
    * numeric &#NN;, collapse whitespace runs. Lossy by design (no DOM
    * — a regex pass is the scale-appropriate 99% answer; a real parser
    * would be a per-partition library call behind the same signature). */
  def htmlToText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    // entity unescape; &amp; LAST so "&amp;lt;" yields "&lt;" not "<"
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col, (from, to)) => replace(col, lit(from), lit(to)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** DuckDB replay of [[htmlToText]] applied to SQL fragment `expr`. */
  def htmlToTextSql(expr: String): String = {
    val noScript = s"regexp_replace($expr, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    val noComment = s"regexp_replace($noStyle, '(?s)<!--.*?-->', ' ', 'g')"
    val noTags = s"regexp_replace($noComment, '<[^>]+>', ' ', 'g')"
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (sql, (from, to)) => s"replace($sql, '$from', '$to')" }
    s"trim(regexp_replace($unescaped, '\\s+', ' ', 'g'))"
  }

  /** Canonical pre-hash form: NFC composition. */
  def normalizeNfc(c: Column): Column = NfcNormalize(c)

  /** Accent-folded form for fuzzy matching: NFD + drop combining
    * marks (DuckDB strip_accents semantics — ø/ß pass through). */
  def foldAccents(c: Column): Column = StripAccents(c)
}
