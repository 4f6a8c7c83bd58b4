package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Residual codec UDFs (SURVEY.md §2.7 F6, §7.3): the only functions
  * whose sequential-parse semantics don't decompose into built-ins.
  * Scala UDFs (not Python): still serialized per row, so keep them off
  * the 100 TB hot path — they exist for metastore-migration parity
  * where cardinality is catalog-sized, not data-sized.
  */
object Codecs {

  /** F6 (`udf_string_list_str_to_list`
    * hive_metastore_migration.py:829-842): decode strings shaped like
    * `1%['a', 'b']` into the element array. Faithful to the reference:
    * the guard regex must match at the START of the string (re.match),
    * a single digit length prefix, quoted word elements; anything else
    * yields an empty array. Splits on '%' and takes segment [1], so a
    * '%' inside elements truncates — same as the reference. */
  private val guard = """\d%\[('\w+',?\s?)+\]""".r

  def stringListStrToList(s: String): Seq[String] = {
    if (s == null) return Seq.empty
    guard.findPrefixOf(s) match {
      case None => Seq.empty
      case Some(_) =>
        val parts = s.split('%')
        if (parts.length < 2) Seq.empty
        else {
          val body = parts(1)
          val inner = body.substring(1, body.length - 1)
          inner.split(',').map { e =>
            val t = e.trim
            if (t.length >= 2) t.substring(1, t.length - 1) else t
          }.toSeq
        }
    }
  }

  val stringListStrToListUdf =
    udf((s: String) => stringListStrToList(s))

  def decodeStringList(c: Column): Column = stringListStrToListUdf(c)
}
