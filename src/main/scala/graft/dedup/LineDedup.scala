package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide duplicate-line removal — the RefinedWeb/CCNet line-dedup
  * pass: boilerplate lines (nav bars, cookie banners, license headers)
  * that repeat across millions of pages are kept only at their first
  * occurrence and dropped everywhere else, then documents are
  * reassembled in original line order.
  *
  * Scale shape: the first-occurrence winner per line is computed with
  * `min(struct(id, idx))` — a partial-aggregable hash aggregate — NOT a
  * `row_number` window. A window would sort every occurrence of a line
  * inside one task; boilerplate lines are extreme heavy hitters (one
  * line, 10^9 occurrences at 100 TB), so the window version dies on
  * skew while the min-struct version map-side-combines each partition
  * down to one candidate per line before the exchange. Reassembly
  * shuffles each surviving line once, keyed by doc id.
  */
object LineDedup {

  /** Explode `linesCol: array<string>` and keep only each distinct
    * line's first occurrence, ordered by (`idCol`, position). Returns
    * (idCol, line_idx, line) — building block for [[dedupLines]]. */
  def firstOccurrences(docs: DataFrame, idCol: String,
                       linesCol: String): DataFrame = {
    val ex = docs.select(col(idCol),
      posexplode(col(linesCol)).as(Seq("line_idx", "line")))
    val winners = ex.groupBy("line")
      .agg(min(struct(col(idCol), col("line_idx"))).as("w"))
      .select(col("line"), col("w")(idCol).as(idCol),
        col("w")("line_idx").as("line_idx"))
    ex.join(winners, Seq("line", idCol, "line_idx"), "left_semi")
  }

  /** Full pass: dedup lines corpus-wide, reassemble each document's
    * surviving lines (original order, '\n'-joined). Documents whose
    * every line was seen earlier disappear from the output. */
  def dedupLines(docs: DataFrame, idCol: String, linesCol: String,
                 outCol: String = "text"): DataFrame =
    firstOccurrences(docs, idCol, linesCol)
      .groupBy(idCol)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("line_idx"), col("line")))),
          s => s.getField("line")),
        "\n").as(outCol))
}
