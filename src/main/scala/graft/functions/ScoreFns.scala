package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Rounding helpers for hashed score columns.
  *
  * Any gate that emits `round(log(...))` (or another rounded
  * transcendental, e.g. a cosine) is exposed to the IEEE-754 negative-zero
  * hazard: a score whose true value is exactly 0 can round to `0.0` in
  * Spark and `-0.0` in DuckDB (a 1-ulp difference in the underlying log
  * implementation crossing zero). The two are equal under `==` — so a
  * value-comparing check passes — but byte-different under the driver's
  * hash gate. Seen in the wild on `text_pmi` (round 8): one bigram with
  * pmi exactly 0 flipped the whole gate red.
  *
  * `scoreRound` normalizes by adding `+ 0.0` after the round: IEEE
  * guarantees `-0.0 + 0.0 == +0.0` and `x + 0.0 == x` bit-exactly for
  * every other finite double, so the column is unchanged except for the
  * sign of zero. Every oracle for a gate using this helper MUST mirror
  * the normalization with `+ 0.0` in its SQL.
  */
object ScoreFns {

  /** `round(c, scale)` with negative zero normalized to `+0.0`. Use for
    * every hashed score derived from log/exp/cosine arithmetic; mirror
    * with `round(..., scale) + 0.0` in the DuckDB oracle. */
  def scoreRound(c: Column, scale: Int): Column =
    round(c, scale) + lit(0.0)
}
