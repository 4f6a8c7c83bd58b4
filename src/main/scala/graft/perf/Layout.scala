package graft.perf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout techniques for 100 TB joins (SURVEY.md §4 scale
  * review): bucketing for co-located shuffle-free joins, and
  * deterministic salting for skewed keys.
  */
object Layout {

  /** Register `df` as a bucketed+sorted catalog table. Both sides of a
    * recurring join bucketed the same way join WITHOUT an exchange —
    * at 100 TB the shuffle this removes IS the job cost. */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
                   numBuckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").option("path", path)
      .saveAsTable(table)

  /** Salted join for skewed keys: the fact side is split into
    * `saltBuckets` deterministic sub-keys (hash of a unique column —
    * NOT rand(), which breaks retry/replay determinism); the dim side
    * is replicated once per salt. Result set is exactly the plain
    * join's. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factUniqueCol: String, saltBuckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(hash(col(factUniqueCol)), lit(saltBuckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Interleave the low 16 bits of two non-negative int columns into a
    * 32-bit Morton (Z-order) value. Pure codegen'd bit math (the classic
    * bit-spreading ladder), identical semantics in any engine with
    * 64-bit integer ops — which is what makes it oracle-checkable. */
  def zValue(a: Column, b: Column): Column = {
    def spread(x0: Column): Column = {
      val x = x0.cast("long")
      val x1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
      val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
      (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Min-max normalize a numeric column into 16-bit [0, 65535] space.
    * Interleaving RAW values lets the wider-ranged column dominate every
    * significant Morton bit (measured: 4-bit user_id vs 9-bit value left
    * user_id completely unlocalized) — equalizing bit occupancy first is
    * what makes the curve split both dimensions. Fixed double op order
    * `floor(((c-min)*65535.0)/(max-min))` so the SQL twin is bit-exact. */
  def normalize16(c: Column, cmin: Long, cmax: Long): Column =
    if (cmax == cmin) lit(0L)
    else floor(((c - lit(cmin)) * lit(65535.0)) / lit(cmax - cmin)).cast("long")

  /** ANSI-SQL twin of [[normalize16]]. */
  def normalize16Sql(c: String, cmin: String, cmax: String): String =
    s"CAST(FLOOR((($c - $cmin) * 65535.0) / ($cmax - $cmin)) AS BIGINT)"

  /** Same spreading ladder as [[zValue]] rendered to ANSI SQL (for the
    * DuckDB oracle twin of `perf_zorder`). */
  def zValueSql(a: String, b: String): String = {
    def spread(x: String): String = {
      val x1 = s"((($x) | (($x) << 8)) & 16711935)"
      val x2 = s"(($x1 | ($x1 << 4)) & 252645135)"
      val x3 = s"(($x2 | ($x2 << 2)) & 858993459)"
      s"(($x3 | ($x3 << 1)) & 1431655765)"
    }
    s"(${spread(a)} | (${spread(b)} << 1))"
  }

  /** Column min/max bounds for [[zorderWrite]] normalization — one tiny
    * agg-only job (at 100 TB production would read these from table
    * column stats instead of scanning; the interleave itself is
    * unchanged). */
  def bounds(df: DataFrame, cols: String*): Seq[(Long, Long)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(i => (r.getLong(2 * i), r.getLong(2 * i + 1)))
  }

  /** Z-order write: normalize (colA, colB) to 16-bit rank space,
    * range-partition on their Morton value, sort within partitions —
    * each output file covers a compact rectangle in (a, b) space, so
    * parquet min/max footer stats prune scans on BOTH columns
    * (single-column sort prunes only one). At 100 TB this is the
    * OPTIMIZE ZORDER BY pattern: one stats pass + one range exchange,
    * no driver-side state, file count = nFiles. */
  def zorderWrite(df: DataFrame, colA: String, colB: String,
                  nFiles: Int, path: String): Unit =
    zorderBy(df, colA, colB, nFiles)
      .write.mode("overwrite").parquet(path)

  /** The arrangement behind [[zorderWrite]], reusable by any sink
    * (VersionedTable.compactClustered): interleaved-bit z-value,
    * range-partitioned into `nFiles` and sorted within each — files
    * become compact 2-D boxes, so per-file [min,max] stats prune
    * range predicates on EITHER dimension. */
  def zorderBy(df: DataFrame, colA: String, colB: String,
               nFiles: Int): DataFrame = {
    val Seq((aMin, aMax), (bMin, bMax)) = bounds(df, colA, colB)
    df.withColumn("__z", zValue(
        normalize16(col(colA), aMin, aMax),
        normalize16(col(colB), bMin, bMax)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
