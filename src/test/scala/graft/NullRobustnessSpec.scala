package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Null/degenerate-input totality for the text/dedup operator family:
  * a 100 TB corpus WILL contain null, empty, and whitespace-only
  * documents, and an operator that NPEs or emits a phantom row on them
  * takes the whole stage down. Every operator here must be total —
  * null in, defined (null/empty/absent) out. */
class NullRobustnessSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq[(java.lang.Long, String)](
    (1L, "a perfectly ordinary document with several words here"),
    (2L, null),
    (3L, ""),
    (4L, "   "),
    (5L, "one"),
    (6L, "a perfectly ordinary document with several words here")
  ).toDF("doc_id", "text")

  test("quality suite over an EMPTY table reports vacuous passes, not null") {
    // sum() over zero rows is NULL — uncoalesced, an empty table would
    // report violations=NULL / pass=NULL where the DuckDB oracle (and
    // any sane reading of "no rows violated") says 0 / true
    import graft.etl.Quality
    val empty = docs.where(lit(false))
    val rows = Quality.suite(Seq(
        Quality.unique(empty, Seq("doc_id")),
        Quality.complete(empty, "text"),
        Quality.inRange(empty.withColumn("n", lit(1L)), "n", 0.0, 2.0),
        Quality.acceptedValues(empty, "text", Seq("a", "b"))))
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("violations")),
        s"${r.getString(0)}: violations is NULL on empty input")
      assert(r.getLong(r.fieldIndex("violations")) == 0L)
      assert(r.getBoolean(r.fieldIndex("pass")), s"${r.getString(0)} not vacuous-pass")
    }
  }

  test("text analysis columns are total over null/empty/blank docs") {
    val out = docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.tokenCountWs(col("text")).as("n_ws"),
      TextAnalysis.tokenCountBpe(col("text")).as("n_bpe"),
      TextAnalysis.repetitionScore(col("text")).as("rep"))
      .collect()
    assert(out.length == 6) // no rows lost, no exceptions
    val nullRow = out.find(_.getLong(0) == 2L).get
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2))
  }

  test("exact dedup keeps null-text docs (no phantom merge, no NPE)") {
    val kept = graft.dedup.ExactDedup
      .dedupKeepFirst(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    // 6 duplicates 1 (dropped); "" and "   " share canonical text ""
    // so 4 merges into 3; the null-text doc 2 must SURVIVE — a null
    // key is unjudgeable, not an equivalence class
    assert(kept == Set(1L, 2L, 3L, 5L))
  }

  test("minhash/simhash/span dedup skip un-shingleable docs silently") {
    val mh = graft.dedup.MinHashLSH.nearDuplicatePairs(
      docs, "doc_id", "text", 3, numPerms = 16, bands = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(mh.map(p => (p._1, p._2)).toSet == Set((1L, 6L)))
    val spans = graft.dedup.SpanDedup.dupSpanCounts(docs, "doc_id", "text", 8)
      .as[(Long, Long)].collect()
    assert(spans.map(_._1).toSet == Set(1L, 6L))
  }

  test("phash signatures are total over null payloads") {
    // genuinely null payload rows (null text -> encode(null) = null)
    val payloads = docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))
    assert(payloads.where(col("payload").isNull).count() > 0,
      "fixture must exercise a real null payload")
    val sigs = graft.multimodal.Phash.signatures(payloads)
    assert(sigs.count() == 6)
    assert(sigs.where(col("phash").isNull).count() == 0)
  }

  test("sketches treat null values as absent, not as a key") {
    val kmv = graft.sketch.Sketches.distinctByGroup(
      docs.withColumn("g", lit("all")), "g", "text", 8)
      .select("kmv_distinct").as[Long].head()
    // md5(null) = null -> skipped by BoundedMinK; 4 distinct non-null
    // texts (doc 1 == doc 6)
    assert(kmv == 4L)
  }
}
