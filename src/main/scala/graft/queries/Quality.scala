package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}
import graft.text.TextOps

/** Corpus-quality operators from the published LLM-data-curation
  * playbook (Gopher/MassiveText-style heuristic filters, C4-style
  * cross-document span dedup) — SURVEY table N additions for round 3.
  *
  * Both operators are exact integer arithmetic end-to-end (counts and
  * truncating per-mille ratios), so the DuckDB oracle matches
  * bit-for-bit with no float tolerance games (SURVEY §7.4).
  *
  * Scale shapes:
  * - quality stats: explode words → (doc, word) count → per-doc agg.
  *   Two shuffles, both with map-side partial aggregation; at 100 TB
  *   this is the canonical two-level rollup, no skew (doc_id keys).
  * - segment dedup: explode fixed 10-token segments, aggregate by
  *   segment HASH (md5 — shuffle keys stay 32 bytes however long the
  *   segment is), count distinct docs per hash, semi-join the
  *   duplicated hashes back. Never doc×doc; cost is O(tokens) +
  *   one hash-shuffle — the same shape C4/MassiveText dedup runs at
  *   web scale.
  */
object Quality {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // ---- N_TEXT10: Gopher-style quality heuristics ---------------------

  private val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "on")

  /** Per-doc quality stats + keep/drop verdict, Gopher table-A1 style,
    * adapted to the fixture corpus (single-line, punctuation-free):
    * word count, mean word length (×100), most-common-word share and
    * top-bigram share (per-mille), distinct-word ratio (per-mille),
    * stopword share (per-mille), and the composite `keep` flag.
    */
  private def gopherQuality(s: SparkSession, d: String): DataFrame = {
    val words = docs(s, d)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
    val wc = words.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("cnt"))
    val uni = wc.groupBy(col("doc_id")).agg(
      sum(col("cnt")).as("n_words"),
      count(lit(1)).as("n_distinct"),
      max(col("cnt")).as("top_cnt"),
      sum(length(col("w")) * col("cnt")).as("sum_wlen"),
      sum(when(col("w").isInCollection(Stopwords), col("cnt"))
        .otherwise(0L)).as("n_stop"))
    // Top-bigram share (Gopher's duplicate-2-gram signal): adjacent
    // word pairs via a 2-token shingle slide, counted the same way.
    val bi = docs(s, d)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(TextOps.shingles("t", 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id")).agg(
        sum(col("cnt")).as("n_bigrams"), max(col("cnt")).as("top2_cnt"))
    val st = uni.join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        expr("sum_wlen * 100 div n_words").as("mean_wlen_x100"),
        expr("top_cnt * 1000 div n_words").as("top_permille"),
        expr("n_distinct * 1000 div n_words").as("distinct_permille"),
        expr("n_stop * 1000 div n_words").as("stop_permille"),
        expr("coalesce(top2_cnt * 1000 div n_bigrams, 0)")
          .as("top2_permille"))
    st.withColumn("keep",
        (col("n_words").between(20, 100000) &&
          col("mean_wlen_x100").between(300, 1000) &&
          col("top_permille") < 150 &&
          col("top2_permille") < 120 &&
          col("distinct_permille") > 300).cast("long"))
      .orderBy(col("doc_id"))
  }

  private val gopherQualitySql =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |wc AS (
      |  SELECT doc_id, w, COUNT(*) AS cnt FROM words GROUP BY 1, 2),
      |uni AS (
      |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
      |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |    CAST(MAX(cnt) AS BIGINT) AS top_cnt,
      |    CAST(SUM(length(w) * cnt) AS BIGINT) AS sum_wlen,
      |    CAST(SUM(CASE WHEN w IN ('the','a','of','to','and','in','is','on')
      |      THEN cnt ELSE 0 END) AS BIGINT) AS n_stop
      |  FROM wc GROUP BY 1),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    array_to_string(list_slice(t, i + 1, i + 2), ' ') AS b
      |  FROM toks, unnest(range(0, len(t) - 1)) AS u(i)),
      |bc AS (SELECT doc_id, b, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
      |bi AS (
      |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
      |    CAST(MAX(cnt) AS BIGINT) AS top2_cnt
      |  FROM bc GROUP BY 1)
      |SELECT u.doc_id, n_words, n_distinct,
      |  sum_wlen * 100 // n_words AS mean_wlen_x100,
      |  top_cnt * 1000 // n_words AS top_permille,
      |  n_distinct * 1000 // n_words AS distinct_permille,
      |  n_stop * 1000 // n_words AS stop_permille,
      |  COALESCE(top2_cnt * 1000 // n_bigrams, 0) AS top2_permille,
      |  CAST(n_words BETWEEN 20 AND 100000
      |    AND sum_wlen * 100 // n_words BETWEEN 300 AND 1000
      |    AND top_cnt * 1000 // n_words < 150
      |    AND COALESCE(top2_cnt * 1000 // n_bigrams, 0) < 120
      |    AND n_distinct * 1000 // n_words > 300 AS BIGINT) AS keep
      |FROM uni u LEFT JOIN bi USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---- N_DEDUP7: cross-document span (segment) dedup -----------------

  /** C4/MassiveText-style duplicated-span report: chop every document
    * into fixed 10-token segments, find segments shared by ≥2 distinct
    * docs (by md5, so the shuffle key is fixed-width), and emit each
    * doc's duplicated-span exposure. A doc with high `dup_permille` is
    * a near-copy of something else in the corpus.
    */
  private def segmentDedup(s: SparkSession, d: String): DataFrame = {
    val n = 10
    val segRows = docs(s, d)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        s"case when size(t) < $n then array() else " +
          s"transform(sequence(0, size(t) div $n - 1), " +
          s"i -> array_join(slice(t, i * $n + 1, $n), ' ')) end"))
        .as("seg"))
      .select(col("doc_id"), md5(col("seg")).as("h"))
    // Two passes over the segment relation, not three: aggregate the
    // distinct-doc count per hash (shuffle on h), join it back (the agg
    // output is already h-partitioned, so only the probe side moves),
    // then ONE per-doc aggregation computes total and duplicated
    // segment counts together.
    val perSeg = segRows.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
    segRows.join(perSeg, Seq("h"))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_segs"))
      .select(col("doc_id"), col("n_segs"), col("n_dup_segs"),
        expr("n_dup_segs * 1000 div n_segs").as("dup_permille"))
      .filter(col("dup_permille") > 0)
      .orderBy(col("doc_id"))
  }

  private val segmentDedupSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |segs AS (
      |  SELECT doc_id, md5(array_to_string(
      |    list_slice(t, i * 10 + 1, i * 10 + 10), ' ')) AS h
      |  FROM toks, unnest(range(0, len(t) // 10)) AS u(i)),
      |dup AS (
      |  SELECT h FROM segs GROUP BY h
      |  HAVING COUNT(DISTINCT doc_id) >= 2),
      |per_doc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs FROM segs
      |  GROUP BY 1),
      |dup_per_doc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_segs
      |  FROM segs WHERE h IN (SELECT h FROM dup) GROUP BY 1)
      |SELECT doc_id, n_segs,
      |  COALESCE(n_dup_segs, 0) AS n_dup_segs,
      |  COALESCE(n_dup_segs, 0) * 1000 // n_segs AS dup_permille
      |FROM per_doc LEFT JOIN dup_per_doc USING (doc_id)
      |WHERE COALESCE(n_dup_segs, 0) * 1000 // n_segs > 0
      |ORDER BY doc_id""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("N_TEXT10_gopher_quality", gopherQuality, Some(gopherQualitySql)),
    GQuery("N_DEDUP7_segment_dedup", segmentDedup, Some(segmentDedupSql)))
}
