package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}
import graft.dedup.Dedup
import graft.text.TextOps

/** Corpus-quality operators from the published LLM-data-curation
  * playbook (Gopher/MassiveText-style heuristic filters, C4-style
  * cross-document span dedup, and the staged curation funnel that
  * composes them) — SURVEY table N additions for round 3.
  *
  * All operators are exact integer arithmetic end-to-end (counts and
  * truncating per-mille ratios), so the DuckDB oracle matches
  * bit-for-bit with no float tolerance games (SURVEY §7.4).
  *
  * Scale shapes:
  * - quality stats: explode words → (doc, word) count → per-doc agg.
  *   Two shuffles, both with map-side partial aggregation; at 100 TB
  *   this is the canonical two-level rollup, no skew (doc_id keys).
  * - segment dedup: explode fixed 10-token segments, aggregate by
  *   segment HASH (md5 — shuffle keys stay 32 bytes however long the
  *   segment is), join the per-hash doc counts back, one per-doc agg.
  *   Never doc×doc; cost is O(tokens) + one hash-shuffle — the same
  *   shape C4/MassiveText dedup runs at web scale.
  * - curation funnel: each stage is a doc_id-keyed filter/join over
  *   the previous stage's survivors; the final rollup is a tiny
  *   per-language aggregate of four pre-aggregated counts.
  */
object Quality {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // ---- shared per-doc stats ------------------------------------------

  private val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "on")

  /** Per-doc Gopher-style stats with the composite `keep` flag (0/1). */
  private def gopherStats(s: SparkSession, d: String): DataFrame = {
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
    uni.join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        expr("sum_wlen * 100 div n_words").as("mean_wlen_x100"),
        expr("top_cnt * 1000 div n_words").as("top_permille"),
        expr("n_distinct * 1000 div n_words").as("distinct_permille"),
        expr("n_stop * 1000 div n_words").as("stop_permille"),
        expr("coalesce(top2_cnt * 1000 div n_bigrams, 0)")
          .as("top2_permille"))
      .withColumn("keep",
        (col("n_words").between(20, 100000) &&
          col("mean_wlen_x100").between(300, 1000) &&
          col("top_permille") < 150 &&
          col("top2_permille") < 120 &&
          col("distinct_permille") > 300).cast("long"))
  }

  /** The shared gopher-stats oracle CTE chain, ending in `st`. */
  private val statsCte =
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
      |  FROM bc GROUP BY 1),
      |st AS (
      |  SELECT u.doc_id, n_words, n_distinct,
      |    sum_wlen * 100 // n_words AS mean_wlen_x100,
      |    top_cnt * 1000 // n_words AS top_permille,
      |    n_distinct * 1000 // n_words AS distinct_permille,
      |    n_stop * 1000 // n_words AS stop_permille,
      |    COALESCE(top2_cnt * 1000 // n_bigrams, 0) AS top2_permille,
      |    CAST(n_words BETWEEN 20 AND 100000
      |      AND sum_wlen * 100 // n_words BETWEEN 300 AND 1000
      |      AND top_cnt * 1000 // n_words < 150
      |      AND COALESCE(top2_cnt * 1000 // n_bigrams, 0) < 120
      |      AND n_distinct * 1000 // n_words > 300 AS BIGINT) AS keep
      |  FROM uni u LEFT JOIN bi USING (doc_id)),
      |""".stripMargin

  /** Per-doc (n_segs, n_dup_segs, dup_permille) over fixed 10-token
    * segments, duplicated = the segment text occurs in ≥2 distinct
    * docs corpus-wide. Docs shorter than 10 tokens emit no row.
    */
  private def segmentStats(s: SparkSession, d: String): DataFrame = {
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
  }

  /** The shared segment-stats oracle CTE chain (`toks` must already be
    * defined), ending in `perdoc`.
    */
  private val segCte =
    """segs AS (
      |  SELECT doc_id, md5(array_to_string(
      |    list_slice(t, i * 10 + 1, i * 10 + 10), ' ')) AS h
      |  FROM toks, unnest(range(0, len(t) // 10)) AS u(i)),
      |perseg AS (
      |  SELECT h, COUNT(DISTINCT doc_id) AS nd FROM segs GROUP BY 1),
      |perdoc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
      |    CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_dup_segs
      |  FROM segs JOIN perseg USING (h) GROUP BY 1),
      |""".stripMargin

  // ---- N_TEXT10: Gopher-style quality heuristics ---------------------

  private def gopherQuality(s: SparkSession, d: String): DataFrame =
    gopherStats(s, d).orderBy(col("doc_id"))

  private val gopherQualitySql = statsCte.dropRight(2) +
    """
      |SELECT doc_id, n_words, n_distinct, mean_wlen_x100, top_permille,
      |  distinct_permille, stop_permille, top2_permille, keep
      |FROM st ORDER BY doc_id""".stripMargin

  // ---- N_DEDUP7: cross-document span (segment) dedup -----------------

  /** C4/MassiveText-style duplicated-span report: chop every document
    * into fixed 10-token segments, find segments shared by ≥2 distinct
    * docs (by md5, so the shuffle key is fixed-width), and emit each
    * doc's duplicated-span exposure. A doc with high `dup_permille` is
    * a near-copy of something else in the corpus.
    */
  private def segmentDedup(s: SparkSession, d: String): DataFrame =
    segmentStats(s, d)
      .filter(col("dup_permille") > 0)
      .orderBy(col("doc_id"))

  private val segmentDedupSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |""".stripMargin + segCte.dropRight(2) +
    """
      |SELECT doc_id, n_segs, n_dup_segs,
      |  n_dup_segs * 1000 // n_segs AS dup_permille
      |FROM perdoc WHERE n_dup_segs * 1000 // n_segs > 0
      |ORDER BY doc_id""".stripMargin

  // ---- N_SCORE3: DSIR importance weighting ---------------------------

  /** DSIR-style data-selection weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw doc by log(p_target/p_raw) under hashed bag-of-words
    * models — here target = the corpus's English docs, features =
    * words hashed into 256 md5 buckets, add-one smoothing on both
    * sides. Docs with positive log-weight look more target-like than
    * raw-like and get the `keep` flag (DSIR then resamples by these
    * weights; the weight column is the operator).
    *
    * Scale: the model is 256 rows WHATEVER the corpus size — it
    * broadcasts; scoring is one map-side join over the per-(doc,
    * bucket) counts and one doc-keyed rollup, and the model branch
    * reuses the same (doc, bucket) shuffle. Determinism: per-bucket
    * log-ratios are quantized to BIGINT ×10⁴ BEFORE the per-doc sum
    * (exact integer aggregation — the N_SCORE2 idiom).
    */
  private val dsirBucket =
    "(instr('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16 + " +
      "(instr('0123456789abcdef', substr(md5(w), 2, 1)) - 1)"

  private def dsirWeights(s: SparkSession, d: String): DataFrame = {
    val words = docs(s, d)
      .select(col("doc_id"), col("lang"), col("text"))
      // r18 barrier: distribute before the word explode + md5 bucket
      // (otherwise the one-task scan stage hashes the whole corpus)
      .transform(graft.operators.Distribute.by(_, col("doc_id")))
      .select(col("doc_id"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("w"))
      .withColumn("b", expr(dsirBucket))
    // per-(doc, bucket) multiplicities: the model and scoring branches
    // both consume this one shuffle (ReuseExchange)
    val db = words.groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("k"))
    val cr = db.groupBy(col("b")).agg(sum(col("k")).as("cr"))
    val ct = db.filter(col("lang") === "en")
      .groupBy(col("b")).agg(sum(col("k")).as("ct"))
    val totals = db.agg(sum(col("k")).as("nr"),
      sum(when(col("lang") === "en", col("k")).otherwise(0L)).as("nt"))
    val model = cr.join(ct, Seq("b"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(totals)
      .select(col("b"),
        round((log((col("ct") + lit(1.0)) / (col("nt") + lit(256.0))) -
          log((col("cr") + lit(1.0)) / (col("nr") + lit(256.0)))) *
          lit(10000.0)).cast("long").as("lrq"))
    db.join(broadcast(model), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("k")).as("n_words"),
        sum(col("k") * col("lrq")).as("logw_q"))
      .select(col("doc_id"), col("lang"), col("n_words"), col("logw_q"),
        (col("logw_q") > 0).cast("long").as("keep"))
      .orderBy(col("doc_id"))
  }

  private val dsirWeightsSql =
    """WITH wrd AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |wb AS (
      |  SELECT doc_id, lang,
      |    (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) AS b
      |  FROM wrd),
      |db AS (
      |  SELECT doc_id, lang, b, CAST(COUNT(*) AS BIGINT) AS k
      |  FROM wb GROUP BY 1, 2, 3),
      |d_cr AS (SELECT b, CAST(SUM(k) AS BIGINT) AS cr FROM db GROUP BY 1),
      |d_ct AS (SELECT b, CAST(SUM(k) AS BIGINT) AS ct FROM db
      |  WHERE lang = 'en' GROUP BY 1),
      |d_tot AS (SELECT CAST(SUM(k) AS BIGINT) AS nr,
      |  CAST(SUM(CASE WHEN lang = 'en' THEN k ELSE 0 END) AS BIGINT) AS nt
      |  FROM db),
      |model AS (
      |  SELECT d_cr.b, CAST(round(
      |    (ln((COALESCE(d_ct.ct, 0) + 1.0) / (d_tot.nt + 256.0)) -
      |     ln((d_cr.cr + 1.0) / (d_tot.nr + 256.0))) * 10000.0)
      |    AS BIGINT) AS lrq
      |  FROM d_cr LEFT JOIN d_ct ON d_cr.b = d_ct.b CROSS JOIN d_tot)
      |SELECT db.doc_id, db.lang, CAST(SUM(k) AS BIGINT) AS n_words,
      |  CAST(SUM(k * lrq) AS BIGINT) AS logw_q,
      |  CAST(SUM(k * lrq) > 0 AS BIGINT) AS keep
      |FROM db JOIN model USING (b)
      |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  // ---- N_SAMP4: DSIR importance RESAMPLING ---------------------------

  /** The resampling half of DSIR (Xie et al. 2023): select k docs with
    * probability ∝ exp(logw) WITHOUT replacement via the GUMBEL TOP-K
    * trick — key = logw + Gumbel noise, take the k largest keys. The
    * "noise" is deterministic (the md5 idiom every sampler here uses):
    * u = (first-8-hex of md5('gum:'||doc_id) + 1) / 2³², g =
    * −ln(−ln u) — every engine and every rerun draws the same Gumbels,
    * so the selected SET is reproducible and oracle-checked, which is
    * the property a training-data pipeline actually needs from its
    * sampler. Keys round to 4 decimals with a doc_id tie-break before
    * the top-k (§7.4 rule 2).
    *
    * Scale: the weights are N_SCORE3's (broadcast 256-bucket model,
    * one (doc,bucket) shuffle); the selection itself is map-only key
    * arithmetic + TakeOrderedAndProject — per-partition heaps, the
    * driver merges k, no global sort of the corpus.
    */
  private def dsirResample(s: SparkSession, d: String): DataFrame =
    dsirWeights(s, d)
      .select(col("doc_id"), col("lang"), col("logw_q"))
      .withColumn("u",
        (expr("cast(conv(substring(md5(concat('gum:', " +
          "cast(doc_id as string))), 1, 8), 16, 10) as double)") +
          lit(1.0)) / lit(4294967296.0))
      .withColumn("key_r",
        round(col("logw_q") / lit(10000.0) - log(-log(col("u"))), 4) +
          lit(0.0))
      .orderBy(col("key_r").desc, col("doc_id"))
      .limit(200)
      .select(col("doc_id"), col("lang"), col("logw_q"), col("key_r"))

  private val dsirResampleSql =
    """WITH wrd AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |wb AS (
      |  SELECT doc_id, lang,
      |    (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) AS b
      |  FROM wrd),
      |db AS (
      |  SELECT doc_id, lang, b, CAST(COUNT(*) AS BIGINT) AS k
      |  FROM wb GROUP BY 1, 2, 3),
      |d_cr AS (SELECT b, CAST(SUM(k) AS BIGINT) AS cr FROM db GROUP BY 1),
      |d_ct AS (SELECT b, CAST(SUM(k) AS BIGINT) AS ct FROM db
      |  WHERE lang = 'en' GROUP BY 1),
      |d_tot AS (SELECT CAST(SUM(k) AS BIGINT) AS nr,
      |  CAST(SUM(CASE WHEN lang = 'en' THEN k ELSE 0 END) AS BIGINT) AS nt
      |  FROM db),
      |model AS (
      |  SELECT d_cr.b, CAST(round(
      |    (ln((COALESCE(d_ct.ct, 0) + 1.0) / (d_tot.nt + 256.0)) -
      |     ln((d_cr.cr + 1.0) / (d_tot.nr + 256.0))) * 10000.0)
      |    AS BIGINT) AS lrq
      |  FROM d_cr LEFT JOIN d_ct ON d_cr.b = d_ct.b CROSS JOIN d_tot),
      |sel AS (
      |  SELECT db.doc_id, db.lang,
      |    CAST(SUM(k * lrq) AS BIGINT) AS logw_q
      |  FROM db JOIN model USING (b) GROUP BY 1, 2)
      |SELECT doc_id, lang, logw_q,
      |  ROUND(logw_q / 10000.0 - ln(-ln(
      |    (CAST('0x' || substr(md5('gum:' || CAST(doc_id AS VARCHAR)),
      |      1, 8) AS BIGINT) + 1.0) / 4294967296.0)), 4) + 0.0 AS key_r
      |FROM sel ORDER BY key_r DESC, doc_id LIMIT 200""".stripMargin

  // ---- N_DEDUP8: boilerplate-span REMOVAL (cleaned corpus) -----------

  /** RefinedWeb/CCNet-style boilerplate removal — the TRANSFORM stage
    * N_DEDUP7 only reports on: every fixed 10-token segment that occurs
    * in ≥2 distinct docs corpus-wide is REMOVED from each doc, and the
    * document text is REASSEMBLED from the surviving segments in their
    * original order (the sub-10-token tail piece is exempt — too short
    * to dedup — and always kept). Emits per-doc segment counts plus
    * md5/length of the cleaned text so the whole reconstructed corpus
    * is oracle-checked, not just the drop counts.
    *
    * Scale shape: identical to N_DEDUP7 (one md5-keyed shuffle for the
    * df counts, one doc_id-keyed reassembly agg) plus a bounded
    * per-doc collect — segments of ONE doc, the same width class the
    * reassembly operators already carry. Never doc×doc.
    */
  private def boilerplateRemoval(s: SparkSession, d: String): DataFrame = {
    val n = 10
    val toks = docs(s, d)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
    val segs = toks
      .select(col("doc_id"), posexplode(expr(
        s"case when size(t) < $n then array() else " +
          s"transform(sequence(0, size(t) div $n - 1), " +
          s"i -> array_join(slice(t, i * $n + 1, $n), ' ')) end"))
        .as(Seq("i", "seg")))
      .withColumn("is_full", lit(1))
    val tails = toks
      .select(col("doc_id"), (size(col("t")) / n).cast("int").as("i"),
        expr(s"array_join(slice(t, (size(t) div $n) * $n + 1, size(t)), ' ')")
          .as("seg"),
        lit(0).as("is_full"))
      .filter(col("seg") =!= "")
    val all = segs.union(tails).withColumn("h", md5(col("seg")))
    val perSeg = segs.select(md5(col("seg")).as("h"), col("doc_id"))
      .groupBy(col("h")).agg(count_distinct(col("doc_id")).as("nd"))
    all.join(perSeg, Seq("h"), "left")
      .withColumn("dropped",
        when(col("is_full") === 1 && col("nd") >= 2, 1L).otherwise(0L))
      .groupBy(col("doc_id")).agg(
        sum(col("is_full")).cast("long").as("n_segs"),
        sum(col("dropped")).as("n_dropped"),
        array_join(expr(
          "transform(array_sort(collect_list(case when dropped = 0 " +
            "then struct(i, seg) end)), x -> x.seg)"), " ").as("cleaned"))
      .select(col("doc_id"), col("n_segs"), col("n_dropped"),
        length(col("cleaned")).cast("long").as("n_chars_clean"),
        md5(col("cleaned")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  private val boilerplateRemovalSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |b_segs AS (
      |  SELECT doc_id, i, array_to_string(
      |    list_slice(t, i * 10 + 1, i * 10 + 10), ' ') AS seg, 1 AS is_full
      |  FROM toks, unnest(range(0, len(t) // 10)) AS u(i)),
      |b_tails AS (
      |  SELECT doc_id, len(t) // 10 AS i, array_to_string(
      |    list_slice(t, (len(t) // 10) * 10 + 1, len(t)), ' ') AS seg,
      |    0 AS is_full
      |  FROM toks
      |  WHERE array_to_string(
      |    list_slice(t, (len(t) // 10) * 10 + 1, len(t)), ' ') != ''),
      |b_all AS (SELECT * FROM b_segs UNION ALL SELECT * FROM b_tails),
      |b_perseg AS (
      |  SELECT md5(seg) AS h, COUNT(DISTINCT doc_id) AS nd
      |  FROM b_segs GROUP BY 1),
      |b_marked AS (
      |  SELECT a.doc_id, a.i, a.seg,  a.is_full,
      |    CASE WHEN a.is_full = 1 AND p.nd >= 2 THEN 1 ELSE 0 END AS dropped
      |  FROM b_all a LEFT JOIN b_perseg p ON md5(a.seg) = p.h),
      |b_perdoc AS (
      |  SELECT doc_id, CAST(SUM(is_full) AS BIGINT) AS n_segs,
      |    CAST(SUM(dropped) AS BIGINT) AS n_dropped,
      |    COALESCE(array_to_string(
      |      list(seg ORDER BY i) FILTER (WHERE dropped = 0), ' '), '')
      |      AS cleaned
      |  FROM b_marked GROUP BY 1)
      |SELECT doc_id, n_segs, n_dropped,
      |  CAST(length(cleaned) AS BIGINT) AS n_chars_clean,
      |  md5(cleaned) AS clean_md5
      |FROM b_perdoc ORDER BY doc_id""".stripMargin

  // ---- N_TEXT11: within-document repetition --------------------------

  /** Gopher's *intra*-document repetition signal, token-gram form: the
    * fraction of a doc's 5-gram occurrences that are repeats of an
    * earlier occurrence in the SAME doc ((total − distinct) / total,
    * per-mille). High values mark looping/boilerplate text that the
    * corpus-wide span dedup (N_DEDUP7) cannot see. Map-side partial
    * aggregation on (doc_id, gram); no joins at all.
    */
  private def intradocRepetition(s: SparkSession, d: String): DataFrame = {
    val grams = docs(s, d)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(TextOps.shingles("t", 5)).as("g"))
    grams.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_grams"),
        count(lit(1)).as("n_distinct_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct_grams"),
        expr("(n_grams - n_distinct_grams) * 1000 div n_grams")
          .as("rep_permille"))
      .orderBy(col("doc_id"))
  }

  private val intradocRepetitionSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |    array_to_string(list_slice(t, i + 1, i + 5), ' ') AS g
      |  FROM toks, unnest(range(0, len(t) - 4)) AS u(i)
      |  WHERE len(t) >= 5),
      |gc AS (SELECT doc_id, g, COUNT(*) AS cnt FROM grams GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
      |  CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
      |  CAST((SUM(cnt) - COUNT(*)) * 1000 // SUM(cnt) AS BIGINT)
      |    AS rep_permille
      |FROM gc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- N_SCORE1: model-scored quality (classifier-filter analogue) ---

  /** The "quality classifier" stage of published pipelines (fasttext/
    * logistic filters): score = sigmoid(w·x) over per-doc stats, with
    * FIXED published-style weights — the model is a broadcast constant,
    * scoring is map-only over the stats relation, and the keep decision
    * is a threshold. A trained model swaps in the same shape. Output
    * rounded to 4 dp (both engines evaluate the identical expression
    * tree on the same doubles).
    */
  private def qualityScore(s: SparkSession, d: String): DataFrame = {
    val z = lit(-2.0) +
      lit(0.55) * log(col("n_words").cast("double")) +
      lit(-3.0) * (col("top_permille").cast("double") / 1000.0) +
      lit(2.0) * (col("distinct_permille").cast("double") / 1000.0) +
      lit(4.0) * (col("stop_permille").cast("double") / 1000.0)
    gopherStats(s, d)
      .select(col("doc_id"),
        (round(lit(1.0) / (lit(1.0) + exp(-z)), 4) + lit(0.0)).as("score"))
      .withColumn("keep_scored", (col("score") >= 0.5).cast("long"))
      .orderBy(col("doc_id"))
  }

  private val qualityScoreSql = statsCte.dropRight(2) +
    """
      |SELECT doc_id,
      |  ROUND(1.0 / (1.0 + exp(-(-2.0 + 0.55 * ln(CAST(n_words AS DOUBLE))
      |    + -3.0 * (CAST(top_permille AS DOUBLE) / 1000.0)
      |    + 2.0 * (CAST(distinct_permille AS DOUBLE) / 1000.0)
      |    + 4.0 * (CAST(stop_permille AS DOUBLE) / 1000.0)))), 4) + 0.0
      |    AS score,
      |  CAST(ROUND(1.0 / (1.0 + exp(-(-2.0
      |    + 0.55 * ln(CAST(n_words AS DOUBLE))
      |    + -3.0 * (CAST(top_permille AS DOUBLE) / 1000.0)
      |    + 2.0 * (CAST(distinct_permille AS DOUBLE) / 1000.0)
      |    + 4.0 * (CAST(stop_permille AS DOUBLE) / 1000.0)))), 4) + 0.0
      |    >= 0.5 AS BIGINT) AS keep_scored
      |FROM st ORDER BY doc_id""".stripMargin

  // ---- N_SCORE2: LM-perplexity filter (CCNet analogue) ---------------

  /** The CCNet/RefinedWeb perplexity-filter stage: score every document
    * by a language-model negative log-likelihood and rank (head/tail
    * selection happens on this score). Stand-in model: a CHARACTER
    * TRIGRAM LM with add-one smoothing over the bigram prefix,
    * p(c₃|c₁c₂) = (c(g)+1) / (c(prefix)+V), trained on the corpus
    * itself — the real pipeline swaps in KenLM scores, the Spark shape
    * is identical.
    *
    * Scale shapes: the model is bounded by charset³ regardless of
    * corpus size, so both count relations BROADCAST and scoring is
    * map-only over the exploded trigram stream; the per-doc rollup is
    * one doc_id-keyed aggregation with map-side combine. Nothing
    * pairwise, nothing driver-side.
    *
    * Determinism (§7.4): each trigram's −ln p is FIXED-POINT-quantized
    * to a BIGINT (×10⁴) before the per-doc SUM, so the aggregation is
    * exact integer arithmetic — no float-sum ordering games; the final
    * divide/round is one identical expression in both engines.
    */
  private def lmPerplexity(s: SparkSession, d: String): DataFrame = {
    // Split once into a char array: substring(t, i, 3) is O(i) on
    // UTF8String (multibyte-aware scan from the start), which makes
    // positional extraction O(L²) per document — element_at on the
    // split array is O(1), so trigram extraction is O(L).
    // r18: hash-distribute docs BEFORE the char-trigram explode (the
    // dedup pipelines' barrier pattern) — the explode and the partial
    // (doc,trigram) aggregate otherwise run inside the scan stage,
    // which is ONE task on the single-row-group fixture files, and the
    // whole corpus' per-char work serializes no matter the core count.
    val ch = docs(s, d).select(col("doc_id"),
      split(lower(col("text")), "").as("a"))
      .transform(graft.operators.Distribute.by(_, col("doc_id")))
    val tri = ch
      .select(col("doc_id"), explode(when(size(col("a")) >= 3,
        expr("transform(sequence(1, size(a) - 2), i -> " +
          "concat(element_at(a, i), element_at(a, i + 1)," +
          " element_at(a, i + 2)))"))
        .otherwise(array())).as("g"))
    // ONE explode pass: per-(doc, trigram) multiplicities. Both the
    // model branch and the scoring branch consume this same shuffle
    // (ReuseExchange), so the corpus is tokenized exactly once.
    val dg = tri.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("k"))
    val tric = dg.groupBy(col("g")).agg(sum(col("k")).as("c"))
    val prec = tric.groupBy(substring(col("g"), 1, 2).as("p2"))
      .agg(sum(col("c")).as("cp"))
    val vsz = tric.select(countDistinct(substring(col("g"), 3, 1)).as("v"))
    // Fold counts + smoothing into ONE g → quantized-surprise map so
    // the hot scoring pass is a single broadcast join (the model
    // relations are charset³-bounded; only `dg` scales with the
    // corpus).
    val model = tric
      .withColumn("p2", substring(col("g"), 1, 2))
      .join(prec, "p2")
      .crossJoin(vsz)
      .select(col("g"),
        round(-log((col("c") + lit(1.0)) /
          (col("cp") + col("v"))) * lit(10000.0))
          .cast("long").as("nl"))
    dg.join(broadcast(model), "g")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_ngrams"),
        round(sum(col("k") * col("nl")) / lit(10000.0) / sum(col("k")), 3)
          .as("nll"))
      .orderBy(col("nll").desc, col("doc_id")).limit(200)
  }

  private val lmPerplexitySql =
    """WITH ch AS (
      |  SELECT doc_id, lower(text) AS t FROM documents),
      |tri AS (
      |  SELECT doc_id, substring(t, CAST(i AS INTEGER), 3) AS g
      |  FROM ch, UNNEST(range(1, length(t) - 1)) AS u(i)),
      |tric AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM tri GROUP BY g),
      |prec AS (SELECT substring(g, 1, 2) AS p2, SUM(c) AS cp
      |  FROM tric GROUP BY 1),
      |vsz AS (SELECT CAST(COUNT(DISTINCT substring(g, 3, 1)) AS BIGINT)
      |  AS v FROM tric),
      |scored AS (
      |  SELECT t.doc_id,
      |    CAST(ROUND(-LN((tc.c + 1.0) / (pc.cp + vz.v)) * 10000.0)
      |      AS BIGINT) AS nl
      |  FROM tri t
      |  JOIN tric tc ON t.g = tc.g
      |  JOIN prec pc ON substring(t.g, 1, 2) = pc.p2
      |  CROSS JOIN vsz vz)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
      |  ROUND(SUM(nl) / 10000.0 / COUNT(*), 3) AS nll
      |FROM scored GROUP BY doc_id
      |ORDER BY nll DESC, doc_id LIMIT 200""".stripMargin

  // ---- N_PIPE1: the staged curation funnel ---------------------------

  /** The end-to-end curation story, per language: how many documents
    * survive each published-pipeline stage —
    * n0 all → n1 quality keep → n2 exact-dedup winners (min doc_id per
    * content digest among quality survivors) → n3 span-dedup pass
    * (≤500‰ duplicated 10-token spans corpus-wide).
    *
    * Every stage is a doc_id-keyed semi-join/filter — the funnel adds
    * no shuffle shape beyond its ingredient operators, and the final
    * rollup aggregates four tiny per-language counts.
    */
  private def curationFunnel(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("lang"), col("text"))
    val s1 = base
      .join(gopherStats(s, d).select(col("doc_id"), col("keep")),
        Seq("doc_id"))
      .filter(col("keep") === 1L)
      .select(col("doc_id"), col("lang"),
        Dedup.contentDigest(col("text")).as("digest"))
    val s2 = s1
      .withColumn("m", min(col("doc_id"))
        .over(Window.partitionBy(col("digest"))))
      .filter(col("doc_id") === col("m"))
      .select(col("doc_id"), col("lang"))
    val s3 = s2
      .join(segmentStats(s, d).select(col("doc_id"), col("dup_permille")),
        Seq("doc_id"), "left")
      .filter(coalesce(col("dup_permille"), lit(0L)) <= 500)
      .select(col("doc_id"), col("lang"))
    def cnt(df: DataFrame, name: String): DataFrame =
      df.groupBy(col("lang")).agg(count(lit(1)).as(name))
    cnt(base, "n0")
      .join(cnt(s1, "n1"), Seq("lang"), "left")
      .join(cnt(s2, "n2"), Seq("lang"), "left")
      .join(cnt(s3, "n3"), Seq("lang"), "left")
      .select(col("lang"),
        col("n0"), coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"),
        coalesce(col("n3"), lit(0L)).as("n3"))
      .orderBy(col("lang"))
  }

  private val curationFunnelSql = statsCte + segCte +
    """s1 AS (
      |  SELECT d.doc_id, d.lang, md5(lower(trim(d.text))) AS digest
      |  FROM documents d JOIN st USING (doc_id) WHERE st.keep = 1),
      |s2 AS (
      |  SELECT doc_id, lang FROM (
      |    SELECT doc_id, lang,
      |      MIN(doc_id) OVER (PARTITION BY digest) AS m FROM s1)
      |  WHERE doc_id = m),
      |s3 AS (
      |  SELECT s2.doc_id, s2.lang FROM s2 LEFT JOIN perdoc USING (doc_id)
      |  WHERE COALESCE(n_dup_segs * 1000 // n_segs, 0) <= 500)
      |SELECT d.lang,
      |  CAST(COUNT(*) AS BIGINT) AS n0,
      |  CAST(COALESCE(MAX(c1.n), 0) AS BIGINT) AS n1,
      |  CAST(COALESCE(MAX(c2.n), 0) AS BIGINT) AS n2,
      |  CAST(COALESCE(MAX(c3.n), 0) AS BIGINT) AS n3
      |FROM documents d
      |LEFT JOIN (SELECT lang, COUNT(*) AS n FROM s1 GROUP BY 1) c1
      |  ON d.lang = c1.lang
      |LEFT JOIN (SELECT lang, COUNT(*) AS n FROM s2 GROUP BY 1) c2
      |  ON d.lang = c2.lang
      |LEFT JOIN (SELECT lang, COUNT(*) AS n FROM s3 GROUP BY 1) c3
      |  ON d.lang = c3.lang
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("N_TEXT10_gopher_quality", gopherQuality, Some(gopherQualitySql)),
    GQuery("N_DEDUP7_segment_dedup", segmentDedup, Some(segmentDedupSql)),
    GQuery("N_DEDUP8_boilerplate_removal", boilerplateRemoval,
      Some(boilerplateRemovalSql)),
    GQuery("N_TEXT11_intradoc_repetition", intradocRepetition,
      Some(intradocRepetitionSql)),
    GQuery("N_SCORE1_quality_classifier", qualityScore,
      Some(qualityScoreSql)),
    GQuery("N_SCORE2_lm_perplexity", lmPerplexity, Some(lmPerplexitySql)),
    GQuery("N_SCORE3_dsir_weights", dsirWeights, Some(dsirWeightsSql)),
    GQuery("N_SAMP4_dsir_resample", dsirResample, Some(dsirResampleSql)),
    GQuery("N_PIPE1_curation_funnel", curationFunnel, Some(curationFunnelSql)))
}
