package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}
import graft.text.TextOps

/** Training-mixture composition operators (round 8): the pre-training
  * data-recipe layer that sits AFTER curation (Quality.scala's funnel)
  * and BEFORE packing (N_PACK1) — how much of each domain to sample,
  * what the tokenizer covers, and what sequence-length padding costs.
  *
  * Scale notes (100 TB): every query here is one or two hash
  * aggregations over the token/document stream with map-side combine;
  * the "global" denominators are single-row or ≤|domains| relations
  * that broadcast. Nothing is per-document-pair, nothing shuffles
  * more than (group-key cardinality) rows.
  */
object Mixing {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  // ---------------------------------------------------------------
  // N_MIX1 — temperature-scaled domain mixture weights (the
  // multilingual-sampling / DoReMi-lite recipe): per (lang, source)
  // token mass, reweighted by count^α (α = 0.5) and normalized into
  // sampling weights. The α<1 temperature upsamples the tail — the
  // standard fix for low-resource domains being drowned out.
  private def mixWeights(s: SparkSession, d: String): DataFrame = {
    val mass = docs(s, d)
      .select(col("lang"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n")).cast("long").as("tok_mass"))
    val total = mass.agg(
      sum(sqrt(col("tok_mass").cast("double"))).as("z"))
    mass.crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("tok_mass"),
        round(sqrt(col("tok_mass").cast("double")) / col("z"), 6)
          .as("mix_weight"))
      .orderBy(col("lang"), col("source"))
  }

  private val mixWeightsSql =
    """WITH mass AS (
      |  SELECT lang, source,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_mass
      |  FROM documents GROUP BY lang, source),
      |z AS (SELECT sum(sqrt(CAST(tok_mass AS DOUBLE))) AS z FROM mass)
      |SELECT lang, source, tok_mass,
      |  round(sqrt(CAST(tok_mass AS DOUBLE)) / z, 6) AS mix_weight
      |FROM mass CROSS JOIN z
      |ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------
  // N_TOK2 — vocabulary coverage / OOV rate: given the top-16 global
  // tokens as the "vocabulary", the fraction of each language's token
  // OCCURRENCES it fails to cover. The vocab is a ≤16-row broadcast;
  // the corpus side stays a single counting aggregation.
  private def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val occ = docs(s, d)
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val vocab = broadcast(occ.groupBy(col("tok"))
      .agg(sum(col("cnt")).cast("long").as("tot"))
      .orderBy(col("tot").desc, col("tok"))
      .limit(16)
      .select(col("tok")))
    occ.join(vocab.withColumn("in_vocab", lit(1L)), Seq("tok"), "left")
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).cast("long").as("total_toks"),
        sum(when(col("in_vocab").isNotNull, col("cnt")).otherwise(0L))
          .cast("long").as("covered_toks"))
      .select(col("lang"), col("total_toks"), col("covered_toks"),
        round(lit(1000.0) * (col("total_toks") - col("covered_toks"))
          / col("total_toks"), 4).as("oov_per_mille"))
      .orderBy(col("lang"))
  }

  private val vocabCoverageSql =
    """WITH occ AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |cnts AS (
      |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
      |  FROM occ GROUP BY lang, tok),
      |vocab AS (
      |  SELECT tok FROM (
      |    SELECT tok, sum(cnt) AS tot FROM cnts GROUP BY tok
      |    ORDER BY tot DESC, tok LIMIT 16)),
      |agg AS (
      |  SELECT lang, CAST(sum(cnt) AS BIGINT) AS total_toks,
      |    CAST(sum(CASE WHEN tok IN (SELECT tok FROM vocab)
      |             THEN cnt ELSE 0 END) AS BIGINT) AS covered_toks
      |  FROM cnts GROUP BY lang)
      |SELECT lang, total_toks, covered_toks,
      |  round(1000.0 * (total_toks - covered_toks) / total_toks, 4)
      |    AS oov_per_mille
      |FROM agg ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // N_LEN1 — sequence-length histogram + padding efficiency: docs
  // binned to fixed power-of-two context buckets; per (lang, bucket)
  // the doc count, token mass, and the efficiency lost to padding if
  // each doc were padded to its bucket boundary (the no-packing
  // baseline N_PACK1's shard packing is measured against).
  private def lengthHistogram(s: SparkSession, d: String): DataFrame = {
    val lens = docs(s, d)
      .select(col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .withColumn("bucket",
        when(col("n") <= 32, 32L).when(col("n") <= 64, 64L)
          .when(col("n") <= 128, 128L).when(col("n") <= 256, 256L)
          .when(col("n") <= 512, 512L).otherwise(1024L))
    lens.groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n")).cast("long").as("tok_mass"),
        sum(col("bucket") - col("n")).cast("long").as("pad_waste"))
      .select(col("lang"), col("bucket"), col("n_docs"), col("tok_mass"),
        col("pad_waste"),
        round(col("tok_mass").cast("double")
          / (col("tok_mass") + col("pad_waste")), 4).as("pad_efficiency"))
      .orderBy(col("lang"), col("bucket"))
  }

  private val lengthHistogramSql =
    """WITH lens AS (
      |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents),
      |b AS (
      |  SELECT lang, n,
      |    CASE WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64
      |         WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256
      |         WHEN n <= 512 THEN 512 ELSE 1024 END AS bucket
      |  FROM lens)
      |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS tok_mass,
      |  CAST(sum(bucket - n) AS BIGINT) AS pad_waste,
      |  round(CAST(sum(n) AS DOUBLE)
      |    / (sum(n) + sum(bucket - n)), 4) AS pad_efficiency
      |FROM b GROUP BY lang, bucket
      |ORDER BY lang, bucket""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("N_MIX1_domain_weights", mixWeights, Some(mixWeightsSql)),
    GQuery("N_TOK2_vocab_coverage", vocabCoverage, Some(vocabCoverageSql)),
    GQuery("N_LEN1_length_histogram", lengthHistogram,
      Some(lengthHistogramSql)))
}
