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

  // ---------------------------------------------------------------
  // N_MIX2 — token-budget mixture SELECTION: turn the temperature
  // weights into an actual per-domain corpus pick. Budget = half the
  // corpus; per-source share ∝ sqrt(natural mass) (the N_MIX1
  // temperature, τ = 0.5); within a source, docs are taken in
  // (n_chars DESC, doc_id) priority until the running total passes
  // the source's budget. INTEGER arithmetic end to end — sqrt is
  // quantized (×1000, floor) BEFORE the share sum, so no float-sum
  // ordering can shift a budget across engines.
  //
  // Scale: one per-source aggregate, a ≤|sources| broadcast of
  // budgets, and ONE window cumsum partitioned by source — the
  // standard "materialize the recipe" pass at any corpus size.
  private def tokenBudget(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mass = docs(s, d).groupBy(col("source"))
      .agg(sum(col("n_chars")).cast("long").as("m"))
      .withColumn("q", floor(sqrt(col("m").cast("double")) * 1000)
        .cast("long"))
    val tot = mass.agg(sum(col("m")).cast("long").as("tm"),
      sum(col("q")).cast("long").as("tq"))
    // integer div end-to-end (Spark `/` on longs is a double divide);
    // the product stays < 2^63 up to ~petabyte corpora — past that,
    // divide tm first
    val budgets = mass.crossJoin(broadcast(tot))
      .select(col("source"),
        expr("(tm div 2) * q div tq").cast("long").as("budget_chars"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(w))
      .join(broadcast(budgets), "source")
      .filter(col("cum") <= col("budget_chars"))
      .groupBy(col("source"), col("budget_chars"))
      .agg(count(lit(1)).as("n_picked"),
        sum(col("n_chars")).cast("long").as("picked_chars"))
      .orderBy(col("source"))
  }

  private val tokenBudgetSql =
    """WITH mass AS (
      |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS m,
      |    CAST(floor(sqrt(CAST(sum(n_chars) AS DOUBLE)) * 1000)
      |      AS BIGINT) AS q
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(m) AS BIGINT) AS tm,
      |  CAST(sum(q) AS BIGINT) AS tq FROM mass),
      |budgets AS (
      |  SELECT source,
      |    CAST(((tm // 2) * q) // tq AS BIGINT) AS budget_chars
      |  FROM mass CROSS JOIN tot),
      |cum AS (
      |  SELECT source, doc_id, n_chars,
      |    SUM(n_chars) OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM documents)
      |SELECT c.source, b.budget_chars,
      |  CAST(COUNT(*) AS BIGINT) AS n_picked,
      |  CAST(SUM(c.n_chars) AS BIGINT) AS picked_chars
      |FROM cum c JOIN budgets b ON c.source = b.source
      |WHERE c.cum <= b.budget_chars
      |GROUP BY c.source, b.budget_chars
      |ORDER BY c.source""".stripMargin

  // ---------------------------------------------------------------
  // N_SPLIT1 — leakage-safe train/val/test split: the split key is
  // the SOURCE (domain), hashed deterministically (md5 prefix →
  // bucket mod 100, 80/10/10), so every document of a domain lands
  // in ONE split — the standard guard against near-duplicate
  // train/eval leakage through shared provenance. Stats per
  // (split, lang) prove the assignment; stable across runs and
  // engines by construction.
  private def leakageSplit(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("bucket",
        expr("cast(conv(substr(md5(source), 1, 6), 16, 10) as bigint)" +
          " % 100"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("n_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("split"), col("lang"))

  private val leakageSplitSql =
    """WITH b AS (
      |  SELECT *, CAST('0x' || substr(md5(source), 1, 6) AS BIGINT)
      |    % 100 AS bucket
      |  FROM documents),
      |sp AS (
      |  SELECT *, CASE WHEN bucket < 80 THEN 'train'
      |    WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      |  FROM b)
      |SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      |FROM sp GROUP BY split, lang ORDER BY split, lang""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("N_MIX1_domain_weights", mixWeights, Some(mixWeightsSql)),
    GQuery("N_MIX2_token_budget", tokenBudget, Some(tokenBudgetSql)),
    GQuery("N_SPLIT1_leakage_split", leakageSplit, Some(leakageSplitSql)),
    GQuery("N_TOK2_vocab_coverage", vocabCoverage, Some(vocabCoverageSql)),
    GQuery("N_LEN1_length_histogram", lengthHistogram,
      Some(lengthHistogramSql)))
}
