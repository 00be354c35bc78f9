package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{GQuery, Tables}

/** N_TOK3 — the BPE trainer's inner step: from a word-frequency
  * table, find the highest-weight adjacent symbol pair, merge it
  * corpus-wide, and repeat — two rounds here, emitting both learned
  * merge rules with their weighted counts (the loop
  * Sennrich-style subword tokenizers run to build their merges.txt,
  * modulo the repeated-run caveat below).
  *
  * Symbol strings are `·`-delimited (`word` → `·w·o·r·d·`) and a pair
  * (x, y) is searched as `·x·y·` — the delimiter makes the string
  * replace SYMBOL-BOUNDARY-SAFE (a multi-char merged symbol can never
  * be half-matched by a later pair search). One documented deviation
  * from a reference trainer: inside a RUN of ≥3 repeated symbols the
  * consumed shared delimiter blocks the immediately-adjacent re-match
  * (`a a a a` merges to `aa a a`, not `aa aa`, within one round) —
  * RE2-compatible SQL string replace cannot express the
  * lookahead-style merge, and BOTH engines compute this identical
  * variant, so the oracle comparison stays exact.
  *
  * Scale notes: each round is (word-freq table) → explode adjacent
  * pairs → one counting aggregation → a ONE-ROW top-1 that broadcasts
  * into the next round's `replace`. The corpus-size work is the
  * word-frequency table (computed once); rounds operate on the
  * distinct-word relation (tiny), so adding rounds costs O(|vocab|)
  * each — the standard trainer layout at any corpus size.
  */
object Bpe {

  private def run(s: SparkSession, d: String): DataFrame = {
    // r18 barrier: distribute the corpus before the word explode +
    // word-frequency aggregate (one-task scan stage otherwise)
    Tables.documents(s, d)
      .transform(graft.operators.Distribute.by(_, org.apache.spark.sql.functions.col("doc_id")))
      .createOrReplaceTempView("documents_v")
    s.sql(
      """WITH toks AS (
        |  SELECT explode(split(text, ' ')) AS tok FROM documents_v),
        |w AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS freq
        |  FROM toks WHERE tok != '' GROUP BY tok),
        |s0 AS (
        |  SELECT concat('·', regexp_replace(tok, '(.)', '$1·')) AS sym,
        |    freq
        |  FROM w),
        |p0 AS (
        |  SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |    SELECT explode(transform(sequence(1, size(syms) - 1),
        |      i -> concat(element_at(syms, i), ' ',
        |                  element_at(syms, i + 1)))) AS pr, freq
        |    FROM (SELECT filter(split(sym, '·'), x -> x != '') AS syms,
        |          freq FROM s0)
        |    WHERE size(syms) >= 2)
        |  GROUP BY pr ORDER BY cnt DESC, pr LIMIT 1),
        |s1 AS (
        |  SELECT replace(sym,
        |    concat('·', replace(p0.pr, ' ', '·'), '·'),
        |    concat('·', replace(p0.pr, ' ', ''), '·')) AS sym, freq
        |  FROM s0 CROSS JOIN p0),
        |p1 AS (
        |  SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |    SELECT explode(transform(sequence(1, size(syms) - 1),
        |      i -> concat(element_at(syms, i), ' ',
        |                  element_at(syms, i + 1)))) AS pr, freq
        |    FROM (SELECT filter(split(sym, '·'), x -> x != '') AS syms,
        |          freq FROM s1)
        |    WHERE size(syms) >= 2)
        |  GROUP BY pr ORDER BY cnt DESC, pr LIMIT 1)
        |SELECT p0.pr AS merge1, p0.cnt AS count1,
        |       p1.pr AS merge2, p1.cnt AS count2
        |FROM p0 CROSS JOIN p1""".stripMargin)
  }

  private val oracleSql =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |w AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS freq
      |  FROM toks WHERE tok != '' GROUP BY tok),
      |s0 AS (
      |  SELECT '·' || regexp_replace(tok, '(.)', '\1·', 'g') AS sym,
      |    freq
      |  FROM w),
      |e0 AS (
      |  SELECT unnest(list_transform(range(1, len(syms)),
      |      i -> syms[i] || ' ' || syms[i + 1])) AS pr, freq
      |  FROM (SELECT list_filter(string_split(sym, '·'),
      |          x -> x != '') AS syms, freq FROM s0)
      |  WHERE len(syms) >= 2),
      |p0 AS (
      |  SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM e0
      |  GROUP BY pr ORDER BY cnt DESC, pr LIMIT 1),
      |s1 AS (
      |  SELECT replace(sym,
      |    '·' || replace(p0.pr, ' ', '·') || '·',
      |    '·' || replace(p0.pr, ' ', '') || '·') AS sym, freq
      |  FROM s0 CROSS JOIN p0),
      |e1 AS (
      |  SELECT unnest(list_transform(range(1, len(syms)),
      |      i -> syms[i] || ' ' || syms[i + 1])) AS pr, freq
      |  FROM (SELECT list_filter(string_split(sym, '·'),
      |          x -> x != '') AS syms, freq FROM s1)
      |  WHERE len(syms) >= 2),
      |p1 AS (
      |  SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM e1
      |  GROUP BY pr ORDER BY cnt DESC, pr LIMIT 1)
      |SELECT p0.pr AS merge1, p0.cnt AS count1,
      |       p1.pr AS merge2, p1.cnt AS count2
      |FROM p0 CROSS JOIN p1""".stripMargin

  /** N_TOK4 — BPE ENCODE: apply the learned merges corpus-wide and
    * report the resulting token vocabulary (top tokens by weighted
    * frequency) — the trainer's output turned into the tokenizer's
    * view of the corpus. The apply step is the trainer's own
    * replace-fold (delimiter-safe, identical in both engines); the
    * count is one weighted aggregation over the encoded distinct-word
    * relation, so corpus-size work is still only the word-frequency
    * table.
    */
  private def encode(s: SparkSession, d: String): DataFrame = {
    // r18 barrier: distribute the corpus before the word explode +
    // word-frequency aggregate (one-task scan stage otherwise)
    Tables.documents(s, d)
      .transform(graft.operators.Distribute.by(_, org.apache.spark.sql.functions.col("doc_id")))
      .createOrReplaceTempView("documents_v")
    s.sql(
      """WITH toks AS (
        |  SELECT explode(split(text, ' ')) AS tok FROM documents_v),
        |w AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS freq
        |  FROM toks WHERE tok != '' GROUP BY tok),
        |s0 AS (
        |  SELECT concat('·', regexp_replace(tok, '(.)', '$1·')) AS sym,
        |    freq
        |  FROM w),
        |p0 AS (
        |  SELECT pr FROM (
        |    SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |      SELECT explode(transform(sequence(1, size(syms) - 1),
        |        i -> concat(element_at(syms, i), ' ',
        |                    element_at(syms, i + 1)))) AS pr, freq
        |      FROM (SELECT filter(split(sym, '·'), x -> x != '') AS syms,
        |            freq FROM s0)
        |      WHERE size(syms) >= 2)
        |    GROUP BY pr ORDER BY cnt DESC, pr LIMIT 1)),
        |s1 AS (
        |  SELECT replace(sym,
        |    concat('·', replace(p0.pr, ' ', '·'), '·'),
        |    concat('·', replace(p0.pr, ' ', ''), '·')) AS sym, freq
        |  FROM s0 CROSS JOIN p0),
        |p1 AS (
        |  SELECT pr FROM (
        |    SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |      SELECT explode(transform(sequence(1, size(syms) - 1),
        |        i -> concat(element_at(syms, i), ' ',
        |                    element_at(syms, i + 1)))) AS pr, freq
        |      FROM (SELECT filter(split(sym, '·'), x -> x != '') AS syms,
        |            freq FROM s1)
        |      WHERE size(syms) >= 2)
        |    GROUP BY pr ORDER BY cnt DESC, pr LIMIT 1)),
        |s2 AS (
        |  SELECT replace(sym,
        |    concat('·', replace(p1.pr, ' ', '·'), '·'),
        |    concat('·', replace(p1.pr, ' ', ''), '·')) AS sym, freq
        |  FROM s1 CROSS JOIN p1)
        |SELECT token, CAST(sum(freq) AS BIGINT) AS cnt
        |FROM (
        |  SELECT explode(filter(split(sym, '·'), x -> x != '')) AS token,
        |    freq
        |  FROM s2)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 30""".stripMargin)
  }

  private val encodeOracleSql =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |w AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS freq
      |  FROM toks WHERE tok != '' GROUP BY tok),
      |s0 AS (
      |  SELECT '·' || regexp_replace(tok, '(.)', '\1·', 'g') AS sym,
      |    freq
      |  FROM w),
      |e0 AS (
      |  SELECT unnest(list_transform(range(1, len(syms)),
      |      i -> syms[i] || ' ' || syms[i + 1])) AS pr, freq
      |  FROM (SELECT list_filter(string_split(sym, '·'),
      |          x -> x != '') AS syms, freq FROM s0)
      |  WHERE len(syms) >= 2),
      |p0 AS (
      |  SELECT pr FROM (
      |    SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM e0
      |    GROUP BY pr ORDER BY cnt DESC, pr LIMIT 1)),
      |s1 AS (
      |  SELECT replace(sym,
      |    '·' || replace(p0.pr, ' ', '·') || '·',
      |    '·' || replace(p0.pr, ' ', '') || '·') AS sym, freq
      |  FROM s0 CROSS JOIN p0),
      |e1 AS (
      |  SELECT unnest(list_transform(range(1, len(syms)),
      |      i -> syms[i] || ' ' || syms[i + 1])) AS pr, freq
      |  FROM (SELECT list_filter(string_split(sym, '·'),
      |          x -> x != '') AS syms, freq FROM s1)
      |  WHERE len(syms) >= 2),
      |p1 AS (
      |  SELECT pr FROM (
      |    SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM e1
      |    GROUP BY pr ORDER BY cnt DESC, pr LIMIT 1)),
      |s2 AS (
      |  SELECT replace(sym,
      |    '·' || replace(p1.pr, ' ', '·') || '·',
      |    '·' || replace(p1.pr, ' ', '') || '·') AS sym, freq
      |  FROM s1 CROSS JOIN p1),
      |enc AS (
      |  SELECT unnest(list_filter(string_split(sym, '·'),
      |      x -> x != '')) AS token, freq
      |  FROM s2)
      |SELECT token, CAST(sum(freq) AS BIGINT) AS cnt
      |FROM enc GROUP BY token ORDER BY cnt DESC, token LIMIT 30""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("N_TOK3_bpe_merges", run, Some(oracleSql)),
    GQuery("N_TOK4_bpe_encode", encode, Some(encodeOracleSql)))
}
