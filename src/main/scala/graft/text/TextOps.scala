package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-pipeline surface (SURVEY table
  * N): tokenization, shingling, fingerprinting, quality stats. All are
  * Column-level expressions built from Spark HOFs — codegen'd, no UDFs
  * — so they vectorize inside WholeStageCodegen and scale linearly
  * with no shuffle of their own.
  *
  * Cross-engine determinism: hashing is md5-based only (SURVEY §7.4
  * rule 6); every function here has a 1:1 DuckDB spelling used by the
  * oracle twins in [[graft.queries.NorthStar]].
  */
object TextOps {

  /** Whitespace tokenizer (the fixture corpus is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles: ["a b c", "b c d", …] for n=3.
    * Empty when the document has fewer than n tokens.
    */
  def shingles(toks: String, n: Int = 3): Column = {
    val t = toks
    // Explicit empty-case guard: Spark's sequence(0, -1) counts DOWN
    // ([0, -1]) instead of producing an empty array.
    expr(s"case when size($t) < $n then array() else " +
      s"transform(sequence(0, size($t) - $n), " +
      s"i -> array_join(slice($t, i + 1, $n), ' ')) end")
  }

  /** Polynomial rolling-hash fingerprint of the token-length sequence
    * (mod 1e9+7) — an order-sensitive document signature.
    */
  def rollingFingerprint(toks: String): Column = {
    val t = toks
    expr(s"aggregate($t, 0L, (a, tok) -> (a * 31 + length(tok)) % 1000000007)")
  }

  /** 16-bit simhash over the distinct token set, as a '0'/'1' string.
    * Bit b is the sign of the sum over tokens of ±1, where +1 iff the
    * b-th hex digit of md5(token) has its high bit set — portable to
    * any engine with md5 + substr (no engine-specific hash).
    */
  def simhash16(toks: String): Column = {
    val t = s"array_distinct($toks)"
    expr(
      s"""array_join(transform(sequence(0, 15), b ->
         |  case when aggregate($t, 0, (a, tok) ->
         |    a + (case when instr('89abcdef', substr(md5(tok), b + 1, 1)) > 0
         |         then 1 else -1 end)) >= 0
         |  then '1' else '0' end), '')""".stripMargin)
  }
}
