package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextOps

class DedupSpec extends GraftSpec {
  import spark.implicits._

  private def sigOf(texts: Seq[(Long, String)]) =
    texts.toDF("id", "text")
      .select(col("id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("shingles", TextOps.shingles("toks"))
      .withColumn("sig", Dedup.minhashSignature("shingles"))

  test("identical docs get identical minhash signatures") {
    val sigs = sigOf(Seq((1L, "a b c d e f"), (2L, "a b c d e f")))
      .select("sig").as[Seq[String]].collect()
    assert(sigs(0) == sigs(1))
  }

  test("near-dup docs share LSH band; disjoint docs don't") {
    // r=1 (singleton bands) keeps the test deterministic-ish: docs 1/2
    // share 8 of 9 shingles, so at least one of the 8 signature minima
    // almost surely lands on a shared shingle; doc 3 shares none, so
    // NO signature element can collide (md5 minima over disjoint sets).
    val df = sigOf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "entirely different words compose this third document here")))
      .withColumn("bands", Dedup.lshBands("sig", k = 8, r = 1))
    val pairs = Dedup.lshCandidatePairs(df.select(col("id"), col("bands")))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("exact dedup groups only true duplicates (incl. case/trim)") {
    val out = Dedup.exact(
      Seq((1L, "Hello World"), (2L, "  hello world "), (3L, "bye"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("jaccard: identical sets → 1, disjoint → 0") {
    val df = Seq((Array("a", "b"), Array("a", "b"), Array("c", "d")))
      .toDF("x", "y", "z")
      .select(Dedup.jaccard(col("x"), col("y")).as("same"),
        Dedup.jaccard(col("x"), col("z")).as("disjoint"))
    val (same, disjoint) = df.as[(Double, Double)].head()
    assert(same == 1.0 && disjoint == 0.0)
  }

  test("dedupClusters merges chains into one component") {
    // Chain 1-2-3 (never paired directly 1-3) plus isolated pair 8-9:
    // 3 propagation rounds must give {1,2,3} label 1 and {8,9} label 8.
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("id_a", "id_b")
    val lbl = Dedup.dedupClusters(pairs, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(lbl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("simhash: identical docs equal, unrelated docs differ") {
    val h = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "completely other tokens entirely"))
      .toDF("id", "text")
      .select(col("id"), TextOps.tokens(col("text")).as("toks"))
      .select(TextOps.simhash16("toks").as("h")).as[String].collect()
    assert(h(0) == h(1) && h(0) != h(2) && h(0).length == 16)
  }
}
