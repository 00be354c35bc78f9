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

  test("signatures from the distinct-shingle relation are bit-identical " +
    "to the relational pipeline (r18)") {
    // min over a multiset = min over its distinct set, so the shared
    // one-corpus-pass form (minhashSignaturesFromShingles over
    // shingleRows) must reproduce minhashSignaturesRelational exactly —
    // including repeated shingles ("the quick" twice in doc 1) and the
    // no-shingle doc 4 being absent from BOTH outputs.
    val idText = Seq(
      (1L, "the quick brown fox the quick brown cat"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox"),
      (4L, "too short")).toDF("id", "text")
    val a = Dedup.minhashSignaturesRelational(idText)
    val b = Dedup.minhashSignaturesFromShingles(Dedup.shingleRows(idText))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() == 3 && a.filter(col("id") === 4L).isEmpty)
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

  test("dedupClustersFixpoint converges past the fixed-round horizon") {
    // Chain 1-2-3-4-5-6 has diameter 5: 3 fixed rounds leave it split,
    // the fixpoint form must converge it to a single label-1 component
    // (and stop on its own — changed-label count hits 0).
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    val capped = Dedup.dedupClusters(pairs, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(capped.values.toSet.size > 1) // honest cap: still split
    val fixed0 = Dedup.dedupClustersFixpoint(pairs)
    // the eager per-round localCheckpoint keeps lineage ONE round
    // deep: whatever the round count, the returned plan is a
    // checkpointed leaf, never a per-round-doubling join tree
    val plan = fixed0.queryExecution.optimizedPlan
    assert(plan.collectLeaves().length == 1 &&
      plan.treeString.linesIterator.length <= 3, plan.treeString)
    val fixed = fixed0.as[(Long, Long)].collect().toMap
    assert(fixed == (1L to 6L).map(_ -> 1L).toMap)
    // the runaway cap FAILS BY NAME instead of silently returning a
    // split result under fixpoint semantics
    val e = intercept[IllegalStateException] {
      Dedup.dedupClustersFixpoint(pairs, maxRounds = 2) }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }

  test("repeatedSpans: cross-doc 5-grams flag, intra-doc repetition " +
    "and short docs do not") {
    val docs = Seq(
      // docs 1 and 2 share exactly one 5-gram ("a b c d e"); each
      // has 2 spans total
      (1L, "a b c d e f"),
      (2L, "a b c d e g"),
      // doc 3 repeats ITS OWN 5-gram (w x y z w x y z w) — intra-doc
      // repetition dedups away, no cross-doc duplicate
      (3L, "w x y z w x y z w"),
      // doc 4 is shorter than 5 tokens — no spans at all
      (4L, "tiny doc")
    ).toDF("id", "text")
    val out = Dedup.repeatedSpans(docs)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5)),
      out.toSeq)
  }

  test("jaccardOnCandidates: no forced broadcast, hot bucket completes") {
    // 40 docs sharing one hot band → 780 candidate pairs; the verify
    // join must complete without a broadcast HINT on the candidate
    // side (AQE may still choose broadcast from the real size — the
    // hazard is forcing it regardless of size).
    val docs = (1L to 40L).map(i => (i, "common boilerplate text here"))
    val shingleRows = docs.toDF("id", "text")
      .select(col("id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("sh2", explode(TextOps.shingles("toks")))
      .groupBy(col("id"), col("sh2")).agg(count(lit(1)))
      .groupBy(col("id"))
      .agg(collect_list(col("sh2")).as("shs"))
      .select(col("id"), size(col("shs")).as("n_sh"),
        explode(col("shs")).as("sh2"))
    val cand = docs.map(_._1).combinations(2)
      .map { case Seq(a, b) => (a, b) }.toSeq.toDF("id_a", "id_b")
    val out = Dedup.jaccardOnCandidates(cand, shingleRows)
    assert(!out.queryExecution.analyzed.toString.contains("ResolvedHint"))
    val rows = out.collect()
    assert(rows.length == 780 && rows.forall(_.getAs[Double]("jac") == 1.0))
  }

  test("simhash: identical docs equal, unrelated docs differ") {
    val h = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "completely other tokens entirely"))
      .toDF("id", "text")
      .select(col("id"), TextOps.tokens(col("text")).as("toks"))
      .select(TextOps.simhash16("toks").as("h")).as[String].collect()
    assert(h(0) == h(1) && h(0) != h(2) && h(0).length == 16)
  }

  test("fast (xxhash64) pipeline verifies to the same near-dup pairs") {
    // The md5 form is for oracle parity; the production path hashes
    // with codegen'd xxhash64. LSH candidates MAY differ between hash
    // families — but after the Jaccard VERIFY stage the surviving
    // pairs must agree, because verification depends only on the
    // shingle sets.
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id").as("id"), col("text"))

    def verified(cand: org.apache.spark.sql.DataFrame) = {
      val shingleRows = docs
        .select(col("id"), TextOps.tokens(col("text")).as("toks"))
        .repartition(col("id"))
        .withColumn("sh", array_distinct(TextOps.shingles("toks")))
        .filter(size(col("sh")) > 0)
        .select(col("id"), size(col("sh")).as("n_sh"),
          explode(col("sh")).as("sh2"))
      Dedup.jaccardOnCandidates(cand, shingleRows)
        .filter(col("jac") >= 0.5)
        .select(col("id_a"), col("id_b"))
    }

    val md5Pairs = verified(Dedup.lshCandidatePairs(
      Dedup.minhashSignaturesRelational(docs)
        .withColumn("bands", Dedup.lshBands("sig"))))
    val fastPairs = verified(Dedup.lshCandidatePairs(
      Dedup.minhashSignaturesFast(docs)
        .withColumn("bands", Dedup.lshBandsFast("sig"))))
    assert(md5Pairs.count() > 0, "fixture should contain near-dups")
    assert(fastPairs.except(md5Pairs).isEmpty &&
      md5Pairs.except(fastPairs).isEmpty)

    // and the fast signatures are deterministic across runs
    val s1 = Dedup.minhashSignaturesFast(docs)
    val s2 = Dedup.minhashSignaturesFast(docs)
    assert(s1.except(s2).isEmpty && s2.except(s1).isEmpty)
  }
}
