package graft

import org.apache.spark.sql.functions._
import graft.cassandra.{CellModel => CM}
import graft.operators.RangeJoin
import graft.sim.Similarity

/** Properties of the round-3 operators: binned range join parity with
  * the naive non-equi form, compaction tombstone-GC invariants, and
  * hyperplane-LSH bucket determinism/scale-invariance.
  */
class OperatorSpec extends GraftSpec {

  private lazy val events = Tables.events(spark, sf())

  test("RangeJoin.binned equals the naive non-equi join") {
    val p = events.filter(col("event_type") === "purchase").select(
      col("event_id").as("purchase_id"),
      (col("ts") - expr("INTERVAL 5 MINUTE")).as("lo"), col("ts").as("hi"))
    val c = events.filter(col("event_type") === "click").select(
      col("event_id").as("click_id"), col("ts").as("c_ts"))
    val binned = RangeJoin.binned(c, col("c_ts"), p, col("lo"), col("hi"),
        width = 300L)
      .select(col("purchase_id"), col("click_id"))
    val naive = c.join(p,
        col("c_ts") >= col("lo") && col("c_ts") <= col("hi"))
      .select(col("purchase_id"), col("click_id"))
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    // and each qualifying pair appears exactly once (no bin double-count)
    assert(binned.count() === binned.distinct().count())
  }

  test("RangeJoin.binned covers pairs straddling a bin boundary") {
    // A width chosen much smaller than the interval span forces every
    // interval to explode over many bins; parity must still hold.
    val p = events.filter(col("event_type") === "purchase")
      .filter(col("event_id") % 20 === 0).select(
      col("event_id").as("purchase_id"),
      (col("ts") - expr("INTERVAL 5 MINUTE")).as("lo"), col("ts").as("hi"))
    val c = events.filter(col("event_type") === "click").select(
      col("event_id").as("click_id"), col("ts").as("c_ts"))
    val binned = RangeJoin.binned(c, col("c_ts"), p, col("lo"), col("hi"),
        width = 7L)
      .select(col("purchase_id"), col("click_id"))
    val naive = c.join(p,
        col("c_ts") >= col("lo") && col("c_ts") <= col("hi"))
      .select(col("purchase_id"), col("click_id"))
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("compaction: tombstone GC splits every marker, grace bounds behave") {
    val cd = CM.cellDeletions(spark, sf())
    val pd = CM.partitionDeletions(spark, sf())
    val rd = CM.rangeDeletions(spark, sf())
    val total = cd.count() + pd.count() + rd.count()
    val gc = CM.tombstoneGc(cd, pd, rd).cache()
    assert(gc.count() === total)
    // grace = infinity → nothing purged; grace covering all time → all
    // markers older than the cutoff purged
    val keepAll = CM.tombstoneGc(cd, pd, rd, graceMs = Long.MaxValue)
    assert(keepAll.filter(col("purged")).count() === 0)
    val purgeAll = CM.tombstoneGc(cd, pd, rd, t = Long.MaxValue,
      graceMs = 0L)
    assert(purgeAll.filter(col("purged")).count() === total)
    gc.unpersist()
  }

  test("compaction live set is a subset of the LWW merge") {
    val cells = CM.cells(spark, sf())
    val live = CM.compactLive(cells, CM.cellDeletions(spark, sf()),
      CM.partitionDeletions(spark, sf()), CM.rangeDeletions(spark, sf()))
    val lww = CM.lwwMerge(cells)
    assert(live.exceptAll(lww).isEmpty)
    assert(live.count() < lww.count()) // tombstones/TTL really dropped
  }

  test("native ShingleGenerator equals the HOF explode(transform) form") {
    GraftExtensions.register(spark)
    val d = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"))
    val native = d.select(col("doc_id"),
      expr("graft_shingles(text, 3)").as("shingle"))
    val hof = d.select(col("doc_id"),
      graft.text.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(graft.text.TextOps.shingles("toks")).as("shingle"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    // null text and docs shorter than n emit no rows, not nulls
    import spark.implicits._
    val edge = Seq((1L, null: String), (2L, "a b"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val rows = edge.select(col("doc_id"),
      expr("graft_shingles(text, 3)").as("shingle")).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(3L))
    assert(rows.head.getString(1) === "a b c")
  }

  test("hyperplane buckets are deterministic and scale-invariant") {
    val e = Tables.embeddings(spark, sf())
      .limit(64)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val b1 = Similarity.hyperplaneBuckets(e, "vec")
      .select(col("vec_id"), col("band"), col("bucket"))
    val b2 = Similarity.hyperplaneBuckets(e, "vec")
      .select(col("vec_id"), col("band"), col("bucket"))
    assert(b1.exceptAll(b2).isEmpty && b2.exceptAll(b1).isEmpty)
    // positive scaling never changes a dot product's sign → buckets
    // (pure sign patterns) are identical for 3·v
    val scaled = e.select(col("vec_id"),
      expr("transform(vec, x -> x * 3.0)").as("vec"))
    val b3 = Similarity.hyperplaneBuckets(scaled, "vec")
      .select(col("vec_id"), col("band"), col("bucket"))
    assert(b1.exceptAll(b3).isEmpty && b3.exceptAll(b1).isEmpty)
    // a vector whose dimension doesn't match the configured planes
    // must ERROR (the zip_with null-pad would otherwise silently send
    // every such row to bucket 0)
    import spark.implicits._
    val wrongDim = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "vec")
    val err = intercept[Exception] {
      Similarity.hyperplaneBuckets(wrongDim, "vec")
        .select(col("bucket")).collect()
    }
    assert(err.toString.contains("hyperplaneBuckets") ||
      Option(err.getCause).exists(_.toString.contains("hyperplaneBuckets")),
      err.toString)
  }

  test("gopher quality stats satisfy their ratio invariants") {
    val q = Registry.byName("N_TEXT10_gopher_quality")
      .fn(spark, sf()).cache()
    assert(q.count() === Tables.documents(spark, sf()).count())
    // per-mille ratios are bounded, the most-common word can't exceed
    // the total, and distinct ≤ total words
    assert(q.filter(col("top_permille") > 1000 ||
      col("distinct_permille") > 1000 || col("stop_permille") > 1000 ||
      col("top2_permille") > 1000).isEmpty)
    assert(q.filter(col("n_distinct") > col("n_words")).isEmpty)
    assert(q.filter(!col("keep").isin(0L, 1L)).isEmpty)
    q.unpersist()
  }

  test("LM perplexity: repetitive text scores lower NLL than novel text") {
    import spark.implicits._
    // Stand-alone model property on a controlled corpus: a document of
    // pure repetition compresses (low per-trigram surprise), a
    // high-variety document does not. Build the same trigram LM the
    // N_SCORE2 query builds and compare per-doc NLL.
    val docsDf = Seq(
      (1L, "en", "abababababababababababababababab"),
      (2L, "en", "the quick brown fox jumps over lazy dogs vex"))
      .toDF("doc_id", "lang", "text")
    val ch = docsDf.select(col("doc_id"), lower(col("text")).as("t"))
    val tri = ch.select(col("doc_id"),
      explode(expr("transform(sequence(1, length(t) - 2)," +
        " i -> substring(t, i, 3))")).as("g"))
    val tric = tri.groupBy(col("g")).agg(count(lit(1)).as("c"))
    val prec = tric.groupBy(substring(col("g"), 1, 2).as("p2"))
      .agg(sum(col("c")).as("cp"))
    val vsz = tric.select(
      countDistinct(substring(col("g"), 3, 1)).as("v"))
    val nll = tri.join(tric, "g")
      .join(prec, substring(col("g"), 1, 2) === col("p2"))
      .crossJoin(vsz)
      .select(col("doc_id"),
        (-log((col("c") + lit(1.0)) / (col("cp") + col("v")))).as("nl"))
      .groupBy(col("doc_id")).agg(avg(col("nl")).as("nll"))
      .as[(Long, Double)].collect().toMap
    assert(nll(1L) < nll(2L),
      s"repetition must score lower NLL: $nll")
  }

  test("curation funnel stages are monotone and cover the corpus") {
    val f = Registry.byName("N_PIPE1_curation_funnel")
      .fn(spark, sf()).cache()
    // n0 ≥ n1 ≥ n2 ≥ n3 per language (each stage only removes docs)
    assert(f.filter(col("n1") > col("n0") || col("n2") > col("n1") ||
      col("n3") > col("n2")).isEmpty)
    val total = f.agg(sum(col("n0"))).head.getLong(0)
    assert(total === Tables.documents(spark, sf()).count())
    f.unpersist()
  }

  test("DSIR weights rank target-language docs above the rest") {
    val q = Registry.byName("N_SCORE3_dsir_weights")
      .fn(spark, sf()).cache()
    assert(q.count() === Tables.documents(spark, sf()).count())
    // the target (en) corpus must score higher under its own model
    // than every other language, on average
    val means = q.groupBy(col("lang")).agg(avg(col("logw_q")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means.filter(_._1 != "en").values.forall(_ < means("en")),
      means.toString)
    q.unpersist()
  }

  test("boilerplate removal reconstructs untouched docs verbatim") {
    val q = Registry.byName("N_DEDUP8_boilerplate_removal")
      .fn(spark, sf()).cache()
    val docs = Tables.documents(spark, sf())
    assert(q.count() === docs.count())
    assert(q.filter(col("n_dropped") > col("n_segs")).isEmpty)
    val joined = q.join(docs, "doc_id")
    // a doc with nothing dropped reassembles to EXACTLY its original
    // text (segments + tail in order, single-space joined)
    assert(joined.filter(col("n_dropped") === 0 &&
      md5(col("text")) =!= col("clean_md5")).isEmpty)
    // a cleaned doc got strictly shorter
    assert(joined.filter(col("n_dropped") > 0 &&
      col("n_chars_clean") >= col("n_chars")).isEmpty)
    q.unpersist()
  }

  test("segment dedup flags both sides of a planted near-copy") {
    import spark.implicits._
    // two docs sharing one exact 10-token run + one unique doc
    val run = (1 to 10).map(i => s"w$i").mkString(" ")
    val docsDf = Seq(
      (1L, run + " alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, run + " one two three four five six seven eight nine ten"),
      (3L, "solo words only here nothing shared across any doc at all"))
      .toDF("doc_id", "text")
    val segs = docsDf
      .select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) div 10 - 1), " +
          "i -> array_join(slice(t, i * 10 + 1, 10), ' '))")).as("seg"))
    val dup = segs.groupBy(col("seg"))
      .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") >= 2)
    val flagged = segs.join(dup.select("seg"), Seq("seg"), "left_semi")
      .select("doc_id").distinct().as[Long].collect().sorted.toSeq
    assert(flagged === Seq(1L, 2L))
  }

  test("DSIR resampling skews the selection toward the target (N_SAMP4)") {
    import spark.implicits._
    val sel = Registry.byName("N_SAMP4_dsir_resample")
      .fn(spark, sf()).cache()
    assert(sel.count() == 200)
    // Gumbel top-k samples proportional to exp(logw): the selected
    // 200 must over-represent the target language vs the corpus
    val selEn = sel.filter(col("lang") === "en").count().toDouble / 200
    val all = Tables.documents(spark, sf())
    val corpusEn = all.filter(col("lang") === "en").count().toDouble /
      all.count()
    assert(selEn > corpusEn, s"selected en=$selEn corpus en=$corpusEn")
    // keys are unique-ordered: rerunning yields the identical set
    val again = Registry.byName("N_SAMP4_dsir_resample").fn(spark, sf())
    assert(sel.select("doc_id").except(again.select("doc_id")).isEmpty)
    sel.unpersist()
  }

  test("bloom decontamination never misses an exact-overlap doc (N_EVAL3)") {
    import spark.implicits._
    // the bloom filter's one-sided guarantee: every doc the exact
    // 13-gram join flags must be bloom-positive, with at least as
    // many positive grams (false positives only ever ADD)
    val exact = Registry.byName("N_EVAL2_ngram_overlap")
      .fn(spark, sf()).as[(Long, Long)].collect().toMap
    val bloom = Registry.byName("N_EVAL3_bloom_decontam")
      .fn(spark, sf()).as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty) // fixture really contains contamination
    exact.foreach { case (id, n) =>
      assert(bloom.getOrElse(id, 0L) >= n, s"doc $id: bloom misses") }
  }

  test("chunking covers every token with stride-24 windows (N_TEXT12)") {
    import spark.implicits._
    val out = Registry.byName("N_TEXT12_chunking").fn(spark, sf())
      .as[(Long, Long, Long, String)].collect()
    val nToks = Tables.documents(spark, sf())
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(out.length == nToks.size) // one row per doc
    out.foreach { case (id, nChunks, chunkToks, digest) =>
      val n = nToks(id)
      assert(nChunks == (n - 1) / 24 + 1, s"doc $id chunk count")
      // sum over i of min(n - 24 i, 32): every token appears, overlap
      // tokens (8 per full window pair) appear twice
      val expected = (0L until nChunks).map(i => math.min(n - 24 * i, 32L)).sum
      assert(chunkToks == expected, s"doc $id token coverage")
      assert(digest.length == 32)
    }
  }
}
