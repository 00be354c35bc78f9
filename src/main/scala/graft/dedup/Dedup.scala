package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora (SURVEY table N):
  * exact, MinHash+LSH near-dup, SimHash, n-gram Jaccard. The scale
  * story for each:
  *
  * - exact: one hash-groupBy shuffle on the digest — embarrassingly
  *   parallel, the canonical 100 TB dedup pass;
  * - MinHash+LSH: per-doc signature computation is map-only; the only
  *   shuffle is the band-bucket self-join, whose cost is bounded by
  *   bucket sizes (not corpus²) — candidate pairs only, never an
  *   all-pairs cross join;
  * - SimHash: map-only signature; pairing by signature equality (or
  *   banded Hamming) is again a bucket join;
  * - Jaccard: exact verification on *blocked* candidate pairs only.
  *
  * Signatures use md5-derived hashing exclusively so signatures are
  * reproducible across engines and runs (no seed state, SURVEY §7.4).
  */
object Dedup {

  /** Normalized content digest for exact dedup. */
  def contentDigest(text: Column): Column =
    md5(lower(trim(text)).cast("binary"))

  /** Exact dedup: keep the minimum id per digest. Returns
    * (digest, keep_id, n_copies).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), contentDigest(col(textCol)).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature of a shingle array: k "permutations" carved as
    * DISJOINT 8-hex-char windows of TWO md5 digests per shingle
    * (`md5(s) || md5(':' || s)` = 64 hex chars = up to eight 32-bit
    * hash values), each permutation taking the lexicographic minimum
    * over the shingles — a pure-expression, engine-portable MinHash.
    * Two digests instead of k salted ones is the round-9 perf pass:
    * 4x less MessageDigest work per shingle at identical LSH quality
    * (any uniform 32-bit family gives the same S-curve, and the
    * Jaccard verify stage makes final pairs hash-agnostic).
    */
  def minhashSignature(shinglesCol: String, k: Int = 8): Column = {
    require(k * 8 <= 64, s"k=$k exceeds the two-digest window budget")
    val sh = shinglesCol
    expr(s"transform(sequence(0, ${k - 1}), i -> " +
      s"array_min(transform($sh, s2 -> " +
      s"substr(concat(md5(s2), md5(concat(':', s2))), i * 8 + 1, 8))))")
  }

  /** LSH band keys from a signature: bands of `r` rows hashed together,
    * band index prefixed so different bands never collide.
    */
  def lshBands(sigCol: String, k: Int = 8, r: Int = 2): Column = {
    val s = sigCol
    val bands = k / r
    // slice() is 1-based; '|' separator keeps band hashing unambiguous.
    expr(s"transform(sequence(0, ${bands - 1}), b -> " +
      s"concat(cast(b as string), ':', " +
      s"md5(array_join(slice($s, b * $r + 1, $r), '|'))))")
  }

  /** Relational (exploded) MinHash signature computation — the form
    * that scales: shingles become ROWS, each row hashes k times, and
    * signatures fall out of a min-aggregate with map-side partial
    * combine. Unlike the nested-HOF form ([[minhashSignature]]), no
    * expression tree gets re-evaluated per lambda element (Catalyst's
    * projection collapse inlines split() into HOF lambdas, turning the
    * one-projection form O(k·shingles·tokens) per doc — observed as a
    * single task spinning for minutes at sf0.1), and the shuffle
    * spreads documents across the cluster. Returns (id, sig).
    */
  def minhashSignaturesRelational(docsIdText: DataFrame,
      k: Int = 8): DataFrame = {
    val shingleRows = docsIdText
      // r19: the barrier moved BELOW tokenize — shuffling raw
      // (id, text) instead of (id, toks) costs the same bytes, but
      // tokenization now runs in the post-exchange 32-way stage
      // instead of the single-split scan task (StageStats r19: the
      // 1-task scan stage carried ~2.4 s of the 3.9 s N_DEDUP4
      // wall). tokens() feeds exactly one Generate, so projection
      // collapse evaluates it once per doc either way (and
      // CollapseProject never inlines the multiply-referenced md5
      // digest below).
      .transform(graft.operators.Distribute.by(_, col("id")))
      .select(col("id"),
        graft.text.TextOps.tokens(col("text")).as("toks"))
      .withColumn("sh2", explode(graft.text.TextOps.shingles("toks")))
      .select(col("id"), col("sh2"))
    // The k permutation hashes are COLUMNS of the shingle row, folded
    // by k parallel min-aggregates in ONE groupBy — no k-way row
    // explosion, no second shuffle (both existed in the explode(perm)
    // form), and map-side partial min still collapses before the
    // exchange. The k hashes are disjoint 8-hex windows of TWO md5
    // digests (see [[minhashSignature]]) — 2 MessageDigest calls per
    // shingle instead of k, the round-9 perf pass.
    require(k * 8 <= 64, s"k=$k exceeds the two-digest window budget")
    val hashed = hashedWindows(shingleRows, k)
    minWindowsToSig(hashed.groupBy(col("id")), k)
  }

  /** The k permutation hashes as BIGINT columns (r19): each window is
    * 8 LOWERCASE-hex chars = one 32-bit value, and fixed-width
    * lowercase hex is ordered exactly like its numeric value — so
    * `min` over the parsed BIGINT is bit-equivalent to `min` over the
    * hex string. The point: a STRING min carries an immutable
    * aggregation buffer, which HashAggregateExec refuses — the whole
    * signature aggregate (the dominant dedup compute) ran as
    * Sort + partial/final SortAggregate; the BIGINT form
    * hash-aggregates with map-side partials and no sort.
    */
  private def hashedWindows(shingleRows: DataFrame, k: Int): DataFrame =
    shingleRows
      .select(col("id"),
        expr("concat(md5(sh2), md5(concat(':', sh2)))").as("h"))
      .select(
        col("id") +: (0 until k).map { i =>
          expr(s"cast(conv(substr(h, ${i * 8 + 1}, 8), 16, 10) " +
            "as bigint)").as(s"h$i")
        }: _*)

  /** min each window numerically, then render back to the exact
    * 8-hex-lowercase strings the oracle (and every band hash built
    * on them) expects — a lossless round trip for 32-bit windows.
    */
  private def minWindowsToSig(
      grouped: org.apache.spark.sql.RelationalGroupedDataset,
      k: Int): DataFrame =
    grouped
      .agg(min(col("h0")).as("m0"),
        (1 until k).map(i => min(col(s"h$i")).as(s"m$i")): _*)
      .select(col("id"),
        array((0 until k).map(i =>
          expr(s"lower(lpad(hex(m$i), 8, '0'))")): _*).as("sig"))

  /** PRODUCTION-path MinHash signatures: the same relational shape as
    * [[minhashSignaturesRelational]] (shingles as rows, k parallel
    * min-aggregates, map-side combine) but hashing with codegen'd
    * 64-bit xxhash64 instead of md5 hex strings — no MessageDigest
    * call, no 32-char string allocation per (shingle, permutation), an
    * order of magnitude less per-shingle work. Returns (id, sig:
    * array<bigint>).
    *
    * The md5 form exists because the DuckDB oracle must reproduce
    * signatures bit-for-bit; DECLARED queries keep it. A 100 TB run
    * wants this one: LSH quality is hash-agnostic (any uniform hash
    * family gives the same S-curve), and the Jaccard VERIFY stage
    * ([[jaccardOnCandidates]]) makes the final pairs independent of
    * which hash proposed them.
    */
  def minhashSignaturesFast(docsIdText: DataFrame,
      k: Int = 8): DataFrame = {
    val shingleRows = docsIdText
      .transform(graft.operators.Distribute.by(_, col("id"))) // r19: barrier below tokenize
      .select(col("id"),
        graft.text.TextOps.tokens(col("text")).as("toks"))
      .withColumn("sh2", explode(graft.text.TextOps.shingles("toks")))
      .select(col("id"), col("sh2"))
    val hashed = shingleRows.select(
      col("id") +: (0 until k).map { i =>
        expr(s"xxhash64($i, sh2)").as(s"h$i")
      }: _*)
    hashed.groupBy(col("id"))
      .agg(min(col("h0")).as("m0"),
        (1 until k).map(i => min(col(s"h$i")).as(s"m$i")): _*)
      .select(col("id"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH band keys for the fast (long-array) signatures: one xxhash64
    * over each band's signature slice, band index salted in.
    */
  def lshBandsFast(sigCol: String, k: Int = 8, r: Int = 2): Column = {
    val bands = k / r
    expr(s"transform(sequence(0, ${bands - 1}), b -> " +
      s"xxhash64(b, slice($sigCol, b * $r + 1, $r)))")
  }

  /** MinHash signatures computed FROM an existing [[shingleRows]]
    * relation (r18, guide §1.2: don't compute things twice) — the
    * minimum of a hash over a multiset equals the minimum over its
    * distinct set, so a pipeline that already built the per-doc
    * DISTINCT shingle rows for Jaccard verification can derive
    * BIT-IDENTICAL signatures from them instead of re-running
    * tokenize + shingle over the corpus. Callers persist `shRows`
    * once and feed both this and [[jaccardOnCandidates]]: the corpus
    * is read and shingled exactly once per query.
    */
  def minhashSignaturesFromShingles(shRows: DataFrame,
      k: Int = 8): DataFrame = {
    require(k * 8 <= 64, s"k=$k exceeds the two-digest window budget")
    // same BIGINT-window form as the relational pipeline (r19):
    // hash-aggregable mins, bit-identical hex render
    minWindowsToSig(hashedWindows(shRows, k).groupBy(col("id")), k)
  }

  /** Per-doc DISTINCT shingles exploded to rows with the set size —
    * the verify-side relation of [[jaccardOnCandidates]]. Shared by
    * the declared query and Bench's warm-up so both build the same
    * canonical plan (plan-level cache lookup then serves the query).
    */
  def shingleRows(docsIdText: DataFrame): DataFrame =
    docsIdText
      .transform(graft.operators.Distribute.by(_, col("id"))) // r19: barrier below tokenize — the
      // raw (id, text) shuffle moves tokenization out of the 1-task
      // scan stage (see minhashSignaturesRelational)
      .select(col("id"), graft.text.TextOps.tokens(col("text")).as("toks"))
      .withColumn("sh",
        array_distinct(graft.text.TextOps.shingles("toks")))
      // r19, measured 10× (Probe3: 3.8 s → 0.35 s for this relation):
      // (a) no size() > 0 pre-filter — explode() already emits zero
      // rows for an empty array, and the pushed-down filter re-ran
      // the whole shingle pipeline below the barrier; (b) n_sh rides
      // INSIDE the exploded struct instead of alongside the explode —
      // `size(sh) AS n_sh` next to `explode(sh)` forces the Generate
      // to carry the full shingle ARRAY on every exploded row
      // (O(shingles²) bytes per doc, the actual 3 s), while
      // transform(sh, x -> struct(x, size(sh))) builds one struct
      // array per doc and each output row carries only its own
      // (sh2, n_sh).
      .select(col("id"), explode(expr(
        "transform(sh, x -> struct(x AS sh2, size(sh) AS n_sh))"))
        .as("t"))
      .select(col("id"), col("t.n_sh").as("n_sh"),
        col("t.sh2").as("sh2"))

  /** Candidate near-dup pairs: docs sharing any LSH band bucket.
    * Input must carry (id, bands); output (id_a, id_b) distinct, a<b.
    */
  def lshCandidatePairs(withBands: DataFrame): DataFrame = {
    // Both sides of the self-join consume this subtree — WITHOUT a
    // barrier each branch re-evaluates the whole signature pipeline
    // (tokenize → shingle → 2×md5 → 8-way min-agg), doubling the
    // dominant cost for any cold/standalone caller (r18: profiled
    // 3.15 s vs 1.3 s of stage work at sf0.1). persist(), not
    // localCheckpoint: the InMemoryRelation keeps the schema'd plan
    // and statistics visible to Catalyst (the r8/r9 lesson on
    // Q_TPCH2), and CacheManager keys on the canonical analyzed plan,
    // so the FOUR dedup queries sharing this exact subtree
    // (N_DEDUP2/4/6/10) and Bench's pre-cache all dedup to ONE cache
    // entry — repeated invocations never leak storage. At 100 TB the
    // band relation is bands×docs rows of (id, 16-byte key) —
    // signature-scale, not corpus-scale — and spills to disk under
    // the default storage level.
    val exploded = withBands
      .select(col("id"), explode(col("bands")).as("band"))
      .filter(col("band").isNotNull)
      .persist()
    val l = exploded.select(col("id").as("id_a"), col("band"))
    val r = exploded.select(col("id").as("id_b"), col("band").as("band_r"))
    l.join(r, col("band") === col("band_r") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact Jaccard similarity of two (multi)sets, computed on distinct
    * elements via |∩| / (|A| + |B| − |∩|) — avoids cross-engine
    * union-ordering differences.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val na = size(array_distinct(a))
    val nb = size(array_distinct(b))
    inter / (na + nb - inter)
  }

  /** Connected components over candidate pairs by min-label
    * propagation — the step that turns near-dup PAIRS into dedup
    * GROUPS (keep one doc per component). Runs a FIXED number of
    * propagation rounds, each one shuffle keyed on id: neighbor labels
    * union self labels, min per id. A fixed round count keeps the
    * result deterministic and oracle-mirrorable; diameter > rounds
    * leaves a component split (callers size `iterations` to the
    * expected chain length — near-dup components are short chains).
    * At 100 TB each round is a self-contained shuffle join, the
    * standard large-graph CC shape (no driver iteration state).
    */
  def dedupClusters(pairs: DataFrame, iterations: Int = 3): DataFrame = {
    // MATERIALIZE the edge list before iterating: every round
    // references `edges`, and an unmaterialized lineage would
    // re-evaluate the whole upstream candidate pipeline (minhash +
    // LSH join) once per reference while the plan doubles per round —
    // observed 285 s at sf0.1 vs ~5 s materialized. At cluster scale
    // this persist becomes a checkpoint; same principle.
    //
    // r18 (guide §2.4): the edge list persists HASH-PARTITIONED ON
    // dst, the key every round's neighbor join probes — the cached
    // partitioning satisfies the join's distribution requirement, so
    // no round re-exchanges the (larger) edge side; only the label
    // table moves. And each round localCheckpoints (r18): labels_{r-1}
    // appears twice in round r's plan (union + join), so the
    // unmaterialized form re-planned a tree that doubled per round —
    // measured 3.6 s vs 2.0 s for the checkpointed fixpoint twin on
    // the same candidates at sf0.1.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .transform(graft.operators.Distribute.by(_, col("dst")))
      .persist()
    edges.count() // cut the lineage now, before the rounds multiply it
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("id", "nid"),
          col("dst") === col("nid"))
        .select(col("src").as("id"), col("lbl"))
      labels = labels.union(viaNeighbor)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
        // one row per clustered doc; eager so the lineage stays one
        // round deep — at cluster scale a reliable checkpoint
        .localCheckpoint(true)
    }
    // release the cached edge list — otherwise every invocation in a
    // long-lived session (Bench/Verify run all queries in one
    // SparkSession) leaks another cached edge copy into storage memory.
    edges.unpersist()
    labels
  }

  /** Connected components iterated to a LABEL FIXPOINT — the
    * scale-correct form of [[dedupClusters]]: a fixed round count
    * silently splits any component whose diameter exceeds it, while
    * this one stops exactly when a propagation round changes zero
    * labels (so every component is fully merged), with a hard
    * `maxRounds` cap as the runaway guard (rounds needed = max
    * component diameter; near-dup components are short chains, so the
    * cap should never bind in practice — when it does, the function
    * FAILS BY NAME rather than silently returning a split result that
    * claims fixpoint semantics).
    *
    * Per round: one shuffle join (neighbor labels — the edge side is
    * pre-partitioned on its key, so only labels move) + one
    * min-aggregate that carries each id's previous label beside the
    * new minimum, then an EAGER localCheckpoint so the lineage stays
    * one round deep instead of doubling per round, then a
    * changed-label count as a plain filter over the round output
    * (labels only decrease under min-propagation, so `new < old` is
    * the exact change test — no join needed). Label tables are one row per clustered doc — the
    * per-round checkpoint footprint is small next to the edge cache,
    * which is released on exit. At cluster scale localCheckpoint
    * becomes a reliable checkpoint; the driver holds only the loop
    * counter and the changed count, never the data.
    *
    * Not oracle-expressible (data-dependent round count), so declared
    * queries keep the capped [[dedupClusters]]; this is the form a
    * production pipeline calls.
    */
  def dedupClustersFixpoint(pairs: DataFrame,
      maxRounds: Int = 30): DataFrame = {
    // r18 (guide §2.4): edges persist hash-partitioned on dst (the
    // neighbor join's probe key — no per-round edge exchange), and the
    // change test no longer runs a separate next ⋈ labels join: each
    // id's PREVIOUS label rides through the min-aggregate as a second
    // column (every id has exactly one labels row, so max(prev)
    // recovers it; neighbor rows carry NULL), making `changed` a plain
    // filter-count over the already-checkpointed round output — one
    // shuffle join per round eliminated.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .transform(graft.operators.Distribute.by(_, col("dst")))
      .persist()
    edges.count()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    val lblType = labels.schema("lbl").dataType
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      round += 1
      val viaNeighbor = edges
        .join(labels.select(col("id").as("nid"), col("lbl")),
          col("dst") === col("nid"))
        .select(col("src").as("id"), col("lbl"),
          lit(null).cast(lblType).as("prev"))
      val next = labels
        .select(col("id"), col("lbl"), col("lbl").as("prev"))
        .union(viaNeighbor)
        .groupBy(col("id"))
        .agg(min(col("lbl")).as("lbl"), max(col("prev")).as("prev"))
        .localCheckpoint(true)
      changed = next.filter(col("lbl") < col("prev")).count()
      labels = next.select(col("id"), col("lbl"))
    }
    edges.unpersist()
    // the cap is a RUNAWAY GUARD, not a silent result mode: an
    // unconverged return would split components exactly like the
    // capped form while claiming fixpoint semantics (and diverge
    // from N_DEDUP10's recursive-CTE oracle). Fail by name instead —
    // callers raise maxRounds (rounds needed = max component
    // diameter).
    if (changed > 0)
      throw new IllegalStateException(
        s"dedupClustersFixpoint did not converge within $maxRounds " +
          s"rounds ($changed labels still changing) — a component's " +
          "diameter exceeds the cap; raise maxRounds")
    labels
  }

  /** N_DEDUP11 — repeated-span detection: the exact-substring
    * duplication measure of "Deduplicating Training Data Makes
    * Language Models Better" (Lee et al., 2022), relationally — a
    * doc's word n-gram spans that appear in ≥ 2 DISTINCT docs are
    * duplicated text. Returns one row per AFFECTED doc: (doc_id,
    * n_spans, dup_spans, dup_ratio). Intra-doc repetition does not
    * count (per-doc spans dedup first); docs shorter than n tokens
    * have no spans and never surface.
    *
    * Scale shape: one explode + one hash-keyed agg + one left join
    * back — every stage hash-partitions on the span, no pairwise
    * work (the suffix-array original is superlinear in memory; the
    * fixed-n relaxation is the standard scale-out form). The span
    * relation persists once — it feeds both the hot-span agg and the
    * join back, N_DEDUP6's materialize-once discipline; at cluster
    * scale the persist becomes a checkpoint.
    *
    * @param docs (id, text) — whitespace-tokenized text
    */
  def repeatedSpans(docs: DataFrame, n: Int = 5): DataFrame = {
    val sh = docs
      .select(col("id"), graft.text.TextOps.tokens(col("text"))
        .as("toks"))
      // r18 barrier: distribute before the span explode + partial
      // distinct (otherwise one scan task does the whole corpus' work)
      .transform(graft.operators.Distribute.by(_, col("id")))
      .select(col("id"),
        explode(graft.text.TextOps.shingles("toks", n)).as("span"))
      .distinct()
      .persist()
    val hot = sh.groupBy(col("span"))
      .agg(countDistinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
    val out = sh.join(hot, Seq("span"), "left_outer")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        count(col("n_docs")).as("dup_spans"))
      .filter(col("dup_spans") > 0)
      .select(col("id"), col("n_spans"), col("dup_spans"),
        round(col("dup_spans") / col("n_spans"), 6).as("dup_ratio"))
      // materialize the (small: one row per affected doc) result and
      // RELEASE the span cache — the dedupClusters discipline: a
      // long-lived session must not leak one pinned span relation
      // per invocation
      .localCheckpoint(true)
    sh.unpersist()
    out
  }

  /** Exact Jaccard verification restricted to blocked candidate pairs
    * (verify-after-block — the only all-corpus-safe shape). Intersection
    * sizes come from joins THROUGH the candidate list: candidates ⋈
    * shingles(a) keyed on id_a, then ⋈ shingles(b) keyed (id_b,
    * shingle). Work is O(|candidates| × shingles/doc), never
    * O(co-shingle pairs) — at 100 TB the unblocked shingle-equality
    * self-join explodes quadratically on hot shingles (observed: 424 s
    * at sf0.1), while this stays linear in candidates.
    *
    * No broadcast hint on the candidate side: LSH keeps candidates
    * small in the typical case (and AQE broadcasts them at runtime
    * from the REAL size), but one hot band bucket — boilerplate docs,
    * empty strings — makes the pair list super-linear, and a forced
    * broadcast then dies on the driver. Both joins are equi-keyed, so
    * the worst case degrades to ordinary shuffle joins instead.
    *
    * @param candidates  (id_a, id_b) with id_a < id_b, e.g. from
    *                    [[lshCandidatePairs]]
    * @param shingleRows (id, n_sh, sh2): per-doc DISTINCT shingles
    *                    exploded to rows with the per-doc set size
    * @return (id_a, id_b, na, nb, i, jac); pairs sharing zero shingles
    *         drop out (callers filter jac ≥ τ > 0 anyway)
    */
  def jaccardOnCandidates(candidates: DataFrame,
      shingleRows: DataFrame): DataFrame = {
    // shingleRows verifies from BOTH ends of each candidate pair;
    // as above, the materialize-once decision belongs to the caller
    // (persist the shingle relation when running cold).
    val sh = shingleRows
    val a = sh.select(col("id").as("ja"), col("n_sh").as("na"),
      col("sh2"))
    val b = sh.select(col("id").as("jb"), col("n_sh").as("nb"),
      col("sh2").as("sh2_b"))
    candidates
      .join(a, col("id_a") === col("ja"))
      .join(b, col("id_b") === col("jb") && col("sh2") === col("sh2_b"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("i"))
      .withColumn("jac", col("i") / (col("na") + col("nb") - col("i")))
  }
}
