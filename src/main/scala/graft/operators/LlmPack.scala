package graft.operators

import graft.Tables
import graft.functions.{TextFns, VectorFns}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (SURVEY.md §2 B9; the driver
  * brief's named extension): dedup (exact, near, minhash, simhash), text
  * analysis (stats, quality, token frequencies), similarity search (exact
  * and LSH ANN), and multimodal binary-column plumbing — all on the
  * `documents` / `embeddings` fixtures.
  *
  * Scale themes: dedup/text queries are single-shuffle hash aggregations
  * with map-side combine; near-dup is candidate-generation + verify (never
  * all-pairs — see NearDedup); similarity search broadcasts the probe side
  * and scans the corpus once (see SimilaritySearch). Zero UDFs anywhere:
  * tokenizing, shingling, hashing, and vector math are all builtin
  * higher-order Catalyst expressions inside whole-stage codegen.
  */
object LlmPack extends QueryPack {

  private[operators] val Tau = 0.8 // near-dup Jaccard threshold (planted pairs ≥ 0.95, noise ≤ 0.06)

  /** B9 exact dedup: group by sha2 of whitespace-normalized text, keep the
    * smallest doc_id as the representative. The hash itself never appears in
    * the output, so engines only need injectivity, not identical hex. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(sha2(TextFns.normalize(col("text")), 256))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  /** B9 dedup OBSERVABILITY: the per-source duplicate-rate report an
    * operator reads before deciding how aggressively to prune — doc count,
    * distinct normalized-content count, and the duplicate fraction, per
    * source. One hash aggregate with map-side combine (the distinct is
    * over sha2 digests, so per-group state is digest-bounded); at 100 TB
    * this is the same single-shuffle shape as q_dedup_exact. */
  def dedupStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), sha2(TextFns.normalize(col("text")), 256).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("h")).as("n_distinct"))
      .withColumn("dup_frac",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"), 6))
      .orderBy(col("source"))

  /** B9 near-dup via deterministic prefix filtering (100% recall by the
    * pigeonhole argument — NearDedup.prefixFilter), verified with exact
    * 3-gram Jaccard, so it hash-matches the all-pairs oracle. */
  def dedupNear(s: SparkSession, dir: String): DataFrame =
    NearDedup.prefixFilter(Tables.documents(s, dir),
        idCol = "doc_id", textCol = "text", partCol = "lang", tau = Tau,
        materialize = Some(true))
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))

  private val ZipfTopN = 100

  /** B9+ Zipf rank-frequency diagnostic — the one-row corpus-language
    * sanity check (natural text follows count ∝ rank^slope with
    * slope ≈ −1; scraped boilerplate or synthetic junk bends it): a
    * log-log least-squares fit over the top-100 token ranks. The token
    * aggregate is vocabulary-bounded with map-side combine and the top-N
    * is TakeOrdered; the REGRESSION then runs over exactly N rows whose
    * rounded log coordinates are cast to DECIMAL so every power sum is
    * exact and associative (the cusum discipline — no float
    * summation-order exposure), with the final slope/intercept algebra a
    * single identical IEEE expression on both engines. */
  def tokenZipf(s: SparkSession, dir: String): DataFrame = {
    val w100 = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("w"))
    val ranked = Tables.documents(s, dir)
      .select(explode(TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(ZipfTopN)
      .withColumn("rank", row_number().over(w100))
    val d = ranked.select(
      round(log(col("rank").cast("double")), 6).cast("decimal(18,6)").as("x"),
      round(log(col("n").cast("double")), 6).cast("decimal(18,6)").as("y"))
    d.agg(count(lit(1)).cast("double").as("cnt"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"))
      .select(col("cnt").cast("long").as("n_ranked"),
        round((col("cnt") * col("sxy") - col("sx") * col("sy")) /
          (col("cnt") * col("sxx") - col("sx") * col("sx")), 4).as("slope"),
        round((col("sy") - (col("cnt") * col("sxy") - col("sx") * col("sy")) /
          (col("cnt") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
          col("cnt"), 4).as("intercept"))
  }

  private val TauContain = 0.9
  private val ContainMinShingles = 10

  /** B9+ containment dedup — the asymmetric member of the dedup family
    * (NearDedup.containmentPairs): docs ≥ 90% shingle-contained in a
    * larger doc, the quotation/subset-duplication case symmetric Jaccard
    * misses. Exact verify on candidates from the contained side's
    * pigeonhole prefix; oracle = all-pairs containment on the same exact
    * sets with the same size orientation. */
  def dedupContain(s: SparkSession, dir: String): DataFrame =
    NearDedup.containmentPairs(Tables.documents(s, dir),
        idCol = "doc_id", textCol = "text", partCol = "lang",
        tauC = TauContain, minShingles = ContainMinShingles,
        materialize = Some(true))
      .orderBy(col("contained_id"), col("container_id"))

  /** Occurrence-count threshold above which a 5-word span is boilerplate
    * for the CLEAN containment variant (shared with its oracle). */
  private val ContainMaxSpanMult = 8

  /** B9+ boilerplate-immune containment dedup
    * (NearDedup.containmentPairsClean): repeated spans above the
    * [[ContainMaxSpanMult]] multiplicity strip BEFORE shingling, so a
    * boilerplate cluster can neither skew the candidate join onto hot
    * posting lists nor flood the result with shared-header "containment";
    * genuine low-fan quotation (multiplicity ≈ 2) survives and pairs as
    * in q_dedup_contain. Oracle replays the identical strip (positional
    * md5 span keys, covered-word ranges, residual rebuild) in SQL, then
    * runs the all-pairs containment on the residual sets. */
  def dedupContainClean(s: SparkSession, dir: String): DataFrame =
    NearDedup.containmentPairsClean(Tables.documents(s, dir),
        idCol = "doc_id", textCol = "text", partCol = "lang",
        tauC = TauContain, minShingles = ContainMinShingles,
        maxSpanMult = ContainMaxSpanMult,
        materialize = Some(true))
      .orderBy(col("contained_id"), col("container_id"))

  /** B9 near-dup via MinHash + banded LSH. Probabilistic recall, but at
    * 32 bands × 4 rows a τ=0.8 pair is missed with p ≈ 5e-8 (and the
    * fixture's planted pairs at J ≥ 0.95 with p ≈ 1e-23), so it shares the
    * all-pairs oracle; the false-negative risk is quantified in NearDedup. */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    NearDedup.minhashLsh(Tables.documents(s, dir),
        idCol = "doc_id", textCol = "text", partCol = "lang", tau = Tau,
        materialize = Some(true))
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))

  /** B9 dedup clustering: the near-dup PAIR list folded into per-doc
    * cluster labels (smallest reachable doc_id) via distributed min-label
    * propagation — the step that turns pair detection into canonical-doc
    * selection (NearDedup.clusterPairs). Pairs come from the minhash path —
    * the cheaper generator at corpus scale; its pair set equals the exact
    * one with miss probability ≈5e-8 at τ=0.8 (the same argument that lets
    * q_dedup_minhash share the all-pairs oracle). Oracle: recursive-CTE
    * reachability over the same all-pairs scores. */
  def dedupCluster(s: SparkSession, dir: String): DataFrame =
    NearDedup.clusterPairs(
      NearDedup.minhashLsh(Tables.documents(s, dir),
        idCol = "doc_id", textCol = "text", partCol = "lang", tau = Tau,
        materialize = Some(true)))
      .orderBy(col("doc_id"))

  /** B9 end-to-end dedup: the SURVIVING corpus after cluster-canonical
    * selection — near-dup pairs (minhash) → connected components → keep
    * each cluster's smallest doc_id plus every unclustered doc. The other
    * dedup keys detect; this is the prune a training pipeline actually
    * ships. Scale shape: the anti-join is COUNT-GATED
    * (NearDedup.pruneByLosers) — a small loser list broadcasts so the
    * corpus side never shuffles (one scan at 100 TB); a corpus-proportional
    * one (web-scale dup rates) takes a shuffled left_anti instead of
    * OOMing the driver on a forced broadcast collect.
    * Oracle: the q_dedup_cluster recursive-CTE closure + the same
    * anti-join in SQL. */
  def dedupCanonical(s: SparkSession, dir: String): DataFrame = {
    val (losers, bound) = NearDedup.canonicalLosers(Tables.documents(s, dir),
      idCol = "doc_id", textCol = "text", partCol = "lang", tau = Tau)
    NearDedup.pruneByLosers(Tables.documents(s, dir), losers, bound, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** B9 near-dup via SimHash banding (NearDedup.simhashMd5Pairs): md5-bit
    * shingle simhash → 8×8-bit band candidate join → bit_count(xor) ≤ 7
    * verify. Unlike q_doc_fingerprint's xxhash64 simhash this one is
    * DuckDB-replayable, so the hamming values themselves are hash-checked
    * against a generated 64-term all-pairs oracle. Recall at hamming ≤ 7 is
    * 100% by pigeonhole (8 bands), which is what makes the oracle fair. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    NearDedup.simhashMd5Pairs(Tables.documents(s, dir),
        idCol = "doc_id", textCol = "text")
      .orderBy(col("a_id"), col("b_id"))

  /** B9 document fingerprints: md5-bit SimHash over shingles (the
    * SimHashMd5 kernel — one codegen'd pass per row, zero shuffles) + an
    * md5 content hash. Since the r7 continuation this key is fully
    * hash-oracled: md5 is the bit source precisely so DuckDB can replay
    * both columns (the xxhash64 variants stay available as
    * NearDedup.simhash64 / winnow — faster hash, spec-covered). The 64-bit
    * fingerprint is emitted as two 32-bit halves: assembling bit 63 in SQL
    * needs 2⁶³, which overflows signed BIGINT arithmetic in the oracle
    * dialect, while each half fits exactly. */
  def docFingerprint(s: SparkSession, dir: String): DataFrame = {
    val sim = col("simhash")
    Tables.documents(s, dir)
      .select(col("doc_id"), TextFns.shingles3(col("text")).as("sh"),
        md5(TextFns.normalize(col("text"))).as("content_hash"))
      .where(size(col("sh")) > 0) // shingle-less docs: absent, like the oracle's join
      .select(col("doc_id"),
        org.apache.spark.sql.graft.HashExprs.simhashMd5(col("sh")).as("simhash"),
        col("content_hash"))
      .select(col("doc_id"),
        shiftrightunsigned(sim, 32).as("sim_hi"),
        sim.bitwiseAND(lit(0xffffffffL)).as("sim_lo"),
        col("content_hash"))
      .orderBy(col("doc_id"))
  }

  /** B9 text stats per language: doc/char/token counts. All aggregates are
    * exact integer sums; the averages are single IEEE divisions of those
    * exact ints, so no rounding is needed for cross-engine hashing. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(TextFns.tokens(col("text")))
    Tables.documents(s, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(nTok).as("total_tokens"),
        countDistinct(col("source")).as("n_sources"))
      .select(col("lang"), col("n_docs"), col("total_chars"), col("total_tokens"),
        (col("total_chars").cast("double") / col("n_docs")).as("avg_chars"),
        (col("total_tokens").cast("double") / col("n_docs")).as("avg_tokens"),
        col("n_sources"))
      .orderBy(col("lang"))
  }

  /** B9 per-document quality signals: token counts, type/token ratio,
    * stopword ratio, mean token length, and a blended score. Per-row IEEE
    * arithmetic over exact ints, identical op order on both sides. */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    scoredDocs(s, dir).orderBy(col("doc_id"))

  /** The quality-signal projection WITHOUT the determinism sort — shared by
    * qualityScore (which adds the orderBy) and qualityDeciles' boundary
    * aggregate, where an inherited sort would plan a wasted global
    * range-exchange under the percentile (EliminateSorts does not fold a
    * sort through an aggregate; PlanAuditSpec pins the sort-free branch). */
  private def scoredDocs(s: SparkSession, dir: String): DataFrame = {
    val tk = TextFns.tokens(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(tk).as("n_tokens"),
        size(array_distinct(tk)).as("n_uniq"),
        size(filter(tk, t => t.isin("a", "the"))).as("n_stop"),
        TextFns.totalLen(tk).as("tok_chars"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("n_uniq").cast("double") / col("n_tokens")).as("uniq_ratio"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (col("tok_chars").cast("double") / col("n_tokens")).as("avg_tok_len"))
      .withColumn("score",
        lit(0.4) * col("uniq_ratio") + lit(0.3) * (lit(1.0) - col("stop_ratio")) +
          lit(0.3) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)))
  }

  /** B9+ curriculum bucketing by exact GLOBAL score deciles — assign every
    * doc its quality decile WITHOUT a global sort: the nine boundary
    * quantiles come from ONE exact-percentile aggregate (the only place
    * the score multiset concentrates — the same trade as q_percentiles;
    * `approx_percentile` is the mergeable scale path, registered as the
    * `q_percentiles_approx` twin in StatsPack), re-enter as a
    * broadcast 1-row array, and assignment is a narrow per-row count of
    * boundaries strictly below the score. The `ntile()` alternative
    * computes one global ordering (a single-task sort at corpus scale);
    * this shape keeps the corpus scan narrow and embarrassingly parallel.
    * Boundaries are order statistics interpolated from identical values
    * by identical IEEE ops on both engines (the q_percentiles parity), so
    * the strict-> tie rule (boundary ties bucket DOWN) is deterministic. */
  def qualityDeciles(s: SparkSession, dir: String): DataFrame = {
    val scored = scoredDocs(s, dir).select(col("doc_id"), col("score"))
    val bounds = scored.agg(percentile(col("score"),
      lit((1 to 9).map(_ / 10.0).toArray)).as("bounds"))
    scored.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("score"),
        (size(filter(col("bounds"), b => col("score") > b)) + 1)
          .cast("long").as("decile"))
      .orderBy(col("doc_id"))
  }

  /** [[qualityDeciles]] with APPROXIMATE boundary quantiles — the 100 TB
    * arm of the curriculum bucketing: the nine boundaries come from one
    * `percentile_approx` aggregate (Greenwald–Khanna mergeable sketch,
    * bounded state — the q_percentiles_approx discipline) instead of the
    * exact aggregate that buffers the whole score multiset in one buffer.
    * Same broadcast-boundaries/strict-less assignment; only docs whose
    * score falls within the ≤0.01% rank error of a boundary can land one
    * decile off. No DuckDB oracle (sketch internals differ across
    * engines); ApproxSpec bounds the assignment disagreement vs the exact
    * key. */
  def qualityDecilesApprox(s: SparkSession, dir: String): DataFrame = {
    val scored = scoredDocs(s, dir).select(col("doc_id"), col("score"))
    val bounds = scored.agg(percentile_approx(col("score"),
      lit((1 to 9).map(_ / 10.0).toArray),
      lit(StatsPack.ApproxPctAccuracy)).as("bounds"))
    scored.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("score"),
        (size(filter(col("bounds"), b => col("score") > b)) + 1)
          .cast("long").as("decile"))
      .orderBy(col("doc_id"))
  }

  /** B9 repetition quality filter (the Gopher/C4-style repeated-n-gram
    * rule): fraction of a doc's word 3-grams that are duplicates —
    * high-repetition docs are boilerplate/spam candidates. Per-row only
    * (no shuffle at all before the determinism sort): total trigrams from
    * the token count, distinct trigrams from the shingle set, one IEEE
    * division — identical op order in the DuckDB oracle. */
  def qualityRepetition(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(TextFns.tokens(col("text")))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        greatest(nTok - 2, lit(0)).as("n_tri"),
        size(TextFns.shingles3(col("text"))).as("n_tri_distinct"))
      .withColumn("dup_frac",
        when(col("n_tri") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("n_tri_distinct").cast("double") / col("n_tri")))
      .orderBy(col("doc_id"))
  }

  /** B9 per-document token entropy (Shannon, bits) — the information-
    * density quality signal: templated/repetitive text scores low, varied
    * prose high; trainers gate on it alongside dup_frac. Entirely
    * higher-order functions over the token array (distinct tokens →
    * per-token probability → −Σ p·ln p / ln 2), so it is a pure per-row
    * scan — zero shuffles before the determinism sort, same 100 TB shape
    * as the other quality signals. The nested count-per-distinct-token
    * scan is O(n·u) per doc (u = distinct tokens) — fine for natural text
    * where u ≪ n or n is bounded by the corpus filter. Rounded to 6
    * decimals on both sides: ln() is libm-dependent and the summation
    * order over the distinct set differs between engines (float error
    * ~1e-15, far under the rounding grid). */
  def tokenEntropy(s: SparkSession, dir: String): DataFrame = {
    val tk = TextFns.tokens(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), tk.as("t"), size(tk).as("n_tokens"))
      .where(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        round(
          -aggregate(
            transform(array_distinct(col("t")),
              u => size(filter(col("t"), x => x === u)).cast("double") /
                col("n_tokens").cast("double")),
            lit(0.0), (acc, p) => acc + p * log(p)) / log(lit(2.0)),
          6).as("token_entropy"))
      .orderBy(col("doc_id"))
  }

  // Gopher-rule thresholds (Rae et al. 2021 §A1.1 is the public recipe;
  // bounds calibrated so the synthetic corpus has a non-trivial pass rate)
  private val GopherMinWords = 25
  private val GopherMaxWords = 90
  private val GopherMinWordLen = 4.0
  private val GopherMaxWordLen = 10.0
  private val GopherMinAlphaFrac = 0.8
  private val GopherMinStop = 1

  /** B9 the Gopher heuristic quality GATE as a per-rule report: word-count
    * bounds, mean-word-length bounds, alphabetic-word fraction, and
    * minimum stopword count, each emitted as its own boolean plus the
    * conjunction — the report form (rather than a bare filter) is what a
    * pipeline operator actually tunes thresholds from. Pure per-row HOF
    * arithmetic — zero shuffles before the determinism sort, and every
    * threshold compares an EXACT value (ints, or a single int/int IEEE
    * division) so the booleans are bit-stable cross-engine. The line-based
    * Gopher rules (bullet ratio, ellipsis ratio) are omitted: the corpus
    * is single-line by construction, so they would be vacuously true. */
  def qualityGopher(s: SparkSession, dir: String): DataFrame = {
    val tk = TextFns.tokens(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(tk).as("n_words"),
        TextFns.totalLen(tk).as("tok_chars"),
        size(filter(tk, w => w.rlike("^[a-z]+$"))).as("n_alpha"),
        size(filter(tk, w => w.isin("a", "the"))).as("n_stop"))
      .select(col("doc_id"), col("lang"), col("n_words"), col("n_stop"),
        (col("tok_chars").cast("double") / col("n_words")).as("mean_wl"),
        (col("n_alpha").cast("double") / col("n_words")).as("alpha_frac"))
      .select(col("doc_id"), col("lang"), col("n_words"),
        round(col("mean_wl"), 6).as("mean_word_len"),
        round(col("alpha_frac"), 6).as("alpha_frac"), col("n_stop"),
        col("n_words").between(GopherMinWords, GopherMaxWords).as("pass_words"),
        col("mean_wl").between(GopherMinWordLen, GopherMaxWordLen)
          .as("pass_word_len"),
        (col("alpha_frac") >= GopherMinAlphaFrac).as("pass_alpha"),
        (col("n_stop") >= GopherMinStop).as("pass_stop"))
      .withColumn("pass",
        col("pass_words") && col("pass_word_len") && col("pass_alpha") &&
          col("pass_stop"))
      .orderBy(col("doc_id"))
  }

  /** B9 salient-term extraction — the doc-term-matrix workflow (explode →
    * per-doc tf, vocabulary-bounded df, join, per-doc top-k): each doc's 3
    * most distinctive tokens. Scoring is tf·(N/df) with a RAW inverse
    * document frequency, not ln(N/df): the score is hashed by the oracle,
    * and the whole formula must be bit-identical cross-engine — tf·N is
    * exact integer arithmetic and the single division is one IEEE op, while
    * ln() is a libm call with no cross-implementation bit guarantee
    * (rankings per doc are unchanged for fixed tf since both weights
    * decrease in df). Plan shape: one (doc, tok) aggregation with map-side
    * combine, a vocabulary-bounded df aggregate joined back on tok, and a
    * per-doc top-3 window; N re-enters as a broadcast 1-row aggregate (the
    * sourceMix normalizing-total idiom) so the whole query is ONE plan —
    * no separate driver-side count job per invocation. */
  def tfidfTerms(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val nTot = docs.agg(count(lit(1)).cast("double").as("_n_docs"))
    val tk = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
    val tf = tk.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    // df derives from the doc-term matrix: tf already holds exactly one row
    // per (doc, tok), so countDistinct(doc_id) over the RAW token stream is
    // a plain count of tf rows per tok — bit-identical df. Honest r21
    // measurement: a local WASH (the old single-distinct plan deduplicated
    // on the same (tok, doc_id) key this count aggregates, so per-pass work
    // is equivalent); kept because the distinct machinery drops out and
    // both tf references now share one canonical exchange key order
    // (hash(doc_id, tok)) — the precondition for exchange reuse the old
    // hash(tok, doc_id) dedup arm could never meet.
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
    tf.join(df, "tok")
      .crossJoin(broadcast(nTot))
      .withColumn("score", col("tf").cast("double") * col("_n_docs") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("tok"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  // Fixed ranked-retrieval query (all three terms exist in the fixture
  // corpus at every SF); BM25 constants k1 = 1.2, b = 0.75.
  private[operators] val Bm25Terms = Seq("vector", "join", "stream")

  /** B9 BM25 ranked retrieval — the keyword-search verb (find the
    * documents most relevant to a fixed term set, Okapi BM25 weighting):
    * per-doc length + per-term tf in ONE exploded-token aggregation
    * (map-side combine collapses to one row per doc), corpus stats
    * (N, Σdl, per-term df) as a single broadcast 1-row aggregate, score
    * projection, and a TakeOrdered top-10 — one plan, no shuffle wider
    * than the per-doc aggregate (the aggregate subtree feeds both the
    * stats row and the scoring branch, the tfidfTerms/df sharing shape).
    *
    * Scoring uses the RATIONAL idf `(N − df + 0.5)/(df + 0.5)` instead of
    * Lucene's `ln(1 + …)`: the oracle hashes the score, `ln` is a libm
    * call with no cross-implementation bit guarantee, and the map
    * `x ↦ ln(1+x)` is strictly monotone — identical ranking, hashable
    * arithmetic (the tfidfTerms rule). Constants are pre-folded literals
    * (2.2, 0.25) so neither engine's own folding order can shift a bit;
    * the cross-term sum is a FIXED three-operand addition chain, never a
    * reduce over nondeterministic row order. */
  def bm25Search(s: SparkSession, dir: String): DataFrame = {
    val Seq(t1, t2, t3) = Bm25Terms
    val tk = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
    val perDoc = tk.groupBy(col("doc_id")).agg(
      count(lit(1)).as("dl"),
      sum(when(col("tok") === t1, 1L).otherwise(0L)).as("tf1"),
      sum(when(col("tok") === t2, 1L).otherwise(0L)).as("tf2"),
      sum(when(col("tok") === t3, 1L).otherwise(0L)).as("tf3"))
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"),
      sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
      sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2"),
      sum(when(col("tf3") > 0, 1L).otherwise(0L)).as("df3"))
    def termScore(tf: String, df0: String): org.apache.spark.sql.Column = {
      val tfd = col(tf).cast("double")
      val dfd = col(df0).cast("double")
      val nd = col("n_docs").cast("double")
      val dld = col("dl").cast("double")
      val avgdl = col("sum_dl").cast("double") / nd
      when(col(tf) > 0,
        ((nd - dfd + lit(0.5)) / (dfd + lit(0.5))) *
          ((tfd * lit(2.2)) /
            (tfd + lit(1.2) * (lit(0.25) + lit(0.75) * (dld / avgdl)))))
        .otherwise(lit(0.0))
    }
    perDoc.crossJoin(broadcast(stats))
      .withColumn("matched",
        (col("tf1") > 0).cast("long") + (col("tf2") > 0).cast("long") +
          (col("tf3") > 0).cast("long"))
      .withColumn("score",
        termScore("tf1", "df1") + termScore("tf2", "df2") +
          termScore("tf3", "df3"))
      .where(col("score") > 0.0)
      .select(col("doc_id"), col("dl"), col("matched"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  // PII patterns shared by the Spark and DuckDB sides of q_text_redact —
  // deliberately restricted to the regex subset Java (Spark) and RE2
  // (DuckDB) treat identically: character classes, bounded repetition,
  // \b word boundaries; no backrefs, no lookaround.
  private[operators] val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[operators] val PiiIpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private[operators] val PiiPhoneRe = "\\+[0-9]{8,15}"

  /** B9 PII scrubbing — the redaction pass every shared training corpus
    * runs before release: emails, IPv4 addresses, and international-form
    * phone numbers replace with typed tags, in one map-only projection
    * (three chained codegen'd `regexp_replace`s — no UDF, no shuffle; at
    * 100 TB this is a pure scan-transform-write pass). The fixture corpus
    * carries no PII, so the key SEEDS each document with
    * deterministically derived contact strings first (email/IP/phone
    * from doc_id), then redacts — the oracle replays seed + redaction,
    * so the hash proves the patterns fire on every planted instance and
    * nothing else. Replacement order is part of the contract (email
    * before IP before phone; identical both sides). */
  def redactPii(s: SparkSession, dir: String): DataFrame = {
    val seeded = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com"),
        lit(" from 10."), col("doc_id") % 256, lit("."),
        (col("doc_id") / 256).cast("long") % 256, lit(".7"),
        lit(" tel +1"), lpad((col("doc_id") % 10000000).cast("string"), 7, "0")
      ).as("text"))
    seeded.select(col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), PiiEmailRe, "<EMAIL>"),
          PiiIpRe, "<IP>"),
        PiiPhoneRe, "<PHONE>").as("redacted"))
      .orderBy(col("doc_id"))
  }

  private val VocabK = 16 // closed-vocabulary size for the coverage audit

  /** B9 tokenizer-coverage audit: per-doc OOV rate against the corpus'
    * own top-`VocabK` token vocabulary — the "how much of my corpus does a
    * fixed vocabulary actually cover" check run before committing to a
    * tokenizer or a filter threshold. Plan shape at 100 TB: the vocabulary
    * is a k-bounded TakeOrdered over a map-side-combined token count
    * (vocabulary-sized aggregate state), then re-enters as a BROADCAST
    * against the exploded corpus — the big side never shuffles on the token
    * key; the per-doc miss count is one hash aggregate with map-side
    * combine. Total order on (count DESC, token ASC) pins the boundary of
    * the vocabulary deterministically, so the oracle's LIMIT agrees. */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val tk = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
    val vocab = tk.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(VocabK)
      .select(col("tok"), lit(1).as("in_v"))
    tk.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1).otherwise(0)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  /** B9 corpus token frequencies: explode → hash agg (map-side combine
    * collapses to vocabulary size before the shuffle) → top-20. */
  def tokenTopk(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)

  /** B9 exact similarity search: top-10 cosine neighbors of vec_id=0,
    * probe broadcast, one corpus pass (SimilaritySearch.bruteForceTopK). */
  /** B9 per-class mean embedding — the class-centroid / prototype table
    * (nearest-centroid classification, retrieval calibration, embedding
    * drift checks). Long form (label, pos, component): posexplode fans each
    * vector into dim rows, but partial hash aggregation collapses every
    * partition to ≤ labels×dim rows MAP-SIDE, so the shuffle is
    * O(labels × dim × partitions) — independent of corpus size. Components
    * accumulate in double; 6dp rounding bridges the cross-engine summation
    * order (error ~1e-14, far under the grid). */
  def embedCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding").cast("array<double>")))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("col")), 6).as("centroid_val"))
      .orderBy(col("label"), col("pos"))

  /** B9 nearest-centroid assignment — the k-means ASSIGN step with the
    * per-label centroids as the codebook (equivalently Rocchio
    * classification; `embedCentroids` is the matching UPDATE step, so the
    * pair is one Lloyd iteration). Plan shape for 100 TB: the centroid
    * table is labels×dim (KBs — broadcast), each corpus vector scores all
    * centroids in one narrow pass, and the argmax is a struct-max
    * aggregate with map-side combine — the only corpus-keyed exchange is
    * ≤ one row per vector. Parity: centroid components are rounded to 6dp
    * BEFORE the cosine on both sides, the dot kernel accumulates in the
    * same index order as DuckDB's list_dot_product loop, and the rounded
    * sim ties break toward the smaller label via the negated-label struct
    * field. */
  /** The per-label centroid codebook used by [[embedKmeans]] and
    * [[embedOutliers]]: one row per label, the mean vector re-assembled in
    * position order with every component rounded to 6dp (the published
    * precision — both consumers and both engines compare against the SAME
    * rounded codebook, so the downstream cosines agree bit-for-bit).
    * labels×dim rows of aggregate state — KBs at any corpus size. */
  private def codebook(emb: DataFrame): DataFrame = emb
    .select(col("label").as("c_label"),
      posexplode(col("embedding").cast("array<double>")))
    .groupBy(col("c_label"), col("pos"))
    .agg(avg(col("col")).as("v"))
    .groupBy(col("c_label"))
    .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
      x => round(x.getField("v"), 6)).as("cv"))

  def embedKmeans(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val centroids = codebook(emb)
    emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("label"),
        struct(round(VectorFns.cosine(col("v"), col("cv")), 6).as("sim"),
          (-col("c_label")).as("neg")).as("cand"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(col("cand")).as("best"))
      .select(col("vec_id"), col("label"),
        (-col("best.neg")).as("pred_label"), col("best.sim").as("sim"))
      .orderBy(col("vec_id"))
  }

  private val KmIters = 3

  /** B9+ ITERATED Lloyd k-means (T=3) seeded from the per-label groups —
    * the full clustering loop, not just [[embedKmeans]]'s single step:
    * each round recomputes the codebook from the CURRENT assignment and
    * re-assigns every vector by rounded cosine. The 6dp rounding of every
    * centroid component and of every similarity before the argmax is the
    * cross-engine synchronization barrier: both engines compare against
    * the SAME rounded values each round, so assignments cannot drift
    * across three rounds of float arithmetic — which is what lets a
    * 3-deep iterative algorithm carry a full hash oracle (unrolled CTE
    * chain). Distributed shape per iteration — the standard Lloyd layout:
    * one corpus scan, a clusters×dim map-side-combined aggregate (KBs),
    * codebook broadcast back, argmax as a struct-max with map-side
    * combine; `Compute.materialize` after each round truncates lineage so
    * round T does not replan rounds 1..T−1 (the NearDedup.clusterPairs
    * discipline) — reliable checkpoint when the session has a checkpoint
    * dir, so an executor loss mid-iteration cannot orphan round T−1's
    * state on a real cluster. The assignment join keys corpus and labels
    * by vec_id — co-partitioned after round 1's exchange. */
  def embedKmeansIter(s: SparkSession, dir: String): DataFrame = {
    // The MLlib-style iteration layout (guide §2.4 — operations keyed the
    // same way share one exchange): the feature vectors are hash-
    // partitioned by vec_id ONCE and persisted; each round's assignment
    // join then leaves the vector side unshuffled (the persisted
    // InMemoryRelation keeps its outputPartitioning, unlike a checkpoint),
    // and the argmax groupBy(vec_id) reuses the join's partitioning
    // outright — the embedding payload never crosses an exchange after
    // round 0. The pre-r21 shape re-joined the raw scan per round: the
    // vector bytes re-shuffled (or re-broadcast) every iteration. The
    // persist is freed before return — the final round's materialize is
    // eager, so nothing downstream re-reads the cache.
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .repartition(col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    var assign = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label").cast("int").as("cl"))
    var scored: DataFrame = null
    for (_ <- 1 to KmIters) {
      val av = emb.join(assign, "vec_id")
      val cb = av.select(col("cl").as("c_label"), posexplode(col("v")))
        .groupBy(col("c_label"), col("pos"))
        .agg(avg(col("col")).as("cv0"))
        .groupBy(col("c_label"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv0")))),
          x => round(x.getField("cv0"), 6)).as("cv"))
      scored = Compute.materialize(av.crossJoin(broadcast(cb))
        .select(col("vec_id"),
          struct(round(VectorFns.cosine(col("v"), col("cv")), 6).as("sim"),
            (-col("c_label")).as("neg")).as("cand"))
        .groupBy(col("vec_id"))
        .agg(max(col("cand")).as("best"))
        .select(col("vec_id"), (-col("best.neg")).cast("int").as("cl"),
          col("best.sim").as("sim")))
      assign = scored.select(col("vec_id"), col("cl"))
    }
    scored.select(col("vec_id"), col("cl").as("cluster"), col("sim"))
      .orderBy(col("vec_id"))
    } finally emb.unpersist(blocking = false)
  }

  /** B9 Unicode text normalization — the cleaning step every multilingual
    * corpus pipeline runs before hashing/dedup/tokenization: NFC canonical
    * composition (via the native codegen'd [[org.apache.spark.sql.graft.NfcNormalize]]
    * expression — Spark has no builtin), then lowercase and whitespace
    * collapse. The fixture text is pure ASCII (NFC-invariant), so a
    * DECOMPOSED prefix is planted per row (e + COMBINING ACUTE, A +
    * COMBINING RING, a double space) to make the composition observable:
    * the md5 matches DuckDB's `nfc_normalize` output only if both engines
    * compose to identical code points, and the emitted length drops from
    * composition. Map-only narrow scan — zero shuffles at any scale. */
  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.TextExprs
    Tables.documents(s, dir)
      .withColumn("raw", // planted DECOMPOSED prefix: e+U+0301, A+U+030A, double space
        concat(lit("Cafe\u0301  STRASSE A\u030A "), col("text")))
      .withColumn("norm", TextExprs.nfc(col("raw")))
      .select(col("doc_id"),
        md5(regexp_replace(lower(col("norm")), "\\s+", " ")).as("h"),
        length(col("norm")).cast("long").as("n"))
      .orderBy(col("doc_id"))
  }

  /** B9 distributed PCA power-iteration step over the embedding corpus:
    * v₁ = normalize(Xᵀ X v₀) with the deterministic start v₀ = 1/√d — the
    * building block of randomized-SVD / spectral-outlier pipelines at
    * corpus scale. The 100 TB shape: pass 1 computes each row's ⟨x, v₀⟩
    * in-row (v₀'s equal components make it 0.125·Σxᵢ — an exact DECIMAL
    * fold, order-free); pass 2 posexplodes to (dim, xᵢ·dot) terms whose
    * DECIMAL partial sums combine map-side into exactly d×partitions rows
    * of exchanged state; the final normalization is a window over d=64
    * rows. The corpus is scanned twice and never shuffled — only
    * dimension-keyed aggregate state moves. Every order-sensitive sum
    * accumulates in DECIMAL(28,12) (Det.scala discipline), so both engines
    * see bit-identical doubles before the 6dp rounding. */
  def embedPcaPower(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.embeddings(s, dir)
      .select(col("embedding").cast("array<double>").as("v"))
      .withColumn("dot", lit(0.125) * expr(
        """CAST(aggregate(transform(v, x -> CAST(x AS DECIMAL(28,12))),
          |CAST(0 AS DECIMAL(28,12)),
          |(acc, x) -> CAST(acc + x AS DECIMAL(28,12))) AS DOUBLE)""".stripMargin))
      .select(col("dot"), posexplode(col("v")))
      .select(col("pos").cast("long").as("dim"),
        (col("col") * col("dot")).cast("decimal(28,12)").as("term"))
      .groupBy(col("dim"))
      .agg(sum(col("term")).cast("double").as("comp"))
      .select(col("dim"), round(col("comp") /
        sqrt(sum((col("comp") * col("comp")).cast("decimal(28,12)"))
          .over(Window.partitionBy()).cast("double")), 6).as("pc1"))
      .orderBy(col("dim"))
  }

  /** B4+ Count-Min heavy-hitter report — the sketch-family member for
    * FREQUENCIES (HLL covers cardinality, Bloom membership, MinHash
    * similarity): exact top-20 token counts side-by-side with their
    * Count-Min estimates from Spark's own `count_min_sketch` aggregate,
    * probed through the native [[org.apache.spark.sql.graft.CmsEstimate]]
    * expression (Spark ships the build half but no query half).
    *
    * 100 TB shape: the sketch is a FIXED-size (d×w longs) mergeable
    * summary built in one pass with map-side partial merge — the
    * frequency analogue of the Bloom decontamination path — and re-enters
    * the (tiny) candidate scan as a scalar subquery; at scale the exact
    * side is replaced by any candidate stream and the sketch still
    * answers in O(d) per probe with the ε·N overcount guarantee.
    * No oracle (DuckDB has no CMS); the estimator bounds
    * (never-undercount, overcount ≤ ε·N at the build confidence) and
    * determinism are asserted in ApproxSpec. */
  def tokenCms(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
    val sk = toks.agg(expr("count_min_sketch(t, 0.0001d, 0.99d, 42)").as("sk"))
    toks.groupBy(col("t")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("t")).limit(20)
      .withColumn("n_est", org.apache.spark.sql.graft.CmsExprs.estimate(
        org.apache.spark.sql.graft.BloomExprs.scalarSubquery(sk), col("t")))
      .select(col("t"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"))
      .orderBy(col("n_exact").desc, col("t"))
  }

  def simTopk(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.bruteForceTopK(Tables.embeddings(s, dir),
      idCol = "vec_id", vecCol = "embedding", probeId = 0L, k = 10)

  /** B9 hybrid (metadata-filtered) retrieval: q_sim_topk restricted to
    * the label % 3 = 1 slice — the predicate evaluates before scoring
    * (SimilaritySearch.bruteForceTopKFiltered), so selectivity cuts the
    * FLOP cost instead of over-fetch-then-post-filter. */
  def simTopkFiltered(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.bruteForceTopKFiltered(Tables.embeddings(s, dir),
      idCol = "vec_id", vecCol = "embedding", probeId = 0L, k = 10,
      filter = col("label") % 3 === 1)

  private val KnnProbes = 16L // probe set: vec_id < 16
  private val KnnK = 3

  /** B9 batch exact kNN join: top-3 cosine neighbors for EACH probe
    * (vec_id < 16) in one corpus pass — probes broadcast, per-group top-k
    * via the k-bounded TopKByScore aggregate (SimilaritySearch.knnJoin). */
  def knnJoin(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.knnJoin(emb, emb.where(col("vec_id") < KnnProbes),
      idCol = "vec_id", vecCol = "embedding", k = KnnK)
  }

  /** B9 approximate batch kNN join — `knnJoin`'s LSH scale path
    * (SimilaritySearch.knnJoinLsh): corpus rows are scored against a probe
    * only when they share a hyperplane-LSH bucket, cutting the N×P cosine
    * cost to the colliding fraction. No oracle (plan-time literal planes
    * aren't expressible in portable SQL); AnnSpec measures per-probe recall
    * against the exact knnJoin. */
  def knnJoinLshQ(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.knnJoinLsh(emb, emb.where(col("vec_id") < KnnProbes),
      idCol = "vec_id", vecCol = "embedding", k = KnnK, dim = 64)
  }

  /** B9 bulk ANN retrieval through the MATERIALIZED inverted file
    * (IvfIndex.knnJoin) — the at-scale form of q_knn_join: each probe is
    * scored only against its nProbe nearest cells, and the restriction
    * reaches the file-listing level via DYNAMIC partition pruning (the
    * broadcast probe side's cells become a runtime partition filter on the
    * cell-partitioned scan). Index reuse follows q_sim_ivf
    * (buildIfNeeded + fingerprint). No oracle (data-dependent centroids);
    * AnnSpec asserts the DPP plan shape and measures recall vs the exact
    * kNN join. */
  def knnJoinIvf(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.stable(s, s"graft_ivf_${StoreDirs.pathKey(dir)}")
    val emb = Tables.embeddings(s, dir)
    IvfIndex.buildIfNeeded(emb, idCol = "vec_id", vecCol = "embedding",
      path = store,
      fingerprint = IvfIndex.inputFingerprint(s, s"$dir/embeddings.parquet"))
    IvfIndex.knnJoin(s, store, emb.where(col("vec_id") < KnnProbes),
      idCol = "vec_id", vecCol = "embedding", k = KnnK)
  }

  /** B9+ batch kNN through the inverted file with SQ8 compression
    * (IvfIndex.knnJoinSq) — the probe-I/O scale path: the approximate
    * phase reads 1-byte/dim codes instead of 8-byte/dim vectors (parquet
    * column pruning; ~8× fewer scan bytes at corpus scale), survivors are
    * rescored exactly from the full column via a pushed `vec_id IN`
    * filter over vec_id-sorted row groups. Same store, same fingerprint
    * amortization as q_knn_join_ivf. No oracle (data-dependent centroids
    * + quantization grid aren't expressible in portable SQL); AnnSpec
    * measures recall vs brute force and asserts the code-only ReadSchema
    * on the approximate scan. */
  def knnJoinIvfSq(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.stable(s, s"graft_ivf_${StoreDirs.pathKey(dir)}")
    val emb = Tables.embeddings(s, dir)
    IvfIndex.buildIfNeeded(emb, idCol = "vec_id", vecCol = "embedding",
      path = store,
      fingerprint = IvfIndex.inputFingerprint(s, s"$dir/embeddings.parquet"))
    IvfIndex.knnJoinSq(s, store, emb.where(col("vec_id") < KnnProbes),
      idCol = "vec_id", vecCol = "embedding", k = KnnK, rescoreK = 4 * KnnK)
  }

  /** PQ layout for q_knn_join_ivf_pq: 8 subspaces × 256 centroids over the
    * 64-dim fixture vectors — the Jégou '11 (m=8, k*=256) setting, an
    * 8-byte code per vector (64× less approximate-scan I/O than the full
    * column, 8× less than SQ8). */
  private val PqM = 8
  private val PqK = 256

  /** B9+ batch kNN through the inverted file with PRODUCT quantization
    * (IvfIndex.knnJoinPq) — the compression rung past SQ8 (Jégou '11):
    * the approximate phase reads an M-byte code per vector (parquet
    * column pruning: ~64× fewer scan bytes than the full column at dim
    * 64) and scores it against the probe with the asymmetric codebook
    * kernel; survivors rescore exactly from the full vectors. Own store
    * (the PQ layout is part of the build fingerprint — sharing the SQ8
    * store would thrash rebuilds). No oracle (data-dependent codebooks);
    * AnnSpec measures recall vs brute force, asserts the pq-only
    * ReadSchema on the approximate scan, and cross-checks the encode/
    * score kernels against driver-side reconstruction. */
  def knnJoinIvfPq(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.stable(s, s"graft_ivfpq_${StoreDirs.pathKey(dir)}")
    val emb = Tables.embeddings(s, dir)
    IvfIndex.buildIfNeeded(emb, idCol = "vec_id", vecCol = "embedding",
      path = store,
      fingerprint = IvfIndex.inputFingerprint(s, s"$dir/embeddings.parquet"),
      pq = Some((PqM, PqK)))
    IvfIndex.knnJoinPq(s, store, emb.where(col("vec_id") < KnnProbes),
      idCol = "vec_id", vecCol = "embedding", k = KnnK, rescoreK = 8 * KnnK)
  }

  /** B9 approximate similarity search: multi-table hyperplane LSH with
    * exact rerank. No oracle (plan-time literal planes aren't expressible
    * in portable SQL); AnnSpec measures recall on clustered data. */
  def simAnn(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.lshTopK(Tables.embeddings(s, dir),
      idCol = "vec_id", vecCol = "embedding", probeId = 0L, k = 10, dim = 64)

  /** B9 approximate similarity search, IVF variant — through the
    * MATERIALIZED inverted file (IvfIndex), not the post-scan cell filter:
    * the index build writes every vector once into cell-partitioned parquet
    * (one scan + one shuffle, amortized over every probe — `buildIfNeeded`
    * reuses the store when its fingerprint matches the input, so only the
    * FIRST call on a given input pays the build), then
    * the probe reads ONLY its `nProbe` nearest cells' files — Catalyst
    * partition pruning at the file-listing level, asserted on THIS query's
    * plan in AnnSpec (numFiles < total). The post-scan variant survives as
    * `SimilaritySearch.ivfTopK` for corpora that are queried once (where an
    * index build could never amortize). No oracle (data-dependent centroids
    * aren't expressible in portable SQL); AnnSpec measures recall and the
    * scanned fraction. */
  def simIvf(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.stable(s, s"graft_ivf_${StoreDirs.pathKey(dir)}")
    val emb = Tables.embeddings(s, dir)
    // Get-or-create: reuse the materialized index when it was built from
    // exactly this input (file-listing fingerprint), rebuild otherwise. The
    // benched number is then the amortized PROBE — the cost the 100 TB
    // story actually claims — while the build cost stays visible and
    // spec-pinned in AnnSpec (r9 verdict #3/#4).
    IvfIndex.buildIfNeeded(emb, idCol = "vec_id", vecCol = "embedding",
      path = store,
      fingerprint = IvfIndex.inputFingerprint(s, s"$dir/embeddings.parquet"))
    // bounded driver materialization: exactly one row (the probe vector)
    val probe = emb.where(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0).toArray
    IvfIndex.topK(s, store, probe, k = 10, nProbe = 4, excludeId = 0L)
  }

  /** Per-language stopword seed profiles (Cavnar–Trenkle-style profile
    * scoring, collapsed to its word-level core): public high-frequency
    * function words. Sorted by lang so plans and oracles enumerate
    * identically. */
  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "ein", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "pas"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))

  /** B9 language ID: score each doc against every profile (stopword-hit
    * count — one codegen'd pass, profiles are plan-time literals), predict
    * the argmax (ties → lexicographically greatest lang, zero hits →
    * 'und'). The fixture's text is synthetic, so predictions are mostly
    * 'en'/'und' — the contract here is the deterministic scoring pipeline,
    * which the oracle replays in SQL. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val tk = TextFns.tokens(lower(col("text")))
    val scored = array(LangProfiles.map { case (l, ws) =>
      struct(size(filter(tk, t => t.isin(ws: _*))).as("hits"), lit(l).as("lang"))
    }: _*)
    Tables.documents(s, dir)
      .select(col("doc_id"), array_max(scored).as("best"))
      .select(col("doc_id"),
        when(col("best.hits") === 0, "und").otherwise(col("best.lang")).as("lang_pred"),
        col("best.hits").as("hits"))
      .orderBy(col("doc_id"))
  }

  /** B9 token counting, BPE-ish: GPT-2-style pre-tokens (letter runs, digit
    * runs, punctuation marks) next to whitespace tokens, per language. */
  def tokenBpe(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextFns.tokens(col("text")))).as("total_ws_tokens"),
        sum(size(TextFns.bpeTokens(col("text")))).as("total_bpe_tokens"))
      .orderBy(col("lang"))

  /** B9 embedding-cosine near-dup (SimilaritySearch.cosinePairs — size-
    * adaptive). τ=0.45 is what this isotropic fixture supports (max
    * pairwise cosine ≈ 0.51). At fixture scale the operator dispatches to
    * the exact broadcast all-pairs plan (cheaper than LSH key generation
    * below ~8k vectors, recall exactly 1), so since r6 the key carries a
    * full DuckDB hash oracle; above the crossover the same call runs
    * τ-derived LSH candidates + exact verify, whose recall/candidate
    * bounds AnnSpec asserts at this exact τ. */
  def dedupEmbed(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.cosinePairs(Tables.embeddings(s, dir),
      idCol = "vec_id", vecCol = "embedding", tau = 0.45, dim = 64)

  /** The embedding-decontamination gate (raw cosine ≥ τ after the 6dp
    * round, the dedupEmbed convention): the isotropic fixture's
    * cross-set cosines top out ≈ 0.5, so 0.35 flags a small real set. */
  private val EmbedDeconTau = 0.35

  /** B9+ EMBEDDING-based decontamination — the semantic arm of the
    * decontaminate family (exact/overlap/Bloom are n-gram keys and miss
    * PARAPHRASED benchmark leakage; an embedding match catches reworded
    * eval questions): a corpus vector is contaminated when its cosine
    * against ANY benchmark vector reaches τ. One row per contaminated
    * vector with its best-matching benchmark (max sim, ties → lowest
    * bench id — a struct-max, no second pass) and its hit count. 100 TB
    * shape: the benchmark side is SMALL by nature (eval suites are MBs,
    * corpora are TBs) — it BROADCASTS into a nested-loop join with the
    * codegen'd cosine kernel, the corpus side scans once and never
    * shuffles; past a few thousand benchmark vectors the same gate runs
    * through the IVF store (q_sim_ann machinery) with candidates
    * rescored exactly. Sim rounds at 6dp BEFORE the threshold on both
    * engines (the dedupEmbed parity rule). */
  def decontaminateEmbed(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val bench = emb.where(pmod(col("vec_id"), lit(41L)) === 7L)
      .select(col("vec_id").as("bench_id"), col("v").as("bv"))
    emb.where(pmod(col("vec_id"), lit(41L)) =!= 7L)
      .join(broadcast(bench))
      .withColumn("sim",
        round(graft.functions.VectorFns.cosine(col("v"), col("bv")), 6))
      .where(col("sim") >= EmbedDeconTau)
      .select(col("vec_id"),
        struct(col("sim"), (-col("bench_id")).as("nb"),
          col("bench_id")).as("hit"))
      .groupBy(col("vec_id"))
      .agg(max(col("hit")).as("best"), count(lit(1)).as("n_hits"))
      .select(col("vec_id"), col("best.bench_id").as("bench_id"),
        col("best.sim").as("sim"), col("n_hits"))
      .orderBy(col("vec_id"))
  }

  /** B9+ semantic dedup carried to CLUSTERS: connected components over the
    * q_dedup_embed cosine pair graph — the same min-label machinery as the
    * text family (NearDedup.clusterPairs: size-adaptive driver union-find
    * vs distributed min-label propagation), so the embedding modality now
    * has the full dedup ladder pairs → clusters → canonical. Oracle:
    * recursive reachability over the same cosine pairs. */
  def dedupEmbedCluster(s: SparkSession, dir: String): DataFrame =
    NearDedup.clusterPairs(dedupEmbed(s, dir))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
      .orderBy(col("vec_id"))

  /** B9+ semantic CANONICAL selection — the keep-list: every vector
    * survives unless it is a non-label member of a cosine cluster. Same
    * edge-count-gated prune dispatch as the text canonical
    * (NearDedup.pruneByLosers: broadcast under the conf'd ceiling,
    * shuffled left_anti above — the r10-verdict discipline), with the
    * bound coming FREE from the cluster pipeline. */
  def dedupEmbedCanonical(s: SparkSession, dir: String): DataFrame = {
    val (clusters, edgeBound) =
      NearDedup.clusterPairsCounted(dedupEmbed(s, dir))
    val losers = clusters.where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("vec_id"))
    NearDedup.pruneByLosers(
        Tables.embeddings(s, dir).select(col("vec_id"), col("label")),
        losers, edgeBound, idCol = "vec_id")
      .orderBy(col("vec_id"))
  }

  private val OutlierTau = 0.0 // below: not even weakly aligned with own class

  /** B9+ centroid-distance outliers — the prune-the-junk curation step run
    * next to dedup (mislabeled / off-distribution vectors hurt contrastive
    * training more than duplicates): each vector's rounded cosine to its
    * OWN label's 6dp centroid ([[codebook]] — the same broadcast KB-sized
    * table as q_embed_kmeans), flagged when the alignment drops below τ=0
    * (on this isotropic fixture ~p10; a real deployment tunes τ per
    * corpus). One corpus scan, broadcast codebook join, row-local score —
    * zero wide shuffles beyond the determinism sort. */
  def embedOutliers(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .join(broadcast(codebook(emb)), col("label") === col("c_label"))
      .select(col("vec_id"), col("label"),
        round(VectorFns.cosine(col("v"), col("cv")), 6).as("sim_centroid"))
      .withColumn("is_outlier", col("sim_centroid") < lit(OutlierTau))
      .orderBy(col("vec_id"))
  }

  private val SemTau = 0.45 // within-cluster cosine threshold (SemDeDup §3)

  /** B9+ SemDeDup (Abbas et al. '23, arXiv:2303.09540): semantic
    * deduplication with the pair search BUCKETED BY K-MEANS CLUSTER —
    * the published recipe for embedding dedup past the all-pairs/LSH
    * crossover: cluster the corpus (here [[embedKmeansIter]]'s three
    * oracle-deterministic Lloyd rounds), compare vectors only WITHIN
    * their assigned cluster (cosine ≥ τ on the same rounded kernel as
    * q_dedup_embed), and keep one representative per within-cluster
    * duplicate group (the min-id canonical, via the same
    * clusterPairs/pruneByLosers machinery as the text family). Output:
    * the keep-list with each survivor's semantic cluster.
    *
    * Scale shape: the candidate join is equi-keyed on the cluster id —
    * one shuffle each side, per-cluster all-pairs, NO corpus-wide
    * quadratic term. Cluster count grows with the corpus (SemDeDup runs
    * ~100k clusters at web scale) so mean cluster size — and with it the
    * per-task pair cost — stays bounded; a pathologically hot cluster is
    * a k (re-clustering) knob, not a plan hazard, and the documented
    * trade vs q_dedup_embed is RECALL: cross-cluster near-dups are
    * unseen by construction (the paper's accepted approximation).
    * AnnSpec-style recall is not claimed; determinism is — every
    * centroid component and similarity rounds to 6dp before any
    * comparison, so the full three-round pipeline + pair graph + CC +
    * keep-list carries a DuckDB hash oracle end-to-end. */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val assign = embedKmeansIter(s, dir).select(col("vec_id"), col("cluster"))
    val av = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .join(assign, "vec_id")
    val a = av.select(col("cluster"), col("vec_id").as("a_id"), col("v").as("va"))
    val b = av.select(col("cluster").as("cluster_b"), col("vec_id").as("b_id"),
      col("v").as("vb"))
    val pairs = a.join(b,
        col("cluster") === col("cluster_b") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(VectorFns.cosine(col("va"), col("vb")), 6).as("sim"))
      .where(col("sim") >= SemTau)
      .select(col("a_id"), col("b_id"))
    val (clusters, edgeBound) = NearDedup.clusterPairsCounted(pairs)
    val losers = clusters.where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("vec_id"))
    NearDedup.pruneByLosers(
        av.select(col("vec_id"), col("cluster")), losers, edgeBound,
        idCol = "vec_id")
      .join(Tables.embeddings(s, dir).select(col("vec_id"), col("label")),
        "vec_id")
      .select(col("vec_id"), col("cluster"), col("label"))
      .orderBy(col("vec_id"))
  }

  /** B9 rolling-hash fingerprints (winnowing/MOSS — NearDedup.winnow), in
    * the md5-bit form so the key carries a FULL DuckDB value oracle: each
    * gram hash is the first 60 bits of md5 (15 hex digits — non-negative,
    * BIGINT-safe on both engines), which the oracle replays with substr +
    * md5 + a window MIN — same re-basing that oracled q_dedup_simhash /
    * q_doc_fingerprint in r7. The xxhash64 kernel stays the fast default
    * (NearDedup.winnow md5Bits=false, parity- and guarantee-covered in
    * LlmPackSpec). One scalar (doc_id, fp) row per fingerprint. */
  def fingerprintWinnow(s: SparkSession, dir: String): DataFrame =
    NearDedup.winnow(Tables.documents(s, dir), idCol = "doc_id",
        textCol = "text", md5Bits = true)
      .orderBy(col("doc_id"), col("fp"))

  /** B9 multimodal plumbing: documents' text bytes treated as an opaque
    * binary payload with typed metadata — the schema/partitioning shape an
    * image/audio column takes (decode itself is stubbed: see
    * graft.multimodal.Multimodal + MultimodalSpec). */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val blob = col("text").cast("binary")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        length(blob).as("n_bytes"),
        sha2(blob, 256).as("sha"),
        substring(base64(blob), 1, 16).as("b64_head"))
      .orderBy(col("doc_id"))
  }

  /** Multimodal frame sampling (Multimodal.sampleFrames) driven end-to-end
    * through the driver contract: documents-as-assets payloads sliced into
    * every 4th 256-byte frame, all in builtin codegen'd expressions. The
    * oracle is CONTENT-BEARING, not just arithmetic: md5 over the
    * concatenated sampled frames. Character-level DuckDB slicing is exact
    * because the documents fixture is pure ASCII at every SF (verified:
    * octet_length(encode(text)) == length(text) for all rows), so byte
    * offsets and char offsets coincide. */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame = {
    val assets = Multimodal.documentAssets(s, dir).toDF()
    Multimodal.sampleFrames(assets, "payload", frameBytes = 256, stride = 4)
      .select(col("asset_id"),
        length(col("payload")).as("n_bytes"),
        size(col("frames")).as("n_frames"),
        md5(array_join(transform(col("frames"), f => f.cast("string")), ""))
          .as("frames_md5"))
      .orderBy(col("asset_id"))
  }

  /** Multimodal resize (Multimodal.resize) through the driver contract.
    * Text payloads have no raster arm, so every row takes the stub —
    * which is exactly what makes the key oracle-able: the stub thumbnail
    * is the payload cycled to 64×64×3 bytes, reproducible in DuckDB as
    * char-level repeat+substring over the ASCII corpus. The decoder
    * column rides along so the all-stub expectation is CHECKED, not
    * assumed (a raster doc sneaking in would flip it and fail the hash).
    * The imageio arm is covered in MultimodalSpec with real PNG/BMP
    * payloads (not DuckDB-expressible). */
  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    val assets = Multimodal.documentAssets(s, dir)
    Multimodal.resize(assets, 64, 64).toDF()
      .select(col("asset_id"), col("width"), col("height"), col("n_bytes"),
        md5(col("payload")).as("payload_md5"), col("decoder"))
      .orderBy(col("asset_id"))
  }

  /** B9 unigram-LM quality score (the CCNet-style perplexity filter, with
    * the corpus itself as the LM): per-doc mean negative log-likelihood
    * under corpus unigram frequencies — nll = ln(T) − Σ m·ln(c) / n over
    * the doc's tokens (m = in-doc count, c = corpus count, T = corpus
    * total, n = doc length); perplexity is exp(nll). High nll = rare-token
    * soup (noise, boilerplate hashes); low = stopword mush — both ends get
    * cut in a real pipeline. Two hash aggregations and one broadcast join,
    * one plan: the vocab side is frequency-bounded (distinct tokens, the
    * same ≤500k-entry regime as q_vocab_coverage — at 100 TB prune the
    * long tail to a min count and give OOV a floor probability), the total
    * rides a broadcast scalar, and the doc side never shuffles more than
    * its distinct (doc, token) pairs, which map-side combine bounds at the
    * doc's vocabulary, not its length. */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
    val dt = tok.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("m"))
    val freq = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = freq.agg(sum(col("c")).cast("double").as("t"))
    dt.join(broadcast(freq), Seq("tok"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_tokens"),
        round(log(max(col("t"))) -
          (sum(col("m").cast("double") * log(col("c"))) /
            sum(col("m")).cast("double")), 6).as("nll"))
      .orderBy(col("doc_id"))
  }

  private val HardNegK = 5
  /** B9 hard-negative mining (SimilaritySearch.hardNegatives): for each
    * probe embedding, its k nearest neighbors under cosine whose label
    * differs — the contrastive-training pair generator. Probe set and
    * plan shape shared with q_knn_join. */
  def hardNegativesQ(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.hardNegatives(emb, emb.where(col("vec_id") < KnnProbes),
      idCol = "vec_id", vecCol = "embedding", labelCol = "label", k = HardNegK)
  }

  /** B9+ embedding-table audit — the vector-data profiling pass a pipeline
    * runs BEFORE trusting a new embedding drop for similarity work: per
    * label, vector count, dimension bounds (a ragged dim breaks every
    * kernel downstream), L2-norm statistics, and the zero-vector count
    * (zero vectors poison cosine). Norms are per-row ordered folds (the
    * graft_dot kernel accumulates in the same index order as DuckDB's
    * list_dot_product, so min/max match BIT-exactly; only the
    * order-sensitive mean is 6dp-rounded). A pure narrow map into a
    * labels-bounded map-side-combined aggregate — one scan, no joins. */
  def embedNorms(s: SparkSession, dir: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    Tables.embeddings(s, dir)
      .select(col("label"), size(v).as("dim"),
        sqrt(graft.functions.VectorFns.dot(v, v)).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("dim")).as("dim_min"), max(col("dim")).as("dim_max"),
        round(avg(col("nrm")), 6).as("mean_norm"),
        min(col("nrm")).as("min_norm"), max(col("nrm")).as("max_norm"),
        sum(when(col("nrm") === 0.0, 1L).otherwise(0L)).as("n_zero"))
      .orderBy(col("label"))
  }

  /** B9 mutual-kNN graph (SimilaritySearch.mutualKnn over the exact kNN
    * edge list): pairs that are in each other's top-k — the symmetric
    * neighborhood graph that seeds graph-based semantic dedup. All rows
    * probe here (500 vectors — the exact backend's own size-adaptive
    * regime); at corpus scale the edge list comes from IvfIndex.knnJoin
    * and the mutual self-join is unchanged (k·N edge rows, never
    * vectors). */
  def knnMutual(s: SparkSession, dir: String): DataFrame =
    mutualEdges(s, dir).orderBy(col("a_id"), col("b_id"))

  /** Fingerprint-amortized mutual-kNN edge list — the ONE materialized
    * artifact the whole graph family (q_knn_mutual, both PageRank keys,
    * triangles/clustering) reads instead of each re-running the N×P
    * scoring pass per query: built once per input into a dedicated store
    * (the q_sim_ivf/z-order ledger — content fingerprint written LAST, so
    * a crashed build leaves no fingerprint and rebuilds), then served as
    * a k·N-row parquet scan. This is also the production shape: a
    * semantic-graph pipeline maintains its edge list as an artifact with
    * a freshness ledger, it does not recompute vectors-cross-vectors in
    * every downstream query. Replaces the per-query
    * `Compute.materialize(mutualKnn(knnEdges(...)))` — and with it the
    * localCheckpoint executor-loss caveat on these paths (parquet survives
    * anything short of losing the store dir). */
  private[graft] def mutualEdges(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.stable(s, s"graft_knnedges_${StoreDirs.pathKey(dir)}")
    val fpFile = "_edges_fingerprint.txt"
    val fp = IvfIndex.inputFingerprint(s, s"$dir/embeddings.parquet") +
      s":k$HardNegK"
    if (!IvfIndex.readSidecar(s, store, fpFile).contains(fp)) {
      val emb = Tables.embeddings(s, dir)
      SimilaritySearch.mutualKnn(
          SimilaritySearch.knnEdges(emb, emb, idCol = "vec_id",
            vecCol = "embedding", k = HardNegK))
        // overwrite clears the previous life INCLUDING its fingerprint;
        // the new fingerprint lands only after the data commit
        .write.mode("overwrite").parquet(store)
      IvfIndex.writeSidecar(s, store, fpFile, fp)
    }
    s.read.parquet(store).select(col("a_id"), col("b_id"), col("sim"))
  }

  /** PageRank damping; PrBase = 1−d, kept as an independent literal (not
    * computed) so both engines parse the identical double. */
  private val PrDamping = 0.85
  private val PrBase = 0.15

  /** B9+ graph centrality over the mutual-kNN semantic graph (the
    * q_knn_mutual edge set): per-node degree and one damped PageRank power
    * step (Page et al. '99) from the uniform start, scaled by N so scores
    * are O(1) and corpus-size-independent:
    * npr(v) = (1−d) + d·(Σ_{u∈nbrs(v)} 1/deg(u) + n_dangling/N).
    * The centrality pass that ranks hub documents inside a semantic
    * curation graph (which docs anchor dense regions vs sit isolated).
    * Plan: the graph is the k·N mutual edge list — vectors never shuffle
    * past the kNN stage; degree and neighbor-mass are map-side-combined
    * aggregates on that edge list; the (N, n_dangling) totals re-enter as
    * a broadcast 1-row aggregate (the sourceMix pattern); final assembly
    * is a node-keyed left join. Further power iterations repeat the
    * contrib aggregate on pr_i — checkpoint-per-iteration exactly like
    * NearDedup.clusterPairs' label propagation. Neighbor-mass sums are
    * 6dp-rounded (float summation order). */
  def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    // the fingerprint-amortized edge store: the directed-edge union and
    // the degree/contrib/total re-entries all read a k·N parquet scan
    val mutual = mutualEdges(s, dir).select(col("a_id"), col("b_id"))
    val edges = mutual.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(mutual.select(col("b_id").as("src"), col("a_id").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val contrib = edges.join(deg, "src")
      .groupBy(col("dst")).agg(sum(lit(1.0) / col("deg")).as("mass"))
    val nodes = Tables.embeddings(s, dir).select(col("vec_id"))
    val nodeDeg = nodes.join(deg, nodes("vec_id") === deg("src"), "left")
      .select(col("vec_id"), coalesce(col("deg"), lit(0L)).as("degree"))
    val tot = nodeDeg.agg(count(lit(1)).as("n"),
      sum(when(col("degree") === 0, 1L).otherwise(0L)).as("nd"))
    nodeDeg.crossJoin(broadcast(tot))
      .join(contrib, nodeDeg("vec_id") === contrib("dst"), "left")
      .select(col("vec_id"), col("degree"),
        round(lit(PrBase) + lit(PrDamping) *
          (coalesce(col("mass"), lit(0.0)) +
            col("nd").cast("double") / col("n")), 6).as("npr"))
      .orderBy(col("vec_id"))
  }

  /** Damped power-iteration rounds for `graphPagerankIter`; matches the
    * unrolled CTE chain in the oracle. */
  private val PrIters = 3

  /** B9+ PageRank iterated to (near-)convergence over the mutual-kNN
    * semantic graph — the fixpoint `graphPagerank`'s single power step
    * ranks toward: [[PrIters]] damped rounds from the uniform N-scaled
    * start pr₀ ≡ 1, each round
    * pr_{i+1}(v) = (1−d) + d·(Σ_{u→v} pr_i(u)/deg(u) + Σ_dangling pr_i/N).
    * The q_embed_kmeans_iter discipline makes a 3-deep iterative algorithm
    * carry a full cross-engine hash oracle: every round's rank is rounded
    * to 6dp — both engines re-enter round i+1 from the SAME rounded values,
    * so float summation order cannot drift across rounds — and the DuckDB
    * oracle unrolls the identical recurrence as a CTE chain.
    *
    * Distributed shape per round — the standard PageRank layout: the k·N
    * edge list (materialized ONCE, vectors never shuffle past the kNN
    * stage) joins the node-keyed rank vector on src, the neighbor mass is
    * a map-side-combined dst aggregate, and the (N, dangling-mass) totals
    * re-enter as a broadcast 1-row aggregate. `Compute.materialize` after
    * each round truncates lineage (round T never replans rounds 1..T−1;
    * reliable checkpoint when a checkpoint dir is set). Rank mass is
    * conserved at N every round (asserted with convergence monotonicity in
    * LlmPackSpec). */
  def graphPagerankIter(s: SparkSession, dir: String): DataFrame =
    graphPagerankRounds(s, dir, PrIters)

  /** Round-parameterized body of [[graphPagerankIter]] (exposed for the
    * per-round mass-conservation / convergence assertions in LlmPackSpec;
    * `iters = 1` from the uniform start reproduces [[graphPagerank]]'s
    * single power step exactly). */
  private[graft] def graphPagerankRounds(
      s: SparkSession, dir: String, iters: Int): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val mutual = mutualEdges(s, dir).select(col("a_id"), col("b_id"))
    // The edge list is STATIC across rounds; hash-partition it by src once
    // and persist (the q_embed_kmeans_iter r21 layout — persist keeps
    // outputPartitioning where a checkpoint would not), so each round's
    // contrib join leaves the k·N edge payload in place and only the O(N)
    // rank vector exchanges per round. Before: the directed-edge union
    // re-read the edge store and re-shuffled by src EVERY round. Freed
    // before return — the final round's materialize is eager.
    val edges = mutual.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(mutual.select(col("b_id").as("src"), col("a_id").as("dst")))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = emb.select(col("vec_id"))
    // node-keyed (vec_id, degree) skeleton, carried through every round
    var pr = Compute.materialize(
      nodes.join(deg, nodes("vec_id") === deg("src"), "left")
        .select(col("vec_id"), coalesce(col("deg"), lit(0L)).as("degree"),
          lit(1.0).as("pr")))
    for (_ <- 1 to iters) {
      // N and the dangling mass in ONE bounded 1-row aggregate over the
      // node-keyed rank vector; re-enters as a broadcast
      val tot = pr.agg(count(lit(1)).as("n"),
        sum(when(col("degree") === 0, col("pr")).otherwise(lit(0.0)))
          .as("dmass"))
      // dangling nodes route their mass through dmass, not the edge walk —
      // and the pre-join degree>0 guard keeps the division ANSI-safe
      val contrib = edges
        .join(pr.filter(col("degree") > 0)
          .select(col("vec_id").as("src"),
            (col("pr") / col("degree")).as("w")), "src")
        .groupBy(col("dst")).agg(sum(col("w")).as("mass"))
      pr = Compute.materialize(
        pr.join(contrib, pr("vec_id") === contrib("dst"), "left")
          .crossJoin(broadcast(tot))
          .select(pr("vec_id"), col("degree"),
            round(lit(PrBase) + lit(PrDamping) *
              (coalesce(col("mass"), lit(0.0)) +
                col("dmass") / col("n").cast("double")), 6).as("pr")))
    }
    pr.select(col("vec_id"), col("degree"), col("pr").as("npr"))
      .orderBy(col("vec_id"))
    } finally edges.unpersist(blocking = false)
  }

  /** B9+ triangle count + local clustering coefficient over the mutual-kNN
    * semantic graph — the density signal that separates docs anchoring
    * tight semantic clusters (high coefficient) from bridge/outlier docs,
    * complementing q_graph_pagerank's centrality. Classic two-join
    * triangle enumeration over the CANONICALLY ORIENTED edge list: every
    * edge is stored (lo, hi), so a triangle a<b<c is found exactly once as
    * (a,b)⋈(b,c)⋈(a,c) — orientation does for free what general triangle
    * counting needs degree-ordering for. Wedge fan-out is bounded by the
    * mutual graph's construction (degree ≤ k), so the intermediate is at
    * most N·k² rows — no hub explosion at any corpus size; vectors never
    * shuffle past the kNN stage (the edge list is checkpointed once by
    * mutualKnn). Per-node coefficient = 2·T / (deg·(deg−1)) — same
    * integer-fed IEEE division both engines, 6dp cosmetic rounding. */
  def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // the fingerprint-amortized edge store: e1/e2/e3/deg's four references
    // are each a cheap k·N parquet scan, not a re-run of the mutual join
    val edges = mutualEdges(s, dir)
      .select(col("a_id"), col("b_id")) // canonical a < b
    val e1 = edges.select(col("a_id").as("a"), col("b_id").as("b"))
    val e2 = edges.select(col("a_id").as("b2"), col("b_id").as("c"))
    val e3 = edges.select(col("a_id").as("a3"), col("b_id").as("c3"))
    val tri = e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
    val triPerNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("vec_id"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n_triangles"))
    val deg = edges.select(col("a_id").as("vec_id"))
      .unionAll(edges.select(col("b_id").as("vec_id")))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("degree"))
    emb.select(col("vec_id"))
      .join(deg, Seq("vec_id"), "left")
      .join(triPerNode, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          round(col("n_triangles") * lit(2.0) /
            (col("degree") * (col("degree") - 1)), 6))
          .otherwise(lit(0.0)))
      .orderBy(col("vec_id"))
  }

  /** First md5 nibble under this ceiling marks a doc as the incoming "new
    * batch" (3/16 ≈ 19% of the fixture) for q_dedup_incremental — the same
    * deterministic engine-portable hash gate as q_split_assign. */
  private val IncNewMax = "3"

  /** B9+ incremental near-dedup (the daily-ingest admission gate): which
    * NEW docs near-duplicate the standing corpus or an earlier arrival in
    * the same batch. NearDedup.minhashLshIncremental — probe(new)×build(all)
    * band join, corpus×corpus candidates never formed, exact shingle-set
    * verify — so the oracle is the all-pairs Jaccard CTE restricted to
    * pairs with a new-side member (recall argument identical to
    * q_dedup_minhash's: τ=0.8 pair missed with p≈5e-8). */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame =
    NearDedup.minhashLshIncremental(
      Tables.documents(s, dir).withColumn("is_new",
        substring(md5(col("doc_id").cast("string")), 1, 1) < IncNewMax),
      idCol = "doc_id", textCol = "text", partCol = "lang",
      newCol = "is_new", tau = Tau, materialize = Some(true))
      .orderBy(col("new_id"), col("dup_of"))

  /** B9+ incremental near-dedup through the PERSISTED signature store —
    * the build-once/probe-many form of q_dedup_incremental (SigStore:
    * corpus banded keys + shingle sets materialized once behind an input
    * fingerprint, batches probe without ever re-reading corpus text).
    * Exactness is unchanged (stored exact sets verify candidates), so the
    * key shares q_dedup_incremental's oracle verbatim; store/recompute
    * pair-set equality and rebuild gating are asserted in NearDedupSpec. */
  def dedupIncrementalStore(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.stable(s, s"graft_sig_${StoreDirs.pathKey(dir)}")
    val docs = Tables.documents(s, dir)
    val isNew = substring(md5(col("doc_id").cast("string")), 1, 1) < IncNewMax
    SigStore.buildIfNeeded(docs.where(!isNew), store,
      fingerprint =
        IvfIndex.inputFingerprint(s, s"$dir/documents.parquet") + ":inc",
      idCol = "doc_id", textCol = "text", partCol = "lang")
    SigStore.probe(store, docs.where(isNew),
        idCol = "doc_id", textCol = "text", partCol = "lang", tau = Tau)
      .orderBy(col("new_id"), col("dup_of"))
  }

  /** B9+ duplicated-span report — the exact-substring dedup signal of Lee
    * et al. '21 ("Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499) at word-5-gram granularity: per doc, how
    * many of its distinct 5-token spans appear verbatim in ANY other doc,
    * and the duplicated-span fraction (the per-doc memorization-risk gauge
    * used to gate training corpora; a doc can be globally unique yet carry
    * boilerplate spans that exact/near dedup both miss). Spans ride as the
    * first 64 bits of md5 (16 hex chars — cross-engine, and a fixed-width
    * shuffle key regardless of span text; a 64-bit collision between
    * different spans is ~n²·2⁻⁶⁵, never at any storable corpus size).
    * Plan: span-multiplicity aggregate with full map-side combine; only
    * spans seen >1× (the duplicated minority) survive into the count join
    * (AQE broadcasts that side when small); one final doc_id-keyed
    * aggregate + left join restores zero-span and all-unique docs. No
    * windows over the span key — a hyper-common boilerplate span arrives
    * pre-combined, it cannot serialize a task. */
  def spanDedup(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"),
        transform(TextFns.shinglesN(col("text"), 5),
          x => substring(md5(x), 1, 16)).as("gs"))
    val base = d.select(col("doc_id"), size(col("gs")).cast("long").as("n_spans"))
    val e = d.select(col("doc_id"), explode(col("gs")).as("h"))
    val dup = e.groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .where(col("nd") > 1)
    val shared = e.join(dup, "h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    base.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(col("n_spans") > 0,
          round(coalesce(col("n_shared"), lit(0L)).cast("double") /
            col("n_spans"), 4)).otherwise(lit(0.0)).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_incremental" -> dedupIncremental,
    "q_dedup_incremental_store" -> dedupIncrementalStore,
    "q_span_dedup" -> spanDedup,
    "q_graph_pagerank" -> graphPagerank,
    "q_graph_pagerank_iter" -> graphPagerankIter,
    "q_graph_triangles" -> graphTriangles,
    "q_quality_deciles" -> qualityDeciles,
    "q_quality_deciles_approx" -> qualityDecilesApprox,
    "q_embed_norms" -> embedNorms,
    "q_embed_kmeans_iter" -> embedKmeansIter,
    "q_dedup_exact" -> dedupExact,
    "q_dedup_stats" -> dedupStats,
    "q_dedup_near" -> dedupNear,
    "q_dedup_contain" -> dedupContain,
    "q_dedup_contain_clean" -> dedupContainClean,
    "q_token_zipf" -> tokenZipf,
    "q_dedup_minhash" -> dedupMinhash,
    "q_dedup_cluster" -> dedupCluster,
    "q_dedup_canonical" -> dedupCanonical,
    "q_dedup_simhash" -> dedupSimhash,
    "q_doc_fingerprint" -> docFingerprint,
    "q_text_stats" -> textStats,
    "q_quality_score" -> qualityScore,
    "q_quality_repetition" -> qualityRepetition,
    "q_token_entropy" -> tokenEntropy,
    "q_token_topk" -> tokenTopk,
    "q_vocab_coverage" -> vocabCoverage,
    "q_tfidf_terms" -> tfidfTerms,
    "q_text_bm25" -> bm25Search,
    "q_text_redact" -> redactPii,
    "q_quality_gopher" -> qualityGopher,
    "q_embed_centroids" -> embedCentroids,
    "q_embed_kmeans" -> embedKmeans,
    "q_sim_topk" -> simTopk,
    "q_sim_topk_filtered" -> simTopkFiltered,
    "q_knn_join" -> knnJoin,
    "q_knn_join_lsh" -> knnJoinLshQ,
    "q_knn_join_ivf" -> knnJoinIvf,
    "q_knn_join_ivf_sq" -> knnJoinIvfSq,
    "q_knn_join_ivf_pq" -> knnJoinIvfPq,
    "q_sim_ann" -> simAnn,
    "q_sim_ivf" -> simIvf,
    "q_lang_id" -> langId,
    "q_token_bpe" -> tokenBpe,
    "q_dedup_embed" -> dedupEmbed,
    "q_decontaminate_embed" -> decontaminateEmbed,
    "q_dedup_embed_cluster" -> dedupEmbedCluster,
    "q_dedup_embed_canonical" -> dedupEmbedCanonical,
    "q_dedup_semantic" -> dedupSemantic,
    "q_embed_outliers" -> embedOutliers,
    "q_fingerprint_winnow" -> fingerprintWinnow,
    "q_multimodal_meta" -> multimodalMeta,
    "q_multimodal_frames" -> multimodalFrames,
    "q_multimodal_resize" -> multimodalResize,
    "q_lm_score" -> lmScore,
    "q_hard_negatives" -> hardNegativesQ,
    "q_knn_mutual" -> knnMutual,
    "q_text_normalize" -> textNormalize,
    "q_embed_pca_power" -> embedPcaPower,
    "q_token_cms" -> tokenCms)

  /** The q_embed_kmeans_iter oracle: [[KmIters]] unrolled Lloyd rounds.
    * Round i rebuilds the 6dp-rounded codebook from assignment a(i−1)
    * (the q_embed_centroids aggregate), scores every vector against it
    * with the q_embed_kmeans rounded cosine, and takes the argmax with the
    * same (sim DESC, cluster ASC) tie rule the Spark struct-max encodes. */
  /** The unrolled-Lloyd CTE chain (a0..a[[KmIters]]), shared by the
    * q_embed_kmeans_iter oracle and the q_dedup_semantic oracle (which
    * buckets its pair search by the final assignment). */
  private val kmeansIterCtes: String = {
    val iters = (1 to KmIters).map { i =>
      val prev = s"a${i - 1}"
      s"""c$i AS (SELECT cl, list(round(avg_x, 6) ORDER BY pos) AS cv FROM (
         |    SELECT cl, pos, avg(x) AS avg_x FROM (
         |      SELECT cl, generate_subscripts(v, 1) AS pos,
         |             CAST(unnest(v) AS DOUBLE) AS x FROM $prev)
         |    GROUP BY cl, pos)
         |  GROUP BY cl),
         |s$i AS (SELECT a.vec_id, a.v, c.cl AS c_cl,
         |    round(list_dot_product(a.v, c.cv)
         |      / (sqrt(list_dot_product(a.v, a.v))
         |         * sqrt(list_dot_product(c.cv, c.cv))), 6) AS sim
         |  FROM $prev a, c$i c),
         |a$i AS (SELECT vec_id, c_cl AS cl, v, sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY sim DESC, c_cl) AS rn FROM s$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""a0 AS (SELECT vec_id, CAST(label AS INTEGER) AS cl,
       |    embedding::DOUBLE[] AS v FROM embeddings),
       |$iters""".stripMargin
  }

  private val kmeansIterOracle: String =
    s"""WITH $kmeansIterCtes
       |SELECT vec_id, cl AS cluster, sim FROM a$KmIters ORDER BY vec_id""".stripMargin

  /** Shared CTE for the embedding-dedup family: the τ=0.45 cosine pair
    * graph (q_dedup_embed's own oracle core). */
  private val embedPairCtes: String =
    """em AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |        round(list_dot_product(a.v, b.v)
      |          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
      |      FROM em a JOIN em b ON a.vec_id < b.vec_id),
      |pr AS (SELECT a_id, b_id FROM s WHERE sim >= 0.45)""".stripMargin

  private lazy val incrementalOracle: String =
    s"""WITH $nearDupCtes,
       |nn AS (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '$IncNewMax' AS is_new
       |       FROM documents),
       |p AS (SELECT j.a_id, j.b_id, j.jaccard, na.is_new AS a_new, nb.is_new AS b_new
       |      FROM j JOIN nn na ON j.a_id = na.doc_id
       |             JOIN nn nb ON j.b_id = nb.doc_id
       |      WHERE j.jaccard >= $Tau),
       |r AS (SELECT b_id AS new_id, a_id AS dup_of, jaccard FROM p WHERE b_new
       |      UNION ALL
       |      SELECT a_id AS new_id, b_id AS dup_of, jaccard FROM p WHERE a_new AND NOT b_new)
       |SELECT new_id, dup_of, jaccard FROM r ORDER BY new_id, dup_of""".stripMargin

  private val tokSql = "string_split_regex(trim(text), '\\s+')"
  /** Shared CTE chain producing the exact all-pairs 3-gram-Jaccard scores
    * (`j`) — the oracle core for q_dedup_near / q_dedup_minhash and the
    * pair source for q_dedup_cluster's recursive component search. */
  private[operators] val nearDupCtes =
    s"""tk AS (SELECT doc_id, lang, $tokSql AS t FROM documents),
       |s AS (SELECT doc_id, lang,
       |        list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
       |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
       |      FROM tk),
       |j AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |          / len(list_distinct(a.sh || b.sh)) AS jaccard
       |      FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |      WHERE len(a.sh) > 0 AND len(b.sh) > 0)""".stripMargin

  /** Shared CTE chain for the md5-simhash oracles: per-doc 64 sign-sums via
    * hex-digit bit extraction (strpos into the hex alphabet is the oracle
    * dialect's `conv`). Bit j of a feature's hash lives at hex digit j/4,
    * position 3−j%4 — the layout SimHashMd5 packs. */
  private val simhashSumCtes: String = {
    val hex = "0123456789abcdef"
    val sums = (0 until 64).map { j =>
      val (pos, shift) = (j / 4 + 1, 3 - j % 4)
      s"sum(2*(((strpos('$hex', substr(h, $pos, 1))-1) >> $shift) & 1)-1) AS s$j"
    }.mkString(", ")
    s"""tk AS (SELECT doc_id, $tokSql AS t FROM documents),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
       |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh FROM tk),
       |b AS (SELECT doc_id, md5(sh) AS h FROM sh),
       |s AS (SELECT doc_id, $sums FROM b GROUP BY doc_id)""".stripMargin
  }

  private val simhashOracle: String = {
    val ham = (0 until 64).map(j =>
      s"(CASE WHEN (a.s$j>0) <> (b.s$j>0) THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $simhashSumCtes,
       |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST($ham AS BIGINT) AS hamming
       |      FROM s a JOIN s b ON a.doc_id < b.doc_id)
       |SELECT a_id, b_id, hamming FROM p WHERE hamming <= 7
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** Fingerprint oracle: same sign-sums, packed MSB-first into two 32-bit
    * halves (bit 63 would overflow signed BIGINT assembly). */
  private val fingerprintOracle: String = {
    val hi = (0 until 32).map(j =>
      s"(CASE WHEN s$j>0 THEN CAST(${1L << (31 - j)} AS BIGINT) ELSE 0 END)").mkString(" + ")
    val lo = (32 until 64).map(j =>
      s"(CASE WHEN s$j>0 THEN CAST(${1L << (63 - j)} AS BIGINT) ELSE 0 END)").mkString(" + ")
    s"""WITH $simhashSumCtes
       |SELECT doc_id, CAST($hi AS BIGINT) AS sim_hi, CAST($lo AS BIGINT) AS sim_lo,
       |md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash
       |FROM s JOIN documents USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** Winnow oracle: replay the kernel in SQL — 8-char grams of the
    * normalized text, per-gram hash = first 15 hex digits of md5 summed
    * MSB-first (60 bits, exactly the kernel's `(first 8 bytes BE) >>> 4`),
    * window MIN over 16-wide gram windows, full windows only (a doc with
    * fewer grams than the window keeps its single all-grams min — the
    * `greatest(n-16, 0)` row), distinct per doc. */
  private val winnowOracle: String = {
    val hex = "0123456789abcdef"
    val h60 = (0 until 15).map { j =>
      s"(strpos('$hex', substr(h, ${j + 1}, 1))-1)*${1L << (4 * (14 - j))}"
    }.mkString(" + ")
    s"""WITH nm AS (SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
       |  FROM documents),
       |d AS (SELECT doc_id, norm, length(norm) - 7 AS n FROM nm WHERE length(norm) >= 8),
       |g AS (SELECT doc_id, n, unnest(range(0, n)) AS pos, norm FROM d),
       |hh AS (SELECT doc_id, n, pos, md5(substr(norm, pos + 1, 8)) AS h FROM g),
       |v AS (SELECT doc_id, n, pos, CAST($h60 AS BIGINT) AS hv FROM hh),
       |wm AS (SELECT doc_id, n, pos,
       |         min(hv) OVER (PARTITION BY doc_id ORDER BY pos
       |                       ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
       |       FROM v)
       |SELECT DISTINCT doc_id, fp FROM wm
       |WHERE pos <= greatest(n - 16, 0) ORDER BY doc_id, fp""".stripMargin
  }

  private val nearDupOracle =
    s"""WITH $nearDupCtes
       |SELECT a_id, b_id, jaccard FROM j WHERE jaccard >= $Tau
       |ORDER BY a_id, b_id""".stripMargin

  def oracles: Map[String, String] = Map(
    // Same all-pairs Jaccard core as q_dedup_minhash, restricted to pairs
    // with a new-side member; the larger id of a batch-batch pair is the
    // "later arrival" (matches the engine's dup_of < new_id orientation).
    // The store-backed key is exact too, so it shares the oracle verbatim.
    "q_dedup_incremental" -> incrementalOracle,
    "q_dedup_incremental_store" -> incrementalOracle,
    // Span keys: the oracle groups by the raw 5-gram string, the engine by
    // its 64-bit md5 prefix — identical multiplicities sans a ~2⁻⁶⁵·n²
    // collision (never at checkable scale), and the key itself is not
    // emitted.
    "q_span_dedup" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS t FROM documents),
         |g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(t) - 3, 1)),
         |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS gs
         |      FROM tk),
         |e AS (SELECT doc_id, unnest(gs) AS gram FROM g),
         |w AS (SELECT gram FROM e GROUP BY gram HAVING count(*) > 1),
         |sc AS (SELECT doc_id, count(*) AS n_shared FROM e JOIN w USING (gram) GROUP BY doc_id)
         |SELECT g.doc_id, CAST(len(g.gs) AS BIGINT) AS n_spans,
         |  CAST(coalesce(sc.n_shared, 0) AS BIGINT) AS n_shared,
         |  CASE WHEN len(g.gs) > 0
         |    THEN round(CAST(coalesce(sc.n_shared, 0) AS DOUBLE) / len(g.gs), 4)
         |    ELSE 0.0 END AS dup_frac
         |FROM g LEFT JOIN sc USING (doc_id) ORDER BY g.doc_id""".stripMargin,
    // chr(769)=U+0301 combining acute, chr(778)=U+030A combining ring —
    // the same decomposed plant as the Spark side; nfc_normalize must
    // compose both identically for the md5 to agree.
    "q_text_normalize" ->
      """WITH p AS (SELECT doc_id,
        |  'Cafe' || chr(769) || '  STRASSE A' || chr(778) || ' ' || text AS raw
        |  FROM documents)
        |SELECT doc_id,
        |md5(regexp_replace(lower(nfc_normalize(raw)), '\s+', ' ', 'g')) AS h,
        |length(nfc_normalize(raw)) AS n
        |FROM p ORDER BY doc_id""".stripMargin,
    // Mirrors the two-pass DECIMAL discipline: in-row decimal fold for the
    // dot, decimal per-dim term sums, decimal sum of squares — every
    // order-sensitive reduction is exact, so the doubles agree before
    // rounding.
    "q_embed_pca_power" ->
      """WITH d AS (SELECT vec_id, embedding,
        |  0.125 * CAST(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DECIMAL(28,12)))) AS DOUBLE) AS dot
        |  FROM embeddings),
        |t AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |        CAST(CAST(unnest(embedding) AS DOUBLE) * dot AS DECIMAL(28,12)) AS term
        |      FROM d),
        |c AS (SELECT dim, CAST(sum(term) AS DOUBLE) AS comp FROM t GROUP BY dim)
        |SELECT dim, round(comp / sqrt(CAST(sum(CAST(comp * comp AS DECIMAL(28,12)))
        |  OVER () AS DOUBLE)), 6) AS pc1
        |FROM c ORDER BY dim""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents
        |GROUP BY sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_stats" ->
      """SELECT source, count(*) AS n_docs,
        |count(DISTINCT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS n_distinct,
        |round(1.0 - CAST(count(DISTINCT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))))
        |  AS DOUBLE) / count(*), 6) AS dup_frac
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // Exact decimal power sums over exactly the top-N log points; only
    // the two ln() calls and the final fit algebra are float, identical
    // single expressions on both engines.
    "q_token_zipf" ->
      s"""WITH t AS (SELECT unnest($tokSql) AS w FROM documents),
         |c AS (SELECT w, count(*) AS n FROM t GROUP BY w
         |      ORDER BY n DESC, w LIMIT $ZipfTopN),
         |r AS (SELECT *, row_number() OVER (ORDER BY n DESC, w) AS rank FROM c),
         |d AS (SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
         |             CAST(round(ln(CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
         |      FROM r),
         |a AS (SELECT CAST(count(*) AS DOUBLE) AS cnt,
         |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |  CAST(sum(x * y) AS DOUBLE) AS sxy, CAST(sum(x * x) AS DOUBLE) AS sxx
         |  FROM d)
         |SELECT CAST(cnt AS BIGINT) AS n_ranked,
         |  round((cnt * sxy - sx * sy) / (cnt * sxx - sx * sx), 4) AS slope,
         |  round((sy - (cnt * sxy - sx * sy) / (cnt * sxx - sx * sx) * sx)
         |        / cnt, 4) AS intercept
         |FROM a""".stripMargin,
    // All-pairs containment on the same exact sets; size orientation
    // (|A| < |B|, ties by id) matches the engine's canonicalization.
    "q_dedup_contain" ->
      s"""WITH $nearDupCtes,
         |c AS (SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(a.sh) AS raw
         |  FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id <> b.doc_id
         |  WHERE len(a.sh) >= $ContainMinShingles
         |    AND (len(a.sh) < len(b.sh)
         |         OR (len(a.sh) = len(b.sh) AND a.doc_id < b.doc_id)))
         |SELECT contained_id, container_id, round(raw, 6) AS containment
         |FROM c WHERE raw >= $TauContain
         |ORDER BY contained_id, container_id""".stripMargin,
    // The clean variant replays the span strip in SQL: positional 5-word
    // span keys (md5/16, 0-based starts), occurrence counts, covered-word
    // ranges for spans over the multiplicity ceiling, residual rebuild —
    // then the q_dedup_contain all-pairs containment on the residual sets.
    "q_dedup_contain_clean" ->
      s"""WITH tk AS (SELECT doc_id, lang, $tokSql AS t FROM documents),
         |sp AS (SELECT doc_id, i - 1 AS pos,
         |    substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
         |               t[i+3] || ' ' || t[i+4]), 1, 16) AS h
         |  FROM tk, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i) u
         |  WHERE len(t) >= 5),
         |hot AS (SELECT h FROM sp GROUP BY h HAVING count(*) > $ContainMaxSpanMult),
         |cov AS (SELECT s.doc_id, s.pos FROM sp s JOIN hot USING (h)),
         |w AS (SELECT doc_id, lang, generate_subscripts(t, 1) AS wi, unnest(t) AS word FROM tk),
         |keep AS (SELECT w.doc_id, w.lang, w.wi, w.word FROM w
         |  WHERE NOT EXISTS (SELECT 1 FROM cov c WHERE c.doc_id = w.doc_id
         |    AND c.pos <= w.wi - 1 AND w.wi - 1 <= c.pos + 4)),
         |ct AS (SELECT doc_id, lang, string_agg(word, ' ' ORDER BY wi) AS clean_text
         |  FROM keep GROUP BY doc_id, lang),
         |t2 AS (SELECT doc_id, lang,
         |    string_split_regex(trim(clean_text), '\\s+') AS t FROM ct),
         |s AS (SELECT doc_id, lang,
         |    list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
         |  FROM t2),
         |c AS (SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(a.sh) AS raw
         |  FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id <> b.doc_id
         |  WHERE len(a.sh) >= $ContainMinShingles
         |    AND (len(a.sh) < len(b.sh)
         |         OR (len(a.sh) = len(b.sh) AND a.doc_id < b.doc_id)))
         |SELECT contained_id, container_id, round(raw, 6) AS containment
         |FROM c WHERE raw >= $TauContain
         |ORDER BY contained_id, container_id""".stripMargin,
    "q_dedup_near" -> nearDupOracle,
    "q_dedup_minhash" -> nearDupOracle,
    "q_dedup_simhash" -> simhashOracle,
    "q_doc_fingerprint" -> fingerprintOracle,
    "q_fingerprint_winnow" -> winnowOracle,
    // Reachability closure over the pair graph (UNION dedups → terminates),
    // then min reachable id per node = the component's canonical label.
    "q_dedup_cluster" ->
      s"""WITH RECURSIVE $nearDupCtes,
         |pr AS (SELECT a_id, b_id FROM j WHERE jaccard >= $Tau),
         |e AS (SELECT a_id AS u, b_id AS v FROM pr
         |      UNION ALL SELECT b_id, a_id FROM pr),
         |reach(node, r) AS (
         |  SELECT DISTINCT u, u FROM e
         |  UNION
         |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.node)
         |SELECT node AS doc_id, min(r) AS cluster_id
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    // Same component closure, then anti-join the non-canonical members:
    // a doc survives iff it is unclustered or its own cluster's label.
    "q_dedup_canonical" ->
      s"""WITH RECURSIVE $nearDupCtes,
         |pr AS (SELECT a_id, b_id FROM j WHERE jaccard >= $Tau),
         |e AS (SELECT a_id AS u, b_id AS v FROM pr
         |      UNION ALL SELECT b_id, a_id FROM pr),
         |reach(node, r) AS (
         |  SELECT DISTINCT u, u FROM e
         |  UNION
         |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.node),
         |cl AS (SELECT node AS doc_id, min(r) AS cluster_id
         |       FROM reach GROUP BY node)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
         |WHERE cl.doc_id IS NULL OR cl.cluster_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // Raw integer sum() in DuckDB returns HUGEINT, which the driver's pandas
    // bridge materializes as float64 while Spark emits int64 — values equal,
    // hashes different. Every integer sum below is therefore CAST to BIGINT.
    "q_text_stats" ->
      s"""SELECT lang, count(*) AS n_docs,
         |CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |CAST(sum(len($tokSql)) AS BIGINT) AS total_tokens,
         |CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
         |CAST(sum(len($tokSql)) AS DOUBLE) / count(*) AS avg_tokens,
         |count(DISTINCT source) AS n_sources
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_quality_score" ->
      s"""WITH q AS (SELECT doc_id, lang,
         |  len($tokSql) AS n_tokens,
         |  len(list_distinct($tokSql)) AS n_uniq,
         |  len(list_filter($tokSql, t -> t IN ('a', 'the'))) AS n_stop,
         |  list_sum(list_transform($tokSql, t -> length(t))) AS tok_chars
         |  FROM documents),
         |r AS (SELECT doc_id, lang, n_tokens,
         |  CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio,
         |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
         |  CAST(tok_chars AS DOUBLE) / n_tokens AS avg_tok_len
         |  FROM q)
         |SELECT doc_id, lang, n_tokens, uniq_ratio, stop_ratio, avg_tok_len,
         |0.4 * uniq_ratio + 0.3 * (1.0 - stop_ratio)
         |  + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) AS score
         |FROM r ORDER BY doc_id""".stripMargin,
    // Same per-row score as q_quality_score; DuckDB quantile_cont ==
    // Spark percentile (linear interpolation at rank (n−1)p — the
    // q_percentiles parity), so the strict-> boundary comparison sees
    // identical doubles on both sides.
    "q_quality_deciles" ->
      s"""WITH q AS (SELECT doc_id,
         |  len($tokSql) AS n_tokens,
         |  len(list_distinct($tokSql)) AS n_uniq,
         |  len(list_filter($tokSql, t -> t IN ('a', 'the'))) AS n_stop
         |  FROM documents),
         |sc AS (SELECT doc_id,
         |  0.4 * (CAST(n_uniq AS DOUBLE) / n_tokens)
         |    + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
         |    + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) AS score
         |  FROM q),
         |b AS (SELECT quantile_cont(score,
         |        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bounds
         |      FROM sc)
         |SELECT sc.doc_id, sc.score,
         |  CAST(1 + len(list_filter(b.bounds, x -> sc.score > x)) AS BIGINT) AS decile
         |FROM sc CROSS JOIN b ORDER BY sc.doc_id""".stripMargin,
    "q_token_entropy" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS t FROM documents),
         |e AS (SELECT doc_id, len(t) AS n_tokens,
         |  round(-list_sum(list_transform(list_distinct(t),
         |    u -> (CAST(len(list_filter(t, x -> x = u)) AS DOUBLE) / len(t))
         |         * ln(CAST(len(list_filter(t, x -> x = u)) AS DOUBLE) / len(t))))
         |    / ln(2), 6) AS token_entropy
         |  FROM tk WHERE len(t) > 0)
         |SELECT doc_id, n_tokens, token_entropy FROM e ORDER BY doc_id""".stripMargin,
    "q_quality_repetition" ->
      s"""WITH tk AS (SELECT doc_id, lang, $tokSql AS t FROM documents),
         |g AS (SELECT doc_id, lang,
         |        greatest(len(t) - 2, 0) AS n_tri,
         |        len(list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
         |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS n_tri_distinct
         |      FROM tk)
         |SELECT doc_id, lang, n_tri, n_tri_distinct,
         |CASE WHEN n_tri = 0 THEN 0.0
         |     ELSE 1.0 - CAST(n_tri_distinct AS DOUBLE) / n_tri END AS dup_frac
         |FROM g ORDER BY doc_id""".stripMargin,
    // Every Gopher threshold compares an exact int or a single int/int IEEE
    // division, so the booleans are bit-stable cross-engine; the displayed
    // ratios are rounded copies, never the compared values.
    "q_quality_gopher" ->
      s"""WITH tk AS (SELECT doc_id, lang, $tokSql AS t FROM documents),
         |m AS (SELECT doc_id, lang, len(t) AS n_words,
         |    len(list_filter(t, w -> w IN ('a', 'the'))) AS n_stop,
         |    CAST(CAST(list_sum(list_transform(t, w -> len(w))) AS BIGINT) AS DOUBLE)
         |      / len(t) AS mean_wl,
         |    CAST(len(list_filter(t, w -> regexp_matches(w, '^[a-z]+$$'))) AS DOUBLE)
         |      / len(t) AS alpha_frac
         |  FROM tk)
         |SELECT doc_id, lang, n_words,
         |round(mean_wl, 6) AS mean_word_len,
         |round(alpha_frac, 6) AS alpha_frac, n_stop,
         |n_words BETWEEN $GopherMinWords AND $GopherMaxWords AS pass_words,
         |mean_wl BETWEEN $GopherMinWordLen AND $GopherMaxWordLen AS pass_word_len,
         |alpha_frac >= $GopherMinAlphaFrac AS pass_alpha,
         |n_stop >= $GopherMinStop AS pass_stop,
         |(n_words BETWEEN $GopherMinWords AND $GopherMaxWords)
         |  AND (mean_wl BETWEEN $GopherMinWordLen AND $GopherMaxWordLen)
         |  AND alpha_frac >= $GopherMinAlphaFrac
         |  AND n_stop >= $GopherMinStop AS pass
         |FROM m ORDER BY doc_id""".stripMargin,
    // generate_subscripts is 1-based; -1 matches posexplode's 0-based pos.
    "q_embed_centroids" ->
      """WITH e AS (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)
        |SELECT label, pos, count(*) AS n_vecs, round(avg(v), 6) AS centroid_val
        |FROM e GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "q_embed_kmeans" ->
      """WITH u AS (SELECT label AS c_label, generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |c AS (SELECT c_label, list(round(avg_x, 6) ORDER BY pos) AS cv FROM (
        |    SELECT c_label, pos, avg(x) AS avg_x FROM u GROUP BY c_label, pos)
        |  GROUP BY c_label),
        |sc AS (SELECT vec_id, label, c_label,
        |    round(list_dot_product(embedding::DOUBLE[], cv)
        |      / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |         * sqrt(list_dot_product(cv, cv))), 6) AS sim
        |  FROM embeddings, c),
        |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY sim DESC, c_label) AS rn FROM sc)
        |SELECT vec_id, label, c_label AS pred_label, sim FROM r
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // Seed + redact replayed with the same Java/RE2-portable patterns
    // and the same replacement order.
    "q_text_redact" ->
      s"""WITH seeded AS (SELECT doc_id,
         |  text || ' contact user' || doc_id || '@example.com'
         |    || ' from 10.' || (doc_id % 256) || '.'
         |    || (CAST(doc_id / 256 AS BIGINT) % 256) || '.7'
         |    || ' tel +1' || lpad(CAST(doc_id % 10000000 AS VARCHAR), 7, '0')
         |    AS text
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$PiiEmailRe', '<EMAIL>', 'g'),
         |    '$PiiIpRe', '<IP>', 'g'),
         |    '$PiiPhoneRe', '<PHONE>', 'g') AS redacted
         |FROM seeded ORDER BY doc_id""".stripMargin,
    // BM25 with the rational idf — the score expression mirrors the Spark
    // shape token for token (pre-folded 2.2/0.25 literals, fixed
    // three-operand sum), so the double hashes cross-engine.
    "q_text_bm25" -> {
      val cases = Bm25Terms.zipWithIndex.map { case (_, i0) =>
        val i = i0 + 1
        s"""(CASE WHEN tf$i > 0 THEN
           |  ((CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5)
           |    / (CAST(df$i AS DOUBLE) + 0.5))
           |  * ((CAST(tf$i AS DOUBLE) * 2.2)
           |    / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75
           |      * (CAST(dl AS DOUBLE)
           |        / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
           |ELSE 0.0 END)""".stripMargin
      }.mkString("\n + ")
      val tfs = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"sum(CASE WHEN tok = '$t' THEN 1 ELSE 0 END) AS tf${i + 1}"
      }.mkString(",\n  ")
      val dfs = Bm25Terms.indices.map(i =>
        s"sum(CASE WHEN tf${i + 1} > 0 THEN 1 ELSE 0 END) AS df${i + 1}")
        .mkString(",\n  ")
      s"""WITH tk AS (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
         |pd AS (SELECT doc_id, count(*) AS dl,
         |  $tfs
         |  FROM tk GROUP BY 1),
         |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
         |  $dfs
         |  FROM pd),
         |sc AS (SELECT doc_id, dl,
         |  CAST(tf1 > 0 AS BIGINT) + CAST(tf2 > 0 AS BIGINT)
         |    + CAST(tf3 > 0 AS BIGINT) AS matched,
         |  $cases AS score
         |  FROM pd, st)
         |SELECT doc_id, CAST(dl AS BIGINT) AS dl, matched, score
         |FROM sc WHERE score > 0.0
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
    },
    // Score mirrors the Spark expression shape exactly: (tf·N) exact, ONE
    // division — see tfidfTerms on why ln() cannot be hashed.
    "q_tfidf_terms" ->
      s"""WITH tk AS (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
         |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |sc AS (SELECT doc_id, tok, tf, df,
         |         CAST(tf AS DOUBLE) * n / df AS score
         |       FROM tf JOIN df USING (tok), n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, tok) AS rank FROM sc)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok,
         |CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
         |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_token_topk" ->
      s"""SELECT tok, count(*) AS n
         |FROM (SELECT unnest($tokSql) AS tok FROM documents)
         |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin,
    "q_vocab_coverage" ->
      s"""WITH tk AS (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
         |v AS (SELECT tok FROM (SELECT tok, count(*) AS n FROM tk
         |        GROUP BY tok ORDER BY n DESC, tok LIMIT $VocabK)),
         |j AS (SELECT tk.doc_id, tk.tok, v.tok AS vt
         |      FROM tk LEFT JOIN v ON tk.tok = v.tok)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS oov_rate
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Same cosine formulation as q_sim_topk (proven hash-parity); the
    // threshold compares the ROUNDED sim on both sides, mirroring the Spark
    // plan (round → filter). Valid because dedupEmbed dispatches to the
    // exact all-pairs plan at fixture scale — recall is 1, not probabilistic.
    // Embedding decontamination: cross-set cosine at the dedup parity
    // rules; best hit = (sim DESC, bench_id ASC) — the struct-max order.
    "q_decontaminate_embed" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |b AS (SELECT vec_id AS bench_id, v AS bv FROM e WHERE vec_id % 41 = 7),
        |c AS (SELECT vec_id, v FROM e WHERE vec_id % 41 <> 7),
        |s AS (SELECT c.vec_id, b.bench_id,
        |    round(list_dot_product(c.v, b.bv)
        |      / (sqrt(list_dot_product(c.v, c.v))
        |         * sqrt(list_dot_product(b.bv, b.bv))), 6) AS sim
        |  FROM c CROSS JOIN b),
        |f AS (SELECT * FROM s WHERE sim >= 0.35),
        |r AS (SELECT vec_id, bench_id, sim,
        |    count(*) OVER (PARTITION BY vec_id) AS n_hits,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, bench_id) AS rk
        |  FROM f)
        |SELECT vec_id, bench_id, sim, n_hits FROM r WHERE rk = 1
        |ORDER BY vec_id""".stripMargin,
    "q_dedup_embed" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |        round(list_dot_product(a.v, b.v)
        |          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT a_id, b_id, sim FROM s WHERE sim >= 0.45
        |ORDER BY a_id, b_id""".stripMargin,
    // The text-cluster reachability closure, over the cosine pair graph.
    "q_dedup_embed_cluster" ->
      s"""WITH RECURSIVE $embedPairCtes,
         |e AS (SELECT a_id AS u, b_id AS v FROM pr
         |      UNION ALL SELECT b_id, a_id FROM pr),
         |reach(node, r) AS (
         |  SELECT DISTINCT u, u FROM e
         |  UNION
         |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.node)
         |SELECT node AS vec_id, min(r) AS cluster_id
         |FROM reach GROUP BY node ORDER BY vec_id""".stripMargin,
    "q_dedup_embed_canonical" ->
      s"""WITH RECURSIVE $embedPairCtes,
         |e AS (SELECT a_id AS u, b_id AS v FROM pr
         |      UNION ALL SELECT b_id, a_id FROM pr),
         |reach(node, r) AS (
         |  SELECT DISTINCT u, u FROM e
         |  UNION
         |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.node),
         |cl AS (SELECT node AS vec_id, min(r) AS cluster_id
         |       FROM reach GROUP BY node)
         |SELECT m.vec_id, m.label FROM embeddings m
         |LEFT JOIN cl ON m.vec_id = cl.vec_id
         |WHERE cl.vec_id IS NULL OR cl.vec_id = cl.cluster_id
         |ORDER BY m.vec_id""".stripMargin,
    // The q_embed_centroids aggregate rebuilt inline (6dp components),
    // then one rounded cosine per vector against its own label's centroid.
    "q_embed_outliers" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
         |  FROM embeddings),
         |c AS (SELECT label, list(round(m, 6) ORDER BY pos) AS cv FROM (
         |    SELECT label, pos, avg(x) AS m FROM (
         |      SELECT label, generate_subscripts(v, 1) AS pos,
         |        CAST(unnest(v) AS DOUBLE) AS x FROM e)
         |    GROUP BY label, pos)
         |  GROUP BY label),
         |s AS (SELECT e.vec_id, e.label,
         |    round(list_dot_product(e.v, c.cv)
         |      / (sqrt(list_dot_product(e.v, e.v))
         |         * sqrt(list_dot_product(c.cv, c.cv))), 6) AS sim_centroid
         |  FROM e JOIN c ON e.label = c.label)
         |SELECT vec_id, label, sim_centroid,
         |  sim_centroid < $OutlierTau AS is_outlier
         |FROM s ORDER BY vec_id""".stripMargin,
    // SemDeDup replayed relationally: the unrolled-Lloyd chain pins the
    // cluster assignment, pairs form only within a cluster at the same
    // rounded cosine kernel, reachability labels the duplicate groups by
    // min id, and the keep-list drops every non-label member.
    "q_dedup_semantic" ->
      s"""WITH RECURSIVE $kmeansIterCtes,
         |pr AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id
         |  FROM a$KmIters x JOIN a$KmIters y
         |    ON x.cl = y.cl AND x.vec_id < y.vec_id
         |  WHERE round(list_dot_product(x.v, y.v)
         |    / (sqrt(list_dot_product(x.v, x.v))
         |       * sqrt(list_dot_product(y.v, y.v))), 6) >= $SemTau),
         |e AS (SELECT a_id AS u, b_id AS v2 FROM pr
         |      UNION ALL SELECT b_id, a_id FROM pr),
         |reach(node, r) AS (
         |  SELECT DISTINCT u, u FROM e
         |  UNION
         |  SELECT e.u, reach.r FROM e JOIN reach ON e.v2 = reach.node),
         |cc AS (SELECT node AS vec_id, min(r) AS cluster_id
         |       FROM reach GROUP BY node)
         |SELECT a.vec_id, a.cl AS cluster, m.label FROM a$KmIters a
         |JOIN embeddings m ON m.vec_id = a.vec_id
         |LEFT JOIN cc ON a.vec_id = cc.vec_id
         |WHERE cc.vec_id IS NULL OR cc.vec_id = cc.cluster_id
         |ORDER BY a.vec_id""".stripMargin,
    // Same dot/(norm·norm) formulation as q_sim_topk; ranking happens on
    // the ROUNDED sim on both sides so float-tie order can't diverge.
    "q_knn_join" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, v AS p FROM e WHERE vec_id < 16),
        |s AS (SELECT probe_id, vec_id,
        |        round(list_dot_product(v, p)
        |          / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(p, p))), 6) AS sim
        |      FROM e, p WHERE vec_id <> probe_id),
        |r AS (SELECT probe_id, vec_id, sim,
        |        row_number() OVER (PARTITION BY probe_id
        |                           ORDER BY sim DESC, vec_id) AS rank
        |      FROM s)
        |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id, sim
        |FROM r WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,
    "q_sim_topk_filtered" ->
      """WITH p AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |      WHERE vec_id <> 0 AND label % 3 = 1)
        |SELECT vec_id, round(list_dot_product(v, p)
        |  / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(p, p))), 6) AS sim
        |FROM e, p ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_sim_topk" ->
      """WITH p AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0)
        |SELECT vec_id, round(list_dot_product(v, p)
        |  / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(p, p))), 6) AS sim
        |FROM e, p ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_lang_id" -> {
      val profileRows = LangProfiles.map { case (l, ws) =>
        s"('$l', [${ws.map(w => s"'$w'").mkString(", ")}])"
      }.mkString(",\n|    ")
      s"""WITH tk AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
         |  FROM documents),
         |sc AS (SELECT doc_id, p.lang,
         |    len(list_filter(t, x -> list_contains(p.words, x))) AS hits
         |  FROM tk, (VALUES $profileRows) p(lang, words)),
         |r AS (SELECT doc_id, lang, hits,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang DESC) AS rn
         |  FROM sc)
         |SELECT doc_id, CASE WHEN hits = 0 THEN 'und' ELSE lang END AS lang_pred, hits
         |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin
    },
    "q_token_bpe" ->
      s"""SELECT lang, count(*) AS n_docs,
         |CAST(sum(len($tokSql)) AS BIGINT) AS total_ws_tokens,
         |CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS total_bpe_tokens
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(text::BLOB) AS n_bytes, sha256(text) AS sha,
        |substring(to_base64(text::BLOB), 1, 16) AS b64_head
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Char-level slicing == byte-level slicing: the documents fixture is
    // pure ASCII at every SF (octet_length(encode(text)) == length(text)).
    "q_multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id AS asset_id, length(text) AS n_bytes,
        |    list_transform(
        |      list_filter(range(0, length(text) // 256), i -> i % 4 = 0),
        |      i -> substring(text, (i * 256 + 1), 256)) AS frames
        |  FROM documents)
        |SELECT asset_id, CAST(n_bytes AS INT) AS n_bytes,
        |CAST(len(frames) AS INT) AS n_frames,
        |md5(coalesce(array_to_string(frames, ''), '')) AS frames_md5
        |FROM f ORDER BY asset_id""".stripMargin,
    // The stub thumbnail cycles payload bytes to 64*64*3: char-level
    // repeat+substring reproduces it exactly over the ASCII corpus.
    "q_multimodal_resize" ->
      """SELECT doc_id AS asset_id, 64 AS width, 64 AS height,
        |CAST(12288 AS BIGINT) AS n_bytes,
        |md5(substring(repeat(text, (12288 + length(text) - 1) // length(text)),
        |              1, 12288)) AS payload_md5,
        |'stub' AS decoder
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lm_score" ->
      s"""WITH tk AS (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
         |dt AS (SELECT doc_id, tok, count(*) AS m FROM tk GROUP BY doc_id, tok),
         |freq AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
         |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq)
         |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_tokens,
         |round(ln(max(t)) - sum(m * ln(c)) / sum(m), 6) AS nll
         |FROM dt JOIN freq USING (tok), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT vec_id AS probe_id, label AS p_label, v AS p
         |      FROM e WHERE vec_id < $KnnProbes),
         |s AS (SELECT probe_id, vec_id, label AS neg_label,
         |        round(list_dot_product(v, p)
         |          / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(p, p))), 6) AS sim
         |      FROM e, p WHERE vec_id <> probe_id AND label <> p_label),
         |r AS (SELECT probe_id, vec_id, neg_label, sim,
         |        row_number() OVER (PARTITION BY probe_id
         |                           ORDER BY sim DESC, vec_id) AS rank
         |      FROM s)
         |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id, neg_label, sim
         |FROM r WHERE rank <= $HardNegK ORDER BY probe_id, rank""".stripMargin,
    "q_knn_mutual" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (SELECT a.vec_id AS probe_id, b.vec_id AS vec_id,
         |        round(list_dot_product(a.v, b.v)
         |          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
         |      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
         |r AS (SELECT probe_id, vec_id, sim,
         |        row_number() OVER (PARTITION BY probe_id
         |                           ORDER BY sim DESC, vec_id) AS rank
         |      FROM s),
         |k AS (SELECT probe_id, vec_id, sim FROM r WHERE rank <= $HardNegK)
         |SELECT a.probe_id AS a_id, a.vec_id AS b_id, a.sim
         |FROM k a JOIN k b ON a.probe_id = b.vec_id AND a.vec_id = b.probe_id
         |WHERE a.probe_id < a.vec_id ORDER BY a_id, b_id""".stripMargin,
    // Same mutual-edge CTE as q_knn_mutual, extended with the oriented
    // two-join triangle enumeration and the per-node coefficient.
    "q_graph_triangles" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (SELECT a.vec_id AS probe_id, b.vec_id AS vec_id,
         |        round(list_dot_product(a.v, b.v)
         |          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
         |      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
         |r AS (SELECT probe_id, vec_id, sim,
         |        row_number() OVER (PARTITION BY probe_id
         |                           ORDER BY sim DESC, vec_id) AS rank
         |      FROM s),
         |k AS (SELECT probe_id, vec_id FROM r WHERE rank <= $HardNegK),
         |m AS (SELECT a.probe_id AS a_id, a.vec_id AS b_id
         |      FROM k a JOIN k b ON a.probe_id = b.vec_id AND a.vec_id = b.probe_id
         |      WHERE a.probe_id < a.vec_id),
         |t AS (SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
         |      FROM m e1 JOIN m e2 ON e1.b_id = e2.a_id
         |      JOIN m e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id),
         |tn AS (SELECT node, count(*) AS n_triangles FROM (
         |        SELECT a AS node FROM t UNION ALL
         |        SELECT b AS node FROM t UNION ALL
         |        SELECT c AS node FROM t) GROUP BY node),
         |d AS (SELECT node, count(*) AS degree FROM (
         |        SELECT a_id AS node FROM m UNION ALL
         |        SELECT b_id AS node FROM m) GROUP BY node)
         |SELECT v.vec_id,
         |  CAST(coalesce(d.degree, 0) AS BIGINT) AS degree,
         |  CAST(coalesce(tn.n_triangles, 0) AS BIGINT) AS n_triangles,
         |  CASE WHEN coalesce(d.degree, 0) >= 2
         |       THEN round(coalesce(tn.n_triangles, 0) * 2.0
         |                  / (d.degree * (d.degree - 1)), 6)
         |       ELSE 0.0 END AS clustering
         |FROM embeddings v
         |LEFT JOIN d ON v.vec_id = d.node
         |LEFT JOIN tn ON v.vec_id = tn.node
         |ORDER BY v.vec_id""".stripMargin,
    // T unrolled Lloyd rounds; every centroid component and similarity is
    // 6dp-rounded BEFORE use on both sides (the iteration-level
    // synchronization barrier that keeps a 3-deep float loop hashable).
    "q_embed_kmeans_iter" -> kmeansIterOracle,
    // min/max norms match bit-exactly (same per-row fold order); only the
    // mean bridges summation order with 6dp rounding.
    "q_embed_norms" ->
      """WITH e AS (SELECT label,
        |  len(embedding) AS dim,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs,
        |  min(dim) AS dim_min, max(dim) AS dim_max,
        |  round(avg(nrm), 6) AS mean_norm,
        |  min(nrm) AS min_norm, max(nrm) AS max_norm,
        |  CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        |FROM e GROUP BY label ORDER BY label""".stripMargin,
    // Same mutual-kNN CTE chain as q_knn_mutual, extended with the
    // degree/neighbor-mass aggregates and the N-scaled one-step PageRank.
    "q_graph_pagerank" ->
      s"""WITH $mutualGraphCtes,
         |c AS (SELECT ed.dst, sum(CAST(1.0 AS DOUBLE) / dg.deg) AS mass
         |      FROM ed JOIN dg USING (src) GROUP BY ed.dst),
         |t AS (SELECT count(*) AS n,
         |        sum(CASE WHEN dg.src IS NULL THEN 1 ELSE 0 END) AS nd
         |      FROM embeddings v LEFT JOIN dg ON v.vec_id = dg.src)
         |SELECT v.vec_id, CAST(coalesce(dg.deg, 0) AS BIGINT) AS degree,
         |  round($PrBase + $PrDamping * (coalesce(c.mass, CAST(0.0 AS DOUBLE)) +
         |    CAST(t.nd AS DOUBLE) / t.n), 6) AS npr
         |FROM embeddings v
         |LEFT JOIN dg ON v.vec_id = dg.src
         |LEFT JOIN c ON v.vec_id = c.dst
         |CROSS JOIN t
         |ORDER BY v.vec_id""".stripMargin,
    "q_graph_pagerank_iter" -> pagerankIterOracle)

  /** Shared oracle CTE chain: the mutual-kNN directed edge list `ed` and
    * its out-degree table `dg` (the q_knn_mutual construction — exact
    * rounded-cosine top-k, mutuality by symmetric membership). */
  private val mutualGraphCtes: String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (SELECT a.vec_id AS probe_id, b.vec_id AS vec_id,
       |        round(list_dot_product(a.v, b.v)
       |          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
       |      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
       |r AS (SELECT probe_id, vec_id, sim,
       |        row_number() OVER (PARTITION BY probe_id
       |                           ORDER BY sim DESC, vec_id) AS rank
       |      FROM s),
       |k AS (SELECT probe_id, vec_id, sim FROM r WHERE rank <= $HardNegK),
       |m AS (SELECT a.probe_id AS a_id, a.vec_id AS b_id
       |      FROM k a JOIN k b ON a.probe_id = b.vec_id AND a.vec_id = b.probe_id
       |      WHERE a.probe_id < a.vec_id),
       |ed AS (SELECT a_id AS src, b_id AS dst FROM m
       |       UNION ALL SELECT b_id AS src, a_id AS dst FROM m),
       |dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src)""".stripMargin

  /** The q_graph_pagerank_iter oracle: [[PrIters]] unrolled damped power
    * rounds from the uniform N-scaled start, each round re-entering from
    * the 6dp-rounded ranks (the kmeansIterOracle discipline — the rounding
    * is the cross-engine sync barrier that lets an iterative algorithm
    * carry a hash oracle). */
  private val pagerankIterOracle: String = {
    val iters = (1 to PrIters).map { i =>
      val prev = s"t${i - 1}"
      s"""g$i AS (SELECT count(*) AS n,
         |    sum(CASE WHEN degree = 0 THEN pr ELSE CAST(0.0 AS DOUBLE) END) AS dmass
         |  FROM $prev),
         |c$i AS (SELECT ed.dst, sum(p.pr / p.degree) AS mass
         |  FROM ed JOIN $prev p ON ed.src = p.vec_id GROUP BY ed.dst),
         |t$i AS (SELECT p.vec_id, p.degree,
         |    round($PrBase + $PrDamping * (coalesce(c.mass, CAST(0.0 AS DOUBLE))
         |      + g.dmass / CAST(g.n AS DOUBLE)), 6) AS pr
         |  FROM $prev p LEFT JOIN c$i c ON p.vec_id = c.dst CROSS JOIN g$i g)""".stripMargin
    }.mkString(",\n")
    s"""WITH $mutualGraphCtes,
       |t0 AS (SELECT v.vec_id, CAST(coalesce(dg.deg, 0) AS BIGINT) AS degree,
       |    CAST(1.0 AS DOUBLE) AS pr
       |  FROM embeddings v LEFT JOIN dg ON v.vec_id = dg.src),
       |$iters
       |SELECT vec_id, degree, pr AS npr FROM t$PrIters ORDER BY vec_id""".stripMargin
  }
}
