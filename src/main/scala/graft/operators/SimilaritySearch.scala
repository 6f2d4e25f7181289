package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2 B9).
  *
  * `bruteForceTopK` is the oracle-able baseline: the probe row is broadcast,
  * so the plan is ONE pass over the corpus (k-rows × N scan), a per-row
  * codegen'd cosine, and a TakeOrderedAndProject top-k — never a corpus
  * self-join. At 100 TB this is the correct exact-search shape: broadcast
  * the k probes, scan once, per-partition heaps, k-row driver merge.
  *
  * `lshTopK` is the approximate scale path: multi-table random-hyperplane
  * LSH (Charikar '02). Each vector gets `tables` bucket keys (one per table
  * of `planesPerTable` sign bits); a probe only scans vectors sharing at
  * least one bucket key, then exact-cosine reranks the candidates. Planes
  * are generated from a fixed seed at plan time and embedded as literals, so
  * results are deterministic; recall/candidate-fraction trade-off is
  * governed by (tables, planesPerTable) and is verified on clustered data in
  * AnnSpec (on isotropic random data no sublinear ANN can do well — the
  * fixture's embeddings are random, so the spec plants clusters instead).
  */
object SimilaritySearch {

  /** Exact top-k cosine neighbors of `probeId`, excluding itself.
    * Output: vec_id, sim (rounded to 6dp for cross-engine hashing). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     probeId: Long, k: Int): DataFrame = {
    val v = emb.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    val probe = v.where(col("vec_id") === probeId).select(col("v").as("p"))
    v.where(col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(VectorFns.cosine(col("v"), col("p")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** HYBRID search: exact top-k cosine neighbors of `probeId` among only
    * the corpus rows satisfying `filter` — the metadata-filtered
    * retrieval shape ("nearest English documents", "same tenant only")
    * that partition-blind ANN indexes struggle with and a brute-force
    * pass gets for free: the predicate evaluates BEFORE scoring and
    * pushes to the scan, so a selective filter cuts the FLOP cost
    * proportionally instead of over-fetching and post-filtering. The
    * probe is looked up UNfiltered — its own metadata need not qualify. */
  def bruteForceTopKFiltered(emb: DataFrame, idCol: String, vecCol: String,
                             probeId: Long, k: Int,
                             filter: org.apache.spark.sql.Column): DataFrame = {
    val v = emb.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"),
      coalesce(filter, lit(false)).as("__keep"))
    val probe = v.where(col("vec_id") === probeId).select(col("v").as("p"))
    v.where(col("vec_id") =!= probeId && col("__keep"))
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(VectorFns.cosine(col("v"), col("p")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Batch exact kNN join: for EVERY probe row, its k nearest corpus
    * neighbors by cosine (self-matches excluded) — the retrieval /
    * hard-negative-mining shape, i.e. `bruteForceTopK` for a probe SET in
    * one corpus pass instead of a pass per probe.
    *
    * Plan shape, back to front:
    *   - probes are broadcast: the corpus never shuffles for the join;
    *   - norms are hoisted per ROW (corpus and probe side each), not
    *     recomputed per pair — same trick as `bruteForcePairs`, and
    *     IEEE-identical to the per-pair cosine so oracle parity holds;
    *   - per-group top-k runs as `TopKByScore`, a TypedImperativeAggregate
    *     with k-BOUNDED heap state: each partition reduces to ≤ k entries
    *     per probe map-side and the shuffle moves probes × partitions × k
    *     (sim, id) pairs. The window formulation (row_number ≤ k) would
    *     shuffle all probes × N scored candidates — the difference between
    *     a merge of heaps and a sort of the corpus at 100 TB.
    *
    * Ties at the (6dp-rounded) similarity break by ascending vec_id — a
    * total order, shared with the oracle's ORDER BY. */
  def knnJoin(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, k: Int): DataFrame =
    knnEdges(corpus, probes, idCol, vecCol, k, sorted = true)

  /** `knnJoin` without the final presentation sort — the edge-list form
    * consumers like [[mutualKnn]] feed into further shuffling joins. */
  private[operators] def knnEdges(corpus: DataFrame, probes: DataFrame,
                                  idCol: String, vecCol: String, k: Int,
                                  sorted: Boolean = false): DataFrame = {
    // the N×P scoring stage is FLOP-bound, not byte-bound — spread a
    // compact corpus scan over the cores before it (no-op at real scale)
    val v = Compute.rebalance(corpus.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v")))
      .withColumn("nv", VectorFns.l2norm(col("v")))
    val p = probes.select(col(idCol).as("probe_id"),
        col(vecCol).cast("array<double>").as("p"))
      .withColumn("np", VectorFns.l2norm(col("p")))
    val scored = v.crossJoin(broadcast(p))
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(VectorFns.dot(col("v"), col("p")) / (col("nv") * col("np")), 6).as("sim"))
    perProbeTopK(scored, k, sorted)
  }

  /** Shared kNN tail: per-probe top-k via the k-bounded heap aggregate,
    * exploded to (probe_id, rank, vec_id, sim) rows. `sorted = false` skips
    * the presentation orderBy — a rangepartitioning sort whose sampling
    * pass re-executes the child — for callers that immediately reshuffle
    * the edges anyway (mutual-kNN, PageRank): a mid-pipeline global sort
    * is pure waste at any scale. */
  private[operators] def perProbeTopK(scored: DataFrame, k: Int,
                                      sorted: Boolean = true): DataFrame = {
    val edges = scored
      .groupBy(col("probe_id"))
      .agg(org.apache.spark.sql.graft.TopKAggExprs
        .topKByScore(col("sim"), col("vec_id"), k).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(col("probe_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.vec_id").as("vec_id"), col("col.sim").as("sim"))
    if (sorted) edges.orderBy(col("probe_id"), col("rank")) else edges
  }

  /** Hard-negative mining: `knnJoin` with a label-exclusion predicate —
    * for every probe, its k nearest corpus neighbors whose label DIFFERS
    * from the probe's (the contrastive-training shape: semantically close,
    * known-wrong). Same plan as `knnJoin` (probes broadcast with their
    * labels, corpus scanned once, k-bounded heap aggregate); the label
    * filter rides inside the broadcast-join condition, so excluded
    * candidates never reach the scorer. Output adds the negative's label.
    * At corpus scale swap the candidate source for `IvfIndex.knnJoin`
    * survivors and keep this exclusion + tail. */
  def hardNegatives(corpus: DataFrame, probes: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val v = corpus.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"),
        col(labelCol).as("neg_label"))
      .withColumn("nv", VectorFns.l2norm(col("v")))
    val p = probes.select(col(idCol).as("probe_id"),
        col(vecCol).cast("array<double>").as("p"),
        col(labelCol).as("p_label"))
      .withColumn("np", VectorFns.l2norm(col("p")))
    val scored = v.join(broadcast(p),
        col("vec_id") =!= col("probe_id") &&
          col("neg_label") =!= col("p_label"))
      .select(col("probe_id"), col("vec_id"),
        round(VectorFns.dot(col("v"), col("p")) / (col("nv") * col("np")), 6).as("sim"))
    val top = perProbeTopK(scored, k)
    // Label backfill: the k·|probes| result is broadcast and the corpus
    // (vec_id, label) projection streams past it — a second scan, never a
    // corpus shuffle (the heap's id slot is a Long, so the label can't
    // ride through the aggregate itself).
    broadcast(top)
      .join(corpus.select(col(idCol).as("vec_id"),
        col(labelCol).as("neg_label")), Seq("vec_id"))
      .select(col("probe_id"), col("rank"), col("vec_id"),
        col("neg_label"), col("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Mutual-kNN graph: keep edge (a, b) only when b is in a's top-k AND a
    * is in b's top-k — the symmetric neighborhood graph that seeds
    * graph-based dedup / semantic clustering. Takes the directed kNN edge
    * list (probe_id, vec_id, sim — any backend: exact `knnJoin`, LSH, or
    * `IvfIndex.knnJoin` at corpus scale) and self-joins it on the reversed
    * pair key: one shuffle on (probe_id, vec_id) sized k·N rows — the edge
    * list, never the vectors. Emits each surviving pair once (a_id < b_id)
    * with its (symmetric, 6dp-rounded) similarity.
    *
    * CONTRACT NOTE — this function is EAGER: the input edge list is
    * materialized (`Compute.materialize`) at DataFrame-construction time,
    * not at first action, because the self-join's two sides shuffle on
    * opposite key orders and would otherwise each re-run the full scoring
    * pass that produced the edges. Consequences for callers: (1) the call
    * itself runs Spark jobs — don't build it speculatively inside a lazy
    * composition; (2) WITHOUT a session checkpoint dir the fallback is
    * `localCheckpoint`, whose blocks die with their executor, making the
    * returned frame non-recomputable after an executor loss in a
    * long-lived session — set `sparkContext.setCheckpointDir` on a real
    * cluster to get reliable checkpointing. */
  def mutualKnn(knnEdges: DataFrame): DataFrame = {
    // Materialize the edge list ONCE before the self-join: the fwd and rev
    // sides shuffle on OPPOSITE key orders, so ReuseExchange cannot unify
    // them and each side would otherwise re-run the full N×N scoring pass
    // that produced the edges (measured 2× the whole query's cost). k·N
    // rows of three scalars is metadata-scale next to the pass it caps —
    // the same persist-the-derived-edge-list discipline as
    // NearDedup.materializedPairs (reliable checkpoint when the session
    // has a checkpoint dir, executor-local otherwise).
    val edges = Compute.materialize(knnEdges)
    val fwd = edges.select(col("probe_id").as("a_id"),
      col("vec_id").as("b_id"), col("sim"))
    val rev = edges.select(col("vec_id").as("a_id"),
      col("probe_id").as("b_id"))
    fwd.join(rev, Seq("a_id", "b_id"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Approximate batch kNN join — `knnJoin`'s LSH scale path: corpus rows
    * are scored against a probe ONLY when they share a hyperplane-LSH
    * bucket with it (radius-0 here; the probes are broadcast WITH their
    * bucket keys, so the filter is a per-row `arrays_overlap` inside the
    * scan — no shuffle added). Cuts the dominant cost (N × P cosines) to
    * the colliding fraction, at LSH's probabilistic recall — parameters
    * follow the same (tables, planesPerTable) trade as `lshTopK`, measured
    * in AnnSpec. At 100 TB the same keys become the partition/bucket layout
    * of a materialized index (the IvfIndex story), making the pruning
    * I/O-level instead of compute-level. */
  def knnJoinLsh(corpus: DataFrame, probes: DataFrame, idCol: String,
                 vecCol: String, k: Int, dim: Int,
                 tables: Int = 8, planesPerTable: Int = 8,
                 seed: Long = 42L): DataFrame = {
    def keysOf(vec: org.apache.spark.sql.Column) =
      hyperplaneKeys(vec, dim, tables, planesPerTable, seed)
    val v = corpus.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nv", VectorFns.l2norm(col("v")))
      .withColumn("keys", keysOf(col("v")))
    val p = probes.select(col(idCol).as("probe_id"),
        col(vecCol).cast("array<double>").as("p"))
      .withColumn("np", VectorFns.l2norm(col("p")))
      .withColumn("p_keys", keysOf(col("p")))
    val scored = v.crossJoin(broadcast(p))
      .where(col("vec_id") =!= col("probe_id") &&
        arrays_overlap(col("keys"), col("p_keys")))
      .select(col("probe_id"), col("vec_id"),
        round(VectorFns.dot(col("v"), col("p")) / (col("nv") * col("np")), 6).as("sim"))
    perProbeTopK(scored, k)
  }

  /** bits[j] = sign of ⟨v, plane_j⟩; keys[l] = (l << b) | table l's bits —
    * the table-index tag means keys from different tables can never collide
    * through arrays_overlap / equi-joins. Planes are seeded at plan time and
    * baked into a native codegen Expression (one fused loop nest per row —
    * the pre-r3 HOF formulation ran every projection as an interpreted
    * lambda), so results are deterministic. `expandBits` additionally emits
    * each table key's radius-1 Hamming neighbors (multiprobe — see
    * HyperplaneKeys). */
  private def hyperplaneKeys(vec: org.apache.spark.sql.Column, dim: Int,
                             tables: Int, planesPerTable: Int, seed: Long,
                             expandBits: Boolean = false) = {
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] =
      Seq.fill(tables * planesPerTable)(Seq.fill(dim)(rnd.nextGaussian()))
    org.apache.spark.sql.graft.VectorExprs.hyperplaneKeys(
      vec, planes, planesPerTable, expandBits)
  }

  /** Approximate top-k via multi-table hyperplane LSH + exact rerank. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              probeId: Long, k: Int, dim: Int,
              tables: Int = 8, planesPerTable: Int = 8,
              seed: Long = 42L): DataFrame = {
    def keysOf(vec: org.apache.spark.sql.Column) =
      hyperplaneKeys(vec, dim, tables, planesPerTable, seed)

    val v = emb.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    val probe = v.where(col("vec_id") === probeId)
      .select(col("v").as("p"), keysOf(col("v")).as("p_keys"))
    v.where(col("vec_id") =!= probeId)
      .withColumn("keys", keysOf(col("v")))
      .crossJoin(broadcast(probe))
      .where(arrays_overlap(col("keys"), col("p_keys"))) // bucket pruning
      .select(col("vec_id"),
        round(VectorFns.cosine(col("v"), col("p")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF coarse-quantizer training: Lloyd's k-means on a BOUNDED,
    * deterministically-chosen sample (first `sampleN` vectors by id),
    * entirely on the driver. This is the standard IVF architecture — the
    * quantizer trains on a sample at INDEX-BUILD time, then cell assignment
    * and search are fully distributed; the driver never sees more than
    * `sampleN` rows regardless of corpus size. Deterministic: fixed sample
    * order, fixed iteration count, ties toward the lower index. */
  private[graft] def trainCentroids(emb: DataFrame, idCol: String,
      vecCol: String, cells: Int, sampleN: Int, iters: Int): Seq[Seq[Double]] = {
    val sample = emb
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col("id")).limit(sampleN)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.length >= cells, s"sample ${sample.length} < cells $cells")
    val dim = sample.head.length
    var centroids = Array.tabulate(cells)(i => sample(i).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cells)(new Array[Double](dim))
      val counts = new Array[Int](cells)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < cells) {
          var d = 0.0; var t = 0
          while (t < dim) { val x = v(t) - centroids(j)(t); d += x * x; t += 1 }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        counts(best) += 1
        var t = 0
        while (t < dim) { sums(best)(t) += v(t); t += 1 }
      }
      centroids = Array.tabulate(cells) { j =>
        if (counts(j) == 0) centroids(j) // empty cell keeps its centroid
        else { val c = new Array[Double](dim)
          var t = 0
          while (t < dim) { c(t) = sums(j)(t) / counts(j); t += 1 }
          c }
      }
      it += 1
    }
    centroids.map(_.toSeq).toSeq
  }

  /** Product-quantization codebooks (Jégou '11): the vector dimension
    * splits into `m` contiguous subspaces and each subspace gets its own
    * `k`-means codebook, trained on the SAME deterministic lowest-id
    * sample (and with the same Lloyd loop, empty-cell rule, and
    * first-k-points init) as [[trainCentroids]] — one collect serves all
    * `m` trainings. Returns m × k × (dim/m). */
  private[graft] def trainPqCodebooks(emb: DataFrame, idCol: String,
      vecCol: String, m: Int, k: Int, sampleN: Int,
      iters: Int): Seq[Seq[Seq[Double]]] = {
    val sample = emb
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col("id")).limit(sampleN)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty input")
    require(sample.length >= k, s"sample ${sample.length} < codebook size $k")
    val dim = sample.head.length
    require(m >= 1 && dim % m == 0,
      s"PQ subspaces m=$m must divide the vector dimension $dim")
    val sub = dim / m
    (0 until m).map { mi =>
      val subSample = sample.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
      var centroids = Array.tabulate(k)(i => subSample(i).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Int](k)
        subSample.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var j = 0
          while (j < k) {
            var d = 0.0; var t = 0
            while (t < sub) { val x = v(t) - centroids(j)(t); d += x * x; t += 1 }
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          counts(best) += 1
          var t = 0
          while (t < sub) { sums(best)(t) += v(t); t += 1 }
        }
        centroids = Array.tabulate(k) { j =>
          if (counts(j) == 0) centroids(j)
          else { val c = new Array[Double](sub)
            var t = 0
            while (t < sub) { c(t) = sums(j)(t) / counts(j); t += 1 }
            c }
        }
        it += 1
      }
      centroids.map(_.toSeq).toSeq
    }
  }

  /** Approximate top-k via IVF (inverted-file) cells + exact rerank — the
    * second ANN scale path next to `lshTopK`. Vectors are assigned to their
    * nearest coarse centroid (one native codegen'd distance loop per row);
    * a probe scans only the vectors in its `nProbe` nearest cells, then
    * exact-cosine reranks. At 100 TB the cell column is what you PARTITION
    * the corpus by, so a probe's scan prunes to nProbe/cells of the data at
    * the file-listing level — here the cell filter is applied post-scan,
    * the honest equivalent without a materialized index. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              probeId: Long, k: Int, dim: Int,
              cells: Int = 16, nProbe: Int = 4,
              sampleN: Int = 512, iters: Int = 5): DataFrame = {
    val centroids = trainCentroids(emb, idCol, vecCol, cells, sampleN, iters)
    def cellOf(vec: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.VectorExprs.nearestCentroids(vec, centroids, 1)(0)
    val v = emb.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    val probe = v.where(col("vec_id") === probeId)
      .select(col("v").as("p"),
        org.apache.spark.sql.graft.VectorExprs
          .nearestCentroids(col("v"), centroids, nProbe).as("p_cells"))
    v.where(col("vec_id") =!= probeId)
      .withColumn("cell", cellOf(col("v")))
      .crossJoin(broadcast(probe))
      .where(array_contains(col("p_cells"), col("cell"))) // cell pruning
      .select(col("vec_id"),
        round(VectorFns.cosine(col("v"), col("p")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Candidate pairs for `cosinePairs` (exposed so AnnSpec can assert the
    * candidate-volume bound directly): vectors whose sign signature agrees
    * on ≥ b−1 of some table's b hyperplanes. One side emits plain table
    * keys, the other the radius-1 multiprobe expansion, so an equi-join on
    * the key matches exactly Hamming(sig_a, sig_b) ≤ 1 per table.
    *
    * `tables`/`planesPerTable` are REQUIRED — there is no safe fixed
    * default: the r3 constants (12×13) gave ~95% recall at τ=0.8 but ~30%
    * at τ=0.45 (per-table collision collapses as τ→0.5). Derive them from
    * the target threshold with `lshParamsFor(tau)` (what `cosinePairs`
    * does) unless you have measured reasons to pin them.
    *
    * Scale math (radius-1 probing, b planes, T tables): a random
    * (near-orthogonal) pair collides in a table with p = (1+b)/2ᵇ (e.g.
    * 14/8192 at b=13), so expected candidate volume ≈ 1−(1−(1+b)/2ᵇ)ᵀ of
    * N²/2 — ≈2% at (12, 13), genuinely subquadratic-with-small-constant,
    * vs the pre-r3 tuning (16 tables × 4 planes) whose ≈ N²/2 candidates
    * were all-pairs with a constant. A cosine-τ pair survives with
    * per-table q = pᵇ + b·pᵇ⁻¹(1−p) where p = 1 − arccos(τ)/π; union
    * recall over T tables is 1−(1−q)ᵀ — AnnSpec asserts both the recall
    * and the candidate-fraction ceiling. */
  def cosineCandidates(emb: DataFrame, idCol: String, vecCol: String,
                       dim: Int, tables: Int, planesPerTable: Int,
                       seed: Long = 42L): DataFrame = {
    val base = emb.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    // Candidate generation shuffles IDS ONLY: dragging the dim-wide vectors
    // through the bucket self-join + distinct would move candidate-count ×
    // vector-size bytes (the dominant cost measured at sf0.1); the exact
    // vectors are re-joined afterwards at deduped-candidate cardinality.
    val plain = base.select(col("vec_id").as("a_id"),
      explode(hyperplaneKeys(col("v"), dim, tables, planesPerTable, seed)).as("key"))
    val probed = base.select(col("vec_id").as("b_id"),
      explode(hyperplaneKeys(col("v"), dim, tables, planesPerTable, seed,
        expandBits = true)).as("b_key"))
    plain.join(probed, col("key") === col("b_key") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** Derive (tables, planesPerTable) hitting `targetRecall` for a pair at
    * cosine EXACTLY tau (recall rises steeply above tau), under radius-1
    * multiprobe. Per-table collision probability for a cosine-τ pair with b
    * planes is q = pᵇ + b·pᵇ⁻¹(1−p), p = 1 − arccos(τ)/π (Charikar '02);
    * union recall over T tables is 1 − (1−q)ᵀ. Selection is
    * CHEAPEST-FIRST: the SMALLEST b (fewest keys ≈ T·(b+1)) whose required
    * table count fits `maxTables` AND whose random-pair collision stays
    * under `maxRandomHit`; near the τ→0.5 sign-LSH limit, where no b meets
    * `maxRandomHit` within the table budget, fall back to the LARGEST
    * feasible b (most selective buckets that still hit the recall target) —
    * candidates grow, recall never silently drops. Fixed defaults cannot do
    * this job: the r3 constants (12×13) gave
    * ~95% recall at τ=0.8 but ~30% at τ=0.45 (near-threshold pairs silently
    * dropped — caught by round-3 advice), because q collapses as τ → 0.5. */
  private[graft] def lshParamsFor(tau: Double, targetRecall: Double = 0.9,
                                  maxTables: Int = 96,
                                  maxRandomHit: Double = 0.02): (Int, Int) = {
    require(tau > 0.0 && tau < 1.0, s"tau must be in (0,1), got $tau")
    val p = 1.0 - math.acos(tau) / math.Pi
    def tablesFor(b: Int): Long = { // tables needed for targetRecall at exactly tau
      val q = math.pow(p, b) + b * math.pow(p, b - 1) * (1 - p)
      math.ceil(math.log1p(-targetRecall) / math.log1p(-q)).toLong.max(1L)
    }
    def randomHit(b: Int, t: Long): Double = // union collision of a cosine≈0 pair
      1.0 - math.pow(1.0 - (1.0 + b) / math.pow(2.0, b), t.toDouble)
    // Cheapest-first: the SMALLEST b (fewest keys ≈ T·(b+1)) whose required
    // table count fits AND whose random-pair collision stays subquadratic.
    // Near τ→0.5 no b can reach maxRandomHit within the table budget (sign-
    // LSH's separation vanishes there); then take the most selective b that
    // still fits — candidates grow, recall does not silently drop.
    val feasible = (4 to 24).map(b => (b, tablesFor(b))).filter(_._2 <= maxTables)
    // No b in 4..24 reaches targetRecall within maxTables → REFUSE rather
    // than silently return params whose modeled recall is below target (the
    // pre-r6 getOrElse did exactly that for targetRecall near 1.0 — r5
    // ADVICE). Callers wanting best-effort can lower targetRecall or raise
    // maxTables explicitly.
    require(feasible.nonEmpty,
      s"lshParamsFor: no planesPerTable in 4..24 reaches recall=$targetRecall " +
        s"at tau=$tau within maxTables=$maxTables; lower targetRecall or raise maxTables")
    val (b, t) = feasible
      .find { case (b0, t0) => randomHit(b0, t0) <= maxRandomHit }
      .getOrElse(feasible.last) // largest feasible b = fewest candidates
    (t.toInt, b)
  }

  /** Exact all-pairs cosine join: every pair with (6dp-rounded) cosine ≥
    * tau, via a broadcast nested-loop self-join — one corpus pass per
    * broadcast batch, zero shuffles, 100% recall by construction (hence
    * oracle-able). This is the RIGHT plan below the LSH crossover (see
    * `cosinePairs`): generating LSH candidate keys costs ~T·(b+1) plane
    * projections per vector (≈1100 pair-dot equivalents at the τ=0.45
    * parameterization), so until the corpus is several times that size the
    * exact join does less arithmetic AND skips the key-explode shuffles.
    * Only the guarded dispatch below uses it — never call it on an
    * unbounded corpus. */
  private[graft] def bruteForcePairs(emb: DataFrame, idCol: String,
                                     vecCol: String, tau: Double): DataFrame = {
    // Norms hoisted out of the pair loop: ‖v‖ once per ROW instead of twice
    // per PAIR cuts 2/3 of the arithmetic. IEEE-identical to the per-pair
    // cosine (same subexpression, same inputs), so oracle parity holds.
    // A small corpus usually sits in one parquet file = one input split; an
    // explicit fan-out keeps the O(N²/2) pair loop on all cores instead of
    // one task (REPARTITION_BY_NUM, so AQE won't coalesce it back).
    val slots = emb.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val a = emb.select(col(idCol).as("a_id"),
        col(vecCol).cast("array<double>").as("a_v"))
      .withColumn("a_n", VectorFns.l2norm(col("a_v")))
      .repartition(slots)
    val b = emb.select(col(idCol).as("b_id"),
        col(vecCol).cast("array<double>").as("b_v"))
      .withColumn("b_n", VectorFns.l2norm(col("b_v")))
    a.crossJoin(broadcast(b)).where(col("a_id") < col("b_id"))
      .withColumn("sim",
        round(VectorFns.dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")), 6))
      .where(col("sim") >= tau)
      .select(col("a_id"), col("b_id"), col("sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Corpora at or below this row count dispatch to `bruteForcePairs`.
    * Crossover math at the τ=0.45 parameterization (79 tables × 13 planes,
    * radius-1 probing): LSH spends ~T·b = 1027 plane projections per vector
    * plus exact verification of ~13-16% of all pairs, so exact all-pairs
    * (N/2 dots per vector) does comparable arithmetic until N ≈ 2·T·b/0.15
    * ≈ 8–16k — while paying zero shuffles instead of three. 8192 keeps the
    * broadcast side ≤ ~4 MB at 64 dims. */
  private[graft] val ExactPairsMaxRows = 8192L

  /** Embedding-cosine near-dup: all pairs with cosine ≥ tau. ADAPTIVE, the
    * same way Spark picks broadcast-vs-shuffle joins by size:
    *
    *   - corpus ≤ `ExactPairsMaxRows` (counted once, driver-side) → exact
    *     broadcast all-pairs (`bruteForcePairs`): cheaper than LSH key
    *     generation at this size, zero shuffles, recall exactly 1 — which
    *     is what lets q_dedup_embed carry a DuckDB hash oracle.
    *   - larger corpora → LSH bucket collisions (candidate generation) +
    *     exact-cosine verify — the dense-vector sibling of
    *     NearDedup.minhashLsh, never all-pairs: the self-join is on
    *     (table, bucket) keys, so only vectors agreeing (up to 1 bit, via
    *     multiprobe) on some table's sign pattern ever meet. Recall is
    *     probabilistic and CONTROLLED: unless the caller pins
    *     (tables, planesPerTable), they are derived from tau via
    *     `lshParamsFor` so ≥~90% of exactly-at-threshold pairs survive at
    *     any tau — e.g. τ=0.8 → (10, 13) with ~1.7% random-pair
    *     candidates, τ=0.45 (near the τ→0.5 sign-LSH limit) → (79, 13)
    *     with ~13% — still subquadratic, the honest price of a low
    *     threshold.
    *
    * Pinning (tables, planesPerTable) forces the LSH path regardless of
    * size (how AnnSpec exercises it on the small fixtures; recall measured
    * there at both τ=0.8 clustered and τ=0.45 isotropic). */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                  tau: Double, dim: Int,
                  tables: Int = -1, planesPerTable: Int = -1,
                  seed: Long = 42L): DataFrame = {
    // Pin both or neither: a half-pinned call would silently re-derive BOTH
    // from tau, ignoring the one the caller set.
    require((tables > 0) == (planesPerTable > 0),
      s"pin both tables and planesPerTable or neither (got tables=$tables, " +
        s"planesPerTable=$planesPerTable)")
    val pinned = tables > 0
    if (!pinned && emb.count() <= ExactPairsMaxRows)
      return bruteForcePairs(emb, idCol, vecCol, tau)
    val (t, b) = if (pinned) (tables, planesPerTable) else lshParamsFor(tau)
    val base = emb.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    val cand = cosineCandidates(emb, idCol, vecCol, dim, t, b, seed)
    cand
      .join(base.select(col("vec_id").as("a_id"), col("v").as("a_v")), "a_id")
      .join(base.select(col("vec_id").as("b_id"), col("v").as("b_v")), "b_id")
      .withColumn("sim", round(VectorFns.cosine(col("a_v"), col("b_v")), 6))
      .where(col("sim") >= tau)
      .select(col("a_id"), col("b_id"), col("sim"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
