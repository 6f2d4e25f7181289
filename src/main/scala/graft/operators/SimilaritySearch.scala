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

  /** bits[j] = sign of ⟨v, plane_j⟩; keys[l] packs table l's bits. Planes are
    * seeded at plan time and embedded as literals → deterministic. */
  private def hyperplaneKeys(vec: org.apache.spark.sql.Column, dim: Int,
                             tables: Int, planesPerTable: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] =
      Seq.fill(tables * planesPerTable)(Seq.fill(dim)(rnd.nextGaussian()))
    val bits = transform(typedLit(planes),
      w => when(VectorFns.dot(vec, w) > 0, 1L).otherwise(0L))
    transform(sequence(lit(0), lit(tables - 1)), l =>
      aggregate(slice(bits, l * planesPerTable + 1, lit(planesPerTable)),
        // tag with the table index so equal bit patterns in different
        // tables can't collide through arrays_overlap / equi-joins
        l.cast("long") * (1L << planesPerTable),
        (acc, x) => shiftleft(acc, 1).bitwiseOR(x)))
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

  /** Embedding-cosine near-dup: all pairs with cosine ≥ tau, found through
    * LSH bucket collisions (candidate generation) + exact-cosine verify —
    * the dense-vector sibling of NearDedup.minhashLsh, and like it never
    * all-pairs: the self-join is on (table, bucket) keys, so only vectors
    * agreeing on some table's sign pattern ever meet. Recall is
    * probabilistic (tune tables/planesPerTable to the target tau); no
    * cross-engine oracle — AnnSpec measures recall against brute force. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                  tau: Double, dim: Int,
                  tables: Int = 16, planesPerTable: Int = 4,
                  seed: Long = 42L): DataFrame = {
    val base = emb.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    // Candidate generation shuffles IDS ONLY: dragging the dim-wide vectors
    // through the bucket self-join + distinct would move candidate-count ×
    // vector-size bytes (the dominant cost measured at sf0.1); the exact
    // vectors are re-joined afterwards at deduped-candidate cardinality.
    val keyed = base.select(col("vec_id"),
      explode(hyperplaneKeys(col("v"), dim, tables, planesPerTable, seed)).as("key"))
    val cand = keyed.select(col("vec_id").as("a_id"), col("key"))
      .join(keyed.select(col("vec_id").as("b_id"), col("key").as("b_key")),
        col("key") === col("b_key") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    cand
      .join(base.select(col("vec_id").as("a_id"), col("v").as("a_v")), "a_id")
      .join(base.select(col("vec_id").as("b_id"), col("v").as("b_v")), "b_id")
      .withColumn("sim", round(VectorFns.cosine(col("a_v"), col("b_v")), 6))
      .where(col("sim") >= tau)
      .select(col("a_id"), col("b_id"), col("sim"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
