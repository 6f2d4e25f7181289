package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted MinHash SIGNATURE STORE — the build-once/probe-many form of
  * incremental near-dedup ([[NearDedup.minhashLshIncremental]] recomputes
  * the corpus side per call; this materializes it, the way [[IvfIndex]]
  * materializes the vector index).
  *
  * Why it matters at 100 TB: the dominant cost of the per-batch form is
  * re-scanning and re-shingling the corpus TEXT on every ingest. The store
  * pays that once. After that, each incoming batch costs
  *
  *   - its OWN signatures (batch-sized, narrow map),
  *   - one scan of the corpus KEY table (`bands/`: band, bh, id, part —
  *     ~bands·16 B per doc, orders of magnitude narrower than text),
  *     equi-joined against the batch's broadcast band keys,
  *   - shingle-set lookups from `sets/` for the few candidates only
  *     (column-pruned to (id, part, sh); the candidate side is
  *     batch-bounded, so the join never shuffles the corpus).
  *
  * Exactness is unchanged: candidates verify against the STORED exact
  * shingle sets, so the probe's pair set equals the recomputing form's
  * (asserted in NearDedupSpec) and shares q_dedup_incremental's oracle.
  *
  * Layout under `path`: `bands/` + `sets/` parquet, and the
  * `_SIG_FINGERPRINT` guard (IvfIndex discipline: input digest + build
  * parameters; any mismatch rebuilds — band arithmetic between writer and
  * prober must be bit-identical, which is why both sides call the single
  * [[NearDedup.bandRows]]). */
object SigStore {

  private val FingerprintFile = "_SIG_FINGERPRINT"

  private def setsOf(docs: DataFrame, idCol: String, textCol: String,
                     partCol: String): DataFrame =
    docs.select(col(idCol).as("id"), col(partCol).as("part"),
        TextFns.shingles3(col(textCol)).as("sh"))
      .where(size(col("sh")) > 0)

  /** Build (or reuse) the corpus signature store. Returns true when a
    * build ran, false when the fingerprint matched and the store was
    * reused as-is. */
  def buildIfNeeded(corpus: DataFrame, path: String, fingerprint: String,
                    idCol: String, textCol: String, partCol: String,
                    bands: Int = 32, rowsPerBand: Int = 4): Boolean = {
    val spark = corpus.sparkSession
    val full = s"$fingerprint:$idCol:$textCol:$partCol:b$bands:r$rowsPerBand"
    if (IvfIndex.readSidecar(spark, path, FingerprintFile).contains(full)) false
    else {
      val sets = setsOf(corpus, idCol, textCol, partCol)
      NearDedup.bandRows(sets, bands, rowsPerBand)
        .write.mode("overwrite").parquet(s"$path/bands")
      sets.write.mode("overwrite").parquet(s"$path/sets")
      IvfIndex.writeSidecar(spark, path, FingerprintFile, full)
      true
    }
  }

  /** Probe the store with an incoming batch: one row per offending match —
    * (new_id, dup_of, jaccard) against the stored corpus AND against
    * earlier (smaller-id) members of the same batch, exactly
    * [[NearDedup.minhashLshIncremental]]'s output contract. The batch's
    * band keys broadcast (the probe contract is batch ≪ corpus — the
    * IvfIndex probe posture); within-batch pairs reuse the batch LSH
    * wholesale. */
  def probe(path: String, batch: DataFrame, idCol: String, textCol: String,
            partCol: String, tau: Double,
            bands: Int = 32, rowsPerBand: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    val bsets = setsOf(batch, idCol, textCol, partCol)

    // within-batch pairs: plain batch LSH, later id is the offender
    val within = NearDedup.minhashLsh(batch, idCol, textCol, partCol, tau,
        bands, rowsPerBand, materialize = Some(false))
      .select(col("b_id").as("new_id"), col("a_id").as("dup_of"), col("jaccard"))

    // cross pairs: batch band keys broadcast against the corpus key table
    val probeBands = NearDedup.bandRows(bsets, bands, rowsPerBand)
      .select(col("id").as("new_id"), col("part").as("n_part"),
        col("band").as("n_band"), col("bh").as("n_bh"))
    val cand = spark.read.parquet(s"$path/bands")
      .join(broadcast(probeBands),
        col("band") === col("n_band") && col("bh") === col("n_bh") &&
          col("part") === col("n_part"))
      .select(col("new_id"), col("id").as("dup_of")).distinct()
    val aSets = bsets.select(col("id").as("new_id"), col("sh").as("a_sh"))
    val storeSets = spark.read.parquet(s"$path/sets")
      .select(col("id").as("dup_of"), col("sh").as("b_sh"))
    val cross = cand.join(aSets, "new_id").join(storeSets, "dup_of")
      .withColumn("jaccard", TextFns.jaccard(col("a_sh"), col("b_sh")))
      .where(col("jaccard") >= tau)
      .select(col("new_id"), col("dup_of"), col("jaccard"))

    cross.unionByName(within)
  }
}
