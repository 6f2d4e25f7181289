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

  /** Recovery sweep for interrupted [[delete]]s: restore a staged table
    * whose live twin is missing (crash between stage and install — the
    * delete never happened), discard completed swaps' remnants. Runs from
    * every entry point that reads the store (probe, buildIfNeeded, delete),
    * so a crashed delete heals on the next READ — probe must never throw
    * path-not-found behind a healthy fingerprint. */
  private def recoverCrashedDelete(spark: org.apache.spark.sql.SparkSession,
                                   path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    Seq("bands", "sets").foreach { n =>
      val trash = new org.apache.hadoop.fs.Path(root, s"_trash_$n")
      val live = new org.apache.hadoop.fs.Path(root, n)
      if (fs.exists(trash)) {
        if (!fs.exists(live)) require(fs.rename(trash, live),
          s"cannot restore $trash after a crashed delete")
        else fs.delete(trash, true)
      }
      val tmp = new org.apache.hadoop.fs.Path(root, s"_del_$n")
      if (fs.exists(tmp)) fs.delete(tmp, true)
    }
  }

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
    recoverCrashedDelete(spark, path)
    require(!Seq(idCol, textCol, partCol).exists(_.contains(":")),
      "column names must not contain ':' (sidecar delimiter)")
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

  /** Append an ADMITTED batch's signatures into the store — the third step
    * of the ingest loop (probe → admit → append): survivors become corpus
    * for the next batch with no rebuild, at the cost of one batch-bounded
    * scan and two appended parquet writes. Fails fast on absent
    * fingerprints and column/parameter mismatches (the IvfIndex append
    * guard — the sidecar is written LAST by builds, so its absence means
    * mid-build or crashed, and band parameters are parsed from the
    * recorded value so the appended keys hash identically). Passing
    * `fingerprint` re-stamps the sidecar with the new lineage so a
    * subsequent buildIfNeeded on the grown input doesn't full-rebuild.
    * Docs with < 3 tokens carry no shingles and are skipped (they cannot
    * near-dup — batch semantics). */
  def append(path: String, admitted: DataFrame, idCol: String, textCol: String,
             partCol: String, fingerprint: Option[String] = None): Unit = {
    val spark = admitted.sparkSession
    val recorded = IvfIndex.readSidecar(spark, path, FingerprintFile).getOrElse(
      throw new IllegalStateException(
        s"signature store at $path has no fingerprint sidecar (absent or " +
          "partial build) — rebuild before appending"))
    val parts = recorded.split(":", -1)
    require(parts.length >= 6, s"malformed sidecar: $recorded")
    val tail = parts.takeRight(5) // idCol, textCol, partCol, b<N>, r<N>
    require(tail(0) == idCol && tail(1) == textCol && tail(2) == partCol,
      s"signature store at $path was built with columns " +
        s"(${tail(0)}, ${tail(1)}, ${tail(2)}), append called with " +
        s"($idCol, $textCol, $partCol)")
    val (bands, rowsPerBand) = (tail(3).drop(1).toInt, tail(4).drop(1).toInt)
    val sets = setsOf(admitted, idCol, textCol, partCol)
    NearDedup.bandRows(sets, bands, rowsPerBand)
      .write.mode("append").parquet(s"$path/bands")
    sets.write.mode("append").parquet(s"$path/sets")
    fingerprint.foreach(fp => IvfIndex.writeSidecar(spark, path,
      FingerprintFile, s"$fp:$idCol:$textCol:$partCol:b$bands:r$rowsPerBand"))
  }

  /** Remove PRUNED docs' signatures — the curation loop's reverse verb
    * (a doc dropped from the corpus must stop vetoing future arrivals):
    * both narrow tables rewrite through an anti-filter WITHOUT ever
    * re-reading corpus text — at 100 TB that is the whole point, the
    * rewrite touches bands·16 B + shingle keys per doc, not documents.
    * Crash discipline mirrors IvfIndex.delete (stage → install → drop
    * trash, restore-on-missing recovery sweep); `bands/` swaps FIRST so
    * the only crash-intermediate state is a harmless one (a doc absent
    * from bands can never become a candidate, so its stale sets row is
    * dead weight; the opposite order could silently drop OTHER pairs at
    * verify). Re-issuing the same delete heals a half-applied one.
    * Returns signature-set rows removed (0 = ids not present). */
  def delete(spark: org.apache.spark.sql.SparkSession, path: String,
             ids: Seq[Long], fingerprint: Option[String] = None): Long = {
    val recorded = IvfIndex.readSidecar(spark, path, FingerprintFile).getOrElse(
      throw new IllegalStateException(
        s"signature store at $path has no fingerprint sidecar (absent or " +
          "partial build) — rebuild before deleting"))
    if (ids.isEmpty) return 0L
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sub(n: String) = new org.apache.hadoop.fs.Path(root, n)
    recoverCrashedDelete(spark, path)
    // broadcast relation, not a literal IN list — the pruned-id set at
    // curation scale is data-sized (the IvfIndex.delete discipline)
    import spark.implicits._
    val idsDf = ids.toDF("id")
    val n = spark.read.parquet(s"$path/sets")
      .join(broadcast(idsDf), Seq("id"), "left_semi").count()
    if (n == 0L) return 0L
    Seq("bands", "sets").foreach { name =>
      spark.read.parquet(sub(name).toString)
        .join(broadcast(idsDf), Seq("id"), "left_anti")
        .write.mode("overwrite").parquet(sub(s"_del_$name").toString)
      require(fs.rename(sub(name), sub(s"_trash_$name")),
        s"delete: cannot stage $name")
      require(fs.rename(sub(s"_del_$name"), sub(name)),
        s"delete: cannot install rewritten $name")
      fs.delete(sub(s"_trash_$name"), true)
    }
    fingerprint.foreach(fp => IvfIndex.writeSidecar(spark, path,
      FingerprintFile, fp + recorded.dropWhile(_ != ':')))
    n
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
    recoverCrashedDelete(spark, path)
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
