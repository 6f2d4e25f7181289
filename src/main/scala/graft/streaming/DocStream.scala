package graft.streaming

import graft.functions.TextFns
import graft.operators.PipelinePack
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (band, band-hash) row of a banded document for
  * [[DocStream.nearDupPairsStream]] — the doc's full MinHash signature
  * rides along for the in-bucket similarity estimate. */
case class BandDoc(band: Int, bh: Long, doc_id: Long,
                   ts: java.sql.Timestamp, sig: Seq[Long])

/** Per-(band, band-hash) bucket state: prior arrivals still inside the
  * horizon as (doc_id, event-time µs, signature) — k·8 B per entry, capped. */
case class BucketState(entries: Seq[(Long, Long, Seq[Long])])

/** A detected near-duplicate pair, canonically oriented: `a_id` is the
  * earlier endpoint by (event time, doc_id) — not by arrival, so ties and
  * bounded disorder can't flip endpoints across replays; `ts` is the
  * triggering (later-arriving) doc's event time (drives downstream
  * watermarking). */
case class NearDupPair(a_id: Long, b_id: Long, band: Int, est: Double,
                       ts: java.sql.Timestamp)

/** [[BandDoc]] with the doc's distinct-shingle count riding along — the
  * extra scalar [[DocStream.containmentPairsStream]]'s asymmetric estimate
  * needs on top of the signature. */
case class BandDocN(band: Int, bh: Long, doc_id: Long,
                    ts: java.sql.Timestamp, n: Long, sig: Seq[Long])

/** Bucket state for the containment stream: (doc_id, event-time µs,
  * shingle count, signature) per held entry. */
case class BucketStateN(entries: Seq[(Long, Long, Long, Seq[Long])])

/** A detected containment pair, canonically oriented like the batch
  * operator: `contained_id` is the SMALLER shingle set (ties by id). `est`
  * is the signature-derived containment estimate; `ts` the triggering
  * doc's event time. */
case class ContainPair(contained_id: Long, container_id: Long, band: Int,
                       est: Double, ts: java.sql.Timestamp)

/** The corpus-construction gate, LIVE: the batch pipeline's quality filter
  * and exact dedup re-expressed over a document STREAM — what a continuous
  * training-data ingest actually runs, where documents arrive from a
  * crawler and the corpus must stay clean without nightly batch rebuilds.
  *
  * Design rules (the same ones as the rest of graft.streaming):
  *
  *   - REUSE the batch operators, never re-implement them. The quality
  *     gate is literally `PipelinePack.qualityGate` (a narrow, stateless
  *     frame transform — streaming-safe by construction), so batch and
  *     stream semantics cannot drift.
  *   - Bounded state. The only stateful operator is Spark's own
  *     `dropDuplicatesWithinWatermark` keyed by content hash: state is one
  *     compact (sha, ts) record per DISTINCT surviving document inside the
  *     watermark horizon, evicted by event time — not corpus-proportional.
  *   - The stream never shuffles before the stateful dedup exchange; the
  *     gate's predicates and signal columns all fuse into the source scan
  *     stage (same plan property PlanAuditSpec pins for the batch gate).
  *
  * Semantics: exact-duplicate CONTENT (same sha-256 of text) arriving
  * within the watermark keeps the FIRST arrival; beyond the watermark a
  * re-arrival is a new document (the horizon is the deduplication
  * contract, exactly as documented by dropDuplicatesWithinWatermark).
  * Batch parity on chunked replay is proven in DocStreamSpec.
  */
object DocStream {

  /** Quality-gate + dedup a document stream. `docs` needs `text` plus an
    * event-time column `tsCol`; every other column rides through. Output:
    * the surviving documents with their quality signals and content hash,
    * first arrival per distinct content within the watermark. */
  def corpusStream(docs: DataFrame, tsCol: String, watermark: String): DataFrame = {
    val reserved = Set("content_sha")
    val clash = docs.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns clash with reserved names: $clash")
    PipelinePack.qualityGate(docs)
      .withColumn("content_sha", sha2(col("text").cast("binary"), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("content_sha"))
      .drop("text", "n_uniq", "tok_chars", "n_tri", "n_tri_distinct")
  }

  /** Streaming train/test decontamination — the live admission twin of
    * `PipelinePack.decontaminateBloom`: incoming documents are DROPPED the
    * moment any of their word 3-grams might appear in the static eval
    * benchmark. The benchmark's distinct-shingle Bloom filter is built
    * ONCE at stream definition (one aggregate over the static side —
    * partial filters OR together map-side; the result is KB–MB sized by
    * the operator's own asymmetry argument: benchmarks stay MBs while the
    * corpus grows) and embedded as a LITERAL in the stream's filter
    * predicate. The gate is therefore a pure narrow map — no stream-static
    * join, no state, no shuffle; it composes in front of `corpusStream`
    * exactly like the batch filter chain.
    *
    * Bloom false positives only cause EXTRA drops (the safe direction for
    * decontamination — fpp ≈ 5e-4 at the defaults); misses are impossible,
    * so a kept doc provably shares no shingle with the benchmark. Docs
    * with < 3 tokens have no shingles and pass (same as batch). Batch
    * parity on chunked replay is proven in DocStreamSpec against the
    * identical-filter batch predicate. */
  /** EMBEDDING-decontamination gate for a vector stream — the semantic
    * sibling of [[decontaminateStream]] (n-gram Bloom misses PARAPHRASED
    * leakage; a cosine hit catches reworded eval questions): drop every
    * row whose vector reaches cosine ≥ `tau` (after the 6dp round — the
    * batch key's parity rule) against ANY benchmark vector. The benchmark
    * embeds in the PLAN as a literal array (it is small by nature — eval
    * suites, not corpora; the literal rides the serialized plan to every
    * task, so the default ceiling is sized for ~8 MB at dim 64, and the
    * limit+1 probe refuses a misuse loudly rather than melting the
    * driver), so per microbatch this is a stateless codegen'd filter: no
    * join, no state, no shuffle — the exact `q_decontaminate_embed`
    * predicate, so live and nightly gates cannot drift (chunk-replay
    * parity in DocStreamSpec). */
  def decontaminateEmbedStream(vecs: DataFrame, benchmark: DataFrame,
                               vecCol: String = "embedding",
                               tau: Double = 0.35,
                               maxBenchVectors: Int = 16384): DataFrame = {
    // bounded driver materialization: the benchmark side only, with a
    // limit+1 probe (the vocab-ceiling rule)
    val bench = benchmark.select(col(vecCol).cast("array<double>"))
      .limit(maxBenchVectors + 1).collect().map(_.getSeq[Double](0).toSeq)
    require(bench.length <= maxBenchVectors,
      s"decontaminateEmbedStream: benchmark exceeds $maxBenchVectors " +
        "vectors — route the gate through the IVF store instead")
    if (bench.isEmpty) vecs // empty benchmark: nothing to block
    else {
      val benchLit = typedLit(bench.toSeq)
      val v = col(vecCol).cast("array<double>")
      val hit = exists(benchLit,
        b => round(graft.functions.VectorFns.cosine(v, b), 6) >= lit(tau))
      // null/zero-norm vectors: cosine is null, exists() under
      // three-valued logic is null, and a bare where(!hit) would DROP the
      // row — but the batch gate's (sim >= tau IS NULL -> false) keeps it
      // un-flagged. coalesce pins the stream to the batch semantics.
      vecs.where(!coalesce(hit, lit(false)))
    }
  }

  def decontaminateStream(docs: DataFrame, benchmark: DataFrame,
                          textCol: String = "text",
                          estimatedItems: Long = 1L << 17,
                          numBits: Long = 1L << 21): DataFrame = {
    import org.apache.spark.sql.graft.BloomExprs
    val bfRow = benchmark
      .select(explode(TextFns.shingles3(col(textCol))).as("sh"))
      .agg(BloomExprs.bloomAgg(xxhash64(col("sh")), estimatedItems, numBits)
        .as("bf"))
      .head()
    if (bfRow.isNullAt(0)) docs // empty benchmark: nothing to block
    else {
      val bf = bfRow.getAs[Array[Byte]](0)
      val hit = exists(TextFns.shingles3(col(textCol)),
        sh => BloomExprs.mightContain(lit(bf), xxhash64(sh)))
      docs.where(!hit)
    }
  }

  /** The LIVE ingest gate end-to-end — the signature store closing the
    * loop on a document STREAM: per microbatch, (1) PROBE the store
    * (`SigStore.probe` — near-dups vs the standing corpus AND vs
    * smaller-id docs in the same batch), (2) hand the ADMITTED docs (no
    * offending match) to `sink`, (3) APPEND their signatures so the NEXT
    * microbatch dedups against them too. The store — durable, shared,
    * inspectable — is the stream's state instead of executor memory, and
    * per microbatch the operation is stateless (the annServeSink
    * posture): each step is the exact batch operator, so live and nightly
    * ingest cannot drift. Docs with < 3 tokens carry no shingles and are
    * always admitted (they cannot near-dup — batch semantics; they are
    * also not stored). Chunked-stream == sequential-batch-loop parity is
    * proven in DocStreamSpec. */
  def ingestGateSink(docs: DataFrame, storePath: String,
                     idCol: String, textCol: String, partCol: String,
                     tau: Double)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val offenders = graft.operators.SigStore
            .probe(storePath, batch, idCol, textCol, partCol, tau)
            .select(col("new_id")).distinct()
          val admitted = batch
            .join(offenders, batch(idCol) === offenders("new_id"), "left_anti")
            .persist() // consumed twice: the sink and the store append
          try {
            sink(admitted)
            graft.operators.SigStore.append(storePath, admitted,
              idCol, textCol, partCol)
          } finally admitted.unpersist()
        }
      }

  /** Streaming ANN retrieval — the RAG-serving shape: a STREAM of probe
    * vectors served against the materialized IVF store. Each microbatch
    * runs the SAME bulk `IvfIndex.knnJoin` the batch surface uses —
    * probes broadcast with their nProbe nearest cells, the corpus scan
    * dynamically pruned to the probed cell files, per-probe k-heap
    * aggregation — so stream and batch retrieval cannot drift, and the
    * store's build-once/probe-many amortization carries over unchanged
    * (the index is NOT rebuilt per batch; `foreachBatch` re-enters the
    * fingerprint-guarded read path).
    *
    * `foreachBatch` is the right tool, not a compromise: retrieval
    * against a static index is per-batch stateless, so there is no
    * streaming state to manage — the batch operator IS the
    * implementation, invoked per microbatch with the results handed to
    * `sink` (write to a table, push to a service, ...). */
  def annServeSink(probes: DataFrame, storePath: String,
                   idCol: String, vecCol: String, k: Int, nProbe: Int = 4)
                  (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    probes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.IvfIndex.knnJoin(batch.sparkSession, storePath,
            batch, idCol, vecCol, k, nProbe))
      }

  /** Streaming NEAR-duplicate detection — the live twin of
    * `NearDedup.minhashLsh`: a stream of detected near-dup PAIRS
    * (first-arrival id, later id) within a bounded event-time horizon.
    *
    * Mechanics, all batch-identical where a batch analogue exists:
    *
    *   1. Stateless prep: word-3-gram shingles → per-ROW MinHash signature
    *     (`MinHashRow` — the same bit-exact kernel the batch path uses;
    *     no explode, no aggregation, fuses into the source scan) → one
    *     (band, bandHash) row per band, the banding arithmetic copied
    *     from the batch operator so candidate buckets are identical.
    *   2. One stateful operator: `flatMapGroupsWithState` keyed by
    *     (band, bandHash). Each bucket holds the prior arrivals still
    *     inside `horizonMs` as (id, ts µs, signature) — when a new doc
    *     lands in the bucket it emits a pair for every held entry whose
    *     ESTIMATED Jaccard (matching-component fraction of the two
    *     signatures — the textbook MinHash estimator) clears `tau`.
    *
    * Honest divergence from batch: `minhashLsh` verifies candidates on
    * EXACT shingle-set Jaccard; holding shingle sets in stream state would
    * be document-sized, so the stream verifies on the signature estimate —
    * k-bounded state per entry, estimator std ≈ √(τ(1−τ)/k) (~0.044 at
    * τ=0.5, k=128). Near-identical spam (J ≈ 1) and unrelated text
    * (J ≈ 0) are both many σ from any sane τ; borderline pairs may differ
    * from batch. DocStreamSpec pins parity on a planted corpus.
    *
    * Bounded state, deterministically: entries evict on a DATA-driven
    * horizon (processed-row µs − `horizonMs`), never on wall clock, so
    * IN-ORDER replay of the same data emits the same pairs regardless of
    * microbatch boundaries or watermark timing (DocStreamSpec pins this),
    * and pair ENDPOINTS are canonical by (event time, id) — equal-ts pairs
    * can't flip orientation across replays. Under bounded event-time
    * DISORDER matching stays symmetric (a late-but-in-horizon doc still
    * pairs against held newer entries), though which entries were already
    * evicted at its arrival is sequence-dependent — the same caveat every
    * horizoned streaming dedup carries. The watermark-driven event-time
    * timeout only reclaims whole idle buckets (every entry is then past
    * the horizon — nothing observable depends on WHEN it fires). Hot buckets cap at
    * `maxBucketEntries` FIFO — a cap hit degrades recall against the
    * oldest entries, never memory. A pair that matches in several bands
    * emits once per band (bands are independent state groups);
    * `distinct()` downstream — or any-row-means-dup consumers — absorb it.
    *
    * 100 TB posture: the only exchange is the band-key shuffle of
    * signature-sized rows (k·8 B + id + ts per band row); documents
    * themselves never move, and executor state is horizon- and cap-bounded
    * per LIVE bucket, not corpus-proportional. */
  def nearDupPairsStream(docs: DataFrame, idCol: String, tsCol: String,
                         textCol: String, watermark: String,
                         bands: Int = 32, rowsPerBand: Int = 4,
                         tau: Double = 0.5, horizonMs: Long = 3600000L,
                         maxBucketEntries: Int = 256): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = bands * rowsPerBand
    val sets = docs.select(col(idCol).cast("long").as("doc_id"),
        col(tsCol).as("ts"),
        graft.functions.TextFns.shingles3(col(textCol)).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig",
        org.apache.spark.sql.graft.AggExprs.minhashRow(col("sh"), k))
    // band key arithmetic identical to NearDedup.minhashLsh
    val bandStructs = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(lit(b) +: slice: _*).as("bh"))
    }
    val horizonUs = horizonMs * 1000L
    val usOf = TsStream.usOf _
    sets
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(array(bandStructs: _*)).as("x"))
      .select(col("x.band").as("band"), col("x.bh").as("bh"),
        col("doc_id"), col("ts"), col("sig"))
      .withWatermark("ts", watermark)
      .as[BandDoc]
      .groupByKey(d => (d.band, d.bh))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(
        (key: (Int, Long), it: Iterator[BandDoc],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // bucket idle past maxTs + horizon: every entry is beyond the
            // horizon of any future arrival — reclaim the whole bucket
            state.remove(); Iterator.empty
          } else {
            val rows = it.toArray.sortBy(d => (usOf(d.ts), d.doc_id))
            var entries = state.getOption.map(_.entries).getOrElse(Seq.empty)
            val out = Seq.newBuilder[NearDupPair]
            rows.foreach { d =>
              val tUs = usOf(d.ts)
              entries = entries.filter(e => tUs - e._2 <= horizonUs)
              entries.foreach { case (aId, aUs, aSig) =>
                if (aId != d.doc_id) {
                  var m = 0
                  var i = 0
                  while (i < k) {
                    if (aSig(i) == d.sig(i)) m += 1
                    i += 1
                  }
                  val est = m.toDouble / k
                  if (est >= tau) {
                    // canonical orientation by (event time, id) — NOT by
                    // arrival: two docs with equal ts would otherwise flip
                    // endpoints depending on which microbatch carried which
                    val flip = aUs > tUs || (aUs == tUs && aId > d.doc_id)
                    val (x, y) = if (flip) (d.doc_id, aId) else (aId, d.doc_id)
                    out += NearDupPair(x, y, key._1, est, d.ts)
                  }
                }
              }
              entries = (entries :+ ((d.doc_id, tUs, d.sig)))
                .takeRight(maxBucketEntries)
            }
            if (entries.isEmpty) state.remove()
            else {
              state.update(BucketState(entries))
              state.setTimeoutTimestamp(entries.last._2 / 1000L + horizonMs)
            }
            out.result().iterator
          })
  }

  /** The live CONTAINMENT gate — [[nearDupPairsStream]]'s banded state with
    * a second, asymmetric verify arm (the streaming twin of
    * `NearDedup.containmentPairs`): each in-bucket comparison derives the
    * containment estimate from the signature Jaccard plus the two held
    * shingle COUNTS — Ĉ = Ĵ/(1+Ĵ)·(|A|+|B|)/|A| with A the smaller set
    * (|A∩B| recovered from Ĵ's identity |A∩B| = Ĵ(|A|+|B|)/(1+Ĵ)) — and
    * pairs clear `tauC`. Orientation matches the batch canonicalization
    * exactly: contained = smaller shingle set, ties by id. State cost over
    * the near-dup bucket: one extra long (the count) per entry.
    *
    * Honest RECALL divergence from batch, beyond the estimator note on
    * [[nearDupPairsStream]]: the batch operator's pigeonhole prefix join
    * recalls containment at ANY size ratio; banded MinHash buckets only
    * collide at Jaccard-level similarity, and C ≥ τ with |B| = ρ·|A|
    * implies only J ≥ τ/(1+ρ). So the live gate catches the
    * SIZE-COMPARABLE containment case (quoted-with-commentary spam,
    * template wrapping — ρ small, J still high), and defers extreme
    * small-in-big (ρ ≫ 1, J ≈ 0 — the case that needs full posting lists,
    * i.e. document-sized state) to the nightly batch pass. DocStreamSpec
    * pins pair parity vs `containmentPairs` on a planted size-comparable
    * corpus under chunked replay, and pins that the known miss regime IS
    * missed — the divergence is asserted, not just documented.
    *
    * Same determinism, horizon, cap, and shuffle posture as
    * [[nearDupPairsStream]] (only signature-plus-scalar rows move). */
  def containmentPairsStream(docs: DataFrame, idCol: String, tsCol: String,
                             textCol: String, watermark: String,
                             bands: Int = 32, rowsPerBand: Int = 4,
                             tauC: Double = 0.9,
                             minShingles: Int = 10,
                             horizonMs: Long = 3600000L,
                             maxBucketEntries: Int = 256): Dataset[ContainPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = bands * rowsPerBand
    val sets = docs.select(col(idCol).cast("long").as("doc_id"),
        col(tsCol).as("ts"),
        graft.functions.TextFns.shingles3(col(textCol)).as("sh"))
      .where(size(col("sh")) >= minShingles)
      .withColumn("n", size(col("sh")).cast("long"))
      .withColumn("sig",
        org.apache.spark.sql.graft.AggExprs.minhashRow(col("sh"), k))
    val bandStructs = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(lit(b) +: slice: _*).as("bh"))
    }
    val horizonUs = horizonMs * 1000L
    val usOf = TsStream.usOf _
    sets
      .select(col("doc_id"), col("ts"), col("n"), col("sig"),
        explode(array(bandStructs: _*)).as("x"))
      .select(col("x.band").as("band"), col("x.bh").as("bh"),
        col("doc_id"), col("ts"), col("n"), col("sig"))
      .withWatermark("ts", watermark)
      .as[BandDocN]
      .groupByKey(d => (d.band, d.bh))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(
        (key: (Int, Long), it: Iterator[BandDocN],
         state: GroupState[BucketStateN]) =>
          if (state.hasTimedOut) {
            state.remove(); Iterator.empty
          } else {
            val rows = it.toArray.sortBy(d => (usOf(d.ts), d.doc_id))
            var entries = state.getOption.map(_.entries).getOrElse(Seq.empty)
            val out = Seq.newBuilder[ContainPair]
            rows.foreach { d =>
              val tUs = usOf(d.ts)
              entries = entries.filter(e => tUs - e._2 <= horizonUs)
              entries.foreach { case (aId, _, aN, aSig) =>
                if (aId != d.doc_id) {
                  var m = 0
                  var i = 0
                  while (i < k) {
                    if (aSig(i) == d.sig(i)) m += 1
                    i += 1
                  }
                  if (m > 0) {
                    val j = m.toDouble / k
                    val inter = j / (1.0 + j) * (aN + d.n)
                    // contained = smaller set, ties by id — the batch rule
                    val (cId, cN, bId) =
                      if (aN < d.n || (aN == d.n && aId < d.doc_id))
                        (aId, aN, d.doc_id)
                      else (d.doc_id, d.n, aId)
                    val est = math.min(inter / cN, 1.0)
                    if (est >= tauC)
                      out += ContainPair(cId, bId, key._1, est, d.ts)
                  }
                }
              }
              entries = (entries :+ ((d.doc_id, tUs, d.n, d.sig)))
                .takeRight(maxBucketEntries)
            }
            if (entries.isEmpty) state.remove()
            else {
              state.update(BucketStateN(entries))
              state.setTimeoutTimestamp(entries.last._2 / 1000L + horizonMs)
            }
            out.result().iterator
          })
  }
}
