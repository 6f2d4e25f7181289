package graft.streaming

import graft.operators.PipelinePack
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
