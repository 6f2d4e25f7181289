package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: an opaque binary payload plus typed metadata.
  * This is the storage shape the brief mandates for image/audio/video
  * columns — Parquet `binary` + queryable metadata columns, so pruning,
  * partitioning and predicate pushdown work on metadata without ever
  * decoding payloads. */
case class Asset(asset_id: Long, modality: String, mime: String,
                 payload: Array[Byte])

/** Decoded features for one asset (what a real image decoder would emit). */
case class AssetFeatures(asset_id: Long, width: Int, height: Int,
                         n_bytes: Long, features: Array[Float])

/** Multimodal-column plumbing (driver brief: "multimodal columns").
  *
  * The Spark side — schema, typed Encoders, partition-level batch shape,
  * frame sampling — is real and tested (MultimodalSpec). The codec itself is
  * a STUB: this container has no image/audio libraries, so `decodeStub`
  * derives deterministic fake dimensions/features from the payload bytes.
  * Swapping in a real codec changes ONLY the body of `decodeStub`; every
  * Spark-facing signature stays as is.
  *
  * Scale notes: `featurize` is `mapPartitions` — the Scala analogue of
  * `mapInPandas` — so per-partition codec state (a decoder instance, a GPU
  * handle) is initialized once per task, not once per row, and the work
  * distributes with the data. Frame sampling is builtin expressions
  * (`substring` on binary inside `transform`) and stays in codegen.
  */
object Multimodal {

  /** Canonical multimodal frame from any binary column: opaque payload +
    * metadata derived WITHOUT decoding (length, content hash). */
  def pack(df: DataFrame, idCol: String, payloadCol: String,
           modality: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(modality).as("modality"),
      lit(mime).as("mime"),
      col(payloadCol).cast("binary").as("payload"),
      length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
      sha2(col(payloadCol).cast("binary"), 256).as("content_sha"))

  /** STUB decode — deterministic fake in lieu of a real codec (none in this
    * container). Dims come from a stable hash of the payload; "features" are
    * a 16-dim byte-histogram projection. Deterministic: same payload, same
    * output, on any executor. */
  private[multimodal] def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 16 + math.floorMod(h, 1024)
    val height = 16 + math.floorMod(h >> 10, 1024)
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist(java.lang.Byte.toUnsignedInt(payload(i)) % 16) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    (width, height, hist.map(_ / n))
  }

  /** Batched decode/feature-extract over a typed Dataset — the
    * `mapInPandas` analogue: one codec init per PARTITION, rows streamed
    * through it. Plans as a single narrow stage (no shuffle). */
  def featurize(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: open codec/device handle here, once per task
      it.map { a =>
        val (w, h, feat) = decodeStub(a.payload)
        AssetFeatures(a.asset_id, w, h, a.payload.length.toLong, feat)
      }
    }
  }

  /** Frame sampling for chunked/video-like payloads: every `stride`-th
    * fixed-size frame, as an array column — builtin expressions only, no
    * decode, stays in whole-stage codegen. */
  def sampleFrames(df: DataFrame, payloadCol: String,
                   frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col(payloadCol)) / frameBytes)
    df.withColumn("frames",
      transform(
        filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => i % stride === 0 && nFrames > 0),
        i => substring(col(payloadCol), (i * frameBytes + 1).cast("int"), lit(frameBytes))))
  }

  /** The documents fixture viewed as a multimodal corpus (text bytes as the
    * opaque payload) — exercises the full pack→featurize path on real
    * parquet input. */
  def documentAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("asset_id"), lit("text").as("modality"),
        lit("text/plain").as("mime"), col("text").cast("binary").as("payload"))
      .as[Asset]
  }
}
