package graft

import graft.multimodal.{Asset, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: pack → featurize (mapPartitions
  * typed path with stubbed codec) → frame sampling. */
class MultimodalSpec extends SparkSpec {

  test("pack exposes queryable metadata without decoding payloads") {
    val docs = Tables.documents(spark, sf0001)
    val packed = Multimodal.pack(docs, "doc_id", "text", "text", "text/plain")
    assert(packed.columns.toSeq ==
      Seq("asset_id", "modality", "mime", "payload", "n_bytes", "content_sha"))
    val r = packed.where(col("asset_id") === 0).collect().head
    assert(r.getAs[Long]("n_bytes") == r.getAs[Array[Byte]]("payload").length.toLong)
    // metadata predicate prunes without touching payload bytes
    assert(packed.where(col("n_bytes") > 300).count() > 0)
  }

  test("featurize: deterministic stub decode, one feature row per asset, round-trips parquet") {
    val assets = Multimodal.documentAssets(spark, sf0001)
    val feats = Multimodal.featurize(assets).cache()
    assert(feats.count() == 500)
    val f0 = feats.filter(_.asset_id == 0L).head()
    assert(f0.features.length == 16)
    assert(math.abs(f0.features.sum - 1.0f) < 1e-3) // normalized histogram
    // determinism across plans
    val again = Multimodal.featurize(assets).filter(_.asset_id == 0L).head()
    assert(again.width == f0.width && again.features.toSeq == f0.features.toSeq)
    // binary+array schema survives a parquet round trip
    val tmp = java.nio.file.Files.createTempDirectory("mm").toString
    try {
      assets.limit(10).write.mode("overwrite").parquet(s"$tmp/assets")
      import spark.implicits._
      val back = spark.read.parquet(s"$tmp/assets").as[Asset]
      assert(back.count() == 10)
      val orig = assets.filter(_.asset_id == 0L).head()
      val rt = back.filter(_.asset_id == 0L).head()
      assert(java.util.Arrays.equals(orig.payload, rt.payload))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("frame sampling slices payloads with builtin expressions") {
    import spark.implicits._
    val df = Seq((1L, Array.range(0, 100).map(_.toByte))).toDF("id", "payload")
    val out = Multimodal.sampleFrames(df, "payload", frameBytes = 10, stride = 2)
      .select(col("frames")).collect().head.getSeq[Array[Byte]](0)
    assert(out.length == 5) // frames 0,2,4,6,8 of 10
    assert(out.forall(_.length == 10))
    assert(out(1)(0) == 20.toByte) // frame 2 starts at byte 20
  }
}
