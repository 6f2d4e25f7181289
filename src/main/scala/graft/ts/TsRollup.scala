package graft.ts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Incrementally-synced rollup table — the materialized-aggregate pattern
  * every long-horizon time-series deployment ends up needing (serve
  * dashboards off hourly buckets, not 100 TB of raw events), built
  * entirely from this engine's own verbs:
  *
  *   - the sync CURSOR (last source version rolled up) lives in the
  *     rollup table's OWN commit log (manifest meta, [[TsTable.latestMeta]])
  *     — no side files, survives restarts, auditable via `history`;
  *   - each sync reads ONLY what changed: `changesBetween(cursor, now)`
  *     names the appended rows (metadata-only diff), their ts span —
  *     aligned out to bucket boundaries — bounds ONE `readRange` over the
  *     source, and the re-aggregated buckets UPSERT into the rollup via
  *     `mergeInto` (partial buckets recompute, brand-new buckets insert,
  *     backfilled days land in the rollup's past, which `append` could
  *     not do);
  *   - an expired cursor (source history reclaimed under it) degrades to
  *     one full re-aggregation, never to silent staleness.
  *
  * Steady-state cost per sync: manifest metadata + one range read of the
  * changed span + an aggregate shuffled only on its buckets + an O(hit
  * files) upsert — independent of total table size, which is what makes
  * the rollup maintainable at 100 TB.
  *
  * Bucket schema: `ts` (bucket start), `n_rows`, `v_min`, `v_max`,
  * `v_sum` (DECIMAL(38, 6) — an order-independent exact sum, the
  * engine's cross-engine-hashable convention; a double sum would depend
  * on reduction order). */
object TsRollup {

  /** The rollup's stored schema. */
  def schema: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("n_rows", LongType),
    StructField("v_min", DoubleType),
    StructField("v_max", DoubleType),
    StructField("v_sum", DecimalType(38, 6))))

  private val CursorKey = "rollupSrcVersion"

  /** Create (if needed) and bring the rollup at `dstPath` up to date with
    * `src`. `bucketSeconds` is the bucket width, `valueCol` the source
    * column aggregated. Returns the rollup handle; a no-change sync
    * commits nothing. */
  def sync(src: TsTable, dstPath: String, bucketSeconds: Long,
           valueCol: String): TsTable = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val spark = src.spark
    val dst = {
      val p = new org.apache.hadoop.fs.Path(dstPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(p, "_ts_schema.json")))
        TsTable.open(spark, dstPath)
      else TsTable.create(spark, dstPath, schema)
    }
    val curV = src.currentVersion.getOrElse(return dst)
    val cursor = dst.latestMeta(CursorKey).map(_.toLong)
    if (cursor.contains(curV)) return dst // already current
    // incremental when the cursor's manifest is still retained; full
    // re-aggregation otherwise (expiry under the cursor) or on first sync
    val changed: DataFrame = cursor match {
      case Some(v) if src.hasVersion(v) && v < curV => src.changesBetween(v, curV)
      case _ => src.toDF
    }
    val span = changed.agg(min(col(src.tsCol)), max(col(src.tsCol))).head
    if (!span.isNullAt(0)) {
      val bucketUs = bucketSeconds * 1000000L
      def us(t: Timestamp) =
        org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
      def ts(u: Long) = Timestamp.from(
        org.apache.spark.sql.catalyst.util.DateTimeUtils.microsToInstant(u))
      val lo = Math.floorDiv(us(span.getAs[Timestamp](0)), bucketUs) * bucketUs
      val hi = Math.floorDiv(us(span.getAs[Timestamp](1)), bucketUs) * bucketUs +
        bucketUs - 1L
      // whole affected buckets re-aggregate FROM THE SOURCE (a partial
      // bucket cannot be patched from the delta alone)
      // integer `div` keeps the bucket boundary µs-exact (a double
      // division at 1e15 µs can land a boundary instant one ulp off);
      // div truncates toward zero = floor for the post-1970 instants
      // this format stores
      val agg = src.readRange(ts(lo), ts(hi))
        .groupBy(timestamp_micros(
          expr(s"(unix_micros(${src.tsCol}) div ${bucketUs}L) * ${bucketUs}L"))
          .as("ts"))
        .agg(count(lit(1)).as("n_rows"),
          min(col(valueCol)).as("v_min"),
          max(col(valueCol)).as("v_max"),
          sum(col(valueCol).cast(DecimalType(38, 6))).as("v_sum"))
        .select(col("ts"), col("n_rows"), col("v_min"), col("v_max"),
          col("v_sum").cast(DecimalType(38, 6)).as("v_sum"))
      dst.mergeInto(agg, keys = Seq("ts"))
    }
    // advance the cursor even for row-free syncs (maintenance-only
    // source commits): a metadata-only "rollup" version
    dst.commitVersion("rollup", meta = Map(CursorKey -> curV.toString))
    TsTable.open(spark, dstPath)
  }
}
