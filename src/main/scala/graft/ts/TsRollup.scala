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
  *   - an append-only sync window reads ONLY what changed:
  *     `changesBetween(cursor, now)` names the appended rows
  *     (metadata-only diff), their ts span — aligned out to bucket
  *     boundaries — bounds ONE `readRange` over the source, and the
  *     re-aggregated buckets UPSERT into the rollup via `mergeInto`
  *     (partial buckets recompute, brand-new buckets insert, backfilled
  *     days land in the rollup's past, which `append` could not do);
  *   - a sync window containing a REWRITE verb (`deleteWhere` /
  *     `updateWhere` / `mergeInto` / retention / `restore` / overwrite)
  *     stays incremental too: the affected ts span comes from MANIFEST
  *     METADATA (the per-file spans of every file the rewrite added or
  *     removed — no data read), the span's rollup buckets clear via
  *     `deleteWhere` (so a bucket the rewrite EMPTIED disappears instead
  *     of going stale), and the span re-aggregates from the source in one
  *     bounded range read. Content-preserving maintenance (`compact` /
  *     `evolve` / `constraint` / `clone`) is skipped entirely;
  *   - an expired cursor (source history reclaimed under it), or a
  *     rewrite of files whose manifests carry no span stats, degrades to
  *     one full re-aggregation — never to silent staleness.
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

  private val AppendFamily = Set("create", "append", "backfill")
  // verbs that cannot change served row content; "rollup" is the cursor
  // commit of a rollup table used as a source itself
  private val ContentPreserving =
    Set("compact", "evolve", "constraint", "clone", "rollup")

  /** Create (if needed) and bring the rollup at `dstPath` up to date with
    * `src`. `bucketSeconds` is the bucket width, `valueCol` the source
    * column aggregated. Returns the rollup handle; a no-change sync
    * commits nothing.
    *
    * Conflict contract: a sync racing rewrites — of the SOURCE window it
    * is reading (deleteWhere / compact swapping files mid-`readRange`) or
    * of the ROLLUP itself (another sync or writer tripping the verbs'
    * commit gate) — retries internally on the engine's two retryable
    * shapes (`ConcurrentRewriteException`; a missing-file read under
    * either table's root, the documented swap-read race) and converges,
    * because every step is idempotent toward the target state: the span
    * clear is a predicate delete, the re-fill a keyed upsert, and the
    * cursor commit comes last — a retry simply re-reads the now-current
    * source version and re-derives the span. Bounded at [[MaxAttempts]];
    * a loss beyond that rethrows the last failure (nothing stale was
    * committed: the cursor only advances on full success). */
  def sync(src: TsTable, dstPath: String, bucketSeconds: Long,
           valueCol: String): TsTable = {
    var attempts = 0
    while (true) {
      attempts += 1
      try return syncOnce(src, dstPath, bucketSeconds, valueCol)
      catch {
        case _: TsTable.ConcurrentRewriteException
            if attempts < MaxAttempts => ()
        case e: Throwable if attempts < MaxAttempts &&
            TsTable.missingFileUnder(e, Seq(src.path, dstPath), Nil) => ()
        // the pinned source version expired mid-sync (aggressive
        // keepLast / auto-expire racing a slow sync): re-resolve — the
        // retry pins the now-current version, or full-rebuilds when the
        // cursor itself expired
        case e: IllegalArgumentException if attempts < MaxAttempts &&
            Option(e.getMessage).exists(_.contains("no snapshot version")) => ()
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private val MaxAttempts = 8

  private def syncOnce(src: TsTable, dstPath: String, bucketSeconds: Long,
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
    // Every data read below is PINNED to curV's snapshot, never the live
    // tree: a live listing caught inside a concurrent rewrite's swap
    // window (originals archived, replacements not yet moved in) serves
    // NEITHER generation of the affected files — the re-aggregated span
    // would silently lose those rows, the clear-first delete would erase
    // the bucket, and the advanced cursor would never look back (raced in
    // TsRollupSpec). The pinned manifest resolves each file live-first-
    // then-archive with a size guard, so a mid-read swap is either
    // invisible or LOUD (retryable) — never silently narrower. This also
    // makes the cursor exact: the rollup IS the aggregate of version
    // curV, not of whatever live state the read happened to catch.
    val pinned = src.openAt(curV)
    val bucketUs = bucketSeconds * 1000000L
    def us(t: Timestamp) =
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    def ts(u: Long) = Timestamp.from(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.microsToInstant(u))
    // integer `div` keeps the bucket boundary µs-exact (a double division
    // at 1e15 µs can land a boundary instant one ulp off); div truncates
    // toward zero = floor for the post-1970 instants this format stores
    def bucketAgg(rows: DataFrame): DataFrame = rows
      .groupBy(timestamp_micros(
        expr(s"(unix_micros(${src.tsCol}) div ${bucketUs}L) * ${bucketUs}L"))
        .as("ts"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"),
        sum(col(valueCol).cast(DecimalType(38, 6))).as("v_sum"))
      .select(col("ts"), col("n_rows"), col("v_min"), col("v_max"),
        col("v_sum").cast(DecimalType(38, 6)).as("v_sum"))
    // re-aggregate the µs span [sLo, sHi] from the source, after clearing
    // the span's buckets when a rewrite may have shrunk or emptied them
    def syncSpan(sLo: Long, sHi: Long, clearFirst: Boolean): Unit = {
      val blo = Math.floorDiv(sLo, bucketUs) * bucketUs
      val bhi = Math.floorDiv(sHi, bucketUs) * bucketUs + bucketUs - 1L
      if (clearFirst)
        dst.deleteWhere(col("ts").between(ts(blo), ts(bhi)))
      val agg = bucketAgg(pinned.readRange(ts(blo), ts(bhi)))
      dst.mergeInto(agg, keys = Seq("ts"))
      ()
    }
    val incremental = cursor.exists(v => src.hasVersion(v) && v < curV)
    if (incremental) {
      val v0 = cursor.get
      val manifests = (v0 to curV)
        .map(x => x -> TsTable.readManifest(spark, src.path, x)).toMap
      val changing = ((v0 + 1) to curV)
        .filterNot(x => ContentPreserving(manifests(x).action))
      val hasRewrite = changing.exists(x => !AppendFamily(manifests(x).action))
      if (!hasRewrite) {
        // append-only window: the span of the appended rows comes from
        // MANIFEST METADATA — the union of the added files' recorded
        // per-file ts spans, which are exact footer min/max (the same
        // source the rewrite branch below already trusts) — so the
        // steady-state sync reads no data at all to find its window.
        // A span-less added file (foreign encoding, pre-stats manifest)
        // falls back to the classic bounded read of the changed rows —
        // one job, never staleness. Identical sync result either way:
        // both spans cover exactly the appended rows.
        var lo = Long.MaxValue; var hi = Long.MinValue; var unknown = false
        changing.foreach { x =>
          val m = manifests(x); val prev = manifests(x - 1)
          val prevSet = prev.files.map(_._1).toSet
          m.files.filterNot(f => prevSet(f._1)).foreach { f =>
            m.stats.get(f._1) match {
              case Some((a, b)) => lo = lo.min(a); hi = hi.max(b)
              case None => unknown = true
            }
          }
        }
        if (unknown) {
          val changed = src.changesBetween(v0, curV)
          val span = changed.agg(min(col(src.tsCol)), max(col(src.tsCol))).head
          if (!span.isNullAt(0))
            syncSpan(us(span.getAs[Timestamp](0)), us(span.getAs[Timestamp](1)),
              clearFirst = false)
        } else if (lo <= hi) syncSpan(lo, hi, clearFirst = false)
        // lo > hi: every changing version added no files — nothing to sync
      } else {
        // rewrite window: the affected span is the union of the manifest
        // span stats of every file a changing version added or removed —
        // metadata only, no data read. A changed file WITHOUT span stats
        // (foreign encoding, pre-stats manifest) makes the span unknowable
        // cheaply → full rebuild, never staleness.
        var lo = Long.MaxValue; var hi = Long.MinValue; var unknown = false
        changing.foreach { x =>
          val m = manifests(x); val prev = manifests(x - 1)
          val prevSet = prev.files.map(_._1).toSet
          val curSet = m.files.map(_._1).toSet
          def absorb(stats: Map[String, (Long, Long)], rel: String): Unit =
            stats.get(rel) match {
              case Some((a, b)) => lo = lo.min(a); hi = hi.max(b)
              case None => unknown = true
            }
          m.files.filterNot(f => prevSet(f._1)).foreach(f => absorb(m.stats, f._1))
          prev.files.filterNot(f => curSet(f._1)).foreach(f => absorb(prev.stats, f._1))
        }
        if (unknown) fullRebuild(dst, bucketAgg(pinned.toDF))
        else if (lo <= hi) syncSpan(lo, hi, clearFirst = true)
        // lo > hi: every changing version was a no-file-change commit
      }
    } else {
      fullRebuild(dst, bucketAgg(pinned.toDF))
    }
    // advance the cursor even for row-free syncs (maintenance-only
    // source commits): a metadata-only "rollup" version
    dst.commitVersion("rollup", meta = Map(CursorKey -> curV.toString))
    TsTable.open(spark, dstPath)
  }

  /** Clear-and-reaggregate: the expired-cursor / unknown-span fallback.
    * The clear is a predicate delete (empty-hit fast path on a fresh
    * rollup), the re-fill an all-insert merge — both archive-not-delete,
    * so a pre-rebuild pin of the rollup still serves its old buckets. */
  private def fullRebuild(dst: TsTable, agg: DataFrame): Unit = {
    dst.deleteWhere(lit(true))
    dst.mergeInto(agg, keys = Seq("ts"))
    ()
  }
}
