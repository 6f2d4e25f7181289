package graft.operators

import graft.Tables
import graft.ts.{TsRollup, TsTable, TsWriteOptions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Time-series operators: the reference's own surface (read_range, min/max,
  * ordered append — afiedler/tstables `tstables/tstable.py`, see SURVEY.md §2
  * Part A) over the `events` table.
  *
  * Scale notes: every query here is shuffle-free or single-shuffle; range
  * reads are partition-pruned + parquet-stat-pruned (the distributed analogue
  * of the reference's bisect-into-sorted-HDF5-chunks read path).
  */
object TimeSeriesPack extends QueryPack {

  // Closed-interval flagship range (events span 2024-01-01 → 2024-01-30 UTC).
  private val RangeLo = "2024-01-05 00:00:00"
  private val RangeHi = "2024-01-12 00:00:00"

  private def ts(lit0: String): Timestamp = Timestamp.valueOf(lit0)

  /** Canonical deterministic projection of events rows: raw timestamps are
    * emitted as epoch micros (events.ts is physically ns but carries only µs
    * resolution — SURVEY.md §1.4.4). */
  private def eventsProjection(df: DataFrame): DataFrame =
    df.select(
      col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
      col("event_type"), col("value"), col("props"))
      .orderBy(col("event_id"))

  private val eventsProjectionSql =
    "event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props"

  /** A4 read_range: time-range query, closed interval [lo, hi]. */
  def readRange(s: SparkSession, dir: String): DataFrame =
    eventsProjection(
      Tables.events(s, dir)
        .where(col("ts").between(lit(RangeLo).cast("timestamp"),
          lit(RangeHi).cast("timestamp"))))

  /** A5 min_dt / max_dt (+ total count) over the raw (non-TsTable) events
    * parquet: a plain full-table agg, as the count() forces a scan anyway.
    * The O(one-edge-partition) reference contract lives in
    * `TsTable.minDt/maxDt` (edge p_date directory pruning — asserted in
    * TsTableSpec), which is also what the append guard calls. */
  def minMaxDt(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).agg(
      unix_micros(min(col("ts"))).as("min_ts_us"),
      unix_micros(max(col("ts"))).as("max_ts_us"),
      count(lit(1)).as("n"))

  /** A3+A4 round-trip through a real TsTable store: events → two ordered
    * appends into a fresh daily-partitioned store → readRange back out.
    * The oracle is the same range read on the raw events table, so this
    * hash-checks the storage layer end-to-end (partition split, sort,
    * schema persistence, closed-interval read). */
  def appendRoundtrip(s: SparkSession, dir: String): DataFrame = {
    // Deterministic per-input store path under the (configurable) scratch
    // root, wiped before reuse — the result DataFrame is lazy so the store
    // has to outlive this call (the driver materializes it later). See
    // StoreDirs for the cluster story (spark.graft.store.dir).
    val store = StoreDirs.scratch(s, s"graft_tstable_rt_${StoreDirs.pathKey(dir)}")
    val ev = Tables.events(s, dir)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cutoff))
    t.append(ev.where(col("ts") >= cutoff))
    eventsProjection(
      TsTable.open(s, store) // reopen: schema comes from the stored descriptor
        .readRange(ts("2024-01-08 00:00:00"), ts("2024-01-22 00:00:00")))
  }

  /** A3+A4 through the `graft-ts` DataSource V2 connector (the path a user
    * who never touches the TsTable facade takes): events up to 2024-01-10 →
    * two `df.write.format("graft-ts").mode("append")` jobs (the second
    * exercises the stored-max guard against real data) → a closed-interval
    * ts-range read through `spark.read.format("graft-ts")`, where the
    * connector derives day-partition pruning from the ts predicate alone
    * (GraftTsSourceSpec asserts the plan shape; this key hash-checks the
    * values end-to-end against the raw events oracle). */
  def v2Roundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsv2_rt_${StoreDirs.pathKey(dir)}")
    val ev = Tables.events(s, dir).where(col("ts") < lit("2024-01-10 00:00:00").cast("timestamp"))
    TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cutoff = lit("2024-01-05 00:00:00").cast("timestamp")
    ev.where(col("ts") < cutoff).write.format("graft-ts").mode("append").save(store)
    ev.where(col("ts") >= cutoff).write.format("graft-ts").mode("append").save(store)
    eventsProjection(
      s.read.format("graft-ts").load(store)
        .where(col("ts").between(
          lit("2024-01-03 00:00:00").cast("timestamp"),
          lit("2024-01-08 00:00:00").cast("timestamp"))))
  }

  /** A3+ maintenance round-trip: 2 days of events land via three ordered
    * appends whose cut points fall MID-day (so each day accumulates two
    * files — the small-files pattern a streaming sink produces), then
    * `compactAll(1)` rewrites each multi-file day to one ts-sorted file, and
    * the full range reads back out. The oracle is the same slice of raw
    * events, so this hash-checks that compaction is content-preserving
    * end-to-end; file-count/sortedness/pruning mechanics are asserted in
    * TsTableSpec. */
  def compactRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tscompact_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-03 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut1 = lit("2024-01-01 12:00:00").cast("timestamp")
    val cut2 = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut1))
    t.append(ev.where(col("ts") >= cut1 && col("ts") < cut2))
    t.append(ev.where(col("ts") >= cut2))
    t.compactAll(targetFiles = 1)
    eventsProjection(
      TsTable.open(s, store)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")))
  }

  /** A3+ retention round-trip: four days of events land, `dropBefore`
    * expires the oldest two day-partitions (O(#days) metadata deletes —
    * the operation the daily layout exists to make cheap: no rewrite, no
    * scan), and the FULL original range reads back. The oracle is the raw
    * events at-or-after the cutoff day, so this hash-checks that
    * retention removes exactly the expired days and nothing else;
    * partition-file mechanics and append-guard survival are asserted in
    * CompactSpec. Completes the ORACLED storage lifecycle:
    * create → append → read → compact → expire. */
  def retentionRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsretain_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    t.append(ev)
    t.dropBefore("2024-01-03")
    eventsProjection(
      TsTable.open(s, store)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
  }

  /** A3+ snapshot/time-travel round-trip — the isolation contract on top of
    * the storage lifecycle: four days land in two appends, the version is
    * PINNED, then compaction rewrites a day and retention expires the two
    * oldest days — and the pinned read still returns the full pre-mutation
    * range, byte-for-byte, because the maintenance verbs archive replaced
    * files instead of deleting them and the manifest resolves through the
    * archive. The oracle is the raw pre-mutation slice, so this hash-checks
    * time travel end-to-end (manifest commit → archive resolution → pruned
    * pinned read); version accounting, schema-per-version, expiry, and the
    * integrity guard are asserted in SnapshotSpec. */
  def snapshotRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tssnap_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    val pinned = t.currentVersion.get
    t.compactAll(targetFiles = 1) // rewrites the cut day
    t.dropBefore("2024-01-03")    // expires the two oldest days
    eventsProjection(
      t.readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00"),
        asOf = pinned))
  }

  /** A7+ mutation-history report (`TsTable.history`) over the
    * q_ts_snapshot lifecycle: create → two appends cut mid-day →
    * compactAll → retention, one row per committed version with its
    * action and live-file count. File counts are deterministic under
    * filesPerDay = 1 (one file per day PER APPEND), so the whole report
    * is oracle-checkable: the oracle derives each version's count from
    * the events table — files = Σ over days of appends-touching-that-day,
    * compaction collapses every multi-file day to one, retention keeps
    * the at-or-after-cutoff days. Bytes are reported by the API but not
    * emitted (compression-detail dependent — the q_ts_stats rule). The
    * fixture's single mid-day cut makes exactly ONE day multi-file, so
    * the lifecycle commits exactly 5 versions. */
  def tsHistory(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tshist_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    t.compactAll(targetFiles = 1)
    t.dropBefore("2024-01-03")
    t.history.select(col("version"), col("action"), col("n_files"))
      .orderBy(col("version"))
  }

  /** A3+ rollback round-trip (`TsTable.restore` — the Delta RESTORE
    * analogue): four days land and the version is pinned, then the store
    * is damaged three ways (a fifth-day append, a compaction rewrite, an
    * over-eager retention that drops half the table) and restored to the
    * pin — after which the LIVE full-range read returns the pre-damage
    * slice byte-for-byte. The oracle is that slice on raw events, so this
    * hash-checks archive→live copy-back, live-file retirement, and the
    * forward "restore" commit end-to-end; history/pinnability/append
    * re-anchoring mechanics are asserted in SnapshotSpec. */
  def restoreRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsrestore_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    val pinned = t.currentVersion.get
    // damage: extra day, rewritten files, dropped days
    t.append(Tables.events(s, dir).where(col("ts") >= hi &&
      col("ts") < lit("2024-01-06 00:00:00").cast("timestamp")))
    t.compactAll(targetFiles = 1)
    t.dropBefore("2024-01-03")
    t.restore(pinned)
    eventsProjection(
      TsTable.open(s, store)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
  }

  /** B1+ the SQL-procedure surface, oracle-checked: the restore fixture's
    * lifecycle (build → pin → damage with a fifth-day append + compact +
    * retention), but the mistake-recovery verb runs as
    * `CALL graft_ts.system.restore(...)` — the Iceberg-style maintenance
    * face — followed by a `CALL ... compact` to prove the procedures
    * chain. The full-range read must equal the pre-damage slice, the same
    * oracle as q_ts_restore; per-procedure reports and expire_snapshots
    * are asserted in GraftTsProceduresSpec. */
  def sqlCallRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tscall_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    val pinned = t.currentVersion.get
    t.append(Tables.events(s, dir).where(col("ts") >= hi &&
      col("ts") < lit("2024-01-06 00:00:00").cast("timestamp")))
    t.compactAll(targetFiles = 1)
    t.dropBefore("2024-01-03")
    s.sql(s"CALL graft_ts.system.restore(`table` => '$store', version => $pinned)")
    s.sql(s"CALL graft_ts.system.compact(`table` => '$store')")
    eventsProjection(
      TsTable.open(s, store)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
  }

  /** A3+ CHECK-constraint round-trip (`TsTable.addCheck` — the ingest
    * quality gate): a constrained store accepts two clean appends,
    * REJECTS a third whose rows violate (nothing lands, no version
    * commits), rejects an update that would redact a value into
    * violation, then accepts a compliant update. The oracle is the clean
    * slice with the compliant update applied — hash-checking that the
    * gate blocked exactly the bad writes and admitted the good ones.
    * NULL-passes semantics, per-row V2 INSERT enforcement, descriptor
    * persistence, and dropCheck are asserted in TsCheckSpec. */
  def constraintRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tscheck_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t0 = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val t = t0.addCheck("typed", "event_type IS NOT NULL")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    // a poisoned batch: day-5 rows with event_type nulled out → rejected
    val poisoned = Tables.events(s, dir)
      .where(col("ts") >= hi &&
        col("ts") < lit("2024-01-06 00:00:00").cast("timestamp"))
      .withColumn("event_type",
        when(col("user_id") % 2 === 0, lit(null).cast("string"))
          .otherwise(col("event_type")))
    val rejected =
      try { t.append(poisoned); false }
      catch { case _: IllegalArgumentException => true }
    require(rejected, "q_ts_constraint: the poisoned append must be rejected")
    // an update into violation → rejected; a compliant one → applied
    val bad =
      try {
        t.updateWhere(col("user_id") % 9 === 4,
          Map("event_type" -> lit(null).cast("string")))
        false
      } catch { case _: IllegalArgumentException => true }
    require(bad, "q_ts_constraint: the violating update must be rejected")
    t.updateWhere(
      col("user_id") % 9 === 4 &&
        col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"),
      Map("event_type" -> lit("audited")))
    eventsProjection(
      TsTable.open(s, store)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
  }

  /** A3+ row-level delete round-trip (`TsTable.deleteWhere` — the
    * `DELETE FROM t WHERE …` verb, the GDPR/bad-producer operation the
    * snapshot lifecycle was missing): four days land in two appends, then
    * a copy-on-write delete removes a modulo-selected user cohort's rows
    * inside a mid-range two-day window, and the FULL range reads back.
    * The oracle applies the complementary predicate to raw events, so
    * this hash-checks hit-file pruning, survivor rewrite, the swap, and
    * the "delete" version commit end-to-end; the empty-hit fast path,
    * pre-delete pin survival, untouched-file stability, and SQL
    * null-predicate semantics are asserted in TsTableSpec. */
  def deleteRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsdelete_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    t.deleteWhere(col("user_id") % 7 === 3 &&
      col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
      col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"))
    eventsProjection(
      TsTable.open(s, store)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
  }

  /** A3+ incremental-read round-trip (`TsTable.changesBetween` — the CDF
    * "what arrived since the last training run" verb): a first batch lands
    * and its version is the consumer's checkpoint; a second batch lands, a
    * compaction rewrites the cut day (archiving one of the new batch's
    * files — the diff must resolve it through the archive), and a third
    * batch lands. `changesBetween(checkpoint, current)` must return
    * exactly batches 2+3: appends are file-additive so the metadata-only
    * manifest diff identifies the added files, and the compact version in
    * between contributes nothing. The oracle is the raw events at-or-after
    * the first cut, hash-checking the whole chain; no-false-adds across
    * maintenance and full-history equivalence are asserted in
    * SnapshotSpec. */
  def changesRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tschanges_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut1 = lit("2024-01-02 12:00:00").cast("timestamp")
    val cut2 = lit("2024-01-03 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut1))
    val checkpoint = t.currentVersion.get
    t.append(ev.where(col("ts") >= cut1 && col("ts") < cut2))
    t.compactAll(targetFiles = 1) // rewrites the two cut days
    t.append(ev.where(col("ts") >= cut2))
    eventsProjection(t.changesBetween(checkpoint, t.currentVersion.get))
  }

  /** A3+ row-level change-feed round-trip (`TsTable.changeFeed` — the
    * full CDF verb, [[changesRoundtrip]]'s row-level sibling): from a
    * checkpoint after batch 1, a second batch lands (insert-only
    * version), a copy-on-write DELETE removes a cohort's mid-range rows,
    * and a copy-on-write UPDATE doubles another cohort's values.
    * `changeFeed(checkpoint, current)` must reconstruct all three: batch
    * 2 as `insert`s, the deleted rows as `delete`s, and the update as
    * pre-image `delete` / post-image `insert` PAIRS at one version — the
    * diff-based (Iceberg-changelog-style) feed derived from archived
    * originals vs replacement files, with rewritten-but-unchanged
    * survivor rows cancelling exactly under `EXCEPT ALL`. The oracle
    * replays the verbs relationally (versions surface as deltas from the
    * checkpoint so the oracle never hardcodes absolute version numbers);
    * empty ranges, maintenance silence, and merge feeds are asserted in
    * SnapshotSpec. */
  def cdfRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tscdf_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    val checkpoint = t.currentVersion.get
    t.append(ev.where(col("ts") >= cut))
    t.deleteWhere(col("user_id") % 7 === 3 &&
      col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
      col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"))
    t.updateWhere(col("user_id") % 5 === 1 &&
        col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"),
      Map("value" -> (col("value") * 2)))
    t.changeFeed(checkpoint, t.currentVersion.get)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"),
        col("_change_type").as("change_type"),
        (col("_commit_version") - checkpoint).as("delta_v"))
      .orderBy(col("delta_v"), col("change_type"), col("event_id"))
  }

  // Query rectangle as FRACTIONS of each dimension's [min, max] span —
  // the fixture's user_id domain scales with SF, so absolute bounds
  // would select nothing at one scale and everything at another. Both
  // engines derive the same double bounds from the same min/max with the
  // same IEEE ops, so the predicate is exactly replayable.
  private[operators] val ZxFrac = (0.2, 0.45)
  private[operators] val ZyFrac = (0.1, 0.4)

  /** B1+ Z-ORDER clustered layout + rectangle query (see [[ZOrderLayout]]):
    * the events copy is laid out along a Morton curve over
    * (user_id, value), buckets become partition directories, and the
    * rectangle predicate prunes to the buckets whose decoded bounding box
    * intersects — file-listing-level skipping on a TWO-dimensional
    * predicate, which no single-column sort can give. Build is amortized
    * via the input fingerprint (the q_sim_ivf ledger); results are
    * byte-identical to the unclustered scan, so the oracle is the plain
    * rectangle SQL on `events`. Bucket-pruning (numFiles < total) and
    * box-decode soundness are asserted in ZOrderSpec. */
  def zorderRect(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.stable(s, s"graft_zorder_${StoreDirs.pathKey(dir)}")
    val fp = IvfIndex.inputFingerprint(s, s"$dir/events.parquet")
    ZOrderLayout.buildIfNeeded(
      Tables.events(s, dir).select(col("event_id"), col("user_id"),
        col("value"), col("ts")),
      "user_id", "value", store, fp)
    val m = ZOrderLayout.readMeta(s, store)
    ZOrderLayout.queryRect(s, store, "user_id", "value",
      m.xMin + ZxFrac._1 * (m.xMax - m.xMin),
      m.xMin + ZxFrac._2 * (m.xMax - m.xMin),
      m.yMin + ZyFrac._1 * (m.yMax - m.yMin),
      m.yMin + ZyFrac._2 * (m.yMax - m.yMin))
      .select(col("event_id"), col("user_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy(col("event_id"))
  }

  /** A3+ row-level update round-trip (`TsTable.updateWhere` — the
    * redaction/correction verb, `deleteWhere`'s sibling): four days land,
    * then a copy-on-write update redacts a modulo-selected cohort's
    * `props` and zeroes its `value` inside a mid-range window, and the
    * FULL range reads back. The oracle replays the assignment as CASE
    * WHEN over raw events, hash-checking hit-file pruning, the
    * conditional rewrite (non-hit rows byte-identical), the swap, and
    * the "update" version commit; pin survival, row-expression
    * semantics, and the ts-assignment refusal are asserted in
    * TsTableSpec. */
  def updateRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsupdate_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    t.updateWhere(
      col("user_id") % 5 === 1 &&
        col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"),
      Map("props" -> lit("""{"redacted":true}"""),
        "value" -> lit(0.0)))
    eventsProjection(
      TsTable.open(s, store)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
  }

  /** A3+ upsert round-trip (`TsTable.mergeInto` — the `MERGE INTO` verb,
    * completing the DML triple): four days land in two appends, then ONE
    * merge both corrects a cohort (matched rows: value doubled, props
    * redacted — the source also carries user_id/event_type unchanged,
    * exercising the default all-source-columns update set) and BACKFILLS
    * day-5 events shifted 72 h into the table's past — inserts a
    * monotonic `append` would reject. The oracle replays the matched side
    * as a LEFT JOIN + CASE and the insert side as a UNION ALL, so the
    * hash checks key semi-join hit pruning, the joined conditional
    * rewrite, backfill placement into existing day partitions, and the
    * single "merge" commit end-to-end. Cardinality rejection, update-only
    * /insert-only modes, pin survival, and null-ts insert rejection are
    * asserted in TsTableSpec. */
  def mergeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsmerge_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    val updSrc = ev.where(col("user_id") % 6 === 2 &&
        col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value") * 2).as("value"),
        lit("""{"corrected":true}""").as("props"))
    val insSrc = Tables.events(s, dir)
      .where(col("ts") >= hi &&
        col("ts") < lit("2024-01-06 00:00:00").cast("timestamp"))
      .select(col("event_id"),
        (col("ts") - expr("INTERVAL 72 HOURS")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    t.mergeInto(updSrc.unionByName(insSrc), keys = Seq("event_id"))
    eventsProjection(
      TsTable.open(s, store)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
  }

  /** B1+ incrementally-synced rollup (`TsRollup.sync` — the materialized
    * hourly aggregate a dashboard serves instead of raw events): the
    * source lands in TWO appends with a sync after each — the cut splits
    * an hour bucket, so the partial-bucket recompute path
    * runs, and each sync's read is bounded by the changed span (cursor in
    * the rollup's own commit log, changesBetween + mergeInto underneath).
    * The final rollup must hash-match the full per-hour aggregate
    * computed directly on raw events. Cursor semantics, no-change
    * no-commit, and the expired-cursor full rebuild are asserted in
    * TsRollupSpec. */
  def rollupRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsroll_src_${StoreDirs.pathKey(dir)}")
    val roll = StoreDirs.scratch(s, s"graft_tsroll_dst_${StoreDirs.pathKey(dir)}")
    // two days and two appends carry the whole story — the cut splits an
    // hour bucket mid-way (partial-bucket recompute arm) and the second
    // sync is incremental (cursor arm); more days/syncs only fatten the
    // per-rep store build the bench pays, the q_ts_hour_compact trim rule
    val hi = lit("2024-01-03 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut1 = lit("2024-01-01 12:30:00").cast("timestamp") // mid-bucket
    t.append(ev.where(col("ts") < cut1))
    TsRollup.sync(t, roll, 3600L, "value")
    t.append(ev.where(col("ts") >= cut1))
    TsRollup.sync(t, roll, 3600L, "value")
    TsTable.open(s, roll).toDF
      .select(unix_micros(col("ts")).as("ts_us"), col("n_rows"),
        col("v_min"), col("v_max"), col("v_sum").cast("double").as("v_sum"))
      .orderBy(col("ts_us"))
  }

  /** A3+ rollup sync across DML ([[rollupRoundtrip]]'s rewrite-window
    * sibling): after the appends sync, a copy-on-write DELETE removes a
    * cohort and an UPDATE rescales another, and the next sync must leave
    * the rollup equal to the direct aggregate of the FINAL table state —
    * shrunk buckets recompute, emptied buckets disappear, and the sync
    * stays incremental (the affected span comes from manifest span
    * metadata, cleared via `deleteWhere` and re-aggregated in one bounded
    * range read — TsRollupSpec asserts the mechanics; this key
    * hash-checks the arithmetic end-to-end against DuckDB). */
  def rollupDmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsrolldml_src_${StoreDirs.pathKey(dir)}")
    val roll = StoreDirs.scratch(s, s"graft_tsrolldml_dst_${StoreDirs.pathKey(dir)}")
    // two days keep every lifecycle arm (append-sync, rewrite-sync via a
    // cross-day DELETE, partial-day UPDATE) at half the store-build cost
    val hi = lit("2024-01-03 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-01 12:30:00").cast("timestamp") // mid-bucket
    t.append(ev.where(col("ts") < cut))
    TsRollup.sync(t, roll, 3600L, "value")
    t.append(ev.where(col("ts") >= cut))
    TsRollup.sync(t, roll, 3600L, "value")
    t.deleteWhere(col("user_id") % 7 === 3 &&
      col("ts") >= lit("2024-01-01 12:00:00").cast("timestamp") &&
      col("ts") < lit("2024-01-02 12:00:00").cast("timestamp"))
    t.updateWhere(col("user_id") % 5 === 1 &&
        col("ts") < lit("2024-01-02 00:00:00").cast("timestamp"),
      Map("value" -> (col("value") * 2)))
    TsRollup.sync(t, roll, 3600L, "value")
    TsTable.open(s, roll).toDF
      .select(unix_micros(col("ts")).as("ts_us"), col("n_rows"),
        col("v_min"), col("v_max"), col("v_sum").cast("double").as("v_sum"))
      .orderBy(col("ts_us"))
  }

  /** B5+ time-weighted average (TWAP — the irregular-sampling mean the
    * reference's financial domain actually wants; an arithmetic mean
    * over-weights bursts): per (user, day), each sample holds its value
    * until the next sample, so the day's TWAP is Σ(value·Δt)/ΣΔt over
    * consecutive-pair intervals (the last sample holds nothing). One
    * window pass computes the lead timestamps (shuffle on user — day
    * rides along), then a hash aggregate; Σ(value·Δt) is DECIMAL-exact
    * (order-independent), and the single final division is one IEEE op on
    * identically-derived operands, so the double hashes cross-engine. */
  def windowTwap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("d"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("d"),
        unix_micros(col("ts")).as("us"), col("value"), col("event_id"))
      .withColumn("nxt", lead(col("us"), 1).over(w))
      .where(col("nxt").isNotNull)
      .withColumn("dt", col("nxt") - col("us"))
      .groupBy(col("user_id"), col("d"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt")).as("sum_dt_us"),
        // (15,6) × (19,0): exact in both engines — inside Spark's
        // 38-digit cap (a (18,6) × long product would hit it and silently
        // DROP a scale digit), and wide enough that DuckDB runs the
        // multiply in int128 instead of overflowing int64 storage
        sum(col("value").cast("decimal(15,6)") *
          col("dt").cast("decimal(19,0)")).as("vdt"))
      .select(col("user_id"), col("d").as("day"), col("n_intervals"),
        col("sum_dt_us"),
        // the raw double division can differ by an ulp cross-engine (the
        // engines' decimal→double casts round differently at full
        // precision), so the surfaced TWAP quantizes to 6dp — the
        // resample_interp rule. The DECIMAL-exact vdt numerator stays
        // interior only: surfacing it as DECIMAL(38,6) was the r15/r16
        // hash red — the driver's hasher canonicalizes int128-backed
        // wide decimals differently per engine, so no column wider than
        // DECIMAL(18,x) may reach a surfaced schema (Det.scala rule).
        (floor((col("vdt").cast("double") / col("sum_dt_us").cast("double")) *
          lit(1e6) + lit(0.5)) / lit(1e6)).as("twap"))
      .orderBy(col("user_id"), col("day"))
  }

  /** A3+ out-of-order insert round-trip (`TsTable.backfill` — `append`
    * minus the monotonicity guard, the late-data verb): days 1, 3, 4
    * land in order with day 2 SKIPPED — at which point the ordered
    * append can never supply it — then one backfill inserts the missing
    * day plus a slice of extra day-1 rows, and the FULL range reads
    * back. The oracle is the whole four-day slice, hash-checking
    * day-dir creation in the table's past, overlap-tolerant reads, and
    * the file-additive "backfill" commit (whose rows, unlike a merge's,
    * stay visible to changesBetween — asserted in TsTableSpec along with
    * the CHECK gate and empty/null handling). */
  def backfillRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsbackfill_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val d2lo = lit("2024-01-02 00:00:00").cast("timestamp")
    val d2hi = lit("2024-01-03 00:00:00").cast("timestamp")
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    t.append(ev.where(col("ts") < d2lo))
    t.append(ev.where(col("ts") >= d2hi))
    t.backfill(ev.where(col("ts") >= d2lo && col("ts") < d2hi))
    eventsProjection(
      TsTable.open(s, store)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
  }

  /** B1+ runtime file-group pruning ([[graft.sources.GraftTsRuntimeFilteredScan]]
    * — dynamic partition pruning for a table whose partition column is
    * connector-internal): four days of events land in a `bloomCols =
    * user_id` store, then plain declarative SQL — the V2 read equi-joined
    * against a selective broadcast dimension — lets Spark's
    * PartitionPruning rule plant a `dynamicpruning` subquery on the scan,
    * and the materialized join keys prune FILES through the Bloom
    * sidecars before any task launches. No `lookupEq` call, no hint: the
    * user writes the join, the engine reaches lookupEq's I/O shape. The
    * oracle replays the identical join+aggregate in SQL, hash-checking
    * that runtime pruning never drops a matching row; that the pruning
    * HAPPENS (file counts shrink, the filter arrives pre-task) is
    * asserted in GraftTsRuntimeFilterSpec. At 100 TB this is the
    * fact-×-small-dim pattern: the fact side plans only files whose
    * index admits at least one live key. */
  def runtimePruneJoin(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsrtprune_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts",
      writeOptions = TsWriteOptions(bloomCols = Seq("user_id")))
    val cut = lit("2024-01-03 00:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    val fact = s.read.format("graft-ts").load(store)
    // a sparse cohort (~1% of users) from a REAL source, so the selective
    // Filter node survives optimization for the pruning rule to see
    val dim = Tables.events(s, dir).select(col("user_id"))
      .where(col("user_id") % 97 === 3).distinct()
    fact.join(broadcast(dim), Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
      .orderBy(col("user_id"))
  }

  /** B1+ Bloom point lookup (`TsTable.lookupEq` over declared
    * `bloomCols` — the needle-query verb: one cohort's rows out of a
    * table whose files' min/max user-id spans all overlap, so span
    * skipping alone keeps everything): four days land in two appends
    * into a table created with `bloomCols = user_id`, each commit
    * harvesting per-file membership bits into the version sidecar, and
    * the lookup reads only files whose filter might hold a probed id —
    * with the exact IN-predicate re-applied on the survivors. The oracle
    * is the plain `WHERE user_id IN (…)` slice, hash-checking that
    * metadata pruning never drops a matching row; that pruning DOES
    * happen (candidate lists shrink to the owning file), fallbacks, and
    * self-healing are asserted in TsBloomSpec. */
  def pointLookupRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tslookup_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts",
      writeOptions = TsWriteOptions(bloomCols = Seq("user_id")))
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    eventsProjection(
      TsTable.open(s, store).lookupEq("user_id", Seq(3L, 7L, 11L)))
  }

  /** B1+ post-hoc index declaration (`TsTable.declareIndexing` — the
    * `CREATE INDEX` analogue): the store lands UNINDEXED (no statsCols,
    * no bloomCols — the user didn't know their probe column yet), then
    * one `declareIndexing` call backfills per-file value spans AND
    * user_id Bloom bits for every already-live file in a single
    * "indexing" commit (footer reads + one column-pruned scan — never a
    * table rewrite), and the needle probe reads through the fresh index.
    * The oracle is the plain IN-slice: a row wrongly skipped by a
    * backfilled filter hash-mismatches. That the probe actually PRUNES
    * post-declare is TsBloomSpec's assertion. */
  def indexingRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsindexing_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts") // no indexes
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    val indexed = TsTable.open(s, store)
      .declareIndexing(statsCols = Seq("value"), bloomCols = Seq("user_id"))
    eventsProjection(indexed.lookupEq("user_id", Seq(3L, 7L, 11L)))
  }

  /** B1+ pure-DDL column drop round-trip (`TsTable.dropColumns` — the
    * `ALTER TABLE … DROP COLUMNS` verb, `addColumns`'s inverse): four
    * days land carrying `props`, the drop narrows the descriptor
    * WITHOUT touching a data byte (O(metadata) — reads project by name
    * and simply stop materializing the column), and the full range reads
    * back props-less. The oracle is the props-less slice, hash-checking
    * that narrowing loses nothing else; the re-add tombstone, pre-drop
    * pins, CHECK/ts refusals, index-column narrowing, and byte age-out
    * under compaction are asserted in TsDropColumnSpec, the SQL face in
    * GraftTsDmlSpec. */
  /** A-evolution+ pure-DDL column RENAME (`TsTable.renameColumn` — the
    * Delta/Iceberg column-mapping verb, over Spark's parquet field ids):
    * days 1-2 land under `value`, the column renames to `px` mid-history
    * (O(metadata), no rewrite), days 3-4 land under the NEW name — then
    * the full range reads back with `px` serving BOTH generations (the
    * old files' footers still say "value"; field ids map them). A row
    * lost or null-filled across the rename hash-mismatches the oracle,
    * which is the plain slice with `value` aliased `px`. Pinned
    * pre-rename reads, tombstones, and refusals are TsRenameColumnSpec's. */
  def renameColumnRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsrename_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-03 00:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    val renamed = t.renameColumn("value", "px")
    renamed.append(ev.where(col("ts") >= cut).withColumnRenamed("value", "px"))
    TsTable.open(s, store)
      .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("px"), col("props"))
      .orderBy(col("event_id"))
  }

  /** A-evolution+ in-place FIELD-ID MIGRATION (`TsTable.migrateFieldIds`
    * — the upgrade verb for pre-field-id / attached-foreign stores): days
    * 1-2 land as a PLAIN parquet directory (no descriptor, no field ids —
    * the attached-layout contract), the table migrates in place (ONE
    * governed copy-on-write rewrite of exactly the id-less files,
    * committing a content-preserving "migrate" version), renames
    * `value` → `px` (legal only after the migration — rename refuses over
    * by-name files), and days 3-4 append under the new name. The full
    * read must serve BOTH generations under `px` with zero null-fill —
    * the oracle is the plain slice with `value` aliased. Refusal arms,
    * idempotence, and pins are TsRenameColumnSpec's. At 100 TB: discovery
    * is one footer open per live file (distributed), the rewrite touches
    * only id-less bytes. */
  def migrateRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsmigrate_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val cut = lit("2024-01-03 00:00:00").cast("timestamp")
    ev.where(col("ts") < cut).write.parquet(store) // legacy: no ids
    TsTable.open(s, store).migrateFieldIds()
    val renamed = TsTable.open(s, store).renameColumn("value", "px")
    renamed.append(ev.where(col("ts") >= cut).withColumnRenamed("value", "px"))
    TsTable.open(s, store)
      .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("px"), col("props"))
      .orderBy(col("event_id"))
  }

  /** B1+ hour-slot-aware compaction (`compact` on a `fileSpan = "hour"`
    * table): a day fragments across two appends that SPLIT one hour (the
    * streaming-sink shape — two files land in hour 12), then compactAll
    * bin-packs per HOUR slot, not per day, so routine maintenance
    * preserves the sub-day skip index; the already-hour-packed second day
    * is skipped via the manifest's exact spans (metadata-only). The
    * oracle is the split hour's closed-interval slice — a row lost in
    * the hour merge hash-mismatches. Planning claims (≤3-file probes,
    * packed-day no-op) are TsTableSpec's. */
  def hourCompactRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tshourcomp_${StoreDirs.pathKey(dir)}")
    // one day is the whole story (fragment → heal per hour); the
    // packed-day SKIP arm is TsTableSpec's — a second day here would
    // only fatten the store build the bench pays per rep
    val hi = lit("2024-01-02 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts",
      writeOptions = graft.ts.TsWriteOptions(fileSpan = "hour"))
    val cut = lit("2024-01-01 12:30:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    t.compactAll(targetFiles = 1)
    TsTable.open(s, store)
      .readRange(ts("2024-01-01 12:00:00"), ts("2024-01-01 12:59:59"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .orderBy(col("event_id"))
  }

  /** A-evolution+ pure-DDL TYPE WIDENING (`TsTable.widenColumn` — the
    * Delta type-widening verb on the lossless ladder): days 1-2 land
    * with `user_id` as INT and `value` as FLOAT (the narrow encodings a
    * space-conscious producer started with), both columns widen mid-
    * history (O(metadata) — old files keep their narrow bytes; Spark 4's
    * reader-side type promotion serves them), days 3-4 land wide — the
    * full range reads back BIGINT/DOUBLE across both generations. Oracle:
    * the plain slice (fixture user_id IS bigint; float→double promotion
    * of the narrowed values is exact for these magnitudes, replayed by
    * the oracle's CAST chain). Pins, bloom re-harvest, refusals, and
    * restore-across-widen are TsWidenColumnSpec's. */
  def widenColumnRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tswiden_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val narrow = ev
      .withColumn("user_id", col("user_id").cast("int"))
      .withColumn("value", col("value").cast("float"))
    val cut = lit("2024-01-03 00:00:00").cast("timestamp")
    val t = TsTable.create(s, store, narrow.schema, tsCol = "ts")
    t.append(narrow.where(col("ts") < cut))
    val wide = TsTable.open(s, store)
      .widenColumn("user_id", org.apache.spark.sql.types.LongType)
      .widenColumn("value", org.apache.spark.sql.types.DoubleType)
    wide.append(ev.where(col("ts") >= cut)
      .withColumn("value", col("value").cast("float").cast("double")))
    TsTable.open(s, store)
      .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .orderBy(col("event_id"))
  }

  /** B1+ governed z-order re-clustering (`compact(clusterBy = …)` — the
    * Delta `OPTIMIZE … ZORDER BY` verb on this store): two days land
    * ts-sorted in several files each, then re-cluster along the
    * (user_id, value) Morton curve WITHOUT leaving the format — content
    * must survive byte-identically (the oracle is the plain slice), and
    * the rectangle file-skip the re-sort buys is asserted in ZOrderSpec.
    * At 100 TB: one range-shuffled rewrite of the named days, one commit;
    * displaced originals archive for pinned readers. */
  def clusterCompactRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tscluster_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-03 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts",
      writeOptions = graft.ts.TsWriteOptions(statsCols = Seq("user_id", "value")))
    t.append(ev, filesPerDay = 4)
    t.compactAll(targetFiles = 4, clusterBy = Seq("user_id", "value"))
    TsTable.open(s, store)
      .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .orderBy(col("event_id"))
  }

  /** B1+ hour-aligned file slotting (`TsWriteOptions(fileSpan = "hour")`
    * — the sub-day effective-partition knob for secondly data at 100 TB):
    * a two-day append range-slots per distinct hour, and a 1-hour
    * closed-interval readRange returns exactly that hour's rows (the
    * oracle is the hour slice; the strict file-subset PLANNING claim is
    * TsTableSpec's). */
  def hourSpanRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tshour_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-03 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts",
      writeOptions = graft.ts.TsWriteOptions(fileSpan = "hour"))
    t.append(ev)
    TsTable.open(s, store)
      .readRange(ts("2024-01-01 09:00:00"), ts("2024-01-01 09:59:59"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .orderBy(col("event_id"))
  }

  def dropColumnRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsdropcol_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    t.dropColumns(Seq("props"))
    TsTable.open(s, store)
      .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** A3+ SQL MERGE INTO, oracle-checked: exactly q_ts_merge's scenario —
    * corrections for a cohort plus 72-h-shifted day-5 backfill — but
    * driven through `spark.sql("MERGE INTO graft_ts.`store` …")`: the
    * injected GraftDmlRule translates the star-upsert shape onto
    * `TsTable.mergeInto` (ON keys (event_id, ts); star SET/INSERT), so
    * the same oracle hash-checks the whole SQL path. Update-only/
    * insert-only SQL shapes, SQL UPDATE, and the refusal surface are
    * asserted in GraftTsDmlSpec. */
  def sqlMergeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tssqlmerge_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    val updSrc = ev.where(col("user_id") % 6 === 2 &&
        col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value") * 2).as("value"),
        lit("""{"corrected":true}""").as("props"))
    val insSrc = Tables.events(s, dir)
      .where(col("ts") >= hi &&
        col("ts") < lit("2024-01-06 00:00:00").cast("timestamp"))
      .select(col("event_id"),
        (col("ts") - expr("INTERVAL 72 HOURS")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    updSrc.unionByName(insSrc).createOrReplaceTempView("graft_sql_merge_src")
    s.sql(
      s"""MERGE INTO graft_ts.`$store` t USING graft_sql_merge_src s
         |ON t.event_id = s.event_id AND t.ts = s.ts
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    eventsProjection(
      TsTable.open(s, store)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
  }

  /** B10+ the streaming incremental SOURCE, oracle-checked end-to-end —
    * rare for a stream, possible here because `Trigger.AvailableNow`
    * drains deterministically: the q_ts_changes lifecycle (checkpoint
    * after batch 1; batch 2; a compact that archives one of its files;
    * batch 3), then `readStream.format("graft-ts")` with
    * `startingVersion = checkpoint` runs TO COMPLETION into a memory
    * sink, and the drained table must hash-match the same oracle as the
    * batch `changesBetween` — proving version offsets, the
    * maintenance-emits-nothing rule, and archive resolution through the
    * actual streaming engine, not a spec harness. Restart/resume and
    * replay semantics are asserted in TsStreamSpec. */
  def streamChangesRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsstrch_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut1 = lit("2024-01-02 12:00:00").cast("timestamp")
    val cut2 = lit("2024-01-03 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut1))
    val checkpoint = t.currentVersion.get
    t.append(ev.where(col("ts") >= cut1 && col("ts") < cut2))
    t.compactAll(targetFiles = 1)
    t.append(ev.where(col("ts") >= cut2))
    val sink = s"gts_stream_changes_${StoreDirs.pathKey(dir)}"
    val q = s.readStream.format("graft-ts")
      .option("startingVersion", checkpoint.toString).load(store)
      .writeStream.format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    eventsProjection(s.table(sink))
  }

  /** B10+ table-to-table streaming PIPE, oracle-checked: a source store
    * lands three ordered appends, then `readStream.format("graft-ts")`
    * (startingVersion = 0: full replay) flows through
    * `TsStream.appendSink` into a SECOND store under
    * `Trigger.AvailableNow`, and the destination's full-range read must
    * hash-match the original slice — the incremental source and the
    * ordered sink composed end-to-end through the real streaming engine,
    * no test harness in the loop (the CDC mirror shape: replicate a
    * table by tailing its commits). */
  def streamPipeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = StoreDirs.scratch(s, s"graft_tspipe_src_${StoreDirs.pathKey(dir)}")
    val dst = StoreDirs.scratch(s, s"graft_tspipe_dst_${StoreDirs.pathKey(dir)}")
    val ckpt = StoreDirs.scratch(s, s"graft_tspipe_ck_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-03 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, src, ev.schema, tsCol = "ts")
    val cut1 = lit("2024-01-01 12:00:00").cast("timestamp")
    val cut2 = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut1))
    t.append(ev.where(col("ts") >= cut1 && col("ts") < cut2))
    t.append(ev.where(col("ts") >= cut2))
    val dstT = TsTable.create(s, dst, ev.schema, tsCol = "ts")
    val q = graft.streaming.TsStream.appendSink(
        s.readStream.format("graft-ts").option("startingVersion", "0").load(src),
        dstT, ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    eventsProjection(
      TsTable.open(s, dst)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")))
  }

  /** B10+ the NATIVE streaming sink, oracle-checked: q_ts_stream_pipe's
    * CDC-mirror shape, but the destination side is
    * `writeStream.format("graft-ts")` — no `foreachBatch` glue, no table
    * handle on the user side at all; the connector owns ordered append,
    * span-stats commits, and the manifest-stamped (sink id, batch id)
    * exactly-once guard. Drained under `Trigger.AvailableNow`, the
    * destination's full-range read must hash-match the source slice.
    * Replay dedup, restart increments, and mode/partitionBy refusals are
    * asserted in GraftTsSinkSpec. */
  def streamSinkRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = StoreDirs.scratch(s, s"graft_tssink_src_${StoreDirs.pathKey(dir)}")
    val dst = StoreDirs.scratch(s, s"graft_tssink_dst_${StoreDirs.pathKey(dir)}")
    val ckpt = StoreDirs.scratch(s, s"graft_tssink_ck_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-03 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, src, ev.schema, tsCol = "ts")
    val cut1 = lit("2024-01-01 12:00:00").cast("timestamp")
    val cut2 = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut1))
    t.append(ev.where(col("ts") >= cut1 && col("ts") < cut2))
    t.append(ev.where(col("ts") >= cut2))
    TsTable.create(s, dst, ev.schema, tsCol = "ts")
    val q = s.readStream.format("graft-ts")
      .option("startingVersion", "0").load(src)
      .writeStream.format("graft-ts")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
    eventsProjection(
      TsTable.open(s, dst)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")))
  }

  /** A3+ deep-clone round-trip (`TsTable.cloneAt` — the sandbox verb): the
    * restore fixture's lifecycle, but instead of rolling the source back,
    * the pinned pre-damage version is MATERIALIZED as an independent new
    * table (distributed one-task-per-file copy, live + archived sources,
    * fresh v1 "clone" commit) and the clone's full-range read is checked.
    * The oracle is the pre-damage slice, hash-checking resolution→copy→
    * descriptor→read end-to-end; independence from source expiry and
    * mutation is asserted in SnapshotSpec. */
  def cloneRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsclone_${StoreDirs.pathKey(dir)}")
    val dest = StoreDirs.scratch(s, s"graft_tsclonedst_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    val pinned = t.currentVersion.get
    // damage the source: the clone must resolve through the archive
    t.append(Tables.events(s, dir).where(col("ts") >= hi &&
      col("ts") < lit("2024-01-06 00:00:00").cast("timestamp")))
    t.compactAll(targetFiles = 1)
    t.dropBefore("2024-01-03")
    t.cloneAt(pinned, dest)
    eventsProjection(
      TsTable.open(s, dest)
        .readRange(ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
  }

  // third-dimension fractions for the 3-D clustered box (q_zorder_3d)
  private[operators] val ZzFrac = (0.15, 0.6)

  /** B1+ THREE-dimensional z-order (ZOrderLayout.buildN/queryBox): events
    * clustered along a k = 3 Morton curve over (user_id, value,
    * event_id) — 64 bucket directories, 2 prefix bits per dimension — so
    * a 3-predicate box prunes at the file-listing level on ALL three
    * columns, which neither a sort nor the 2-D layout can give the third
    * predicate. Same conservativeness contract as q_zorder_cluster
    * (bucket pruning + exact re-filter ⇒ byte-identical to the plain
    * scan), so the oracle is the plain 3-predicate SQL; 3-D pruning and
    * k = 3/4 box-tiling are asserted in ZOrderSpec/ZOrderProps. */
  def zorderBox3(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.stable(s, s"graft_zorder3_${StoreDirs.pathKey(dir)}")
    val fp = IvfIndex.inputFingerprint(s, s"$dir/events.parquet")
    val cols = Seq("user_id", "value", "event_id")
    ZOrderLayout.buildIfNeededN(
      Tables.events(s, dir).select(col("event_id"), col("user_id"),
        col("value"), col("ts")),
      cols, store, fp)
    val m = ZOrderLayout.readMetaN(s, store)
    def at(j: Int, f: Double) =
      m.bounds(j)._1 + f * (m.bounds(j)._2 - m.bounds(j)._1)
    ZOrderLayout.queryBox(s, store, cols,
      Seq(at(0, ZxFrac._1), at(1, ZyFrac._1), at(2, ZzFrac._1)),
      Seq(at(0, ZxFrac._2), at(1, ZyFrac._2), at(2, ZzFrac._2)))
      .select(col("event_id"), col("user_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy(col("event_id"))
  }

  /** A3+ SQL-face time travel through the catalog (GraftTsCatalog): the
    * q_ts_snapshot lifecycle — pin, then compact + retention damage — but
    * the pinned read is issued as `SELECT … VERSION AS OF v` against
    * `graft_ts.`store``, resolving through Spark's catalog time-travel
    * spec into the same snapshot file index the option("asOf") path uses.
    * The oracle is the pre-mutation slice, hash-checking the SQL route
    * end-to-end; option-path parity, TIMESTAMP AS OF, INSERT, and DELETE
    * SQL faces are asserted in GraftTsSourceSpec. */
  def sqlAsOfRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tssqlasof_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    val pinned = t.currentVersion.get
    t.compactAll(targetFiles = 1)
    t.dropBefore("2024-01-03")
    eventsProjection(
      s.sql(s"SELECT * FROM graft_ts.`$store` VERSION AS OF $pinned"))
  }

  /** A7+ per-day layout report (`TsTable.partitionStats` — the
    * IvfIndex.cellStats analogue): build four days, report each day's
    * file count and rows. File counts are deterministic under
    * filesPerDay = 1 (one day-partition task → one file), so the whole
    * report is oracle-checkable: the oracle recomputes per-day row counts
    * from raw events with a literal 1 for files. Bytes are reported by
    * the API but not emitted here (physical size is compression-detail
    * dependent, not cross-engine comparable). */
  def tsStatsReport(s: SparkSession, dir: String): DataFrame = {
    val store = StoreDirs.scratch(s, s"graft_tsstats_${StoreDirs.pathKey(dir)}")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).where(col("ts") < hi)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    t.append(ev)
    t.partitionStats
      .select(col("p_date"), col("n_files"), col("n_rows"))
      .orderBy(col("p_date"))
  }

  /** B2 projection + non-time predicate; both pushed to the parquet scan. */
  def filterProject(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .where(col("event_type") === "purchase" && col("value") > 50)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))

  /** B8 date/time scalars: hourly bucketing via date_trunc. */
  def scalarDatetime(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("hour")).as("hour_us"), col("n"), col("sum_value"))
      .orderBy(col("hour_us"))

  /** B5 OHLC resampling — the canonical tick-data downsample the
    * reference's users run via `read_range(...)` → pandas
    * `resample().ohlc()` (`[pub: tstables README — tick-data use case]`):
    * per (4-hour bucket, event_type), the first/max/min/last `value`.
    * Open/close are pinned with row_number over the (ts, event_id) order —
    * a deterministic tiebreak both engines replay identically — then one
    * hash aggregation; the two window passes share a single (bucket, type)
    * shuffle. */
  private val LttbBuckets = 12L

  /** The LTTB rank→bucket map over (`rn` int, `n` long) columns. `rn` is
    * IntegerType (row_number) and MUST widen before the multiply: the int
    * product wraps past rn ≈ 179M, and the scaladoc advertises 1B-point
    * series. Package-visible so the overflow regression spec exercises
    * the exact expression the operator plans. */
  private[graft] def lttbBucketExpr: org.apache.spark.sql.Column =
    expr(s"((CAST(rn AS BIGINT) - 1) * $LttbBuckets) DIV n")

  /** B5+ drawdown — the canonical risk statistic the reference's finance
    * users compute from `read_range` → pandas `cummax` over a cumulative
    * PnL curve: per user, equity = running sum of `value − DrawdownBench`
    * in (ts, event_id) order, peak = running max of equity, drawdown =
    * peak − equity; surface each user's MAXIMUM drawdown and the event where the
    * trough occurs (argmax ties break on event_id — deterministic in both
    * engines). All arithmetic is decimal-exact internally; the surfaced
    * drawdown is CAST to DOUBLE (a single correctly-rounded conversion of
    * a scale-4 decimal, identical in both engines) because the driver's
    * hasher canonicalizes surfaced decimals differently per engine at any
    * precision. Shape: equity
    * and peak share ONE user_id window exchange (same partition + order);
    * the argmax selection re-sorts within the same partitioning — one
    * shuffle total, the running/ewma rule. At 100 TB: per-series
    * prefix-scans parallelize across users; no driver state. */
  /** The PnL benchmark: `value` is nonnegative in this schema, so the raw
    * cumulative sum would be monotone (every drawdown trivially 0); the
    * per-event increment is `value − DrawdownBench` — a position P&L
    * against a fixed reference, the shape a real equity curve has. ONE
    * IEEE subtraction before the decimal quantization, replayed
    * identically by the oracle. */
  private[graft] val DrawdownBench = 50.0

  def windowDrawdown(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val curve = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"),
        (col("value") - lit(DrawdownBench)).cast("decimal(18,4)").as("v"))
      .withColumn("equity", sum(col("v")).over(w))
      .withColumn("peak", max(col("equity")).over(w))
      // peak − equity stays DECIMAL(18,4) internally: the subtraction's
      // exact scale is 4 so the cast never rounds, and 14 integer digits
      // hold any realistic PnL range.
      .withColumn("dd", (col("peak") - col("equity")).cast("decimal(18,4)"))
    val sel = Window.partitionBy(col("user_id"))
      .orderBy(col("dd").desc, col("event_id"))
    curve.withColumn("rk", row_number().over(sel))
      .where(col("rk") === 1)
      // Surface as DOUBLE: the driver's hasher canonicalizes ANY surfaced
      // decimal differently per engine (pyarrow decimal128 vs DuckDB
      // rendering) regardless of precision — DECIMAL(38,4) failed in r16
      // and DECIMAL(18,4) failed in r17. The decimal→double conversion of
      // a scale-4 value is the same correctly-rounded IEEE op in both
      // engines (the q_window_twap pattern all 180 green keys follow).
      .select(col("user_id"), col("dd").cast("double").as("max_drawdown"),
        col("event_id").as("trough_event_id"))
      .orderBy(col("user_id"))
  }

  /** B5/B6+ visual downsampling — largest-triangle-three-buckets, the
    * parallel bucketed variant (Steinarsson 2013; the `lttb` Grafana/
    * Timescale serve their charts with): each user's series reduces to
    * ≤ 12 points that preserve visual shape — per rank-space bucket,
    * keep the point forming the LARGEST triangle against the
    * neighboring buckets' average points (classic LTTB uses the
    * previously SELECTED point as the left vertex, which serializes the
    * scan; substituting the previous bucket's average — the variant
    * Steinarsson evaluates as near-identical — makes every bucket
    * independently computable, i.e. one distributed pass instead of a
    * per-series sequential fold). Series endpoints stay anchored like
    * the original: the first/last bucket select their first/last point.
    * Shape: one rank window (user exchange), one bucket aggregate
    * (map-side combined; decimal-exact sums so both engines derive
    * bit-identical averages), one small per-(user,bucket) neighbor
    * window, a join of points to their bucket's neighbor stats, one
    * selection window. At 100 TB: the dashboard query — 1 B points per
    * series become 12 without any driver involvement; area arithmetic is
    * the same IEEE chain on both engines, so argmax agrees bit-for-bit
    * (ties break on event_id). */
  def downsampleLttb(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wU = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val pts = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .withColumn("rn", row_number().over(wU))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .withColumn("b", lttbBucketExpr)
    val bstats = pts.groupBy(col("user_id"), col("b"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("us").cast("decimal(38,0)")).as("sx"),
        sum(col("value").cast("decimal(28,4)")).as("sy"))
      .select(col("user_id"), col("b"),
        (col("sx").cast("double") / col("cnt")).as("ax"),
        (col("sy").cast("double") / col("cnt")).as("ay"))
    val wB = Window.partitionBy(col("user_id")).orderBy(col("b"))
    val nb = bstats
      .select(col("user_id"), col("b"),
        coalesce(lag(col("ax"), 1).over(wB), col("ax")).as("px"),
        coalesce(lag(col("ay"), 1).over(wB), col("ay")).as("py"),
        coalesce(lead(col("ax"), 1).over(wB), col("ax")).as("nx"),
        coalesce(lead(col("ay"), 1).over(wB), col("ay")).as("ny"))
    val scored = pts.join(nb, Seq("user_id", "b"))
      .withColumn("area", abs(
        col("px") * (col("value") - col("ny")) +
          col("us").cast("double") * (col("ny") - col("py")) +
          col("nx") * (col("py") - col("value"))))
      .withColumn("maxb", expr(s"((n - 1) * $LttbBuckets) DIV n"))
      .withColumn("k1",
        when(col("b") === 0, col("rn").cast("long"))
          .when(col("b") === col("maxb"), col("n") - col("rn"))
          .otherwise(lit(0L)))
    val wSel = Window.partitionBy(col("user_id"), col("b"))
      .orderBy(col("k1"), col("area").desc, col("event_id"))
    // the area itself is NOT surfaced: at epoch-µs x-scale it is O(1e12),
    // past the magnitude where a 6dp round is even representable in a
    // double — the engines agree on the argmax (identical IEEE chain) but
    // not on a cosmetic re-round of the raw score
    scored.withColumn("rk", row_number().over(wSel))
      .where(col("rk") === 1)
      .select(col("user_id"), col("b"), col("event_id"), col("us").as("ts_us"),
        col("value"))
      .orderBy(col("user_id"), col("b"))
  }

  def resampleOhlc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.events(s, dir).select(col("event_type"),
      unix_micros(window(col("ts"), "4 hours").getField("start")).as("b_us"),
      col("ts"), col("event_id"), col("value"))
    val asc = Window.partitionBy(col("b_us"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val desc = Window.partitionBy(col("b_us"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    base
      .withColumn("rna", row_number().over(asc))
      .withColumn("rnd", row_number().over(desc))
      .groupBy(col("b_us"), col("event_type"))
      .agg(max(when(col("rna") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rnd") === 1, col("value"))).as("close"),
        count(lit(1)).as("n"))
      .orderBy(col("b_us"), col("event_type"))
  }

  /** B5 gap-fill resampling — the other half of the reference users'
    * pandas `resample()` workflow: a REGULAR hourly grid per user spanning
    * that user's [min ts, max ts], each grid point carrying the
    * last-observation-carried-forward value (pandas `ffill`). Grid points
    * before a user's first observation stay null. Plan shape: per-user
    * bounds agg (one shuffle), grid via `explode(sequence(...))` (narrow),
    * left join of hourly last-values, one per-user ordered window for the
    * carry-forward — every stage distributes by user. Within-hour pick is
    * `max_by(value, ts)`; the fixture has no (user, ts) duplicates, so the
    * pick is deterministic on both engines. */
  def resampleFfill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir).select(col("user_id"), col("ts"), col("value"))
    val grid = e.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val obs = e.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(max_by(col("value"), col("ts")).as("v_obs"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "hour"), "left")
      .withColumn("value", last(col("v_obs"), ignoreNulls = true).over(w))
      .select(col("user_id"), unix_micros(col("hour")).as("hour_us"), col("value"))
      .orderBy(col("user_id"), col("hour_us"))
  }

  /** B5 linear-interpolation resampling — pandas `resample('h').mean()
    * .interpolate()`: the same per-user hourly grid as `resampleFfill`, but
    * a gap hour takes the time-weighted line between its neighboring
    * OBSERVED hours, v = v_prev + (v_next − v_prev)·(h − h_prev)/(h_next −
    * h_prev). No extrapolation: hours before the first / after the last
    * observation stay null (only possible at grid edges by construction of
    * the [min, max] span). Plan shape: the ffill stages plus one extra
    * backward window (first following observation) sharing the same
    * per-user shuffle; the interpolation itself is a per-row IEEE
    * expression written identically in the oracle; the interpolated branch
    * is quantized with floor(x·1e6 + 0.5)/1e6 rather than round() — the two
    * engines' round() disagree on boundary doubles (Spark rounds the
    * shortest decimal repr, DuckDB the raw binary — the Det.dsum6 story),
    * while the floor form is the same IEEE ops on both sides, hence
    * bit-identical. */
  def resampleInterp(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir).select(col("user_id"), col("ts"), col("value"))
    val grid = e.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val obs = e.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(max_by(col("value"), col("ts")).as("v_obs"))
    val back = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsHour = when(col("v_obs").isNotNull, col("hour"))
    val frac = (unix_micros(col("hour")) - unix_micros(col("ph"))).cast("double") /
      (unix_micros(col("nh")) - unix_micros(col("ph"))).cast("double")
    grid.join(obs, Seq("user_id", "hour"), "left")
      .withColumn("pv", last(col("v_obs"), ignoreNulls = true).over(back))
      .withColumn("ph", last(obsHour, ignoreNulls = true).over(back))
      .withColumn("nv", first(col("v_obs"), ignoreNulls = true).over(fwd))
      .withColumn("nh", first(obsHour, ignoreNulls = true).over(fwd))
      .withColumn("value",
        when(col("v_obs").isNotNull, col("v_obs"))
          .when(col("pv").isNull || col("nv").isNull, lit(null).cast("double"))
          .otherwise(floor((col("pv") + (col("nv") - col("pv")) * frac) * 1e6 + 0.5) / 1e6))
      .select(col("user_id"), unix_micros(col("hour")).as("hour_us"), col("value"))
      .orderBy(col("user_id"), col("hour_us"))
  }

  /** B10 tumbling window aggregation (batch form of the streaming shape —
    * identical semantics; streaming execution is exercised in TsStreamSpec). */
  def windowTumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("ws_us"), col("event_type"))

  /** B10 sliding window aggregation (1-hour window every 15 minutes; batch
    * form of the streaming shape, like q_window_tumbling). Each event lands
    * in exactly 4 windows — all of `bucket15(ts) − k·15min, k ∈ 0..3` start
    * at-or-before ts and end strictly after it, which is what lets the
    * DuckDB oracle enumerate them with a 4-row VALUES join. */
  def windowSliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("ws_us"), col("event_type"))

  /** B10 session window (10-min gap) per user; events merge while the gap to
    * the previous event is strictly less than the gap duration. */
  def windowSession(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start_us"),
        col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("sess_start_us"))

  /** B5 moving aggregates: 10-row trailing avg + 1-hour trailing time-range
    * sum per user (range frame needs a numeric ordering → unix_micros). */
  def windowMovingAvg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRows = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-9, 0)
    val wRange = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts"))).rangeBetween(-3600000000L, 0)
    Tables.events(s, dir)
      .select(col("event_id"),
        (Det.dsumDec(col("value")).over(wRows).cast("double") /
          count(lit(1)).over(wRows)).as("mavg10"),
        Det.dsumDec(col("value")).over(wRange).cast("double").as("sum_1h"))
      .orderBy(col("event_id"))
  }

  private val EwmaK = 20 // EWMA frame length (rows)

  /** B5+ exponentially weighted moving average — pandas `ewm(alpha=0.5)
    * .mean()` (adjust=True) truncated to a 20-row trailing frame, per user
    * in (ts, event_id) order. α is pinned to 0.5 BECAUSE it makes the op
    * cross-engine hashable with no rounding at all: the weights r^j become
    * 2^j, so ewma = Σ vᵢ·2^i / (2^n − 1) — numerator accumulated in exact
    * DECIMAL (value cast to 6dp, times an exact integer power of two),
    * denominator an exactly-representable double, one final IEEE division.
    * Arbitrary α would put libm `pow` in the hash path (not correctly-
    * rounded, so not bit-stable across engines).
    *
    * Shape: K lag() expressions over ONE window pass — a fixed-width
    * expression per row, no collect_list (which would materialize a K-long
    * array per row: K× the shuffle bytes at 100 TB for the same answer).
    * Truncation to K rows is also what bounds state for the streaming twin
    * of this op. Missing lags at partition heads contribute 0 to the
    * numerator and shrink n, which rescales both sides identically (the
    * 2^(K−n) factor cancels in num/den).
    *
    * PRECONDITION: `value` must be non-null (true of the events fixture,
    * whose generator never emits null values). A null inside the frame
    * would be coalesced to 0 in the numerator while still counting in n —
    * i.e. treated as an actual 0 observation — which diverges from pandas
    * ewm()'s NaN handling (weight renormalization without the row). The
    * oracle SQL makes the same choice, so the check stays cross-engine
    * consistent; this documents the semantics rather than hiding them. */
  def windowEwma(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wFrame = wOrd.rowsBetween(-(EwmaK - 1), 0)
    val num = (0 until EwmaK).map { k =>
      coalesce(lag(col("value"), k).over(wOrd).cast("decimal(18,6)"),
        lit(0).cast("decimal(18,6)")) *
        lit(math.pow(2, EwmaK - 1 - k)).cast("decimal(20,0)")
    }.reduce(_ + _)
    val n = count(lit(1)).over(wFrame)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), n.as("n"), num.as("num"))
      .select(col("event_id"), col("user_id"), col("n"),
        (col("num").cast("double") /
          (pow(lit(2.0), lit(EwmaK.toDouble)) -
            pow(lit(2.0), lit(EwmaK.toDouble) - col("n").cast("double")))).as("ewma"))
      .orderBy(col("event_id"))
  }

  /** B5 analytic lag: per-user deltas between consecutive events. */
  def windowDelta(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"),
        lag(col("event_id"), 1).over(w).as("prev_event_id"))
      .orderBy(col("event_id"))
  }

  /** B3 backward as-of join: each event → most recent order of the same
    * customer at-or-before the event time. Right side pre-deduped per
    * (custkey, orderdate) with max_by — the testdata has 32 duplicate pairs
    * and any engine's as-of pick among exact-tie rows is arbitrary. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ordersDedup = Tables.orders(s, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
    AsOfJoin.backward(
      Tables.events(s, dir).select("event_id", "user_id", "ts"),
      ordersDedup, leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate")
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("o_totalprice"), unix_micros(col("o_orderdate")).as("order_ts_us"))
      .orderBy(col("event_id"))
  }

  /** B3 as-of join with a match-staleness bound (pandas
    * `merge_asof(tolerance=…)` parity — the missing knob of the as-of
    * family): each purchase picks up the user's latest view at-or-before
    * it, but a view staler than 48 h is discarded (null columns) — the
    * staleness guard every tick-enrichment pipeline wants. The 48 h bound
    * splits the fixture roughly in half (median staleness ≈ 34 h), so both
    * outcomes are exercised. Oracle: DuckDB ASOF LEFT JOIN + the same
    * µs-difference null-out. */
  def asofJoinTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin.backward(p, v, leftKey = "user_id", rightKey = "v_user",
        leftTime = "ts", rightTime = "v_ts",
        toleranceUs = Some(48L * 3600 * 1000000))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("v_ts")).as("view_ts_us"))
      .orderBy(col("event_id"))
  }

  /** B3 as-of join through the custom partitioned-merge operator
    * (org.apache.spark.sql.graft.BackwardAsOf — logical node + strategy +
    * streaming-merge exec): same semantics and ORACLE as q_asof_join, but
    * planned as one exchange per side, per-side sorts, and a two-pointer
    * merge with O(1) state instead of union+window (AsOfMergeSpec asserts
    * the plan shape). */
  def asofJoinMerged(s: SparkSession, dir: String): DataFrame = {
    val ordersDedup = Tables.orders(s, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
    AsOfJoin.backwardMerged(
      Tables.events(s, dir).select("event_id", "user_id", "ts"),
      ordersDedup, leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate")
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("o_totalprice"), unix_micros(col("o_orderdate")).as("order_ts_us"))
      .orderBy(col("event_id"))
  }

  /** B3 forward as-of join (`merge_asof(direction='forward')`): each view
    * event matched to the same user's next purchase at-or-after it — the
    * attribution/conversion-lag shape. Purchases pre-deduped per (user, ts)
    * (as-of picks among exact ties are arbitrary). */
  def asofJoinForward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val views = ev.where(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("p_event_id"),
        max_by(col("value"), col("event_id")).as("p_value"))
    AsOfJoin.forward(views, purchases,
      leftKey = "user_id", rightKey = "p_user",
      leftTime = "ts", rightTime = "p_ts")
      .select(col("event_id"), col("user_id"), col("p_event_id"),
        col("p_value"), unix_micros(col("p_ts")).as("p_ts_us"))
      .orderBy(col("event_id"))
  }

  /** B3 nearest as-of join (`merge_asof(direction='nearest')`): each error
    * event matched to the same user's closest click in either direction —
    * the "what was the user doing around the failure" diagnostic shape.
    * Distances are exact integer micros; equal distances resolve backward
    * (AsOfJoin.nearest's pinned rule, mirrored in the oracle's `<=`).
    * Clicks pre-deduped per (user, ts) as in the other as-of keys. */
  def asofJoinNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .agg(max(col("event_id")).as("c_event_id"))
    AsOfJoin.nearest(errors, clicks,
      leftKey = "user_id", rightKey = "c_user",
      leftTime = "ts", rightTime = "c_ts")
      .select(col("event_id"), col("user_id"), col("c_event_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("ts"))).as("delta_us"))
      .orderBy(col("event_id"))
  }

  /** B3 composite-key as-of join (`pandas.merge_asof(by=[k1, k2, …])`
    * parity — the r10 verdict's missing surface): each event → the same
    * user's PREVIOUS event of the same type, i.e. an as-of join on the
    * COMPOSITE key (user_id, event_type). The bound is STRICT
    * (allowExactMatches=false) so an event never matches its own timestamp
    * — which also makes the self-join non-trivial. Right side pre-deduped
    * per (user, type, ts) as in the other as-of keys. Oracle: DuckDB ASOF
    * LEFT JOIN with both equality conditions and a strict `>` bound. */
  def asofJoinBy(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val prev = ev
      .groupBy(col("user_id").as("p_user"), col("event_type").as("p_type"),
        col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("p_event_id"))
    AsOfJoin.backwardBy(
      ev.select("event_id", "user_id", "event_type", "ts"), prev,
      leftKeys = Seq("user_id", "event_type"),
      rightKeys = Seq("p_user", "p_type"),
      leftTime = "ts", rightTime = "p_ts", allowExactMatches = false)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("p_event_id"),
        (unix_micros(col("ts")) - unix_micros(col("p_ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** B3 composite-key FORWARD as-of join (`merge_asof(by=[…],
    * direction='forward')`): each event → the same user's NEXT event of
    * the same type, strictly after it (allowExactMatches=false keeps the
    * self-join non-trivial, as in [[asofJoinBy]]). Right side pre-deduped
    * per (user, type, ts). Oracle: DuckDB ASOF LEFT JOIN with both
    * equality conditions and a strict `<` bound. */
  def asofJoinForwardBy(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val nxt = ev
      .groupBy(col("user_id").as("n_user"), col("event_type").as("n_type"),
        col("ts").as("n_ts"))
      .agg(max(col("event_id")).as("n_event_id"))
    AsOfJoin.forwardBy(
      ev.select("event_id", "user_id", "event_type", "ts"), nxt,
      leftKeys = Seq("user_id", "event_type"),
      rightKeys = Seq("n_user", "n_type"),
      leftTime = "ts", rightTime = "n_ts", allowExactMatches = false)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("n_event_id"),
        (unix_micros(col("n_ts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** B3 composite-key NEAREST as-of join (`merge_asof(by=[…],
    * direction='nearest')`): each event → the same (user, type)'s closest
    * OTHER event in either direction — strict bounds exclude the row's own
    * timestamp, exact-distance ties resolve backward (the engine rule,
    * mirrored in the oracle's `<=`). `delta_us` is SIGNED (negative =
    * matched backward), same convention as q_asof_join_nearest. */
  def asofJoinNearestBy(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val nb = ev
      .groupBy(col("user_id").as("c_user"), col("event_type").as("c_type"),
        col("ts").as("c_ts"))
      .agg(max(col("event_id")).as("c_event_id"))
    AsOfJoin.nearestBy(
      ev.select("event_id", "user_id", "event_type", "ts"),
      nb,
      leftKeys = Seq("user_id", "event_type"),
      rightKeys = Seq("c_user", "c_type"),
      leftTime = "ts", rightTime = "c_ts", allowExactMatches = false)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_event_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("ts"))).as("delta_us"))
      .orderBy(col("event_id"))
  }

  /** B3 range/interval join: same-user event pairs at most 1 hour apart
    * (strictly forward). Equi-key on user_id keeps this a sort-merge join
    * with a range post-filter — per-key bounded, no cartesian blowup. */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select("event_id", "user_id", "ts")
    val a = e.select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
    val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    a.join(b, col("user_id") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("a_id"), col("b_id"),
        (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("gap_us"))
      .orderBy(col("a_id"), col("b_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_read_range" -> readRange,
    "q_min_max_dt" -> minMaxDt,
    "q_append_roundtrip" -> appendRoundtrip,
    "q_ts_v2_roundtrip" -> v2Roundtrip,
    "q_ts_compact" -> compactRoundtrip,
    "q_ts_retention" -> retentionRoundtrip,
    "q_ts_snapshot" -> snapshotRoundtrip,
    "q_ts_history" -> tsHistory,
    "q_ts_restore" -> restoreRoundtrip,
    "q_ts_sql_call" -> sqlCallRoundtrip,
    "q_ts_delete" -> deleteRoundtrip,
    "q_ts_constraint" -> constraintRoundtrip,
    "q_ts_update" -> updateRoundtrip,
    "q_ts_merge" -> mergeRoundtrip,
    "q_ts_backfill" -> backfillRoundtrip,
    "q_ts_point_lookup" -> pointLookupRoundtrip,
    "q_ts_indexing" -> indexingRoundtrip,
    "q_ts_runtime_prune" -> runtimePruneJoin,
    "q_ts_drop_column" -> dropColumnRoundtrip,
    "q_ts_rename" -> renameColumnRoundtrip,
    "q_ts_widen" -> widenColumnRoundtrip,
    "q_ts_migrate" -> migrateRoundtrip,
    "q_ts_cluster" -> clusterCompactRoundtrip,
    "q_ts_hour_span" -> hourSpanRoundtrip,
    "q_ts_hour_compact" -> hourCompactRoundtrip,
    "q_ts_sql_merge" -> sqlMergeRoundtrip,
    "q_ts_rollup" -> rollupRoundtrip,
    "q_ts_rollup_dml" -> rollupDmlRoundtrip,
    "q_ts_changes" -> changesRoundtrip,
    "q_ts_cdf" -> cdfRoundtrip,
    "q_ts_stream_changes" -> streamChangesRoundtrip,
    "q_ts_stream_pipe" -> streamPipeRoundtrip,
    "q_ts_stream_sink" -> streamSinkRoundtrip,
    "q_ts_sql_asof" -> sqlAsOfRoundtrip,
    "q_ts_clone" -> cloneRoundtrip,
    "q_zorder_cluster" -> zorderRect,
    "q_zorder_3d" -> zorderBox3,
    "q_ts_stats" -> tsStatsReport,
    "q_filter_project" -> filterProject,
    "q_scalar_datetime" -> scalarDatetime,
    "q_resample_ohlc" -> resampleOhlc,
    "q_downsample_lttb" -> downsampleLttb,
    "q_resample_ffill" -> resampleFfill,
    "q_resample_interp" -> resampleInterp,
    "q_window_tumbling" -> windowTumbling,
    "q_window_sliding" -> windowSliding,
    "q_window_session" -> windowSession,
    "q_window_moving_avg" -> windowMovingAvg,
    "q_window_ewma" -> windowEwma,
    "q_window_delta" -> windowDelta,
    "q_window_twap" -> windowTwap,
    "q_window_drawdown" -> windowDrawdown,
    "q_asof_join" -> asofJoin,
    "q_asof_join_tol" -> asofJoinTolerance,
    "q_asof_join_merged" -> asofJoinMerged,
    "q_asof_join_fwd" -> asofJoinForward,
    "q_asof_join_nearest" -> asofJoinNearest,
    "q_asof_join_by" -> asofJoinBy,
    "q_asof_join_fwd_by" -> asofJoinForwardBy,
    "q_asof_join_nearest_by" -> asofJoinNearestBy,
    "q_range_join" -> rangeJoin)

  private val asofOracleSql =
    """WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
      |                  arg_max(o_totalprice, o_orderkey) AS o_totalprice
      |           FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
      |epoch_us(o.o_orderdate) AS order_ts_us
      |FROM events e ASOF LEFT JOIN o
      |  ON e.user_id = o.o_custkey AND date_trunc('microseconds', e.ts) >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  def oracles: Map[String, String] = oraclesBase
    // The SQL MERGE key replays q_ts_merge's scenario verbatim through
    // spark.sql -- identical expected state, identical oracle.
    .updated("q_ts_sql_merge", oraclesBase("q_ts_merge"))

  private val oraclesBase: Map[String, String] = Map(
    // date_trunc('microseconds', …) on the DuckDB side: events.ts physically
    // carries ns digits; Spark sees it floored to µs, so the oracle must
    // filter on the floored value too or exact-boundary rows could diverge.
    "q_read_range" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) BETWEEN TIMESTAMP '$RangeLo' AND TIMESTAMP '$RangeHi'
         |ORDER BY event_id""".stripMargin,
    "q_min_max_dt" ->
      """SELECT epoch_us(min(ts)) AS min_ts_us, epoch_us(max(ts)) AS max_ts_us,
        |count(*) AS n FROM events""".stripMargin,
    "q_append_roundtrip" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) BETWEEN TIMESTAMP '2024-01-08 00:00:00' AND TIMESTAMP '2024-01-22 00:00:00'
         |ORDER BY event_id""".stripMargin,
    "q_ts_v2_roundtrip" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) BETWEEN TIMESTAMP '2024-01-03 00:00:00' AND TIMESTAMP '2024-01-08 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // readRange's closed upper bound at exactly 2024-01-03T00:00 admits no
    // extra rows: the store was built from ts strictly below that instant.
    "q_ts_compact" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-03 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // dropBefore('2024-01-03') leaves exactly the [cutoff-day, build-bound)
    // rows; the read's closed upper bound admits nothing (store built from
    // ts strictly below it).
    "q_ts_retention" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-03 00:00:00'
         |  AND date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // Each version's file count derived from the data: per day, the number
    // of appends that touched it (the cut splits day 01-02); compactAll(1)
    // collapses each multi-file day to one; retention keeps days >= cutoff.
    "q_ts_history" ->
      """WITH f AS (SELECT date_trunc('day', ts) AS d,
        |    count(DISTINCT CASE WHEN date_trunc('microseconds', ts)
        |      < TIMESTAMP '2024-01-02 12:00:00' THEN 0 ELSE 1 END) AS nf
        |  FROM events
        |  WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(nf) AS BIGINT) AS s,
        |    CAST(sum(CASE WHEN nf > 1 THEN nf - 1 ELSE 0 END) AS BIGINT) AS extra
        |  FROM f),
        |a1 AS (SELECT CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n
        |  FROM events
        |  WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-02 12:00:00'),
        |keep AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f
        |  WHERE d >= TIMESTAMP '2024-01-03 00:00:00')
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS version, 'create' AS action, CAST(0 AS BIGINT) AS n_files
        |  UNION ALL SELECT 2, 'append', (SELECT n FROM a1)
        |  UNION ALL SELECT 3, 'append', (SELECT s FROM t)
        |  UNION ALL SELECT 4, 'compact', (SELECT s - extra FROM t)
        |  UNION ALL SELECT 5, 'retention', (SELECT n FROM keep))
        |ORDER BY version""".stripMargin,
    // Restore returns the LIVE table to the pinned pre-damage state, so
    // the full-range live read equals the original build slice exactly
    // (the fifth-day append, compaction, and retention all roll back).
    "q_ts_restore" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // Same pre-damage slice via CALL restore + CALL compact (results are
    // layout-invariant, so the post-restore compaction changes nothing).
    "q_ts_sql_call" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // The pinned version predates compact+retention, so the time-traveled
    // read returns the FULL pre-mutation build slice (everything below the
    // build bound; the closed upper read bound admits nothing beyond it).
    "q_ts_snapshot" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // The drained stream (startingVersion = checkpoint) serves exactly
    // what the batch changesBetween serves — same oracle.
    "q_ts_stream_changes" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-02 12:00:00'
         |  AND date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // The piped destination holds exactly the source's appended rows; the
    // closed upper read bound admits nothing (source built below it).
    "q_ts_stream_pipe" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-03 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // Same mirror contract through the NATIVE sink (no foreachBatch).
    "q_ts_stream_sink" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-03 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // The cloned version predates the damage (fifth-day append, compact,
    // retention), so the clone's full-range read equals the build slice.
    "q_ts_clone" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // The SQL VERSION AS OF pin predates compact+retention, so the
    // catalog-routed read returns the full pre-mutation build slice —
    // same oracle as the API-path q_ts_snapshot.
    "q_ts_sql_asof" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // updateWhere redacts exactly the predicate-TRUE rows; every other
    // row (including the hit files' non-matching rows) is unchanged.
    "q_ts_update" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        |  CASE WHEN user_id % 5 = 1
        |    AND date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-02 00:00:00'
        |    AND date_trunc('microseconds', ts) < TIMESTAMP '2024-01-04 00:00:00'
        |  THEN 0.0 ELSE value END AS value,
        |  CASE WHEN user_id % 5 = 1
        |    AND date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-02 00:00:00'
        |    AND date_trunc('microseconds', ts) < TIMESTAMP '2024-01-04 00:00:00'
        |  THEN '{"redacted":true}' ELSE props END AS props
        |FROM events
        |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
        |ORDER BY event_id""".stripMargin,
    // TWAP replayed with the same pairing (lead over (us, event_id)),
    // DECIMAL-exact numerator, and ONE final double division.
    "q_window_twap" ->
      """WITH e AS (SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
        |    epoch_us(ts) AS us, value, event_id FROM events),
        |x AS (SELECT user_id, d, us, value,
        |    lead(us) OVER (PARTITION BY user_id, d ORDER BY us, event_id) AS nxt
        |  FROM e),
        |p AS (SELECT user_id, d, value, nxt - us AS dt FROM x WHERE nxt IS NOT NULL)
        |SELECT user_id, d AS day, count(*) AS n_intervals,
        |  CAST(sum(dt) AS BIGINT) AS sum_dt_us,
        |  floor(CAST(sum(CAST(value AS DECIMAL(15,6)) * CAST(dt AS DECIMAL(19,0))) AS DOUBLE)
        |    / CAST(sum(dt) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS twap
        |FROM p GROUP BY user_id, d ORDER BY user_id, day""".stripMargin,
    // Drawdown: decimal-exact equity/peak chain, argmax trough with the
    // event_id tiebreak; surfaced as DOUBLE (no decimal ever reaches the
    // output schema — the driver hasher canonicalizes decimals
    // differently per engine at every precision, r16+r17 evidence).
    "q_window_drawdown" ->
      s"""WITH p AS (
        |  SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS us,
        |    event_id, CAST(value - $DrawdownBench AS DECIMAL(18,4)) AS v
        |  FROM events),
        |e AS (
        |  SELECT user_id, us, event_id,
        |    sum(v) OVER (PARTITION BY user_id ORDER BY us, event_id) AS equity
        |  FROM p),
        |d AS (
        |  SELECT user_id, us, event_id, equity,
        |    max(equity) OVER (PARTITION BY user_id ORDER BY us, event_id) AS peak
        |  FROM e),
        |r AS (
        |  SELECT user_id, event_id,
        |    CAST(peak - equity AS DECIMAL(18,4)) AS dd,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY (peak - equity) DESC, event_id) AS rk
        |  FROM d)
        |SELECT user_id, CAST(dd AS DOUBLE) AS max_drawdown,
        |  event_id AS trough_event_id
        |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin,
    // The backfilled store holds exactly the four-day slice, whatever
    // order the days arrived in.
    "q_ts_backfill" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // Parallel LTTB: bucket averages from decimal-exact sums, the same
    // IEEE area chain, endpoint anchors, event_id tiebreak.
    "q_downsample_lttb" ->
      s"""WITH e AS (SELECT user_id,
         |    epoch_us(date_trunc('microseconds', ts)) AS us, event_id, value
         |  FROM events),
         |p AS (SELECT user_id, us, event_id, value,
         |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS n
         |  FROM e),
         |pb AS (SELECT *, ((CAST(rn AS BIGINT) - 1) * $LttbBuckets) // n AS b FROM p),
         |bs AS (SELECT user_id, b, count(*) AS cnt,
         |    CAST(sum(CAST(us AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS ax,
         |    CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) / count(*) AS ay
         |  FROM pb GROUP BY user_id, b),
         |nb AS (SELECT user_id, b,
         |    coalesce(lag(ax) OVER w, ax) AS px,
         |    coalesce(lag(ay) OVER w, ay) AS py,
         |    coalesce(lead(ax) OVER w, ax) AS nx,
         |    coalesce(lead(ay) OVER w, ay) AS ny
         |  FROM bs WINDOW w AS (PARTITION BY user_id ORDER BY b)),
         |sc AS (SELECT pb.user_id, pb.b, pb.event_id, pb.us, pb.value,
         |    pb.rn, pb.n,
         |    abs(nb.px * (pb.value - nb.ny)
         |        + CAST(pb.us AS DOUBLE) * (nb.ny - nb.py)
         |        + nb.nx * (nb.py - pb.value)) AS area,
         |    ((pb.n - 1) * $LttbBuckets) // pb.n AS maxb
         |  FROM pb JOIN nb USING (user_id, b)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, b ORDER BY
         |    CASE WHEN b = 0 THEN rn WHEN b = maxb THEN n - rn ELSE 0 END,
         |    area DESC, event_id) AS rk FROM sc)
         |SELECT user_id, b, event_id, us AS ts_us, value
         |FROM r WHERE rk = 1 ORDER BY user_id, b""".stripMargin,
    // Column rename is metadata-only relabeling: every row must survive
    // byte-identically under the new name, across both file generations.
    "q_ts_rename" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        |  value AS px, props
        |FROM events
        |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
        |ORDER BY event_id""".stripMargin,
    // Type widening is metadata-only: both generations must serve the
    // wide types exactly. The narrow era went through float, so the
    // oracle replays the float quantization before promoting — the
    // promotion itself is value-identical.
    "q_ts_widen" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        |  CAST(CAST(value AS FLOAT) AS DOUBLE) AS value, props
        |FROM events
        |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
        |ORDER BY event_id""".stripMargin,
    // Field-id migration + rename are content-preserving: both file
    // generations (pre-migration plain parquet, post-rename appends) must
    // serve under the new label with zero null-fill.
    "q_ts_migrate" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        |  value AS px, props
        |FROM events
        |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
        |ORDER BY event_id""".stripMargin,
    // Hour-slot-aware compaction is content-preserving: the split hour's
    // rows must survive the per-hour merge exactly.
    "q_ts_hour_compact" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-01 12:00:00'
         |  AND date_trunc('microseconds', ts) <= TIMESTAMP '2024-01-01 12:59:59'
         |ORDER BY event_id""".stripMargin,
    // Z-order re-clustering is content-preserving: the whole slice must
    // survive the Morton re-sort byte-identically.
    "q_ts_cluster" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-03 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // Hour-slotted files serve a 1-hour closed-interval range exactly.
    "q_ts_hour_span" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-01 09:00:00'
         |  AND date_trunc('microseconds', ts) <= TIMESTAMP '2024-01-01 09:59:59'
         |ORDER BY event_id""".stripMargin,
    // Column drop is metadata-only narrowing: everything except props
    // must survive byte-identically.
    "q_ts_drop_column" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events
        |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
        |ORDER BY event_id""".stripMargin,
    // Bloom point lookup: metadata pruning is invisible to results — the
    // oracle is the plain IN-slice, and a dropped matching row would
    // hash-mismatch.
    "q_ts_point_lookup" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |  AND user_id IN (3, 7, 11)
         |ORDER BY event_id""".stripMargin,
    // Post-hoc index declaration: the backfilled Bloom/span index must be
    // invisible in results — same IN-slice as point_lookup, served
    // through filters built AFTER the data landed.
    "q_ts_indexing" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |  AND user_id IN (3, 7, 11)
         |ORDER BY event_id""".stripMargin,
    // runtime file pruning: the join itself is plain SQL — the engine-side
    // file skipping must be invisible in the result
    "q_ts_runtime_prune" ->
      """WITH fact AS (
        |  SELECT * FROM events
        |  WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
        |), dim AS (
        |  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 3
        |)
        |SELECT f.user_id, count(*) AS n_events,
        |  CAST(sum(CAST(f.value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
        |FROM fact f JOIN dim d USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // mergeInto: matched rows take the source's columns (replayed as a
    // LEFT JOIN + CASE on the match marker — the source carried the
    // original user_id/event_type, so only value/props visibly change);
    // unmatched source rows (day-5 events shifted 72 h back) insert as
    // backfill into existing day partitions.
    "q_ts_merge" ->
      """WITH base AS (
        |  SELECT * FROM events
        |  WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
        |), upd AS (
        |  SELECT event_id, value * 2 AS value, '{"corrected":true}' AS props
        |  FROM base
        |  WHERE user_id % 6 = 2
        |    AND date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-02 00:00:00'
        |    AND date_trunc('microseconds', ts) < TIMESTAMP '2024-01-04 00:00:00'
        |), ins AS (
        |  SELECT event_id, ts - INTERVAL 72 HOUR AS ts, user_id, event_type,
        |    value, props
        |  FROM events
        |  WHERE date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-05 00:00:00'
        |    AND date_trunc('microseconds', ts) < TIMESTAMP '2024-01-06 00:00:00'
        |), merged AS (
        |  SELECT b.event_id, b.ts, b.user_id, b.event_type,
        |    CASE WHEN u.event_id IS NOT NULL THEN u.value ELSE b.value END AS value,
        |    CASE WHEN u.event_id IS NOT NULL THEN u.props ELSE b.props END AS props
        |  FROM base b LEFT JOIN upd u ON b.event_id = u.event_id
        |  UNION ALL
        |  SELECT event_id, ts, user_id, event_type, value, props FROM ins
        |)
        |SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
        |  props
        |FROM merged
        |WHERE date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-01 00:00:00'
        |  AND date_trunc('microseconds', ts) <= TIMESTAMP '2024-01-05 00:00:00'
        |ORDER BY event_id""".stripMargin,
    // changesBetween(checkpoint, current) = the rows appended after the
    // checkpoint (batches 2+3 = everything at-or-after the first cut);
    // the intervening compact contributes no false adds.
    "q_ts_changes" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-02 12:00:00'
         |  AND date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |ORDER BY event_id""".stripMargin,
    // The change feed reconstructs the verbs relationally: batch 2 as
    // inserts at the first post-checkpoint version, the deleted cohort as
    // deletes, the update as pre/post pairs at one version (the engine's
    // update applies only to rows surviving the earlier delete — NOT
    // delpred below).
    "q_ts_cdf" ->
      """WITH base AS (
        |  SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id,
        |    event_type, value, props
        |  FROM events
        |  WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
        |), b2 AS (
        |  SELECT * FROM base WHERE ts >= TIMESTAMP '2024-01-02 12:00:00'
        |), del AS (
        |  SELECT * FROM base
        |  WHERE user_id % 7 = 3 AND ts >= TIMESTAMP '2024-01-02 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-04 00:00:00'
        |), upd AS (
        |  SELECT * FROM base
        |  WHERE NOT (user_id % 7 = 3 AND ts >= TIMESTAMP '2024-01-02 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-04 00:00:00')
        |    AND user_id % 5 = 1 AND ts < TIMESTAMP '2024-01-03 00:00:00'
        |), feed AS (
        |  SELECT event_id, ts, user_id, event_type, value, props,
        |    'insert' AS change_type, CAST(1 AS BIGINT) AS delta_v FROM b2
        |  UNION ALL
        |  SELECT event_id, ts, user_id, event_type, value, props,
        |    'delete', 2 FROM del
        |  UNION ALL
        |  SELECT event_id, ts, user_id, event_type, value, props,
        |    'delete', 3 FROM upd
        |  UNION ALL
        |  SELECT event_id, ts, user_id, event_type, value * 2, props,
        |    'insert', 3 FROM upd
        |)
        |SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
        |  props, change_type, delta_v
        |FROM feed ORDER BY delta_v, change_type, event_id""".stripMargin,
    // The gate admits exactly the clean slice; the one compliant update
    // replays as CASE WHEN (the rejected writes contribute nothing).
    "q_ts_constraint" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id,
        |  CASE WHEN user_id % 9 = 4
        |    AND date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-02 00:00:00'
        |    AND date_trunc('microseconds', ts) < TIMESTAMP '2024-01-04 00:00:00'
        |  THEN 'audited' ELSE event_type END AS event_type,
        |  value, props
        |FROM events
        |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
        |ORDER BY event_id""".stripMargin,
    // The rollup equals the direct per-hour aggregate on the raw slice:
    // integer-div bucket starts, DECIMAL-exact sum surfaced as double
    // (the sum_value convention).
    "q_ts_rollup" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ts_us,
        |  count(*) AS n_rows, min(value) AS v_min, max(value) AS v_max,
        |  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v_sum
        |FROM events
        |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-03 00:00:00'
        |GROUP BY 1 ORDER BY ts_us""".stripMargin,
    // After the DML sync the rollup equals the hourly aggregate of the
    // final state: survivors of the delete, with the update's doubling
    // applied to the rows it hit (update applies only to delete
    // survivors — NOT delpred).
    "q_ts_rollup_dml" ->
      """WITH base AS (
        |  SELECT user_id, date_trunc('microseconds', ts) AS ts, value
        |  FROM events
        |  WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-03 00:00:00'
        |), surv AS (
        |  SELECT user_id, ts,
        |    CASE WHEN user_id % 5 = 1 AND ts < TIMESTAMP '2024-01-02 00:00:00'
        |      THEN value * 2 ELSE value END AS value
        |  FROM base
        |  WHERE NOT (user_id % 7 = 3 AND ts >= TIMESTAMP '2024-01-01 12:00:00'
        |    AND ts < TIMESTAMP '2024-01-02 12:00:00')
        |)
        |SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ts_us,
        |  count(*) AS n_rows, min(value) AS v_min, max(value) AS v_max,
        |  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v_sum
        |FROM surv GROUP BY 1 ORDER BY ts_us""".stripMargin,
    // deleteWhere removes exactly the predicate-TRUE rows; the survivors
    // are the build slice under the complementary predicate.
    "q_ts_delete" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |  AND NOT (user_id % 7 = 3
         |    AND date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-02 00:00:00'
         |    AND date_trunc('microseconds', ts) < TIMESTAMP '2024-01-04 00:00:00')
         |ORDER BY event_id""".stripMargin,
    "q_ts_stats" ->
      s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS p_date,
         |  CAST(1 AS BIGINT) AS n_files, count(*) AS n_rows
         |FROM events
         |WHERE date_trunc('microseconds', ts) < TIMESTAMP '2024-01-05 00:00:00'
         |GROUP BY 1 ORDER BY p_date""".stripMargin,
    // The z-ordered copy holds exactly the events rows; bucket pruning is
    // conservative and the exact predicate re-applies, so the clustered
    // rectangle query must equal the plain scan's.
    "q_zorder_cluster" ->
      s"""WITH mm AS (SELECT CAST(min(user_id) AS DOUBLE) AS x0,
         |    CAST(max(user_id) AS DOUBLE) AS x1,
         |    min(value) AS y0, max(value) AS y1 FROM events),
         |b AS (SELECT x0 + ${ZxFrac._1} * (x1 - x0) AS xlo,
         |    x0 + ${ZxFrac._2} * (x1 - x0) AS xhi,
         |    y0 + ${ZyFrac._1} * (y1 - y0) AS ylo,
         |    y0 + ${ZyFrac._2} * (y1 - y0) AS yhi FROM mm)
         |SELECT event_id, user_id, value,
         |  epoch_us(date_trunc('microseconds', ts)) AS ts_us FROM events, b
         |WHERE user_id >= xlo AND user_id <= xhi
         |  AND value >= ylo AND value <= yhi
         |ORDER BY event_id""".stripMargin,
    // 3-D clustered box: bucket pruning is conservative and the exact
    // predicate re-applies, so the result equals the plain 3-predicate
    // scan (bounds derived from the same min/max with the same IEEE ops).
    "q_zorder_3d" ->
      s"""WITH mm AS (SELECT CAST(min(user_id) AS DOUBLE) AS x0,
         |    CAST(max(user_id) AS DOUBLE) AS x1,
         |    min(value) AS y0, max(value) AS y1,
         |    CAST(min(event_id) AS DOUBLE) AS z0,
         |    CAST(max(event_id) AS DOUBLE) AS z1 FROM events),
         |b AS (SELECT x0 + ${ZxFrac._1} * (x1 - x0) AS xlo,
         |    x0 + ${ZxFrac._2} * (x1 - x0) AS xhi,
         |    y0 + ${ZyFrac._1} * (y1 - y0) AS ylo,
         |    y0 + ${ZyFrac._2} * (y1 - y0) AS yhi,
         |    z0 + ${ZzFrac._1} * (z1 - z0) AS zlo,
         |    z0 + ${ZzFrac._2} * (z1 - z0) AS zhi FROM mm)
         |SELECT event_id, user_id, value,
         |  epoch_us(date_trunc('microseconds', ts)) AS ts_us FROM events, b
         |WHERE user_id >= xlo AND user_id <= xhi
         |  AND value >= ylo AND value <= yhi
         |  AND event_id >= zlo AND event_id <= zhi
         |ORDER BY event_id""".stripMargin,
    "q_filter_project" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value > 50 ORDER BY event_id""".stripMargin,
    "q_scalar_datetime" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, count(*) AS n,
        |CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // 4h buckets: time_bucket's 2000-01-01 origin and Spark's epoch origin
    // agree for intervals dividing a day (same alignment argument as the
    // tumbling oracle below).
    "q_resample_ohlc" ->
      """WITH e AS (SELECT event_type,
        |  epoch_us(time_bucket(INTERVAL '4 hours', date_trunc('microseconds', ts))) AS b_us,
        |  date_trunc('microseconds', ts) AS ts, event_id, value FROM events),
        |r AS (SELECT *,
        |  row_number() OVER (PARTITION BY b_us, event_type ORDER BY ts, event_id) AS rna,
        |  row_number() OVER (PARTITION BY b_us, event_type ORDER BY ts DESC, event_id DESC) AS rnd
        |  FROM e)
        |SELECT b_us, event_type,
        |max(CASE WHEN rna = 1 THEN value END) AS open,
        |max(value) AS high, min(value) AS low,
        |max(CASE WHEN rnd = 1 THEN value END) AS close,
        |count(*) AS n
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_resample_ffill" ->
      """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts, value FROM events),
        |b AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |             date_trunc('hour', max(ts)) AS h1 FROM e GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
        |o AS (SELECT user_id, date_trunc('hour', ts) AS hour,
        |             arg_max(value, ts) AS v_obs FROM e GROUP BY 1, 2),
        |j AS (SELECT g.user_id, g.hour, o.v_obs
        |      FROM g LEFT JOIN o ON g.user_id = o.user_id AND g.hour = o.hour)
        |SELECT user_id, epoch_us(hour) AS hour_us,
        |last_value(v_obs IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
        |  ROWS UNBOUNDED PRECEDING) AS value
        |FROM j ORDER BY user_id, hour_us""".stripMargin,
    "q_resample_interp" ->
      """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts, value FROM events),
        |b AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |             date_trunc('hour', max(ts)) AS h1 FROM e GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
        |o AS (SELECT user_id, date_trunc('hour', ts) AS hour,
        |             arg_max(value, ts) AS v_obs FROM e GROUP BY 1, 2),
        |j AS (SELECT g.user_id, g.hour, o.v_obs
        |      FROM g LEFT JOIN o ON g.user_id = o.user_id AND g.hour = o.hour),
        |w AS (SELECT user_id, hour, v_obs,
        |  last_value(v_obs IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
        |    ROWS UNBOUNDED PRECEDING) AS pv,
        |  last_value(CASE WHEN v_obs IS NOT NULL THEN hour END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY hour ROWS UNBOUNDED PRECEDING) AS ph,
        |  first_value(v_obs IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |  first_value(CASE WHEN v_obs IS NOT NULL THEN hour END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY hour
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |  FROM j)
        |SELECT user_id, epoch_us(hour) AS hour_us,
        |CASE WHEN v_obs IS NOT NULL THEN v_obs
        |     WHEN pv IS NULL OR nv IS NULL THEN NULL
        |     ELSE floor((pv + (nv - pv) *
        |       (CAST(epoch_us(hour) - epoch_us(ph) AS DOUBLE)
        |        / CAST(epoch_us(nh) - epoch_us(ph) AS DOUBLE))) * 1e6 + 0.5) / 1e6
        |END AS value
        |FROM w ORDER BY user_id, hour_us""".stripMargin,
    "q_window_tumbling" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS ws_us,
        |event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Sliding windows: every event belongs to exactly 4 of the 15-min-step,
    // 1-hour windows (k = 0..3 steps back from its 15-min bucket — all four
    // contain ts, see windowSliding). time_bucket's origin (2000-01-01) is
    // 15-min aligned with Spark's epoch alignment, so bucket edges agree —
    // already proven by the tumbling oracle.
    "q_window_sliding" ->
      """WITH e AS (SELECT event_type, value, date_trunc('microseconds', ts) AS ts FROM events)
        |SELECT epoch_us(time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes') AS ws_us,
        |event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM e, (VALUES (0),(1),(2),(3)) t(k)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // gaps-and-islands with a STRICT < gap test: Spark merges sessions only
    // while the inter-event gap is < gapDuration (windows [t, t+gap) overlap)
    "q_window_session" ->
      """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts, value FROM events),
        |m AS (SELECT *, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                     < INTERVAL 10 MINUTE THEN 0 ELSE 1 END AS new_s FROM e),
        |i AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                                 ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, epoch_us(min(ts)) AS sess_start_us, count(*) AS n,
        |CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM i GROUP BY user_id, sid ORDER BY user_id, sess_start_us""".stripMargin,
    "q_window_moving_avg" ->
      """WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, value FROM events)
        |SELECT event_id,
        |CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS mavg10,
        |CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts
        |     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_1h
        |FROM e ORDER BY event_id""".stripMargin,
    "q_window_ewma" -> {
      // mirrors windowEwma term by term: cast-then-scale in DECIMAL, exact
      // 2^k factors, n from the same frame, one double division
      val lags = (0 until EwmaK).map(k =>
        s"coalesce(CAST(lag(value, $k) OVER w AS DECIMAL(18,6)), 0) * " +
          s"CAST(2 ** ${EwmaK - 1 - k} AS DECIMAL(20,0))").mkString(" + ")
      s"""WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, value FROM events),
         |l AS (SELECT event_id, user_id,
         |        count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |          ROWS BETWEEN ${EwmaK - 1} PRECEDING AND CURRENT ROW) AS n,
         |        $lags AS num
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT event_id, user_id, CAST(n AS BIGINT) AS n,
         |CAST(num AS DOUBLE) / (2 ** $EwmaK - 2 ** ($EwmaK - n)) AS ewma
         |FROM l ORDER BY event_id""".stripMargin
    },
    "q_window_delta" ->
      """WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, value FROM events)
        |SELECT event_id, user_id,
        |value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta,
        |lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id
        |FROM e ORDER BY event_id""".stripMargin,
    "q_asof_join" -> asofOracleSql,
    "q_asof_join_tol" ->
      """WITH v AS (SELECT user_id AS v_user, date_trunc('microseconds', ts) AS v_ts
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS p_ts
        |      FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT p.event_id, p.user_id, p.p_ts, v.v_ts
        |      FROM p ASOF LEFT JOIN v
        |        ON p.user_id = v.v_user AND p.p_ts >= v.v_ts)
        |SELECT event_id, user_id,
        |CASE WHEN v_ts IS NOT NULL
        |       AND epoch_us(p_ts) - epoch_us(v_ts) <= 172800000000
        |     THEN epoch_us(v_ts) END AS view_ts_us
        |FROM m ORDER BY event_id""".stripMargin,
    "q_asof_join_merged" -> asofOracleSql, // same semantics, custom-exec plan
    "q_asof_join_by" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |            date_trunc('microseconds', ts) AS ts FROM events),
        |p AS (SELECT user_id AS p_user, event_type AS p_type,
        |             date_trunc('microseconds', ts) AS p_ts,
        |             max(event_id) AS p_event_id
        |      FROM events GROUP BY 1, 2, 3)
        |SELECT e.event_id, e.user_id, e.event_type, p.p_event_id,
        |epoch_us(e.ts) - epoch_us(p.p_ts) AS gap_us
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.p_user AND e.event_type = p.p_type AND e.ts > p.p_ts
        |ORDER BY e.event_id""".stripMargin,
    "q_asof_join_fwd_by" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |            date_trunc('microseconds', ts) AS ts FROM events),
        |n AS (SELECT user_id AS n_user, event_type AS n_type,
        |             date_trunc('microseconds', ts) AS n_ts,
        |             max(event_id) AS n_event_id
        |      FROM events GROUP BY 1, 2, 3)
        |SELECT e.event_id, e.user_id, e.event_type, n.n_event_id,
        |epoch_us(n.n_ts) - epoch_us(e.ts) AS gap_us
        |FROM e ASOF LEFT JOIN n
        |  ON e.user_id = n.n_user AND e.event_type = n.n_type AND e.ts < n.n_ts
        |ORDER BY e.event_id""".stripMargin,
    // Nearest-by = the better of DuckDB's strict backward and forward ASOF
    // matches under BOTH equality conditions; `<=` on the signed micro
    // distances gives backward the tie (the engine rule).
    "q_asof_join_nearest_by" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |            date_trunc('microseconds', ts) AS ts FROM events),
        |c AS (SELECT user_id AS c_user, event_type AS c_type,
        |             date_trunc('microseconds', ts) AS c_ts,
        |             max(event_id) AS c_event_id
        |      FROM events GROUP BY 1, 2, 3),
        |b AS (SELECT e.event_id, c.c_event_id, c.c_ts FROM e
        |      ASOF LEFT JOIN c ON e.user_id = c.c_user
        |        AND e.event_type = c.c_type AND e.ts > c.c_ts),
        |f AS (SELECT e.event_id, c.c_event_id, c.c_ts FROM e
        |      ASOF LEFT JOIN c ON e.user_id = c.c_user
        |        AND e.event_type = c.c_type AND e.ts < c.c_ts)
        |SELECT e.event_id, e.user_id, e.event_type,
        |CASE WHEN f.c_event_id IS NULL THEN b.c_event_id
        |     WHEN b.c_event_id IS NULL THEN f.c_event_id
        |     WHEN epoch_us(e.ts) - epoch_us(b.c_ts)
        |          <= epoch_us(f.c_ts) - epoch_us(e.ts) THEN b.c_event_id
        |     ELSE f.c_event_id END AS c_event_id,
        |CASE WHEN f.c_event_id IS NULL THEN epoch_us(b.c_ts) - epoch_us(e.ts)
        |     WHEN b.c_event_id IS NULL THEN epoch_us(f.c_ts) - epoch_us(e.ts)
        |     WHEN epoch_us(e.ts) - epoch_us(b.c_ts)
        |          <= epoch_us(f.c_ts) - epoch_us(e.ts)
        |       THEN epoch_us(b.c_ts) - epoch_us(e.ts)
        |     ELSE epoch_us(f.c_ts) - epoch_us(e.ts) END AS delta_us
        |FROM e LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
        |ORDER BY e.event_id""".stripMargin,
    "q_asof_join_fwd" ->
      """WITH v AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id AS p_user, date_trunc('microseconds', ts) AS p_ts,
        |             max(event_id) AS p_event_id, arg_max(value, event_id) AS p_value
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT v.event_id, v.user_id, p.p_event_id, p.p_value,
        |epoch_us(p.p_ts) AS p_ts_us
        |FROM v ASOF LEFT JOIN p ON v.user_id = p.p_user AND v.ts <= p.p_ts
        |ORDER BY v.event_id""".stripMargin,
    // Nearest = the better of DuckDB's backward and forward ASOF matches,
    // `<=` on the micro distances giving backward the tie (the engine rule).
    "q_asof_join_nearest" ->
      """WITH er AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts
        |            FROM events WHERE event_type = 'error'),
        |c AS (SELECT user_id AS c_user, date_trunc('microseconds', ts) AS c_ts,
        |             max(event_id) AS c_event_id
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |b AS (SELECT er.event_id, c.c_event_id, c.c_ts FROM er
        |      ASOF LEFT JOIN c ON er.user_id = c.c_user AND er.ts >= c.c_ts),
        |f AS (SELECT er.event_id, c.c_event_id, c.c_ts FROM er
        |      ASOF LEFT JOIN c ON er.user_id = c.c_user AND er.ts <= c.c_ts)
        |SELECT er.event_id, er.user_id,
        |CASE WHEN f.c_event_id IS NULL THEN b.c_event_id
        |     WHEN b.c_event_id IS NULL THEN f.c_event_id
        |     WHEN epoch_us(er.ts) - epoch_us(b.c_ts)
        |          <= epoch_us(f.c_ts) - epoch_us(er.ts) THEN b.c_event_id
        |     ELSE f.c_event_id END AS c_event_id,
        |CASE WHEN f.c_event_id IS NULL THEN epoch_us(b.c_ts) - epoch_us(er.ts)
        |     WHEN b.c_event_id IS NULL THEN epoch_us(f.c_ts) - epoch_us(er.ts)
        |     WHEN epoch_us(er.ts) - epoch_us(b.c_ts)
        |          <= epoch_us(f.c_ts) - epoch_us(er.ts)
        |       THEN epoch_us(b.c_ts) - epoch_us(er.ts)
        |     ELSE epoch_us(f.c_ts) - epoch_us(er.ts) END AS delta_us
        |FROM er LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
        |ORDER BY er.event_id""".stripMargin,
    "q_range_join" ->
      """WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts FROM events)
        |SELECT a.event_id AS a_id, b.event_id AS b_id,
        |epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY a_id, b_id""".stripMargin)
}
