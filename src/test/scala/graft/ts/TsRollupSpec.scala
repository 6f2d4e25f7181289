package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType, TimestampType}

import java.sql.Timestamp

/** The incrementally-synced rollup: cursor in the commit log, per-sync
  * cost bounded by the changed span, partial buckets recompute, expired
  * cursors rebuild. */
class TsRollupSpec extends graft.SparkSpec {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("user_id", LongType),
    StructField("value", DoubleType)))

  private def mkRows(rows: Seq[(String, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (s, u, v) => (Timestamp.valueOf(s), u, v) }
      .toDF("ts", "user_id", "value")
  }

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("ts_rollup_spec").toString

  private def expected(src: TsTable): Seq[(Long, Long, Double, Double)] =
    src.toDF
      .groupBy(expr("(unix_micros(ts) div 3600000000) * 3600000000").as("b"))
      .agg(count(lit(1)).as("n"), min("value").as("mn"), max("value").as("mx"))
      .orderBy("b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq

  private def actual(dst: TsTable): Seq[(Long, Long, Double, Double)] =
    dst.toDF.select(unix_micros(col("ts")), col("n_rows"), col("v_min"),
        col("v_max"))
      .orderBy("ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq

  test("sync racing base-table rewrites, 10 rounds: a continuously-syncing " +
      "thread rides out deleteWhere/compact swaps of the synced window via " +
      "sync's internal retry contract — no error escapes, and the final " +
      "rollup equals the full aggregate exactly") {
    val srcDir = freshDir(); val dstDir = freshDir()
    val src = TsTable.create(spark, srcDir, schema)
    src.append(mkRows(Seq(
      ("2024-03-02 00:05:00", 1L, 1.0), ("2024-03-02 00:35:00", 2L, 2.0))))
    TsRollup.sync(src, dstDir, 3600L, "value")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val syncer = new Thread(() => {
      try while (!stop.get()) {
        TsRollup.sync(TsTable.open(spark, srcDir), dstDir, 3600L, "value")
        Thread.sleep(5)
      } catch { case e: Throwable => errors.add(e) }
    })
    syncer.start()
    try {
      for (round <- 1 to 10) {
        val h = f"$round%02d"
        // append a fresh hour (monotonic), then rewrite INSIDE the synced
        // window twice — a predicate delete and a compaction swap — while
        // the syncer reads whatever state it catches
        TsTable.open(spark, srcDir).append(mkRows(Seq(
          (s"2024-03-02 $h:05:00", 1L, round + 0.25),
          (s"2024-03-02 $h:20:00", 2L, round + 0.5),
          (s"2024-03-02 $h:35:00", 3L, round + 0.75),
          (s"2024-03-02 $h:50:00", 4L, round + 1.0))))
        val hh = TsTable.open(spark, srcDir)
        assert(hh.deleteWhere(col("ts") ===
          Timestamp.valueOf(s"2024-03-02 $h:20:00")) == 1L)
        hh.compactAll(1)
      }
    } finally { stop.set(true); syncer.join(120000) }
    assert(!syncer.isAlive, "the syncer timed out")
    import scala.jdk.CollectionConverters._
    assert(errors.asScala.isEmpty,
      s"sync must absorb every race internally: ${errors.asScala.headOption}")
    // convergence: one quiescent sync lands the final state exactly
    val srcFinal = TsTable.open(spark, srcDir)
    val dst = TsRollup.sync(srcFinal, dstDir, 3600L, "value")
    assert(actual(dst) == expected(srcFinal),
      "the racing syncs must converge to the exact full aggregate")
  }

  test("sync after each append keeps the rollup equal to the full " +
      "aggregate; partial buckets recompute; no-change syncs commit nothing") {
    val srcDir = freshDir(); val dstDir = freshDir()
    val src = TsTable.create(spark, srcDir, schema)
    // batch 1 ends MID-bucket (10:00–11:00 split across appends)
    src.append(mkRows(Seq(
      ("2024-03-01 09:10:00", 1L, 1.0), ("2024-03-01 10:20:00", 2L, 2.0))))
    var dst = TsRollup.sync(src, dstDir, 3600L, "value")
    assert(actual(dst) == expected(src))
    // batch 2 adds to the SAME 10:00 bucket (partial-bucket recompute)
    // and opens new ones
    src.append(mkRows(Seq(
      ("2024-03-01 10:40:00", 3L, 30.0), ("2024-03-01 12:05:00", 4L, 4.0))))
    dst = TsRollup.sync(src, dstDir, 3600L, "value")
    assert(actual(dst) == expected(src))
    assert(dst.toDF.where(unix_micros(col("ts")) ===
        Timestamp.valueOf("2024-03-01 10:00:00").getTime * 1000L)
      .head.getLong(1) == 2L, "the 10:00 bucket must hold both rows")
    // a no-change sync commits nothing
    val v = dst.currentVersion.get
    dst = TsRollup.sync(src, dstDir, 3600L, "value")
    assert(dst.currentVersion.get == v)
    // a maintenance-only source commit advances the cursor without rows
    src.compactAll(targetFiles = 1)
    dst = TsRollup.sync(src, dstDir, 3600L, "value")
    assert(dst.currentVersion.get == v + 1)
    assert(dst.snapshotVersions.last._2 == "rollup")
    assert(actual(dst) == expected(src))
  }

  test("a sync window holding delete/update stays incremental AND exact: " +
      "shrunk buckets recompute, emptied buckets disappear, out-of-span " +
      "buckets never rewrite") {
    val srcDir = freshDir(); val dstDir = freshDir()
    val src = TsTable.create(spark, srcDir, schema)
    src.append(mkRows(Seq(
      ("2024-03-01 09:10:00", 1L, 1.0), ("2024-03-01 09:40:00", 2L, 2.0),
      ("2024-03-01 10:20:00", 3L, 3.0),
      ("2024-03-02 11:05:00", 4L, 4.0), ("2024-03-02 11:45:00", 5L, 5.0))))
    var dst = TsRollup.sync(src, dstDir, 3600L, "value")
    assert(actual(dst) == expected(src))
    val untouched = dst.toDF.where(unix_micros(col("ts")) ===
      Timestamp.valueOf("2024-03-02 11:00:00").getTime * 1000L).head
    // delete EMPTIES the 10:00 bucket and SHRINKS the 09:00 bucket;
    // update rescales one 11:00-day-2 row
    src.deleteWhere(col("user_id").isin(2L, 3L))
    src.updateWhere(col("user_id") === 5L, Map("value" -> lit(50.0)))
    dst = TsRollup.sync(src, dstDir, 3600L, "value")
    assert(actual(dst) == expected(src),
      "rollup must equal the full aggregate after DML sync")
    assert(!actual(dst).exists(_._1 ==
      Timestamp.valueOf("2024-03-01 10:00:00").getTime * 1000L),
      "the emptied bucket must disappear, not go stale")
    // incremental proof: the metadata span covers only day-1 09:00-10:59
    // and day-2 11:00 — i.e. the sync never produced a full-rebuild
    // delete-all ("delete" versions on dst exist, but the first one's
    // feed must not have touched every bucket). Cheap proxy: the rollup's
    // history shows delete+backfill/merge, and the day-2 11:00 bucket
    // row REMAINS CORRECT including the update.
    assert(actual(dst).exists(r => r._1 ==
      Timestamp.valueOf("2024-03-02 11:00:00").getTime * 1000L &&
      r._2 == 2L && r._4 == 50.0))
    assert(untouched.getLong(1) == 2L)
    // append-after-DML keeps syncing incrementally
    src.append(mkRows(Seq(("2024-03-03 08:30:00", 6L, 6.0))))
    dst = TsRollup.sync(src, dstDir, 3600L, "value")
    assert(actual(dst) == expected(src))
  }

  test("a retention drop clears its buckets from the rollup") {
    val srcDir = freshDir(); val dstDir = freshDir()
    val src = TsTable.create(spark, srcDir, schema)
    src.append(mkRows(Seq(
      ("2024-03-01 09:10:00", 1L, 1.0),
      ("2024-03-02 10:10:00", 2L, 2.0), ("2024-03-03 11:10:00", 3L, 3.0))))
    var dst = TsRollup.sync(src, dstDir, 3600L, "value")
    assert(actual(dst).size == 3)
    src.dropBefore("2024-03-03")
    dst = TsRollup.sync(src, dstDir, 3600L, "value")
    assert(actual(dst) == expected(src))
    assert(actual(dst).size == 1, "dropped days' buckets must be gone")
  }

  test("provablyUniqueOn: aggregate-backed merge sources prove key " +
      "uniqueness (dup-check job skipped); anything unprovable keeps it") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val raw = Seq((1L, "a", 1.0), (1L, "a", 2.0), (2L, "b", 3.0))
      .toDF("k", "g", "v")
    // grouped by the key → provably unique, through select/filter/sort/alias
    val agg = raw.groupBy(col("k")).agg(sum(col("v")).as("s"))
    assert(TsTable.provablyUniqueOn(agg, Seq("k")))
    assert(TsTable.provablyUniqueOn(
      agg.select(col("k").as("key"), col("s")).where(col("s") > 0)
        .orderBy(col("key")), Seq("key")))
    // grouping by an EXPRESSION exposed under an alias (the TsRollup
    // bucketAgg shape: groupBy(timestamp_micros(...).as("ts")))
    val exprAgg = raw.groupBy((col("k") * 2).as("k2"))
      .agg(count(lit(1)).as("n"))
    assert(TsTable.provablyUniqueOn(exprAgg, Seq("k2")))
    // global aggregate: one row, unique on anything it outputs
    assert(TsTable.provablyUniqueOn(
      raw.agg(count(lit(1)).as("n")), Seq("n")))
    // distinct over exactly the keys
    assert(TsTable.provablyUniqueOn(
      raw.select(col("k"), col("g")).distinct(), Seq("k", "g")))
    // NOT provable: raw rows, a key SUBSET of the grouping set, a key
    // computed AFTER the aggregate, distinct wider than the keys, a join
    assert(!TsTable.provablyUniqueOn(raw, Seq("k")))
    assert(!TsTable.provablyUniqueOn(
      raw.groupBy(col("k"), col("g")).agg(sum(col("v")).as("s")), Seq("k")))
    assert(!TsTable.provablyUniqueOn(
      agg.select((col("k") % 2).as("k"), col("s")), Seq("k")))
    assert(!TsTable.provablyUniqueOn(
      raw.select(col("k"), col("g")).distinct(), Seq("k")))
    assert(!TsTable.provablyUniqueOn(
      agg.join(raw, Seq("k")), Seq("k")))
  }

  test("an expired cursor degrades to a full rebuild, not staleness") {
    val srcDir = freshDir(); val dstDir = freshDir()
    val src = TsTable.create(spark, srcDir, schema)
    src.append(mkRows(Seq(("2024-03-01 09:10:00", 1L, 1.0))))
    TsRollup.sync(src, dstDir, 3600L, "value")
    // blow away the cursor's manifest on the source
    src.append(mkRows(Seq(("2024-03-02 09:10:00", 2L, 2.0))))
    src.append(mkRows(Seq(("2024-03-03 09:10:00", 3L, 3.0))))
    src.expireSnapshots(keepLast = 1)
    val dst = TsRollup.sync(src, dstDir, 3600L, "value")
    assert(actual(dst) == expected(src))
  }
}
