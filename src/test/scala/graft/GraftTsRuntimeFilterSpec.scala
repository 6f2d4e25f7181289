package graft

import graft.sources.{GraftTsRuntimeFilteredScan, GraftTsV2Table}
import graft.ts.{TsTable, TsWriteOptions}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Runtime file-group filtering on the graft-ts V2 scan
  * ([[GraftTsRuntimeFilteredScan]]): when the table is equi-joined against
  * a selective side, the materialized join keys arrive as V2 IN predicates
  * BEFORE tasks launch and prune files through the Bloom/span indexes —
  * dynamic partition pruning for a table whose partition column is
  * connector-internal. Covers: direct filter() pruning via Bloom bits and
  * via declared-stats spans, conservative no-ops (unknown column,
  * unindexed file), end-to-end DPP injection on a broadcast join with
  * result parity, and the IN-derived static span bounds. */
class GraftTsRuntimeFilterSpec extends SparkSpec {

  private def freshStore(tag: String): (String, org.apache.hadoop.fs.FileSystem) = {
    val store = new java.io.File(sys.props("java.io.tmpdir"), s"graft_rtf_$tag").toString
    val p = new Path(store)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    (store, fs)
  }

  /** Three single-day appends with DISJOINT user_id ranges per day (day d
    * holds ids [1000·d, 1000·d + 49]) so the pruning verdict is exact. */
  private def build(tag: String, opts: TsWriteOptions)
      : (TsTable, String) = {
    val (store, _) = freshStore(tag)
    import spark.implicits._
    def day(d: Int): DataFrame =
      (0 until 200).map { i =>
        (java.sql.Timestamp.valueOf(f"2024-01-0$d%d 00:00:${i % 60}%02d"),
          1000L * d + i % 50, i.toDouble)
      }.toDF("ts", "user_id", "value")
    val t = TsTable.create(spark, store, day(1).schema, tsCol = "ts",
      writeOptions = opts)
    t.append(day(1)); t.append(day(2)); t.append(day(3))
    (t, store)
  }

  private def fileCount(scan: org.apache.spark.sql.connector.read.Scan): Int =
    scan.toBatch.planInputPartitions().map {
      case fp: FilePartition => fp.files.length
      case _ => 0
    }.sum

  private def freshScan(t: TsTable)
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =
    new GraftTsV2Table(spark, t)
      .newScanBuilder(CaseInsensitiveStringMap.empty).build()
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]

  test("a runtime IN predicate prunes files through the Bloom index before tasks launch") {
    val (t, _) = build("bloom", TsWriteOptions(bloomCols = Seq("user_id")))
    val scan = freshScan(t)
    assert(scan.isInstanceOf[GraftTsRuntimeFilteredScan])
    assert(fileCount(scan) == 3, "unfiltered scan plans every file")
    val rtf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
    assert(rtf.filterAttributes().map(_.fieldNames.last).toSet
      .contains("user_id"))
    rtf.filter(Array(new Predicate("IN",
      Array(Expressions.column("user_id"), Expressions.literal(2007L)))))
    assert(fileCount(scan) == 1,
      "the runtime keys must prune to the single file whose Bloom admits them")
  }

  test("after renameColumn on the Bloom column: runtime probes under the " +
      "NEW name prune files written post-rename, keep (never wrongly skip) " +
      "pre-rename files, and results stay exact") {
    val (t, store) = build("renbloom", TsWriteOptions(bloomCols = Seq("user_id")))
    val renamed = t.renameColumn("user_id", "uid")
    import spark.implicits._
    // a post-rename day: its files harvest Bloom bits under "uid"
    renamed.append((0 until 200).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-04 00:00:${i % 60}%02d"),
        4000L + i % 50, i.toDouble)
    }.toDF("ts", "uid", "value"))
    val t2 = TsTable.open(spark, store)
    val scan = freshScan(t2)
    assert(scan.isInstanceOf[GraftTsRuntimeFilteredScan])
    assert(fileCount(scan) == 4)
    val rtf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
    assert(rtf.filterAttributes().map(_.fieldNames.last).toSet.contains("uid"))
    // a probe hitting only the POST-rename day: its file admits, the three
    // pre-rename files stay (their sidecar entries are keyed by the
    // harvest-time name — unskippable under the new label, never wrong)
    rtf.filter(Array(new Predicate("IN",
      Array(Expressions.column("uid"), Expressions.literal(4007L)))))
    val kept = fileCount(scan)
    assert(kept <= 4 && kept >= 1, s"kept $kept of 4")
    // correctness is the contract: the V2 read under the new label equals
    // the facade count across BOTH generations
    val v2 = spark.read.format("graft-ts").load(store)
    assert(v2.where(col("uid") === 2007L).count() ==
      t2.toDF.where(col("uid") === 2007L).count())
    assert(v2.where(col("uid") === 4007L).count() ==
      t2.toDF.where(col("uid") === 4007L).count())
    assert(t2.lookupEq("uid", Seq(2007L)).count() > 0 &&
      t2.lookupEq("uid", Seq(4007L)).count() > 0)
  }

  test("a runtime IN predicate prunes files through declared-stats spans (no Bloom declared)") {
    val (t, _) = build("span", TsWriteOptions(statsCols = Seq("user_id")))
    val scan = freshScan(t)
    val rtf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
    rtf.filter(Array(new Predicate("IN",
      Array(Expressions.column("user_id"),
        Expressions.literal(1003L), Expressions.literal(1040L)))))
    // both probes live in day 1's disjoint span; days 2-3 are excluded by
    // the IN-derived [min, max] bound
    assert(fileCount(scan) == 1)
  }

  test("conservative no-ops: unknown predicate shapes and unindexed tables keep every file") {
    val (t, _) = build("noop", TsWriteOptions(bloomCols = Seq("user_id")))
    val scan = freshScan(t)
    val rtf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
    // a predicate on a column the index never declared: contributes nothing
    rtf.filter(Array(new Predicate("IN",
      Array(Expressions.column("value"), Expressions.literal(7.0)))))
    // an opaque predicate shape: contributes nothing
    rtf.filter(Array(new Predicate("IS_NOT_NULL",
      Array(Expressions.column("user_id")))))
    assert(fileCount(scan) == 3, "no usable runtime key may never skip")
  }

  test("end-to-end: a broadcast join against a selective dim plants a dynamicpruning filter and results match") {
    val (t, store) = build("e2e", TsWriteOptions(bloomCols = Seq("user_id")))
    import spark.implicits._
    // the dim must be a REAL source (not a LocalRelation): Catalyst folds a
    // filter over local rows away at optimize time, and the pruning rule
    // needs to SEE the selective Filter node on the filtering side
    val dimPath = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_rtf_e2e_dim").toString
    Seq((2007L, "gold"), (2013L, "gold"), (1001L, "silver"))
      .toDF("user_id", "tier")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val fact = spark.read.format("graft-ts").load(store)
    val q = fact.join(broadcast(dim.where(col("tier") === "gold")), Seq("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
    val got = q.collect().head
    // oracle on the facade read
    val want = t.toDF.join(dim.where(col("tier") === "gold"), Seq("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv")).collect().head
    assert(got == want, s"join result diverged: $got vs $want")
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.toLowerCase.contains("dynamicpruning"),
      s"expected a runtime pruning filter on the V2 scan:\n$planStr")
  }

  test("the registered q_ts_runtime_prune query plans a dynamicpruning filter on its V2 scan") {
    val q = graft.operators.TimeSeriesPack.runtimePruneJoin(spark, sf0001)
    q.collect() // force the final adaptive plan
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.toLowerCase.contains("dynamicpruning"),
      s"q_ts_runtime_prune lost its runtime pruning filter:\n$planStr")
  }

  test("reported scan statistics shrink with pruning: a narrow range read can be broadcast by size") {
    val (_, store) = build("stats", TsWriteOptions(bloomCols = Seq("user_id")))
    def scanBytes(df: org.apache.spark.sql.DataFrame): Long =
      V2ScanAccess.parquetScan(df.queryExecution.executedPlan)
        .estimateStatistics().sizeInBytes().orElse(Long.MaxValue)
    val full = scanBytes(spark.read.format("graft-ts").load(store))
    // the upper bound stays strictly inside day 2: a bound at exactly the
    // next midnight conservatively keeps the boundary file (closed-span
    // widening), which is correct but not what this ratio assertion pins
    val narrow = scanBytes(spark.read.format("graft-ts").load(store)
      .where(col("ts") >= java.sql.Timestamp.valueOf("2024-01-02 00:00:00") &&
        col("ts") <= java.sql.Timestamp.valueOf("2024-01-02 12:00:00")))
    // the estimate must track the PRUNED file set (1 of 3 days), not the
    // table size — this is what lets the planner auto-broadcast a narrow
    // slice of a 100 TB table without a hint
    assert(narrow > 0 && narrow < full,
      s"narrow=$narrow full=$full: statistics ignore partition pruning")
    assert(narrow <= full / 2, s"narrow=$narrow full=$full: expected ~1/3")
  }

  test("parquet aggregate pushdown works through the connector: MIN/MAX/COUNT answer from footers") {
    val (t, store) = build("aggpush", TsWriteOptions())
    val key = "spark.sql.parquet.aggregatePushdown"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val q = spark.read.format("graft-ts").load(store)
        .agg(min(col("user_id")).as("mn"), max(col("user_id")).as("mx"),
          count(lit(1)).as("n"))
      val scan = V2ScanAccess.parquetScan(q.queryExecution.executedPlan)
      val meta = scan.description()
      assert(meta.contains(
        "PushedAggregation: [MIN(user_id), MAX(user_id), COUNT(*)]"),
        s"aggregates not pushed to footers:\n$meta")
      val r = q.collect().head
      assert(r.getLong(0) == 1000L && r.getLong(1) == 3049L && r.getLong(2) == 600L)
    } finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("static IN predicates now derive span bounds too: WHERE ts IN (...) prunes by file span") {
    val (t, store) = build("statictsin", TsWriteOptions())
    val q = spark.read.format("graft-ts").load(store)
      .where(col("ts").isin(
        java.sql.Timestamp.valueOf("2024-01-02 00:00:05"),
        java.sql.Timestamp.valueOf("2024-01-02 00:00:07")))
    val scan = V2ScanAccess.parquetScan(q.queryExecution.executedPlan)
    val files = scan.fileIndex
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.files.length).sum
    assert(files == 1, s"ts IN should span-prune to day 2's file, kept $files")
    assert(q.count() == t.toDF.where(col("ts").isin(
      java.sql.Timestamp.valueOf("2024-01-02 00:00:05"),
      java.sql.Timestamp.valueOf("2024-01-02 00:00:07"))).count())
  }
}
