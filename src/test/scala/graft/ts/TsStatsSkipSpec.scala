package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType, TimestampType}

import java.sql.Timestamp

/** Manifest-level ts-span stats: collected at commit from parquet footers
  * (no data pages), carried forward for unchanged files, consumed by the
  * metadata-only minDt/maxDt fast path and the V2 scan's file-skipping
  * index. Soundness contract: files without spans are never skipped and
  * results are identical with or without the index. */
class TsStatsSkipSpec extends graft.SparkSpec {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("user_id", LongType),
    StructField("value", DoubleType)))

  private def t(s: String) = Timestamp.valueOf(s)

  private def mkRows(rows: Seq[(String, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (s, u, v) => (Timestamp.valueOf(s), u, v) }
      .toDF("ts", "user_id", "value")
  }

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("ts_stats_spec").toString

  private def manifest(dir: String, tab: TsTable): TsManifest =
    TsTable.readManifest(spark, dir, tab.currentVersion.get)

  test("commit records a correct closed ts span for every engine-written " +
      "file; spans carry forward; rewrites refresh them") {
    val dir = freshDir()
    val tab = TsTable.create(spark, dir, schema)
    tab.append(mkRows(Seq(
      ("2024-03-01 10:00:00", 1L, 1.0),
      ("2024-03-01 14:00:00", 2L, 2.0),
      ("2024-03-02 09:00:00", 3L, 3.0))))
    val m1 = manifest(dir, tab)
    assert(m1.files.nonEmpty)
    assert(m1.files.forall(f => m1.stats.contains(f._1)),
      s"missing spans: ${m1.files.map(_._1).filterNot(m1.stats.contains)}")
    // the recorded span equals the file's actual min/max, µs-exact
    m1.files.map(_._1).foreach { rel =>
      val df = spark.read.parquet(s"$dir/$rel")
      val r = df.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head
      assert(m1.stats(rel) == (r.getLong(0), r.getLong(1)), rel)
    }
    // a second append: old files' spans carry forward byte-identically
    tab.append(mkRows(Seq(("2024-03-03 08:00:00", 4L, 4.0))))
    val m2 = manifest(dir, tab)
    m1.files.foreach { case (p, _) => assert(m2.stats(p) == m1.stats(p)) }
    assert(m2.files.forall(f => m2.stats.contains(f._1)))
    // a rewrite verb (compact) produces NEW files with fresh spans
    tab.compactAll(targetFiles = 1)
    val m3 = manifest(dir, tab)
    assert(m3.files.forall(f => m3.stats.contains(f._1)))
    // and a delete keeps the index complete too
    tab.deleteWhere(col("user_id") === 2L)
    val m4 = manifest(dir, tab)
    assert(m4.files.forall(f => m4.stats.contains(f._1)))
  }

  test("minDt/maxDt answer from metadata when the span index is complete, " +
      "and fall back soundly when a foreign file appears") {
    val dir = freshDir()
    val tab = TsTable.create(spark, dir, schema)
    tab.append(mkRows(Seq(
      ("2024-03-01 10:00:00", 1L, 1.0),
      ("2024-03-05 17:30:00", 2L, 2.0))))
    assert(tab.minDt.get == t("2024-03-01 10:00:00"))
    assert(tab.maxDt.get == t("2024-03-05 17:30:00"))
    // drop an orphan parquet into a NEW day dir, bypassing the facade (a
    // crashed append's leftover): listing != manifest → the stats fast
    // path must disqualify itself and the scan answer must include it
    mkRows(Seq(("2024-03-09 09:00:00", 9L, 9.0)))
      .coalesce(1).write.mode("append").parquet(s"$dir/p_date=2024-03-09")
    // clean parquet writer leaves a _SUCCESS marker; the listing ignores
    // underscore files, the data file counts
    assert(tab.maxDt.get == t("2024-03-09 09:00:00"),
      "orphan outside the manifest must be seen via the fallback scan")
    assert(tab.minDt.get == t("2024-03-01 10:00:00"))
  }

  test("V2 scan skips sub-day files whose span cannot match; results stay " +
      "identical; spanless files are never skipped") {
    val dir = freshDir()
    val tab = TsTable.create(spark, dir, schema)
    // two appends land TWO files in the same day with disjoint ts slices
    tab.append(mkRows(Seq(
      ("2024-03-01 08:00:00", 1L, 1.0), ("2024-03-01 09:00:00", 2L, 2.0))))
    tab.append(mkRows(Seq(
      ("2024-03-01 18:00:00", 3L, 3.0), ("2024-03-01 19:00:00", 4L, 4.0))))
    def planned(q: DataFrame): Int = {
      def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          unwrap(a.executedPlan)
        case other => other.collectLeaves().flatMap {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            unwrap(a.executedPlan)
          case l => Seq(l)
        }
      }
      val scan = unwrap(q.queryExecution.executedPlan).collectFirst {
        case b: BatchScanExec if b.scan.isInstanceOf[ParquetScan] =>
          b.scan.asInstanceOf[ParquetScan]
      }.getOrElse(fail("no V2 parquet scan"))
      scan.fileIndex.listFiles(scan.partitionFilters, scan.dataFilters)
        .map(_.files.size).sum
    }
    def v2() = spark.read.format("graft-ts").load(dir)
    // unfiltered: both files planned
    assert(planned(v2()) == 2)
    // a morning-only range: the evening file is skipped at PLANNING time
    val morning = v2().where(col("ts").between(
      lit("2024-03-01 07:00:00").cast("timestamp"),
      lit("2024-03-01 10:00:00").cast("timestamp")))
    assert(planned(morning) == 1, "span skip must drop the evening file")
    assert(morning.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
    // the facade's live readRange rides the same span index: the
    // morning-only window plans ONE file through the explicit-list route
    val facade = tab.readRange(t("2024-03-01 07:00:00"), t("2024-03-01 10:00:00"))
    assert(facade.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
    val facadeFiles = facade.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    assert(facadeFiles == 1, s"live readRange planned $facadeFiles files, want 1")
    // boundary touch: a range ending exactly at a file's min keeps it
    val touch = v2().where(col("ts") <= lit("2024-03-01 18:00:00").cast("timestamp"))
    assert(planned(touch) == 2, "closed-span touch must keep the file")
    assert(touch.count() == 3)
    // strip the spans (simulate a pre-stats manifest): no skipping, same rows
    val m = TsTable.readManifest(spark, dir, tab.currentVersion.get)
    TsTable.writeManifest(spark, dir, m.copy(
      version = m.version + 1, stats = Map.empty))
    assert(planned(v2().where(col("ts").between(
      lit("2024-03-01 07:00:00").cast("timestamp"),
      lit("2024-03-01 10:00:00").cast("timestamp")))) == 2,
      "without spans every file must be planned")
  }

  test("pinned reads skip by span too: snapshot readRange plans only " +
      "intersecting files, and the pinned V2 scan drops them at listing") {
    val dir = freshDir()
    val tab = TsTable.create(spark, dir, schema)
    tab.append(mkRows(Seq(
      ("2024-03-01 08:00:00", 1L, 1.0), ("2024-03-01 09:00:00", 2L, 2.0))))
    tab.append(mkRows(Seq(
      ("2024-03-01 18:00:00", 3L, 3.0), ("2024-03-02 10:00:00", 4L, 4.0))))
    val pinned = tab.currentVersion.get
    // facade snapshot path: explicit file list → numFiles metric is exact
    val snap = tab.openAt(pinned)
    val narrow = snap.readRange(t("2024-03-01 07:00:00"), t("2024-03-01 10:00:00"))
    assert(narrow.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
    val scanned = narrow.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    assert(scanned == 1, s"snapshot readRange planned $scanned files, want 1")
    // pinned V2 path: the snapshot file index filters at listing time
    val pv2 = spark.read.format("graft-ts")
      .option("asOf", pinned.toString).load(dir)
      .where(col("ts").between(
        lit("2024-03-01 07:00:00").cast("timestamp"),
        lit("2024-03-01 10:00:00").cast("timestamp")))
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        unwrap(a.executedPlan)
      case other => other.collectLeaves().flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          unwrap(a.executedPlan)
        case l => Seq(l)
      }
    }
    val scan = unwrap(pv2.queryExecution.executedPlan).collectFirst {
      case b: BatchScanExec if b.scan.isInstanceOf[ParquetScan] =>
        b.scan.asInstanceOf[ParquetScan]
    }.getOrElse(fail("no V2 parquet scan"))
    val nFiles = scan.fileIndex.listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.files.size).sum
    assert(nFiles == 1, s"pinned V2 planned $nFiles files, want 1")
    assert(pv2.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
  }

  test("statsCols: per-column spans skip files on non-ts predicates; " +
      "unindexed and string columns never skip") {
    val dir = freshDir()
    val tab = TsTable.create(spark, dir, schema,
      writeOptions = TsWriteOptions(statsCols = Seq("user_id", "value")))
    // two files in one day with disjoint user_id AND value ranges
    tab.append(mkRows(Seq(
      ("2024-03-01 08:00:00", 1L, 1.0), ("2024-03-01 09:00:00", 9L, 3.0))))
    tab.append(mkRows(Seq(
      ("2024-03-01 18:00:00", 100L, 50.0), ("2024-03-01 19:00:00", 110L, 60.0))))
    val m = TsTable.readManifest(spark, dir, tab.currentVersion.get)
    assert(m.colStats.nonEmpty &&
      m.files.forall(f => m.colStats.get(f._1).exists(_.keySet ==
        Set("user_id", "value"))), m.colStats.toString)
    def planned(q: DataFrame): Int = {
      def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          unwrap(a.executedPlan)
        case other => other.collectLeaves().flatMap {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            unwrap(a.executedPlan)
          case l => Seq(l)
        }
      }
      val scan = unwrap(q.queryExecution.executedPlan).collectFirst {
        case b: BatchScanExec if b.scan.isInstanceOf[ParquetScan] =>
          b.scan.asInstanceOf[ParquetScan]
      }.getOrElse(fail("no V2 parquet scan"))
      scan.fileIndex.listFiles(scan.partitionFilters, scan.dataFilters)
        .map(_.files.size).sum
    }
    def v2() = spark.read.format("graft-ts").load(dir)
    // a point lookup on user_id plans only the covering file
    val pt = v2().where(col("user_id") === 105L)
    assert(planned(pt) == 1, "user_id span skip must drop the morning file")
    assert(pt.collect().map(_.getLong(1)).toSeq == Seq.empty) // 105 absent but in-range
    // a value range covering only the first file
    val vr = v2().where(col("value") < 10.0)
    assert(planned(vr) == 1, "value span skip must drop the evening file")
    assert(vr.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 9L))
    // both bounds plus ts compose
    val both = v2().where(col("user_id") >= 100L &&
      col("ts") >= lit("2024-03-01 12:00:00").cast("timestamp"))
    assert(planned(both) == 1)
    assert(both.count() == 2)
    // a predicate on an UNINDEXED column skips nothing
    assert(planned(v2().where(col("value") === col("value") + 0 || col("user_id").isNotNull)) == 2)
  }

  test("manifest span round-trip and pre-stats line compatibility") {
    val dir = freshDir()
    val tab = TsTable.create(spark, dir, schema)
    tab.append(mkRows(Seq(("2024-03-01 10:00:00", 1L, 1.0))))
    val m = manifest(dir, tab)
    // round-trip: what writeManifest serialized, readManifest returns
    assert(m.stats.nonEmpty)
    // hand-write an OLD-format manifest (2-field lines) — must parse with
    // empty stats
    val legacy = m.copy(version = m.version + 1, stats = Map.empty)
    TsTable.writeManifest(spark, dir, legacy)
    val back = TsTable.readManifest(spark, dir, legacy.version)
    assert(back.files == m.files && back.stats.isEmpty)
  }
}
