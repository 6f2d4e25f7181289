package graft

import graft.ts.TsTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** TsTable.compact/compactAll: content preservation, file-count reduction,
  * per-file sortedness, contiguous range splits, guard survival. */
class CompactSpec extends SparkSpec {

  private def freshStore(tag: String): (String, org.apache.hadoop.fs.FileSystem) = {
    val store = new java.io.File(sys.props("java.io.tmpdir"), s"graft_compact_$tag").toString
    val p = new Path(store)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    (store, fs)
  }

  private def partFiles(fs: org.apache.hadoop.fs.FileSystem, store: String,
                        date: String): Seq[Path] = {
    val dir = new Path(store, s"p_date=$date")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).iterator.filter(_.isFile).map(_.getPath)
      .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith(".")).toSeq
  }

  /** 4 days of sf0.001 events via 3 ordered appends cut mid-day, so the two
    * interior days hold 2 files each. */
  private def buildFragmented(tag: String): (TsTable, String,
      org.apache.hadoop.fs.FileSystem) = {
    val (store, fs) = freshStore(tag)
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(spark, sf0001).where(col("ts") < hi)
    val t = TsTable.create(spark, store, ev.schema, tsCol = "ts")
    val cut1 = lit("2024-01-02 12:00:00").cast("timestamp")
    val cut2 = lit("2024-01-03 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut1))
    t.append(ev.where(col("ts") >= cut1 && col("ts") < cut2))
    t.append(ev.where(col("ts") >= cut2))
    (t, store, fs)
  }

  test("compactAll(1): multi-file days collapse to one, content identical") {
    val (t, store, fs) = buildFragmented("all")
    assert(partFiles(fs, store, "2024-01-02").length == 2)
    assert(partFiles(fs, store, "2024-01-03").length == 2)
    val before = t.toDF.orderBy(col("event_id")).collect().toSeq
    val (minB, maxB, nB) = (t.minDt, t.maxDt, before.length)

    val done = t.compactAll(targetFiles = 1)
    assert(done == Seq("2024-01-02", "2024-01-03"), s"compacted: $done")
    for (d <- Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
      assert(partFiles(fs, store, d).length == 1, s"day $d")
    assert(t.toDF.orderBy(col("event_id")).collect().toSeq == before)
    assert(t.minDt == minB && t.maxDt == maxB && t.toDF.count() == nB)
    // idempotent: a second pass finds nothing over target
    assert(t.compactAll(targetFiles = 1).isEmpty)
    // no temp dirs left behind
    assert(!fs.listStatus(new Path(store)).exists(_.getPath.getName.startsWith("_compact_tmp")))
  }

  test("compactDays batches: several fragmented days rewrite under ONE " +
      "version commit, a pinned pre-compact reader still resolves") {
    val (t, store, fs) = buildFragmented("batchdays")
    val before = t.toDF.orderBy("event_id").collect().toSeq
    val pinned = t.currentVersion.get
    val fragmented = Seq("2024-01-02", "2024-01-03")
    fragmented.foreach(d => assert(partFiles(fs, store, d).length == 2))
    val versionsBefore = t.snapshotVersions.length
    assert(t.compactAll(targetFiles = 1) == fragmented)
    // one batched job → ONE compact version, not one per day
    val hist = t.snapshotVersions
    assert(hist.length == versionsBefore + 1)
    assert(hist.last._2 == "compact")
    fragmented.foreach(d => assert(partFiles(fs, store, d).length == 1))
    assert(t.toDF.orderBy("event_id").collect().toSeq == before)
    // the pre-compact pin resolves the archived originals
    assert(t.openAt(pinned).toDF.count() == before.size.toLong)
  }

  test("compacted file is ts-sorted within itself") {
    val (t, store, fs) = buildFragmented("sorted")
    assert(t.compact("2024-01-02"))
    val Seq(only) = partFiles(fs, store, "2024-01-02")
    val tss = spark.read.parquet(only.toString)
      .select(col(t.tsCol)).collect().map(_.getTimestamp(0))
    assert(tss.nonEmpty)
    assert(tss.zip(tss.tail).forall { case (a, b) => !b.before(a) },
      "rows in the compacted file are not ts-sorted")
  }

  test("targetFiles=2 splits a day into contiguous ts slices") {
    val (t, store, fs) = buildFragmented("split2")
    // fragment one day further so 2 is a real reduction
    assert(t.compact("2024-01-02", targetFiles = 2) ||
      partFiles(fs, store, "2024-01-02").length <= 2)
    val files = partFiles(fs, store, "2024-01-02")
    assert(files.length == 2)
    val spans = files.map { f =>
      val r = spark.read.parquet(f.toString)
        .agg(min(col(t.tsCol)), max(col(t.tsCol))).head()
      (r.getTimestamp(0), r.getTimestamp(1))
    }.sortBy(_._1.getTime)
    assert(!spans(1)._1.before(spans(0)._2),
      s"file ranges overlap: ${spans(0)} vs ${spans(1)}")
  }

  test("no-op cases return false; junk dates rejected") {
    val (t, _, _) = buildFragmented("noop")
    assert(!t.compact("2024-01-01")) // already a single file
    assert(!t.compact("2030-12-31")) // partition doesn't exist
    intercept[IllegalArgumentException](t.compact("gibberish"))
    intercept[IllegalArgumentException](t.compact("2024-01-02", targetFiles = 0))
  }

  test("dropBefore: old partitions go, newer data and the append guard survive") {
    val (t, store, fs) = buildFragmented("retention")
    val keepCount = t.readRange(
      java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
      java.sql.Timestamp.valueOf("2024-12-31 00:00:00")).count()
    assert(t.dropBefore("2024-01-02") == Seq("2024-01-01"))
    assert(partFiles(fs, store, "2024-01-01").isEmpty)
    assert(!fs.exists(new Path(store, "p_date=2024-01-01")))
    assert(t.toDF.count() == keepCount)
    // minDt moved forward to the new oldest partition; maxDt untouched
    assert(!t.minDt.get.before(java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
    // the guard still rejects pre-max appends (maxDt lives in the newest day)
    val late = Tables.events(spark, sf0001)
      .where(col("ts") < lit("2024-01-02 00:00:00").cast("timestamp"))
    intercept[IllegalArgumentException](t.append(late))
    // idempotent: nothing older remains
    assert(t.dropBefore("2024-01-02").isEmpty)
    intercept[IllegalArgumentException](t.dropBefore("junk"))
  }

  test("append monotonicity guard survives compaction") {
    val (t, _, _) = buildFragmented("guard")
    t.compactAll()
    val late = Tables.events(spark, sf0001)
      .where(col("ts") < lit("2024-01-02 00:00:00").cast("timestamp"))
    val e = intercept[IllegalArgumentException](t.append(late))
    assert(e.getMessage.contains("precedes stored max"))
  }
}
