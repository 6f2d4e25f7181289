package graft

import graft.operators.{StoreDirs, TimeSeriesPack, ZOrderLayout}
import org.apache.spark.sql.functions._

/** Z-order clustered layout: correctness (clustered rectangle == plain
  * scan), the scale claim (bucket directories prune at file listing), and
  * the geometry that makes pruning SAFE (every row's rank pair lies inside
  * its bucket's decoded bounding box).
  */
class ZOrderSpec extends SparkSpec {

  private def store(dir: String): String = {
    // materialize via the registered query (exercises buildIfNeeded too)
    TimeSeriesPack.zorderRect(spark, dir).collect()
    StoreDirs.stable(spark, s"graft_zorder_${StoreDirs.pathKey(dir)}")
  }

  test("clustered rectangle query equals the unclustered scan") {
    val got = TimeSeriesPack.zorderRect(spark, sf0001)
      .collect().map(_.getLong(0)).toSeq
    val ev = Tables.events(spark, sf0001)
    val Array(mm) = ev.agg(
      min(col("user_id").cast("double")), max(col("user_id").cast("double")),
      min(col("value")), max(col("value"))).collect()
    val (x0, x1, y0, y1) =
      (mm.getDouble(0), mm.getDouble(1), mm.getDouble(2), mm.getDouble(3))
    val exp = ev.where(
      col("user_id") >= (x0 + 0.2 * (x1 - x0)) &&
        col("user_id") <= (x0 + 0.45 * (x1 - x0)) &&
        col("value") >= (y0 + 0.1 * (y1 - y0)) &&
        col("value") <= (y0 + 0.4 * (y1 - y0)))
      .select(col("event_id")).orderBy(col("event_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == exp)
    assert(got.nonEmpty, "rectangle must select something at sf0.001")
  }

  test("rectangle prunes bucket directories at the file-listing level") {
    val path = store(sf0001)
    val m = ZOrderLayout.readMeta(spark, path)
    // the raw rect query (no determinism sort) keeps the plan non-adaptive,
    // so the scan leaf's numFiles metric is directly observable
    val q = ZOrderLayout.queryRect(spark, path, "user_id", "value",
      m.xMin + 0.2 * (m.xMax - m.xMin), m.xMin + 0.45 * (m.xMax - m.xMin),
      m.yMin + 0.1 * (m.yMax - m.yMin), m.yMin + 0.4 * (m.yMax - m.yMin))
    q.collect()
    val plan = q.queryExecution.executedPlan
    assert(plan.toString.contains("PartitionFilters"), plan.toString)
    val scanned = plan.collectLeaves()
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    val total = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("zbucket="))
      .map(d => d.listFiles().count(_.getName.startsWith("part-"))).sum
    assert(scanned > 0 && scanned < total,
      s"scanned $scanned of $total files — zbucket dirs not pruned")
  }

  test("every row's rank pair lies inside its bucket's decoded box") {
    val path = store(sf0001)
    val ev = Tables.events(spark, sf0001)
    val Array(mm) = ev.agg(
      min(col("user_id").cast("double")), max(col("user_id").cast("double")),
      min(col("value")), max(col("value"))).collect()
    val (xMin, xMax, yMin, yMax) =
      (mm.getDouble(0), mm.getDouble(1), mm.getDouble(2), mm.getDouble(3))
    val rows = spark.read.parquet(path)
      .select(col("zbucket"), col("user_id").cast("double"), col("value"))
      .collect()
    assert(rows.map(_.getInt(0)).distinct.length > 1, "multiple buckets")
    rows.foreach { r =>
      val (bxLo, bxHi, byLo, byHi) = ZOrderLayout.bucketBox(r.getInt(0))
      val rx = ZOrderLayout.rankOf(r.getDouble(1), xMin, xMax)
      val ry = ZOrderLayout.rankOf(r.getDouble(2), yMin, yMax)
      assert(rx >= bxLo && rx <= bxHi && ry >= byLo && ry <= byHi,
        s"row rank ($rx,$ry) escapes bucket ${r.getInt(0)} box")
    }
  }

  test("3-column z-order: a 3-predicate box prunes bucket directories AND " +
      "equals the plain scan exactly") {
    val cols = Seq("user_id", "value", "event_id")
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("value"))
    val path = java.nio.file.Files.createTempDirectory("zorder3d").toString + "/store"
    ZOrderLayout.buildN(ev, cols, path)
    val m = ZOrderLayout.readMetaN(spark, path)
    assert(m.k == 3)
    def at(j: Int, f: Double) =
      m.bounds(j)._1 + f * (m.bounds(j)._2 - m.bounds(j)._1)
    val lo = Seq(at(0, 0.2), at(1, 0.1), at(2, 0.15))
    val hi = Seq(at(0, 0.45), at(1, 0.4), at(2, 0.6))
    val q = ZOrderLayout.queryBox(spark, path, cols, lo, hi)
    q.collect()
    // pruning fires on the THIRD predicate dimension too: a 2-D layout
    // could never prune on event_id
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    val total = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("zbucket="))
      .map(d => d.listFiles().count(_.getName.startsWith("part-"))).sum
    assert(scanned > 0 && scanned < total,
      s"scanned $scanned of $total files — 3-D zbucket dirs not pruned")
    // conservativeness: byte-identical to the unclustered scan
    val got = q.select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    val exp = ev.where(
      col("user_id") >= lo(0) && col("user_id") <= hi(0) &&
        col("value") >= lo(1) && col("value") <= hi(1) &&
        col("event_id") >= lo(2) && col("event_id") <= hi(2))
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == exp)
    assert(got.nonEmpty, "3-D box must select something at sf0.001")
  }

  test("TsTable.compact(clusterBy): a governed day re-clusters along the " +
      "Morton curve in place — content identical, and a 2-predicate " +
      "rectangle skips files via the existing colStats spans") {
    import graft.ts.{TsTable, TsWriteOptions}
    val dir = new java.io.File(sys.props("java.io.tmpdir"), "graft_tszorder").toString
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val ev = Tables.events(spark, sf0001)
      .where(col("ts") < lit("2024-01-02 00:00:00").cast("timestamp"))
    val t = TsTable.create(spark, dir, ev.schema, tsCol = "ts",
      writeOptions = TsWriteOptions(statsCols = Seq("user_id", "value")))
    t.append(ev, filesPerDay = 8)
    val before = t.toDF.orderBy(col("event_id")).collect().toSeq
    val nFiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir, "p_date=2024-01-01"))
      .count(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    assert(nFiles >= 4, s"fixture expects a fragmented day, got $nFiles files")
    // re-cluster the day by (user_id, value) WITHOUT leaving the format —
    // same file count target, different sort axis
    assert(t.compact("2024-01-01", targetFiles = nFiles,
      clusterBy = Seq("user_id", "value")))
    val re = TsTable.open(spark, dir)
    assert(re.snapshotVersions.last._2 == "compact")
    assert(re.toDF.orderBy(col("event_id")).collect().toSeq == before,
      "re-clustering must be content-preserving")
    // rectangle on the clustered dims through the V2 scan: the commit's
    // colStats harvest recorded per-file (user_id, value) spans, and the
    // Morton sort made those spans TILES — the corner rectangle must
    // plan a strict subset of the day's files
    val mm = re.toDF.agg(min(col("user_id")), max(col("user_id")),
      min(col("value")), max(col("value"))).head
    val (uLo, uHi, vLo, vHi) =
      (mm.getLong(0), mm.getLong(1), mm.getDouble(2), mm.getDouble(3))
    val uCut = uLo + ((uHi - uLo) * 0.25).toLong
    val vCut = vLo + (vHi - vLo) * 0.25
    val rect = col("user_id") <= uCut && col("value") <= vCut
    val q = spark.read.format("graft-ts").load(dir).where(rect)
    val scan = V2ScanAccess.parquetScan(q.queryExecution.executedPlan)
    val planned = scan.fileIndex
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.files.length).sum
    assert(planned > 0 && planned < nFiles,
      s"corner rectangle planned $planned of $nFiles files — no span skip")
    // and the skip is conservative: same rows as the facade full scan
    assert(q.select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq ==
      re.toDF.where(rect).select(col("event_id")).collect()
        .map(_.getLong(0)).sorted.toSeq)
  }

  test("buildIfNeeded amortizes: unchanged input does not rebuild") {
    store(sf0001) // ensure built
    val fp = graft.operators.IvfIndex.inputFingerprint(
      spark, s"$sf0001/events.parquet")
    val built = ZOrderLayout.buildIfNeeded(
      Tables.events(spark, sf0001).select(col("event_id"), col("user_id"),
        col("value"), col("ts")),
      "user_id", "value", store(sf0001), fp)
    assert(!built, "same fingerprint must reuse the existing layout")
  }
}
