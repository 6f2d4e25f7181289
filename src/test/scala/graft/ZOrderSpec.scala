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
