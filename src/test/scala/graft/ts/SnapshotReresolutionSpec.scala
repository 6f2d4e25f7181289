package graft.ts

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The pinned-frame re-resolution contract a racing reader depends on
  * (TsRollup.sync pins every data read to the cursor-target version):
  * a DataFrame built from a snapshot keeps serving its exact rows after
  * concurrent maintenance displaces the underlying files, because each
  * task re-resolves live↔archive at OPEN time through the
  * archive-resolving format — no rebuild, no caller retry, and never a
  * silently narrower result. */
class SnapshotReresolutionSpec extends graft.SparkSpec {

  private def hourRows(h: Int) = {
    import spark.implicits._
    (0 until 4).map(m =>
      (Timestamp.valueOf(f"2024-03-02 $h%02d:${m * 15}%02d:00"), (h * 100 + m).toLong))
      .toDF("ts", "v")
  }

  test("a pinned frame built over live files keeps serving every row " +
      "after the file is archived out from under it (the mirror fallback)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap_mirror").toString
    val df = (0 until 8).map(m =>
      (Timestamp.valueOf(f"2024-03-02 01:${m * 5}%02d:00"), m.toLong))
      .toDF("ts", "v")
    val t = TsTable.create(spark, dir, df.schema, tsCol = "ts")
    t.append(df)
    val pinned = t.openAt(t.currentVersion.get)
    val frame = pinned.readRange(
      Timestamp.valueOf("2024-03-02 01:00:00"),
      Timestamp.valueOf("2024-03-02 01:59:59"))
    assert(frame.count() == 8) // evaluation 1: live
    // a concurrent compact's swap, reduced to its filesystem effect:
    // the live file moves into the archive under the same relative path
    val dayDir = new Path(dir, "p_date=2024-03-02")
    val fs = dayDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = fs.listStatus(dayDir).filter(_.isFile)
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).head
    val arch = new Path(dir, s"_ts_archive/p_date=2024-03-02/$victim")
    fs.mkdirs(arch.getParent)
    assert(fs.rename(new Path(dayDir, victim), arch))
    assert(frame.count() == 8,
      "the already-built frame must re-resolve through the archive")
  }

  test("span-skip under SHARED BASENAMES: one append task writes several " +
      "day partitions with identical part-file names — the snapshot skip " +
      "index keys spans by RELATIVE PATH, so a ts range over the middle " +
      "days serves exactly its rows (basename keying collapsed all spans " +
      "onto one day and pruned everything)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap_basename").toString
    // ONE append spanning four days: the day-partitioned write names each
    // partition's file part-00000-<jobUUID> — identical across all four
    val df = Seq(
      ("2024-03-01 10:00:00", 1L), ("2024-03-02 10:00:00", 2L),
      ("2024-03-03 10:00:00", 3L), ("2024-03-04 10:00:00", 4L))
      .map { case (s, u) => (Timestamp.valueOf(s), u) }.toDF("ts", "user_id")
    val t = TsTable.create(spark, dir, df.schema, tsCol = "ts")
    t.append(df)
    val names = (1 to 4).map { d =>
      val p = new Path(dir, f"p_date=2024-03-0$d%d")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).filter(_.isFile).map(_.getPath.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith(".")).head
    }
    assert(names.distinct.size == 1,
      s"fixture must exercise the shared-basename layout, got $names")
    val snap = t.openAt(t.currentVersion.get)
    val got = snap.readRange(
      Timestamp.valueOf("2024-03-02 00:00:00"),
      Timestamp.valueOf("2024-03-03 23:00:00"))
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(got == Seq(2L, 3L), s"skip index must not collapse spans: $got")
    // and the LIVE span fast path (which serves through the same index)
    assert(t.readRange(
      Timestamp.valueOf("2024-03-02 00:00:00"),
      Timestamp.valueOf("2024-03-03 23:00:00"))
      .collect().map(_.getLong(1)).sorted.toSeq == Seq(2L, 3L))
  }

  test("a pinned frame survives REAL maintenance verbs (delete + compact) " +
      "run between its evaluations, and a fresh frame off the same pinned " +
      "version agrees") {
    val dir = java.nio.file.Files.createTempDirectory("snap_verbs").toString
    val t = TsTable.create(spark, dir, hourRows(0).schema, tsCol = "ts")
    t.append(hourRows(0))
    (1 to 2).foreach { h =>
      val hh = TsTable.open(spark, dir)
      hh.append(hourRows(h))
      hh.deleteWhere(col("ts") === Timestamp.valueOf(f"2024-03-02 $h%02d:15:00"))
      hh.compactAll(1)
    }
    val h3 = TsTable.open(spark, dir)
    h3.append(hourRows(3)) // pinned version: compacted day file + fresh append
    val pinned = h3.openAt(h3.currentVersion.get)
    def range() = pinned.readRange(
      Timestamp.valueOf("2024-03-02 01:00:00"),
      Timestamp.valueOf("2024-03-02 03:59:59"))
    val frame = range()
    val n1 = frame.count()
    assert(n1 == 10) // hours 1-3: 4+3+3 post-delete... 3+3+4
    // the next maintenance round displaces BOTH pinned files
    val h4 = TsTable.open(spark, dir)
    h4.deleteWhere(col("ts") === Timestamp.valueOf("2024-03-02 03:15:00"))
    h4.compactAll(1)
    assert(frame.count() == n1, "stale frame must re-resolve in place")
    assert(range().count() == n1, "fresh frame off the pin must agree")
  }
}
