package graft

import graft.ts.TsTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** TsTable snapshot/time-travel: version commits on every mutation verb,
  * pinned readers surviving compact + retention (the concurrent-reader
  * contract), per-version schema service across evolution, history expiry,
  * and the size integrity guard. */
class SnapshotSpec extends SparkSpec {

  private def freshStore(tag: String): (String, org.apache.hadoop.fs.FileSystem) = {
    val store = new java.io.File(sys.props("java.io.tmpdir"), s"graft_snap_$tag").toString
    val p = new Path(store)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    (store, fs)
  }

  /** 4 days of sf0.001 events via 2 ordered appends cut mid-day. */
  private def build(tag: String): (TsTable, String, org.apache.hadoop.fs.FileSystem) = {
    val (store, fs) = freshStore(tag)
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    val ev = Tables.events(spark, sf0001).where(col("ts") < hi)
    val t = TsTable.create(spark, store, ev.schema, tsCol = "ts")
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cut))
    t.append(ev.where(col("ts") >= cut))
    (t, store, fs)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq

  test("every mutation verb commits a version; actions are recorded in order") {
    val (t, _, _) = build("hist")
    assert(t.snapshotVersions.map(_._2) == Seq("create", "append", "append"))
    assert(t.currentVersion.contains(3L))
    t.compactAll(targetFiles = 1) // only the cut day (01-02) holds 2 files
    assert(t.snapshotVersions.count(_._2 == "compact") == 1)
    t.dropBefore("2024-01-03")
    assert(t.snapshotVersions.last._2 == "retention")
    assert(t.currentVersion.contains(5L))
  }

  test("pinned reader survives compact AND retention; live reader moves on") {
    val (t, store, _) = build("pin")
    val before = ids(t.toDF)
    val pinned = t.currentVersion.get
    // the snapshot handle is opened BEFORE the maintenance verbs run
    val snap = t.openAt(pinned)
    t.compactAll(targetFiles = 1)
    t.dropBefore("2024-01-03")
    // live table only serves the retained days...
    val live = TsTable.open(spark, store)
    assert(ids(live.toDF).forall(_ > 0))
    assert(live.minDt.get.after(java.sql.Timestamp.valueOf("2024-01-02 23:59:59")))
    // ...while the pinned version still serves the pre-mutation content
    assert(ids(snap.toDF) == before, "pinned snapshot must be immutable")
    // and a fresh pin (no live handle) resolves through the archive too
    assert(ids(TsTable.openAt(spark, store, pinned).toDF) == before)
    // time-traveled range read: the expired day, exact closed-interval
    val d1 = t.readRange(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 23:59:59"), asOf = pinned)
    val oracle = Tables.events(spark, sf0001)
      .where(col("ts").between(lit("2024-01-01 00:00:00").cast("timestamp"),
        lit("2024-01-01 23:59:59").cast("timestamp")))
    assert(ids(d1) == ids(oracle))
  }

  test("openAt serves each version's own schema across evolution") {
    val (t, store, _) = build("evolve")
    val v0 = t.currentVersion.get
    val hi = lit("2024-01-06 00:00:00").cast("timestamp")
    val lo = lit("2024-01-05 00:00:00").cast("timestamp")
    val wider = Tables.events(spark, sf0001)
      .where(col("ts") >= lo && col("ts") < hi)
      .withColumn("source", lit("evolved"))
    val t2 = t.appendEvolved(wider)
    val v1 = t2.currentVersion.get
    assert(!TsTable.openAt(spark, store, v0).schema.fieldNames.contains("source"))
    assert(TsTable.openAt(spark, store, v1).schema.fieldNames.contains("source"))
    // the evolved snapshot null-fills the old days' new column
    val snap = TsTable.openAt(spark, store, v1).toDF
    assert(snap.where(col("source").isNull).count() > 0)
    assert(snap.where(col("source") === "evolved").count() ==
      wider.count())
  }

  test("expireSnapshots reclaims archived files and old manifests; " +
      "the retained version still reads") {
    val (t, store, fs) = build("expire")
    val pinned = t.currentVersion.get
    t.compactAll(targetFiles = 1)
    t.dropBefore("2024-01-03")
    val archive = new Path(store, "_ts_archive")
    assert(fs.exists(archive), "maintenance must archive, not delete")
    val expired = t.expireSnapshots(keepLast = 1)
    assert(expired.contains(pinned))
    // archive fully reclaimed: the only retained manifest references only
    // live files
    assert(!fs.exists(archive) || fs.listStatus(archive).isEmpty)
    // expired versions now fail loudly...
    val e = intercept[IllegalArgumentException](TsTable.openAt(spark, store, pinned))
    assert(e.getMessage.contains("expired or never committed"))
    // ...and the current one still serves the live content
    val cur = t.currentVersion.get
    assert(ids(TsTable.openAt(spark, store, cur).toDF) ==
      ids(TsTable.open(spark, store).toDF))
  }

  test("registerViewAt serves the pinned version through SQL after maintenance; " +
      "history reports one row per version with matching actions") {
    val (t, _, _) = build("sqlview")
    val pinned = t.currentVersion.get
    val before = ids(t.toDF)
    t.compactAll(targetFiles = 1)
    t.dropBefore("2024-01-03")
    // registration AFTER maintenance re-resolves into the archive: SQL
    // over the pinned view serves the pre-mutation rows (p_date rides
    // along, the registerView contract). A view registered BEFORE a
    // maintenance pass captures the old file locations and must be
    // re-registered — the documented contract.
    t.registerViewAt("snap_v", pinned)
    val viaSql = spark.sql(
      "SELECT event_id FROM snap_v WHERE p_date >= DATE '2024-01-01'")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaSql == before, "SQL view must serve the pinned version")
    // history mirrors snapshotVersions and carries sane footprints
    val h = t.history.collect()
    assert(h.map(r => (r.getLong(0), r.getString(1))).toSeq == t.snapshotVersions)
    val byV = h.map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(byV(1L) == ((0L, 0L)), "create commits an empty state")
    assert(byV(3L)._1 > byV(2L)._1, "second append grows the file count")
    assert(byV(4L)._1 < byV(3L)._1, "compaction shrinks the file count")
    assert(byV(5L)._1 < byV(4L)._1, "retention shrinks the file count")
    assert(h.forall(r => r.getLong(2) == 0 || r.getLong(3) > 0))
  }

  test("commit auto-expires history past spark.graft.ts.maxVersions " +
      "(the streaming-sink metadata bound); 0 disables") {
    val conf = spark.conf
    conf.set("spark.graft.ts.maxVersions", "3")
    try {
      val (t, store, fs) = build("autoexp") // create + 2 appends = 3 versions
      t.compactAll(targetFiles = 1)         // v4 → expiry keeps {2,3,4}
      val vs = t.snapshotVersions.map(_._1)
      assert(vs == Seq(2L, 3L, 4L), s"retained $vs")
      // the compacted-away file is unreferenced by {2? no — v2/v3 DO
      // reference the pre-compact files}: archive must still serve them
      assert(ids(t.openAt(2L).toDF).nonEmpty)
      t.dropBefore("2024-01-03")            // v5 → keeps {3,4,5}
      assert(t.snapshotVersions.map(_._1) == Seq(3L, 4L, 5L))
      assert(t.currentVersion.contains(5L))
      // disabling the bound stops expiry
      conf.set("spark.graft.ts.maxVersions", "0")
      t.compact("2024-01-03", targetFiles = 1) // may no-op; force an append instead
      val hi = org.apache.spark.sql.functions.lit("2024-01-06 00:00:00").cast("timestamp")
      val lo = org.apache.spark.sql.functions.lit("2024-01-05 00:00:00").cast("timestamp")
      t.append(Tables.events(spark, sf0001)
        .where(col("ts") >= lo && col("ts") < hi))
      assert(t.snapshotVersions.map(_._1) == Seq(3L, 4L, 5L, 6L))
      fs // unused handle
    } finally conf.unset("spark.graft.ts.maxVersions")
  }

  test("restore rolls the live table back to a pinned version; history moves " +
      "forward; the pre-restore state stays pinnable; appends re-anchor") {
    val (t, store, _) = build("restore")
    val good = t.currentVersion.get
    val goodRows = ids(t.toDF)
    // damage: a bad append, a compaction, an over-eager retention
    val hi = lit("2024-01-06 00:00:00").cast("timestamp")
    val lo = lit("2024-01-05 00:00:00").cast("timestamp")
    t.append(Tables.events(spark, sf0001).where(col("ts") >= lo && col("ts") < hi))
    t.compactAll(targetFiles = 1)
    t.dropBefore("2024-01-04")
    val damaged = t.currentVersion.get
    val damagedRows = ids(t.toDF)
    assert(damagedRows != goodRows)
    // roll back
    val restored = t.restore(good)
    assert(restored > damaged, "restore commits FORWARD")
    val live = TsTable.open(spark, store)
    assert(ids(live.toDF) == goodRows, "live table must equal the pinned state")
    assert(live.snapshotVersions.last == ((restored, "restore")))
    // the damaged state itself is still pinnable (history not rewritten)
    assert(ids(TsTable.openAt(spark, store, damaged).toDF) == damagedRows)
    // appends re-anchor on the restored maxDt
    live.append(Tables.events(spark, sf0001)
      .where(col("ts") >= lo && col("ts") < hi))
    assert(live.maxDt.get.after(java.sql.Timestamp.valueOf("2024-01-04 23:59:59")))
    // SQL face: a pinned view over the restored version serves it
    live.registerViewAt("restored_v", restored)
    assert(spark.sql("SELECT count(*) FROM restored_v").head.getLong(0) ==
      goodRows.length.toLong)
    // maintenance AFTER a restore re-archives copied-back files, which
    // collide with their own archived twins — must dedupe, not crash
    val droppedAgain = live.dropBefore("2024-01-02")
    assert(droppedAgain.nonEmpty)
    assert(live.snapshotVersions.last._2 == "retention")
    assert(ids(TsTable.openAt(spark, store, restored).toDF) == goodRows,
      "the restored version stays pinnable after the re-archive")
  }

  test("changesBetween plans a scan of ONLY the added files (metadata diff, " +
      "never a table scan)") {
    val (t, store, fs) = build("chfiles")
    // live layout: append1 = 2 files (01-01, 01-02a), append2 = 3 files
    val all = fs.listStatus(new Path(store)).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("p_date="))
      .flatMap(d => fs.listStatus(d.getPath)).count(st => st.isFile &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    assert(all == 5, s"fixture expects 5 live files, got $all")
    val df = t.changesBetween(2L, 3L) // just the SECOND append's rows
    df.collect()
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    assert(scanned == 3,
      s"changesBetween(2,3) must scan exactly the 3 added files, scanned $scanned of $all")
  }

  test("the plan-vs-execute race is survived in place: a frame built BEFORE " +
      "maintenance collects correctly AFTER its files are displaced " +
      "(execution-time archive resolution)") {
    val (t, _, _) = build("race")
    val before = ids(t.toDF)
    // 1) pinned frame: CONSTRUCTED now — file paths resolve to the LIVE
    //    tree at this moment (this is exactly a streaming getBatch's
    //    position: batch planned, not yet executed)
    val pinnedDf = t.openAt(t.currentVersion.get).toDF
    // 2) change-feed frame over the same still-live files
    val cdfDf = t.changeFeed(1L, t.currentVersion.get)
    // maintenance lands BETWEEN plan and execute: compact + retention
    // rename every planned file into _ts_archive/
    t.compactAll(targetFiles = 1)
    t.dropBefore("2024-01-03")
    // 3) execution: each task re-resolves at file-open time through the
    //    archive-resolving format — same bytes, mirrored path. Pre-fix
    //    both collects died with FILE_NOT_EXIST.
    assert(ids(pinnedDf) == before,
      "a pre-maintenance frame must survive displacement mid-read")
    assert(cdfDf.where(col("_change_type") === "insert")
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq == before,
      "a planned change-feed batch must survive displacement mid-read")
  }

  test("cloneAt materializes a version as an INDEPENDENT table: equals the " +
      "pin (through the archive), survives source expiry, mutates alone") {
    val (t, store, fsc) = build("clone")
    val pinned = t.currentVersion.get
    val want = ids(t.toDF)
    // source maintenance AFTER the pin: the clone must pull archived bytes
    t.compactAll(targetFiles = 1)
    t.dropBefore("2024-01-03")
    val dest = store + "_clone"
    fsc.delete(new Path(dest), true) // residue from a previous run
    val clone = t.cloneAt(pinned, dest)
    assert(ids(clone.toDF) == want, "clone must equal the pinned state")
    assert(clone.snapshotVersions == Seq((1L, "clone")))
    // independence (vs openAt's zero-copy pin): source expiry reclaims the
    // archived bytes, the clone keeps serving its own copies
    t.expireSnapshots(keepLast = 1)
    assert(ids(TsTable.open(spark, dest).toDF) == want)
    // ...and mutating the clone leaves the source untouched
    val srcRows = TsTable.open(spark, store).toDF.count()
    assert(clone.deleteWhere(col("event_id") % 2 === 0) > 0)
    assert(TsTable.open(spark, store).toDF.count() == srcRows)
    // a non-empty destination is refused, not mixed into
    intercept[IllegalArgumentException](t.cloneAt(t.currentVersion.get, dest))
  }

  test("changesBetween returns exactly the appended rows; maintenance " +
      "versions contribute no false adds; compacted-away files resolve " +
      "through the archive") {
    val (t, store, _) = build("changes")
    val from = 2L // after the FIRST append (create=1, append=2, append=3)
    val batch2 = ids(t.toDF).toSet -- ids(t.openAt(from).toDF).toSet
    // maintenance between the appends being diffed: compact rewrites the
    // cut day (archiving one of batch 2's files), retention drops a day
    t.compactAll(targetFiles = 1)
    val afterCompact = t.currentVersion.get
    // compact alone adds nothing
    assert(t.changesBetween(3L, afterCompact).count() == 0,
      "a compact version must surface no added rows")
    // append a fifth day on top
    val hi = lit("2024-01-06 00:00:00").cast("timestamp")
    val lo = lit("2024-01-05 00:00:00").cast("timestamp")
    t.append(Tables.events(spark, sf0001).where(col("ts") >= lo && col("ts") < hi))
    val day5 = ids(Tables.events(spark, sf0001)
      .where(col("ts") >= lo && col("ts") < hi)).toSet
    val changed = ids(t.changesBetween(from, t.currentVersion.get)).toSet
    assert(changed == (batch2 ++ day5),
      "changes = batch 2 (resolved through the archive post-compact) + batch 3")
    // full-history diff equals the current table
    assert(ids(t.changesBetween(1L, t.currentVersion.get)).toSet == ids(t.toDF).toSet)
    // degenerate range is rejected
    intercept[IllegalArgumentException](t.changesBetween(3L, 3L))
  }

  test("changeFeed: compact is silent, delete feeds its removed rows, " +
      "retention feeds the dropped days — with survivor rows cancelling " +
      "exactly under the multiset diff") {
    val (t, _, _) = build("cdf")
    val vBase = t.currentVersion.get
    val baseIds = ids(t.toDF).toSet
    t.compactAll(targetFiles = 1)
    assert(t.changeFeed(vBase, t.currentVersion.get).count() == 0,
      "a compact version is content-preserving — the feed must be empty")
    val delPred = col("user_id") % 3 === 1
    val expectDel = ids(t.toDF.where(delPred)).toSet
    t.deleteWhere(delPred)
    val vDel = t.currentVersion.get
    val delFeed = t.changeFeed(vDel - 1, vDel).collect()
    assert(delFeed.forall(_.getAs[String]("_change_type") == "delete"),
      "a pure delete feeds no inserts")
    assert(delFeed.map(_.getAs[Long]("event_id")).toSet == expectDel)
    val expectDropped = ids(t.toDF.where(
      col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))).toSet
    t.dropBefore("2024-01-03")
    val vRet = t.currentVersion.get
    val retFeed = t.changeFeed(vRet - 1, vRet).collect()
    assert(retFeed.forall(_.getAs[String]("_change_type") == "delete"))
    assert(retFeed.map(_.getAs[Long]("event_id")).toSet == expectDropped)
    // whole-history feed NETS to the live table: per row id, inserts
    // minus deletes leaves exactly the surviving rows (nothing here
    // deletes-then-reinserts, so net is 0 or 1 per id)
    val net = t.changeFeed(1L, vRet)
      .groupBy(col("event_id"))
      .agg(sum(when(col("_change_type") === "insert", 1).otherwise(-1)).as("n"))
      .where(col("n") === 1)
    assert(ids(net) == ids(t.toDF),
      "replaying the full feed must reconstruct the live table")
    assert(baseIds.nonEmpty)
    intercept[IllegalArgumentException](t.changeFeed(vRet, vRet))
  }

  test("changeFeed reconstructs a MERGE row-wise — the update pre/post " +
      "pairs and the inserts changesBetween's file-set diff cannot see") {
    val (t, _, _) = build("cdfmerge")
    val vPre = t.currentVersion.get
    val updPred = col("user_id") % 4 === 2 &&
      col("ts") < lit("2024-01-02 00:00:00").cast("timestamp")
    val updSrc = t.toDF.where(updPred)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value") + 100).as("value"), col("props"))
    val lo = lit("2024-01-05 00:00:00").cast("timestamp")
    val hi = lit("2024-01-06 00:00:00").cast("timestamp")
    val insSrc = Tables.events(spark, sf0001)
      .where(col("ts") >= lo && col("ts") < hi)
      .select((col("ts") - org.apache.spark.sql.functions.expr("INTERVAL 96 HOURS")).as("ts"),
        col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"))
    val updIds = ids(t.toDF.where(updPred)).toSet
    val insIds = ids(insSrc).toSet
    val r = t.mergeInto(updSrc.unionByName(insSrc), keys = Seq("event_id", "ts"))
    assert(r.updated == updIds.size && r.inserted == insIds.size)
    val vPost = t.currentVersion.get
    // the file-set diff documents its merge blindness...
    assert(t.changesBetween(vPre, vPost).count() == 0)
    // ...the row diff sees everything
    val feed = t.changeFeed(vPre, vPost).collect()
    val inserts = feed.filter(_.getAs[String]("_change_type") == "insert")
    val deletes = feed.filter(_.getAs[String]("_change_type") == "delete")
    assert(deletes.map(_.getAs[Long]("event_id")).toSet == updIds,
      "pre-images: exactly the matched rows")
    assert(inserts.map(_.getAs[Long]("event_id")).toSet == (updIds ++ insIds),
      "post-images + merge inserts")
    val preVal = deletes.map(d =>
      d.getAs[Long]("event_id") -> d.getAs[Double]("value")).toMap
    assert(inserts.filter(r0 => updIds.contains(r0.getAs[Long]("event_id")))
      .forall(r0 => r0.getAs[Double]("value") ==
        preVal(r0.getAs[Long]("event_id")) + 100),
      "each post-image value = its pre-image + 100")
    assert(feed.forall(_.getAs[Long]("_commit_version") == vPost))
  }

  test("restore's archive copy-back runs as a distributed Spark job — one " +
      "task per displaced file, never a sequential driver byte loop") {
    val (t, store, _) = build("distcp")
    val good = t.currentVersion.get
    val goodRows = ids(t.toDF)
    t.dropBefore("2024-01-05") // archives every day — ALL files displaced
    val displaced = TsTable.openAt(spark, store, good).resolvedFiles.count(!_._4)
    assert(displaced >= 2, s"fixture must displace multiple files, got $displaced")
    // restore's only Spark job is the copy itself (everything else is
    // driver metadata), so the stages observed during it ARE the copy:
    // a one-task-per-file job proves the bytes moved executor-side in
    // parallel, and any stage at all proves they did not move through a
    // driver-side FileUtil loop (which schedules no job).
    val taskCounts = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        taskCounts.add(s.stageInfo.numTasks)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      t.restore(good)
      val deadline = System.currentTimeMillis() + 10000
      while (taskCounts.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
    } finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    val counts = taskCounts.asScala.map(_.intValue).toSeq
    // one task per file, capped by the cluster's parallelism (local[4] here)
    val expected = math.min(displaced, spark.sparkContext.defaultParallelism)
    assert(expected >= 2 && counts.contains(expected),
      s"expected a copy job with min(#displaced=$displaced, parallelism=" +
        s"${spark.sparkContext.defaultParallelism})=$expected tasks, " +
        s"saw stages with task counts: $counts")
    assert(ids(TsTable.open(spark, store).toDF) == goodRows,
      "distributed restore must reproduce the pinned state exactly")
  }

  test("a foreign in-place rewrite of a manifested file is detected, not served") {
    val (t, store, fs) = build("guard")
    val pinned = t.currentVersion.get
    val day = new Path(store, "p_date=2024-01-01")
    val f = fs.listStatus(day).map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith(".")).head
    val out = fs.create(f, true) // same name, different bytes/length
    try out.write(Array.fill[Byte](17)(0)) finally out.close()
    val err = intercept[IllegalStateException](
      TsTable.openAt(spark, store, pinned).toDF.count())
    assert(err.getMessage.contains("rewritten in place"))
  }

  test("snapshot range read still prunes: only the queried day's files are scanned") {
    val (t, _, _) = build("prune")
    val snap = t.openAt(t.currentVersion.get)
    val df = snap.readRange(
      java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-02 23:59:59"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("p_date"),
      s"snapshot read lost partition pruning:\n$plan")
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    // the partition column must have survived the explicit-file-list read
    assert(ids(df).nonEmpty)
    assert(df.columns.toSeq == t.toDF.columns.toSeq)
    scanned // touched for clarity; content asserted via ids above
  }
}
