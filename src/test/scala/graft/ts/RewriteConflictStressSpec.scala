package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The rewrite conflict machinery under REAL nondeterminism — two threads
  * racing whole verbs with retry-on-conflict, no test seams: whatever
  * interleaving the scheduler produces, the retry protocol must converge
  * to the serial semantics (compact is row-preserving; the delete removes
  * exactly its predicate's rows, once), the history must stay linear, and
  * the final state must be servable through both the listing read and the
  * manifest span index. Complements RewriteConflictSpec's deterministic
  * hook-driven interleavings. */
class RewriteConflictStressSpec extends graft.SparkSpec {

  private def rows(day: Int, h0: Int, h1: Int): DataFrame = {
    import spark.implicits._
    (h0 until h1).flatMap(h => (0 until 8).map(m =>
      (java.sql.Timestamp.valueOf(f"2024-02-0$day%d $h%02d:$m%02d:00"),
        (day * 10000 + h * 100 + m).toLong)))
      .toDF("ts", "v")
  }

  /** True for a live scan losing the documented race against a swap
    * ("a maintenance pass moving its files mid-read surfaces as a read
    * error whose recovery is to rebuild the frame" — TsTable scaladoc):
    * on a CLUSTER, Spark's task retry re-opens and the archive-resolving
    * format re-resolves, but local mode runs task.maxFailures=1, so the
    * job surfaces the read error directly and the caller retries. */
  private def isSwapReadRace(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("FAILED_READ_FILE")))

  /** Run `verb` with retry on conflict (the exception's documented
    * contract) or on a swap-read race, on a FRESH handle per attempt;
    * returns attempts used. */
  private def retrying(dir: String, max: Int)(verb: TsTable => Unit): Int = {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      require(attempts <= max, s"verb did not converge within $max attempts")
      try { verb(TsTable.open(spark, dir)); done = true }
      catch {
        case _: TsTable.ConcurrentRewriteException => ()
        case e: Throwable if isSwapReadRace(e) => ()
      }
    }
    attempts
  }

  test("threaded compact-vs-delete race with retries: both converge, " +
      "rows equal the serial semantics, history linear, span index " +
      "serves the final state") {
    val dir = java.nio.file.Files.createTempDirectory("rewrite_stress").toString
    val df1 = rows(1, 0, 6)
    val t = TsTable.create(spark, dir, df1.schema, tsCol = "ts")
    t.append(df1)
    t.append(rows(1, 6, 12))
    t.append(rows(2, 0, 12)) // second day: keeps compact busy longer
    val total = t.toDF.count()
    val pred = col("v") % 3 === 0
    val predCount = t.toDF.where(pred).count()
    assert(predCount > 0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val compactor = new Thread(() => {
      try { barrier.await(); retrying(dir, max = 8)(_.compactAll(1)) }
      catch { case e: Throwable => errors.add(e) }
    })
    val deleter = new Thread(() => {
      try { barrier.await(); retrying(dir, max = 8)(h => { h.deleteWhere(pred); () }) }
      catch { case e: Throwable => errors.add(e) }
    })
    compactor.start(); deleter.start()
    compactor.join(120000); deleter.join(120000)
    assert(!compactor.isAlive && !deleter.isAlive, "a racer timed out")
    import scala.jdk.CollectionConverters._
    assert(errors.asScala.isEmpty,
      s"a racer failed beyond the conflict protocol: ${errors.asScala.headOption}")
    // serial semantics: compact preserves rows, the delete removed its
    // predicate's rows exactly once — whatever interleaving happened
    val healed = TsTable.open(spark, dir)
    assert(healed.toDF.count() == total - predCount,
      "rows must equal the serial execution (no loss, no resurrection, no dupes)")
    assert(healed.toDF.where(pred).count() == 0)
    // linear gapless history
    val vs = healed.snapshotVersions.map(_._1)
    assert(vs == (vs.head to vs.last), s"history not linear: $vs")
    // the final commit's span index serves the full range (manifest
    // route agrees with the listing route)
    assert(healed.readRange(
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-02-02 23:59:59")).count() ==
      total - predCount)
    // the final version is pinnable and equals the live read
    assert(TsTable.openAt(spark, dir, vs.last).toDF.count() == total - predCount)
  }

  test("three-way race — append + delete + compact on one table: the " +
      "append never conflicts (action-aware gate), the rewrites retry to " +
      "convergence, and the row accounting is exact") {
    val dir = java.nio.file.Files.createTempDirectory("rewrite_stress3").toString
    val df1 = rows(1, 0, 6)
    val t = TsTable.create(spark, dir, df1.schema, tsCol = "ts")
    t.append(df1)
    t.append(rows(1, 6, 12))
    val total = t.toDF.count()
    // the delete predicate can never match appended rows (day 3 ⇒ v ≥ 30000),
    // so the final count is exact whatever the interleaving order
    val pred = col("v") % 3 === 0 && col("v") < lit(20000L)
    val predCount = t.toDF.where(pred).count()
    val appendDf = rows(3, 0, 4)
    val appendCount = appendDf.count()
    assert(predCount > 0 && appendCount > 0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(3)
    val appender = new Thread(() => {
      // appends are never conflict-gated — a ConcurrentRewriteException
      // here fails the test. The monotonic guard's LIVE scan can still
      // lose the documented read-vs-swap race (local task.maxFailures=1),
      // so that one error retries like a cluster task would.
      try {
        barrier.await()
        var attempts = 0
        var done = false
        while (!done) {
          attempts += 1
          require(attempts <= 8, "append did not converge")
          try { TsTable.open(spark, dir).append(appendDf); done = true }
          catch { case e: Throwable if isSwapReadRace(e) => () }
        }
      }
      catch { case e: Throwable => errors.add(e) }
    })
    val deleter = new Thread(() => {
      try { barrier.await(); retrying(dir, max = 8)(h => { h.deleteWhere(pred); () }) }
      catch { case e: Throwable => errors.add(e) }
    })
    val compactor = new Thread(() => {
      try { barrier.await(); retrying(dir, max = 8)(_.compactAll(1)) }
      catch { case e: Throwable => errors.add(e) }
    })
    Seq(appender, deleter, compactor).foreach(_.start())
    Seq(appender, deleter, compactor).foreach(_.join(120000))
    assert(!Seq(appender, deleter, compactor).exists(_.isAlive),
      "a racer timed out")
    import scala.jdk.CollectionConverters._
    assert(errors.asScala.isEmpty,
      s"a racer failed beyond the conflict protocol: ${errors.asScala.headOption}")
    val healed = TsTable.open(spark, dir)
    assert(healed.toDF.count() == total + appendCount - predCount,
      "exact row accounting: append once, delete once, compact row-preserving")
    assert(healed.toDF.where(pred).count() == 0)
    val vs = healed.snapshotVersions.map(_._1)
    assert(vs == (vs.head to vs.last), s"history not linear: $vs")
  }

  test("snapshot GC hammering live rewrites, 10/10 rounds: " +
      "expireSnapshots(keepLast=1) + vacuumStaging(0) loop while " +
      "delete-vs-delete races retry — exact accounting every round, no " +
      "rollback ever fails for missing archive bytes, latest version " +
      "stays pinnable") {
    val dir = java.nio.file.Files.createTempDirectory("rewrite_gc").toString
    val df0 = rows(1, 0, 2)
    val t = TsTable.create(spark, dir, df0.schema, tsCol = "ts")
    t.append(df0)
    var expect = df0.count()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // the GC thread runs the WHOLE session: every round's conflict
    // rollback window is exposed to keepLast=1 expiry and zero-cutoff
    // staging vacuum — the in-flight markers are all that protects a
    // loser's archived inputs and a live writer's staging dir
    val gc = new Thread(() => {
      try {
        val h = TsTable.open(spark, dir)
        while (!stop.get()) {
          h.expireSnapshots(keepLast = 1)
          h.vacuumStaging(olderThanMs = 0L)
          Thread.sleep(5)
        }
      } catch { case e: Throwable => errors.add(e) }
    })
    gc.start()
    try {
      for (round <- 2 to 11) { // 10 rounds
        // each round owns a fresh two-hour window later than every prior
        // one (append stays monotonic); the two racing deletes split it
        val h0 = (round - 2) * 2 + 2
        def tsAt(h: Int) =
          java.sql.Timestamp.valueOf(f"2024-02-01 $h%02d:00:00")
        val fresh = rows(1, h0, h0 + 2)
        val n = fresh.count()
        retryingAppend(dir, fresh, max = 8)
        expect += n
        val predA = col("ts") >= lit(tsAt(h0)) && col("ts") < lit(tsAt(h0 + 1))
        val predB = col("ts") >= lit(tsAt(h0 + 1)) &&
          col("ts") < lit(tsAt(h0 + 2))
        val hh = TsTable.open(spark, dir)
        val nA = hh.toDF.where(predA).count()
        val nB = hh.toDF.where(predB).count()
        assert(nA > 0 && nB > 0, s"round $round fixture must split")
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        val threads = Seq(predA, predB).map { p =>
          new Thread(() => {
            try { barrier.await(); retrying(dir, max = 10)(h => { h.deleteWhere(p); () }) }
            catch { case e: Throwable => errors.add(e) }
          })
        }
        threads.foreach(_.start())
        threads.foreach(_.join(120000))
        assert(!threads.exists(_.isAlive), s"round $round: a racer timed out")
        expect -= nA + nB
        import scala.jdk.CollectionConverters._
        assert(errors.asScala.isEmpty,
          s"round $round: a racer or the GC failed beyond the conflict " +
            s"protocol: ${errors.asScala.headOption}")
        val healed = TsTable.open(spark, dir)
        assert(healed.toDF.count() == expect,
          s"round $round: exact accounting must survive the GC race")
      }
    } finally { stop.set(true); gc.join(30000) }
    import scala.jdk.CollectionConverters._
    assert(errors.asScala.isEmpty, s"${errors.asScala.headOption}")
    // the newest version is pinnable through whatever the GC left behind,
    // and no in-flight marker outlived its verb
    val healed = TsTable.open(spark, dir)
    assert(TsTable.openAt(spark, dir, healed.currentVersion.get)
      .toDF.count() == expect)
    val inflight = new org.apache.hadoop.fs.Path(dir, "_ts_inflight")
    val hfs = inflight.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!hfs.exists(inflight) || hfs.listStatus(inflight).isEmpty,
      "in-flight markers must not outlive their verbs")
  }

  /** Append with retry on the documented read-vs-swap race only (appends
    * are never conflict-gated). */
  private def retryingAppend(dir: String, df: DataFrame, max: Int): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      require(attempts <= max, "append did not converge")
      try { TsTable.open(spark, dir).append(df); done = true }
      catch { case e: Throwable if isSwapReadRace(e) => () }
    }
  }

  test("threaded delete-vs-delete race on disjoint predicates: both land " +
      "(with retries), both effects present exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("rewrite_stress2").toString
    val df1 = rows(1, 0, 6)
    val t = TsTable.create(spark, dir, df1.schema, tsCol = "ts")
    t.append(df1)
    t.append(rows(1, 6, 12))
    val total = t.toDF.count()
    val predA = col("v") % 4 === 0
    val predB = col("v") % 4 === 1
    val nA = t.toDF.where(predA).count()
    val nB = t.toDF.where(predB).count()
    assert(nA > 0 && nB > 0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val threads = Seq(predA, predB).map { p =>
      new Thread(() => {
        try { barrier.await(); retrying(dir, max = 8)(h => { h.deleteWhere(p); () }) }
        catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(!threads.exists(_.isAlive), "a racer timed out")
    import scala.jdk.CollectionConverters._
    assert(errors.asScala.isEmpty, s"${errors.asScala.headOption}")
    val healed = TsTable.open(spark, dir)
    assert(healed.toDF.count() == total - nA - nB,
      "both deletes must land exactly once across every interleaving")
    assert(healed.toDF.where(predA || predB).count() == 0)
  }
}
