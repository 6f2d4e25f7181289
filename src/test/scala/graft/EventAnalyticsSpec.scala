package graft

import java.sql.Timestamp

import graft.operators.EventAnalyticsPack
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-analytics pack: semantics the sf-fixture oracle can't distinguish
  * (its users are active everywhere), pinned on hand-built micro-corpora —
  * stage ORDER in the funnel, cohort/offset assignment, the stickiness
  * algebra — plus the single-exchange plan claim for `funnel`.
  */
class EventAnalyticsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Events in the fixture schema from (user, type, ts) triples, written to
    * a temp dir and re-read so the pack's loaders see real parquet. `ts` is
    * int64 epoch NANOS — the driver fixture's physical encoding, which
    * Tables.events floors to µs (`ts div 1000`). */
  private def eventsDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evspec").toString
    rows.zipWithIndex.map { case ((u, t, w), i) =>
      (i.toLong, ts(w).getTime * 1000000L, u, t, 1.0, """{"k": 1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def row(df: DataFrame, user: Long): org.apache.spark.sql.Row =
    df.where(col("user_id") === user).collect().head

  test("sessionize: islands == session_window sessions, per user and in total") {
    import org.apache.spark.sql.functions._
    val islands = graft.operators.EventAnalyticsPack.sessionize(spark, sf0001)
      .groupBy(col("user_id"))
      .agg(countDistinct(col("sess_seq")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val windows = Tables.events(spark, sf0001)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .count()
      .groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(islands == windows,
      "gaps-and-islands and session_window must induce the same partition")
    assert(islands.values.sum > islands.size, "multi-session users expected")
  }

  test("eventGaps: gaps replay a driver-side lag over (ts, event_id) order") {
    val evs = Tables.events(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"),
        org.apache.spark.sql.functions.col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gapsByUser = evs.groupBy(_._1).map { case (u, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3))
      u -> ordered.sliding(2).collect {
        case Array(a, b) => (b._2 - a._2).toDouble / 1e6
      }.toSeq
    }
    val out = graft.operators.EventAnalyticsPack.eventGaps(spark, sf0001).collect()
    assert(out.length == gapsByUser.count(_._2.nonEmpty))
    out.foreach { r =>
      val gs = gapsByUser(r.getLong(0))
      assert(r.getLong(1) == gs.length.toLong)
      assert(math.abs(r.getDouble(4) - gs.max) < 5e-5, s"user ${r.getLong(0)} max")
      val sorted = gs.sorted
      val medRank = (sorted.length - 1) * 0.5
      val lo = medRank.toInt
      val med = if (lo + 1 < sorted.length)
        sorted(lo) + (sorted(lo + 1) - sorted(lo)) * (medRank - lo)
      else sorted(lo)
      assert(math.abs(r.getDouble(2) - med) < 5e-5, s"user ${r.getLong(0)} med")
    }
  }

  test("funnel: stages must occur in order; stalls propagate NULLs") {
    val dir = eventsDir(Seq(
      // user 1: full path, in order — all three stages found
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // user 2: click BEFORE the first view never counts; the later click does
      (2L, "click", "2024-01-02 08:00:00"),
      (2L, "view", "2024-01-02 09:00:00"),
      (2L, "click", "2024-01-02 10:00:00"),
      // user 3: purchase before click → funnel stalls at click
      (3L, "view", "2024-01-03 09:00:00"),
      (3L, "purchase", "2024-01-03 10:00:00"),
      // user 4: never views → all stages NULL
      (4L, "error", "2024-01-04 09:00:00")))
    val out = EventAnalyticsPack.funnel(spark, dir)
    assert(out.count() == 4)
    val u1 = row(out, 1L)
    assert(!u1.isNullAt(1) && !u1.isNullAt(2) && !u1.isNullAt(3))
    val u2 = row(out, 2L)
    // first_click is the 10:00 click (the 08:00 one precedes the view)
    assert(u2.getLong(2) == ts("2024-01-02 10:00:00").getTime * 1000)
    assert(u2.isNullAt(3))
    val u3 = row(out, 3L)
    assert(!u3.isNullAt(1) && u3.isNullAt(2) && u3.isNullAt(3))
    val u4 = row(out, 4L)
    assert(u4.isNullAt(1) && u4.isNullAt(2) && u4.isNullAt(3))
  }

  test("funnel plans one user_id hash exchange plus the output sort's range exchange") {
    val p = EventAnalyticsPack.funnel(spark, sf0001)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges == 2, s"expected user_id + sort exchanges, got $exchanges:\n$p")
    assert(p.contains("hashpartitioning(user_id"), p)
  }

  test("retention: cohort is the week of the first event; offsets are exact weeks") {
    val dir = eventsDir(Seq(
      // user 1: first event Tue Jan 2 → cohort = Mon Jan 1; active weeks 0 and 2
      (1L, "view", "2024-01-02 10:00:00"),
      (1L, "view", "2024-01-16 10:00:00"),
      // user 2: joins week 2 (Mon Jan 15) — its own cohort, offset 0 only
      (2L, "view", "2024-01-15 10:00:00")))
    val out = EventAnalyticsPack.retention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w1 = ts("2024-01-01 00:00:00").getTime * 1000
    val w3 = ts("2024-01-15 00:00:00").getTime * 1000
    assert(out == Map((w1, 0L) -> 1L, (w1, 2L) -> 1L, (w3, 0L) -> 1L))
  }

  test("activeUsers: user-days dedup within a day; stickiness = dau/wau") {
    val dir = eventsDir(Seq(
      // week of Mon Jan 1: user 1 active 2 days (3 events), user 2 active 1 day
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"), // same day — dedups
      (1L, "view", "2024-01-02 10:00:00"),
      (2L, "view", "2024-01-02 12:00:00")))
    val r = EventAnalyticsPack.activeUsers(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 2) // wau
    assert(r.head.getLong(2) == 2) // n_days (Jan 1, Jan 2)
    assert(r.head.getLong(3) == 3) // user-days: (u1,d1),(u1,d2),(u2,d2)
    assert(math.abs(r.head.getDouble(4) - 1.5) < 1e-12)   // avg_dau = 3/2
    assert(math.abs(r.head.getDouble(5) - 0.75) < 1e-12)  // stickiness = 1.5/2
  }

  test("transitions: counts conserve (N - first events), rows normalize to 1") {
    val out = EventAnalyticsPack.eventTransitions(spark, sf0001).collect()
    val ev = Tables.events(spark, sf0001)
    val n = ev.count()
    val users = ev.select(col("user_id")).distinct().count()
    // every event except each user's first contributes exactly one step
    assert(out.map(_.getLong(2)).sum == n - users)
    out.groupBy(_.getString(0)).foreach { case (prev, rows) =>
      val p = rows.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"row $prev sums to $p") // 6dp rounding × ≤5 cells
    }
  }

  test("transitions: steps follow per-user time order, never cross users") {
    val dir = eventsDir(Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (2L, "purchase", "2024-01-01 10:02:00"), // interleaved in time
      (2L, "view", "2024-01-01 10:07:00")))
    val got = EventAnalyticsPack.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("view", "click") -> 1L, ("purchase", "view") -> 1L))
  }

  test("interval overlap: bucketed equi-join matches the direct O(n²) interval join") {
    // Independent reference: same session intervals, joined by the raw
    // inequality predicate with no bucketing — the semantics, minus the
    // scale rewrite under test.
    val iv = Tables.events(spark, sf0001)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
      .select(col("user_id"), col("st"), col("en"))
    val a = iv.select(col("user_id").as("u1"), col("st").as("st1"), col("en").as("en1"))
    val b = iv.select(col("user_id").as("u2"), col("st").as("st2"), col("en").as("en2"))
    val ref = a.join(b, col("u1") < col("u2") &&
        col("st1") <= col("en2") && col("st2") <= col("en1"))
      .groupBy(col("u1"), col("u2"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(unix_micros(least(col("en1"), col("en2"))) -
          unix_micros(greatest(col("st1"), col("st2")))).as("overlap_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val got = EventAnalyticsPack.intervalOverlap(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == ref, s"bucketed rewrite diverges: ${got.size} vs ${ref.size} pairs")
    assert(got.nonEmpty)
  }

  test("interval overlap: a session spanning several hour buckets pairs exactly once") {
    val dir = eventsDir(Seq(
      // user 1: one long session crossing three hour buckets (10:xx→12:xx)
      (1L, "view", "2024-01-01 10:50:00"),
      (1L, "view", "2024-01-01 10:58:00"),
      (1L, "view", "2024-01-01 11:06:00"),
      (1L, "view", "2024-01-01 11:14:00"),
      (1L, "view", "2024-01-01 12:01:00"), // gap 47 min → actually new session
      // user 2: short session inside user 1's first session's middle bucket
      (2L, "view", "2024-01-01 11:05:00"),
      (2L, "view", "2024-01-01 11:10:00")))
    val got = EventAnalyticsPack.intervalOverlap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // u1's 10:50–11:14 session overlaps u2's 11:05–11:10 for 5 minutes —
    // counted ONCE despite the pair sharing two hour buckets (11:00 attribution)
    assert(got == Map((1L, 2L) -> (1L, 300000000L)), got.toString)
  }

  test("scd2: runs compress state changes; intervals chain and cover") {
    val dir = eventsDir(Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:01:00"),
      (1L, "click", "2024-01-01 10:02:00"),
      (1L, "view", "2024-01-01 10:03:00"), // back to view → NEW run, not merged
      (2L, "purchase", "2024-01-01 09:00:00")))
    val rows = EventAnalyticsPack.scd2(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
    val u1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(u1.map(_._3).toSeq == Seq("view", "click", "view"),
      "A→A→B→A must yield three runs (reverting state reopens a run)")
    assert(u1.map(_._6).toSeq == Seq(2L, 1L, 1L), "run event counts")
    // valid_to of run k == valid_from of run k+1; last run open (null)
    u1.sliding(2).foreach { case Array(a, b) => assert(a._5 == b._4) }
    assert(u1.last._5 == -1L, "current state has no end")
    assert(rows.filter(_._1 == 2L).map(_._5).toSeq == Seq(-1L))
  }

  test("scd2: event-id tiebreak makes same-timestamp runs deterministic") {
    // Two different types at the SAME instant: run order must follow
    // event_id (insertion order), not hash luck.
    val dir = eventsDir(Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00")))
    val types = EventAnalyticsPack.scd2(spark, dir)
      .orderBy(col("run_id")).collect().map(_.getString(2)).toSeq
    assert(types == Seq("view", "click"))
  }

  test("timeFeatures: dow normalization is Monday=0 and weekend flag at 5/6") {
    val dir = eventsDir(Seq(
      (1L, "view", "2024-01-01 03:00:00"), // Monday
      (2L, "view", "2024-01-06 22:00:00"), // Saturday
      (3L, "view", "2024-01-07 23:00:00"))) // Sunday
    val got = EventAnalyticsPack.timeFeatures(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((0L, 3L, false), (5L, 22L, true), (6L, 23L, true)))
  }
}
