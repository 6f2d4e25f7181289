package graft

import graft.streaming.{KeyedPoint, TsStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Randomized parity property for the stream-stream backward as-of join
  * (r9 advice: the state machine was debugged by trace, which is exactly
  * the code that wants generated coverage). Each seed builds a fresh
  * randomized scenario — random per-key left/right event counts and
  * times, random chunk boundaries over the broker-style merged timeline,
  * random watermark lag — and replays it through a real MemoryStream
  * query. Every KEY is an independent state-machine case (state, pruning
  * and timeouts are all per-key), so 5 seeds × 20 keys ≥ 100 generated
  * cases, at ~5 streaming queries' cost.
  *
  * Scenario bounds that keep parity EXACT (not approximate):
  *  - watermark lag ≥ 1 minute with minute-granular sorted replay: no row
  *    can arrive late, and none lands exactly ON the watermark (the strict
  *    vs non-strict late-filter boundary is engine convention, excluded
  *    here and handled by the strict finalize bound in TsStream);
  *  - right (key, ts) pairs are unique: a backward match at a tied right
  *    timestamp is otherwise ambiguous between engines;
  *  - idleHorizonMs = 24 h: idle-state eviction is a documented contract
  *    (its own test in TsStreamSpec), not a parity bug, so it must not
  *    fire inside a 4 h scenario. */
class TsStreamProps extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("stream-stream as-of == batch AsOfJoin.backward on randomized keyed " +
      "streams (>=100 generated key-cases)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = t("2024-01-01 08:00:00").getTime
    def tp(min: Int) = new Timestamp(base + min * 60000L)
    var keyCases = 0
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7919L)
      val wmMin = Seq(1, 5, 30)(rnd.nextInt(3))
      // random staleness bound (None = unbounded): the streaming tolerance
      // knob must agree with AsOfJoin.backward's on every scenario
      val tolUs = Seq(None, Some(30L * 60 * 1000000), Some(90L * 60 * 1000000))(
        rnd.nextInt(3))
      val nKeys = 20
      var ctr = 0
      val lefts = scala.collection.mutable.ArrayBuffer.empty[KeyedPoint]
      val rights = scala.collection.mutable.ArrayBuffer.empty[KeyedPoint]
      (0 until nKeys).foreach { k =>
        // skewed shapes on purpose: quote-less keys, event-less keys,
        // right-heavy and left-heavy keys all occur across seeds
        val nl = rnd.nextInt(16)
        val nr = rnd.nextInt(11)
        (0 until nl).foreach { _ =>
          ctr += 1; lefts += KeyedPoint(k, tp(rnd.nextInt(240)), ctr.toDouble)
        }
        val seen = scala.collection.mutable.Set.empty[Int]
        (0 until nr).foreach { _ =>
          val m = rnd.nextInt(240)
          if (seen.add(m)) { ctr += 1; rights += KeyedPoint(k, tp(m), 1000.0 + ctr) }
        }
      }
      keyCases += nKeys

      val want = graft.operators.AsOfJoin.backward(
          lefts.toSeq.toDF("key", "ts", "value"),
          rights.toSeq.toDF("rkey", "rts", "rvalue"),
          "key", "rkey", "ts", "rts", toleranceUs = tolUs)
        .select($"key", unix_micros($"ts").as("us"), $"value",
          unix_micros($"rts").as("rus"), $"rvalue")
        .collect().map(_.toSeq).toSet

      val msL = MemoryStream[KeyedPoint]
      val msR = MemoryStream[KeyedPoint]
      val q = TsStream.asOfBackwardStream(msL.toDS(), msR.toDS(),
          watermark = s"$wmMin minutes", idleHorizonMs = 24L * 3600 * 1000,
          toleranceUs = tolUs)
        .select($"key", unix_micros($"ts").as("us"), $"value",
          unix_micros($"r_ts").as("rus"), $"r_value".as("rvalue"))
        .writeStream.format("memory").queryName(s"asof_prop_$seed")
        .outputMode("append").start()
      try {
        // both sides replayed along one merged event-time timeline, split
        // into RANDOM-sized chunks; sides separate within a chunk
        val timeline = (lefts.map((_, true)) ++ rights.map((_, false)))
          .sortBy(_._1.ts.getTime)
        var i = 0
        while (i < timeline.length) {
          val n = 1 + rnd.nextInt(40)
          val chunk = timeline.slice(i, i + n)
          i += n
          val (ls, rs) = chunk.partition(_._2)
          if (rs.nonEmpty) msR.addData(rs.map(_._1).toSeq)
          if (ls.nonEmpty) msL.addData(ls.map(_._1).toSeq)
          q.processAllAvailable()
        }
        // flush: sentinels push the watermark far past every row, then one
        // extra tick so timeouts armed at the new watermark fire
        msL.addData(Seq(KeyedPoint(-1L, t("2024-01-03 00:00:00"), 0.0)))
        msR.addData(Seq(KeyedPoint(-1L, t("2024-01-03 00:00:00"), 0.0)))
        q.processAllAvailable()
        msL.addData(Seq(KeyedPoint(-1L, t("2024-01-04 00:00:00"), 0.0)))
        q.processAllAvailable()
        val got = spark.table(s"asof_prop_$seed")
          .where($"key" >= 0).collect().map(_.toSeq).toSet
        assert(got == want,
          s"seed=$seed wm=${wmMin}m tol=$tolUs: missing=${(want -- got).take(5)} " +
            s"extra=${(got -- want).take(5)}")
      } finally q.stop()
    }
    assert(keyCases >= 100, s"only $keyCases generated key-cases")
  }

  test("stream-stream FORWARD as-of == batch AsOfJoin.forward on randomized " +
      "keyed streams (>=100 generated key-cases, finite tolerance)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = t("2024-01-01 08:00:00").getTime
    def tp(min: Int) = new Timestamp(base + min * 60000L)
    var keyCases = 0
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 104729L)
      val wmMin = Seq(1, 5, 30)(rnd.nextInt(3))
      // forward finality on an unbounded stream REQUIRES a staleness bound
      // (a candidate-less left is otherwise undecidable), so the tolerance
      // is always finite here — three widths exercise match-mostly,
      // mixed, and null-mostly scenarios
      val tolUs = Seq(10L, 30L, 90L)(rnd.nextInt(3)) * 60 * 1000000
      val nKeys = 20
      var ctr = 0
      val lefts = scala.collection.mutable.ArrayBuffer.empty[KeyedPoint]
      val rights = scala.collection.mutable.ArrayBuffer.empty[KeyedPoint]
      (0 until nKeys).foreach { k =>
        val nl = rnd.nextInt(16)
        val nr = rnd.nextInt(11)
        (0 until nl).foreach { _ =>
          ctr += 1; lefts += KeyedPoint(k, tp(rnd.nextInt(240)), ctr.toDouble)
        }
        val seen = scala.collection.mutable.Set.empty[Int]
        (0 until nr).foreach { _ =>
          val m = rnd.nextInt(240)
          if (seen.add(m)) { ctr += 1; rights += KeyedPoint(k, tp(m), 1000.0 + ctr) }
        }
      }
      keyCases += nKeys

      val want = graft.operators.AsOfJoin.forward(
          lefts.toSeq.toDF("key", "ts", "value"),
          rights.toSeq.toDF("rkey", "rts", "rvalue"),
          "key", "rkey", "ts", "rts", toleranceUs = Some(tolUs))
        .select($"key", unix_micros($"ts").as("us"), $"value",
          unix_micros($"rts").as("rus"), $"rvalue")
        .collect().map(_.toSeq).toSet

      val msL = MemoryStream[KeyedPoint]
      val msR = MemoryStream[KeyedPoint]
      val q = TsStream.asOfForwardStream(msL.toDS(), msR.toDS(),
          watermark = s"$wmMin minutes", idleHorizonMs = 24L * 3600 * 1000,
          toleranceUs = Some(tolUs))
        .select($"key", unix_micros($"ts").as("us"), $"value",
          unix_micros($"r_ts").as("rus"), $"r_value".as("rvalue"))
        .writeStream.format("memory").queryName(s"asof_fwd_prop_$seed")
        .outputMode("append").start()
      try {
        val timeline = (lefts.map((_, true)) ++ rights.map((_, false)))
          .sortBy(_._1.ts.getTime)
        var i = 0
        while (i < timeline.length) {
          val n = 1 + rnd.nextInt(40)
          val chunk = timeline.slice(i, i + n)
          i += n
          val (ls, rs) = chunk.partition(_._2)
          if (rs.nonEmpty) msR.addData(rs.map(_._1).toSeq)
          if (ls.nonEmpty) msL.addData(ls.map(_._1).toSeq)
          q.processAllAvailable()
        }
        msL.addData(Seq(KeyedPoint(-1L, t("2024-01-03 00:00:00"), 0.0)))
        msR.addData(Seq(KeyedPoint(-1L, t("2024-01-03 00:00:00"), 0.0)))
        q.processAllAvailable()
        msL.addData(Seq(KeyedPoint(-1L, t("2024-01-04 00:00:00"), 0.0)))
        q.processAllAvailable()
        val got = spark.table(s"asof_fwd_prop_$seed")
          .where($"key" >= 0).collect().map(_.toSeq).toSet
        assert(got == want,
          s"seed=$seed wm=${wmMin}m tol=$tolUs: missing=${(want -- got).take(5)} " +
            s"extra=${(got -- want).take(5)}")
      } finally q.stop()
    }
    assert(keyCases >= 100, s"only $keyCases generated key-cases")
  }

  test("stream-stream NEAREST as-of == batch AsOfJoin.nearest on randomized " +
      "keyed streams (>=100 generated key-cases, finite tolerance)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = t("2024-01-01 08:00:00").getTime
    def tp(min: Int) = new Timestamp(base + min * 60000L)
    var keyCases = 0
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 99991L)
      val wmMin = Seq(1, 5, 30)(rnd.nextInt(3))
      val tolUs = Seq(10L, 30L, 90L)(rnd.nextInt(3)) * 60 * 1000000
      val nKeys = 20
      var ctr = 0
      val lefts = scala.collection.mutable.ArrayBuffer.empty[KeyedPoint]
      val rights = scala.collection.mutable.ArrayBuffer.empty[KeyedPoint]
      (0 until nKeys).foreach { k =>
        val nl = rnd.nextInt(16)
        val nr = rnd.nextInt(11)
        (0 until nl).foreach { _ =>
          ctr += 1; lefts += KeyedPoint(k, tp(rnd.nextInt(240)), ctr.toDouble)
        }
        val seen = scala.collection.mutable.Set.empty[Int]
        (0 until nr).foreach { _ =>
          val m = rnd.nextInt(240)
          if (seen.add(m)) { ctr += 1; rights += KeyedPoint(k, tp(m), 1000.0 + ctr) }
        }
      }
      keyCases += nKeys

      val want = graft.operators.AsOfJoin.nearest(
          lefts.toSeq.toDF("key", "ts", "value"),
          rights.toSeq.toDF("rkey", "rts", "rvalue"),
          "key", "rkey", "ts", "rts", toleranceUs = Some(tolUs))
        .select($"key", unix_micros($"ts").as("us"), $"value",
          unix_micros($"rts").as("rus"), $"rvalue")
        .collect().map(_.toSeq).toSet

      val msL = MemoryStream[KeyedPoint]
      val msR = MemoryStream[KeyedPoint]
      val q = TsStream.asOfNearestStream(msL.toDS(), msR.toDS(),
          watermark = s"$wmMin minutes", idleHorizonMs = 24L * 3600 * 1000,
          toleranceUs = Some(tolUs))
        .select($"key", unix_micros($"ts").as("us"), $"value",
          unix_micros($"r_ts").as("rus"), $"r_value".as("rvalue"))
        .writeStream.format("memory").queryName(s"asof_near_prop_$seed")
        .outputMode("append").start()
      try {
        val timeline = (lefts.map((_, true)) ++ rights.map((_, false)))
          .sortBy(_._1.ts.getTime)
        var i = 0
        while (i < timeline.length) {
          val n = 1 + rnd.nextInt(40)
          val chunk = timeline.slice(i, i + n)
          i += n
          val (ls, rs) = chunk.partition(_._2)
          if (rs.nonEmpty) msR.addData(rs.map(_._1).toSeq)
          if (ls.nonEmpty) msL.addData(ls.map(_._1).toSeq)
          q.processAllAvailable()
        }
        msL.addData(Seq(KeyedPoint(-1L, t("2024-01-03 00:00:00"), 0.0)))
        msR.addData(Seq(KeyedPoint(-1L, t("2024-01-03 00:00:00"), 0.0)))
        q.processAllAvailable()
        msL.addData(Seq(KeyedPoint(-1L, t("2024-01-04 00:00:00"), 0.0)))
        q.processAllAvailable()
        val got = spark.table(s"asof_near_prop_$seed")
          .where($"key" >= 0).collect().map(_.toSeq).toSet
        assert(got == want,
          s"seed=$seed wm=${wmMin}m tol=$tolUs: missing=${(want -- got).take(5)} " +
            s"extra=${(got -- want).take(5)}")
      } finally q.stop()
    }
    assert(keyCases >= 100, s"only $keyCases generated key-cases")
  }

  test("streaming funnel == the chain definition on randomized user streams " +
      "(>=100 generated user-cases, random arrival order and chunking)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = t("2024-01-01 08:00:00").getTime
    val stages = Seq("view", "click", "purchase")
    val alphabet = stages ++ Seq("noise", "error")
    var userCases = 0
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 104729L)
      val nUsers = 30
      userCases += nUsers
      val evs = (0 until nUsers).flatMap { u =>
        (0 until rnd.nextInt(13)).map { i =>
          Ev(u * 1000L + i, new Timestamp(base + rnd.nextInt(240) * 60000L),
            u.toLong, alphabet(rnd.nextInt(alphabet.length)), 1.0, "{}")
        }
      }
      // reference: the batch chain definition, computed independently —
      // stage i = earliest matching event strictly after stage i−1
      val want = evs.groupBy(_.user_id).flatMap { case (u, es) =>
        def stageAt(ty: String, after: Long): Option[Long] = {
          val c = es.filter(e => e.event_type == ty && e.ts.getTime * 1000L > after)
          if (c.isEmpty) None else Some(c.map(e => e.ts.getTime * 1000L).min)
        }
        for {
          v <- stageAt("view", Long.MinValue)
          c <- stageAt("click", v)
          p <- stageAt("purchase", c)
        } yield u -> Seq(v, c, p)
      }

      // random ARRIVAL order (not time order): a 10h watermark keeps every
      // row inside the horizon, so buffering must fully reorder it
      val arrival = rnd.shuffle(evs)
      val ms = MemoryStream[Ev]
      val q = TsStream.funnelStream(ms.toDF(), "user_id", "ts", "event_type",
          stages, watermark = "10 hours")
        .writeStream.format("memory").queryName(s"funnel_prop_$seed")
        .outputMode("append").start()
      try {
        var i = 0
        while (i < arrival.length) {
          val n = 1 + rnd.nextInt(25)
          ms.addData(arrival.slice(i, i + n)); i += n
          q.processAllAvailable()
        }
        ms.addData(Ev(-1L, t("2024-02-01 00:00:00"), -1L, "noise", 0.0, "{}"))
        q.processAllAvailable()
        val got = spark.table(s"funnel_prop_$seed").collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        assert(got == want,
          s"seed=$seed: missing=${(want.toSet -- got.toSet).take(3)} " +
            s"extra=${(got.toSet -- want.toSet).take(3)}")
      } finally q.stop()
    }
    assert(userCases >= 100, s"only $userCases generated user-cases")
  }
}
