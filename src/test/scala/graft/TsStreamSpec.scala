package graft

import graft.streaming.TsStream
import graft.ts.TsTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import java.nio.file.Files
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

/** Composite-key, multi-column fixtures for the GENERIC stream-stream
  * as-of engine (TsStream.asOfStreamOf). */
case class Trade(sym: String, venue: String, ts: Timestamp,
                 qty: Long, px: Double)
case class Quote(sym: String, venue: String, ts: Timestamp,
                 bid: Double, ask: Double)

/** B10 streaming: batch≡stream window parity, watermark late-drop, and the
  * ordered foreachBatch append sink (the streaming face of the reference's
  * append-order ValueError). */
class TsStreamSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)
  private def ev(id: Long, ts: String, v: Double = 1.0) =
    Ev(id, t(ts), id % 7, "purchase", v, "{}")

  test("stream tumbling windows == batch tumbling windows on chunked replay") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val ms = MemoryStream[Ev]
    val q = TsStream.windowedCounts(ms.toDF(), "ts", "1 hour")
      .writeStream.format("memory").queryName("tumbling_parity")
      .outputMode("complete").start()
    try {
      rows.grouped((rows.length / 4).max(1)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("tumbling_parity")
        .select(unix_micros($"w_start").as("us"), $"n",
          round($"sum_value", 4).as("sv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = TsStream.windowedCounts(Tables.events(spark, sf0001), "ts", "1 hour")
        .select(unix_micros($"w_start").as("us"), $"n",
          round($"sum_value", 4).as("sv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("chained stateful aggs: streaming per-window top-k leaderboard == " +
      "batch on chunked replay; windows emit once, on watermark close") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Ev].collect().sortBy(_.ts.getTime)
    // sentinel far past the fixture: closes every fixture window under the
    // 1 h watermark (its own window stays open and must NOT emit)
    val sentinel = rows.last.copy(event_id = -1L,
      ts = new java.sql.Timestamp(rows.last.ts.getTime + 7 * 24 * 3600 * 1000L))
    val ms = MemoryStream[Ev]
    val q = TsStream.topKeysPerWindow(ms.toDF(), "ts", "user_id",
        watermark = "1 hour", width = "4 hours", k = 3)
      .writeStream.format("memory").queryName("leaderboard")
      .outputMode("append").start()
    try {
      (rows.grouped((rows.length / 4).max(1)).map(_.toSeq).toSeq :+ Seq(sentinel))
        .foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      val got = spark.table("leaderboard")
        .select(unix_micros($"w_start").as("us"), $"rank", $"key", $"n")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      // batch truth: identical plan over the static fixture (no sentinel)
      val want = TsStream.topKeysPerWindow(
          Tables.events(spark, sf0001), "ts", "user_id",
          watermark = "1 hour", width = "4 hours", k = 3)
        .select(unix_micros($"w_start").as("us"), $"rank", $"key", $"n")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want, s"missing=${want -- got} extra=${got -- want}")
      assert(got.nonEmpty)
      // the sentinel's own (unclosed) window never emitted
      val sentinelUs = (sentinel.ts.getTime / (4 * 3600 * 1000L)) * 4 * 3600 * 1000000L
      assert(!got.exists(_._1 == sentinelUs))
    } finally q.stop()
  }

  test("builtin stream-stream interval self-join == batch rangeJoin on chunked replay") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val ms = MemoryStream[Ev]
    val q = TsStream.rangeJoinStream(ms.toDF())
      .writeStream.format("memory").queryName("range_join_stream")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length / 4).max(1)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("range_join_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = graft.operators.TimeSeriesPack.rangeJoin(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"missing=${(want -- got).size} extra=${(got -- want).size}")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stream OHLC == batch resampleOhlc on chunked replay") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val ms = MemoryStream[Ev]
    val q = TsStream.ohlc(ms.toDF(), "ts", "event_type", "value", "event_id",
      "4 hours")
      .writeStream.format("memory").queryName("ohlc_parity")
      .outputMode("complete").start()
    try {
      rows.grouped((rows.length / 4).max(1)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("ohlc_parity")
        .select(unix_micros($"w_start").as("us"), $"event_type",
          $"open", $"high", $"low", $"close", $"n")
        .collect().map(_.toSeq).toSet
      // the oracle-checked batch formulation (row_number-pinned open/close)
      val want = graft.operators.TimeSeriesPack.resampleOhlc(spark, sf0001)
        .select($"b_us", $"event_type", $"open", $"high", $"low", $"close", $"n")
        .collect().map(_.toSeq).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("sliding windows: each event lands in width/slide windows") {
    import spark.implicits._
    val out = TsStream.windowedCounts(
      Seq(ev(1, "2024-01-01 10:05:00")).toDF(), "ts", "1 hour", Some("15 minutes"))
      .collect()
    assert(out.length == 4) // 60min/15min overlapping windows cover the instant
    assert(out.forall(_.getLong(2) == 1L))
  }

  test("watermark drops late rows; finalized windows are not revised") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = TsStream.windowedCounts(ms.toDF(), "ts", "1 hour",
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    try {
      def step(evs: Ev*): Unit = { ms.addData(evs.toSeq); q.processAllAvailable() }
      step(ev(1, "2024-01-01 09:00:00"), ev(2, "2024-01-01 09:10:00"),
        ev(3, "2024-01-01 09:20:00"))
      step(ev(4, "2024-01-01 11:00:00")) // watermark → 10:30 > 10:00: [09,10) final
      step(ev(5, "2024-01-01 09:40:00"), // LATE: behind watermark, dropped
        ev(6, "2024-01-01 11:10:00"))
      step(ev(7, "2024-01-01 13:00:00")) // watermark → 12:30: [11,12) final
      step(ev(8, "2024-01-01 15:00:00")) // flush emission of pending finals
      val byWin = spark.table("late_drop").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(2)).toMap
      assert(byWin("2024-01-01 09:00:00.0") == 3L) // late ev(5) NOT counted
      assert(byWin("2024-01-01 11:00:00.0") == 2L)
    } finally q.stop()
  }

  test("streaming funnel == batch funnel completions on chunked replay; " +
      "chunk boundaries and late-but-in-horizon arrivals don't change emissions") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Ev].collect().sortBy(_.ts.getTime)
    // batch truth: users whose chain completed, with all three stage times
    val want = graft.operators.EventAnalyticsPack.funnel(spark, sf0001).collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3))
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(want.nonEmpty, "fixture should complete at least one funnel")
    // flush sentinel: advances the watermark past every fixture event
    val flush = Ev(-1L, new Timestamp(rows.last.ts.getTime + 30L * 24 * 3600 * 1000),
      -1L, "noop", 0.0, "{}")

    def run(chunks: Int, name: String): Map[Long, Seq[Long]] = {
      val ms = MemoryStream[Ev]
      val q = TsStream.funnelStream(ms.toDF(), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), watermark = "1 hour")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        rows.grouped((rows.length / chunks).max(1)).foreach { chunk =>
          ms.addData(chunk.toSeq); q.processAllAvailable()
        }
        ms.addData(flush); q.processAllAvailable()
        spark.table(name).collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      } finally q.stop()
    }

    val got3 = run(3, "funnel_stream_3")
    assert(got3.keySet == want.keySet,
      s"missing=${want.keySet -- got3.keySet} extra=${got3.keySet -- want.keySet}")
    assert(got3 == want, s"stage times diverge")
    // chunk-boundary invariance
    val got7 = run(7, "funnel_stream_7")
    assert(got7 == got3)
  }

  test("streaming sessionization == batch gaps-and-islands on chunked " +
      "replay with shuffled arrival inside the horizon") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Ev].collect()
    val want = graft.operators.EventAnalyticsPack.sessionize(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // shuffled WITHIN coarse time bands (so nothing is late past the 3h
    // watermark but the fold must reorder inside each band)
    val rnd = new scala.util.Random(42)
    val banded = rows.groupBy(_.ts.getTime / (3600L * 1000)).toSeq
      .sortBy(_._1).flatMap { case (_, band) => rnd.shuffle(band.toSeq) }
    val flush = Ev(-1L, new Timestamp(rows.map(_.ts.getTime).max +
      30L * 24 * 3600 * 1000), -1L, "noop", 0.0, "{}")

    val ms = MemoryStream[Ev]
    val q = TsStream.sessionizeStream(ms.toDF(), "user_id", "event_id", "ts",
        watermark = "3 hours")
      .writeStream.format("memory").queryName("sessionize_stream")
      .outputMode("append").start()
    try {
      banded.grouped(120).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      ms.addData(flush); q.processAllAvailable()
      val got = spark.table("sessionize_stream").collect()
        .filter(_.getLong(0) >= 0)
        .map(r => (r.getLong(1), r.getLong(0), r.getLong(3))).toSet
      assert(got == want,
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.map(_._3).max > 1, "fixture should produce multi-session users")
    } finally q.stop()
  }

  test("late-data stats: watermark drops are measured, per query and lifetime") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val monitor = TsStream.monitorLateData(spark)
    val ms = MemoryStream[Ev]
    val agg = ms.toDF().withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).count()
    val q = agg.writeStream.format("memory").queryName("late_stats")
      .outputMode("append").start()
    try {
      def e(id: Long, ts: String) = Ev(id, t(ts), 1, "view", 1.0, "{}")
      ms.addData(e(1, "2024-03-01 10:00:00"), e(2, "2024-03-01 12:00:00"))
      q.processAllAvailable()
      // three hours behind the 11:50 watermark: silently dropped — the
      // stats are what make that visible
      ms.addData(e(3, "2024-03-01 08:00:00"))
      q.processAllAvailable()
      val st = TsStream.lateDataStats(q)
      assert(st.inputRows == 3, st.toString)
      assert(st.droppedByWatermark >= 1, st.toString)
      assert(st.nBatches >= 2, st.toString)
      assert(st.lastWatermark.exists(_.startsWith("2024-03-01T11:50")), st.toString)
      // lifetime monitor converges to the same totals (async listener bus)
      val deadline = System.nanoTime() + 10L * 1000000000
      while (monitor.stats.droppedByWatermark < st.droppedByWatermark &&
        System.nanoTime() < deadline) Thread.sleep(50)
      assert(monitor.stats.droppedByWatermark >= st.droppedByWatermark,
        monitor.stats.toString)
      assert(monitor.stats.inputRows >= st.inputRows, monitor.stats.toString)
    } finally {
      q.stop()
      spark.streams.removeListener(monitor)
    }
  }

  test("streaming SCD2 == batch closed runs on chunked shuffled replay") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Ev].collect()
    // batch truth: CLOSED intervals only (the open run's end is unknowable
    // live — the documented divergence)
    val want = graft.operators.EventAnalyticsPack.scd2(spark, sf0001)
      .where(org.apache.spark.sql.functions.col("valid_to_us").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

    val rnd = new scala.util.Random(7)
    val banded = rows.groupBy(_.ts.getTime / (3600L * 1000)).toSeq
      .sortBy(_._1).flatMap { case (_, band) => rnd.shuffle(band.toSeq) }
    val flush = Ev(-1L, new Timestamp(rows.map(_.ts.getTime).max +
      30L * 24 * 3600 * 1000), -1L, "noop", 0.0, "{}")

    val ms = MemoryStream[Ev]
    val q = TsStream.scd2Stream(ms.toDF(), "user_id", "event_id", "ts",
        "event_type", watermark = "3 hours")
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode("append").start()
    try {
      banded.grouped(150).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      ms.addData(flush); q.processAllAvailable()
      val got = spark.table("scd2_stream").collect()
        .filter(_.getLong(0) >= 0)
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(want.nonEmpty, "fixture must close runs")
    } finally q.stop()
  }

  test("streaming SCD2: same-instant state flip follows event-id order") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = TsStream.scd2Stream(ms.toDF(), "user_id", "event_id", "ts",
        "event_type", watermark = "1 minute")
      .writeStream.format("memory").queryName("scd2_tie")
      .outputMode("append").start()
    try {
      // view(id 1) and click(id 2) at the SAME instant, then a flush event
      ms.addData(
        Ev(2, t("2024-03-01 00:00:00"), 1, "click", 1.0, "{}"),
        Ev(1, t("2024-03-01 00:00:00"), 1, "view", 1.0, "{}"))
      q.processAllAvailable()
      ms.addData(Ev(3, t("2024-03-01 02:00:00"), 1, "view", 1.0, "{}"))
      q.processAllAvailable()
      ms.addData(Ev(4, t("2024-03-01 04:00:00"), 1, "noop", 1.0, "{}"))
      q.processAllAvailable()
      // far-future flush (other user) advances the watermark past every
      // user-1 event so all closable runs fold; the trailing noop run and
      // the flush user's own run stay open by design
      ms.addData(Ev(5, t("2024-06-01 00:00:00"), -1L, "flush", 1.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("scd2_tie").collect()
        .filter(_.getLong(0) == 1L)
        .map(r => (r.getLong(1), r.getString(2), r.getLong(5))).sortBy(_._1)
      // runs: view(1 event) -> click(1) -> view(1) -> [open noop]
      assert(got.toSeq == Seq((1L, "view", 1L), (2L, "click", 1L),
        (3L, "view", 1L)), got.mkString(","))
    } finally q.stop()
  }

  test("streaming funnel: completion emits once; equal-time events cannot chain") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def e(id: Long, u: Long, ts: String, ty: String) =
      Ev(id, t(ts), u, ty, 1.0, "{}")
    val ms = MemoryStream[Ev]
    val q = TsStream.funnelStream(ms.toDF(), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("funnel_once")
      .outputMode("append").start()
    try {
      // user 1: view and click at the SAME instant -> click cannot chain;
      // a later click + purchase completes. user 2: two full chains ->
      // exactly one emission.
      ms.addData(
        e(1, 1, "2024-03-01 00:00:00", "view"),
        e(2, 1, "2024-03-01 00:00:00", "click"),
        e(3, 1, "2024-03-01 00:01:00", "click"),
        e(4, 1, "2024-03-01 00:02:00", "purchase"),
        e(5, 2, "2024-03-01 00:00:00", "view"),
        e(6, 2, "2024-03-01 00:00:30", "click"),
        e(7, 2, "2024-03-01 00:01:00", "purchase"),
        e(8, 2, "2024-03-01 00:03:00", "view"),
        e(9, 2, "2024-03-01 00:04:00", "click"),
        e(10, 2, "2024-03-01 00:05:00", "purchase"))
      q.processAllAvailable()
      ms.addData(e(99, 9, "2024-03-01 02:00:00", "noop")) // flush
      q.processAllAvailable()
      val got = spark.table("funnel_once").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1))
      assert(got.length == 2, got.toSeq.toString)
      val m = got.toMap
      def us(s: String) = TsStream2Us(s)
      assert(m(1L) == Seq(us("2024-03-01 00:00:00"), us("2024-03-01 00:01:00"),
        us("2024-03-01 00:02:00")))
      assert(m(2L) == Seq(us("2024-03-01 00:00:00"), us("2024-03-01 00:00:30"),
        us("2024-03-01 00:01:00")))
    } finally q.stop()
  }

  private def TsStream2Us(s: String): Long = t(s).getTime * 1000L

  test("stream-static backward as-of == batch AsOfJoin.backward on chunked replay") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val left = Tables.events(spark, sf0001)
    // dimension updates spanning the events range, plus never/always-match keys
    val static = Seq(
      (0L, t("2024-01-01 00:00:00"), 10.0),
      (0L, t("2024-01-10 00:00:00"), 11.0),
      (0L, t("2024-01-20 12:00:00"), 12.0),
      (1L, t("2024-01-05 06:30:00"), 20.0),
      (1L, t("2024-01-25 00:00:00"), 21.0),
      (2L, t("2024-02-05 00:00:00"), 30.0), // after every event: never matches
      (3L, t("2023-12-01 00:00:00"), 40.0)  // before every event: always matches
    ).toDF("dkey", "dts", "dval")
    val want = graft.operators.AsOfJoin.backward(
        left, static, "user_id", "dkey", "ts", "dts")
      .select($"event_id", $"dval", unix_micros($"dts").as("dus"))
      .collect().map(_.toSeq).toSet
    assert(want.exists(_(1) != null) && want.exists(_(1) == null)) // both shapes exercised
    val rows = left
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val ms = MemoryStream[Ev]
    val q = TsStream.asOfBackwardStatic(ms.toDF(), static,
        "user_id", "dkey", "ts", "dts")
      .select($"event_id", $"dval", unix_micros($"dts").as("dus"))
      .writeStream.format("memory").queryName("asof_parity")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length / 4).max(1)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("asof_parity").collect().map(_.toSeq).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stream-static FORWARD as-of == batch AsOfJoin.forward on chunked replay") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val left = Tables.events(spark, sf0001)
    val static = Seq(
      (0L, t("2024-01-01 00:00:00"), 10.0), // before most events of key 0
      (0L, t("2024-01-10 00:00:00"), 11.0),
      (0L, t("2024-01-20 12:00:00"), 12.0),
      (1L, t("2024-01-05 06:30:00"), 20.0),
      (1L, t("2024-01-25 00:00:00"), 21.0),
      (2L, t("2024-02-05 00:00:00"), 30.0), // after every event: always the fwd match
      (3L, t("2023-12-01 00:00:00"), 40.0)  // before every event: never a fwd match
    ).toDF("dkey", "dts", "dval")
    val want = graft.operators.AsOfJoin.forward(
        left, static, "user_id", "dkey", "ts", "dts")
      .select($"event_id", $"dval", unix_micros($"dts").as("dus"))
      .collect().map(_.toSeq).toSet
    assert(want.exists(_(1) != null) && want.exists(_(1) == null))
    val rows = left
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val ms = MemoryStream[Ev]
    val q = TsStream.asOfForwardStatic(ms.toDF(), static,
        "user_id", "dkey", "ts", "dts")
      .select($"event_id", $"dval", unix_micros($"dts").as("dus"))
      .writeStream.format("memory").queryName("asof_fwd_static_parity")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length / 4).max(1)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("asof_fwd_static_parity").collect().map(_.toSeq).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stream-static NEAREST as-of == batch AsOfJoin.nearest on chunked " +
      "replay; exact midpoint ties resolve backward") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val left = Tables.events(spark, sf0001)
    val static = Seq(
      (0L, t("2024-01-01 00:00:00"), 10.0),
      (0L, t("2024-01-10 00:00:00"), 11.0),
      (0L, t("2024-01-20 12:00:00"), 12.0),
      (1L, t("2024-01-05 06:30:00"), 20.0),
      (1L, t("2024-01-25 00:00:00"), 21.0),
      (2L, t("2024-02-05 00:00:00"), 30.0), // far side: still the nearest for key 2
      (3L, t("2023-12-01 00:00:00"), 40.0)
    ).toDF("dkey", "dts", "dval")
    val want = graft.operators.AsOfJoin.nearest(
        left, static, "user_id", "dkey", "ts", "dts")
      .select($"event_id", $"dval", unix_micros($"dts").as("dus"))
      .collect().map(_.toSeq).toSet
    assert(want.exists(_(1) != null)) // keys 4..6 have no static rows → nulls too
    val rows = left
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val ms = MemoryStream[Ev]
    val q = TsStream.asOfNearestStatic(ms.toDF(), static,
        "user_id", "dkey", "ts", "dts")
      .select($"event_id", $"dval", unix_micros($"dts").as("dus"))
      .writeStream.format("memory").queryName("asof_near_static_parity")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length / 4).max(1)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("asof_near_static_parity").collect().map(_.toSeq).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
    // exact-tie pin: an event equidistant from both neighbors takes the
    // EARLIER (backward) row — and the plain-join form runs on batch inputs
    val stream = Seq((1L, t("2024-01-01 10:30:00"), 7L)).toDF("eid", "ets", "ekey")
    val dims = Seq(
      (7L, t("2024-01-01 10:00:00"), 1.0),
      (7L, t("2024-01-01 11:00:00"), 2.0)).toDF("dkey", "dts", "dval")
    val tie = TsStream.asOfNearestStatic(stream, dims, "ekey", "dkey", "ets", "dts")
      .select($"dval").head.getDouble(0)
    assert(tie == 1.0, s"midpoint tie must resolve backward, got $tie")
  }

  test("stream-static as-of: closed lower bound (right row at exactly t matches) " +
      "and null static keys never match") {
    import spark.implicits._
    val stream = Seq(
      (1L, t("2024-01-01 10:00:00"), 7L),
      (2L, t("2024-01-01 09:59:59"), 7L),
      (3L, t("2024-01-01 10:00:00"), 8L) // key with only a null-keyed static row
    ).toDF("eid", "ets", "ekey")
    val static = Seq(
      (Some(7L), Some(t("2024-01-01 10:00:00")), 1.5),
      (None: Option[Long], Some(t("2024-01-01 00:00:00")), 9.9), // null key: dropped
      (Some(8L), None: Option[Timestamp], 8.8)                   // null time: dropped
    ).toDF("dkey", "dts", "dval")
    // the operator is a plain join, so it runs identically on batch inputs
    val out = TsStream.asOfBackwardStatic(stream, static, "ekey", "dkey", "ets", "dts")
      .select($"eid", $"dval").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(out(1L) == 1.5) // exactly-at-t static row IS visible (closed bound)
    assert(out(2L) == null) // one second earlier: no match yet
    assert(out(3L) == null) // null-keyed/timed static rows never match
  }

  test("stream-stream backward as-of == batch AsOfJoin.backward on chunked replay") {
    import spark.implicits._
    import graft.streaming.KeyedPoint
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(11)
    def tp(min: Int) = t(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    // left: 300 events over 5 keys; right: sparser quotes, some keys quote-less
    val lefts = (0 until 300).map(i => KeyedPoint(i % 5, tp(rnd.nextInt(180)), i.toDouble))
    val rights = (0 until 60).map(i => KeyedPoint(i % 4, tp(rnd.nextInt(180)), 1000.0 + i))
    // watermark horizon: the sentinel advances the watermark past every row,
    // so all pending lefts finalize; it carries key -1 (matches nothing)
    val sentinelL = KeyedPoint(-1L, t("2024-01-03 00:00:00"), 0.0)
    val sentinelR = KeyedPoint(-1L, t("2024-01-03 00:00:00"), 0.0)

    val want = graft.operators.AsOfJoin.backward(
        lefts.toDF("key", "ts", "value"),
        rights.toDF("rkey", "rts", "rvalue"),
        "key", "rkey", "ts", "rts")
      .select($"key", unix_micros($"ts").as("us"), $"value",
        unix_micros($"rts").as("rus"), $"rvalue")
      .collect().map(_.toSeq).toSet

    val msL = MemoryStream[KeyedPoint]
    val msR = MemoryStream[KeyedPoint]
    // 5-minute watermark delay: chunks come off a time-sorted merged
    // timeline, so no row is ever late — stream must equal batch EXACTLY
    val q = TsStream.asOfBackwardStream(msL.toDS(), msR.toDS(),
        watermark = "5 minutes")
      .select($"key", unix_micros($"ts").as("us"), $"value",
        unix_micros($"r_ts").as("rus"), $"r_value".as("rvalue"))
      .writeStream.format("memory").queryName("asof_ss_parity")
      .outputMode("append").start()
    try {
      // both sides replayed along one merged event-time timeline (the shape
      // a real broker delivers); sides split per chunk, unordered within it
      val timeline = (lefts.map((_, true)) ++ rights.map((_, false)))
        .sortBy(_._1.ts.getTime)
      timeline.grouped(60).foreach { chunk =>
        val (ls, rs) = chunk.partition(_._2)
        if (rs.nonEmpty) msR.addData(rs.map(_._1))
        if (ls.nonEmpty) msL.addData(ls.map(_._1))
        q.processAllAvailable()
      }
      msL.addData(Seq(sentinelL)); msR.addData(Seq(sentinelR))
      q.processAllAvailable()
      // one more tick so timeouts armed at the new watermark fire
      msL.addData(Seq(sentinelL.copy(ts = t("2024-01-04 00:00:00"))))
      q.processAllAvailable()
      val got = spark.table("asof_ss_parity")
        .where($"key" >= 0) // drop the sentinels' own rows
        .collect().map(_.toSeq).toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(got.nonEmpty && got.exists(_(4) == null) && got.exists(_(4) != null))
    } finally q.stop()
  }

  test("stream-stream FORWARD as-of == batch AsOfJoin.forward on chunked " +
      "replay (finite tolerance so every left finalizes)") {
    import spark.implicits._
    import graft.streaming.KeyedPoint
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(13)
    def tp(min: Int) = t(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    // same shape as the backward parity test: 5 keys of events, 4 keys of
    // sparser quotes (key 4 quote-less → tolerance-expiry nulls), unique
    // right (key, ts) pairs (tied forward matches are engine-ambiguous)
    val lefts = (0 until 300).map(i => KeyedPoint(i % 5, tp(rnd.nextInt(180)), i.toDouble))
    val seen = scala.collection.mutable.Set.empty[(Long, Int)]
    val rights = (0 until 60).flatMap { i =>
      val m = rnd.nextInt(180)
      if (seen.add((i % 4, m))) Some(KeyedPoint(i % 4, tp(m), 1000.0 + i)) else None
    }
    // the bound that makes forward finality decidable on a stream: a left
    // with no candidate inside 45 min finalizes as null once the watermark
    // passes its tolerance window
    val tolUs = Some(45L * 60 * 1000000)

    val want = graft.operators.AsOfJoin.forward(
        lefts.toDF("key", "ts", "value"),
        rights.toDF("rkey", "rts", "rvalue"),
        "key", "rkey", "ts", "rts", toleranceUs = tolUs)
      .select($"key", unix_micros($"ts").as("us"), $"value",
        unix_micros($"rts").as("rus"), $"rvalue")
      .collect().map(_.toSeq).toSet

    val msL = MemoryStream[KeyedPoint]
    val msR = MemoryStream[KeyedPoint]
    val q = TsStream.asOfForwardStream(msL.toDS(), msR.toDS(),
        watermark = "5 minutes", idleHorizonMs = 24L * 3600 * 1000,
        toleranceUs = tolUs)
      .select($"key", unix_micros($"ts").as("us"), $"value",
        unix_micros($"r_ts").as("rus"), $"r_value".as("rvalue"))
      .writeStream.format("memory").queryName("asof_fwd_parity")
      .outputMode("append").start()
    try {
      val timeline = (lefts.map((_, true)) ++ rights.map((_, false)))
        .sortBy(_._1.ts.getTime)
      timeline.grouped(60).foreach { chunk =>
        val (ls, rs) = chunk.partition(_._2)
        if (rs.nonEmpty) msR.addData(rs.map(_._1))
        if (ls.nonEmpty) msL.addData(ls.map(_._1))
        q.processAllAvailable()
      }
      msL.addData(Seq(KeyedPoint(-1L, t("2024-01-03 00:00:00"), 0.0)))
      msR.addData(Seq(KeyedPoint(-1L, t("2024-01-03 00:00:00"), 0.0)))
      q.processAllAvailable()
      msL.addData(Seq(KeyedPoint(-1L, t("2024-01-04 00:00:00"), 0.0)))
      q.processAllAvailable()
      val got = spark.table("asof_fwd_parity")
        .where($"key" >= 0).collect().map(_.toSeq).toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      // both outcomes exercised: matched-forward rows and tolerance nulls
      assert(got.exists(_(4) == null) && got.exists(_(4) != null))
    } finally q.stop()
  }

  test("stream-stream NEAREST as-of == batch AsOfJoin.nearest on chunked " +
      "replay (backward tie preference, per-side tolerance)") {
    import spark.implicits._
    import graft.streaming.KeyedPoint
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(17)
    def tp(min: Int) = t(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    val lefts = (0 until 300).map(i => KeyedPoint(i % 5, tp(rnd.nextInt(180)), i.toDouble))
    val seen = scala.collection.mutable.Set.empty[(Long, Int)]
    val rights = (0 until 60).flatMap { i =>
      val m = rnd.nextInt(180)
      if (seen.add((i % 4, m))) Some(KeyedPoint(i % 4, tp(m), 1000.0 + i)) else None
    }
    val tolUs = Some(45L * 60 * 1000000)

    val want = graft.operators.AsOfJoin.nearest(
        lefts.toDF("key", "ts", "value"),
        rights.toDF("rkey", "rts", "rvalue"),
        "key", "rkey", "ts", "rts", toleranceUs = tolUs)
      .select($"key", unix_micros($"ts").as("us"), $"value",
        unix_micros($"rts").as("rus"), $"rvalue")
      .collect().map(_.toSeq).toSet

    val msL = MemoryStream[KeyedPoint]
    val msR = MemoryStream[KeyedPoint]
    val q = TsStream.asOfNearestStream(msL.toDS(), msR.toDS(),
        watermark = "5 minutes", idleHorizonMs = 24L * 3600 * 1000,
        toleranceUs = tolUs)
      .select($"key", unix_micros($"ts").as("us"), $"value",
        unix_micros($"r_ts").as("rus"), $"r_value".as("rvalue"))
      .writeStream.format("memory").queryName("asof_near_parity")
      .outputMode("append").start()
    try {
      val timeline = (lefts.map((_, true)) ++ rights.map((_, false)))
        .sortBy(_._1.ts.getTime)
      timeline.grouped(60).foreach { chunk =>
        val (ls, rs) = chunk.partition(_._2)
        if (rs.nonEmpty) msR.addData(rs.map(_._1))
        if (ls.nonEmpty) msL.addData(ls.map(_._1))
        q.processAllAvailable()
      }
      msL.addData(Seq(KeyedPoint(-1L, t("2024-01-03 00:00:00"), 0.0)))
      msR.addData(Seq(KeyedPoint(-1L, t("2024-01-03 00:00:00"), 0.0)))
      q.processAllAvailable()
      msL.addData(Seq(KeyedPoint(-1L, t("2024-01-04 00:00:00"), 0.0)))
      q.processAllAvailable()
      val got = spark.table("asof_near_parity")
        .where($"key" >= 0).collect().map(_.toSeq).toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(got.exists(_(4) == null) && got.exists(_(4) != null))
    } finally q.stop()
  }

  test("stream-stream forward as-of: a left emits at the first safe right " +
      "(watermark past the candidate), not only at stream end") {
    import spark.implicits._
    import graft.streaming.KeyedPoint
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val msL = MemoryStream[KeyedPoint]
    val msR = MemoryStream[KeyedPoint]
    val q = TsStream.asOfForwardStream(msL.toDS(), msR.toDS(),
        watermark = "0 seconds", idleHorizonMs = 24L * 3600 * 1000)
      .writeStream.format("memory").queryName("asof_fwd_incr")
      .outputMode("append").start()
    try {
      def step(): Unit = q.processAllAvailable()
      msL.addData(Seq(KeyedPoint(7L, t("2024-01-01 10:00:00"), 100.0))); step()
      // the candidate right arrives 5 min later
      msR.addData(Seq(KeyedPoint(7L, t("2024-01-01 10:05:00"), 1.5))); step()
      // another key pushes the watermark past the candidate → the pending
      // left finalizes on a TIMEOUT (no further key-7 input needed)
      msL.addData(Seq(KeyedPoint(9L, t("2024-01-01 12:00:00"), 0.0))); step()
      step() // timeout fires on the batch after the wm advance
      val got = spark.table("asof_fwd_incr").where($"key" === 7L).collect()
        .map(r => (r.getDouble(2), Option(r.get(4)).map(_.asInstanceOf[Double])))
      assert(got.toSeq == Seq((100.0, Some(1.5))), s"got ${got.toSeq}")
    } finally q.stop()
  }

  test("forward/nearest as-of: an undecidable left (no right ever, no " +
      "tolerance) finalizes UNMATCHED at the idle-GC horizon instead of " +
      "pinning state forever") {
    import spark.implicits._
    import graft.streaming.KeyedPoint
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def run(name: String,
            mk: (org.apache.spark.sql.Dataset[KeyedPoint],
                 org.apache.spark.sql.Dataset[KeyedPoint]) =>
                org.apache.spark.sql.Dataset[graft.streaming.PointAsOf]): Unit = {
      val msL = MemoryStream[KeyedPoint]
      val msR = MemoryStream[KeyedPoint]
      val q = mk(msL.toDS(), msR.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        def step(): Unit = q.processAllAvailable()
        // key 7: one left, never any right on its key
        msL.addData(Seq(KeyedPoint(7L, t("2024-01-01 10:00:00"), 100.0))); step()
        // another key pushes the watermark far past 10:00 + the 1-minute
        // idle horizon; extra ticks let the armed timeout fire
        msL.addData(Seq(KeyedPoint(9L, t("2024-01-01 13:00:00"), 0.0))); step()
        step(); step()
        val got = spark.table(name).where($"key" === 7L).collect()
          .map(r => (r.getDouble(2), Option(r.get(4)))).toSeq
        assert(got == Seq((100.0, None)), s"$name: got $got")
      } finally q.stop()
    }
    run("asof_fwd_gcflush", (l, r) => TsStream.asOfForwardStream(
      l, r, watermark = "0 seconds", idleHorizonMs = 60000L))
    run("asof_near_gcflush", (l, r) => TsStream.asOfNearestStream(
      l, r, watermark = "0 seconds", idleHorizonMs = 60000L))
  }

  test("stream-stream as-of: a flush timeout must not evict the rights buffer " +
      "(later lefts still match old rights)") {
    import spark.implicits._
    import graft.streaming.KeyedPoint
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val msL = MemoryStream[KeyedPoint]
    val msR = MemoryStream[KeyedPoint]
    // 24h idle horizon: key 7 stays within it for the whole timeline, so
    // any eviction of its rights buffer is the bug, not contract idle-GC
    val q = TsStream.asOfBackwardStream(msL.toDS(), msR.toDS(),
        watermark = "0 seconds", idleHorizonMs = 24L * 3600 * 1000)
      .writeStream.format("memory").queryName("asof_ss_evict")
      .outputMode("append").start()
    try {
      def step(): Unit = q.processAllAvailable()
      // key 7: one right, one left close behind
      msR.addData(Seq(KeyedPoint(7L, t("2024-01-01 10:00:00"), 1.5))); step()
      msL.addData(Seq(KeyedPoint(7L, t("2024-01-01 10:05:00"), 100.0))); step()
      // another KEY advances the watermark past 10:05 → key 7's pending
      // left flushes via its event-time TIMEOUT (no key-7 data in batch)
      msL.addData(Seq(KeyedPoint(9L, t("2024-01-01 12:00:00"), 0.0))); step()
      step() // extra tick: timeout fires on the batch after the wm advance
      // key 7 receives a LATER left — its backward match is still the
      // 10:00 right, which the flush timeout must not have evicted
      msL.addData(Seq(KeyedPoint(7L, t("2024-01-01 13:00:00"), 200.0))); step()
      msL.addData(Seq(KeyedPoint(9L, t("2024-01-01 15:00:00"), 0.0))); step()
      step()
      val got = spark.table("asof_ss_evict").where($"key" === 7L)
        .orderBy($"ts").collect()
        .map(r => (r.getDouble(2), Option(r.get(4)).map(_.asInstanceOf[Double])))
      assert(got.toSeq == Seq((100.0, Some(1.5)), (200.0, Some(1.5))),
        s"got ${got.toSeq}")
    } finally q.stop()
  }

  test("ordered append sink: in-order microbatches land, regression fails the query") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("ts_stream_sink").toString
    val table = TsTable.create(spark, s"$dir/store",
      Seq(ev(0, "2024-01-01 00:00:00")).toDF().schema, tsCol = "ts")

    val ms = MemoryStream[Ev]
    val sink = TsStream.appendSink(ms.toDF(), table, s"$dir/ckpt")
    ms.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-02 10:00:00"))
    TsStream.drain(sink)
    ms.addData(ev(3, "2024-01-02 11:00:00"), ev(4, "2024-01-03 09:00:00"))
    TsStream.drain(sink)
    assert(table.toDF.count() == 4)
    // daily partition dirs materialized by the sink's append path
    val days = new java.io.File(s"$dir/store").list().count(_.startsWith("p_date="))
    assert(days == 3)

    // a time-regressing microbatch must fail the query, not corrupt the table
    val ms2 = MemoryStream[Ev]
    ms2.addData(ev(5, "2024-01-01 00:00:00")) // before stored max 2024-01-03
    val bad = TsStream.appendSink(ms2.toDF(), table, s"$dir/ckpt2")
    val e = intercept[StreamingQueryException] { TsStream.drain(bad) }
    assert(e.getCause.isInstanceOf[IllegalArgumentException])
    assert(table.toDF.count() == 4) // untouched
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("incremental readStream: appended commits arrive as version-keyed " +
      "microbatches, maintenance emits nothing, a checkpointed restart " +
      "resumes from the committed version, startingVersion replays") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ts_stream_src").toString
    val store = s"$dir/store"
    val first = Seq(ev(1, "2024-01-01 10:00:00")).toDF()
    val table = TsTable.create(spark, store, first.schema, tsCol = "ts")
    table.append(first) // PRE-stream commit: not served by default
    def collector(into: scala.collection.mutable.Set[Long])
        : (org.apache.spark.sql.DataFrame, Long) => Unit =
      (b, _) => { into ++= b.select("event_id").collect().map(_.getLong(0)); () }
    val got = scala.collection.mutable.Set[Long]()
    val q = spark.readStream.format("graft-ts").load(store)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(collector(got)).start()
    try {
      q.processAllAvailable()
      assert(got.isEmpty, "pre-stream history must not replay by default")
      table.append(Seq(ev(2, "2024-01-02 10:00:00")).toDF())
      table.append(Seq(ev(3, "2024-01-02 11:00:00")).toDF())
      q.processAllAvailable()
      assert(got.toSet == Set(2L, 3L))
      // maintenance commits emit NOTHING: compact rewrites day 2 (its two
      // files merge), delete removes a row — neither re-feeds the stream
      assert(table.compactAll(targetFiles = 1) == Seq("2024-01-02"))
      assert(table.deleteWhere(col("event_id") === 2L) == 1L)
      q.processAllAvailable()
      assert(got.toSet == Set(2L, 3L), "maintenance must not re-emit rows")
      table.append(Seq(ev(4, "2024-01-03 09:00:00")).toDF())
      q.processAllAvailable()
      assert(got.toSet == Set(2L, 3L, 4L))
    } finally q.stop()
    // restart against the SAME checkpoint: only commits after the stored
    // offset arrive (version offsets round-trip the checkpoint)
    table.append(Seq(ev(5, "2024-01-04 09:00:00")).toDF())
    val got2 = scala.collection.mutable.Set[Long]()
    val q2 = spark.readStream.format("graft-ts").load(store)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(collector(got2)).start()
    try {
      q2.processAllAvailable()
      assert(got2.toSet == Set(5L), "restart must resume, not replay")
    } finally q2.stop()
    // startingVersion=0 replays every APPENDED row from creation — the
    // delete's removal is an action, not rows (documented CDF semantic:
    // the deleted row's append still happened; its file resolves from
    // the archive)
    val got3 = scala.collection.mutable.Set[Long]()
    val q3 = spark.readStream.format("graft-ts")
      .option("startingVersion", "0").load(store)
      .writeStream.option("checkpointLocation", s"$dir/ckpt3")
      .foreachBatch(collector(got3)).start()
    try {
      q3.processAllAvailable()
      assert(got3.toSet == Set(1L, 2L, 3L, 4L, 5L))
    } finally q3.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("a rewrite landing MID-microbatch — after the batch planned, before " +
      "it executed — cannot kill the consumer: tasks re-resolve displaced " +
      "files through the archive (the literal plan-vs-execute race)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ts_stream_midbatch").toString
    val store = s"$dir/store"
    val first = Seq(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 11:00:00"),
      ev(3, "2024-01-01 12:00:00")).toDF()
    val table = TsTable.create(spark, store, first.schema, tsCol = "ts")
    table.append(first)
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val displaced = new java.util.concurrent.atomic.AtomicBoolean(false)
    // foreachBatch receives the ALREADY-PLANNED batch frame (files
    // resolved at getBatch); running maintenance inside the body and THEN
    // executing the frame is exactly a verb landing mid-batch. Gate it to
    // ONE firing: an unconditional compact would commit a version per
    // microbatch and processAllAvailable would never drain.
    val q = spark.readStream.format("graft-ts")
      .option("startingVersion", "0").load(store)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // isEmpty probes the planned files BEFORE displacement (a tiny
        // pre-race job); the full collect below then re-executes the same
        // plan AFTER the rewrite — the race, deterministically
        if (!b.isEmpty && displaced.compareAndSet(false, true))
          TsTable.open(spark, store).compactAll(targetFiles = 1,
            clusterBy = Seq("user_id", "value")) // re-sort → displaces EVERY planned file
        got ++= b.select("event_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(got.toSet == Set(1L, 2L, 3L),
        s"mid-batch displacement must be survived in place, got $got")
    } finally q.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("maxVersionsPerTrigger drains a backlog in bounded microbatches and " +
      "a checkpointed restart stays exactly-once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ts_stream_rate").toString
    val store = s"$dir/store"
    val first = Seq(ev(1, "2024-01-01 10:00:00")).toDF()
    val table = TsTable.create(spark, store, first.schema, tsCol = "ts")
    table.append(first)
    (2 to 6).foreach(i => table.append(Seq(ev(i, s"2024-01-0$i 10:00:00")).toDF()))
    // 7 commits exist (create + 6 appends); replay from 0 capped at 2
    // versions per trigger must take >= 4 non-empty microbatches
    val batches = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val q = spark.readStream.format("graft-ts")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "2").load(store)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.select("event_id").collect().map(_.getLong(0)).toSet
        if (ids.nonEmpty) batches.synchronized { batches += ids }; ()
      }.start()
    try {
      q.processAllAvailable()
      assert(batches.flatten.toSet == (1L to 6L).toSet, s"lost rows: $batches")
      assert(batches.length >= 3,
        s"a 6-append backlog at 2 versions/trigger must split: $batches")
      assert(batches.forall(_.size <= 2), s"a batch exceeded the cap: $batches")
    } finally q.stop()
    // restart against the same checkpoint: the cap must not regress the
    // committed offset (the positioned floor) — only NEW commits arrive
    table.append(Seq(ev(7, "2024-01-07 10:00:00")).toDF())
    val got2 = scala.collection.mutable.Set[Long]()
    val q2 = spark.readStream.format("graft-ts")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "2").load(store)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got2 ++= b.select("event_id").collect().map(_.getLong(0)); ()
      }.start()
    try {
      q2.processAllAvailable()
      assert(got2.toSet == Set(7L), s"restart must resume exactly-once, got $got2")
    } finally q2.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("change-feed readStream: deletes and updates stream as row-level " +
      "_change_type batches; plain mode stays silent on them; horizon " +
      "replay serves synthetic inserts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ts_stream_cdf").toString
    val store = s"$dir/store"
    val first = Seq(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 11:00:00")).toDF()
    val table = TsTable.create(spark, store, first.schema, tsCol = "ts")
    table.append(first)
    val got = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val q = spark.readStream.format("graft-ts")
      .option("readChangeFeed", "true").load(store)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.select("event_id", "_change_type", "_commit_version")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(got.isEmpty, "pre-stream history must not replay by default")
      table.append(Seq(ev(3, "2024-01-02 10:00:00")).toDF())
      q.processAllAvailable()
      assert(got.toSet == Set((3L, "insert", table.currentVersion.get)))
      got.clear()
      table.deleteWhere(col("event_id") === 1L)
      val vDel = table.currentVersion.get
      // NO drain between the rewrite verbs: the update displaces the
      // delete's files while both are unconsumed — execution-time archive
      // resolution (ArchiveResolvingParquetFileFormat) serves the
      // delete-version diff from the mirrored paths, so a live consumer
      // needs no maintenance-window serialization
      table.updateWhere(col("event_id") === 2L, Map("value" -> lit(9.0)))
      val vUpd = table.currentVersion.get
      q.processAllAvailable()
      assert(got.toSet == Set(
        (1L, "delete", vDel),
        (2L, "delete", vUpd), (2L, "insert", vUpd)),
        "delete feeds its row; update feeds a pre/post pair")
      // compact: content-preserving, silent in CDF mode too
      got.clear()
      table.compactAll(targetFiles = 1)
      q.processAllAvailable()
      assert(got.isEmpty, "compact must stay silent in change-feed mode")
    } finally q.stop()
    // horizon replay: expire history so startingVersion=0 predates the
    // retained manifests — the earliest retained full state stands in as
    // synthetic inserts stamped with the horizon version
    table.expireSnapshots(keepLast = 1)
    val horizon = table.snapshotVersions.head._1
    val got2 = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val q2 = spark.readStream.format("graft-ts")
      .option("readChangeFeed", "true").option("startingVersion", "0").load(store)
      .writeStream.option("checkpointLocation", s"$dir/ckpt2")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got2 ++= b.select("event_id", "_change_type", "_commit_version")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        ()
      }.start()
    try {
      q2.processAllAvailable()
      assert(got2.toSet == Set((2L, "insert", horizon), (3L, "insert", horizon)),
        "horizon stand-in = surviving rows as synthetic inserts")
    } finally q2.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("sink survives a mid-stream restore: the next microbatch re-anchors " +
      "on the restored max; history stays linear") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("ts_stream_restore").toString
    val table = TsTable.create(spark, s"$dir/store",
      Seq(ev(0, "2024-01-01 00:00:00")).toDF().schema, tsCol = "ts")
    val ms = MemoryStream[Ev]
    val sink = TsStream.appendSink(ms.toDF(), table, s"$dir/ckpt")
    ms.addData(ev(1, "2024-01-01 10:00:00"))
    TsStream.drain(sink)
    val good = table.currentVersion.get
    // a bad microbatch lands (clock-skewed producer jumped four days ahead)
    ms.addData(ev(2, "2024-01-05 10:00:00"))
    TsStream.drain(sink)
    // operator rolls the table back BETWEEN microbatches
    table.restore(good)
    assert(table.toDF.count() == 1)
    // the stream continues: this ts would REGRESS against the bad batch's
    // max (2024-01-05) but is valid against the restored state — the sink
    // must re-anchor on the restored maxDt, not fail on a stale one
    ms.addData(ev(3, "2024-01-02 09:00:00"))
    TsStream.drain(sink)
    assert(table.toDF.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // history moved FORWARD through the restore — linear, never rewritten
    val hist = table.snapshotVersions
    assert(hist.map(_._2) == Seq("create", "append", "append", "restore", "append"))
    assert(hist.map(_._1) == (1L to hist.length).toSeq)
    // the pre-restore state (bad batch included) is still pinnable
    assert(table.openAt(3L).toDF.count() == 2)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("sink fragmentation heals: many microbatches → compactAll → same content") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("ts_stream_compact").toString
    val table = TsTable.create(spark, s"$dir/store",
      Seq(ev(0, "2024-01-01 00:00:00")).toDF().schema, tsCol = "ts")
    val ms = MemoryStream[Ev]
    val sink = TsStream.appendSink(ms.toDF(), table, s"$dir/ckpt")
    // 4 in-order microbatches all landing on the SAME day → ≥4 files in it
    for (h <- 1 to 4) {
      ms.addData(ev(h.toLong, f"2024-01-01 $h%02d:00:00"),
        ev(h.toLong + 10, f"2024-01-01 $h%02d:30:00"))
      TsStream.drain(sink)
    }
    val partDir = new java.io.File(s"$dir/store/p_date=2024-01-01")
    def nFiles = partDir.list().count(n => !n.startsWith("_") && !n.startsWith("."))
    assert(nFiles >= 4, s"expected one file per microbatch, got $nFiles")
    val before = table.toDF.orderBy("event_id").collect().toSeq

    assert(table.compactAll(targetFiles = 1) == Seq("2024-01-01"))
    assert(nFiles == 1)
    assert(table.toDF.orderBy("event_id").collect().toSeq == before)
    // the healed table still accepts in-order stream appends
    ms.addData(ev(99, "2024-01-01 23:00:00"))
    TsStream.drain(sink)
    assert(table.toDF.count() == before.size + 1)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("streaming dedup: duplicate keys dropped, state evicted past the watermark") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = TsStream.dedupWithinWatermark(ms.toDF(), "ts", "30 minutes", "event_id")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      def step(evs: Ev*): Unit = { ms.addData(evs.toSeq); q.processAllAvailable() }
      step(ev(1, "2024-01-01 09:00:00"), ev(2, "2024-01-01 09:10:00"))
      step(ev(1, "2024-01-01 09:05:00")) // dup of live key: dropped
      step(ev(3, "2024-01-01 12:00:00")) // watermark → 11:30, keys 1,2 evicted
      step(ev(1, "2024-01-01 12:10:00")) // key 1 re-admitted: state was evicted
      step(ev(9, "2024-01-01 15:00:00")) // flush
      val ids = spark.table("stream_dedup").collect().map(_.getLong(0)).toSeq
      assert(ids.count(_ == 1L) == 2) // once live, once after eviction
      assert(ids.count(_ == 2L) == 1)
      assert(ids.contains(3L))
    } finally q.stop()
  }

  test("custom-state deltas: stream equals batch lag() on chunked in-order replay") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.{KeyedPoint, PointDelta}
    val rows = Tables.events(spark, sf0001)
      .select($"user_id".as("key"), $"ts", $"value").as[KeyedPoint]
      .collect().sortBy(_.ts.getTime)
    val ms = MemoryStream[KeyedPoint]
    // horizon >> the fixture's month span: parity here is vs plain lag();
    // eviction semantics have their own test below
    val q = TsStream.deltasPerKey(ms.toDS(), watermark = "1 hour",
        idleHorizonMs = 10L * 365 * 24 * 3600 * 1000)
      .writeStream.format("memory").queryName("stream_deltas")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length / 5).max(1)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      // flush: a far-future point advances the watermark past everything
      ms.addData(Seq(KeyedPoint(999999L, t("2024-12-31 00:00:00"), 0.0)))
      q.processAllAvailable()
      val got = spark.table("stream_deltas").as[PointDelta].collect()
        .filter(_.key != 999999L)
        .map(p => (p.key, p.ts.getTime, p.value, p.delta.map(d => math.round(d * 1e4)),
          p.gap_us)).toSet
      // batch truth: lag() per key over the same rows
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"key").orderBy($"ts")
      val want = rows.toSeq.toDF("key", "ts", "value")
        .withColumn("delta", $"value" - lag($"value", 1).over(w))
        .withColumn("gap_us", unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2),
          Option(r.get(3)).map(d => math.round(d.asInstanceOf[Double] * 1e4)),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
      assert(got == want,
        s"missing=${(want -- got).take(4).mkString(";")} extra=${(got -- want).take(4).mkString(";")} sizes=${got.size}/${want.size}")
      assert(got.exists(_._4.isDefined)) // deltas actually produced
    } finally q.stop()
  }

  test("streaming Hampel: med == batch windowMedian exactly on ordered " +
      "chunked replay; mad/flag match a driver-side trailing-window fold") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.{KeyedPoint, PointHampel}
    def us(ts: Timestamp): Long = (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L
    val raw = Tables.events(spark, sf0001)
      .select($"user_id".as("key"), $"ts", $"value", $"event_id")
      .collect().sortBy(r => (r.getTimestamp(1).getTime, r.getLong(3)))
    val rows = raw.map(r => KeyedPoint(r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val ms = MemoryStream[KeyedPoint]
    val q = TsStream.hampelPerKey(ms.toDS(), window = 5,
        watermark = "1 hour", idleHorizonMs = 10L * 365 * 24 * 3600 * 1000)
      .writeStream.format("memory").queryName("stream_hampel")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length / 5).max(1)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("stream_hampel").as[PointHampel].collect()
        .map(p => (p.key, us(p.ts), p.value) -> p).toMap
      assert(got.size == rows.length, "one emission per point")
      // med parity vs the BATCH windowMedian key (same trailing-5 frame,
      // same interpolation, same 6dp rounding)
      val batchMed = graft.operators.StatsPack.windowMedian(spark, sf0001)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val eventKey = raw.map(r =>
        r.getLong(3) -> ((r.getLong(0), us(r.getTimestamp(1)), r.getDouble(2))))
      eventKey.foreach { case (eid, k) =>
        assert(got(k).med == batchMed(eid),
          s"event $eid: stream med ${got(k).med} vs batch ${batchMed(eid)}")
      }
      // mad + flag vs a driver-side fold over the same ordered stream
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      def medOf(s: Seq[Double]) = {
        val a = s.sorted; val n = a.length
        if (n % 2 == 1) a(n / 2) else (a(n / 2 - 1) + a(n / 2)) / 2.0
      }
      var outliers = 0
      rows.groupBy(_.key).foreach { case (_, ps) =>
        var win = Seq.empty[Double]
        ps.foreach { p =>
          win = (win :+ p.value).takeRight(5)
          val m = medOf(win)
          val md = medOf(win.map(v => math.abs(v - m)))
          val g = got((p.key, us(p.ts), p.value))
          assert(g.mad == r6(md) && g.med == r6(m))
          assert(g.is_outlier == (math.abs(p.value - m) > 3.0 * 1.4826 * md))
          if (g.is_outlier) outliers += 1
        }
      }
      assert(outliers > 0, "the gate should flag something on real data")
      // chunk-boundary invariance: one-shot replay emits identically
      val ms2 = MemoryStream[KeyedPoint]
      val q2 = TsStream.hampelPerKey(ms2.toDS(), window = 5,
          watermark = "1 hour", idleHorizonMs = 10L * 365 * 24 * 3600 * 1000)
        .writeStream.format("memory").queryName("stream_hampel_os")
        .outputMode("append").start()
      try {
        ms2.addData(rows.toSeq); q2.processAllAvailable()
        val os = spark.table("stream_hampel_os").as[PointHampel].collect()
          .map(p => (p.key, us(p.ts), p.value) -> ((p.med, p.mad, p.is_outlier))).toMap
        assert(os == got.view.mapValues(p => (p.med, p.mad, p.is_outlier)).toMap)
      } finally q2.stop()
    } finally q.stop()
  }

  test("streaming drawdown == batch windowDrawdown exactly on ordered chunked replay") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.{KeyedPoint, PointDrawdown}
    def us(ts: Timestamp): Long = (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L
    val rows = Tables.events(spark, sf0001)
      .select($"user_id".as("key"), $"ts", $"value", $"event_id")
      .collect().sortBy(r => (r.getTimestamp(1).getTime, r.getLong(3)))
      .map(r => KeyedPoint(r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val bench = 50.0 // TimeSeriesPack.DrawdownBench — batch parity needs it
    val ms = MemoryStream[KeyedPoint]
    val q = TsStream.drawdownPerKey(ms.toDS(), benchmark = bench,
        watermark = "1 hour", idleHorizonMs = 10L * 365 * 24 * 3600 * 1000)
      .writeStream.format("memory").queryName("stream_dd")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length / 5).max(1)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("stream_dd").as[PointDrawdown].collect()
        .map(p => (p.key, us(p.ts), p.value) -> p).toMap
      assert(got.size == rows.length, "one emission per point")
      // per-point parity vs a driver-side fold in the same 1e-4 units
      def e4(x: Double): Long =
        (BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000)
          .toLongExact
      val maxDdByKey = scala.collection.mutable.Map.empty[Long, Long]
      rows.groupBy(_.key).foreach { case (k, ps) =>
        var eq = 0L; var pk = Long.MinValue
        ps.foreach { p =>
          eq += e4(p.value - bench); if (eq > pk) pk = eq
          val g = got((p.key, us(p.ts), p.value))
          assert(e4(g.equity) == eq && e4(g.peak) == pk &&
            e4(g.drawdown) == pk - eq,
            s"key $k point ${p.ts}: stream (${g.equity},${g.peak},${g.drawdown})")
          maxDdByKey(k) = math.max(maxDdByKey.getOrElse(k, 0L), pk - eq)
        }
      }
      // each key's running max drawdown equals the registered batch key
      // max_drawdown surfaces as DOUBLE (scale-4 decimal cast once);
      // e4 recovers the exact 1e-4 units.
      val batch = graft.operators.TimeSeriesPack.windowDrawdown(spark, sf0001)
        .collect().map(r => r.getLong(0) -> e4(r.getDouble(1))).toMap
      assert(batch.keySet == maxDdByKey.keySet)
      batch.foreach { case (k, dd) =>
        assert(maxDdByKey(k) == dd,
          s"key $k: stream max dd ${maxDdByKey(k)} vs batch $dd")
      }
      assert(maxDdByKey.values.exists(_ > 0), "drawdowns should occur on real data")
      // chunk-boundary invariance: one-shot replay emits identically
      val ms2 = MemoryStream[KeyedPoint]
      val q2 = TsStream.drawdownPerKey(ms2.toDS(), benchmark = bench,
          watermark = "1 hour", idleHorizonMs = 10L * 365 * 24 * 3600 * 1000)
        .writeStream.format("memory").queryName("stream_dd_os")
        .outputMode("append").start()
      try {
        ms2.addData(rows.toSeq); q2.processAllAvailable()
        val os = spark.table("stream_dd_os").as[PointDrawdown].collect()
          .map(p => (p.key, us(p.ts), p.value) ->
            ((p.equity, p.peak, p.drawdown))).toMap
        assert(os == got.view.mapValues(p => (p.equity, p.peak, p.drawdown)).toMap)
      } finally q2.stop()
    } finally q.stop()
  }

  test("streaming CUSUM == batch windowCusum exactly on ordered chunked replay") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.{KeyedPoint, PointCusum}
    def us(ts: Timestamp): Long = (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L
    // (ts, event_id)-ordered replay: the stable in-batch sort then matches
    // the batch window's tiebreak
    val rows = Tables.events(spark, sf0001)
      .select($"user_id".as("key"), $"ts", $"value", $"event_id")
      .collect().sortBy(r => (r.getTimestamp(1).getTime, r.getLong(3)))
      .map(r => KeyedPoint(r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val ms = MemoryStream[KeyedPoint]
    val q = TsStream.cusumPerKey(ms.toDS(), mu0 = 50.0, k = 25.0, h = 400.0,
        watermark = "1 hour", idleHorizonMs = 10L * 365 * 24 * 3600 * 1000)
      .writeStream.format("memory").queryName("stream_cusum")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length / 5).max(1)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("stream_cusum").as[PointCusum].collect()
        .map(p => (p.key, us(p.ts), p.value) -> ((p.cusum, p.is_drift))).toMap
      val batch = graft.operators.StatsPack.windowCusum(spark, sf0001).collect()
        .map(r => (r.getLong(1), r.getLong(2)) -> ((r.getDouble(3), r.getBoolean(4))))
      val byEvent = Tables.events(spark, sf0001)
        .select($"user_id", $"ts", $"value").collect()
        .map(r => (r.getLong(0), us(r.getTimestamp(1))) -> r.getDouble(2)).toMap
      batch.foreach { case ((u, tUs), (cusum, drift)) =>
        val g = got((u, tUs, byEvent((u, tUs))))
        assert(g._1 == cusum, s"($u,$tUs): stream ${g._1} vs batch $cusum")
        assert(g._2 == drift, s"($u,$tUs): drift flag")
      }
      // sf0.001's excursions stay under the alarm bar (alarms fire at
      // sf0.01+ — the oracle checks them); here assert real accumulation
      assert(batch.exists(_._2._1 > 0.0), "cusum should accumulate somewhere")
    } finally q.stop()
  }

  test("streaming EWMA: exact recurrence on chunked replay; within truncation bound of batch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.{KeyedPoint, PointEwma}
    val rows = Tables.events(spark, sf0001)
      .select($"user_id".as("key"), $"ts", $"value").as[KeyedPoint]
      .collect().sortBy(_.ts.getTime)
    val ms = MemoryStream[KeyedPoint]
    val q = TsStream.ewmaPerKey(ms.toDS(), alpha = 0.5, watermark = "1 hour",
        idleHorizonMs = 10L * 365 * 24 * 3600 * 1000)
      .writeStream.format("memory").queryName("stream_ewma")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length / 5).max(1)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      ms.addData(Seq(KeyedPoint(999999L, t("2024-12-31 00:00:00"), 0.0)))
      q.processAllAvailable()
      def us(ts: Timestamp): Long = (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L
      val got = spark.table("stream_ewma").as[PointEwma].collect()
        .filter(_.key != 999999L)
        .map(p => (p.key, us(p.ts), p.value) -> p.ewma).toMap
      // driver-side reference: the same recurrence per key in event order —
      // identical Double ops, so equality is exact up to fold order (strict)
      var want = Map.empty[(Long, Long, Double), Double]
      rows.groupBy(_.key).foreach { case (k, ps) =>
        var (num, den) = (0.0, 0.0)
        ps.sortBy(p => us(p.ts)).foreach { p =>
          num = p.value + 0.5 * num; den = 1.0 + 0.5 * den
          want += ((k, us(p.ts), p.value) -> num / den)
        }
      }
      assert(got.keySet == want.keySet,
        s"sizes ${got.size}/${want.size}; missing=${(want.keySet -- got.keySet).take(3)}")
      got.foreach { case (k, e) => assert(e == want(k), s"$k: $e vs ${want(k)}") }
      // and the 20-row-truncated batch operator agrees within (1-α)^K of the
      // value scale — the documented truncation bound
      val batch = graft.operators.TimeSeriesPack.windowEwma(spark, sf0001)
        .select($"event_id", $"ewma").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val byEvent = Tables.events(spark, sf0001)
        .select($"event_id", $"user_id", $"ts", $"value").collect()
        .map(r => (r.getLong(1), us(r.getTimestamp(2)), r.getDouble(3)) -> r.getLong(0))
        .toMap
      var compared = 0
      got.foreach { case (k, e) =>
        val maxDiff = 5e-3 // 0.5^19 × the fixture's value range (~1e3)
        assert(math.abs(e - batch(byEvent(k))) < maxDiff,
          s"$k: stream $e vs batch ${batch(byEvent(k))}")
        compared += 1
      }
      assert(compared == batch.size)
    } finally q.stop()
  }

  test("custom-state deltas: idle keys are evicted, then restart cleanly") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.KeyedPoint
    val ms = MemoryStream[KeyedPoint]
    def kp(k: Long, ts: String, v: Double) = KeyedPoint(k, t(ts), v)
    // short idle horizon so eviction is observable
    val q = TsStream.deltasPerKey(ms.toDS(), watermark = "10 minutes",
        idleHorizonMs = 10L * 60 * 1000)
      .writeStream.format("memory").queryName("delta_evict")
      .outputMode("append").start()
    try {
      def step(ps: KeyedPoint*): Unit = { ms.addData(ps.toSeq); q.processAllAvailable() }
      step(kp(1, "2024-01-01 09:00:00", 10.0))
      step(kp(1, "2024-01-01 09:05:00", 12.0)) // delta 2.0 (state carried)
      step(kp(2, "2024-01-01 12:00:00", 1.0)) // watermark jumps; key 1 times out
      step(kp(1, "2024-01-01 12:30:00", 99.0)) // key 1 restarts: no stale delta
      val rows = spark.table("delta_evict")
        .select($"key", $"value", $"delta").collect()
        .map(r => (r.getLong(0), r.getDouble(1), Option(r.get(2)))).toSet
      assert(rows.contains((1L, 10.0, None)))
      assert(rows.contains((1L, 12.0, Some(2.0))))
      // after eviction the key starts fresh — NOT delta = 99.0 - 12.0
      assert(rows.contains((1L, 99.0, None)), rows.toString)
    } finally q.stop()
  }

  test("streaming file source over a TsTable directory") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ts_stream_src").toString
    val ev0 = Tables.events(spark, sf0001)
    val table = TsTable.create(spark, s"$dir/store", ev0.schema, tsCol = "ts")
    table.append(ev0)
    val q = TsStream.source(spark, s"$dir/store", table.schema)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("src_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = spark.table("src_counts").agg(sum($"n")).head.getLong(0)
      assert(n == ev0.count())
    } finally q.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("GENERIC stream-stream as-of (composite (sym, venue) key, " +
      "multi-column payloads) == batch AsOfJoin.backwardBy / nearestBy") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(29)
    def tp(min: Int) = t(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    val syms = Seq("AAA", "BBB"); val venues = Seq("X", "Y")
    val trades = (0 until 240).map { i =>
      Trade(syms(i % 2), venues((i / 2) % 2), tp(rnd.nextInt(180)),
        100L + i, 10.0 + i * 0.01)
    }
    // quotes for 3 of the 4 (sym, venue) combos — (BBB, Y) stays quote-less
    // so unmatched lefts are exercised; unique (key, ts) pairs (as-of under
    // right-side ties is engine-ambiguous)
    val seen = scala.collection.mutable.Set.empty[(String, String, Int)]
    val quotes = (0 until 90).flatMap { i =>
      val (s, v) = (syms(i % 2), venues((i / 2) % 2))
      val m = rnd.nextInt(180)
      if ((s, v) != ("BBB", "Y") && seen.add((s, v, m)))
        Some(Quote(s, v, tp(m), 20.0 + i * 0.1, 20.1 + i * 0.1))
      else None
    }
    val tolUs = Some(45L * 60 * 1000000) // makes nearest finality decidable
    val qdf = quotes.toDF("qsym", "qvenue", "qts", "bid", "ask")
    def wantFor(direction: String) = {
      val batch = direction match {
        case "backward" => graft.operators.AsOfJoin.backwardBy(
          trades.toDF("sym", "venue", "ts", "qty", "px"), qdf,
          Seq("sym", "venue"), Seq("qsym", "qvenue"), "ts", "qts",
          toleranceUs = tolUs)
        case "nearest" => graft.operators.AsOfJoin.nearestBy(
          trades.toDF("sym", "venue", "ts", "qty", "px"), qdf,
          Seq("sym", "venue"), Seq("qsym", "qvenue"), "ts", "qts",
          toleranceUs = tolUs)
      }
      batch.select($"sym", $"venue", unix_micros($"ts").as("us"), $"qty",
          $"px", unix_micros($"qts").as("qus"), $"bid", $"ask")
        .collect().map(_.toSeq).toSet
    }
    for (direction <- Seq("backward", "nearest")) {
      val msL = MemoryStream[Trade]
      val msR = MemoryStream[Quote]
      val got = {
        val q = TsStream.asOfStreamOf[(String, String), Trade, Quote](
            direction, msL.toDS(), msR.toDS(),
            l => (l.sym, l.venue), r => (r.sym, r.venue), _.ts, _.ts,
            watermark = "5 minutes", idleHorizonMs = 24L * 3600 * 1000,
            toleranceUs = tolUs)
          .select($"left.sym", $"left.venue",
            unix_micros($"left.ts").as("us"), $"left.qty", $"left.px",
            unix_micros($"right.ts").as("qus"), $"right.bid", $"right.ask")
          .writeStream.format("memory").queryName(s"asof_gen_$direction")
          .outputMode("append").start()
        try {
          val timeline: Seq[Either[Trade, Quote]] =
            (trades.map(Left(_)) ++ quotes.map(Right(_)))
              .sortBy(_.fold(_.ts.getTime, _.ts.getTime))
          timeline.grouped(60).foreach { chunk =>
            val rs = chunk.collect { case Right(r) => r }
            val ls = chunk.collect { case Left(l) => l }
            if (rs.nonEmpty) msR.addData(rs)
            if (ls.nonEmpty) msL.addData(ls)
            q.processAllAvailable()
          }
          // sentinel ticks: advance the watermark past every real row, then
          // once more so re-armed timeouts fire
          msL.addData(Seq(Trade("~", "~", t("2024-01-03 00:00:00"), 0L, 0.0)))
          msR.addData(Seq(Quote("~", "~", t("2024-01-03 00:00:00"), 0.0, 0.0)))
          q.processAllAvailable()
          msL.addData(Seq(Trade("~", "~", t("2024-01-04 00:00:00"), 0L, 0.0)))
          q.processAllAvailable()
          spark.table(s"asof_gen_$direction")
            .where($"sym" =!= "~").collect().map(_.toSeq).toSet
        } finally q.stop()
      }
      val want = wantFor(direction)
      assert(got == want, s"[$direction] missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
      // the (BBB, Y) combo has no quotes → unmatched; others match
      assert(got.exists(_(5) == null) && got.exists(_(5) != null),
        s"[$direction] both outcomes should be exercised")
    }
  }
}
