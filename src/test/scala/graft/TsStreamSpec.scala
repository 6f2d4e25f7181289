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
}
