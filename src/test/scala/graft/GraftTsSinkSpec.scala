package graft

import graft.ts.TsTable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** The native `writeStream.format("graft-ts")` sink: ordered micro-batch
  * appends through the facade write path, exactly-once via manifest-
  * stamped (sink id, batch id), composing with the graft-ts streaming
  * source into a no-glue table-to-table pipe. */
class GraftTsSinkSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("user_id", LongType),
    StructField("value", DoubleType)))

  private def mkRows(rows: Seq[(String, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (s, u, v) => (Timestamp.valueOf(s), u, v) }
      .toDF("ts", "user_id", "value")
  }

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("ts_sink_spec").toString

  private def pipe(src: String, dst: String, ckpt: String): Unit = {
    val q = spark.readStream.format("graft-ts")
      .option("startingVersion", "0").load(src)
      .writeStream.format("graft-ts")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
  }

  test("source → sink pipe with no foreachBatch: full replay lands, a " +
      "restarted query appends only the new commits, stamps dedup replays") {
    val src = freshDir(); val dst = freshDir(); val ckpt = freshDir()
    val s = TsTable.create(spark, src, schema)
    s.append(mkRows(Seq(
      ("2024-03-01 10:00:00", 1L, 1.0), ("2024-03-02 10:00:00", 2L, 2.0))))
    s.append(mkRows(Seq(("2024-03-03 10:00:00", 3L, 3.0))))
    TsTable.create(spark, dst, schema)
    pipe(src, dst, ckpt)
    val d = TsTable.open(spark, dst)
    assert(d.toDF.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
    // sink commits are ordinary "append" versions, stamped for dedup
    val stamped = d.snapshotVersions.filter(_._2 == "append")
    assert(stamped.nonEmpty)
    val vAfterFirst = d.currentVersion.get
    // drained again with the same checkpoint and NO new data: nothing lands
    pipe(src, dst, ckpt)
    assert(TsTable.open(spark, dst).currentVersion.get == vAfterFirst,
      "an empty re-drain must not commit")
    // new source commit → only ITS rows land on the next drain
    s.append(mkRows(Seq(("2024-03-04 10:00:00", 4L, 4.0))))
    pipe(src, dst, ckpt)
    val d2 = TsTable.open(spark, dst)
    assert(d2.toDF.collect().map(_.getLong(1)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // the dst's own readRange serves the piped rows in ts order
    assert(d2.readRange(Timestamp.valueOf("2024-03-02 00:00:00"),
        Timestamp.valueOf("2024-03-04 23:00:00"))
      .orderBy("ts").collect().map(_.getLong(1)).toSeq == Seq(2L, 3L, 4L))
  }

  test("replay guard: an addBatch whose id is at-or-below the newest " +
      "manifest stamp is skipped, a foreign sink identity is not") {
    val dst = freshDir()
    val t = TsTable.create(spark, dst, schema)
    // simulate a committed batch 7 from sink identity "aaaa"
    t.appendWithMeta(mkRows(Seq(("2024-03-01 10:00:00", 1L, 1.0))),
      filesPerDay = 1, strict = false,
      Map("streamSink" -> "aaaa", "streamBatch" -> "7"))
    assert(t.lastSinkBatch("aaaa").contains(7L))
    assert(t.lastSinkBatch("bbbb").isEmpty)
    // maintenance in between must not hide the stamp (header walk skips
    // unstamped manifests)
    t.compactAll(targetFiles = 1)
    assert(TsTable.open(spark, dst).lastSinkBatch("aaaa").contains(7L))
  }

  test("lateData=backfill: a time-regressing micro-batch lands as a " +
      "stamped backfill instead of failing; the default mode still fails") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def df(ms: MemoryStream[Long]) = ms.toDF().select(
      timestamp_seconds(col("value")).as("ts"),
      col("value").as("user_id"), lit(1.0).as("value"))
    val day2 = Timestamp.valueOf("2024-03-02 10:00:00").toInstant.getEpochSecond
    val day1 = Timestamp.valueOf("2024-03-01 10:00:00").toInstant.getEpochSecond
    // tolerant sink: day-2 batch, then a LATE day-1 batch — both land
    val dstA = freshDir(); val ckptA = freshDir()
    TsTable.create(spark, dstA, schema)
    val msA = MemoryStream[Long]
    def drainA(): Unit = {
      val q = df(msA).writeStream.format("graft-ts")
        .option("checkpointLocation", ckptA)
        .option("lateData", "backfill")
        .trigger(Trigger.AvailableNow()).start(dstA)
      q.awaitTermination()
    }
    msA.addData(day2); drainA()
    msA.addData(day1); drainA()
    val a = TsTable.open(spark, dstA)
    assert(a.toDF.count() == 2)
    assert(a.snapshotVersions.map(_._2).takeRight(2) == Seq("append", "backfill"))
    assert(a.minDt.get == Timestamp.valueOf("2024-03-01 10:00:00"))
    // default sink: the late batch fails the query, nothing lands from it
    val dstB = freshDir(); val ckptB = freshDir()
    TsTable.create(spark, dstB, schema)
    val msB = MemoryStream[Long]
    def drainB(): Unit = {
      val q = df(msB).writeStream.format("graft-ts")
        .option("checkpointLocation", ckptB)
        .trigger(Trigger.AvailableNow()).start(dstB)
      q.awaitTermination()
    }
    msB.addData(day2); drainB()
    msB.addData(day1)
    intercept[Exception](drainB())
    assert(TsTable.open(spark, dstB).toDF.count() == 1)
  }

  test("sink refuses non-append output modes and partitionBy") {
    val dst = freshDir()
    TsTable.create(spark, dst, schema)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Long]
    val df = ms.toDF().select(
      lit("2024-03-01 10:00:00").cast("timestamp").as("ts"),
      col("value").as("user_id"), lit(1.0).as("value"))
    val e = intercept[Exception] {
      df.writeStream.format("graft-ts")
        .outputMode("complete")
        .option("checkpointLocation", freshDir())
        .trigger(Trigger.AvailableNow())
        .start(dst).awaitTermination()
    }
    assert(e.getMessage != null)
    val e2 = intercept[Exception] {
      df.writeStream.format("graft-ts")
        .partitionBy("user_id")
        .option("checkpointLocation", freshDir())
        .trigger(Trigger.AvailableNow())
        .start(dst).awaitTermination()
    }
    assert(e2.getMessage != null)
  }
}
