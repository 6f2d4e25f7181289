package graft.operators

import graft.Tables
import graft.ts.TsTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** Time-series operators: the reference's own surface (read_range, min/max,
  * ordered append — afiedler/tstables `tstables/tstable.py`, see SURVEY.md §2
  * Part A) over the `events` table.
  *
  * Scale notes: every query here is shuffle-free or single-shuffle; range
  * reads are partition-pruned + parquet-stat-pruned (the distributed analogue
  * of the reference's bisect-into-sorted-HDF5-chunks read path).
  */
object TimeSeriesPack extends QueryPack {

  // Closed-interval flagship range (events span 2024-01-01 → 2024-01-30 UTC).
  private val RangeLo = "2024-01-05 00:00:00"
  private val RangeHi = "2024-01-12 00:00:00"

  private def ts(lit0: String): Timestamp = Timestamp.valueOf(lit0)

  /** Canonical deterministic projection of events rows: raw timestamps are
    * emitted as epoch micros (events.ts is physically ns but carries only µs
    * resolution — SURVEY.md §1.4.4). */
  private def eventsProjection(df: DataFrame): DataFrame =
    df.select(
      col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
      col("event_type"), col("value"), col("props"))
      .orderBy(col("event_id"))

  private val eventsProjectionSql =
    "event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props"

  /** A4 read_range: time-range query, closed interval [lo, hi]. */
  def readRange(s: SparkSession, dir: String): DataFrame =
    eventsProjection(
      Tables.events(s, dir)
        .where(col("ts").between(lit(RangeLo).cast("timestamp"),
          lit(RangeHi).cast("timestamp"))))

  /** A5 min_dt / max_dt (+ total count): metadata-cheap full-table agg. */
  def minMaxDt(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).agg(
      unix_micros(min(col("ts"))).as("min_ts_us"),
      unix_micros(max(col("ts"))).as("max_ts_us"),
      count(lit(1)).as("n"))

  /** A3+A4 round-trip through a real TsTable store: events → two ordered
    * appends into a fresh daily-partitioned store → readRange back out.
    * The oracle is the same range read on the raw events table, so this
    * hash-checks the storage layer end-to-end (partition split, sort,
    * schema persistence, closed-interval read). */
  def appendRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = Files.createTempDirectory("graft_tstable_rt").toString
    val ev = Tables.events(s, dir)
    val t = TsTable.create(s, store, ev.schema, tsCol = "ts")
    val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
    t.append(ev.where(col("ts") < cutoff))
    t.append(ev.where(col("ts") >= cutoff))
    eventsProjection(
      TsTable.open(s, store) // reopen: schema comes from the stored descriptor
        .readRange(ts("2024-01-08 00:00:00"), ts("2024-01-22 00:00:00")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_read_range" -> readRange,
    "q_min_max_dt" -> minMaxDt,
    "q_append_roundtrip" -> appendRoundtrip)

  def oracles: Map[String, String] = Map(
    // date_trunc('microseconds', …) on the DuckDB side: events.ts physically
    // carries ns digits; Spark sees it floored to µs, so the oracle must
    // filter on the floored value too or exact-boundary rows could diverge.
    "q_read_range" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) BETWEEN TIMESTAMP '$RangeLo' AND TIMESTAMP '$RangeHi'
         |ORDER BY event_id""".stripMargin,
    "q_min_max_dt" ->
      """SELECT epoch_us(min(ts)) AS min_ts_us, epoch_us(max(ts)) AS max_ts_us,
        |count(*) AS n FROM events""".stripMargin,
    "q_append_roundtrip" ->
      s"""SELECT $eventsProjectionSql FROM events
         |WHERE date_trunc('microseconds', ts) BETWEEN TIMESTAMP '2024-01-08 00:00:00' AND TIMESTAMP '2024-01-22 00:00:00'
         |ORDER BY event_id""".stripMargin)
}
