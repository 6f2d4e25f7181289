package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md).
  * One parquet file per table under `sfDir`. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else {
      // orders/lineitem timestamps are parquet TIMESTAMP(MILLIS, no-tz);
      // Spark 4 would infer TIMESTAMP_NTZ, which breaks unix_micros and
      // comparisons against the (LTZ) events.ts. Session TZ is pinned UTC,
      // so reading them as instants is lossless and matches DuckDB.
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** events.ts is physically Parquet TIMESTAMP(NANOS), which Spark rejects
    * outright (PARQUET_TYPE_ILLEGAL). Read it as an int64 nanos column via
    * the legacy conf and convert to a µs TimestampType — the generated
    * values carry only µs resolution (SURVEY.md §1.4.4), so `ns / 1000`
    * (floor, matching DuckDB's epoch_us) loses nothing. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000"))) // integer div: `/` would go through double and lose µs at 1.7e18 ns
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
