package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries.
  *
  * Contract (SURVEY.md §2): every key in `queries` is one operator from the
  * inventory; `oracles` carries the DuckDB-dialect ANSI SQL the driver runs
  * on the same parquet tables for a hash-compare. Keys missing from
  * `oracles` get a weaker rows-only check and MUST be covered by ScalaTest.
  *
  * Determinism rules every query obeys (SURVEY.md §2, §1.4.4):
  *   - total ORDER BY ending in a unique key, identical on both sides;
  *   - no raw timestamps in output — emit epoch micros
  *     (`unix_micros` ↔ DuckDB `epoch_us`) so timezone/ns-vs-µs encoding
  *     differences can't break the hash;
  *   - no unrounded floating aggregates — order-sensitive reductions are
  *     rounded to a precision far coarser than cross-engine summation noise;
  *     per-row double arithmetic (same inputs, same IEEE ops) is emitted as-is;
  *   - identical column names on both sides (driver sorts columns by name).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
