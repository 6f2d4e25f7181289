package graft

import org.apache.spark.sql.functions._

/** AQE skew handling: the runtime answer to hot join keys. The engine's
  * own operators carry construction-time skew defenses (NearDedup's
  * hot/cold df split, AsOfJoin's salt recipe); for plain joins the story is
  * Adaptive Query Execution splitting oversized partitions at runtime —
  * this spec proves the engine's session actually triggers it on a
  * deliberately hot key, so the claim isn't just configuration folklore. */
class SkewJoinSpec extends SparkSpec {

  test("a hot join key triggers AQE's skew split (skew=true in the final plan)") {
    val savedConfs = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // fixture-sized thresholds: a partition is "skewed" at >256 KB and
      // 1x the median — the same mechanism, just scaled down from the
      // 256 MB-ish defaults a real cluster would keep
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "131072")

      // 100k rows, ~70% on key 1, padded so the hot partition is ~MBs
      val left = spark.range(0, 100000)
        .select(when(col("id") % 10 < 7, 1L).otherwise(col("id")).as("k"),
          lpad(col("id").cast("string"), 64, "x").as("pad"))
      val right = spark.range(0, 1000)
        .select(col("id").as("rk"), lit("dim").as("tag"))
      val joined = left.join(right, col("k") === col("rk"))
      // execute THIS dataframe (count() would re-plan a different query and
      // leave joined's own adaptive plan unfinalized)
      assert(joined.collect().length == 70000 + 300) // hot key + tail < 1000
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot partition:\n$plan")
    } finally savedConfs.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
