package graft

import org.apache.spark.sql.functions._

/** Bucketing: the pre-shuffled-layout technique for repeated big joins.
  * Writing both sides bucketed by the join key into the same bucket count
  * lets every subsequent join (or aggregation) on that key run with ZERO
  * exchanges — at 100 TB, paying one layout shuffle at ingest instead of
  * one per query is the difference between an I/O-bound and a
  * network-bound pipeline. The engine's TsTable gets the analogous effect
  * from its p_date layout; this spec proves the relational side. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join with no exchange on either side") {
    val buckets = 8
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.orders(spark, sf0001)
      .write.mode("overwrite")
      .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    Tables.customer(spark, sf0001)
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"))
      .write.mode("overwrite")
      .bucketBy(buckets, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")

    // force the shuffle-join path so the bucket layout is what's under test
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the same rows as the plain join
      val plain = Tables.orders(spark, sf0001)
        .join(Tables.customer(spark, sf0001)
            .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
      assert(joined.orderBy("o_orderkey").collect().toSeq ==
        plain.orderBy("o_orderkey").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("group-by on the bucket key also skips the exchange") {
    val buckets = 8
    spark.sql("DROP TABLE IF EXISTS b_orders2")
    Tables.orders(spark, sf0001)
      .write.mode("overwrite")
      .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders2")
    try {
      val agg = spark.table("b_orders2")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed group-by still shuffles:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS b_orders2")
  }
}
