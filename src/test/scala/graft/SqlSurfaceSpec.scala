package graft

import graft.operators.RelationalPack
import graft.ts.TsTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files
import java.sql.Timestamp

/** SQL entry point (SURVEY.md §3.3): every table reachable through
  * `spark.sql`, SQL results identical to the DataFrame API (same Catalyst
  * plans), and TsTable views keep the partition-pruning story. */
class SqlSurfaceSpec extends SparkSpec {

  test("registerViews exposes every fixture table to spark.sql") {
    Tables.registerViews(spark, sf0001)
    Tables.all.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").collect().length == 1, t)
    }
  }

  test("spark.sql == DataFrame API on a join and an aggregation") {
    Tables.registerViews(spark, sf0001)
    val sqlJoin = spark.sql(
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin).collect()
    val dfJoin = RelationalPack.joinBroadcast(spark, sf0001).collect()
    assert(sqlJoin.toSeq == dfJoin.toSeq)

    val sqlAgg = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect()
    val dfAgg = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect()
    assert(sqlAgg.toSeq == dfAgg.toSeq)
  }

  test("TsTable view: SQL range read == readRange, partition pruning intact") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    val dir = Files.createTempDirectory("graft_sql_ts").toString
    val tab = TsTable.create(spark, dir, schema)
    val rows = Seq("2024-03-01 10:00:00", "2024-03-02 10:00:00",
      "2024-03-03 10:00:00", "2024-03-04 10:00:00").zipWithIndex
      .map { case (s, i) => Row(Timestamp.valueOf(s), i.toLong) }
    tab.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema))
    tab.registerView("ts_view")
    val q = spark.sql(
      """SELECT ts, v FROM ts_view
        |WHERE p_date BETWEEN to_date('2024-03-02') AND to_date('2024-03-03')
        |  AND ts BETWEEN timestamp'2024-03-02 00:00:00'
        |             AND timestamp'2024-03-03 23:00:00'""".stripMargin)
    val viaApi = tab.readRange(
      Timestamp.valueOf("2024-03-02 00:00:00"),
      Timestamp.valueOf("2024-03-03 23:00:00"))
    assert(q.collect().map(_.getLong(1)).sorted.toSeq ==
      viaApi.collect().map(_.getLong(1)).sorted.toSeq)
    // the SQL plan prunes day directories exactly like the DataFrame path
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    assert(scanned <= 2, s"expected <=2 files scanned via SQL, got $scanned")
  }
}
