package graft

import graft.operators.RelationalPack
import graft.streaming.TsStream
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

  test("spark.sql == DataFrame API on the round-13 additions (fuzzy join, melt, SCD2)") {
    Tables.registerViews(spark, sf0001)
    // blocked Levenshtein pairs, straight SQL
    val sqlFuzzy = spark.sql(
      """WITH names AS (SELECT p_name, min(p_partkey) AS pk,
        |    element_at(split(p_name, ' '), -1) AS block
        |  FROM part GROUP BY p_name)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
        |  a.pk AS pk_a, b.pk AS pk_b
        |FROM names a JOIN names b ON a.block = b.block AND a.pk < b.pk
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY pk_a, pk_b""".stripMargin).collect()
    assert(sqlFuzzy.toSeq ==
      RelationalPack.fuzzyJoin(spark, sf0001).collect().toSeq)
    // SCD2 via SQL windows
    val sqlScd = spark.sql(
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  unix_micros(ts) AS us FROM events),
        |g AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |    OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg,
        |  row_number() OVER w AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n_user
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, row_number() OVER w2 AS run_id,
        |  lead(us) OVER w2 AS valid_to_us,
        |  coalesce(lead(rn) OVER w2, n_user + 1) - rn AS n_events
        |  FROM g WHERE chg = 1
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
        |  us AS valid_from_us, valid_to_us, n_events
        |FROM s ORDER BY user_id, run_id""".stripMargin).collect()
    assert(sqlScd.toSeq ==
      graft.operators.EventAnalyticsPack.scd2(spark, sf0001).collect().toSeq)
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

  test("as-of join, SQL surface: the interval-table formulation == " +
      "TsStream.asOfBackwardStatic (the streaming-ready plan in pure SQL)") {
    import spark.implicits._
    // the same recast TsStream.asOfBackwardStatic performs internally —
    // LEAD() turns the dimension into validity intervals, the as-of becomes
    // a plain range join — expressed as user-facing ANSI SQL. Because the
    // interval build touches only the STATIC side, this exact query text
    // also runs with a streaming `events` source (the batch window is the
    // one feature streams cannot run, and it is not applied to the stream).
    val events = Seq(
      (1L, 7L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, 7L, Timestamp.valueOf("2024-01-01 09:59:59"), 2.0),
      (3L, 8L, Timestamp.valueOf("2024-01-01 12:00:00"), 3.0),
      (4L, 9L, Timestamp.valueOf("2024-01-01 12:00:00"), 4.0) // no dim rows
    ).toDF("eid", "ekey", "ets", "ev")
    val dim = Seq(
      (7L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.5),
      (7L, Timestamp.valueOf("2024-01-01 11:00:00"), 2.5),
      (8L, Timestamp.valueOf("2024-01-01 00:00:00"), 3.5)
    ).toDF("dkey", "dts", "dval")
    events.createOrReplaceTempView("asof_events")
    dim.createOrReplaceTempView("asof_dim")
    val viaSql = spark.sql(
      """WITH intervals AS (
        |  SELECT dkey, dval, dts AS vt,
        |         LEAD(dts) OVER (PARTITION BY dkey ORDER BY dts) AS vend
        |  FROM asof_dim WHERE dkey IS NOT NULL AND dts IS NOT NULL)
        |SELECT e.eid, i.dval
        |FROM asof_events e
        |LEFT JOIN intervals i
        |  ON e.ekey = i.dkey AND e.ets >= i.vt
        |     AND (i.vend IS NULL OR e.ets < i.vend)
        |ORDER BY e.eid""".stripMargin).collect().map(_.toSeq).toSeq
    val viaOp = TsStream.asOfBackwardStatic(events, dim,
        "ekey", "dkey", "ets", "dts")
      .select($"eid", $"dval").orderBy($"eid").collect().map(_.toSeq).toSeq
    assert(viaSql == viaOp, s"sql=$viaSql op=$viaOp")
    assert(viaSql.map(_(1)) == Seq(1.5, null, 3.5, null)) // closed bound + outer
  }
}
