package graft

import graft.ts.TsTable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** SQL UPDATE and MERGE INTO on graft-ts tables, routed by the injected
  * GraftDmlRule onto the facade's copy-on-write verbs — same commits,
  * archive discipline, and CHECK gating as the Scala API. */
class GraftTsDmlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("user_id", LongType),
    StructField("value", DoubleType)))

  private def mkRows(rows: Seq[(String, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (s, u, v) => (Timestamp.valueOf(s), u, v) }
      .toDF("ts", "user_id", "value")
  }

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("ts_dml_spec").toString

  test("SQL UPDATE: row expressions + condition, 'update' version commit, " +
      "pin keeps originals, ts assignment refused") {
    val dir = freshDir()
    val t = TsTable.create(spark, dir, schema)
    t.append(mkRows(Seq(
      ("2024-03-01 10:00:00", 1L, 1.0), ("2024-03-02 10:00:00", 2L, 2.0),
      ("2024-03-03 10:00:00", 3L, 3.0))))
    val pinned = t.currentVersion.get
    spark.sql(s"UPDATE graft_ts.`$dir` SET value = value * 10 WHERE user_id >= 2")
    val got = spark.sql(s"SELECT user_id, value FROM graft_ts.`$dir` ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.0), (2L, 20.0), (3L, 30.0)))
    val re = TsTable.open(spark, dir)
    assert(re.snapshotVersions.last._2 == "update")
    assert(re.openAt(pinned).toDF.where(col("user_id") === 2L)
      .head.getDouble(2) == 2.0)
    // the ts column is a row's placement identity — not assignable
    val e = intercept[Exception](spark.sql(
      s"UPDATE graft_ts.`$dir` SET ts = NULL WHERE user_id = 1"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t0 => Option(t0.getMessage).exists(_.contains("order identity"))))
  }

  test("SQL MERGE INTO: star upsert updates matches and backfill-inserts " +
      "the rest in one 'merge' commit") {
    val dir = freshDir()
    val t = TsTable.create(spark, dir, schema)
    t.append(mkRows(Seq(
      ("2024-03-01 10:00:00", 1L, 1.0), ("2024-03-02 10:00:00", 2L, 2.0))))
    mkRows(Seq(
      ("2024-03-02 10:00:00", 2L, 99.0),   // matched → update
      ("2024-02-28 09:00:00", 7L, 7.0)))   // unmatched, PAST day → backfill
      .createOrReplaceTempView("dml_src")
    spark.sql(
      s"""MERGE INTO graft_ts.`$dir` t USING dml_src s
         |ON t.ts = s.ts AND t.user_id = s.user_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql(
      s"SELECT user_id, value FROM graft_ts.`$dir` ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.0), (2L, 99.0), (7L, 7.0)))
    assert(TsTable.open(spark, dir).snapshotVersions.last._2 == "merge")
  }

  test("SQL MERGE INTO: explicit same-name columns, update-only and " +
      "insert-only shapes") {
    val dir = freshDir()
    val t = TsTable.create(spark, dir, schema)
    t.append(mkRows(Seq(("2024-03-01 10:00:00", 1L, 1.0))))
    mkRows(Seq(("2024-03-01 10:00:00", 1L, 50.0),
      ("2024-03-05 10:00:00", 5L, 5.0))).createOrReplaceTempView("dml_src2")
    // update-only: the unmatched source row is ignored
    spark.sql(
      s"""MERGE INTO graft_ts.`$dir` t USING dml_src2 s
         |ON t.ts = s.ts AND t.user_id = s.user_id
         |WHEN MATCHED THEN UPDATE SET value = s.value""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM graft_ts.`$dir`").head.getLong(0) == 1)
    assert(spark.sql(s"SELECT value FROM graft_ts.`$dir`").head.getDouble(0) == 50.0)
    // insert-only: the matched row stays untouched
    spark.sql(
      s"""MERGE INTO graft_ts.`$dir` t USING dml_src2 s
         |ON t.ts = s.ts AND t.user_id = s.user_id
         |WHEN NOT MATCHED THEN INSERT (ts, user_id, value)
         |  VALUES (s.ts, s.user_id, s.value)""".stripMargin)
    val got = spark.sql(
      s"SELECT user_id, value FROM graft_ts.`$dir` ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 50.0), (5L, 5.0)))
  }

  test("SQL MERGE refusals name the unsupported shape and the escape hatch") {
    val dir = freshDir()
    TsTable.create(spark, dir, schema)
      .append(mkRows(Seq(("2024-03-01 10:00:00", 1L, 1.0))))
    mkRows(Seq(("2024-03-01 10:00:00", 1L, 2.0)))
      .toDF("ets", "user_id", "value").createOrReplaceTempView("dml_src3")
    def msgOf(sql: String): String = {
      val e = intercept[Exception](spark.sql(sql))
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    }
    // differently-named ON columns
    assert(msgOf(
      s"""MERGE INTO graft_ts.`$dir` t USING dml_src3 s
         |ON t.ts = s.ets WHEN MATCHED THEN UPDATE SET value = s.value"""
        .stripMargin).contains("mergeInto"))
    // conditional matched action
    mkRows(Seq(("2024-03-01 10:00:00", 1L, 2.0)))
      .createOrReplaceTempView("dml_src4")
    assert(msgOf(
      s"""MERGE INTO graft_ts.`$dir` t USING dml_src4 s
         |ON t.ts = s.ts AND t.user_id = s.user_id
         |WHEN MATCHED AND s.value > 0 THEN UPDATE SET value = s.value"""
        .stripMargin).contains("unconditional"))
    // NOT MATCHED BY SOURCE
    assert(msgOf(
      s"""MERGE INTO graft_ts.`$dir` t USING dml_src4 s
         |ON t.ts = s.ts AND t.user_id = s.user_id
         |WHEN MATCHED THEN UPDATE SET value = s.value
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      .contains("NOT MATCHED BY SOURCE"))
  }
}
