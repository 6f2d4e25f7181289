package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private val lSchema = StructType(Seq(
    StructField("l_id", LongType), StructField("k", LongType),
    StructField("t", TimestampType)))
  private val rSchema = StructType(Seq(
    StructField("rk", LongType), StructField("rt", TimestampType),
    StructField("rv", DoubleType)))

  test("backward as-of: latest at-or-before per key, nulls when none") {
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 10L, t("2024-01-01 10:00:00")),
      Row(2L, 10L, t("2024-01-01 12:00:00")),
      Row(3L, 20L, t("2024-01-01 09:00:00")), // before any right row for k=20
      Row(4L, 30L, t("2024-01-01 09:00:00")) // key with no right rows at all
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(10L, t("2024-01-01 09:30:00"), 1.0),
      Row(10L, t("2024-01-01 11:00:00"), 2.0),
      Row(10L, t("2024-01-01 12:00:00"), 3.0), // exact tie with l_id=2 → matches ("at-or-before")
      Row(20L, t("2024-01-01 10:00:00"), 4.0)
    )), rSchema)
    val got = AsOfJoin.backward(left, right, "k", "rk", "t", "rt")
      .orderBy("l_id").collect()
    assert(got.map(r => (r.getLong(0), Option(r.get(5)))).toSeq == Seq(
      (1L, Some(1.0)), (2L, Some(3.0)), (3L, None), (4L, None)))
    // matched right timestamps travel along
    assert(got(1).getTimestamp(4) == t("2024-01-01 12:00:00"))
  }

  test("backward as-of: tolerance nulls stale matches; allowExactMatches=false " +
      "makes the bound strict (pandas merge_asof parity)") {
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 10L, t("2024-01-01 10:00:00")), // 30 min stale → in tolerance
      Row(2L, 10L, t("2024-01-01 14:00:00")), // 2 h stale → out of tolerance
      Row(3L, 10L, t("2024-01-01 12:00:00")) // exact-instant right row exists
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(10L, t("2024-01-01 09:30:00"), 1.0),
      Row(10L, t("2024-01-01 12:00:00"), 2.0)
    )), rSchema)
    val tol = AsOfJoin.backward(left, right, "k", "rk", "t", "rt",
        toleranceUs = Some(3600L * 1000000)) // 1 hour
      .orderBy("l_id").collect()
      .map(r => (r.getLong(0), Option(r.get(5)))).toSeq
    // l_id=2's backward match (12:00) is 2 h stale → nulled; the exact-
    // instant match for l_id=3 is 0 stale → kept (inclusive bound)
    assert(tol == Seq((1L, Some(1.0)), (2L, None), (3L, Some(2.0))), tol.toString)
    val strict = AsOfJoin.backward(left, right, "k", "rk", "t", "rt",
        allowExactMatches = false)
      .orderBy("l_id").collect()
      .map(r => (r.getLong(0), Option(r.get(5)))).toSeq
    // strict bound: l_id=3 no longer sees the 12:00 right row, falls back
    // to the 09:30 one; at-or-before rows elsewhere are unaffected
    assert(strict == Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(1.0))),
      strict.toString)
  }

  test("forward as-of: earliest at-or-after per key, exact ties match, nulls when none") {
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 10L, t("2024-01-01 10:00:00")), // between right rows → next one
      Row(2L, 10L, t("2024-01-01 12:00:00")), // exact tie → matches ("at-or-after")
      Row(3L, 10L, t("2024-01-01 13:00:00")), // after last right row → null
      Row(4L, 30L, t("2024-01-01 09:00:00")) // key with no right rows at all
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(10L, t("2024-01-01 09:30:00"), 1.0),
      Row(10L, t("2024-01-01 11:00:00"), 2.0),
      Row(10L, t("2024-01-01 12:00:00"), 3.0)
    )), rSchema)
    val got = AsOfJoin.forward(left, right, "k", "rk", "t", "rt")
      .orderBy("l_id").collect()
    assert(got.map(r => (r.getLong(0), Option(r.get(5)))).toSeq == Seq(
      (1L, Some(2.0)), (2L, Some(3.0)), (3L, None), (4L, None)))
    assert(got(0).getTimestamp(4) == t("2024-01-01 11:00:00"))
  }

  test("forward/nearest parity knobs: tolerance nulls far matches, strict bound " +
      "skips exact-instant rows") {
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 10L, t("2024-01-01 10:00:00")), // next right 30 min ahead
      Row(2L, 10L, t("2024-01-01 07:00:00")), // next right 3.5 h ahead
      Row(3L, 10L, t("2024-01-01 12:00:00")) // exact-instant right exists
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(10L, t("2024-01-01 10:30:00"), 1.0),
      Row(10L, t("2024-01-01 12:00:00"), 2.0)
    )), rSchema)
    val fwdTol = AsOfJoin.forward(left, right, "k", "rk", "t", "rt",
        toleranceUs = Some(3600L * 1000000))
      .orderBy("l_id").collect().map(r => (r.getLong(0), Option(r.get(5)))).toSeq
    assert(fwdTol == Seq((1L, Some(1.0)), (2L, None), (3L, Some(2.0))), fwdTol.toString)
    val fwdStrict = AsOfJoin.forward(left, right, "k", "rk", "t", "rt",
        allowExactMatches = false)
      .orderBy("l_id").collect().map(r => (r.getLong(0), Option(r.get(5)))).toSeq
    // l_id=3 skips the same-instant 12:00 row; nothing lies beyond → null
    assert(fwdStrict == Seq((1L, Some(1.0)), (2L, Some(1.0)), (3L, None)),
      fwdStrict.toString)
    val nearTol = AsOfJoin.nearest(left, right, "k", "rk", "t", "rt",
        toleranceUs = Some(3600L * 1000000))
      .orderBy("l_id").collect().map(r => (r.getLong(0), Option(r.get(5)))).toSeq
    // l_id=2's nearest (10:30, 3.5 h away) is out of tolerance → null
    assert(nearTol == Seq((1L, Some(1.0)), (2L, None), (3L, Some(2.0))), nearTol.toString)
    val nearStrict = AsOfJoin.nearest(left, right, "k", "rk", "t", "rt",
        allowExactMatches = false)
      .orderBy("l_id").collect().map(r => (r.getLong(0), Option(r.get(5)))).toSeq
    // l_id=3 may not take the distance-0 row; nearest OTHER row is 10:30
    assert(nearStrict == Seq((1L, Some(1.0)), (2L, Some(1.0)), (3L, Some(1.0))),
      nearStrict.toString)
  }

  test("nearest as-of: closer side wins, exact tie resolves backward, one window exchange") {
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 10L, t("2024-01-01 10:00:00")), // 30 min back vs 60 min fwd → backward
      Row(2L, 10L, t("2024-01-01 10:50:00")), // 80 min back vs 10 min fwd → forward
      Row(3L, 10L, t("2024-01-01 10:15:00")), // 45 back vs 45 fwd, exact tie → backward
      Row(4L, 10L, t("2024-01-01 08:00:00")), // before all right rows → forward only
      Row(5L, 10L, t("2024-01-01 12:00:00")), // after all right rows → backward only
      Row(6L, 30L, t("2024-01-01 09:00:00")) // key with no right rows → null
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(10L, t("2024-01-01 09:30:00"), 1.0),
      Row(10L, t("2024-01-01 11:00:00"), 2.0)
    )), rSchema)
    val df = AsOfJoin.nearest(left, right, "k", "rk", "t", "rt")
    val got = df.orderBy("l_id").collect()
    assert(got.map(r => (r.getLong(0), Option(r.get(5)))).toSeq == Seq(
      (1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(1.0)),
      (4L, Some(1.0)), (5L, Some(2.0)), (6L, None)))
    // same-instant right row is a distance-0 backward match
    val sim = AsOfJoin.nearest(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(1L, 10L, t("2024-01-01 09:30:00")))), lSchema),
      right, "k", "rk", "t", "rt").collect()
    assert(sim.head.getDouble(5) == 1.0)
    // both direction frames ride the SAME sort: exactly one exchange
    val exchanges = "Exchange ".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    assert(exchanges == 1, df.queryExecution.executedPlan.toString)
  }

  test("nearest as-of: non-timestamp time columns (epoch-µs longs) analyze and tie-break correctly") {
    // Tie-break distances must come from the CAST right time carried with
    // the payload, not the raw right-time field — with LongType times the
    // raw field isn't a timestamp at all.
    def us(s: String) = t(s).getTime * 1000L
    val lSch = StructType(Seq(
      StructField("l_id", LongType), StructField("k", LongType),
      StructField("t", LongType)))
    val rSch = StructType(Seq(
      StructField("rk", LongType), StructField("rt", LongType),
      StructField("rv", DoubleType)))
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 10L, us("2024-01-01 10:00:00")), // 30 min back vs 60 fwd → backward
      Row(2L, 10L, us("2024-01-01 10:50:00")), // 80 back vs 10 fwd → forward
      Row(3L, 10L, us("2024-01-01 10:15:00")) // exact tie → backward
    )), lSch)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(10L, us("2024-01-01 09:30:00"), 1.0),
      Row(10L, us("2024-01-01 11:00:00"), 2.0)
    )), rSch)
    // long epochs cast to timestamp as SECONDS in Spark; divide first so
    // the cast lands on the intended instants
    import org.apache.spark.sql.functions.col
    val lTs = left.withColumn("t", (col("t") / 1000000L).cast("long"))
    val rTs = right.withColumn("rt", (col("rt") / 1000000L).cast("long"))
    val got = AsOfJoin.nearest(lTs, rTs, "k", "rk", "t", "rt")
      .orderBy("l_id").collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(5))).toSeq == Seq(
      (1L, 1.0), (2L, 2.0), (3L, 1.0)))
  }

  test("null keys never match (left stays unmatched, null right rows dropped)") {
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, null, t("2024-01-01 10:00:00")), // null key
      Row(2L, 10L, null), // null time
      Row(3L, 10L, t("2024-01-01 10:00:00"))
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(null, t("2024-01-01 09:00:00"), 9.0), // null-key right: never a match
      Row(10L, null, 8.0), // null-time right: never a match
      Row(10L, t("2024-01-01 09:30:00"), 1.0)
    )), rSchema)
    val got = AsOfJoin.backward(left, right, "k", "rk", "t", "rt")
      .orderBy("l_id").collect()
    assert(got.length == 3) // left-outer: every left row survives
    assert(got.map(r => (r.getLong(0), Option(r.get(5)))).toSeq == Seq(
      (1L, None), (2L, None), (3L, Some(1.0))))
    // the same invariant holds in the mirrored directions: a null-timed
    // left's forward frame spans the partition under nulls-first ordering,
    // and before the guard it "matched" the earliest right row
    val fwd = AsOfJoin.forward(left, right, "k", "rk", "t", "rt")
      .orderBy("l_id").collect()
    assert(fwd.map(r => (r.getLong(0), Option(r.get(5)))).toSeq == Seq(
      (1L, None), (2L, None), (3L, None))) // 09:30 is before 10:00 → no fwd match
    val near = AsOfJoin.nearest(left, right, "k", "rk", "t", "rt")
      .orderBy("l_id").collect()
    assert(near.map(r => (r.getLong(0), Option(r.get(5)))).toSeq == Seq(
      (1L, None), (2L, None), (3L, Some(1.0))))
  }

  test("composite-key as-of (merge_asof by=[k1, k2]): matches respect BOTH " +
      "key components; null components never match in either direction") {
    val lSchema2 = StructType(Seq(
      StructField("l_id", LongType), StructField("s", StringType),
      StructField("v", LongType), StructField("t", TimestampType)))
    val rSchema2 = StructType(Seq(
      StructField("rs", StringType), StructField("rk", LongType),
      StructField("rt", TimestampType), StructField("rv", DoubleType)))
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "A", 1L, t("2024-01-01 10:00:00")), // → A/1's 09:30, NOT A/2's 09:45
      Row(2L, "A", 2L, t("2024-01-01 10:00:00")), // → A/2's 09:45
      Row(3L, "B", 1L, t("2024-01-01 10:00:00")), // no B/1 rights → null
      Row(4L, null, 1L, t("2024-01-01 10:00:00")), // null first component
      Row(5L, "A", null, t("2024-01-01 10:00:00")), // null second component
      Row(6L, "B", 2L, t("2024-01-01 08:30:00")) // backward none, forward B/2's 09:00
    )), lSchema2)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("A", 1L, t("2024-01-01 09:30:00"), 1.0),
      Row("A", 2L, t("2024-01-01 09:45:00"), 2.0),
      Row(null, 1L, t("2024-01-01 09:00:00"), 9.0), // null-key right: dropped
      Row("B", null, t("2024-01-01 09:00:00"), 8.0), // null-key right: dropped
      Row("B", 2L, t("2024-01-01 09:00:00"), 7.0)
    )), rSchema2)
    def vals(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("l_id").collect()
      .map(r => (r.getLong(0), Option(r.get(7)))).toSeq
    assert(vals(AsOfJoin.backwardBy(left, right,
      Seq("s", "v"), Seq("rs", "rk"), "t", "rt")) == Seq(
      (1L, Some(1.0)), (2L, Some(2.0)), (3L, None),
      (4L, None), (5L, None), (6L, None)))
    assert(vals(AsOfJoin.forwardBy(left, right,
      Seq("s", "v"), Seq("rs", "rk"), "t", "rt")) == Seq(
      (1L, None), (2L, None), (3L, None),
      (4L, None), (5L, None), (6L, Some(7.0))))
    assert(vals(AsOfJoin.nearestBy(left, right,
      Seq("s", "v"), Seq("rs", "rk"), "t", "rt")) == Seq(
      (1L, Some(1.0)), (2L, Some(2.0)), (3L, None),
      (4L, None), (5L, None), (6L, Some(7.0))))
    // a 1-element key list is exactly the single-key API
    val rA = right.where(org.apache.spark.sql.functions.col("rs") === "A")
      .select("rk", "rt", "rv")
    val single = AsOfJoin.backward(left.select("l_id", "v", "t"), rA,
      "v", "rk", "t", "rt")
    val seqOfOne = AsOfJoin.backwardBy(left.select("l_id", "v", "t"), rA,
      Seq("v"), Seq("rk"), "t", "rt")
    assert(single.orderBy("l_id").collect().toSeq ==
      seqOfOne.orderBy("l_id").collect().toSeq)
    // mismatched key arity fails fast
    intercept[IllegalArgumentException] {
      AsOfJoin.backwardBy(left, right, Seq("s", "v"), Seq("rs"), "t", "rt")
    }
  }

  test("reserved internal column names are rejected") {
    import spark.implicits._
    val bad = Seq((1L, "x")).toDF("_k", "v")
    val ok = Seq((1L, t("2024-01-01 00:00:00"))).toDF("id", "rt")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(bad, ok, "_k", "id", "v", "rt")
    }
  }

  test("as-of result row count always equals left row count") {
    val left = Tables.events(spark, sf0001).select("event_id", "user_id", "ts")
    val right = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val joined = AsOfJoin.backward(left, right,
      "user_id", "o_custkey", "ts", "o_orderdate")
    assert(joined.count() == left.count())
  }

  test("salted as-of: identical results on a hot key, window keyed by (key, salt)") {
    import spark.implicits._
    // one pathologically hot key: 5000 of 5050 left rows on key 1
    val left = ((0 until 5000).map(i => (i.toLong, 1L, t("2024-01-01 00:00:00").toLocalDateTime.plusSeconds(i.toLong))) ++
      (0 until 50).map(i => (10000L + i, 2L + i % 7, t("2024-01-01 00:00:00").toLocalDateTime.plusSeconds(i.toLong))))
      .map { case (id, k, ldt) => (id, k, java.sql.Timestamp.valueOf(ldt)) }
      .toDF("l_id", "k", "lt")
    val right = (0 until 200).map(i =>
        (i.toLong, 1L + i % 9, java.sql.Timestamp.valueOf(
          t("2024-01-01 00:00:00").toLocalDateTime.plusSeconds(i.toLong * 20))))
      .toDF("r_id", "rk", "rt")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val plain = AsOfJoin.backward(left, right, "k", "rk", "lt", "rt")
    val salted = AsOfJoin.backward(left, right, "k", "rk", "lt", "rt", saltBuckets = 8)
    assert(key(salted) == key(plain)) // provable equivalence, checked anyway
    // the hot key's window really is split: the exchange hashes (_k, _salt)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan)
    assert("hashpartitioning\\(_k#\\d+L?, _salt".r.findFirstIn(plan).nonEmpty, plan)
    // and the per-bucket share of the hot key is bounded: no bucket holds
    // more than ~1/4 of its rows at 8 buckets (deterministic hash spread)
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val spread = salted.where(col("k") === 1)
      .withColumn("_b", pmod(xxhash64(col("lt").cast("timestamp")), lit(8L)))
      .groupBy("_b").count().collect().map(_.getLong(1))
    assert(spread.length == 8 && spread.max < 5000 / 4, spread.mkString(","))
  }
}
