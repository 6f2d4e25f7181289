package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BackwardAsOfExec

import java.sql.Timestamp

/** The partitioned-merge as-of operator (custom LogicalPlan + Strategy +
  * SparkPlan, SURVEY §4 deferred #1): semantics must equal the union+window
  * formulation row-for-row; the plan must be the custom exec with one
  * exchange per side and no Window node. */
class AsOfMergeSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private def events: DataFrame =
    Tables.events(spark, sf0001).select("event_id", "user_id", "ts")

  private def orders: DataFrame =
    Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy("event_id").collect()
      .map(r => (0 until r.length).map(i => r.get(i))).toSeq

  test("merged as-of equals the union+window formulation on the fixture") {
    val viaWindow = AsOfJoin.backward(events, orders,
      "user_id", "o_custkey", "ts", "o_orderdate")
    val viaMerge = AsOfJoin.backwardMerged(events, orders,
      "user_id", "o_custkey", "ts", "o_orderdate")
    assert(viaMerge.columns.toSeq == viaWindow.columns.toSeq)
    assert(canon(viaMerge) == canon(viaWindow))
  }

  test("merged as-of handles edges: boundary tie, no match, null left key/time") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(10L), Option(t("2024-01-01 10:00:00"))), // exact-tie match
      (2L, Option(10L), Option(t("2024-01-01 09:00:00"))), // before any right
      (3L, Option(99L), Option(t("2024-01-01 12:00:00"))), // key with no right rows
      (4L, None: Option[Long], Option(t("2024-01-01 12:00:00"))), // null key
      (5L, Option(10L), None: Option[Timestamp])) // null time
      .toDF("l_id", "k", "lt")
    val right = Seq(
      (100L, 10L, t("2024-01-01 10:00:00")),
      (101L, 10L, t("2024-01-01 11:30:00")))
      .toDF("r_id", "rk", "rt")
    val got = AsOfJoin.backwardMerged(left, right, "k", "rk", "lt", "rt")
      .orderBy("l_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)))).toSeq
    assert(got == Seq(
      (1L, Some(100L)), (2L, None), (3L, None), (4L, None), (5L, None)))
  }

  test("composite-key merged as-of equals the union+window composite form " +
      "(q_asof_join_by's key shape) and clusters on both key columns") {
    val ev = Tables.events(spark, sf0001)
    val prev = ev
      .groupBy(col("user_id").as("p_user"), col("event_type").as("p_type"),
        col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("p_event_id"))
    val lhs = ev.select("event_id", "user_id", "event_type", "ts")
    val viaWindow = AsOfJoin.backwardBy(lhs, prev,
      Seq("user_id", "event_type"), Seq("p_user", "p_type"), "ts", "p_ts")
    val viaMerge = AsOfJoin.backwardMergedBy(lhs, prev,
      Seq("user_id", "event_type"), Seq("p_user", "p_type"), "ts", "p_ts")
    assert(viaMerge.columns.toSeq == viaWindow.columns.toSeq)
    assert(canon(viaMerge) == canon(viaWindow))
    val planStr = viaMerge.queryExecution.executedPlan.toString
    assert(planStr.contains("hashpartitioning(user_id") &&
      planStr.contains("event_type"), planStr)
  }

  test("the plan is the custom exec: no Window, exchanges keyed per side") {
    val q = AsOfJoin.backwardMerged(events, orders,
      "user_id", "o_custkey", "ts", "o_orderdate")
    q.collect()
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => s +: unwrap(s.plan)
        case other => other +: other.children.flatMap(unwrap)
      }
    val nodes = unwrap(q.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BackwardAsOfExec]),
      s"custom exec not planned:\n${q.queryExecution.executedPlan}")
    assert(!nodes.exists(_.nodeName.contains("Window")),
      "union+window shape leaked into the merged plan")
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("hashpartitioning(user_id"), planStr)
    assert(planStr.contains("hashpartitioning(o_custkey"), planStr)
  }

  test("extension entry point injects the strategy into a fresh session") {
    val shared = spark // realize the shared session BEFORE clearing defaults
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    // now getOrCreate really constructs a new session (same SparkContext)
    // with ONLY the extension applied — no experimental-strategies fallback
    val session = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      assert(session ne shared, "getOrCreate returned the shared session")
      // a session with the extension plans BackwardAsOf WITHOUT the facade's
      // experimental-strategies fallback
      import org.apache.spark.sql.graft.{BackwardAsOf, PlanBridge}
      import session.implicits._
      val l = Seq((1L, 5L, t("2024-01-02 00:00:00"))).toDF("l_id", "k", "lt")
      val r = Seq((9L, 5L, t("2024-01-01 00:00:00"))).toDF("r_id", "rk", "rt")
      val lp = PlanBridge.analyzed(l)
      val rp = PlanBridge.analyzed(r)
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
        p.output.find(_.name == n).get
      val out = PlanBridge.ofRows(session, BackwardAsOf(lp, rp,
        Seq(attr(lp, "k")), Seq(attr(rp, "rk")), attr(lp, "lt"), attr(rp, "rt")))
      assert(out.collect().map(_.getLong(3)).toSeq == Seq(9L))
      // the extension also SQL-registers the native expressions
      assert(session.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
        .head.getDouble(0) == 11.0)
      assert(session.sql("SELECT graft_simhash64(array(xxhash64('a'), xxhash64('b')))")
        .head.getLong(0) ==
        session.sql("SELECT graft_simhash64(array(xxhash64('a'), xxhash64('b')))")
          .head.getLong(0))
      assert(session.sql("SELECT size(graft_winnow('abcdefghijklmnopqrstuvwxyz', 4, 4))")
        .head.getInt(0) > 0)
      // SQL name and Column face of the md5 simhash agree on a literal array
      assert(session.sql("SELECT graft_simhash_md5(array('a b c', 'b c d'))")
        .head.getLong(0) ==
        session.range(1).select(org.apache.spark.sql.graft.HashExprs.simhashMd5(
          org.apache.spark.sql.functions.array(
            org.apache.spark.sql.functions.lit("a b c"),
            org.apache.spark.sql.functions.lit("b c d"))))
          .head.getLong(0))
      val sig = session.sql(
        "SELECT graft_minhash(h, 8) FROM (SELECT xxhash64(x) AS h FROM (VALUES ('a'), ('b'), ('c')) t(x))")
        .head.getSeq[Long](0)
      assert(sig.length == 8)
      val topk = session.sql(
        """SELECT graft_topk(s, i, 2) FROM
          |(VALUES (1.0d, 1L), (3.0d, 2L), (2.0d, 3L)) t(s, i)""".stripMargin)
        .head.getSeq[Row](0)
      assert(topk.map(r => (r.getDouble(0), r.getLong(1))) == Seq((3.0, 2L), (2.0, 3L)))
      // the round-13 kernels carry SQL faces too
      val rowSig = session.sql(
        "SELECT graft_minhash_row(array('a', 'b', 'c'), 8)").head.getSeq[Long](0)
      assert(rowSig.length == 8)
      // decomposed e + U+0301 embedded directly (Spark's chr() is mod-256)
      assert(session.sql("SELECT graft_nfc('Café')")
        .head.getString(0) == "Café")
      assert(session.sql(
        """SELECT graft_cms_estimate(
          |  (SELECT count_min_sketch(x, 0.001d, 0.99d, 42)
          |   FROM (VALUES ('a'), ('a'), ('b')) t(x)), 'a')""".stripMargin)
        .head.getLong(0) == 2L)
      // generalized shingles: n=2 over 'a b c' = the two bigrams
      assert(session.sql("SELECT graft_shingles('a b c', 2)")
        .head.getSeq[String](0) == Seq("a b", "b c"))
      // literal-argument validation surfaces as an error, not silence
      intercept[Exception] {
        session.sql("SELECT graft_winnow('abc', length('ab'), 4)").collect()
      }
    } finally {
      // restore the suite-wide session; never stop the shared context
      org.apache.spark.sql.SparkSession.setDefaultSession(shared)
      org.apache.spark.sql.SparkSession.setActiveSession(shared)
    }
  }
}
