package graft

import org.apache.spark.sql.functions._

/** B4 no-oracle item: approx_count_distinct (HLL++) error bound vs exact.
  * Nondeterministic across engines, so no DuckDB oracle — the contract here
  * is the published HLL++ relative-standard-deviation bound. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct stays within 3x rsd of exact on events") {
    val ev = Tables.events(spark, sf001)
    val rsd = 0.05
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact_users"),
      approx_count_distinct(col("user_id"), rsd).as("approx_users"),
      countDistinct(col("event_id")).as("exact_ids"),
      approx_count_distinct(col("event_id"), rsd).as("approx_ids")).head
    def relErr(exact: Long, approx: Long) = math.abs(approx - exact).toDouble / exact
    // 3 sigma: P(outside) < 0.3%, and the inputs/seed are fixed so this is
    // deterministic in practice
    assert(relErr(r.getLong(0), r.getLong(1)) <= 3 * rsd,
      s"user_id: exact=${r.getLong(0)} approx=${r.getLong(1)}")
    assert(relErr(r.getLong(2), r.getLong(3)) <= 3 * rsd,
      s"event_id: exact=${r.getLong(2)} approx=${r.getLong(3)}")
  }

  test("grouped approx distinct tracks exact per group") {
    val ev = Tables.events(spark, sf001)
    val rows = ev.groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.05).as("approx")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, a) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e).toDouble / e <= 0.15, s"${r.getString(0)}: $e vs $a")
    }
  }

  test("percentiles_approx: drop-in schema, GK rank-error bound vs exact twin") {
    val exact = graft.operators.StatsPack.percentiles(spark, sf001).collect()
    val approxDf = graft.operators.StatsPack.percentilesApprox(spark, sf001)
    val approx = approxDf.collect()
    // drop-in interchangeable: identical schema to the exact key
    assert(approxDf.schema ==
      graft.operators.StatsPack.percentiles(spark, sf001).schema)
    assert(approx.map(_.getString(0)).toSeq == exact.map(_.getString(0)).toSeq)
    // GK guarantees the returned value's RANK is within n/accuracy of the
    // target rank. Convert that to a value bound per group: the approx
    // value must lie within the exact [p25-eps, p90+eps] envelope and each
    // quantile within 1% relative of its exact counterpart (generous vs
    // the 0.01% rank bound, but robust to value-space stretching).
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getLong(1) == a.getLong(1), "group counts must match")
      (2 to 5).foreach { i =>
        val (ev, av) = (e.getDouble(i), a.getDouble(i))
        val tol = math.max(math.abs(ev) * 0.01, 1e-4)
        assert(math.abs(av - ev) <= tol,
          s"${e.getString(0)} col$i: exact=$ev approx=$av")
      }
    }
    // mergeable-sketch determinism: identical across independent executions
    val again = graft.operators.StatsPack.percentilesApprox(spark, sf001).collect()
    assert(approx.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("quality deciles approx: assignment agrees with the exact key except " +
      "at boundary rank error; both partitions are complete") {
    val exact = graft.operators.LlmPack.qualityDeciles(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val approx = graft.operators.LlmPack.qualityDecilesApprox(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(approx.keySet == exact.keySet)
    // GK rank error <= n/accuracy: only docs within that rank band of a
    // boundary can flip, and never by more than one decile
    val diffs = exact.map { case (id, d) => math.abs(approx(id) - d) }
    assert(diffs.forall(_ <= 1), "approx boundaries may shift a doc at most one decile")
    val flipped = diffs.count(_ == 1)
    assert(flipped <= math.max(1, exact.size / 100),
      s"$flipped/${exact.size} docs flipped deciles — beyond boundary rank error")
    // deterministic across executions
    val again = graft.operators.LlmPack.qualityDecilesApprox(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == approx)
  }

  test("count-min heavy hitters: never undercounts, overcount <= eps*N, deterministic") {
    val out = graft.operators.LlmPack.tokenCms(spark, sf001).collect()
    assert(out.length == 20)
    val totalTokens = Tables.documents(spark, sf001)
      .select(explode(split(trim(col("text")), "\\s+")).as("t")).count()
    val epsN = (0.0001 * totalTokens).ceil.toLong
    out.foreach { r =>
      val (t, exact, est, over) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"$t undercounted: $est < $exact")
      assert(over == est - exact)
      // ε·N bound at 99% confidence per cell — the fixed-seed fixture is
      // deterministic, so a pass here is stable, not probabilistic
      assert(over <= epsN.max(1L), s"$t overcounted past eps*N: $over > $epsN")
    }
    // top-1 token estimate identical across two independent executions
    val again = graft.operators.LlmPack.tokenCms(spark, sf001).collect()
    assert(out.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      again.map(r => (r.getString(0), r.getLong(2))).toSeq)
  }
}
