package graft

import graft.operators.StatsPack
import org.apache.spark.sql.functions._

/** Statistics pack: the scaladoc claims that are NOT covered by the DuckDB
  * hash oracle — builtin-kernel parity of the moment-derived stats, the
  * sketch-vs-exact percentile bound, split determinism/rates, histogram
  * conservation. */
class StatsPackSpec extends SparkSpec {

  test("moment-derived corr/covar/stddev match Spark's builtin kernels") {
    val derived = StatsPack.statsCorr(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    val builtin = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        stddev_samp(col("l_extendedprice")).as("sd"),
        corr(col("l_quantity"), col("l_extendedprice")).as("cr"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(derived.keySet == builtin.keySet)
    for ((flag, (cv, sd, cr)) <- builtin) {
      val (dcv, dsd, dcr) = derived(flag)
      // moment algebra vs one-pass co-moments: equal well past the 6dp the
      // oracle emits (abs for covar/stddev which are O(1e3..1e4))
      assert(math.abs(dcv - cv) / math.abs(cv) < 1e-9, s"$flag covar $dcv vs $cv")
      assert(math.abs(dsd - sd) / sd < 1e-9, s"$flag stddev $dsd vs $sd")
      assert(math.abs(dcr - cr) < 1e-6, s"$flag corr $dcr vs $cr")
    }
  }

  test("moment-derived OLS trend matches Spark's builtin regr_* kernels") {
    val derived = StatsPack.statsTrend(spark, sf001).collect()
      .filter(r => !r.isNullAt(2) && !r.isNullAt(4))
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val builtin = Tables.events(spark, sf001)
      .select(col("user_id"), col("value"),
        ((unix_micros(col("ts")) -
          min(unix_micros(col("ts"))).over(w)) / lit(3.6e9)).as("x"))
      .groupBy(col("user_id"))
      .agg(regr_slope(col("value"), col("x")).as("sl"),
        regr_intercept(col("value"), col("x")).as("ic"),
        regr_r2(col("value"), col("x")).as("r2"))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(derived.nonEmpty && derived.keySet.subsetOf(builtin.keySet))
    for ((u, (sl, ic, r2)) <- derived) {
      val (bsl, bic, br2) = builtin(u)
      assert(math.abs(sl - bsl) < 1e-6, s"user $u slope $sl vs $bsl")
      assert(math.abs(ic - bic) < 1e-5, s"user $u intercept $ic vs $bic")
      assert(math.abs(r2 - br2) < 1e-6, s"user $u r2 $r2 vs $br2")
    }
  }

  test("approx_percentile (t-digest) lands within 1% of the exact percentiles") {
    val exact = StatsPack.percentiles(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(5)))
      .toMap
    val approx = Tables.events(spark, sf001)
      .groupBy(col("event_type"))
      .agg(approx_percentile(col("value"), lit(0.25), lit(10000)).as("a25"),
        approx_percentile(col("value"), lit(0.5), lit(10000)).as("a50"),
        approx_percentile(col("value"), lit(0.9), lit(10000)).as("a90"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    for ((t, (p25, p50, p90)) <- exact) {
      val (a25, a50, a90) = approx(t)
      assert(math.abs(a25 - p25) / p25 < 0.01, s"$t p25 $a25 vs $p25")
      assert(math.abs(a50 - p50) / p50 < 0.01, s"$t p50 $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 < 0.01, s"$t p90 $a90 vs $p90")
    }
  }

  test("split assignment: deterministic, narrow plan, rates near 5/5/90") {
    val out = StatsPack.splitAssign(spark, sf001)
    // no shuffle before the determinism sort: the assignment itself is a map
    val noSort = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 4).as("h4"))
    assert(!noSort.queryExecution.executedPlan.toString.contains("Exchange"))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    // 500 docs, p=0.05 → sd ≈ 4.9; accept ±4 sd
    assert(math.abs(counts.getOrElse("test", 0L) - 0.05 * n) < 20, counts.toString)
    assert(math.abs(counts.getOrElse("val", 0L) - 0.05 * n) < 20, counts.toString)
    // re-running yields the identical assignment (no rng, no state)
    assert(out.collect().toSeq == StatsPack.splitAssign(spark, sf001).collect().toSeq)
  }

  test("histogram: buckets conserve rows and sum, edges tile the range") {
    val rows = StatsPack.histogram(spark, sf001).collect()
    val li = Tables.lineitem(spark, sf001)
    assert(rows.map(_.getLong(3)).sum == li.count())
    val total = li.agg(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double"))
      .head().getDouble(0)
    assert(math.abs(rows.map(_.getDouble(4)).sum - total) < 1e-4)
    for (r <- rows) assert(r.getDouble(2) - r.getDouble(1) == 5205.0)
    // every price actually falls inside its bucket (clamped edges aside)
    val mis = StatsPack.histogram(spark, sf001)
      .where(col("bucket").between(1, 18) &&
        (col("lo") > col("sum_price") / col("n") || col("hi") < col("sum_price") / col("n")))
      .count()
    assert(mis == 0, "a bucket's mean price fell outside its own edges")
  }

  test("pivot: per-type columns reconcile with the plain group-by counts") {
    val piv = StatsPack.pivot(spark, sf001)
    val byType = Tables.events(spark, sf001).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sums = piv.agg(
      sum("n_click"), sum("n_error"), sum("n_purchase"),
      sum("n_signup"), sum("n_view"), sum("n_total")).head()
    assert(sums.getLong(0) == byType("click"))
    assert(sums.getLong(1) == byType("error"))
    assert(sums.getLong(2) == byType("purchase"))
    assert(sums.getLong(3) == byType("signup"))
    assert(sums.getLong(4) == byType("view"))
    assert(sums.getLong(5) == byType.values.sum)
  }

  test("unpivot: melt is the exact inverse of pivot, zero-filled combos kept") {
    val days = StatsPack.pivot(spark, sf001).count()
    val long = StatsPack.unpivotLong(spark, sf001)
    // Dense grid: every (day, metric) present, absent combos as n=0 rows.
    assert(long.count() == days * 5, "melt must keep zero-filled combos")
    val total = Tables.events(spark, sf001).count()
    assert(long.agg(sum("n")).head().getLong(0) == total)
    // Round trip: re-pivoting the long form reproduces the wide counts.
    val rePiv = long.groupBy("day_us").pivot("metric").sum("n")
    val wide = StatsPack.pivot(spark, sf001).drop("n_total")
    assert(rePiv.orderBy("day_us").collect().toSeq ==
      wide.orderBy("day_us").collect().toSeq)
  }

  test("rfm: quintiles monotone in their metric, all five buckets populated, no window") {
    val out = graft.operators.RelationalPack.rfm(spark, sf001).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.length > 100)
    // monotone: ordering by the metric never decreases its quintile
    def monotone(metric: (Long, Long, Double, Long, Long, Long) => Double,
                 score: (Long, Long, Double, Long, Long, Long) => Long): Unit = {
      val sorted = out.sortBy(r => metric(r._1, r._2, r._3, r._4, r._5, r._6))
        .map(r => score(r._1, r._2, r._3, r._4, r._5, r._6))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
    monotone((r, _, _, _, _, _) => r.toDouble, (_, _, _, q, _, _) => q)
    monotone((_, f, _, _, _, _) => f.toDouble, (_, _, _, _, q, _) => q)
    monotone((_, _, m, _, _, _) => m, (_, _, _, _, _, q) => q)
    // monetary is continuous → near-balanced quintiles
    val mCounts = out.groupBy(_._6).view.mapValues(_.length)
    assert(mCounts.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(mCounts.values.max <= 2 * mCounts.values.min,
      s"monetary quintiles should be near-balanced: $mCounts")
  }

  test("cusum: window identity equals the textbook max(0, s+d) recurrence") {
    val out = StatsPack.windowCusum(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getBoolean(4)))
    // driver-side recurrence from the same rounded mean/std derivation
    val evs = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def microUnits(x: Double): Long =
      (BigDecimal(r6(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
        1000000).toLongExact
    val hI = 400L * 1000000
    val expected: Map[Long, (Double, Boolean)] =
      evs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        var s = 0L
        rows.sortBy(r => (r._3, r._1)).toSeq.map { r =>
          val dI = microUnits(r._4 - 75.0)
          s = math.max(0L, s + dI)
          r._1 -> ((s.toDouble / 1e6, s > hI))
        }
      }.toMap
    out.foreach { case (id, _, cusum, drift) =>
      val (expC, expD) = expected(id)
      assert(math.abs(cusum - expC) < 1e-9, s"event $id cusum $cusum vs $expC")
      assert(drift == expD, s"event $id drift flag")
    }
    assert(out.forall(_._3 >= 0.0), "cusum is non-negative by construction")
  }

  test("running total: last cum_rev equals the DECIMAL-exact grand total") {
    val rows = StatsPack.windowRunning(spark, sf001).collect()
    val grand = Tables.orders(spark, sf001)
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"))
      .head().getDouble(0)
    assert(rows.last.getDouble(3) == grand)
    // monotone non-decreasing (prices are positive)
    val cums = rows.map(_.getDouble(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
  }

  test("anomalyMad matches a driver-side median/MAD recomputation") {
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val byUser = Tables.events(spark, sf001)
      .select(col("user_id"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSeq }
    val out = StatsPack.anomalyMad(spark, sf001).collect()
    assert(out.length == byUser.size)
    out.foreach { r =>
      val vs = byUser(r.getLong(0))
      val m = med(vs)
      val d = med(vs.map(v => math.abs(v - m)))
      val k = 3.0 * 1.4826
      assert(r.getLong(1) == vs.length.toLong)
      assert(math.abs(r.getDouble(2) - m) < 5e-5, s"user ${r.getLong(0)} med")
      assert(math.abs(r.getDouble(3) - d) < 5e-5, s"user ${r.getLong(0)} mad")
      assert(r.getLong(4) == vs.count(v => math.abs(v - m) > k * d).toLong,
        s"user ${r.getLong(0)} n_outliers")
    }
    // the gate should fire somewhere but not everywhere
    val total = out.map(_.getLong(4)).sum
    assert(total > 0 && total < out.map(_.getLong(1)).sum)
  }

  test("rolling median matches a driver-side brute force over the trailing frame") {
    val got = StatsPack.windowMedian(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000, r.getLong(2), r.getDouble(3)))
    val expect = rows.groupBy(_._1).flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._2, e._3))
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 4), i + 1).map(_._4).sorted
        val k = frame.length
        val med = if (k % 2 == 1) frame(k / 2)
          else (frame(k / 2 - 1) + frame(k / 2)) / 2.0
        // Spark round() is HALF_UP — mirror it, not rint's HALF_EVEN
        ordered(i)._3 -> BigDecimal(med).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    assert(got.size == expect.size)
    expect.foreach { case (id, m) =>
      assert(math.abs(got(id) - m) < 1e-9, s"event $id: ${got(id)} vs $m")
    }
  }

  test("splitByCluster: near-dup clusters are split-atomic; singletons agree with splitAssign") {
    val docs = Tables.documents(spark, sf0001)
    val clusters = graft.operators.NearDedup.clusterPairs(
      graft.operators.NearDedup.minhashLsh(docs,
        idCol = "doc_id", textCol = "text", partCol = "lang", tau = 0.8,
        materialize = Some(true)))
    val assigned = StatsPack.splitByCluster(docs, "doc_id", clusters)
    assert(assigned.count() == docs.count())
    // atomicity: no cluster straddles two splits
    val straddlers = assigned.groupBy(col("canon_id"))
      .agg(countDistinct(col("split")).as("k"))
      .where(col("k") > 1).count()
    assert(straddlers == 0)
    // near-dup members really do share their canonical id's split
    val clustered = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clustered.nonEmpty, "fixture should contain near-dup clusters")
    val bySplit = assigned.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    clustered.foreach { case (doc, cl) =>
      assert(bySplit(doc)._1 == cl)
      assert(bySplit(doc)._2 == bySplit.getOrElse(cl, bySplit(doc))._2)
    }
    // singletons (no cluster label) carry exactly splitAssign's verdict
    val perDoc = StatsPack.splitAssign(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    bySplit.foreach { case (doc, (canon, split)) =>
      if (!clustered.contains(doc)) {
        assert(canon == doc)
        assert(split == perDoc(doc), s"singleton $doc diverged from splitAssign")
      }
    }
  }
}
