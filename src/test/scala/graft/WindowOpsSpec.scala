package graft

import graft.operators.{StatsPack, TimeSeriesPack}
import org.apache.spark.sql.functions._

/** Semantic (pandas-parity) checks for the rolling-window analytics whose
  * oracles only prove cross-engine agreement, not that the formula is the
  * advertised one: EWMA vs the ewm(alpha=0.5, adjust=True).mean() recurrence
  * and rolling lag-1 autocorrelation vs a driver-side brute force. */
class WindowOpsSpec extends SparkSpec {

  /** events at sf0.001 grouped per user in (ts, event_id) order — the same
    * total order both operators window over. */
  private def series: Map[Long, Seq[(Long, Double)]] =
    Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.sortBy(r => (r._2, r._3)).map(r => (r._3, r._4)).toSeq
      }

  test("windowEwma equals the pandas ewm(alpha=0.5, adjust=True) truncated mean") {
    val got = TimeSeriesPack.windowEwma(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    var checked = 0
    for ((_, evs) <- series; ((eid, _), t) <- evs.zipWithIndex) {
      // pandas adjusted EWM: Σ_j (1-α)^j x_{t-j} / Σ_j (1-α)^j, truncated to
      // the 20 newest terms — with α=0.5 exactly Σ x_i·2^i / (2^n − 1)
      val frame = evs.slice(math.max(0, t - 19), t + 1).map(_._2)
      val n = frame.length
      val expected = frame.zipWithIndex
        .map { case (v, i) => v * math.pow(2, i) }.sum / (math.pow(2, n) - 1)
      val (gotN, gotE) = got(eid)
      assert(gotN == n, s"event $eid frame size $gotN vs $n")
      assert(math.abs(gotE - expected) < 1e-9 * math.max(1.0, math.abs(expected)),
        s"event $eid ewma $gotE vs $expected")
      checked += 1
    }
    assert(checked == got.size)
  }

  test("windowRollCorr equals brute-force rolling corr of (x_t, x_{t-1})") {
    val got = StatsPack.windowRollCorr(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toList
    val expected = (for ((_, evs) <- series.toSeq) yield {
      val pairs = evs.zip(evs.drop(1)).map { case ((_, prev), (eid, v)) => (eid, v, prev) }
      pairs.zipWithIndex.map { case ((eid, _, _), t) =>
        val fr = pairs.slice(math.max(0, t - 19), t + 1)
        val n = fr.length
        val (xs, ys) = (fr.map(_._2), fr.map(_._3))
        val (sx, sy) = (xs.sum, ys.sum)
        val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
        val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(b => b * b).sum)
        val (vx, vy) = (sxx - sx * sx / n, syy - sy * sy / n)
        val c = if (n > 1 && vx > 0 && vy > 0)
          Some((sxy - sx * sy / n) / (math.sqrt(vx) * math.sqrt(vy)))
        else None
        (eid, n.toLong, c)
      }
    }).flatten.sortBy(_._1).toList
    assert(got.map(r => (r._1, r._2)) == expected.map(r => (r._1, r._2)))
    got.zip(expected).foreach { case ((eid, _, g), (_, _, e)) =>
      (g, e) match {
        case (Some(gv), Some(ev)) =>
          // decimal-exact moments vs double brute force, then round(6)
          assert(math.abs(gv - ev) < 2e-6, s"event $eid corr $gv vs $ev")
        case (None, None) =>
        case other => fail(s"event $eid null mismatch: $other")
      }
    }
  }

  test("windowZscore equals brute-force rolling sample z-score") {
    val got = StatsPack.windowZscore(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3))).toList
    val expected = (for ((_, evs) <- series.toSeq) yield {
      evs.zipWithIndex.map { case ((eid, v), t) =>
        val fr = evs.slice(math.max(0, t - 19), t + 1).map(_._2)
        val n = fr.length
        val (sx, sxx) = (fr.sum, fr.map(a => a * a).sum)
        val vx = if (n > 1) Some((sxx - sx * sx / n) / (n - 1)) else None
        val z = vx.filter(_ > 0).map(s => (v - sx / n) / math.sqrt(s))
        (eid, n.toLong, z)
      }
    }).flatten.sortBy(_._1).toList
    assert(got.map(r => (r._1, r._2)) == expected.map(r => (r._1, r._2)))
    got.zip(expected).foreach { case ((eid, _, g, flag), (_, _, e)) =>
      (g, e) match {
        case (Some(gv), Some(ev)) =>
          assert(math.abs(gv - ev) < 2e-6, s"event $eid z $gv vs $ev")
          assert(flag == (math.abs(gv) > 3.0), s"event $eid flag vs z=$gv")
        case (None, None) => assert(!flag)
        case other => fail(s"event $eid null mismatch: $other")
      }
    }
    assert(got.exists(_._4), "fixture should contain at least one |z|>3 outlier")
  }

  test("ewma and rollcorr window plans reuse one user-keyed exchange") {
    for (df <- Seq(TimeSeriesPack.windowEwma(spark, sf0001),
      StatsPack.windowRollCorr(spark, sf0001))) {
      df.collect()
      // AQE's toString prints Final AND Initial plans — count in the final only
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      // the final orderBy adds a range-repartition; the windows themselves
      // must share a single hash exchange on user_id
      val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx in:\n$plan")
    }
  }

  test("LTTB downsample: ≤12 points per user, one per bucket, endpoints anchored, members of the series") {
    val got = graft.operators.TimeSeriesPack.downsampleLttb(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = got.groupBy(_._1)
    val src = series // (user -> ordered (event_id, value)); order is (ts, event_id)
    val full = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(byUser.keySet == full.keySet)
    byUser.foreach { case (u, pts) =>
      assert(pts.length <= 12)
      assert(pts.map(_._2).distinct.length == pts.length, s"user $u: duplicate buckets")
      val ordered = full(u).sortBy(t => (t._2, t._3))
      // endpoint anchors: the series' first and last points are selected
      val selectedIds = pts.map(_._3).toSet
      assert(selectedIds.contains(ordered.head._3), s"user $u: first point not anchored")
      assert(selectedIds.contains(ordered.last._3), s"user $u: last point not anchored")
      // every selected point is a real member of the series
      assert(selectedIds.subsetOf(ordered.map(_._3).toSet))
    }
  }

  test("LTTB bucket map survives billion-row ranks: the int rank widens before the multiply") {
    import spark.implicits._
    // rn is IntegerType exactly as row_number() produces it; at rn = 1e9
    // the unwidened int product (rn-1)*12 wraps negative. The operator's
    // OWN expression (TimeSeriesPack.lttbBucketExpr) must keep buckets in
    // [0, 12) and monotone in rank.
    val rows = Seq(
      (1, 1200000000L), (100000000, 1200000000L), (179000000, 1200000000L),
      (500000000, 1200000000L), (1000000000, 1200000000L),
      (1200000000, 1200000000L))
      .toDF("rn", "n")
    val got = rows
      .withColumn("b", graft.operators.TimeSeriesPack.lttbBucketExpr)
      .orderBy(col("rn"))
      .select("b").as[Long].collect()
    assert(got.forall(b => b >= 0 && b < 12), s"buckets out of range: ${got.toSeq}")
    assert(got.toSeq == got.toSeq.sorted, s"buckets not monotone in rank: ${got.toSeq}")
    assert(got.head == 0 && got.last == 11, s"endpoints not anchored: ${got.toSeq}")
  }
}
