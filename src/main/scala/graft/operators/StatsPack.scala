package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical / reshaping surface (SURVEY.md §2 B4–B5 widening): the
  * descriptive-statistics, percentile, binning, pivot and running-total
  * workflows the reference's users run in pandas (`df.corr()`,
  * `df.quantile()`, `pd.cut` + `value_counts`, `pivot_table`, `cumsum`)
  * after `read_range` — re-expressed as single-pass declarative Spark
  * aggregations.
  *
  * Cross-engine determinism strategy (QueryPack rules):
  *   - every order-sensitive double sum accumulates in exact DECIMAL
  *     (Det.scala) — moments included: corr/covar/stddev are derived from
  *     DECIMAL-exact power sums with the IDENTICAL double formula on both
  *     sides, instead of each engine's own one-pass co-moment kernel whose
  *     ulp-level results differ by summation order;
  *   - percentiles use Spark's exact `percentile` (sort + linear
  *     interpolation at rank (n−1)·p), the same definition as DuckDB/ANSI
  *     `percentile_cont`, and are rounded to 4dp;
  *   - histogram bin edges are computed with the same literal floor
  *     arithmetic on both sides (DuckDB 1.0 has no `width_bucket`).
  */
object StatsPack extends QueryPack {

  /** B4+ descriptive statistics per group: corr / covar_samp / stddev_samp
    * of (l_quantity, l_extendedprice) by returnflag, derived from
    * DECIMAL-exact power sums (Σx, Σy, Σxy, Σx², Σy²) in ONE pass with full
    * map-side combine — the textbook "moments, then algebra" layout that is
    * also how the builtin one-pass kernels behave at scale (fixed-size
    * state, no second pass). decimal(28,4) is lossless for 2dp×2dp products
    * and holds ~1e24, far past the 100 TB row count × 1.1e10 max term.
    * StatsPackSpec asserts the derived values match Spark's builtin
    * corr/covar_samp/stddev_samp to 1e-9. */
  def statsCorr(s: SparkSession, dir: String): DataFrame = {
    def d28(c: Column) = sum(c.cast("decimal(28,4)")).cast("double")
    val (x, y) = (col("l_quantity"), col("l_extendedprice"))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), d28(x).as("sx"), d28(y).as("sy"),
        d28(x * y).as("sxy"), d28(x * x).as("sxx"), d28(y * y).as("syy"))
      .withColumn("nd", col("n").cast("double"))
      .select(col("l_returnflag"), col("n"),
        round(col("sx") / col("nd"), 6).as("mean_qty"),
        round(col("sy") / col("nd"), 6).as("mean_price"),
        round((col("sxy") - col("sx") * col("sy") / col("nd")) /
          (col("nd") - 1.0), 6).as("covar_qp"),
        round(sqrt((col("syy") - col("sy") * col("sy") / col("nd")) /
          (col("nd") - 1.0)), 6).as("stddev_price"),
        round((col("sxy") - col("sx") * col("sy") / col("nd")) /
          (sqrt(col("sxx") - col("sx") * col("sx") / col("nd")) *
            sqrt(col("syy") - col("sy") * col("sy") / col("nd"))), 6)
          .as("corr_qp"))
      .orderBy(col("l_returnflag"))
  }

  /** B4+ per-series autocorrelation function (pandas `s.autocorr(lag)`
    * for lag 1..3): each user's event-value series, ordered by
    * (ts, event_id), correlates with its own lag-shifted self — the
    * persistence/stationarity diagnostic read before fitting any AR
    * model, and the whole-series complement of [[windowRollCorr]]'s
    * rolling local signal. ONE window pass computes all three shifted
    * companions off a single user_id exchange; the pairs unpivot
    * (`stack` — three rows per event, no join) and aggregate per
    * (user, lag) under the statsCorr determinism layout: DECIMAL-exact
    * power sums, identical double algebra on both engines, 6dp round,
    * NULL on degenerate series (n ≤ 1 or zero variance in either
    * operand). Estimator note: this is the PAIRWISE Pearson correlation
    * (pandas `Series.autocorr` semantics) — each lag's mean/variance
    * come from its own overlap window — not the Box-Jenkins ACF that
    * normalizes every lag by the full-series variance. */
  /** B4+ lead-lag CROSS-correlation — the "does this series follow the
    * market" question ACF cannot answer: each user's HOURLY mean series
    * is correlated against the GLOBAL hourly mean at lags 0/1/2 hours
    * (xcorr at lag k pairs the user's hour t with the global hour t−k; a
    * high lag-1 value means the user tracks yesterday's... last hour's
    * aggregate — the market-beta / leader-follower shape). Pairs exist
    * only where both series have the hour (inner join on the grid —
    * pairwise semantics, the statsAcf estimator). The per-hour series is
    * the hourly SUM, not the mean: the sum is DECIMAL-exact, and its
    * double image is bit-identical on both engines (unscaled 1e-4-unit
    * values stay far below 2^53, so int→double is exact and the /10⁴ is
    * one correctly-rounded division) — a mean's double division would
    * reintroduce the cross-engine ulp drift the decimal layer exists to
    * kill, and the covariance numerator amplifies it. Power sums then
    * quantize at DECIMAL(28,4) (order-independent), identical double
    * algebra, 6dp round, NULL on degenerate windows — the statsAcf
    * layout. Shape: two per-hour aggregates (map-side combined), the
    * ≤ #hours global series BROADCAST to the user grid, one (user, lag)
    * aggregate — the corpus never shuffles on a data-dependent key. */
  def statsXcorr(s: SparkSession, dir: String): DataFrame = {
    def d28s(c: Column) = sum(c.cast("decimal(28,4)")).cast("double")
    val ev = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
        col("value"))
    val u = ev.groupBy(col("user_id"), col("h"))
      .agg(d28s(col("value")).as("x"))
    val g0 = ev.groupBy(col("h"))
      .agg(d28s(col("value")).as("gx"))
    val gk = (0 to 2).map(k => g0.select(
        (col("h") + expr(s"INTERVAL $k HOURS")).as("h"),
        lit(k).as("lag_k"), col("gx")))
      .reduce(_.unionByName(_))
    u.join(broadcast(gk), Seq("h"))
      .groupBy(col("user_id"), col("lag_k"))
      .agg(count(lit(1)).as("n"),
        d28s(col("x")).as("sx"), d28s(col("gx")).as("sy"),
        d28s(col("x") * col("gx")).as("sxy"),
        d28s(col("x") * col("x")).as("sxx"),
        d28s(col("gx") * col("gx")).as("syy"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("vx", col("sxx") - col("sx") * col("sx") / col("nd"))
      .withColumn("vy", col("syy") - col("sy") * col("sy") / col("nd"))
      .select(col("user_id"), col("lag_k"), col("n"),
        when(col("n") > 1 && col("vx") > 0 && col("vy") > 0,
          round((col("sxy") - col("sx") * col("sy") / col("nd")) /
            (sqrt(col("vx")) * sqrt(col("vy"))), 6)).as("xcorr"))
      .orderBy(col("user_id"), col("lag_k"))
  }

  def statsAcf(s: SparkSession, dir: String): DataFrame = {
    def d28(c: Column) = sum(c.cast("decimal(28,4)")).cast("double")
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("value"),
        lag(col("value"), 1).over(wOrd).as("y1"),
        lag(col("value"), 2).over(wOrd).as("y2"),
        lag(col("value"), 3).over(wOrd).as("y3"))
      .selectExpr("user_id", "value AS x",
        "stack(3, 1, y1, 2, y2, 3, y3) AS (lag_k, y)")
      .where(col("y").isNotNull)
      .groupBy(col("user_id"), col("lag_k"))
      .agg(count(lit(1)).as("n"),
        d28(col("x")).as("sx"), d28(col("y")).as("sy"),
        d28(col("x") * col("y")).as("sxy"),
        d28(col("x") * col("x")).as("sxx"),
        d28(col("y") * col("y")).as("syy"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("vx", col("sxx") - col("sx") * col("sx") / col("nd"))
      .withColumn("vy", col("syy") - col("sy") * col("sy") / col("nd"))
      .select(col("user_id"), col("lag_k"), col("n"),
        when(col("n") > 1 && col("vx") > 0 && col("vy") > 0,
          round((col("sxy") - col("sx") * col("sy") / col("nd")) /
            (sqrt(col("vx")) * sqrt(col("vy"))), 6)).as("acf"))
      .orderBy(col("user_id"), col("lag_k"))
  }

  /** B4+ per-series OLS trend (pandas `np.polyfit(x, y, 1)` / SQL
    * `regr_slope`/`regr_intercept`/`regr_r2` per group): each user's
    * value series regressed on elapsed HOURS since the user's own first
    * event — the drift estimator read next to [[statsAcf]]'s persistence
    * diagnostic. The per-user time origin keeps x small (≤ ~100 h) so
    * the DECIMAL-exact power-sum layout holds with the same 28,4
    * quantization as every stats key; anchoring at each user's min also
    * makes the intercept meaningful (value level at the series start).
    * ONE user_id exchange: the window min(ts) and the groupBy reuse the
    * same hash partitioning (PlanAuditSpec asserts a single exchange).
    * Degenerate series (n ≤ 1 or zero x-variance) emit NULL slope and
    * intercept; r2 additionally NULLs on zero y-variance — exact
    * arithmetic guards, not engine Inf/NaN conventions. */
  def statsTrend(s: SparkSession, dir: String): DataFrame = {
    def d28(c: Column) = sum(c.cast("decimal(28,4)")).cast("double")
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("value"),
        ((unix_micros(col("ts")) -
          min(unix_micros(col("ts"))).over(w)) / lit(3.6e9)).as("x"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        d28(col("x")).as("sx"), d28(col("value")).as("sy"),
        d28(col("x") * col("value")).as("sxy"),
        d28(col("x") * col("x")).as("sxx"),
        d28(col("value") * col("value")).as("syy"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("vx", col("sxx") - col("sx") * col("sx") / col("nd"))
      .withColumn("vy", col("syy") - col("sy") * col("sy") / col("nd"))
      .withColumn("cxy", col("sxy") - col("sx") * col("sy") / col("nd"))
      .withColumn("slope0", col("cxy") / col("vx"))
      .select(col("user_id"), col("n"),
        when(col("n") > 1 && col("vx") > 0,
          round(col("slope0"), 6)).as("slope_per_hour"),
        when(col("n") > 1 && col("vx") > 0,
          round(col("sy") / col("nd") - col("slope0") * (col("sx") / col("nd")),
            6)).as("intercept"),
        when(col("n") > 1 && col("vx") > 0 && col("vy") > 0,
          round(col("cxy") * col("cxy") / (col("vx") * col("vy")), 6)).as("r2"))
      .orderBy(col("user_id"))
  }

  /** B4+ seasonal (hour-of-day) profile per event type — the detrending
    * table a forecaster or anomaly detector builds before modeling:
    * per (event_type, hour 0-23), the row count, the hour's mean value,
    * and the seasonal index (hour mean ÷ the type's overall mean; 1.0 =
    * flat). The raw stream collapses map-side to ≤ |types| × 24 rows
    * before anything wide happens; the per-type totals come from a
    * window over the TINY aggregate (never a second scan), summing in
    * DECIMAL so the window's fold order cannot perturb the double. */
  def statsSeasonal(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,4)")).as("sv"))
    val w = Window.partitionBy(col("event_type"))
    hourly
      .withColumn("tot_n", sum(col("n")).over(w))
      .withColumn("tot_s", sum(col("sv")).over(w))
      .select(col("event_type"), col("hr"), col("n"),
        round(col("sv").cast("double") / col("n").cast("double"), 6)
          .as("mean_value"),
        round((col("sv").cast("double") / col("n").cast("double")) /
          (col("tot_s").cast("double") / col("tot_n").cast("double")), 6)
          .as("seasonal_index"))
      .orderBy(col("event_type"), col("hr"))
  }

  private val RollK = 20 // rolling-corr frame length (rows)

  /** B5+ rolling lag-1 autocorrelation (pandas
    * `s.rolling(20).corr(s.shift(1))`) of event values per user — the
    * standard local-persistence signal on a tick stream. Two window passes
    * over ONE (ts, event_id) partition order (no extra shuffle): pass 1
    * pairs each value with its predecessor via lag(); pass 2 computes the
    * five DECIMAL-exact power sums of (xₜ, xₜ₋₁) over a 20-pair trailing
    * frame. Same determinism layout as `statsCorr`: order-insensitive
    * decimal window sums (Spark's running frame and DuckDB's segment tree
    * agree bit-for-bit), identical double algebra, round 6dp. Degenerate
    * frames (n = 1 or zero variance) emit NULL under an exact-arithmetic
    * guard rather than relying on both engines' Inf/NaN conventions.
    * (Events, not lineitem: lineitem's (orderkey, linenumber, suppkey) is
    * non-unique in this fixture, so no lineitem sort is tie-free — and a
    * tied ORDER BY breaks both frame determinism and the driver's
    * row-order hash.) */
  def windowRollCorr(s: SparkSession, dir: String): DataFrame = {
    def d28(c: Column) = sum(c.cast("decimal(28,4)"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(RollK - 1), 0)
    val (x, y) = (col("value"), col("prev"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        lag(col("value"), 1).over(wOrd).as("prev"))
      .where(col("prev").isNotNull)
      .select(col("event_id"),
        count(lit(1)).over(w).as("n"),
        d28(x).over(w).cast("double").as("sx"),
        d28(y).over(w).cast("double").as("sy"),
        d28(x * y).over(w).cast("double").as("sxy"),
        d28(x * x).over(w).cast("double").as("sxx"),
        d28(y * y).over(w).cast("double").as("syy"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("vx", col("sxx") - col("sx") * col("sx") / col("nd"))
      .withColumn("vy", col("syy") - col("sy") * col("sy") / col("nd"))
      .select(col("event_id"), col("n"),
        when(col("n") > 1 && col("vx") > 0 && col("vy") > 0,
          round((col("sxy") - col("sx") * col("sy") / col("nd")) /
            (sqrt(col("vx")) * sqrt(col("vy"))), 6)).as("roll_corr"))
      .orderBy(col("event_id"))
  }

  /** B5+ rolling z-score anomaly detection (pandas
    * `(s - s.rolling(20).mean()) / s.rolling(20).std()`): each event scored
    * against its own user's 20-row trailing window — the standard
    * monitoring/outlier gate on a metric stream. The current row is part of
    * its own frame (pandas semantics); z uses the SAMPLE std. Determinism
    * layout as windowRollCorr: DECIMAL-exact windowed power sums, identical
    * double algebra, round 6dp, NULL guard on degenerate frames (n = 1 or
    * zero variance). One window exchange; the anomaly flag is derived from
    * the ROUNDED z on both sides so boundary values can't diverge. */
  def windowZscore(s: SparkSession, dir: String): DataFrame = {
    def d28(c: Column) = sum(c.cast("decimal(28,4)"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(RollK - 1), 0)
    val x = col("value")
    Tables.events(s, dir)
      .select(col("event_id"), col("value"),
        count(lit(1)).over(w).as("n"),
        d28(x).over(w).cast("double").as("sx"),
        d28(x * x).over(w).cast("double").as("sxx"))
      .withColumn("nd", col("n").cast("double"))
      // vx guarded by n > 1 INSIDE the when (CaseWhen evaluates lazily):
      // ANSI mode rejects the n = 1 division by (nd − 1) = 0 outright
      .withColumn("vx", when(col("n") > 1,
        (col("sxx") - col("sx") * col("sx") / col("nd")) / (col("nd") - 1.0)))
      .select(col("event_id"), col("n"),
        when(col("n") > 1 && col("vx") > 0,
          round((col("value") - col("sx") / col("nd")) / sqrt(col("vx")), 6))
          .as("z"))
      .withColumn("is_outlier", col("z").isNotNull && abs(col("z")) > 3.0)
      .orderBy(col("event_id"))
  }

  // Page-CUSUM design parameters: target level μ0 and per-step slack k are
  // DESIGN constants in the classic scheme (chosen from the in-control
  // process, ~mean 50 / σ 49 across all fixture SFs), not estimated from
  // the monitored stream itself — estimated-moment detectors are
  // q_window_zscore / q_anomaly_mad's turf. h is the alarm threshold.
  private val CusumMu0 = 50.0
  private val CusumK = 25.0
  private val CusumH = 400.0

  /** B5+ CUSUM change-point detection (Page '54) per user — the drift
    * detector that catches a sustained small SHIFT in a metric's level,
    * which the pointwise z-score gate (q_window_zscore) structurally
    * misses. The textbook form is a non-linear recurrence
    * (s_t = max(0, s_{t−1} + d_t), d = x − μ0 − k) no SQL window expresses
    * directly; the drawup identity  s_t = S_t − min(0, min_{j≤t} S_j)
    * (S = running sum of d) turns it into TWO running windows over ONE
    * user_id exchange. Determinism: each deviation is quantized ONCE to
    * BIGINT micro-units via round(·, 6) + a decimal cast (the value data
    * carries ≲2 decimals, so the true deviation sits ON the 6dp grid with
    * ~0.5 µ of slack — no half-boundary for the engines' rounding
    * implementations to disagree over), and the running sum/min then live
    * entirely in exact 64-bit integers — immune to float summation-order
    * divergence (DuckDB evaluates windowed sums through doubles / segment
    * trees; integers make the bracketing irrelevant). */
  def windowCusum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hI = math.round(CusumH * 1e6)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("d_i",
        (round(col("value") - lit(CusumMu0 + CusumK), 6).cast("decimal(18,6)") *
          lit(1000000L)).cast("long"))
      .withColumn("ssum", sum(col("d_i")).over(run))
      // the min ranges over prefixes INCLUDING the empty one (S_0 = 0) —
      // without the zero floor, s_1 would collapse to S_1 − S_1 = 0
      .withColumn("cusum_i",
        col("ssum") - least(min(col("ssum")).over(run), lit(0L)))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        (col("cusum_i").cast("double") / lit(1e6)).as("cusum"),
        (col("cusum_i") > lit(hI)).as("is_drift"))
      .orderBy(col("event_id"))
  }

  /** B4+ exact percentiles per group (pandas `groupby().quantile()`):
    * Spark's `percentile` sorts each group's values and linearly
    * interpolates at rank (n−1)·p — identical to ANSI `percentile_cont`.
    * Exact percentiles shuffle the full value multiset per group (that is
    * their definition); the bounded-memory 100 TB variant is
    * `approx_percentile` — registered as the `q_percentiles_approx` scale
    * twin below, rank-error-bounded against this exact key in ApproxSpec. */
  def percentiles(s: SparkSession, dir: String): DataFrame = {
    val v = col("value")
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(percentile(v, lit(0.25)), 4).as("p25"),
        round(percentile(v, lit(0.5)), 4).as("p50"),
        round(percentile(v, lit(0.75)), 4).as("p75"),
        round(percentile(v, lit(0.9)), 4).as("p90"))
      .orderBy(col("event_type"))
  }

  /** Accuracy knob for `percentile_approx`: guarantees rank error
    * ≤ n/accuracy per group, with sketch state O(accuracy · log n) —
    * BOUNDED regardless of group size. 10000 ⇒ ≤0.01% rank error. */
  private[graft] val ApproxPctAccuracy = 10000

  /** B4+ APPROXIMATE percentiles per group — the 100 TB twin of
    * `percentiles` and the scale path for the engine's whole exact
    * order-statistics family (q_percentiles, q_anomaly_mad, q_rfm,
    * q_quality_deciles, q_event_gaps): Spark's `percentile_approx`
    * (Greenwald–Khanna quantile summary) keeps a MERGEABLE fixed-size
    * sketch per group — full map-side combine, no per-group value
    * buffering — where the exact form must hold each group's complete
    * value multiset in one aggregation buffer. Same output schema as the
    * exact key on purpose, so the two are drop-in interchangeable.
    *
    * No DuckDB oracle by design: sketch internals differ across engines
    * (DuckDB approx_quantile is t-digest), so cross-engine hash equality
    * is not defined for approximate quantiles. The correctness contract is
    * the GK rank-error bound, asserted against the exact `percentiles` key
    * in ApproxSpec (the q_approx_distinct discipline). */
  def percentilesApprox(s: SparkSession, dir: String): DataFrame = {
    val v = col("value")
    val acc = lit(ApproxPctAccuracy)
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(percentile_approx(v, lit(0.25), acc), 4).as("p25"),
        round(percentile_approx(v, lit(0.5), acc), 4).as("p50"),
        round(percentile_approx(v, lit(0.75), acc), 4).as("p75"),
        round(percentile_approx(v, lit(0.9), acc), 4).as("p90"))
      .orderBy(col("event_type"))
  }

  private[graft] val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** B4+ pivot (pandas `pivot_table`): events reshaped to one row per day ×
    * one count column per event type. `pivot` with an EXPLICIT value list —
    * at 100 TB the implicit form first runs a distinct scan to discover
    * values and caps at 10k columns; pinning the list keeps this a single
    * hash aggregation (grouping key = day, pivot key folded into the
    * aggregate buffer), no extra pass. */
  def pivot(s: SparkSession, dir: String): DataFrame = {
    val day = unix_micros(date_trunc("day", col("ts"))).as("day_us")
    val counts = EventTypes.map(t => coalesce(col(s"`$t`"), lit(0L)).as(s"n_$t"))
    Tables.events(s, dir)
      .select(day, col("event_type"))
      .groupBy(col("day_us"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .select(col("day_us") +: counts: _*)
      .withColumn("n_total", EventTypes.map(t => col(s"n_$t")).reduce(_ + _))
      .orderBy(col("day_us"))
  }

  /** B4+ unpivot/melt (pandas `melt` — the inverse of q_pivot): the wide
    * day × per-type count matrix reshaped back to long
    * (day, metric, n) rows. Spark's native `unpivot` plans an Expand over
    * the already-aggregated wide result — a NARROW per-row fan-out of
    * |EventTypes| rows, no shuffle beyond the ones q_pivot already paid —
    * so at 100 TB melt costs nothing over the aggregate that feeds it.
    * Zero-filled combos survive the round trip (coalesce(…, 0) upstream),
    * which is exactly what distinguishes pivot∘unpivot from a plain
    * (day, type) group-by: absent combinations are PRESENT with n=0. The
    * oracle replays the same wide CTE and melts it with UNION ALL (one
    * branch per metric — dialect-free). */
  def unpivotLong(s: SparkSession, dir: String): DataFrame = {
    val day = unix_micros(date_trunc("day", col("ts"))).as("day_us")
    val counts = EventTypes.map(t => coalesce(col(s"`$t`"), lit(0L)).as(s"n_$t"))
    // the wide matrix WITHOUT q_pivot's presentation sort — melting and
    // re-sorting a sorted frame would pay a pointless range exchange
    Tables.events(s, dir)
      .select(day, col("event_type"))
      .groupBy(col("day_us"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .select(col("day_us") +: counts: _*)
      .unpivot(Array(col("day_us")), EventTypes.map(t => col(s"n_$t")).toArray,
        "metric", "n")
      .orderBy(col("day_us"), col("metric"))
  }

  private val HistLo = 900.0
  private val HistW = 5205.0 // (105000 − 900) / 20 buckets
  private val HistBuckets = 20

  /** B4+ fixed-width histogram (pandas `pd.cut` + `value_counts`): bucket =
    * clamp(floor((x − lo)/w)). The same literal floor arithmetic runs on
    * both engines (DuckDB 1.0 lacks `width_bucket`; Spark's is the same
    * math) so edge values land identically. A pure narrow map + 20-group
    * aggregate — the number of output rows is bounded by the bucket count,
    * not the data. */
  def histogram(s: SparkSession, dir: String): DataFrame = {
    val b = least(greatest(floor((col("l_extendedprice") - HistLo) / HistW), lit(0.0)),
      lit((HistBuckets - 1).toDouble)).cast("long")
    Tables.lineitem(s, dir)
      .select(b.as("bucket"), col("l_extendedprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("sum_price"))
      .withColumn("lo", col("bucket").cast("double") * HistW + HistLo)
      .withColumn("hi", col("lo") + HistW)
      .select(col("bucket"), col("lo"), col("hi"), col("n"), col("sum_price"))
      .orderBy(col("bucket"))
  }

  /** B5+ running total (pandas `resample('D').sum().cumsum()`): daily order
    * revenue and its cumulative sum, both DECIMAL-exact so the running sum
    * is order-insensitive and bit-identical cross-engine. The cumulative
    * window is a single partition BY CONSTRUCTION of the date domain (≤ a
    * few thousand day rows after the first aggregate), so the "global
    * window" here is bounded by the calendar, not the 100 TB row count. */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("day_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .groupBy(unix_micros(date_trunc("day", col("o_orderdate"))).as("day_us"))
      .agg(Det.dsumDec(col("o_totalprice")).as("rev_dec"), count(lit(1)).as("n_orders"))
      .withColumn("cum_rev", sum(col("rev_dec")).over(w).cast("double"))
      .select(col("day_us"), col("rev_dec").cast("double").as("day_rev"),
        col("n_orders"), col("cum_rev"))
      .orderBy(col("day_us"))
  }

  /** B9+ lag/rolling feature generation — the per-entity feature-
    * engineering step of a time-series ML pipeline: for each user's event
    * stream in time order, the previous two values and a trailing 3-event
    * mean (frame [-3,-1]: strictly PAST values only — no label leakage, the
    * property that matters in feature pipelines). One user_id exchange for
    * all four features (shared window sort). The rolling mean sums ≤ 3
    * doubles in frame order on both engines, identical IEEE order; rounded
    * to 6 decimals anyway for the oracle hash. Ties on ts break by
    * event_id, a total order shared with the oracle. */
  def featureLags(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("lag1", lag(col("value"), 1).over(w))
      .withColumn("lag2", lag(col("value"), 2).over(w))
      .withColumn("roll3",
        round(avg(col("value")).over(w.rowsBetween(-3, -1)), 6))
      .select(col("event_id"), col("user_id"), col("lag1"), col("lag2"),
        col("roll3"))
      .orderBy(col("event_id"))
  }

  private val TestMax = "0ccd" // 3277/65536 ≈ 5% of the md5 space
  private val ValMax = "1999"  // 6553/65536 ≈ next 5%

  /** B9+ deterministic train/val/test split assignment: split by the first
    * 16 bits of md5(doc_id) against fixed hex thresholds (lexicographic
    * compare on lowercase hex = numeric compare). Pure narrow map — no
    * shuffle, no state, reproducible on any engine that has md5 (unlike
    * xxhash64, which is why PipelinePack.hashSample is spec-only while this
    * key carries a full oracle); adding docs never reassigns existing ones. */
  def splitAssign(s: SparkSession, dir: String): DataFrame = {
    val h4 = substring(md5(col("doc_id").cast("string")), 1, 4)
    Tables.documents(s, dir)
      .select(col("doc_id"), h4.as("h4"))
      .withColumn("split",
        when(col("h4") < TestMax, "test")
          .when(col("h4") < ValMax, "val")
          .otherwise("train"))
      .orderBy(col("doc_id"))
  }

  /** B9+ LEAKAGE-SAFE train/val/test split: [[splitAssign]] hashes each
    * doc independently, which lets two copies of the same text land in
    * train AND test — the classic eval-contamination leak a dedup pass
    * upstream only partially closes (any copy that survives curation
    * thresholds differently re-opens it). This variant assigns the whole
    * exact-duplicate cluster atomically: docs group by the canonical
    * normalized-content hash (q_dedup_exact's key), the cluster's
    * canonical id (min doc_id) goes through the SAME md5 hex-window gate,
    * and every member inherits the verdict — so a duplicated document can
    * never straddle splits, and adding copies never reassigns existing
    * ones (the canonical id is stable under insertion of higher ids).
    * ONE shuffle on the content hash (the q_dedup_exact exchange; the
    * min-over-cluster window needs no second exchange); near-dup-cluster
    * atomicity composes by swapping the grouping key for NearDedup's
    * cluster label — same shape, exercised at spec level. */
  def splitLeakageSafe(s: SparkSession, dir: String): DataFrame = {
    val wCk = Window.partitionBy(col("ck"))
    val h4 = substring(md5(col("canon_id").cast("string")), 1, 4)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        sha2(graft.functions.TextFns.normalize(col("text")), 256).as("ck"))
      .withColumn("canon_id", min(col("doc_id")).over(wCk))
      .select(col("doc_id"), col("canon_id"),
        when(h4 < TestMax, "test")
          .when(h4 < ValMax, "val")
          .otherwise("train").as("split"))
      .orderBy(col("doc_id"))
  }

  /** The generalized leakage-safe gate [[splitLeakageSafe]]'s scaladoc
    * promises: assign `split` by an ARBITRARY cluster labeling —
    * (doc_id, cluster_id) rows from any dedup family (exact hash,
    * minhash connected components via `NearDedup.clusterPairs`,
    * embedding clusters); unlabeled docs are their own cluster. A left
    * join on id (the label side is the small one — clustered docs only —
    * so AQE broadcasts it and the corpus never shuffles), then the same
    * md5 hex-window verdict on the cluster's canonical id. Asserted
    * cluster-atomic and singleton-compatible with [[splitAssign]] in
    * StatsPackSpec. */
  def splitByCluster(docs: DataFrame, idCol: String,
                     clusters: DataFrame): DataFrame = {
    val cl = clusters.select(col("doc_id").as(idCol), col("cluster_id"))
    val h4 = substring(md5(col("canon_id").cast("string")), 1, 4)
    docs.select(col(idCol))
      .join(cl, Seq(idCol), "left")
      .withColumn("canon_id", coalesce(col("cluster_id"), col(idCol)))
      .select(col(idCol), col("canon_id"),
        when(h4 < TestMax, "test")
          .when(h4 < ValMax, "val")
          .otherwise("train").as("split"))
  }

  /** B5+ rolling exact median (trailing 5 rows per user): the robust-center
    * sibling of q_window_moving_avg — the de-noising smoother pandas users
    * write as `rolling(5).median()`. Spark has no exact-percentile WINDOW
    * function, so the frame is materialized with collect_list over a
    * 5-row frame (O(K) state per row — bounded, unlike a whole-partition
    * collect), sorted, and reduced to the middle element (odd n) or the
    * mean of the two middle elements (even n — the warm-up rows), which is
    * precisely DuckDB's `median()` (quantile_cont 0.5) on doubles. One
    * exchange on user_id; (a+b)/2 is the same IEEE op on both engines, so
    * 6dp rounding is cosmetic. */
  def windowMedian(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-4, 0)
    Tables.events(s, dir)
      .withColumn("sv", array_sort(collect_list(col("value")).over(w)))
      .withColumn("k", size(col("sv")))
      .select(col("event_id"),
        round(when(col("k") % 2 === 1,
          element_at(col("sv"), ((col("k") + 1) / 2).cast("int")))
          .otherwise((element_at(col("sv"), (col("k") / 2).cast("int")) +
            element_at(col("sv"), (col("k") / 2 + 1).cast("int"))) / 2.0), 6)
          .as("med5"))
      .orderBy(col("event_id"))
  }

  /** MAD→σ scale under normality (1/Φ⁻¹(3/4)); 3·1.4826·MAD is the robust
    * 3σ gate. Same double literal product on both engines. */
  private val MadK = 3.0 * 1.4826

  /** B5+ trailing-window Hampel filter — the per-POINT robust outlier
    * gate completing the family (q_window_median gives the trailing
    * median, q_anomaly_mad the per-user lifetime gate; this is the
    * rolling form both of those approximate, and the registered batch
    * twin of the streaming `TsStream.hampelPerKey`): per event, the
    * trailing-5 median, the window MAD, and |x − med| > 3·1.4826·MAD.
    * One (ts, event_id)-ordered window per user (ONE exchange); med and
    * mad interpolate the same sorted-frame arrays (the windowMedian
    * machinery — the deviations array derives from the SAME collected
    * frame, no second window). Median interpolation is identical IEEE
    * arithmetic on both engines (the q_window_median parity), so the
    * UNROUNDED gate comparison is deterministic; 6dp rounding on emitted
    * med/mad is cosmetic. */
  def windowHampel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-4, 0)
    def interp(sv: Column, k: Column): Column =
      when(k % 2 === 1, element_at(sv, ((k + 1) / 2).cast("int")))
        .otherwise((element_at(sv, (k / 2).cast("int")) +
          element_at(sv, (k / 2 + 1).cast("int"))) / 2.0)
    Tables.events(s, dir)
      .withColumn("sv", array_sort(collect_list(col("value")).over(w)))
      .withColumn("k", size(col("sv")))
      .withColumn("med0", interp(col("sv"), col("k")))
      .withColumn("dv", array_sort(transform(col("sv"),
        x => abs(x - col("med0")))))
      .withColumn("mad0", interp(col("dv"), col("k")))
      .select(col("event_id"), col("user_id"),
        round(col("med0"), 6).as("med"), round(col("mad0"), 6).as("mad"),
        (abs(col("value") - col("med0")) > lit(MadK) * col("mad0"))
          .as("is_outlier"))
      .orderBy(col("event_id"))
  }

  /** Default ceiling on the per-entity summary row count `anomalyMad` will
    * broadcast under: ~4M (user_id, double) rows ≈ 64 MB serialized —
    * comfortable executor-side, far from driver OOM. Override per session
    * with spark.graft.stats.maxBroadcastGroups. */
  private val MaxBroadcastGroups = 4L << 20

  private def maxBroadcastGroups(s: SparkSession): Long =
    graft.Confs.long(s, "spark.graft.stats.maxBroadcastGroups", MaxBroadcastGroups)

  /** Count-gated per-entity re-entry join (the `NearDedup.pruneByLosers`
    * dispatch): broadcast the entity-keyed summary when its exact row count
    * is at or under the ceiling, plain shuffled join above — no hint means
    * no driver collect, and the fact side's user_id exchange is reused by
    * every downstream join/aggregate on the same key. */
  private def joinGated(nGroups: Long, limit: Long)(
      fact: DataFrame, dim: DataFrame): DataFrame =
    if (nGroups <= limit) fact.join(broadcast(dim), "user_id")
    else fact.join(dim, "user_id")

  /** B4+ per-user robust anomaly report — the median/MAD (Hampel) outlier
    * gate, the data-cleaning filter that survives the very outliers a
    * mean/stddev z-score is skewed by: per user, the exact median, the
    * median absolute deviation, and how many events fall outside
    * med ± 3·1.4826·MAD. Exact per-group order statistics buffer each
    * group's values (the inherent cost of exact percentiles; the mergeable
    * scale path is approx_percentile's t-digest — same trade as
    * q_percentiles; `percentilesApprox` is the registered scale twin).
    *
    * The med/MAD summaries have one row PER USER — entity-proportional,
    * exactly the cardinality class a forced `broadcast()` hint must never
    * meet unguarded (a hint overrides every planner size check and at
    * 100 TB is a driver OOM, not a graceful degrade). So the re-entry
    * joins are COUNT-GATED, the `NearDedup.pruneByLosers` dispatch:
    * the median summary is materialized once (it feeds the gate, the MAD
    * pass and the final pass — one percentile aggregation instead of
    * three), its exact row count is compared against
    * `spark.graft.stats.maxBroadcastGroups`, and
    *   - at or under the ceiling → explicit broadcast: the events table is
    *     never shuffled for the joins (the common case — user counts are
    *     orders of magnitude below event counts);
    *   - above it → plain shuffled joins: events exchange ONCE on user_id
    *     and that partitioning is reused by every join and groupBy
    *     downstream (co-partitioned, no further exchange).
    * PlanAuditSpec asserts BOTH planned shapes. NOTE the materialization
    * makes this operator EAGER at DataFrame-construction time (the
    * `Compute.materialize` contract — reliable checkpoint when the session
    * has a checkpoint dir, executor-local otherwise).
    *
    * Median/MAD are order statistics (interpolation of the two middle
    * values — Spark `percentile` ≡ DuckDB `median` on doubles, the
    * q_percentiles parity), and the outlier gate compares identical IEEE
    * doubles on both engines, so the count is deterministic; 4dp rounding
    * on the emitted med/mad is cosmetic. */
  def anomalyMad(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("value"))
    val med = Compute.materialize(ev.groupBy(col("user_id"))
      .agg(percentile(col("value"), lit(0.5)).as("med")))
    // the gate's count job scans only the materialized users-keyed summary,
    // never the events table
    val gate = joinGated(med.count(), maxBroadcastGroups(s)) _
    val mad = gate(ev, med)
      .groupBy(col("user_id"))
      .agg(percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"))
    gate(gate(ev, med), mad)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(col("med")).as("med0"), max(col("mad")).as("mad0"),
        sum(when(abs(col("value") - col("med")) > lit(MadK) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("user_id"), col("n_events"),
        round(col("med0"), 4).as("med"), round(col("mad0"), 4).as("mad"),
        col("n_outliers"))
      .orderBy(col("user_id"))
  }

  private val ProfileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** B4+ numeric data-profiling report — the pipeline-observability pass a
    * data engineer runs before trusting a new drop (pandas `describe()` /
    * DuckDB `SUMMARIZE`): per column, non-null count, null count, exact
    * distinct count, min/max, and the DECIMAL-exact mean.
    *
    * Shape: MELT-then-aggregate. `stack` turns each input row into one
    * (col_name, v) row per profiled column (a Generate, pipelined in the
    * scan stage — no extra pass), and a single `groupBy(col_name)` computes
    * all six statistics per column. With exactly ONE distinct aggregate
    * (`countDistinct(v)`) the planner emits the cheap two-level
    * distinct plan — partial aggregate keyed (col_name, v) with map-side
    * dedup, one exchange, final per-column merge. The previous wide form
    * (24 aggregates over 4 columns in one `agg`) forced the
    * multi-countDistinct rewrite: a 5-way Expand replica of the scan, a
    * hash aggregate keyed on all four DOUBLE columns at once (each key
    * NaN-normalized per row), then a 28-function `first(...) FILTER(gid)`
    * merge — measured 3.8 s vs 2.1 s for this form on identical input
    * (sf0.1, r21), with byte-identical results. Means accumulate in
    * decimal per the Det discipline, per column exactly as before.
    * At 100 TB this is still the shape you want: one scan, full map-side
    * combine, aggregate state bounded by columns × distinct values — and
    * the melt's row multiplication never materializes (Generate pipelines
    * into the partial aggregate inside one codegen stage). One contract
    * nuance, irrelevant to every fixture: on a ZERO-ROW input the wide
    * form emitted 4 all-zero rows where this emits none (no groups).
    *
    * The rebalance: the melt + dedup pass is CPU-bound, so spread a
    * compact single-row-group scan over the cores first (no-op at real
    * scale, where the fact table plans >= cores partitions). */
  def profileNumeric(s: SparkSession, dir: String): DataFrame = {
    val fields = ProfileCols.map(c => s"'$c', $c").mkString(", ")
    Compute.rebalance(
      Tables.lineitem(s, dir).select(ProfileCols.map(col): _*))
      .select(expr(s"stack(${ProfileCols.length}, $fields) AS (col_name, v)"))
      .groupBy(col("col_name"))
      .agg(count(col("v")).as("n"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("vmin"),
        max(col("v")).as("vmax"),
        round(sum(col("v").cast("decimal(28,4)")).cast("double") /
          count(col("v")), 6).as("mean"))
      .orderBy(col("col_name"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_anomaly_mad" -> anomalyMad,
    "q_profile_numeric" -> profileNumeric,
    "q_window_median" -> windowMedian,
    "q_window_hampel" -> windowHampel,
    "q_stats_corr" -> statsCorr,
    "q_stats_acf" -> statsAcf,
    "q_stats_xcorr" -> statsXcorr,
    "q_stats_trend" -> statsTrend,
    "q_stats_seasonal" -> statsSeasonal,
    "q_window_rollcorr" -> windowRollCorr,
    "q_window_zscore" -> windowZscore,
    "q_window_cusum" -> windowCusum,
    "q_percentiles" -> percentiles,
    "q_percentiles_approx" -> percentilesApprox,
    "q_pivot" -> pivot,
    "q_unpivot" -> unpivotLong,
    "q_histogram" -> histogram,
    "q_window_running" -> windowRunning,
    "q_feature_lags" -> featureLags,
    "q_split_assign" -> splitAssign,
    "q_split_leakage_safe" -> splitLeakageSafe)

  def oracles: Map[String, String] = Map(
    "q_anomaly_mad" ->
      s"""WITH med AS (SELECT user_id, median(value) AS med FROM events GROUP BY user_id),
         |mad AS (SELECT e.user_id, median(abs(e.value - m.med)) AS mad
         |        FROM events e JOIN med m USING (user_id) GROUP BY e.user_id)
         |SELECT e.user_id, count(*) AS n_events,
         |  round(max(m.med), 4) AS med, round(max(d.mad), 4) AS mad,
         |  CAST(sum(CASE WHEN abs(e.value - m.med) > $MadK * d.mad
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM events e JOIN med m USING (user_id) JOIN mad d ON e.user_id = d.user_id
         |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,
    "q_profile_numeric" -> ProfileCols.map(c =>
      s"""SELECT '$c' AS col_name, count($c) AS n,
         |CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |count(DISTINCT $c) AS n_distinct, min($c) AS vmin, max($c) AS vmax,
         |round(CAST(sum(CAST($c AS DECIMAL(28,4))) AS DOUBLE) / count($c), 6) AS mean
         |FROM lineitem""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "q_window_median" ->
      """WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, value FROM events)
        |SELECT event_id, round(median(value) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
        |FROM e ORDER BY event_id""".stripMargin,
    // The mad needs a per-row median of |frame value − this row's med| —
    // row-specific, so it re-enters as a rank-range self-join over the
    // same trailing frame rather than a second window.
    "q_window_hampel" ->
      s"""WITH e AS (SELECT event_id, user_id,
         |    date_trunc('microseconds', ts) AS ts, value,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |  FROM events),
         |m AS (SELECT e.*, median(value) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med
         |  FROM e),
         |d AS (SELECT a.event_id, a.user_id, a.value, a.med,
         |    median(abs(b.value - a.med)) AS mad
         |  FROM m a JOIN m b
         |    ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 4 AND a.rn
         |  GROUP BY a.event_id, a.user_id, a.value, a.med)
         |SELECT event_id, user_id, round(med, 6) AS med, round(mad, 6) AS mad,
         |  abs(value - med) > $MadK * mad AS is_outlier
         |FROM d ORDER BY event_id""".stripMargin,
    "q_stats_corr" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (SELECT *, CAST(n AS DOUBLE) AS nd FROM m)
        |SELECT l_returnflag, n,
        |round(sx / nd, 6) AS mean_qty,
        |round(sy / nd, 6) AS mean_price,
        |round((sxy - sx * sy / nd) / (nd - 1.0), 6) AS covar_qp,
        |round(sqrt((syy - sy * sy / nd) / (nd - 1.0)), 6) AS stddev_price,
        |round((sxy - sx * sy / nd) /
        |  (sqrt(sxx - sx * sx / nd) * sqrt(syy - sy * sy / nd)), 6) AS corr_qp
        |FROM d ORDER BY l_returnflag""".stripMargin,
    // Lead-lag xcorr vs the global hourly series: decimal-exact hourly
    // SUMS (bit-identical doubles), the statsAcf moment/rounding layout.
    "q_stats_xcorr" ->
      """WITH e AS (SELECT user_id,
        |    date_trunc('hour', date_trunc('microseconds', ts)) AS h, value
        |  FROM events),
        |u AS (SELECT user_id, h,
        |    CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS x
        |  FROM e GROUP BY user_id, h),
        |g AS (SELECT h,
        |    CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS gx
        |  FROM e GROUP BY h),
        |gk AS (
        |  SELECT h AS h0, 0 AS lag_k, gx FROM g
        |  UNION ALL SELECT h + INTERVAL 1 HOUR, 1, gx FROM g
        |  UNION ALL SELECT h + INTERVAL 2 HOUR, 2, gx FROM g),
        |j AS (SELECT u.user_id, gk.lag_k, u.x, gk.gx
        |  FROM u JOIN gk ON u.h = gk.h0),
        |m AS (SELECT user_id, lag_k, count(*) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(28,4))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(gx AS DECIMAL(28,4))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(x * gx AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(gx * gx AS DECIMAL(28,4))) AS DOUBLE) AS syy
        |  FROM j GROUP BY user_id, lag_k),
        |d AS (SELECT *, CAST(n AS DOUBLE) AS nd,
        |  sxx - sx * sx / CAST(n AS DOUBLE) AS vx,
        |  syy - sy * sy / CAST(n AS DOUBLE) AS vy FROM m)
        |SELECT user_id, lag_k, CAST(n AS BIGINT) AS n,
        |CASE WHEN n > 1 AND vx > 0 AND vy > 0
        |     THEN round((sxy - sx * sy / nd) / (sqrt(vx) * sqrt(vy)), 6) END AS xcorr
        |FROM d ORDER BY user_id, lag_k""".stripMargin,
    // Pairwise Pearson ACF: each lag's pairs re-derive their own moments
    // (the pandas Series.autocorr estimator) — decimal-exact power sums,
    // shared double algebra, NULL on degenerate series.
    "q_stats_acf" ->
      """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts,
        |    event_id, value FROM events),
        |p AS (SELECT user_id, value,
        |  lag(value, 1) OVER w AS y1,
        |  lag(value, 2) OVER w AS y2,
        |  lag(value, 3) OVER w AS y3
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |u AS (
        |  SELECT user_id, 1 AS lag_k, value AS x, y1 AS y FROM p WHERE y1 IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, 2, value, y2 FROM p WHERE y2 IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, 3, value, y3 FROM p WHERE y3 IS NOT NULL),
        |m AS (SELECT user_id, lag_k, count(*) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(28,4))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(28,4))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy
        |  FROM u GROUP BY user_id, lag_k),
        |d AS (SELECT *, CAST(n AS DOUBLE) AS nd,
        |  sxx - sx * sx / CAST(n AS DOUBLE) AS vx,
        |  syy - sy * sy / CAST(n AS DOUBLE) AS vy FROM m)
        |SELECT user_id, lag_k, CAST(n AS BIGINT) AS n,
        |CASE WHEN n > 1 AND vx > 0 AND vy > 0
        |     THEN round((sxy - sx * sy / nd) / (sqrt(vx) * sqrt(vy)), 6) END AS acf
        |FROM d ORDER BY user_id, lag_k""".stripMargin,
    // Same determinism layout as q_stats_acf: the x axis is exact integer
    // µs differenced against the user's own min (one window), divided by
    // the same double literal on both engines; power sums quantize at
    // DECIMAL(28,4); identical double algebra end-to-end.
    "q_stats_trend" ->
      """WITH e AS (SELECT user_id, value,
        |  (epoch_us(date_trunc('microseconds', ts)) -
        |   min(epoch_us(date_trunc('microseconds', ts)))
        |     OVER (PARTITION BY user_id)) / 3600000000.0 AS x
        |  FROM events),
        |m AS (SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(28,4))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(x * value AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS syy
        |  FROM e GROUP BY user_id),
        |d AS (SELECT *, CAST(n AS DOUBLE) AS nd,
        |  sxx - sx * sx / CAST(n AS DOUBLE) AS vx,
        |  syy - sy * sy / CAST(n AS DOUBLE) AS vy,
        |  sxy - sx * sy / CAST(n AS DOUBLE) AS cxy FROM m)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n > 1 AND vx > 0
        |    THEN round(cxy / vx, 6) END AS slope_per_hour,
        |  CASE WHEN n > 1 AND vx > 0
        |    THEN round(sy / nd - (cxy / vx) * (sx / nd), 6) END AS intercept,
        |  CASE WHEN n > 1 AND vx > 0 AND vy > 0
        |    THEN round(cxy * cxy / (vx * vy), 6) END AS r2
        |FROM d ORDER BY user_id""".stripMargin,
    // Hour means and per-type totals both come off exact DECIMAL sums
    // (the window total sums the DECIMAL, so fold order cannot perturb
    // the double); the index is one double division chain on both sides.
    "q_stats_seasonal" ->
      """WITH h AS (SELECT event_type, CAST(hour(ts) AS INT) AS hr,
        |    count(*) AS n, sum(CAST(value AS DECIMAL(28,4))) AS sv
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT *, sum(n) OVER (PARTITION BY event_type) AS tot_n,
        |  sum(sv) OVER (PARTITION BY event_type) AS tot_s FROM h)
        |SELECT event_type, hr, CAST(n AS BIGINT) AS n,
        |  round(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_value,
        |  round((CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) /
        |    (CAST(tot_s AS DOUBLE) / CAST(tot_n AS DOUBLE)), 6)
        |    AS seasonal_index
        |FROM t ORDER BY event_type, hr""".stripMargin,
    "q_window_rollcorr" ->
      s"""WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, value
         |  FROM events),
         |p AS (SELECT event_id, user_id, ts, value,
         |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         |  FROM e),
         |m AS (SELECT event_id,
         |  count(*) OVER w AS n,
         |  CAST(sum(CAST(value AS DECIMAL(28,4))) OVER w AS DOUBLE) AS sx,
         |  CAST(sum(CAST(prev AS DECIMAL(28,4))) OVER w AS DOUBLE) AS sy,
         |  CAST(sum(CAST(value * prev AS DECIMAL(28,4))) OVER w AS DOUBLE) AS sxy,
         |  CAST(sum(CAST(value * value AS DECIMAL(28,4))) OVER w AS DOUBLE) AS sxx,
         |  CAST(sum(CAST(prev * prev AS DECIMAL(28,4))) OVER w AS DOUBLE) AS syy
         |  FROM p WHERE prev IS NOT NULL
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |               ROWS BETWEEN ${RollK - 1} PRECEDING AND CURRENT ROW)),
         |d AS (SELECT *, CAST(n AS DOUBLE) AS nd,
         |  sxx - sx * sx / CAST(n AS DOUBLE) AS vx,
         |  syy - sy * sy / CAST(n AS DOUBLE) AS vy FROM m)
         |SELECT event_id, CAST(n AS BIGINT) AS n,
         |CASE WHEN n > 1 AND vx > 0 AND vy > 0
         |     THEN round((sxy - sx * sy / nd) / (sqrt(vx) * sqrt(vy)), 6) END AS roll_corr
         |FROM d ORDER BY event_id""".stripMargin,
    // Running S − min(0, running-min S) in exact BIGINT micro-units; the
    // only float step is the shared per-row deviation round at 6dp.
    "q_window_cusum" ->
      s"""WITH e AS (SELECT event_id, user_id,
         |  epoch_us(date_trunc('microseconds', ts)) AS us,
         |  CAST(CAST(round(value - ${CusumMu0 + CusumK}, 6) AS DECIMAL(18,6))
         |       * 1000000 AS BIGINT) AS d_i
         |  FROM events),
         |s1 AS (SELECT *, sum(d_i) OVER (PARTITION BY user_id
         |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS ssum FROM e),
         |s2 AS (SELECT *, least(min(ssum) OVER (PARTITION BY user_id
         |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING), 0) AS ms FROM s1)
         |SELECT event_id, user_id, us AS ts_us,
         |  CAST(ssum - ms AS DOUBLE) / 1e6 AS cusum,
         |  ssum - ms > ${math.round(CusumH * 1e6)} AS is_drift
         |FROM s2 ORDER BY event_id""".stripMargin,
    "q_window_zscore" ->
      s"""WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, value
         |  FROM events),
         |m AS (SELECT event_id, value,
         |  count(*) OVER w AS n,
         |  CAST(sum(CAST(value AS DECIMAL(28,4))) OVER w AS DOUBLE) AS sx,
         |  CAST(sum(CAST(value * value AS DECIMAL(28,4))) OVER w AS DOUBLE) AS sxx
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |               ROWS BETWEEN ${RollK - 1} PRECEDING AND CURRENT ROW)),
         |d AS (SELECT *, CAST(n AS DOUBLE) AS nd,
         |  CASE WHEN n > 1 THEN
         |    (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
         |  END AS vx
         |  FROM m),
         |z AS (SELECT event_id, CAST(n AS BIGINT) AS n,
         |  CASE WHEN n > 1 AND vx > 0
         |       THEN round((value - sx / nd) / sqrt(vx), 6) END AS z
         |  FROM d)
         |SELECT event_id, n, z, (z IS NOT NULL AND abs(z) > 3.0) AS is_outlier
         |FROM z ORDER BY event_id""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |round(percentile_cont(0.25) WITHIN GROUP (ORDER BY value), 4) AS p25,
        |round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4) AS p50,
        |round(percentile_cont(0.75) WITHIN GROUP (ORDER BY value), 4) AS p75,
        |round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 4) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_pivot" -> {
      val cols = EventTypes.map(t =>
        s"count(*) FILTER (WHERE event_type = '$t') AS n_$t").mkString(",\n|")
      s"""SELECT epoch_us(date_trunc('day', ts)) AS day_us,
         |$cols,
         |count(*) AS n_total
         |FROM events GROUP BY 1 ORDER BY day_us""".stripMargin
    },
    "q_unpivot" -> {
      val cols = EventTypes.map(t =>
        s"count(*) FILTER (WHERE event_type = '$t') AS n_$t").mkString(",\n|")
      val branches = EventTypes.map(t =>
        s"SELECT day_us, 'n_$t' AS metric, n_$t AS n FROM w").mkString("\n|UNION ALL ")
      s"""WITH w AS (SELECT epoch_us(date_trunc('day', ts)) AS day_us,
         |$cols
         |FROM events GROUP BY 1)
         |$branches
         |ORDER BY day_us, metric""".stripMargin
    },
    "q_histogram" ->
      s"""WITH b AS (SELECT CAST(least(greatest(
         |    floor((l_extendedprice - $HistLo) / $HistW), 0.0), ${HistBuckets - 1}.0) AS BIGINT)
         |    AS bucket, l_extendedprice
         |  FROM lineitem)
         |SELECT bucket,
         |CAST(bucket AS DOUBLE) * $HistW + $HistLo AS lo,
         |CAST(bucket AS DOUBLE) * $HistW + $HistLo + $HistW AS hi,
         |count(*) AS n,
         |${Det.dsumSql("l_extendedprice")} AS sum_price
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_feature_lags" ->
      """SELECT event_id, user_id,
        |lag(value, 1) OVER w AS lag1,
        |lag(value, 2) OVER w AS lag2,
        |round(avg(value) OVER (PARTITION BY user_id
        |  ORDER BY date_trunc('microseconds', ts), event_id
        |  ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 6) AS roll3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY date_trunc('microseconds', ts), event_id)
        |ORDER BY event_id""".stripMargin,
    "q_window_running" ->
      """WITH d AS (SELECT epoch_us(date_trunc('day', o_orderdate)) AS day_us,
        |  sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_dec,
        |  count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT day_us, CAST(rev_dec AS DOUBLE) AS day_rev, n_orders,
        |CAST(sum(rev_dec) OVER (ORDER BY day_us
        |  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev
        |FROM d ORDER BY day_us""".stripMargin,
    "q_split_assign" ->
      s"""SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h4,
         |CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '$TestMax' THEN 'test'
         |     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '$ValMax' THEN 'val'
         |     ELSE 'train' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    // Leakage-safe split: the whole exact-dup cluster inherits its
    // canonical id's verdict, so duplicated text never straddles splits.
    "q_split_leakage_safe" ->
      s"""WITH k AS (SELECT doc_id,
         |    sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS ck
         |  FROM documents),
         |c AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY ck) AS canon_id
         |  FROM k),
         |h AS (SELECT doc_id, canon_id,
         |    substr(md5(CAST(canon_id AS VARCHAR)), 1, 4) AS h4 FROM c)
         |SELECT doc_id, canon_id,
         |CASE WHEN h4 < '$TestMax' THEN 'test'
         |     WHEN h4 < '$ValMax' THEN 'val'
         |     ELSE 'train' END AS split
         |FROM h ORDER BY doc_id""".stripMargin)
}
