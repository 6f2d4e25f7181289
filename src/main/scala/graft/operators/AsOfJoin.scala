package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series hallmark operator the reference's
  * users reach via `pandas.merge_asof` after `read_range` (SURVEY.md §2 B3).
  *
  * For each left row, attach the single most recent right row whose time is
  * at-or-before the left row's time, matching on an equi-key. Unmatched left
  * rows keep null right columns (left-outer semantics, like `merge_asof`).
  *
  * Implementation is scale-first: union both sides tagged, one shuffle on the
  * key, one sort by (time, side), and a running `last(_, ignoreNulls)` window
  * — O(n log n) per key and a single exchange, instead of the quadratic
  * range-condition theta join a naive translation would produce. At 100 TB
  * this is the same shape as a sort-merge join: shuffle by key, merge sorted
  * runs; skewed keys can be salted upstream like any SMJ.
  *
  * Determinism: if the right side can hold several rows with the same
  * (key, time), pre-dedupe it (e.g. `max_by` on a unique column) — any
  * engine's as-of semantics are arbitrary under such ties.
  */
object AsOfJoin {

  /** Key columns as ONE struct under POSITIONAL field names (k0, k1, …) so
    * the left and right `_k` types unify in the union whatever the source
    * columns were called. Shared by every *By variant — key handling must
    * not drift between directions. */
  private def keyStruct(keys: Seq[String]): Column =
    struct(keys.zipWithIndex.map { case (k, i) => col(k).as(s"k$i") }: _*)

  private def requireMatchingKeys(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String]): Unit = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"need matching non-empty key lists, got $leftKeys vs $rightKeys")
    // Resolve each key pair now and require identical dataTypes: a mismatch
    // would otherwise surface as an opaque union analysis error in the
    // window path, or as a runtime ClassCastException inside
    // BackwardAsOfExec's interpreted ordering (built from LEFT types only).
    leftKeys.zip(rightKeys).zipWithIndex.foreach { case ((lk, rk), i) =>
      val lt = left.schema.find(_.name == lk).getOrElse(
        throw new IllegalArgumentException(
          s"left key '$lk' not found in ${left.columns.mkString(", ")}")).dataType
      val rt = right.schema.find(_.name == rk).getOrElse(
        throw new IllegalArgumentException(
          s"right key '$rk' not found in ${right.columns.mkString(", ")}")).dataType
      require(lt == rt,
        s"as-of key #$i type mismatch: left '$lk' is ${lt.simpleString}, " +
          s"right '$rk' is ${rt.simpleString} — cast one side first")
    }
  }

  /** @param saltBuckets skew recipe for hot keys (one instrument carrying a
    *   large share of the left stream): when > 1, LEFT rows of a key are
    *   spread over `saltBuckets` sub-partitions by a deterministic hash of
    *   their time, and RIGHT rows are replicated into every bucket, so the
    *   window runs per (key, salt) with each hot key's sort split
    *   `saltBuckets` ways. Results are provably identical to the unsalted
    *   plan: an as-of match depends only on the right rows at-or-before the
    *   left row, and every bucket holds ALL right rows of its key
    *   (AsOfJoinSpec asserts row-for-row equality on a hot-key fixture).
    *   The price is a `saltBuckets`× right-side replication — the right
    *   recipe when the left stream dwarfs the right (events vs orders,
    *   trades vs dimension updates). When both sides are huge AND hot, a
    *   partitioned time-range merge is the answer, not salting.
    * @param toleranceUs pandas `merge_asof(tolerance=…)` parity: a backward
    *   match STALER than this many microseconds (left time − right time,
    *   inclusive bound) is discarded — the row reverts to unmatched nulls.
    *   Applied as a post-window null-out on the match struct, so the plan
    *   shape (one union + one window) is unchanged.
    * @param allowExactMatches pandas `merge_asof(allow_exact_matches=…)`
    *   parity: false makes the bound STRICT (a right row at exactly the
    *   left row's instant no longer matches). Implemented purely in the
    *   tie-break rank: right rows sort AFTER left rows at the same instant
    *   instead of before, so the running window at the left row excludes
    *   them — zero extra plan cost. */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      saltBuckets: Int = 1,
      toleranceUs: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame =
    backwardBy(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime,
      saltBuckets, toleranceUs, allowExactMatches)

  /** Composite-key backward as-of — `pandas.merge_asof(by=[k1, k2, …])`
    * parity (the (symbol, venue)-style keys tick pipelines join on). Same
    * single-shuffle union+window plan as the single-key form: the key
    * columns ride as ONE struct `_k`, so partitioning, ordering, salt and
    * tolerance handling are untouched. Null semantics generalize per
    * pandas/DuckDB: a right row with ANY null key component can never
    * match (dropped up front); a left row with a null component groups
    * only with identically-null LEFT rows and stays unmatched. */
  def backwardBy(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      saltBuckets: Int = 1,
      toleranceUs: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame = {

    requireMatchingKeys(left, right, leftKeys, rightKeys)
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(toleranceUs.forall(_ >= 0),
      s"toleranceUs must be non-negative, got $toleranceUs")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column overlap not supported: $overlap")
    val reserved = Set("_k", "_t", "_side", "_l", "_r", "_m", "_salt")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns clash with reserved names: $clash")

    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rStruct = struct(right.columns.map(col).toSeq: _*)
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)

    val lTagged = left.select(
      keyStruct(leftKeys).as("_k"),
      col(leftTime).cast("timestamp").as("_t"),
      lit(1).as("_side"), lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    // Null-key/null-time right rows can never be a valid as-of match
    // (DuckDB ASOF JOIN never matches NULLs); drop them up front so a
    // null-keyed LEFT row — which Window.partitionBy would group with
    // null-keyed right rows — stays unmatched instead of picking one up.
    // Null-keyed/timed left rows are kept, unmatched (left-outer semantics).
    // Right rows sort before left rows at the same instant (_side 0 < 1),
    // so a right row at exactly t is visible to a left row at t
    // ("at-or-before"). allowExactMatches=false flips the rank to AFTER
    // (_side 2 > 1): the same running window then excludes same-instant
    // rights, making the bound strict — the whole option costs one literal.
    val rSide = if (allowExactMatches) 0 else 2
    val rTagged = right
      .where(rightKeys.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTime).isNotNull)
      .select(
        keyStruct(rightKeys).as("_k"),
        col(rightTime).cast("timestamp").as("_t"),
        lit(rSide).as("_side"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))

    // Tolerance null-out, post-window: the match struct reverts to null
    // when staler than toleranceUs. Keeps the single-window plan.
    def applyTolerance(df: DataFrame): DataFrame = toleranceUs match {
      case None => df
      case Some(us) => df.withColumn("_m",
        when(col("_m").isNotNull &&
          unix_micros(col("_t")) -
            unix_micros(col("_m").getField(rightTime).cast("timestamp")) <= us,
          col("_m")).otherwise(lit(null).cast(rType)))
    }

    if (saltBuckets == 1) {
      val w = Window.partitionBy(col("_k"))
        .orderBy(col("_t").asc, col("_side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      applyTolerance(
        lTagged.unionByName(rTagged)
          .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
          .where(col("_side") === 1))
        .select(col("_l.*"), col("_m.*"))
    } else {
      // Deterministic left spread (hash of the row's own time — stable
      // under retries); right rows fan out to every bucket.
      val lSalted = lTagged.withColumn("_salt",
        pmod(xxhash64(col("_t")), lit(saltBuckets.toLong)).cast("int"))
      val rSalted = rTagged.withColumn("_salt",
        explode(sequence(lit(0), lit(saltBuckets - 1))))
      val w = Window.partitionBy(col("_k"), col("_salt"))
        .orderBy(col("_t").asc, col("_side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      applyTolerance(
        lSalted.unionByName(rSalted)
          .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
          .where(col("_side") === 1))
        .select(col("_l.*"), col("_m.*"))
    }
  }

  /** Forward as-of join — `pandas.merge_asof(direction='forward')`: for
    * each left row, the single EARLIEST right row whose time is at-or-AFTER
    * the left row's time, matching on an equi-key; unmatched left rows keep
    * null right columns. Same union-tag single-shuffle shape as `backward`,
    * mirrored: the running window looks forward (current row → unbounded
    * following) and right rows sort AFTER left rows at the same instant
    * (so an exactly-simultaneous right row is still "at-or-after" and
    * matches). The `backward` salt recipe applies symmetrically if a hot
    * key ever needs it. */
  def forward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      toleranceUs: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame =
    forwardBy(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime,
      toleranceUs, allowExactMatches)

  /** Composite-key forward as-of (`merge_asof(by=[…], direction='forward')`)
    * — see `backwardBy` for the struct-key mechanics and null semantics. */
  def forwardBy(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      toleranceUs: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame = {

    requireMatchingKeys(left, right, leftKeys, rightKeys)
    require(toleranceUs.forall(_ >= 0),
      s"toleranceUs must be non-negative, got $toleranceUs")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column overlap not supported: $overlap")
    val reserved = Set("_k", "_t", "_side", "_l", "_r", "_m")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns clash with reserved names: $clash")

    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rStruct = struct(right.columns.map(col).toSeq: _*)
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)

    val lTagged = left.select(
      keyStruct(leftKeys).as("_k"), col(leftTime).cast("timestamp").as("_t"),
      lit(1).as("_side"), lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    // Left rows sort before right rows at the same instant (_side desc:
    // 1 before 0), so a right row at exactly t stays inside a left row's
    // forward frame. allowExactMatches=false flips the right rank to 2
    // (desc: BEFORE the left row), pushing same-instant rights out of the
    // frame — strict bound at the cost of one literal, mirroring backward.
    val rSide = if (allowExactMatches) 0 else 2
    val rTagged = right
      .where(rightKeys.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTime).isNotNull)
      .select(
        keyStruct(rightKeys).as("_k"), col(rightTime).cast("timestamp").as("_t"),
        lit(rSide).as("_side"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val joined = lTagged.unionByName(rTagged)
      .withColumn("_m", first(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    val bounded = toleranceUs match {
      case None => joined
      case Some(us) => joined.withColumn("_m",
        when(col("_m").isNotNull &&
          unix_micros(col("_m").getField(rightTime).cast("timestamp")) -
            unix_micros(col("_t")) <= us,
          col("_m")).otherwise(lit(null).cast(rType)))
    }
    // A null-timed left row must stay unmatched (backward's documented
    // invariant): nulls sort FIRST under the ascending ordering, so its
    // forward frame would otherwise span the whole partition and "match"
    // the earliest right row.
    bounded
      .withColumn("_m",
        when(col("_t").isNotNull, col("_m")).otherwise(lit(null).cast(rType)))
      .select(col("_l.*"), col("_m.*"))
  }

  /** Nearest as-of join — `pandas.merge_asof(direction='nearest')`: for each
    * left row, the right row of the same key with the smallest absolute time
    * distance, in EITHER direction; exact-tie distances resolve to the
    * backward (at-or-before) match, and unmatched left rows keep null right
    * columns. One union, ONE shuffle+sort on (key, time) — the backward
    * running-`last` and forward running-`first` are two frames over the same
    * window ordering, so Spark evaluates both in a single Window operator
    * (PlanAuditSpec-style: no second exchange). A right row at exactly the
    * left row's instant sorts before it and is picked up by the BACKWARD
    * frame at distance 0, which wins the tie by definition — the forward
    * frame never needs to see same-instant rows. */
  def nearest(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      toleranceUs: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame =
    nearestBy(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime,
      toleranceUs, allowExactMatches)

  /** Composite-key nearest as-of (`merge_asof(by=[…], direction='nearest')`)
    * — see `backwardBy` for the struct-key mechanics and null semantics. */
  def nearestBy(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      toleranceUs: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame = {

    requireMatchingKeys(left, right, leftKeys, rightKeys)
    require(toleranceUs.forall(_ >= 0),
      s"toleranceUs must be non-negative, got $toleranceUs")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column overlap not supported: $overlap")
    val reserved = Set("_k", "_t", "_side", "_l", "_r", "_b", "_f", "_m")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns clash with reserved names: $clash")

    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rStruct = struct(right.columns.map(col).toSeq: _*)
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)

    // The right payload rides with its own ALREADY-CAST event time (`t`)
    // so the tie-break distances below compare timestamp-to-timestamp;
    // reading the raw right-time field back out of the payload struct
    // would lean on implicit casting for non-timestamp time columns and
    // could fail analysis or diverge from the `_t` ordering the window
    // itself sorts by.
    val rCarry = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "t", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("p", rType)))
    val lTagged = left.select(
      keyStruct(leftKeys).as("_k"), col(leftTime).cast("timestamp").as("_t"),
      lit(1).as("_side"), lStruct.as("_l"), lit(null).cast(rCarry).as("_r"))
    // allowExactMatches=false needs same-instant rights OUT of both frames,
    // and one shared ordering cannot put a right row simultaneously after
    // the left (backward exclusion) and before it (forward exclusion). So
    // the strict case ranks rights AFTER lefts (side 2) and gives the two
    // frames DIFFERENT side tie-orders: backward keeps asc (same-instant
    // rights fall outside at-or-before), forward flips to desc (they sort
    // before the left row, outside current-and-following). Same hash
    // partitioning → one exchange; the second ordering adds a sort only in
    // the strict case.
    val rSide = if (allowExactMatches) 0 else 2
    val rTagged = right
      .where(rightKeys.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTime).isNotNull)
      .select(
        keyStruct(rightKeys).as("_k"), col(rightTime).cast("timestamp").as("_t"),
        lit(rSide).as("_side"), lit(null).cast(lType).as("_l"),
        struct(col(rightTime).cast("timestamp").as("t"), rStruct.as("p")).as("_r"))

    val wb = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc,
        if (allowExactMatches) col("_side").asc else col("_side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // Distances in exact integer micros; <= prefers the backward match on
    // equal distance (pinned semantics, mirrored in every oracle).
    // Tolerance applies arithmetically to each side's candidate.
    val tUs = unix_micros(col("_t"))
    val distB = tUs - unix_micros(col("_b")("t"))
    val distF = unix_micros(col("_f")("t")) - tUs
    def eligible(c: Column, d: Column): Column =
      toleranceUs match {
        case None => c
        case Some(us) => when(c.isNotNull && d <= us, c)
      }
    lTagged.unionByName(rTagged)
      .withColumn("_b", last(col("_r"), ignoreNulls = true).over(wb))
      .withColumn("_f", first(col("_r"), ignoreNulls = true).over(wf))
      .where(col("_side") === 1)
      .withColumn("_b", eligible(col("_b"), distB))
      .withColumn("_f", eligible(col("_f"), distF))
      .withColumn("_m",
        when(col("_f").isNull, col("_b"))
          .when(col("_b").isNull, col("_f"))
          .when(tUs - unix_micros(col("_b")("t")) <=
            unix_micros(col("_f")("t")) - tUs, col("_b"))
          .otherwise(col("_f")))
      // null-timed left rows stay unmatched (see forward): their forward
      // frame spans the partition under nulls-first ordering
      .withColumn("_m",
        when(col("_t").isNotNull, col("_m")).otherwise(lit(null).cast(rCarry)))
      .select(col("_l.*"), col("_m.p.*"))
  }

  /** Same semantics as `backward`, planned as the custom partitioned-merge
    * operator (org.apache.spark.sql.graft.BackwardAsOf): one hash exchange
    * per SIDE on its key, per-side sorts of the narrow original rows, then
    * a streaming two-pointer merge with O(1) state — no null-padded union
    * rows and no window aggregation state. Registered through
    * `spark.sql.extensions=graft.plans.GraftExtensions` or transparently
    * via `experimental.extraStrategies` on first use in a session. */
  def backwardMerged(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame =
    backwardMergedBy(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime)

  /** Composite-key variant of `backwardMerged` (`merge_asof(by=[…])` on the
    * custom exec): the plan node carries the key ATTRIBUTE LISTS, so the
    * exchanges cluster on all key columns and the per-partition merge
    * compares them lexicographically — same one-exchange-per-side shape. */
  def backwardMergedBy(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    requireMatchingKeys(left, right, leftKeys, rightKeys)
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column overlap not supported: $overlap")
    val spark = left.sparkSession
    import org.apache.spark.sql.graft.{BackwardAsOf, BackwardAsOfStrategy, PlanBridge}
    if (!spark.experimental.extraStrategies.contains(BackwardAsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ BackwardAsOfStrategy
    // Times normalized to TimestampType up front (the exec merges on raw
    // micros); right rows with ANY null key (or null time) dropped here —
    // they can never match (same rule as the union+window path).
    val l = left.withColumn(leftTime, col(leftTime).cast("timestamp"))
    val r = right.withColumn(rightTime, col(rightTime).cast("timestamp"))
      .where(rightKeys.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTime).isNotNull)
    val lPlan = PlanBridge.analyzed(l)
    val rPlan = PlanBridge.analyzed(r)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column '$n' not found"))
    PlanBridge.ofRows(spark, BackwardAsOf(lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}
