package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface (SURVEY.md §2 B3–B8): the computation the reference's
  * users do in pandas after `read_range`, re-expressed as declarative Spark
  * plans so Catalyst handles pushdown, join strategy and AQE.
  *
  * Scale notes per query are on each member; the common themes:
  *   - dimension tables are broadcast (no shuffle of the fact side);
  *   - aggregations are partial+final (map-side combine) by construction;
  *   - sort order for oracle determinism is applied AFTER aggregation, on
  *     already-small results, so it never adds a fact-table-wide sort.
  */
object RelationalPack extends QueryPack {

  /** B3 broadcast equi-join: fact orders ⋈ broadcast(customer). At 100 TB the
    * customer dim stays far under the broadcast threshold per executor; no
    * shuffle of orders. */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** B3 multi-way join, TPC-H Q5 shape adapted to the available columns:
    * revenue per ASIA nation for 1996 orders. lineitem⋈orders shuffles on
    * orderkey; customer/nation/region are broadcast. */
  def joinMultiway(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA" &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))

  private val BigOrder = 450000.0

  /** B3 left-semi: customers with at least one big order (EXISTS). */
  def semiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).where(col("o_totalprice") > BigOrder),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** B3 left-anti: customers with no big order (NOT EXISTS). */
  def antiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).where(col("o_totalprice") > BigOrder),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** B3+ SKEW-RESILIENT salted join — the 100 TB pattern for a hot key
    * that overwhelms one shuffle partition: the probe side tags each row
    * with a deterministic salt in [0, S), the build side is replicated S
    * ways, and the join key becomes (key, salt), so one hot key's rows
    * spread over S shuffle partitions. Replication cost is S× the right
    * side — replicate the SMALLER side. The merge hint pins the shuffle
    * join (salting is a no-op under broadcast, and at bench scale Spark
    * would broadcast orders and hide the pattern being proved). The salt
    * is pure function of the row (xxhash64 — seed-free, deterministic on
    * any executor), and the result is EXACTLY the plain join: the oracle
    * is the un-salted SQL. */
  def joinSalted(s: SparkSession, dir: String): DataFrame = {
    val S = 4
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .withColumn("_salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(S)).cast("int"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("_salt", explode(sequence(lit(0), lit(S - 1))))
    li.hint("merge")
      .join(ord, col("l_orderkey") === col("o_orderkey") &&
        li("_salt") === ord("_salt"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("o_totalprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** B3+ BUCKETED co-located join — the shuffle paid ONCE at write time,
    * not per query: both tables bucketed (and bucket-sorted) on the join
    * key into the same bucket count, so the sort-merge join reads
    * bucket-aligned files with NO exchange on either side. The 100 TB
    * pattern for a fact table joined on the same key by many downstream
    * queries. The pre-write `repartition(nBuckets, key)` uses the same
    * murmur3 hash as the bucket spec, so each bucket is written by exactly
    * one task → one file per bucket → the bucket-sort also serves the SMJ
    * (no per-query sort). Tables land under StoreDirs as external-path
    * catalog tables, rebuilt only when the (per-session) catalog lacks
    * them. The merge hint keeps the demonstration honest — at bench scale
    * customer would broadcast; at production scale it would not.
    * PlanAuditSpec asserts the bucketed scans and the absence of
    * hash-partition exchanges. */
  def joinBucketed(s: SparkSession, dir: String): DataFrame = {
    val nBuckets = 8
    val tag = StoreDirs.pathKey(dir)
    val ordT = s"graft_bkt_orders_$tag"
    val custT = s"graft_bkt_customer_$tag"
    def build(t: String, df: DataFrame, key: String): Unit =
      if (!s.catalog.tableExists(t))
        df.repartition(nBuckets, col(key))
          .write.mode("overwrite").format("parquet")
          .bucketBy(nBuckets, key).sortBy(key)
          .option("path", StoreDirs.stable(s, t))
          .saveAsTable(t)
    build(ordT, Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")), "o_custkey")
    build(custT, Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment")), "c_custkey")
    s.table(ordT).hint("merge")
      .join(s.table(custT), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** B4 TPC-H Q1 shape: multi-aggregate pricing summary. Partial aggregation
    * reduces 600k rows to 6 groups map-side; the shuffle moves only
    * per-partition partials. */
  def aggPricingSummary(s: SparkSession, dir: String): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(disc).as("sum_disc_price"),
        Det.dsum6(disc * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (Det.dsumDec(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** B4 exact distinct count per group. */
  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** B4 approximate distinct count per group (HyperLogLog++): the sketch is
    * mergeable, so the plan is partial+final aggregation with fixed-size
    * (not cardinality-size) shuffle state — the 100 TB alternative to
    * countDistinct's expand+two-phase shuffle. Deterministic for a given
    * dataset (seed-free HLL), but approximate → no DuckDB oracle; the error
    * bound is asserted in ApproxSpec and the driver records a rows check. */
  def aggApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** B4 rollup over nation × order priority (grouping-set nulls are folded to
    * 'ALL' on both sides so null-ordering dialects can't diverge). */
  def aggRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("nation"), col("priority"))

  /** B4 cube: all four grouping sets over nation × priority (rollup's
    * sibling — rollup emits the 3 hierarchical sets, cube adds the
    * priority-only marginals). Same null-folding discipline. Spark plans
    * one Expand + single hash aggregation, not one pass per set. */
  def aggCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .cube(col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("nation"), col("priority"))

  /** B4+ join-key skew diagnostic — the report that tells you whether a
    * shuffle join needs `q_join_salted`'s treatment BEFORE it falls over:
    * the 10 hottest join keys with their row counts and share of the
    * table, plus the key cardinality. One map-side-combined aggregate
    * (state = |keys|), the grand total re-entering as a broadcast 1-row
    * aggregate, a k-bounded TakeOrdered — nothing corpus-sized moves. The
    * q_event_gaps/q_anomaly_mad observability discipline applied to join
    * planning. */
  def skewReport(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey").as("key"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("share"),
        col("n_keys"))
      .orderBy(col("n").desc, col("key"))
      .limit(10)
  }

  /** B4 explicit GROUPING SETS — the general form rollup/cube specialize:
    * exactly the three sets {(nation, priority), (nation), (priority)}
    * (both one-dimension marginals, NO grand total — a set neither rollup
    * nor cube can express alone). Spark 4's `Dataset.groupingSets` plans
    * the same single Expand + one hash aggregation as rollup/cube (one
    * scan regardless of set count); same 'ALL' null-folding discipline. */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupingSets(
        Seq(Seq(col("n_name"), col("o_orderpriority")),
          Seq(col("n_name")), Seq(col("o_orderpriority"))),
        col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("nation"), col("priority"))

  /** B5 distribution ranking: percent_rank / cume_dist / ntile(4) of each
    * order's totalprice within its priority class. The window ORDER BY ends
    * in the unique o_orderkey, so ranks (and hence the emitted doubles —
    * both engines compute (rank−1)/(n−1) and peers/n from identical ints)
    * are fully deterministic. One shuffle on the partition key. */
  def windowRankStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("o_orderkey"))
  }

  /** B5 ranking: top-3 orders per customer (row_number with a unique
    * tie-break key). */
  def windowTopnPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .where(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** B6 global top-k: Spark plans TakeOrderedAndProject — per-partition
    * top-k then a k-row merge on the driver, no global sort. The sort key
    * covers every emitted column: (l_orderkey, l_linenumber) is NOT unique
    * in the testdata, so equal rows must be interchangeable. */
  def topk(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)

  /** B7 set operations: one tagged result exercising INTERSECT and EXCEPT. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def users(t: String) = ev.where(col("event_type") === t)
      .select(col("user_id")).distinct()
    val inter = users("purchase").intersect(users("view"))
      .select(col("user_id"), lit("purchase_and_view").as("op"))
    val diff = users("purchase").except(users("error"))
      .select(col("user_id"), lit("purchase_no_error").as("op"))
    inter.unionAll(diff).orderBy(col("op"), col("user_id"))
  }

  /** B3+ co-occurrence (market-basket shape): for every unordered pair of
    * event types, how many users did both. Distinct (user, type) first —
    * the self-join's per-key fan-out is then bounded by the TYPE density
    * (≤ C(5,2) = 10 pairs per user), not the user's event count, so the
    * join output is at most 10 × users regardless of corpus size. */
  def cooccur(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val a = u.select(col("user_id"), col("event_type").as("a_type"))
    val b = u.select(col("user_id").as("b_user"), col("event_type").as("b_type"))
    a.join(b, col("user_id") === col("b_user") && col("a_type") < col("b_type"))
      .groupBy(col("a_type"), col("b_type"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("a_type"), col("b_type"))
  }

  /** B8 JSON extraction: typed field out of the props JSON string. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("k"))

  private val RfmAsOf = "2002-01-01" // just past the orders domain (1995–2001)
  private val RfmQs = Seq(0.2, 0.4, 0.6, 0.8)

  /** B4+ RFM customer segmentation (Hughes '94 — the classic
    * marketing-analytics cut): per customer, days since last order
    * (recency, against a fixed as-of date), order count (frequency), and
    * DECIMAL-exact lifetime spend (monetary), each scored into its
    * quintile 1–5. Quintile boundaries come from ONE exact-percentile
    * aggregate over the customer rollup and re-enter as a broadcast 1-row
    * array (the q_quality_deciles discipline) — assignment is a narrow
    * per-row boundary count, so no ntile() window ever single-tasks the
    * customer table. Boundary-equal values take the LOWER bucket
    * (strict-less count — deterministic under ties on both engines;
    * `percentile` ≡ DuckDB `quantile_cont`, the q_percentiles parity;
    * `approx_percentile` — the registered `q_percentiles_approx` twin in
    * StatsPack — is the mergeable boundary source at 100 TB).
    * Scores are raw quintiles of each metric (low recency days ⇒ low r_q:
    * the freshest customers score 1 — orientation is a labeling choice,
    * stated rather than hidden in an inversion). */
  def rfm(s: SparkSession, dir: String): DataFrame = {
    val ref = lit(RfmAsOf).cast("date")
    val cust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(datediff(ref, max(to_date(col("o_orderdate"))))
          .cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        Det.dsum(col("o_totalprice")).as("monetary"))
    val qs = array(RfmQs.map(lit): _*)
    val bounds = cust.agg(
      percentile(col("recency_days").cast("double"), qs).as("rb"),
      percentile(col("frequency").cast("double"), qs).as("fb"),
      percentile(col("monetary"), qs).as("mb"))
    def q(c: Column, b: Column): Column =
      (lit(1) + size(filter(b, x => x < c))).cast("long")
    cust.crossJoin(broadcast(bounds))
      .select(col("o_custkey").as("custkey"),
        col("recency_days"), col("frequency"), col("monetary"),
        q(col("recency_days").cast("double"), col("rb")).as("r_q"),
        q(col("frequency").cast("double"), col("fb")).as("f_q"),
        q(col("monetary"), col("mb")).as("m_q"))
      .orderBy(col("custkey"))
  }

  private val FuzzyMaxDist = 3

  /** B3+ FUZZY (edit-distance) join with blocking — the entity-resolution
    * primitive (pandas users reach for `fuzzywuzzy` + a manual blocking
    * loop after `read_range`): candidate name pairs whose Levenshtein
    * distance is ≤ 3, blocked on the name's last token so the quadratic
    * term is confined to within-block pairs. The plan is the 100 TB shape
    * for fuzzy matching: (1) the fact table first collapses to its NAME
    * VOCABULARY (a map-side-combining aggregate — the only pass over the
    * big table, and the vocabulary is generative-grammar-bounded, not
    * data-bounded); (2) the vocabulary self-joins on the blocking key
    * (both sides broadcast-size by construction); (3) `levenshtein` — a
    * codegen'd Catalyst expression, not a UDF — runs only on blocked
    * candidates. `pk_a < pk_b` canonicalizes pair order. DuckDB implements
    * the same classic Wagner–Fischer distance, so the threshold filter is
    * exactly replayable. */
  def fuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(s, dir)
      .groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("pk"))
      .withColumn("block", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("p_name").as("name_a"), col("pk").as("pk_a"),
      col("block"))
    val b = names.select(col("p_name").as("name_b"), col("pk").as("pk_b"),
      col("block").as("block_b"))
    a.join(b, col("block") === col("block_b") && col("pk_a") < col("pk_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= FuzzyMaxDist)
      .select(col("name_a"), col("name_b"), col("dist"), col("pk_a"), col("pk_b"))
      .orderBy(col("pk_a"), col("pk_b"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_join" -> fuzzyJoin,
    "q_rfm" -> rfm,
    "q_join_broadcast" -> joinBroadcast,
    "q_join_multiway" -> joinMultiway,
    "q_semi_join" -> semiJoin,
    "q_anti_join" -> antiJoin,
    "q_join_salted" -> joinSalted,
    "q_join_bucketed" -> joinBucketed,
    "q_agg_pricing_summary" -> aggPricingSummary,
    "q_agg_distinct" -> aggDistinct,
    "q_approx_distinct" -> aggApproxDistinct,
    "q_agg_rollup" -> aggRollup,
    "q_agg_cube" -> aggCube,
    "q_agg_grouping_sets" -> aggGroupingSets,
    "q_skew_report" -> skewReport,
    "q_window_rank_stats" -> windowRankStats,
    "q_window_topn_per_group" -> windowTopnPerGroup,
    "q_topk" -> topk,
    "q_set_ops" -> setOps,
    "q_json_extract" -> jsonExtract,
    "q_cooccur" -> cooccur)

  def oracles: Map[String, String] = Map(
    // quantile_cont == Spark percentile (q_percentiles parity); strict-less
    // boundary counts keep tie assignment identical
    "q_rfm" ->
      s"""WITH c AS (SELECT o_custkey,
         |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
         |         DATE '2002-01-01') AS BIGINT) AS recency_days,
         |    count(*) AS frequency,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary
         |  FROM orders GROUP BY 1),
         |b AS (SELECT
         |    quantile_cont(CAST(recency_days AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS rb,
         |    quantile_cont(CAST(frequency AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS fb,
         |    quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mb
         |  FROM c)
         |SELECT c.o_custkey AS custkey, recency_days, frequency, monetary,
         |  CAST(1 + len(list_filter(b.rb, x -> x < CAST(recency_days AS DOUBLE))) AS BIGINT) AS r_q,
         |  CAST(1 + len(list_filter(b.fb, x -> x < CAST(frequency AS DOUBLE))) AS BIGINT) AS f_q,
         |  CAST(1 + len(list_filter(b.mb, x -> x < monetary)) AS BIGINT) AS m_q
         |FROM c, b ORDER BY custkey""".stripMargin,
    "q_fuzzy_join" ->
      s"""WITH names AS (SELECT p_name, min(p_partkey) AS pk,
         |    split_part(p_name, ' ', -1) AS block
         |  FROM part GROUP BY p_name)
         |SELECT a.p_name AS name_a, b.p_name AS name_b,
         |  levenshtein(a.p_name, b.p_name) AS dist,
         |  a.pk AS pk_a, b.pk AS pk_b
         |FROM names a JOIN names b ON a.block = b.block AND a.pk < b.pk
         |WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDist
         |ORDER BY pk_a, pk_b""".stripMargin,
    "q_join_broadcast" ->
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    // Salting/bucketing change the PLAN, never the RESULT: both oracles
    // are the plain joins.
    "q_join_salted" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_bucketed" ->
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_multiway" ->
      """SELECT n_name,
        |CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |count(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_rollup" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |coalesce(o_orderpriority, 'ALL') AS priority,
        |count(*) AS n,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, o_orderpriority)
        |ORDER BY nation, priority""".stripMargin,
    "q_skew_report" ->
      """WITH c AS (SELECT l_suppkey AS key, count(*) AS n
        |           FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_keys FROM c)
        |SELECT c.key, c.n, round(CAST(c.n AS DOUBLE) / t.total, 6) AS share,
        |       t.n_keys
        |FROM c CROSS JOIN t ORDER BY c.n DESC, c.key LIMIT 10""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |coalesce(o_orderpriority, 'ALL') AS priority,
        |count(*) AS n,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), (o_orderpriority))
        |ORDER BY nation, priority""".stripMargin,
    "q_agg_cube" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |coalesce(o_orderpriority, 'ALL') AS priority,
        |count(*) AS n,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, o_orderpriority)
        |ORDER BY nation, priority""".stripMargin,
    "q_window_rank_stats" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |percent_rank() OVER w AS pr,
        |cume_dist() OVER w AS cd,
        |CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_window_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,
    "q_set_ops" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT user_id, 'purchase_and_view' AS op FROM (
        |  SELECT user_id FROM u WHERE event_type = 'purchase'
        |  INTERSECT SELECT user_id FROM u WHERE event_type = 'view')
        |UNION ALL
        |SELECT user_id, 'purchase_no_error' AS op FROM (
        |  SELECT user_id FROM u WHERE event_type = 'purchase'
        |  EXCEPT SELECT user_id FROM u WHERE event_type = 'error')
        |ORDER BY op, user_id""".stripMargin,
    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |count(*) AS n,
        |CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cooccur" ->
      """WITH u AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS a_type, b.event_type AS b_type,
        |count(*) AS n_users
        |FROM u a JOIN u b ON a.user_id = b.user_id
        |  AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
