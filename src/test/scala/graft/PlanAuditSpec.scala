package graft

import graft.operators.{RelationalPack, TimeSeriesPack}
import org.apache.spark.sql.DataFrame

/** Physical-plan audit: the properties that make these queries scale are
  * asserted, not assumed. Each check reads the executed plan the way
  * `.explain("formatted")` renders it; a regression that silently turns a
  * broadcast join into a shuffle join, drops a pushed filter, or sneaks a
  * cartesian product into a query fails here, at sf0.001 cost. */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("no query plans a CartesianProduct (broadcast-probe cross joins excepted by construction)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val p = plan(fn(spark, sf0001))
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$p")
    }
  }

  test("filter+projection reach the parquet scan (PushedFilters, pruned ReadSchema)") {
    val p = plan(TimeSeriesPack.filterProject(spark, sf0001))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]].*"), // non-empty list
      s"no filters pushed:\n$p")
  }

  test("the archive-resolving facade read keeps vectorized batches AND " +
      "pushed ts filters (the format swap must cost nothing on the hot path)") {
    val dir = new java.io.File(sys.props("java.io.tmpdir"), "graft_planaudit_fmt").toString
    val p0 = new org.apache.hadoop.fs.Path(dir)
    val fs = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p0)) fs.delete(p0, true)
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf0001)
      .where(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
    val t = graft.ts.TsTable.create(spark, dir, ev.schema, tsCol = "ts")
    t.append(ev)
    val rr = t.readRange(
      java.sql.Timestamp.valueOf("2024-01-01 06:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 18:00:00"))
    val p = plan(rr)
    assert(p.contains("GraftTsParquet(archive-resolving)"),
      s"facade read must go through the resolving format:\n$p")
    assert(p.contains("Batched: true"),
      s"the format swap dropped vectorized batches:\n$p")
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]].*"),
      s"ts bounds not pushed through the resolving format:\n$p")
    assert(p.contains("PartitionFilters: [") && p.contains("p_date"),
      s"partition pruning lost:\n$p")
  }

  test("dimension joins broadcast the small side; top-k plans TakeOrderedAndProject") {
    assert(plan(RelationalPack.joinBroadcast(spark, sf0001))
      .contains("BroadcastHashJoin"))
    assert(plan(RelationalPack.joinMultiway(spark, sf0001))
      .contains("BroadcastHashJoin"))
    assert(plan(RelationalPack.topk(spark, sf0001))
      .contains("TakeOrderedAndProject"))
  }

  test("bm25: top-10 is a TakeOrdered, stats row broadcasts, no token-key " +
      "shuffle beyond the per-doc aggregate") {
    val p = plan(graft.operators.LlmPack.bm25Search(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"1-row stats must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no wide join belongs here:\n$p")
  }

  test("salted join: SMJ on (key, salt) — hot keys spread across partitions") {
    val p = plan(RelationalPack.joinSalted(spark, sf0001))
    assert(p.contains("SortMergeJoin"), s"salted join must shuffle-join:\n$p")
    assert(p.contains("_salt"), s"salt column missing from the plan:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"broadcast defeats the salting demonstration:\n$p")
  }

  test("bucketed join: bucket-aligned scans, no hash-partition exchange on either side") {
    val p = plan(RelationalPack.joinBucketed(spark, sf0001))
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("SelectedBucketsCount"),
      s"scan is not bucket-aware:\n$p")
    // the ONLY exchange is the final orderBy's range partition; the join
    // itself reads co-located buckets with no hashpartitioning exchange
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$p")
  }

  test("semi/anti joins plan as joins, not subquery re-scans") {
    assert(plan(RelationalPack.semiJoin(spark, sf0001)).contains("LeftSemi"))
    assert(plan(RelationalPack.antiJoin(spark, sf0001)).contains("LeftAnti"))
  }

  test("V2 connector range read: ts predicate derives partition AND pushed filters") {
    val p = plan(TimeSeriesPack.v2Roundtrip(spark, sf0001))
    // connector-derived day pruning (p_date never appears in the query)
    assert(p.contains("PartitionFilters: [(p_date"), p)
    // and the ts bound reaches the parquet row-group level (INT64 micros
    // encoding — INT96 would silently drop these)
    assert("PushedFilters: \\[[^\\]]*ts".r.findFirstIn(p).nonEmpty,
      s"ts not pushed to parquet:\n$p")
  }

  test("corpus filter is narrow: the scan-rebalance round-robin plus the " +
      "determinism sort are the only exchanges (r22: the hash-bound gate " +
      "gets Compute.rebalance, a no-op at corpus scale)") {
    val p = plan(graft.operators.PipelinePack.corpusFilter(spark, sf0001))
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges == 2, s"expected rebalance + final sort, got $exchanges:\n$p")
    assert(p.contains("rangepartitioning"), p)
    assert(p.contains("RoundRobinPartitioning"), p)
    // the gate itself stays shuffle-free: no hash exchange anywhere
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("stratified sampling/packing: one stratum-window shuffle plus the sort") {
    for (q <- Seq(graft.operators.PipelinePack.sampleStratified(spark, sf0001),
      graft.operators.PipelinePack.packSequences(spark, sf0001))) {
      val p = plan(q)
      val exchanges = "Exchange ".r.findAllIn(p).length
      assert(exchanges == 2, s"expected window + sort exchanges, got $exchanges:\n$p")
      assert(p.contains("hashpartitioning(lang"), p)
    }
  }

  test("pivot reads the input once; both stacked aggregations combine map-side") {
    val p = plan(graft.operators.StatsPack.pivot(spark, sf0001))
    // explicit value list → no values-discovery job, ONE scan feeding the
    // standard two-level plan: (day, type) count, then pivotfirst over day —
    // each with a partial stage, so shuffles carry per-group state only
    assert("FileScan".r.findAllIn(p).length == 1, s"expected one scan:\n$p")
    assert(p.contains("partial_count"), p)
    assert(p.contains("partial_pivotfirst"), p)
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges == 3, s"expected 2 agg + 1 sort exchanges, got $exchanges:\n$p")
  }

  test("cube/rollup plan a single Expand + one aggregation, dims broadcast") {
    for (q <- Seq(RelationalPack.aggCube(spark, sf0001),
        RelationalPack.aggRollup(spark, sf0001),
        RelationalPack.aggGroupingSets(spark, sf0001))) {
      val p = plan(q)
      assert("Expand".r.findAllIn(p).length == 1, s"expected one Expand:\n$p")
      assert(p.contains("BroadcastHashJoin"), p)
    }
  }

  test("moment-stats aggregate partially before the 3-group shuffle") {
    val p = plan(graft.operators.StatsPack.statsCorr(spark, sf0001))
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("knn join: probes broadcast, corpus side never exchange-partitioned before scoring") {
    val emb = Tables.embeddings(spark, sf0001)
    val p = plan(graft.operators.SimilaritySearch.knnJoin(
      emb, emb.where(org.apache.spark.sql.functions.col("vec_id") < 4),
      idCol = "vec_id", vecCol = "embedding", k = 3))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // allowed exchanges: the gated compute REBALANCE (round-robin, no key —
    // fires only on under-parallelized scans, never hash-partitions the
    // corpus), the probes×k-bounded aggregate, and the final sort
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges <= 4, s"too many exchanges ($exchanges):\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 1,
      s"corpus must not be key-partitioned before scoring ($hashEx):\n$p")
  }

  test("chunking is map-only: the only exchange is the determinism sort") {
    val p = plan(graft.operators.PipelinePack.chunkOverlap(spark, sf0001))
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges <= 1, s"chunkOverlap should be narrow before the sort:\n$p")
    assert(p.contains("Generate"), p) // the in-row chunk-index explode
  }

  test("LSH knn join: probes broadcast with their keys, corpus never exchanges before scoring") {
    val emb = Tables.embeddings(spark, sf0001)
    val p = plan(graft.operators.SimilaritySearch.knnJoinLsh(
      emb, emb.where(org.apache.spark.sql.functions.col("vec_id") < 4),
      idCol = "vec_id", vecCol = "embedding", k = 3, dim = 64))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("graft_hyperplane"), s"bucket keys not in plan:\n$p")
    // same exchange budget as the exact knn join: k-bounded agg + final sort
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges <= 3, s"too many exchanges ($exchanges):\n$p")
  }

  test("simhash dedup: fingerprints are a pure scan (native kernel), candidates an equi-join") {
    val p = plan(graft.operators.NearDedup.simhashMd5Pairs(
      Tables.documents(spark, sf0001), "doc_id", "text"))
    // stage 1 is the SimHashMd5 kernel in a projection — no explode, no
    // aggregate, no exchange before banding
    assert(p.contains("graft_simhash_md5"), s"kernel not in plan:\n$p")
    assert(!p.contains("partial_sum"), s"unexpected aggregate in stage 1:\n$p")
    // candidate generation is an equi-join on (band, slice) — never cartesian
    assert(!p.contains("CartesianProduct"), p)
  }

  test("minhash dedup: signatures are a per-row kernel — no explode, no " +
      "doc-keyed exchange before the band join") {
    val p = plan(graft.operators.NearDedup.minhashLsh(
      Tables.documents(spark, sf0001).withColumn("part",
        org.apache.spark.sql.functions.lit(0)),
      idCol = "doc_id", textCol = "text", partCol = "part", tau = 0.5))
    assert(p.contains("graft_minhash_row"), s"row kernel not in plan:\n$p")
    // the old formulation exploded shingles and regrouped per doc — that
    // aggregate (and its exchange) must be gone
    assert(!p.contains("graft_minhash("), s"aggregate signature form back:\n$p")
    assert(!p.contains("Generate explode(sh"),
      s"shingle explode back in the signature stage:\n$p")
  }

  test("dedup canonical: the corpus prune is a BROADCAST anti-join (the " +
      "bounded loser list moves, the corpus never shuffles)") {
    val p = plan(graft.operators.LlmPack.dedupCanonical(spark, sf0001))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"corpus prune is not a broadcast anti-join:\n$p")
  }

  test("dedup canonical prune gate: a loser list over the ceiling plans a " +
      "SHUFFLED anti-join (no forced broadcast, no driver collect)") {
    // Force the "corpus-proportional loser list" branch: gate ceiling 0 so
    // ANY loser count exceeds it, and planner auto-broadcast off so the
    // assertion sees the shape the gate chose, not a size-stats rescue
    // (at real scale the loser frame has no size stats to rescue it).
    val conf = spark.conf
    val prevAuto = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.graft.dedup.maxBroadcastLosers", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (df <- Seq(graft.operators.LlmPack.dedupCanonical(spark, sf0001),
          graft.operators.PipelinePack.corpusPruned(spark, sf0001))) {
        val p = plan(df)
        assert(p.contains("SortMergeJoin") && p.contains("LeftAnti"),
          s"over-ceiling losers should shuffle the anti-join:\n$p")
        val antiLines = p.split("\n").filter(_.contains("LeftAnti"))
        assert(antiLines.nonEmpty && antiLines.forall(!_.contains("Broadcast")),
          s"anti-join still broadcasts over the ceiling:\n$p")
      }
    } finally {
      conf.unset("spark.graft.dedup.maxBroadcastLosers")
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("pii redact is narrow: one scan, the only exchange is the determinism sort") {
    val p = plan(graft.operators.PipelinePack.piiRedact(spark, sf0001))
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange (final sort), got $exchanges:\n$p")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
  }

  test("source mix: one bounded aggregate, total re-enters as a broadcast") {
    val p = plan(graft.operators.PipelinePack.sourceMix(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"normalizing total not broadcast:\n$p")
    assert(p.contains("partial_count"), p) // map-side combine on the agg
  }

  test("corpus build composite: losers broadcast-anti on the pruned stage; " +
      "final stage is the distributed sampler, NOT a per-language window") {
    // Stage shape up to the sampler: quality predicates fused into the
    // scan, losers entering as a (gated, here broadcast) anti-join.
    val pp = plan(graft.operators.PipelinePack.corpusPruned(spark, sf0001))
    assert(pp.contains("BroadcastHashJoin") && pp.contains("LeftAnti"),
      s"dedup losers not a broadcast anti-join:\n$pp")
    // The composite's sampling stage is the two-phase distributed sampler:
    // its eager checkpoint means the composite's visible plan is a
    // LogicalRDD + determinism sort — crucially with NO stratum-keyed
    // row_number window (the shape that serialized a dominant language
    // into one task at 100×).
    val df = graft.operators.PipelinePack.corpusBuild(spark, sf0001)
    val p = plan(df)
    assert(!p.contains("row_number"), s"stratum-serializing window is back:\n$p")
    assert(p.contains("rangepartitioning"), s"no determinism sort:\n$p")
    assert(df.count() > 0)
  }

  test("shard/dedup balance reports: map-side-combined aggregates, no joins") {
    val p1 = plan(graft.operators.PipelinePack.shardAssign(spark, sf0001))
    assert(p1.contains("partial_count") && !p1.contains("Join"), p1)
    val p2 = plan(graft.operators.LlmPack.dedupStats(spark, sf0001))
    assert(p2.contains("partial_count") && !p2.contains("Join"), p2)
  }

  test("decontaminate: benchmark set broadcasts; training side aggregates map-side") {
    val p = plan(graft.operators.PipelinePack.decontaminate(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$p")
    assert(p.contains("partial_count"), p)
  }

  test("hard negatives: probes broadcast, label backfill broadcasts the result — corpus never shuffles") {
    val p = plan(graft.operators.LlmPack.hardNegativesQ(spark, sf0001))
    // both joins (scoring and label backfill) broadcast their small side
    val bcasts = "Broadcast(NestedLoop|Hash)Join".r.findAllIn(p).length
    assert(bcasts >= 2, s"expected two broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side shuffle join:\n$p")
  }

  test("lm score: vocab and total re-enter as broadcasts, aggregates combine map-side") {
    val p = plan(graft.operators.LlmPack.lmScore(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"vocab side not broadcast:\n$p")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("SortMergeJoin"), s"doc side shuffled for the vocab join:\n$p")
  }

  test("mutual kNN: the self-join shuffles the k·N edge list, never vectors") {
    val emb = Tables.embeddings(spark, sf0001)
    val edges = graft.operators.SimilaritySearch.knnJoin(
      emb, emb.where(org.apache.spark.sql.functions.col("vec_id") < 4),
      idCol = "vec_id", vecCol = "embedding", k = 3)
    val p = plan(graft.operators.SimilaritySearch.mutualKnn(edges))
    // the mutual join runs on (a_id, b_id) pairs: no vector column survives
    // into either exchange feeding it
    assert(!"Exchange hashpartitioning[^\\n]*embedding".r.findFirstIn(p).isDefined,
      s"vectors shuffled into the mutual join:\n$p")
  }

  test("global shuffle: windows partition by shard — no single-task global sort before positions") {
    val p = plan(graft.operators.PipelinePack.shuffleGlobal(spark, sf0001))
    assert(p.contains("hashpartitioning(shard"),
      s"window not partitioned by shard:\n$p")
    assert(!p.contains("SinglePartition"), s"global single-task stage:\n$p")
  }

  test("ngram top-k plans TakeOrderedAndProject over a combined aggregate") {
    val p = plan(graft.operators.PipelinePack.ngramTopk(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_count"), p)
  }

  test("interval overlap: bucket equi-join, never a nested-loop/cartesian interval join") {
    val p = plan(graft.operators.EventAnalyticsPack.intervalOverlap(spark, sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to nested loop:\n$p")
    assert(p.contains("bucket"), s"bucket key missing from the join:\n$p")
    // the overlap predicate must be a post-join filter on an EQUI-join —
    // SMJ or (broadcast|shuffled) hash join keyed on the bucket
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"),
      s"no equi-join on the bucket key:\n$p")
  }

  test("event transitions: one user_id exchange; matrix aggregate combines map-side") {
    val p = plan(graft.operators.EventAnalyticsPack.eventTransitions(spark, sf0001))
    assert(p.contains("hashpartitioning(user_id"), p)
    assert(p.contains("partial_count"),
      s"transition counts must partial-aggregate map-side:\n$p")
    assert(!p.contains("Join"), s"transitions needs no join:\n$p")
  }

  test("pca power step: no join, corpus never shuffles — only dim-keyed aggregate state") {
    val p = plan(graft.operators.LlmPack.embedPcaPower(spark, sf0001))
    assert(!p.contains("Join"), s"pca needs no join:\n$p")
    assert(p.contains("hashpartitioning(dim"),
      s"per-dim partial sums must combine map-side on dim:\n$p")
    assert(p.contains("partial_sum"), p)
    // the whole-corpus vector column must not be exchange payload: the only
    // exchanges are dim-keyed state and the 64-row normalization/sort
    assert(!p.matches("(?s).*Exchange hashpartitioning\\(vec_id.*"),
      s"corpus rows exchanged:\n$p")
  }

  test("text normalize is map-only: no exchange but the determinism sort") {
    val p = plan(graft.operators.LlmPack.textNormalize(spark, sf0001))
    assert(!p.contains("Exchange hashpartitioning"),
      s"normalize must not shuffle:\n$p")
    assert(p.contains("graft_nfc"), s"native kernel missing:\n$p")
  }

  test("rolling median: one user_id window exchange, frame-bounded state") {
    val p = plan(graft.operators.StatsPack.windowMedian(spark, sf0001))
    assert(p.contains("hashpartitioning(user_id"), p)
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges == 2, s"expected user_id + sort exchanges, got $exchanges:\n$p")
  }

  test("numeric profile: ONE scan, melt pipelined into the aggregate, single " +
      "distinct (no Expand replication of the scan)") {
    val p = plan(graft.operators.StatsPack.profileNumeric(spark, sf0001))
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"profile re-reads the table:\n$p")
    // r21 shape: stack() melts in a Generate that pipelines into the
    // partial aggregate; the single countDistinct plans as the two-level
    // (col_name, v)-keyed dedup aggregate — NO 5-way Expand replica of
    // the scan (the pre-r21 24-wide-aggregate form's cost), no join.
    assert(p.contains("Generate stack"), s"melt missing:\n$p")
    assert(!p.contains("Expand"), s"Expand replication is back:\n$p")
    assert(p.contains("partial_count"),
      s"aggregate must combine map-side:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("event paths: one user_id exchange feeds both leads; triple counts combine map-side") {
    val p = plan(graft.operators.EventAnalyticsPack.eventPaths(spark, sf0001))
    assert(p.contains("hashpartitioning(user_id"), p)
    assert("hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      s"window should exchange user_id exactly once:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
  }

  test("span dedup: no window over the span key; count join comes pre-combined") {
    val p = plan(graft.operators.LlmPack.spanDedup(spark, sf0001))
    assert(!p.contains("Window"),
      s"a window over the span key would serialize hot spans:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the >1-multiplicity filter must sit on an aggregate (map-side
    // combined), not re-scan the exploded stream
    assert(p.contains("HashAggregate"), p)
  }

  test("stats xcorr: the global hourly series broadcasts; the corpus never shuffles on a data key") {
    val p = plan(graft.operators.StatsPack.statsXcorr(spark, sf0001))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the <=#hours global series must broadcast to the user grid:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the hour join must never shuffle both sides:\n$p")
  }

  test("decontaminate embed: the benchmark side broadcasts; the corpus side never shuffles") {
    val p = plan(graft.operators.LlmPack.decontaminateEmbed(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the benchmark vectors must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the cosine gate must never shuffle the corpus:\n$p")
  }

  test("window drawdown: one user_id exchange feeds equity, peak, and the argmax; no join") {
    val p = plan(graft.operators.TimeSeriesPack.windowDrawdown(spark, sf0001))
    assert("hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      s"equity/peak/argmax should share one user_id exchange:\n$p")
    assert(!p.contains("Join"),
      s"the curve derives from windows, not a self-join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("window hampel: one user_id exchange feeds the whole frame compute; no join") {
    val p = plan(graft.operators.StatsPack.windowHampel(spark, sf0001))
    assert("hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      s"the trailing frame should exchange user_id exactly once:\n$p")
    assert(!p.contains("Join"),
      s"med and mad must derive from ONE collected frame, not a self-join:\n$p")
  }

  test("percentiles approx: sketch state is map-side combined (partial aggregate)") {
    val p = plan(graft.operators.StatsPack.percentilesApprox(spark, sf0001))
    assert(p.contains("partial_percentile_approx") || p.contains("partial_"),
      s"approx percentile must combine map-side:\n$p")
    // exact percentiles cannot partial-combine their buffered groups the
    // same way — the approx twin's whole point is this plan property
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1, p)
  }

  test("graph family reads the amortized edge store — no per-query N×P rescoring") {
    for (df <- Seq(graft.operators.LlmPack.knnMutual(spark, sf0001),
        graft.operators.LlmPack.graphPagerank(spark, sf0001),
        graft.operators.LlmPack.graphTriangles(spark, sf0001))) {
      val p = plan(df)
      assert(p.contains("graft_knnedges_"),
        s"edge-store scan missing — query recomputes the kNN pass:\n$p")
      assert(!p.toLowerCase.contains("graft_dot") && !p.contains("l2norm"),
        s"vector scoring re-entered a graph query:\n$p")
    }
  }

  test("ts history is metadata-only: a local scan, no Spark jobs over data") {
    val p = plan(graft.operators.TimeSeriesPack.tsHistory(spark, sf0001))
    assert(p.contains("LocalTableScan"),
      s"history should come from the driver-read manifests:\n$p")
    assert(!p.contains("FileScan"),
      s"history must not scan table data:\n$p")
  }

  test("span strip (containment pre-pass): window-free, no cartesian; " +
      "the multiplicity gate sits on an aggregate") {
    val p = plan(graft.operators.NearDedup.stripRepeatedSpans(
      Tables.documents(spark, sf0001), "doc_id", "text", "lang"))
    assert(!p.contains("Window"),
      s"a window over the span key would serialize hot spans:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("anomaly MAD gate, under ceiling: med/MAD summaries broadcast back — " +
      "events never shuffle for the joins") {
    val p = plan(graft.operators.StatsPack.anomalyMad(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"med/MAD joins must broadcast the users-bounded side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"events must not shuffle into a merge join:\n$p")
  }

  test("anomaly MAD gate, over ceiling: per-user summaries plan SHUFFLED " +
      "joins (no forced broadcast of an entity-proportional table)") {
    // Force the "billions of users" branch: ceiling 0 so any user count
    // exceeds it, planner auto-broadcast off so the assertion sees the
    // shape the gate chose (at real scale the summary has no size stats).
    val conf = spark.conf
    val prevAuto = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.graft.stats.maxBroadcastGroups", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(graft.operators.StatsPack.anomalyMad(spark, sf0001))
      assert(p.contains("SortMergeJoin"),
        s"over-ceiling user summaries should shuffle the joins:\n$p")
      assert(!p.contains("BroadcastHashJoin"),
        s"a join still broadcasts over the ceiling:\n$p")
    } finally {
      conf.unset("spark.graft.stats.maxBroadcastGroups")
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("incremental dedup: probe side is filtered to the new batch; no cartesian") {
    // bypass the materialized-pairs facade so the real pipeline plan shows
    val p = plan(graft.operators.NearDedup.minhashLshIncremental(
      Tables.documents(spark, sf0001).withColumn("is_new",
        org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.md5(
            org.apache.spark.sql.functions.col("doc_id").cast("string")), 1, 1) < "3"),
      idCol = "doc_id", textCol = "text", partCol = "lang",
      newCol = "is_new", tau = 0.8, materialize = Some(false)))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("is_new"),
      s"the probe-side new-batch filter is missing from the plan:\n$p")
    // signatures stay the per-row kernel here too
    assert(p.contains("graft_minhash_row"), s"row kernel not in plan:\n$p")
  }

  test("quality deciles: boundaries broadcast back; no ntile window, no global pre-sort") {
    val p = plan(graft.operators.LlmPack.qualityDeciles(spark, sf0001))
    assert(!p.contains("Window"),
      s"ntile-style global window would single-task the corpus:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row boundary aggregate must broadcast:\n$p")
    // exactly one Sort: the final determinism orderBy
    assert("Sort \\[".r.findAllIn(p).length == 1, s"extra sort:\n$p")
  }

  test("corpus diff: one full-outer equi-join over map-side digests, no cartesian") {
    val p = plan(graft.operators.PipelinePack.corpusDiff(spark, sf0001))
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("md5".r.findAllIn(p).length >= 2,
      s"both sides must reduce to digests before the join:\n$p")
  }

  test("sessionize, event gaps, scd2: ONE user_id exchange each — window " +
      "partitioning is reused by the downstream pass") {
    for ((name, df) <- Seq(
        "sessionize" -> graft.operators.EventAnalyticsPack.sessionize(spark, sf0001),
        "eventGaps" -> graft.operators.EventAnalyticsPack.eventGaps(spark, sf0001),
        "scd2" -> graft.operators.EventAnalyticsPack.scd2(spark, sf0001))) {
      val p = plan(df)
      assert("hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
        s"$name should exchange user_id exactly once:\n$p")
    }
  }

  test("scd2: the post-filter run windows add no exchange and no new sort") {
    val p = plan(graft.operators.EventAnalyticsPack.scd2(spark, sf0001))
    // one user_id hash exchange + the final determinism range sort — the
    // run-start lead()s ride the per-event window's partitioning and order
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 exchanges (window + final sort), got $exchanges:\n$p")
    // exactly one (ts, event_id) sort feeds both window passes
    assert("Sort \\[user_id[^\\n]*ts".r.findAllIn(p).length == 1,
      s"the run-start window must reuse the per-event sort:\n$p")
  }

  test("ngram pmi: unigram table and totals re-enter as broadcasts — " +
      "the corpus never shuffle-joins on a token key") {
    val p = plan(graft.operators.PipelinePack.ngramPmi(spark, sf0001))
    assert("BroadcastExchange".r.findAllIn(p).length >= 3,
      s"unigram sides + totals must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a token-keyed shuffle join defeats the broadcast plan:\n$p")
  }

  test("containment: candidate generation is an equi-join on the shingle key, never cartesian") {
    val p = plan(graft.operators.LlmPack.dedupContain(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"containment candidates must equi-join on the prefix shingle:\n$p")
  }

  test("time features: one fixed-size aggregation, no window, no join") {
    val p = plan(graft.operators.EventAnalyticsPack.timeFeatures(spark, sf0001))
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("unpivot: the melt is an Expand over the aggregate, no extra exchange") {
    val p = plan(graft.operators.StatsPack.unpivotLong(spark, sf0001))
    assert(p.contains("Expand"), p)
    // Spark's pivot plans two aggregate exchanges ((day, type) pre-agg +
    // day pivotfirst); + the final sort. The melt itself adds ZERO — the
    // same count q_pivot pays for the wide form alone.
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges == 3, s"expected 3 exchanges, got $exchanges:\n$p")
    val pivotP = plan(graft.operators.StatsPack.pivot(spark, sf0001))
    assert("Exchange ".r.findAllIn(pivotP).length == exchanges,
      s"melt must not add exchanges over the wide pivot:\n$p")
  }

  test("stats_acf: all three lags off ONE user exchange; the (user, lag) " +
      "aggregate is map-side combined") {
    val p = plan(graft.operators.StatsPack.statsAcf(spark, sf0001))
    assert(!p.contains("Join"), s"ACF needs no join:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 2, // window(user) + agg(user, lag)
      s"expected ≤2 hash exchanges (window + final agg), got $hashEx:\n$p")
    assert(p.contains("partial_"), s"no map-side combine on the agg:\n$p")
    // one Window covers all three lag companions
    assert("Window ".r.findAllIn(p).length == 1, s"expected one window:\n$p")
  }

  test("stats_trend: the window min(ts) and the OLS aggregate share ONE " +
      "user exchange; no join") {
    val p = plan(graft.operators.StatsPack.statsTrend(spark, sf0001))
    assert(!p.contains("Join"), s"per-series OLS needs no join:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, // window(user); groupBy(user) reuses the partitioning
      s"expected exactly one user_id exchange, got $hashEx:\n$p")
    assert(p.contains("partial_"), s"no map-side combine on the agg:\n$p")
  }

  test("attribution: both last-touch passes ride ONE user window on one " +
      "exchange; no join, purchase filter downstream") {
    val p = plan(graft.operators.EventAnalyticsPack.attribution(spark, sf0001))
    assert(!p.contains("Join"), s"last-touch attribution needs no join:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected exactly one user_id exchange, got $hashEx:\n$p")
    assert("Window ".r.findAllIn(p).length == 1,
      s"both IGNORE-NULLS passes must share one Window:\n$p")
  }

  test("dedup_semantic: the pair search is EQUI-KEYED on the k-means " +
      "cluster — no cartesian, no broadcast-nested-loop corpus square") {
    val p = plan(graft.operators.LlmPack.dedupSemantic(spark, sf0001))
    assert(!p.contains("CartesianProduct"), s"cartesian in SemDeDup:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop corpus square in SemDeDup:\n$p")
    assert(p.contains("cluster"), p)
  }

  test("split_leakage_safe: one content-hash exchange, no join, no cartesian") {
    val p = plan(graft.operators.StatsPack.splitLeakageSafe(spark, sf0001))
    assert(!p.contains("Join"), s"the exact-dup gate needs no join:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected exactly the ck window exchange, got $hashEx:\n$p")
  }

  test("downsample_lttb: the neighbor-stats side broadcasts; no wide join, " +
      "bounded exchanges") {
    val df = graft.operators.TimeSeriesPack.downsampleLttb(spark, sf0001)
    df.collect() // let AQE finalize the join strategy
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"per-(user,bucket) stats (users × 12 rows) must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no wide join belongs here:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 4, // rank window, bucket agg, neighbor window, selection
      s"expected ≤4 hash exchanges, got $hashEx:\n$p")
  }

  test("executed plans run inside whole-stage codegen (AQE final plans)") {
    // AQE shows codegen stages only once the final plan materializes, so
    // execute first; a representative read, agg and join query each.
    Seq("q_filter_project", "q_agg_pricing_summary", "q_join_broadcast")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sf0001)
        df.collect() // count() would execute a DIFFERENT (re-planned) query
        val p = plan(df)
        // '*(n)' prefixes mark operators fused into a WholeStageCodegen stage
        assert(p.contains("*(1)"), s"$name has no codegen stage:\n$p")
      }
  }
}
