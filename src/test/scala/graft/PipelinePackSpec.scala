package graft

import graft.operators.PipelinePack
import org.apache.spark.sql.functions._

/** Corpus-construction operators: sampling spacing/rates, filter-chain
  * composition, packing invariants. */
class PipelinePackSpec extends SparkSpec {

  test("stratified systematic sampling: exact per-stratum spacing and rate") {
    val out = PipelinePack.sampleStratified(spark, sf001)
    val docs = Tables.documents(spark, sf001)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every stratum sampled at ceil(n/k) exactly (ranks 1, k+1, 2k+1, ...)
    val every = Map("en" -> 2, "de" -> 3, "es" -> 3, "fr" -> 4, "zh" -> 5)
    for ((lang, n) <- perLang) {
      val k = every.getOrElse(lang, 4)
      assert(sampled.getOrElse(lang, 0L) == (n + k - 1) / k,
        s"$lang: ${sampled.get(lang)} of $n at 1/$k")
    }
    // deterministic across plans
    assert(out.collect().toSeq == PipelinePack.sampleStratified(spark, sf001).collect().toSeq)
  }

  test("hash sampler: deterministic, rate within tolerance, no shuffle") {
    val docs = Tables.documents(spark, sf001)
    val s1 = PipelinePack.hashSample(docs, "doc_id", 0.3)
    val n = s1.count().toDouble / docs.count()
    assert(n > 0.2 && n < 0.4, s"empirical rate $n for 0.3")
    assert(s1.collect().length == PipelinePack.hashSample(docs, "doc_id", 0.3).count())
    // narrow plan: no exchange anywhere
    assert(!s1.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("decontaminate: exactly the docs sharing a shingle with the benchmark, broadcast plan") {
    val out = PipelinePack.decontaminate(spark, sf0001)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side truth over the same shingle sets
    val sets = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.TextFns.shingles3(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val bench = sets.collect { case (id, sh) if id % 50 == 0 => sh }
      .foldLeft(Set.empty[String])(_ ++ _)
    val truth = sets.collect {
      case (id, sh) if id % 50 != 0 && (sh & bench).nonEmpty => id -> (sh & bench).size.toLong
    }
    assert(got == truth, s"missing=${truth.keySet -- got.keySet} extra=${got.keySet -- truth.keySet}")
    assert(got.nonEmpty, "fixture should contain contaminated docs")
    // 100 TB shape: the benchmark set enters as a broadcast, never a shuffle
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      s"benchmark side not broadcast:\n${out.queryExecution.executedPlan}")
  }

  test("ngramTopk equals the brute-force bigram count") {
    val got = PipelinePack.ngramTopk(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val counts = Tables.documents(spark, sf0001).select(col("text")).collect()
      .map(_.getString(0)).flatMap { t =>
        val tk = t.trim.split("\\s+"); tk.zip(tk.drop(1)).map { case (a, b) => s"$a $b" }
      }
      .groupBy(identity).map { case (bg, o) => bg -> o.length.toLong }
    val truth = counts.toSeq.sortBy { case (bg, n) => (-n, bg) }.take(20)
    assert(got == truth)
  }

  test("corpus filter: survivors satisfy every gate; non-trivial pass rate") {
    val out = PipelinePack.corpusFilter(spark, sf001).collect()
    assert(out.nonEmpty, "filter chain rejected the whole fixture")
    assert(out.length < 500, "filter chain rejected nothing")
    out.foreach { r =>
      val nTok = r.getInt(2)
      assert(nTok >= 8 && nTok <= 2000)
      assert(r.getDouble(3) >= 0.3) // uniq_ratio
      assert(r.getDouble(4) >= 2.0 && r.getDouble(4) <= 14.0) // avg_tok_len
      assert(r.getDouble(5) <= 0.6) // dup_frac
    }
  }

  test("sequence packing: offsets are a contiguous token layout per stratum") {
    val rows = PipelinePack.packSequences(spark, sf001)
      .orderBy("lang", "doc_id").collect()
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      var expected = 0L
      rs.foreach { r =>
        assert(r.getLong(3) == expected, s"$lang doc ${r.getLong(0)} offset")
        assert(r.getLong(4) == expected / 2048) // seq_no = chunk of start
        expected += r.getLong(2)
      }
    }
  }
}
