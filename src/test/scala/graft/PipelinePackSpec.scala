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

  test("weighted mixture sampling: per-lang rates ordered by weight, pure narrow plan") {
    val out = PipelinePack.sampleWeighted(spark, sf001)
    val docs = Tables.documents(spark, sf001)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    def rate(l: String) = kept(l).toDouble / perLang(l)
    // empirical rates honor the configured ordering en > es > de > fr ≥ zh
    assert(rate("en") > rate("es") && rate("es") > rate("de") &&
      rate("de") > rate("fr") && rate("fr") >= rate("zh"),
      s"rates: ${Seq("en", "es", "de", "fr", "zh").map(l => l -> rate(l))}")
    assert(rate("en") > 0.75 && rate("zh") < 0.25)
    // deterministic and shuffle-free (filter only — the sort is the output's)
    assert(out.collect().toSeq == PipelinePack.sampleWeighted(spark, sf001).collect().toSeq)
    val filterOnly = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("lang"))
      .where(substring(md5(col("doc_id").cast("string")), 1, 4) < lit("e666"))
    assert(!filterOnly.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("capPerSource: never more than k per source, ranked like the window formulation") {
    val out = PipelinePack.capPerSource(spark, sf001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val perSource = out.groupBy(_._1)
    assert(perSource.values.forall(_.length <= 10))
    assert(perSource.values.forall(g => g.map(_._2).sorted.toSeq == (1 to g.length)))
    // heap ranks equal the row_number() formulation (ties → smaller doc_id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("score").desc, col("doc_id"))
    val tk = graft.functions.TextFns.tokens(col("text"))
    val windowed = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"),
        size(tk).as("n_tokens"), size(array_distinct(tk)).as("n_uniq"),
        size(filter(tk, t => t.isin("a", "the"))).as("n_stop"))
      .select(col("doc_id"), col("source"),
        (lit(0.4) * (col("n_uniq").cast("double") / col("n_tokens")) +
          lit(0.3) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) +
          lit(0.3) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)))
          .as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 10)
      .collect().map(r => (r.getString(1), r.getInt(3), r.getLong(0))).toSet
    assert(out.toSet == windowed)
    // scale shape: partial graft_topk heaps collapse map-side before the shuffle
    val plan = PipelinePack.capPerSource(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"), plan)
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

  test("decontaminateBloom: superset of the exact hits with bounded FP inflation, " +
      "no join on the training side") {
    val exact = PipelinePack.decontaminate(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = PipelinePack.decontaminateBloom(spark, sf0001)
    val bloom = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives: every exact hit survives with AT LEAST its count
    exact.foreach { case (id, n) =>
      assert(bloom.getOrElse(id, 0L) >= n, s"doc $id lost hits: ${bloom.get(id)} < $n")
    }
    // bounded false positives: at fpp ~5e-4 the total inflation stays tiny
    val extra = bloom.values.sum - exact.values.sum
    assert(extra <= math.max(2L, exact.values.sum / 10),
      s"FP inflation $extra over ${exact.values.sum} exact hits")
    // scale shape: the training side is filtered in-scan via the scalar-
    // subquery Bloom probe — NO join anywhere in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }

  test("decontaminateOverlap: exactly the exact-decontaminate docs at overlap >= tau, " +
      "fraction consistent with the per-doc shingle count") {
    val exact = PipelinePack.decontaminate(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nSh = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(graft.functions.TextFns.shingles3(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val truth = exact.collect {
      case (id, hits) if hits.toDouble / nSh(id) >= 0.08 => id -> hits
    }
    val got = PipelinePack.decontaminateOverlap(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(truth.nonEmpty, "fixture should contain high-overlap docs")
    assert(got.map(r => r._1 -> r._3).toMap == truth,
      s"flag set mismatch: got=${got.map(_._1).toSet} want=${truth.keySet}")
    got.foreach { case (id, n, hits, overlap) =>
      assert(n == nSh(id), s"doc $id denominator $n != ${nSh(id)}")
      assert(math.abs(overlap - hits.toDouble / n) < 1e-6)
      assert(overlap >= 0.08 - 1e-9)
    }
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

  test("distributed systematic sampling == window sampling row-for-row " +
      "at a partition count that splits languages mid-stream") {
    val viaWindow = PipelinePack.sampleStratified(spark, sf001)
      .orderBy("doc_id").collect().toSeq
    val viaPrefix = PipelinePack.sampleStratifiedDistributed(
        Tables.documents(spark, sf001), "doc_id", "lang", "n_chars",
        numPartitions = 11)
      .orderBy("doc_id").collect().toSeq
    assert(viaPrefix == viaWindow)
    assert(viaPrefix.nonEmpty)
  }

  test("distributed prefix-sum packing == window packing row-for-row; plan " +
      "has no Window and no per-stratum single-task exchange") {
    val viaWindow = PipelinePack.packSequences(spark, sf001)
      .orderBy("doc_id").collect().toSeq
    // a partition count that forces mid-language splits (5 langs, 12 parts)
    val (dist, free) = PipelinePack.packSequencesPlanned(
      Tables.documents(spark, sf001), "doc_id", "lang", "text",
      numPartitions = 12)
    try {
      val viaPrefix = dist.orderBy("doc_id").collect().toSeq
      assert(viaPrefix == viaWindow)
      // the scale property itself: no Window operator anywhere, the corpus
      // exchange is the range repartition (parallelism = numPartitions,
      // not languages)
      val p = dist.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"window leaked into the prefix-sum plan:\n$p")
      assert(p.contains("rangepartitioning(lang"), s"no range repartition:\n$p")
      assert(dist.rdd.getNumPartitions == 12, s"${dist.rdd.getNumPartitions}")
    } finally free()
  }

  test("chunkOverlap: stride layout covers every token, chunk content matches slices") {
    import graft.functions.TextFns
    val (c, s) = (64, 48)
    val chunks = PipelinePack.chunkOverlap(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = chunks.groupBy(_._1)
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rs) =>
      val toks = docs(id)
      val n = toks.length
      // chunk ids are 0..floor((n-1)/stride), so strides cover every token
      assert(rs.map(_._2).sorted.toSeq == (0L to ((n - 1) / s).toLong))
      rs.foreach { case (_, i, len, md5Hex) =>
        val want = toks.slice((i * s).toInt, (i * s).toInt + c)
        assert(len == want.length) // full windows except the tail
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(want.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(md5Hex == digest, s"doc $id chunk $i content mismatch")
      }
    }
    // consecutive full chunks overlap by exactly c - s tokens (by layout)
    assert(c - s == 16)
  }

  test("corpusDiff: statuses replay the md5-nibble snapshot windows exactly") {
    def nib(id: Long): Char = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "0123456789abcdef".charAt((d(0) >> 4) & 0xf)
    }
    val ids = Tables.documents(spark, sf0001)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = ids.flatMap { id =>
      val n = nib(id)
      val inA = n < 'e'
      val inB = n >= '2'
      if (!inA && !inB) None
      else Some(id -> (
        if (!inA) "added"
        else if (!inB) "removed"
        else if (n >= '8' && n < 'a') "modified"
        else "unchanged"))
    }.toMap
    val got = graft.operators.PipelinePack.corpusDiff(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected)
    // all four statuses must actually occur
    assert(got.values.toSet == Set("added", "removed", "modified", "unchanged"))
  }

  test("mixture weights: shares normalize and weight = target/actual exactly") {
    val rows = PipelinePack.mixtureWeights(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 20)
    // both share columns sum to 1 (up to per-row rounding)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4)
    // weight recomputed from raw integer sums, not the rounded shares
    val charsTotal = rows.map(_._3).sum.toDouble
    val tRaw = rows.map { case (s, _, _, _, _, _) =>
      s match { case "src0" => 8.0; case "src1" => 4.0; case "src17" => 2.0
        case _ => 1.0 } }
    val tTotal = tRaw.sum
    rows.zip(tRaw).foreach { case ((src, _, nChars, _, _, w), t) =>
      val expect = (t / tTotal) / (nChars / charsTotal)
      assert(math.abs(w - expect) < 1e-6, s"$src weight")
    }
    // targeted sources are up-weighted vs the uniform-ish actual mix
    assert(rows.find(_._1 == "src0").get._6 > rows.find(_._1 == "src5").get._6)
  }

  test("global shuffle: a permutation, contiguous per shard, seed-stable") {
    val out = PipelinePack.shuffleGlobal(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._1).toSet.size == 500) // every doc exactly once
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // deterministic: a second run yields the identical assignment
    val again = PipelinePack.shuffleGlobal(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
    // and it is not the identity order within shards (it actually shuffles)
    val someShard = out.groupBy(_._2).values.maxBy(_.length)
    val ids = someShard.sortBy(_._3).map(_._1).toSeq
    assert(ids != ids.sorted)
  }

  test("sampleBottomK: exactly the k smallest md5-prefix hashes per language, heap-planned") {
    val df = PipelinePack.sampleBottomK(spark, sf0001)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def h(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString, 16)
    val want = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      ds.map(d => (d._1, h(d._1))).sortBy(x => (x._2, x._1)).take(25)
        .zipWithIndex.map { case ((id, _), i) => (lang, i + 1L, id) }.toSeq
    }.toSet
    assert(got.toSet == want, s"sizes ${got.length}/${want.size}")
    // the k-bounded heap aggregate, not a row_number window
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_topk"), plan)
    assert(!plan.contains("Window"), s"window sampling defeats the heap plan:\n$plan")
  }

  test("ngramPmi: matches a driver-side recomputation of the PMI formula") {
    val out = PipelinePack.ngramPmi(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 20)
    val docs = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("text")).collect().map(_.getString(0))
    val toks = docs.flatMap(_.trim.split("\\s+"))
    val uni = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bgs = docs.flatMap(d => d.trim.split("\\s+").sliding(2).collect {
      case Array(a, b) => (a, b) })
    val bi = bgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (nUni, nBi) = (toks.length.toDouble, bgs.length.toDouble)
    out.foreach { case (w1, w2, c12, pmi) =>
      assert(c12 == bi((w1, w2)), s"count of ($w1,$w2)")
      assert(c12 >= 5L, "count floor")
      val exp = math.log((c12 / nBi) /
        ((uni(w1) / nUni) * (uni(w2) / nUni)))
      assert(math.abs(pmi - exp) < 1e-6, s"pmi($w1,$w2): $pmi vs $exp")
    }
    // descending pmi with (w1, w2) tiebreak
    assert(out.map(r => (-r._4, r._1, r._2)).toSeq ==
      out.map(r => (-r._4, r._1, r._2)).sorted.toSeq)
    // the 20th entry really is the cutoff: nothing below it qualifies higher
    val minPmi = out.map(_._4).min
    val better = bi.filter(_._2 >= 5L).count { case ((w1, w2), c) =>
      math.log((c / nBi) / ((uni(w1) / nUni) * (uni(w2) / nUni))) > minPmi + 1e-9 }
    assert(better <= 20, "top-20 must contain every strictly-better pair")
  }
}
