package graft
// Temporary measurement scaffold for the r21 optimization round — times
// isolated pipeline stages with the noop sink (guide §1.4). Not registered
// anywhere; deleted before the round closes.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.catalog.graft_ts", "graft.sources.GraftTsCatalog")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFns
    import graft.operators.{Compute, NearDedup}

    def settle(): Unit = { // the Bench settle barrier
      spark.sparkContext.parallelize(0 until cpus.toInt, cpus.toInt).count()
      System.gc(); Thread.sleep(100)
      spark.sparkContext.parallelize(0 until cpus.toInt, cpus.toInt).count()
    }
    def time(label: String)(df: => DataFrame): Unit = {
      // 1 warm (JIT/codegen) + min-of-3 with the settle barrier
      df.write.format("noop").mode("overwrite").save()
      val samples = (1 to 3).map { _ =>
        settle()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label%-40s min=${samples.min}%7.2fs " +
        f"samples=${samples.map(s => f"$s%.2f").mkString(",")}")
    }

    val docs = Tables.documents(spark, sfDir)

    // stage 1: tokenize only
    time("tokens") {
      docs.select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
    }
    // stage 2: shingles3 kernel
    time("shingles3") {
      docs.select(col("doc_id"), TextFns.shingles3(col("text")).as("sh"))
    }
    // stage 3: spanBase (tokens + positional md5 span keys, HOF transform)
    val spanWords = 5
    time("spanBase(transform+md5)") {
      Compute.rebalance(docs
        .select(col("doc_id").as("id"), col("lang").as("part"),
          col("text")))
        .withColumn("w", TextFns.tokens(col("text")))
        .withColumn("spans",
          when(size(col("w")) >= spanWords,
            transform(sequence(lit(0), size(col("w")) - spanWords),
              i => substring(md5(concat_ws(" ",
                slice(col("w"), i + 1, lit(spanWords)))), 1, 16)))
            .otherwise(array().cast("array<string>")))
        .select(col("id"), col("part"), col("spans"))
    }
    // stage 4: full strip (spanBase + multiplicity + covered + residual HOF)
    time("stripRepeatedSpans") {
      NearDedup.stripRepeatedSpans(docs, "doc_id", "text", "lang")
    }
    // stage 5: rankedByDf path alone (shingle + df + window) — via prefix where
    time("prefix(rankedByDf+bound)") {
      val sets = Compute.rebalance(docs
        .select(col("doc_id").as("id"), col("lang").as("part"), col("text")))
        .select(col("id"), col("part"), TextFns.shingles3(col("text")).as("sh"))
        .where(size(col("sh")) > 0)
      NearDedup.rankedByDf(sets, 1024)
    }
    // stage 6: whole prefixFilter (dedup_near core)
    time("prefixFilter(full)") {
      NearDedup.prefixFilter(docs, "doc_id", "text", "lang", 0.8,
        materialize = Some(true))
    }
    // stage 7: containmentPairs (dedup_contain core)
    time("containmentPairs(full)") {
      NearDedup.containmentPairs(docs, "doc_id", "text", "lang", 0.9,
        materialize = Some(true))
    }
    // stage 8: containmentPairsClean (dedup_contain_clean core)
    time("containmentPairsClean(full)") {
      NearDedup.containmentPairsClean(docs, "doc_id", "text", "lang", 0.9,
        materialize = Some(true))
    }
    // diagnostics: cardinalities inside prefixFilter
    val sets = docs.select(col("doc_id").as("id"), col("lang").as("part"),
        TextFns.shingles3(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
      .persist()
    println(s"[scratch] docs=${sets.count()}")
    val exploded = sets.select(col("id"), col("part"), size(col("sh")).as("n"),
      explode(col("sh")).as("sh"))
    println(s"[scratch] exploded rows=${exploded.count()}")
    println(s"[scratch] vocab=${exploded.select("sh").distinct().count()}")
    val ranked = NearDedup.rankedByDf(sets, 1024)
    val tau = 0.8
    val prefix = ranked
      .where(col("rn") <= col("n") - ceil(col("n") * lit(tau) - 1e-6) + 1)
      .select(col("id"), col("part"), col("n"), col("sh"))
    println(s"[scratch] prefix rows=${prefix.count()}")
    val a = prefix.select(col("id").as("a_id"), col("part"),
      col("n").as("a_n"), col("sh"))
    val b = prefix.select(col("id").as("b_id"), col("part").as("b_part"),
      col("n").as("b_n"), col("sh").as("b_sh"))
    val cand0 = a.join(b,
      col("sh") === col("b_sh") && col("part") === col("b_part") &&
        col("a_id") < col("b_id") &&
        col("b_n") >= ceil(col("a_n") * lit(tau) - 1e-6) &&
        col("b_n") <= floor(col("a_n") / lit(tau) + 1e-6))
    println(s"[scratch] candidates pre-distinct=${cand0.count()}")
    println(s"[scratch] candidates post-distinct=${cand0.select("a_id", "b_id").distinct().count()}")
    time("verify-only") {
      val candD = cand0.select(col("a_id"), col("b_id")).distinct()
      val aS = sets.select(col("id").as("a_id"), col("sh").as("a_sh"))
      val bS = sets.select(col("id").as("b_id"), col("sh").as("b_sh"))
      candD.join(aS, "a_id").join(bS, "b_id")
        .withColumn("jaccard", TextFns.jaccard(col("a_sh"), col("b_sh")))
        .where(col("jaccard") >= 0.8)
        .select(col("a_id"), col("b_id"), col("jaccard"))
    }
    time("rankedByDf-only(sets persisted)") { NearDedup.rankedByDf(sets, 1024) }
    // honest A/B: old collect+LocalRelation form vs new count+broadcast form
    val rnW = org.apache.spark.sql.functions.row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("df"), col("sh")))
    val dfAgg = exploded.select(col("sh")).groupBy("sh").agg(count(lit(1)).as("df"))
    time("rankedByDf-OLD(collect+local)") {
      val vocab = dfAgg.limit(500001).collect()
      val local = spark.createDataFrame(
        java.util.Arrays.asList(vocab: _*), dfAgg.schema)
      exploded.join(broadcast(local), "sh").withColumn("rn", rnW)
    }
    time("rankedByDf-NEW(count+broadcast)") {
      val n = dfAgg.limit(500001).count()
      require(n <= 500000)
      exploded.join(broadcast(dfAgg), "sh").withColumn("rn", rnW)
    }
    time("window-only(broadcast df agg)") {
      val df = exploded.select(col("sh")).groupBy("sh").agg(count(lit(1)).as("df"))
      val rn = org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("df"), col("sh")))
      exploded.join(broadcast(df), "sh").withColumn("rn", rn)
    }
    // plan evidence for the strip-stage kernel swap (the query keys'
    // executed plans are checkpoint-opaque): before = HOF formulation
    // (kept as NearDedup.{spanKeysHof,residualWordsHof}), after = the
    // production stripRepeatedSpans path with the native kernels.
    def dump(name: String, df: DataFrame): Unit = {
      val w = new java.io.PrintWriter(s"plans/r21/$name", "UTF-8")
      try w.write(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      finally w.close()
      println(s"[scratch] wrote plans/r21/$name")
    }
    val tokenized = docs
      .select(col("doc_id").as("id"), col("lang").as("part"),
        TextFns.tokens(col("text")).as("w"))
    val hofBase = tokenized.withColumn("spans",
      NearDedup.spanKeysHof(col("w"), 5))
    val hofOcc = hofBase.select(col("id"), posexplode(col("spans")).as(Seq("pos", "h")))
    val hofHot = hofOcc.groupBy(col("h")).agg(count(lit(1)).as("mult"))
      .where(col("mult") > 8).select(col("h"))
    val hofCovered = hofOcc.join(broadcast(hofHot), "h")
      .groupBy(col("id")).agg(collect_set(col("pos")).as("starts"))
    dump("strip_stage_before.txt", hofBase.join(hofCovered, Seq("id"), "left")
      .withColumn("starts", coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("clean_text",
        NearDedup.residualWordsHof(col("w"), col("starts"), 5))
      .select(col("id"), col("part"), col("clean_text")))
    dump("strip_stage_after.txt",
      NearDedup.stripRepeatedSpans(docs, "doc_id", "text", "lang"))
    spark.stop()
  }
}
