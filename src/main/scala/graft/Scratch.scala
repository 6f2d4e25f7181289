package graft
// Temporary measurement scaffold for the r21 optimization round — times
// isolated pipeline stages with the noop sink (guide §1.4). Not registered
// anywhere; contents rotate per investigation.
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

    def settle(): Unit = { // the Bench settle barrier
      spark.sparkContext.parallelize(0 until cpus.toInt, cpus.toInt).count()
      System.gc(); Thread.sleep(100)
      spark.sparkContext.parallelize(0 until cpus.toInt, cpus.toInt).count()
    }
    def time(label: String)(df: => DataFrame): Unit = {
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
    def dump(name: String, df: DataFrame): Unit = {
      val w = new java.io.PrintWriter(s"plans/r21/$name", "UTF-8")
      try w.write(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      finally w.close()
      println(s"[scratch] wrote plans/r21/$name")
    }

    // q_interval_overlap: does AQE reuse the duplicated session-build
    // exchange at runtime?
    val io = graft.operators.EventAnalyticsPack.queries("q_interval_overlap")
    val df = io(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val executed = df.queryExecution.executedPlan.toString
    val reused = executed.contains("ReusedExchange")
    println(s"[scratch] interval_overlap executed plan has ReusedExchange=$reused")
    println(s"[scratch] exchanges=${"Exchange".r.findAllIn(executed).size}")
    time("q_interval_overlap") { io(spark, sfDir) }
    time("q_embed_kmeans_iter(NEW)") {
      graft.operators.LlmPack.queries("q_embed_kmeans_iter")(spark, sfDir)
    }
    // pre-r21 kmeans body, inlined for same-session A/B
    def oldKmeans(): DataFrame = {
      import graft.functions.VectorFns
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      var assign = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label").cast("int").as("cl"))
      var scored: DataFrame = null
      for (_ <- 1 to 3) {
        val av = emb.join(assign, "vec_id")
        val cb = av.select(col("cl").as("c_label"), posexplode(col("v")))
          .groupBy(col("c_label"), col("pos"))
          .agg(avg(col("col")).as("cv0"))
          .groupBy(col("c_label"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv0")))),
            x => round(x.getField("cv0"), 6)).as("cv"))
        scored = graft.operators.Compute.materialize(av.crossJoin(broadcast(cb))
          .select(col("vec_id"),
            struct(round(VectorFns.cosine(col("v"), col("cv")), 6).as("sim"),
              (-col("c_label")).as("neg")).as("cand"))
          .groupBy(col("vec_id"))
          .agg(max(col("cand")).as("best"))
          .select(col("vec_id"), (-col("best.neg")).cast("int").as("cl"),
            col("best.sim").as("sim")))
        assign = scored.select(col("vec_id"), col("cl"))
      }
      scored.select(col("vec_id"), col("cl").as("cluster"), col("sim"))
        .orderBy(col("vec_id"))
    }
    time("q_embed_kmeans_iter(OLD)") { oldKmeans() }
    time("q_embed_kmeans_iter(NEW2)") {
      graft.operators.LlmPack.queries("q_embed_kmeans_iter")(spark, sfDir)
    }
    time("q_dedup_semantic") {
      graft.operators.LlmPack.queries("q_dedup_semantic")(spark, sfDir)
    }
    time("q_corpus_build") {
      graft.operators.PipelinePack.queries("q_corpus_build")(spark, sfDir)
    }
    // plan evidence: one kmeans ROUND (the query's own executed plan is
    // checkpoint-opaque). before = raw-scan join per round; after =
    // vec_id-partitioned persisted vectors (join + argmax share the
    // partitioning).
    locally {
      import graft.functions.VectorFns
      def round1(emb: DataFrame): DataFrame = {
        val assign = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("label").cast("int").as("cl"))
        val av = emb.join(assign, "vec_id")
        val cb = av.select(col("cl").as("c_label"), posexplode(col("v")))
          .groupBy(col("c_label"), col("pos"))
          .agg(avg(col("col")).as("cv0"))
          .groupBy(col("c_label"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv0")))),
            x => round(x.getField("cv0"), 6)).as("cv"))
        av.crossJoin(broadcast(cb))
          .select(col("vec_id"),
            struct(round(VectorFns.cosine(col("v"), col("cv")), 6).as("sim"),
              (-col("c_label")).as("neg")).as("cand"))
          .groupBy(col("vec_id"))
          .agg(max(col("cand")).as("best"))
          .select(col("vec_id"), (-col("best.neg")).cast("int").as("cl"),
            col("best.sim").as("sim"))
      }
      val rawEmb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      dump("kmeans_round_before.txt", round1(rawEmb))
      val partEmb = rawEmb.repartition(col("vec_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      partEmb.count()
      dump("kmeans_round_after.txt", round1(partEmb))
      partEmb.unpersist(blocking = false)
    }
    spark.stop()
  }
}
