package graft
// Plan-evidence scaffold: dump `.explain("formatted")` for INNER pipeline
// stages whose declared-query plans are checkpoint-opaque (the dedup family
// materializes its pair list, so `plans/rNN/q_dedup_*_{before,after}.txt`
// show only a Scan ExistingRDD). Test-scoped like Scratch/JobTrace:
//   sbt "Test/runMain graft.ExplainStage <outDir> <suffix> <stage...>"
import org.apache.spark.sql.{DataFrame, SparkSession}

object ExplainStage {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainStage <outDir> <suffix> <stage...>")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.catalog.graft_ts", "graft.sources.GraftTsCatalog")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.NearDedup
    // materialize=Some(false) keeps the pipelines LAZY so the full plan
    // (ranking, candidate join, verify) is visible — same operators and
    // parameters as the declared queries (LlmPack.dedupNear/dedupContain).
    val stages: Map[String, SparkSession => DataFrame] = Map(
      "dedup_near_pipeline" -> (s => NearDedup.prefixFilter(
        Tables.documents(s, sfDir), "doc_id", "text", "lang", tau = 0.8,
        materialize = Some(false))),
      "dedup_contain_pipeline" -> (s => NearDedup.containmentPairs(
        Tables.documents(s, sfDir), "doc_id", "text", "lang", tauC = 0.9,
        minShingles = 10, materialize = Some(false))))
    args.drop(2).foreach { n =>
      val df = stages(n)(spark)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${n}_$suffix.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.write(txt) finally w.close()
      println(s"[explainstage] wrote ${f.getPath} (${txt.length} chars)")
    }
    spark.stop()
  }
}
