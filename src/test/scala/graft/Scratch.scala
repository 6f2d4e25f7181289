package graft
// Temporary measurement scaffold for the optimization rounds — times
// isolated pipeline stages with the noop sink (guide §1.4). Not registered
// anywhere; contents rotate per investigation. Lives under src/test (r21
// advice) so it never ships in the main jar: run with
//   sbt "Test/runMain graft.Scratch <keys>"
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
    def execShape(label: String, df: DataFrame): Unit = {
      // Execute THIS QueryExecution (a noop write would clone it, leaving
      // executedPlan pre-AQE) without collecting rows to the driver — the
      // r21 scaffold collect()'d arbitrary registered queries, a driver
      // OOM on corpus-sized results (r21 advice).
      df.queryExecution.toRdd.foreach(_ => ())
      val p = df.queryExecution.executedPlan.toString
      val ex = "Exchange hashpartitioning".r.findAllIn(p).size
      val re = "ReusedExchange".r.findAllIn(p).size
      val stages = "ShuffleQueryStage ([0-9]+)".r.findAllMatchIn(p).map(_.group(1)).toSeq
      val scans = "Scan parquet".r.findAllIn(p).size
      println(s"[scratch] $label exchanges=$ex reused=$re parquetScans=$scans " +
        s"stages=${stages.mkString(",")} distinctStages=${stages.distinct.size}")
    }

    for (k <- args) {
      val fn = SparkEntry.queries(k)
      execShape(k, fn(spark, sfDir))
      time(k) { fn(spark, sfDir) }
    }
    spark.stop()
  }
}
