package graft.ts

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.util.SerializableConfiguration
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** The read-vs-swap claim proven at the TASK layer: on a cluster,
  * `spark.task.maxFailures >= 2` means a scan that loses a data file to a
  * concurrent maintenance swap heals inside the JOB — Spark retries the
  * task, the retried task re-opens the file, and the archive-resolving
  * format re-resolves it from `_ts_archive/` — with no caller-side retry
  * at all. The shared test session runs `local[4]` (maxFailures=1, which
  * is why the stress specs carry an isSwapReadRace caller retry); this
  * suite owns a `local[4,2]` session for the test that needs the
  * cluster semantics. */
class TaskRetrySpec extends AnyFunSuite {

  test("a task that loses its file to a concurrent archive move heals on " +
      "the TASK retry through the archive-resolving format — the action " +
      "succeeds with no caller retry and no rows lost") {
    graft.SparkSpec.releaseSession()
    val spark = graft.SparkSpec.build("local[4,2]") // task.maxFailures=2
    try {
      import spark.implicits._
      assert(spark.sparkContext.getConf.get("spark.master") == "local[4,2]")
      val dir = java.nio.file.Files.createTempDirectory("task_retry").toString
      val df = (0 until 48).map(m =>
        (Timestamp.valueOf(f"2024-03-01 ${m / 4}%02d:${(m % 4) * 15}%02d:00"),
          m.toLong)).toDF("ts", "v")
      val t = TsTable.create(spark, dir, df.schema, tsCol = "ts")
      t.append(df)
      val pinV = t.currentVersion.get
      val dayDir = new Path(dir, "p_date=2024-03-01")
      val hfs = dayDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val victim = hfs.listStatus(dayDir).filter(_.isFile)
        .map(_.getPath.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith(".")).head
      val livePath = new Path(dayDir, victim).toString
      val archPath = new Path(dir,
        s"_ts_archive/p_date=2024-03-01/$victim").toString
      val conf = new SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      // Every attempt-0 task: move the live file into the archive exactly
      // as a concurrent compact's swap would (same rel path — the
      // archiveFile discipline), then die the way a reader whose file was
      // swapped mid-read dies. The TASK retry (attempt 1) replans nothing:
      // the captured file set still names the LIVE path, and the
      // archive-resolving parquet format falls back to the archived copy.
      val healed = t.toDF.select("v").as[Long].mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0) {
          val live = new Path(livePath)
          val fs = live.getFileSystem(conf.value)
          if (fs.exists(live)) {
            val arch = new Path(archPath)
            fs.mkdirs(arch.getParent)
            fs.rename(live, arch) // idempotent across racing attempt-0 tasks
          }
          throw new java.io.FileNotFoundException(
            s"$livePath vanished mid-read (simulated concurrent swap)")
        }
        it
      }
      // Pin the file set BEFORE the injector runs: the live directory
      // load's listing is lazy (schema supplied), and a listing taken
      // AFTER the move would legitimately see an empty live tree — the
      // claim under test is open-time re-resolution of an already-planned
      // file, so plan first, then lose the file mid-job.
      assert(healed.queryExecution.executedPlan != null)
      assert(hfs.exists(new Path(livePath)))
      // ONE action, NO try/catch: task-level healing or test failure
      val n = healed.count()
      assert(n == 48, s"task retry must serve every row, got $n")
      assert(!hfs.exists(new Path(livePath)) &&
        hfs.exists(new Path(archPath)),
        "the victim file must have actually moved to the archive")
      // a PINNED read keeps serving the archived file (manifest
      // resolution, live-first-then-archive); the LIVE read correctly
      // narrows to the live tree
      assert(TsTable.openAt(spark, dir, pinV).toDF.count() == 48)
    } finally {
      spark.stop()
      graft.SparkSpec.releaseSession()
    }
  }
}
