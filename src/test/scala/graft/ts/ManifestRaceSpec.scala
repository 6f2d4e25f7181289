package graft.ts

import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

/** The manifest install race, actually raced: two writers commit the SAME
  * version number simultaneously, 20 rounds. The rename-as-CAS contract
  * (verified on this FS: rename-to-existing returns false and leaves the
  * destination intact — the HDFS semantic) must give exactly one winner
  * per round, surface "concurrent commit" to the loser, install one
  * writer's COMPLETE body (writer-unique temp names — a shared temp let a
  * loser rename the winner's half-written bytes, the r14 ADVICE race),
  * and leave no temp residue. */
class ManifestRaceSpec extends graft.SparkSpec {

  test("two writers racing one version: one winner, loser sees 'concurrent " +
      "commit', the installed manifest is untorn, no temp residue") {
    val dir = java.nio.file.Files.createTempDirectory("manifest_race").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    TsTable.create(spark, dir, schema) // installs v1
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (round <- 2 to 21) {
      val v = round.toLong
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val results =
        new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Unit]]()
      val threads = Seq("left", "right").map { tag =>
        new Thread(() => {
          val m = TsManifest(v, s"race-$tag", "ts", schema,
            Seq((s"f-$tag", tag.length.toLong)))
          barrier.await()
          try { TsTable.writeManifest(spark, dir, m); results.add(Right(())) }
          catch { case e: Throwable => results.add(Left(e)) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val rs = results.asScala.toSeq
      assert(rs.count(_.isRight) == 1,
        s"round $round: expected exactly one winner, got $rs")
      rs.collect { case Left(e) => e }.foreach(e =>
        assert(e.getMessage.contains("concurrent commit"), e.getMessage))
      // the installed manifest parses cleanly and is ONE writer's whole
      // body — action and file list must belong to the same writer
      val m = TsTable.readManifest(spark, dir, v)
      val winner = m.action.stripPrefix("race-")
      assert(Seq("left", "right").contains(winner), m.action)
      assert(m.files == Seq((s"f-$winner", winner.length.toLong)),
        s"round $round: torn manifest — action from '$winner' but files ${m.files}")
    }
    val tmps = fs.listStatus(
        new org.apache.hadoop.fs.Path(dir, TsTable.VersionsDir))
      .map(_.getPath.getName).filter(_.endsWith(".tmp"))
    assert(tmps.isEmpty, s"temp residue: ${tmps.mkString(",")}")
  }

  test("commitVersion CAS-retry: two concurrent committers both land, on " +
      "distinct versions, history linear with every action present") {
    val dir = java.nio.file.Files.createTempDirectory("commit_race").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    val t = TsTable.create(spark, dir, schema) // v1
    val perThread = 10
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("left", "right").map { tag =>
      new Thread(() => {
        try {
          barrier.await()
          for (i <- 1 to perThread) t.commitVersion(s"race-$tag-$i")
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(errors.asScala.isEmpty,
      s"a committer failed despite the retry loop: ${errors.asScala.headOption}")
    val hist = t.snapshotVersions
    // linear, gapless history: every commit took a DISTINCT version
    assert(hist.map(_._1) == (1L to (1 + 2 * perThread).toLong),
      s"history not linear: ${hist.map(_._1)}")
    // no commit was silently clobbered: all 20 racing actions are present
    val actions = hist.map(_._2).toSet
    for (tag <- Seq("left", "right"); i <- 1 to perThread)
      assert(actions.contains(s"race-$tag-$i"), s"lost commit race-$tag-$i")
  }
}
