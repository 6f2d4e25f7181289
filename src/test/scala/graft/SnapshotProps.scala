package graft

import graft.ts.TsTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files
import java.sql.Timestamp

/** Model-based snapshot properties: a generated sequence of mutation verbs
  * runs against a real store while a driver-side model tracks the exact
  * row multiset each committed version SHOULD serve; afterwards every
  * still-retained version is opened (post-maintenance, so resolution
  * exercises the archive) and must hash-match its model. Seed-driven like
  * TsTableProps (each case runs real Spark jobs). */
class SnapshotProps extends SparkSpec {

  // tables START with the value column NARROW (int) so the Widen verb can
  // promote it mid-script; ids stay int-safe by construction
  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("v", IntegerType)))

  private val base = Timestamp.valueOf("2024-07-01 00:00:00").getTime
  private val DayMs = 86400000L

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** (tsMs, id) batch under the value column's CURRENT label and TYPE —
    * every write face must follow the widen like it follows the rename. */
  private def mk(rows: Seq[(Long, Long)], name: String = "v",
                 wide: Boolean = false) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (t, i) =>
          Row(new Timestamp(t), if (wide) i else i.toInt) }, 2),
      StructType(Seq(StructField("ts", TimestampType),
        StructField(name, if (wide) LongType else IntegerType))))

  sealed private trait Verb
  private case class Append(days: Int, rowsPerDay: Int, twoBatches: Boolean) extends Verb
  private case object CompactAll extends Verb
  private case class DropOldest(n: Int) extends Verb
  private case class DeleteMod(m: Int) extends Verb
  private case object RestoreEarlier extends Verb
  private case class MergeBackfill(rows: Int) extends Verb
  private case object Rename extends Verb
  private case class ForeignMigrate(rows: Int) extends Verb
  private case object Widen extends Verb
  private case object Checkpoint extends Verb

  private val verbGen: Gen[Verb] = Gen.frequency(
    6 -> (for {
      d <- Gen.chooseNum(1, 2); r <- Gen.chooseNum(1, 4)
      two <- Gen.oneOf(true, false)
    } yield Append(d, r, two)),
    2 -> Gen.const(CompactAll),
    2 -> Gen.chooseNum(1, 2).map(DropOldest.apply),
    2 -> Gen.chooseNum(2, 4).map(DeleteMod.apply),
    1 -> Gen.const(RestoreEarlier),
    2 -> Gen.chooseNum(1, 3).map(MergeBackfill.apply),
    2 -> Gen.const(Rename),
    2 -> Gen.chooseNum(1, 2).map(ForeignMigrate.apply),
    2 -> Gen.const(Widen),
    2 -> Gen.const(Checkpoint))

  private val scriptGen: Gen[List[Verb]] = for {
    n <- Gen.chooseNum(4, 7)
    // always open with an append so maintenance verbs have material
    head <- verbGen.suchThat(_.isInstanceOf[Append])
    tail <- Gen.listOfN(n - 1, verbGen)
  } yield head :: tail

  test("model-based: every retained version serves exactly its committed " +
      "row multiset after arbitrary verb sequences; history stays ascending") {
    var renamesRun = 0
    var checkpointsRun = 0
    var migratesRun = 0
    var widensRun = 0
    for (seed <- 1L to 6L) {
      val script = sample(scriptGen, seed)
      val dir = Files.createTempDirectory(s"snap_prop_$seed").toString
      var t = TsTable.create(spark, dir, schema)
      // model state
      var nextDay = 0
      var nextId = 0L
      var live = Map.empty[Int, Seq[(Long, Long)]] // day -> rows
      // the value column's CURRENT label (Rename toggles it; every model
      // batch/predicate/key must follow, and restore rolls it back) —
      // fresh labels each time, since renamed-away labels stay retired
      var curName = "v"
      var renameN = 0
      // whether the value column has widened int -> long (Widen flips it
      // once; restore rolls it back with the descriptor) — every model
      // batch must write the engine's CURRENT type
      var isWide = false
      // version -> expected live multiset at that commit
      var expected = Map[Long, Seq[(Long, Long)]](
        t.currentVersion.get -> Seq.empty)
      // version -> the value column's label as of that commit (so a
      // restore can roll the model's label back with the descriptor)
      var nameAt = Map[Long, String](t.currentVersion.get -> curName)
      // version -> whether the value column was wide as of that commit
      var wideAt = Map[Long, Boolean](t.currentVersion.get -> isWide)
      // version -> rows APPENDED by that commit (the changesBetween model)
      var appendedAt = Map.empty[Long, Seq[(Long, Long)]]

      def record(): Unit = {
        expected += t.currentVersion.get -> live.values.flatten.toSeq
        nameAt += t.currentVersion.get -> curName
        wideAt += t.currentVersion.get -> isWide
      }

      script.foreach {
        case Append(days, rowsPerDay, twoBatches) =>
          val newRows = (0 until days).map { d =>
            val day = nextDay + d
            (day, (0 until rowsPerDay).map { r =>
              val id = nextId; nextId += 1
              (base + day * DayMs + r * 60000L, id)
            })
          }
          nextDay += days
          val flat = newRows.flatMap(_._2)
          def land(batch: Seq[(Long, Long)]): Unit = {
            t.append(mk(batch, curName, isWide)); live = merge(live, group(batch)); record()
            appendedAt += t.currentVersion.get -> batch
          }
          if (twoBatches && flat.length > 1) {
            val (a, b) = flat.splitAt(flat.length / 2)
            land(a); land(b)
          } else land(flat)
        case CompactAll =>
          // content-preserving; commits one version per multi-file day
          t.compactAll(targetFiles = 1)
          t.currentVersion.foreach(v =>
            if (!expected.contains(v)) expected += v -> live.values.flatten.toSeq)
        case DropOldest(n) =>
          val days = live.keys.toSeq.sorted
          if (days.nonEmpty) {
            val cutoffDay = days.take(n).lastOption.map(_ + 1).getOrElse(0)
            // the ISO day in UTC (the session zone that wrote p_date)
            val iso = java.time.Instant.ofEpochMilli(base + cutoffDay.toLong * DayMs)
              .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
            t.dropBefore(iso)
            live = live.filter(_._1 >= cutoffDay)
            record()
          }
        case DeleteMod(m) =>
          val hits = live.values.flatten.count(_._2 % m == 0)
          val deleted = t.deleteWhere(
            org.apache.spark.sql.functions.col(curName) % m ===
              org.apache.spark.sql.functions.lit(0))
          assert(deleted == hits.toLong,
            s"seed delete: engine removed $deleted, model expected $hits")
          if (hits > 0) { // no hit = no commit, model unchanged
            live = live.map { case (d, rs) => d -> rs.filterNot(_._2 % m == 0) }
              .filter(_._2.nonEmpty)
            record()
          }
        case MergeBackfill(n) =>
          // upsert via mergeInto: fresh (ts, v) pairs land as BACKFILL
          // inserts into the OLDEST live day (+30 s offsets Append never
          // writes, so matched = 0 is provable); the model adds them to
          // the live multiset but NOT to the per-append deltas —
          // changesBetween's documented contract treats a "merge" version
          // as row-free, and the final changesCheck proves it
          if (live.nonEmpty) {
            val day0 = live.keys.min
            val newRows = (0 until n).map { r =>
              val id = nextId; nextId += 1
              (base + day0.toLong * DayMs + r * 60000L + 30000L, id)
            }
            val res = t.mergeInto(mk(newRows, curName, isWide), keys = Seq("ts", curName))
            assert(res == TsTable.MergeResult(0L, n.toLong),
              s"merge backfill: got $res, want (0, $n)")
            assert(t.snapshotVersions.last._2 == "backfill",
              "an all-insert merge must commit as a backfill")
            live = merge(live, group(newRows))
            record()
            appendedAt += t.currentVersion.get -> newRows
          }
        case RestoreEarlier =>
          val candidates = expected.keys.toSeq.sorted
          if (candidates.length >= 2) {
            val target = candidates(candidates.length / 2)
            t.restore(target)
            // the descriptor (and with it the value column's label)
            // rolled back to the target's — reopen and follow
            t = TsTable.open(spark, dir)
            curName = nameAt(target)
            isWide = wideAt(target) // the type rolled back with the files
            live = group(expected(target))
            record()
          }
        case Rename =>
          // content-preserving relabel: fresh target each time (renamed-
          // away labels retire); commits a "rename" version serving the
          // unchanged multiset, appends/deletes/merges follow the label
          renameN += 1
          val next = s"v_$renameN"
          t = t.renameColumn(curName, next)
          curName = next
          renamesRun += 1
          record()
        case ForeignMigrate(n) =>
          // an id-less file attaches OUTSIDE the write funnels (the
          // hybrid-layout contract), then migrateFieldIds folds it into
          // the governed store: the "migrate" version's multiset gains
          // the foreign rows. changesBetween skips them (not an
          // append-family commit); changeFeed reconstructs them as
          // INSERTS from the file diff — feedCheck proves the replay
          // crosses the attachment exactly. +45 s offsets no other verb
          // writes keep the rows identifiable.
          if (live.nonEmpty) {
            val day0 = live.keys.min
            val rows = (0 until n).map { r =>
              val id = nextId; nextId += 1
              (base + day0.toLong * DayMs + r * 60000L + 45000L, id)
            }
            val iso = java.time.Instant.ofEpochMilli(base + day0.toLong * DayMs)
              .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
            mk(rows, curName, isWide).coalesce(1).write.mode("append")
              .parquet(s"$dir/p_date=$iso")
            val rewritten = t.migrateFieldIds()
            assert(rewritten == 1,
              s"exactly the attached id-less file rewrites, got $rewritten")
            assert(t.snapshotVersions.last._2 == "migrate")
            live = merge(live, group(rows))
            record()
            migratesRun += 1
          }
        case Checkpoint =>
          // content-preserving manifest re-list (the orphan/attachment
          // capture verb): one new version serving the unchanged multiset;
          // changesBetween skips it, changeFeed's file-diff cancels to
          // zero rows — the model just records the same multiset again
          t.checkpoint()
          assert(t.snapshotVersions.last._2 == "checkpoint")
          checkpointsRun += 1
          record()
        case Widen =>
          // content-preserving type promotion: int -> long once; every
          // later batch writes the wide type, pre-widen files promote at
          // read, and a later restore rolls the type back with the files
          if (!isWide) {
            t = t.widenColumn(curName, LongType)
            isWide = true
            widensRun += 1
            record()
          }
      }

      val retained = t.snapshotVersions.map(_._1)
      assert(retained == retained.sorted, s"seed=$seed history not ascending")
      assert(t.currentVersion.contains(retained.last), s"seed=$seed")
      // every retained, model-known version serves exactly its multiset —
      // resolution goes through the archive for pre-maintenance versions
      retained.filter(expected.contains).foreach { v =>
        val got = t.openAt(v).toDF.collect()
          .map(r => (r.getTimestamp(0).getTime, r.getAs[Number](1).longValue)).sorted.toSeq
        assert(got == expected(v).sorted,
          s"seed=$seed version $v: got ${got.size} rows, want ${expected(v).size}")
      }
      // the live table equals the newest version
      val liveNow = t.toDF.collect()
        .map(r => (r.getTimestamp(0).getTime, r.getAs[Number](1).longValue)).sorted.toSeq
      assert(liveNow == live.values.flatten.toSeq.sorted, s"seed=$seed live")
      // changesBetween == the union of the model's per-append deltas in
      // range, whatever maintenance/delete/restore happened in between
      def changesCheck(v1: Long, v2: Long): Unit = {
        val want = appendedAt
          .filter { case (v, _) => v > v1 && v <= v2 }
          .values.flatten.toSeq.sorted
        val got = t.changesBetween(v1, v2).collect()
          .map(r => (r.getTimestamp(0).getTime, r.getAs[Number](1).longValue)).sorted.toSeq
        assert(got == want,
          s"seed=$seed changes($v1,$v2): got ${got.size}, want ${want.size}")
      }
      if (retained.length >= 2) changesCheck(retained.head, retained.last)
      if (retained.length > 2) // mid == last at length 2 (degenerate range)
        changesCheck(retained(retained.length / 2), retained.last)
      // changeFeed replay: state(v1) + inserts − deletes == state(v2) as
      // MULTISETS, across every verb — delete, retention, restore, merge
      // included (the full-CDF invariant changesBetween cannot offer)
      def multi(rows: Seq[(Long, Long)]): Map[(Long, Long), Int] =
        rows.groupBy(identity).view.mapValues(_.size).toMap
      def feedCheck(v1: Long, v2: Long): Unit = {
        val feed = t.changeFeed(v1, v2).collect()
        val ins = multi(feed.filter(_.getAs[String]("_change_type") == "insert")
          .map(r => (r.getTimestamp(0).getTime, r.getAs[Number](1).longValue)).toSeq)
        val del = multi(feed.filter(_.getAs[String]("_change_type") == "delete")
          .map(r => (r.getTimestamp(0).getTime, r.getAs[Number](1).longValue)).toSeq)
        val start = multi(expected(v1))
        val got = (start.keySet ++ ins.keySet ++ del.keySet).flatMap { k =>
          val n = start.getOrElse(k, 0) + ins.getOrElse(k, 0) - del.getOrElse(k, 0)
          assert(n >= 0, s"seed=$seed feed($v1,$v2): $k net-negative ($n)")
          if (n > 0) Some(k -> n) else None
        }.toMap
        assert(got == multi(expected(v2)),
          s"seed=$seed feed($v1,$v2): replay does not reconstruct v$v2")
      }
      val known = retained.filter(expected.contains)
      if (known.length >= 2) feedCheck(known.head, known.last)
      if (known.length > 2) feedCheck(known(known.length / 2), known.last)
    }
    assert(renamesRun > 0,
      "the seed range must exercise Rename at least once — regenerate " +
        "seeds if the generator drifts")
    assert(migratesRun > 0,
      "the seed range must exercise ForeignMigrate at least once — " +
        "regenerate seeds if the generator drifts")
    assert(widensRun > 0,
      "the seed range must exercise Widen at least once — regenerate " +
        "seeds if the generator drifts")
    assert(checkpointsRun > 0,
      "the seed range must exercise Checkpoint at least once — " +
        "regenerate seeds if the generator drifts")
  }

  private def group(rows: Seq[(Long, Long)]): Map[Int, Seq[(Long, Long)]] =
    rows.groupBy(r => ((r._1 - base) / DayMs).toInt)

  private def merge(a: Map[Int, Seq[(Long, Long)]],
                    b: Map[Int, Seq[(Long, Long)]]): Map[Int, Seq[(Long, Long)]] =
    (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, Seq.empty) ++ b.getOrElse(k, Seq.empty))).toMap
}
