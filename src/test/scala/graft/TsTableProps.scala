package graft

import graft.ts.TsTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files
import java.sql.Timestamp

/** ScalaCheck-generator-driven properties from SURVEY.md §5.2.4 — driven by
  * explicit seeds (each case runs real Spark jobs, so a handful of cases per
  * property, deterministic across runs). */
class TsTableProps extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("v", LongType)))

  private val base = Timestamp.valueOf("2024-06-01 00:00:00").getTime

  /** Random ascending ms offsets spanning up to ~5 days (cross-partition). */
  private val batchGen: Gen[List[Long]] =
    Gen.chooseNum(1, 60).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 5L * 86400000L)).map(_.sorted)
    }

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def mk(offsets: Seq[Long]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        offsets.zipWithIndex.map { case (o, i) => Row(new Timestamp(base + o), i.toLong) }, 2),
      schema)

  test("append then full-range read returns exactly the input rows") {
    for (seed <- 1L to 3L) {
      val offsets = sample(batchGen, seed)
      val dir = Files.createTempDirectory("prop_rt").toString
      val tab = TsTable.create(spark, dir, schema)
      tab.append(mk(offsets))
      val got = tab.readRange(new Timestamp(base + offsets.min), new Timestamp(base + offsets.max))
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1))).sorted.toSeq
      val want = offsets.zipWithIndex.map { case (o, i) => (base + o, i.toLong) }.sorted
      assert(got == want, s"seed=$seed")
    }
  }

  test("readRange(s,e) equals brute-force closed-interval filter") {
    for (seed <- 10L to 12L) {
      val offsets = sample(batchGen, seed)
      val a = sample(Gen.chooseNum(0L, 5L * 86400000L), seed * 31)
      val b = sample(Gen.chooseNum(0L, 5L * 86400000L), seed * 37)
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val dir = Files.createTempDirectory("prop_rr").toString
      val tab = TsTable.create(spark, dir, schema)
      tab.append(mk(offsets))
      val got = tab.readRange(new Timestamp(base + lo), new Timestamp(base + hi))
        .collect().map(_.getLong(1)).sorted.toSeq
      val want = offsets.zipWithIndex
        .collect { case (o, i) if o >= lo && o <= hi => i.toLong }.sorted
      assert(got == want, s"seed=$seed lo=$lo hi=$hi")
    }
  }

  test("k sequential chronological appends equal one big append") {
    for (seed <- 20L to 22L) {
      val offsets = sample(batchGen, seed)
      val k = sample(Gen.chooseNum(2, 4), seed * 13)
      val one = TsTable.create(spark, Files.createTempDirectory("prop_one").toString, schema)
      one.append(mk(offsets))
      val many = TsTable.create(spark, Files.createTempDirectory("prop_k").toString, schema)
      offsets.grouped(math.max(1, offsets.size / k)).foreach { chunk =>
        many.append(mk(chunk)) // chunks of a sorted list are chronological
      }
      val a = one.toDF.collect().map(_.getTimestamp(0).getTime).sorted.toSeq
      val b = many.toDF.collect().map(_.getTimestamp(0).getTime).sorted.toSeq
      assert(a == b, s"seed=$seed")
    }
  }

  test("compactAll after random chunked appends is content-preserving and " +
      "leaves one ts-sorted file per day") {
    for (seed <- 40L to 42L) {
      val offsets = sample(batchGen, seed)
      val k = sample(Gen.chooseNum(2, 5), seed * 17)
      val dir = Files.createTempDirectory("prop_cmp").toString
      val tab = TsTable.create(spark, dir, schema)
      offsets.grouped(math.max(1, offsets.size / k)).foreach { chunk =>
        tab.append(mk(chunk)) // several appends → multi-file days
      }
      val before = tab.toDF.collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).sorted.toSeq
      tab.compactAll(1)
      val after = tab.toDF.collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).sorted.toSeq
      assert(after == before, s"seed=$seed: compaction changed content")
      // every day directory holds exactly one visible data file, ts-sorted
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("p_date="))
        .foreach { day =>
          val files = day.listFiles().filter(f =>
            f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
          assert(files.length == 1, s"seed=$seed ${day.getName}: ${files.length} files")
          val ts = spark.read.parquet(files.head.toString)
            .collect().map(_.getTimestamp(0).getTime).toSeq
          assert(ts == ts.sorted, s"seed=$seed ${day.getName} not ts-sorted")
        }
    }
  }

  test("any append reaching before the stored max is rejected") {
    for (seed <- 30L to 32L) {
      val offsets = sample(batchGen, seed).distinct
      if (offsets.size > 1) {
        val dir = Files.createTempDirectory("prop_rej").toString
        val tab = TsTable.create(spark, dir, schema)
        tab.append(mk(offsets))
        intercept[IllegalArgumentException] {
          tab.append(mk(Seq(offsets.max - 1))) // strictly before stored max
        }
      }
    }
  }
}
