package graft

import graft.operators.ZOrderLayout
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files

/** Generator-driven properties for the Z-order layout: bucket-box decode is
  * a true partition of rank space, and for RANDOM datasets and RANDOM query
  * rectangles the clustered query equals the brute-force filter exactly —
  * the conservativeness claim cannot hide behind one fixture. Explicit
  * seeds (each case runs real Spark jobs), the TsTableProps discipline. */
class ZOrderProps extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("bucket boxes tile the rank plane exactly (every rank pair in exactly one box)") {
    val boxes = (0 until (1 << ZOrderLayout.PrefixBits)).map(ZOrderLayout.bucketBox)
    val gridMax = (1L << ZOrderLayout.Bits) - 1
    // corners, edges and random interior points all land in exactly one box
    val pts = for (seed <- 1L to 200L) yield sample(
      Gen.zip(Gen.chooseNum(0L, gridMax), Gen.chooseNum(0L, gridMax)), seed)
    (pts ++ Seq((0L, 0L), (gridMax, gridMax), (0L, gridMax), (gridMax, 0L)))
      .foreach { case (rx, ry) =>
        val owners = boxes.count { case (xLo, xHi, yLo, yHi) =>
          rx >= xLo && rx <= xHi && ry >= yLo && ry <= yHi }
        assert(owners == 1, s"rank ($rx,$ry) owned by $owners boxes")
      }
  }

  test("k-dim bucket boxes tile rank space exactly (k = 3 and k = 4)") {
    for (k <- Seq(3, 4)) {
      val bits = ZOrderLayout.bitsFor(k)
      val prefix = ZOrderLayout.prefixFor(k)
      val gridMax = (1L << bits) - 1
      val boxes = (0 until (1 << prefix))
        .map(b => ZOrderLayout.bucketBoxN(b, k, bits, prefix))
      val pts = for (seed <- 1L to 100L) yield sample(
        Gen.listOfN(k, Gen.chooseNum(0L, gridMax)), seed * 7 + k)
      (pts ++ Seq(List.fill(k)(0L), List.fill(k)(gridMax))).foreach { p =>
        val owners = boxes.count(_.zip(p).forall {
          case ((lo, hi), r) => r >= lo && r <= hi })
        assert(owners == 1, s"k=$k rank ${p.mkString(",")} owned by $owners boxes")
      }
    }
  }

  private val dataGen: Gen[List[(Long, Double)]] =
    Gen.chooseNum(5, 120).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(-5000L, 5000L),
        Gen.chooseNum(-100.0, 100.0)))
    }

  test("random data + random rectangles: clustered query == brute-force filter") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("x", LongType),
      StructField("y", DoubleType)))
    for (seed <- 1L to 4L) {
      val rows = sample(dataGen, seed).zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 3), schema)
      val path = Files.createTempDirectory("zprop").toString + "/store"
      ZOrderLayout.build(df, "x", "y", path)
      val (xs, ys) = (rows.map(_._2), rows.map(_._3))
      // random rectangle from two random corner fractions (may be empty)
      val (fx0, fx1, fy0, fy1) = sample(Gen.zip(
        Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)).flatMap { a =>
        Gen.zip(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0))
          .map(b => (a._1, a._2, b._1, b._2))
      }, seed * 31)
      def lo(f0: Double, f1: Double, mn: Double, mx: Double) =
        mn + math.min(f0, f1) * (mx - mn)
      def hi(f0: Double, f1: Double, mn: Double, mx: Double) =
        mn + math.max(f0, f1) * (mx - mn)
      val (xLo, xHi) = (lo(fx0, fx1, xs.min, xs.max), hi(fx0, fx1, xs.min, xs.max))
      val (yLo, yHi) = (lo(fy0, fy1, ys.min, ys.max), hi(fy0, fy1, ys.min, ys.max))
      val got = ZOrderLayout.queryRect(spark, path, "x", "y", xLo, xHi, yLo, yHi)
        .collect().map(_.getAs[Long]("id")).sorted.toSeq
      val want = rows.filter(r => r._2 >= xLo && r._2 <= xHi &&
        r._3 >= yLo && r._3 <= yHi).map(_._1).sorted
      assert(got == want, s"seed $seed: ${got.size} vs ${want.size} rows")
    }
  }
}
