package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) clustered layout — multi-dimensional data
  * skipping for rectangle predicates, the OPTIMIZE-ZORDER pattern of the
  * lakehouse engines re-derived from first principles on plain Parquet.
  *
  * A single-column sort prunes scans on that column only; a 100 TB table
  * queried by `x BETWEEN … AND y BETWEEN …` needs BOTH dimensions locally
  * clustered. The Morton code interleaves the bits of the two dimensions'
  * 16-bit grid ranks, so sorting by it places rows that are close in
  * (x, y) space close in the file layout:
  *
  *   - the TOP `PrefixBits` bits of the code become an explicit `zbucket`
  *     partition directory. A prefix of the interleaved code is itself a
  *     RECTANGLE in (x, y) space (the first p bits pin the top p/2 bits of
  *     each dimension), so the driver can decode each bucket's exact
  *     bounding box and turn a query rectangle into a `zbucket IN (…)`
  *     partition filter — pruning at the FILE-LISTING level, before any
  *     footer is opened (same mechanism the IVF store uses for cells);
  *   - WITHIN each bucket, rows are sorted by the full code, so both
  *     dimensions' per-row-group min/max footer stats stay tight and the
  *     pushed-down residual predicate skips row groups inside the
  *     surviving buckets.
  *
  * The bucket filter is CONSERVATIVE by construction (a bucket is read iff
  * its decoded bounding box intersects the query rectangle — grid ranks
  * are monotone in the raw values, so no qualifying row can live in a
  * pruned bucket) and the exact predicate is re-applied on the surviving
  * rows, so results are byte-identical to an unclustered scan: the oracle
  * for `q_zorder_cluster` is the plain SQL rectangle query on `events`.
  *
  * Scale notes: the build is one tiny min/max aggregate plus one shuffle
  * by bucket (the once-paid layout cost, amortized over every later
  * rectangle query — the q_join_bucketed ledger); the code itself is a
  * chain of codegen'd bit ops (shift/and/or), no UDF. `Bits = 16` per
  * dimension bounds the grid at 65536² cells — finer than any file count
  * a table reaches, and the bucket fan-out is governed independently by
  * `PrefixBits`.
  */
object ZOrderLayout {

  /** Grid resolution per dimension (16-bit ranks → 32-bit Morton codes,
    * comfortably inside a long). */
  val Bits = 16

  /** Bits of Morton prefix promoted to the `zbucket` partition column:
    * 2^PrefixBits directories, PrefixBits/2 bits per dimension (keep it
    * even so buckets decode to exact rectangles). */
  val PrefixBits = 4

  private val MaxCell = (1L << Bits) - 1
  private val FingerprintFile = "_zorder_fingerprint"
  private val MetaFile = "_zorder_meta"

  /** Per-dimension normalization bounds (global min/max of the raw
    * column — metadata-scale, computed once at build). */
  final case class Meta(xMin: Double, xMax: Double, yMin: Double, yMax: Double)

  /** Grid rank of a raw value: floor-scaled into [0, 2^Bits). Monotone
    * non-decreasing in `v`, which is what makes bucket pruning safe. */
  def rankOf(v: Double, mn: Double, mx: Double): Long = {
    val span = if (mx > mn) mx - mn else 1.0
    math.min(MaxCell, math.max(0L, ((v - mn) / span * MaxCell).toLong))
  }

  /** Column form of [[rankOf]] — same floor arithmetic, codegen'd. */
  private def rankCol(c: Column, mn: Double, mx: Double): Column = {
    val span = if (mx > mn) mx - mn else 1.0
    least(greatest(((c.cast("double") - lit(mn)) / lit(span) * lit(MaxCell.toDouble))
      .cast("long"), lit(0L)), lit(MaxCell))
  }

  /** Morton interleave: x's bit i lands at position 2i, y's at 2i+1 (so
    * the most significant pair is (y15, x15)). Pure bit ops — stays in
    * whole-stage codegen. */
  private def interleave(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(x.bitwiseAND(lit(1L << i)), i)
        .bitwiseOR(shiftleft(y.bitwiseAND(lit(1L << i)), i + 1))
    }.reduce(_ bitwiseOR _)

  /** Decoded bounding box of one zbucket: the bucket id's bits are the top
    * PrefixBits/2 bits of each dimension's rank. */
  def bucketBox(b: Int): (Long, Long, Long, Long) = {
    val half = PrefixBits / 2
    var xTop = 0L; var yTop = 0L
    for (i <- 0 until half) {
      // bucket bit 2i is x's rank bit (Bits - half + i); 2i+1 is y's
      xTop |= ((b >> (2 * i)) & 1L) << i
      yTop |= ((b >> (2 * i + 1)) & 1L) << i
    }
    val w = Bits - half
    (xTop << w, ((xTop + 1) << w) - 1, yTop << w, ((yTop + 1) << w) - 1)
  }

  /** Write the clustered copy: one directory per Morton-prefix bucket,
    * rows sorted by the full code within each file. */
  def build(df: DataFrame, xCol: String, yCol: String, path: String): Meta = {
    val spark = df.sparkSession
    val Array(r) = df.agg(
      min(col(xCol).cast("double")), max(col(xCol).cast("double")),
      min(col(yCol).cast("double")), max(col(yCol).cast("double"))).collect()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"cannot z-order an empty input (no rows to derive $xCol/$yCol bounds from)")
    val meta = Meta(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val z = interleave(rankCol(col(xCol), meta.xMin, meta.xMax),
      rankCol(col(yCol), meta.yMin, meta.yMax))
    val storePath = new Path(path)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(storePath)) {
      // Refuse to wipe a directory that is not recognizably a z-order
      // store (the IvfIndex guard): EVERY entry must be a zbucket=*
      // partition dir / a _zorder sidecar / a Spark write marker — one
      // stray recognized entry next to unrelated user files must not
      // authorize a recursive delete of the lot.
      val foreign = fs.listStatus(storePath).toSeq.filterNot { st =>
        val n = st.getPath.getName
        (st.isDirectory && n.startsWith("zbucket=")) || n.startsWith("_zorder") ||
          n == "_SUCCESS" || n.startsWith(".") || n.startsWith("_temporary")
      }
      require(foreign.isEmpty,
        s"refusing to overwrite '$path': it exists but does not look like a " +
          s"z-order store (unexpected entries: ${foreign.map(_.getPath.getName).take(5).mkString(", ")}). " +
          "Delete it explicitly or point build() at a dedicated directory.")
      fs.delete(storePath, true)
    }
    df.withColumn("zkey", z)
      .withColumn("zbucket",
        shiftright(col("zkey"), 2 * Bits - PrefixBits).cast("int"))
      .repartition(col("zbucket"))
      .sortWithinPartitions(col("zbucket"), col("zkey"))
      .drop("zkey")
      .write.mode("overwrite").partitionBy("zbucket").parquet(path)
    IvfIndex.writeSidecar(spark, path, MetaFile,
      s"${meta.xMin},${meta.xMax},${meta.yMin},${meta.yMax}")
    meta
  }

  /** Rebuild only when the input (or the build parameters) changed — the
    * IvfIndex.buildIfNeeded amortization ledger. The fingerprint lands
    * after the data + meta sidecar, so a crashed build has no fingerprint
    * and is rebuilt. Returns true when a build ran. */
  def buildIfNeeded(df: DataFrame, xCol: String, yCol: String, path: String,
                    fingerprint: String): Boolean = {
    val spark = df.sparkSession
    val full = s"$fingerprint:$xCol:$yCol:b$Bits:p$PrefixBits"
    if (IvfIndex.readSidecar(spark, path, FingerprintFile).contains(full)) false
    else {
      build(df, xCol, yCol, path)
      IvfIndex.writeSidecar(spark, path, FingerprintFile, full)
      true
    }
  }

  /** Read back the stored normalization bounds of a built layout. */
  def readMeta(spark: SparkSession, path: String): Meta = {
    val raw = IvfIndex.readSidecar(spark, path, MetaFile)
      .getOrElse(sys.error(s"$path is not a z-order store (no $MetaFile)"))
    val Array(a, b, c, d) = raw.split(',').map(_.toDouble)
    Meta(a, b, c, d)
  }

  /** Rectangle query over the clustered layout: decode the query corners
    * to grid ranks, keep only buckets whose bounding box intersects, and
    * re-apply the exact predicate. The bucket list is a plan-time literal
    * IN — Catalyst prunes the partition directories at file listing. */
  def queryRect(spark: SparkSession, path: String, xCol: String, yCol: String,
                xLo: Double, xHi: Double, yLo: Double, yHi: Double): DataFrame = {
    val m = readMeta(spark, path)
    val (qxLo, qxHi) = (rankOf(xLo, m.xMin, m.xMax), rankOf(xHi, m.xMin, m.xMax))
    val (qyLo, qyHi) = (rankOf(yLo, m.yMin, m.yMax), rankOf(yHi, m.yMin, m.yMax))
    val buckets = (0 until (1 << PrefixBits)).filter { b =>
      val (bxLo, bxHi, byLo, byHi) = bucketBox(b)
      bxLo <= qxHi && qxLo <= bxHi && byLo <= qyHi && qyLo <= byHi
    }
    spark.read.parquet(path)
      .where(col("zbucket").isin(buckets: _*) &&
        col(xCol) >= xLo && col(xCol) <= xHi &&
        col(yCol) >= yLo && col(yCol) <= yHi)
  }
}
