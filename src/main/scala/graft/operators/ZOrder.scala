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
  * clustered. The Morton code interleaves the bits of the dimensions'
  * grid ranks round-robin, so sorting by it places rows that are close in
  * the k-dimensional value space close in the file layout:
  *
  *   - the TOP prefix bits of the code become an explicit `zbucket`
  *     partition directory. A prefix of the interleaved code is itself a
  *     BOX in rank space (k·h prefix bits pin the top h bits of every
  *     dimension), so the driver can decode each bucket's exact bounding
  *     box and turn a query box into a `zbucket IN (…)` partition
  *     filter — pruning at the FILE-LISTING level, before any footer is
  *     opened (same mechanism the IVF store uses for cells);
  *   - WITHIN each bucket, rows are sorted by the full code, so every
  *     dimension's per-row-group min/max footer stats stay tight and the
  *     pushed-down residual predicate skips row groups inside the
  *     surviving buckets.
  *
  * The bucket filter is CONSERVATIVE by construction (a bucket is read iff
  * its decoded bounding box intersects the query box — grid ranks are
  * monotone in the raw values, so no qualifying row can live in a pruned
  * bucket) and the exact predicate is re-applied on the surviving rows, so
  * results are byte-identical to an unclustered scan: the oracle for
  * `q_zorder_cluster` is the plain SQL rectangle query on `events`.
  *
  * Dimensionality: 2-D is the canonical special case (16-bit ranks,
  * 32-bit codes, 4-bit prefix = 16 bucket dirs); k dimensions interleave
  * round-robin with `bitsFor(k) = min(16, 63/k)` bits per dimension (the
  * code must fit a long) and `2k` prefix bits (4^k buckets, 2 bits per
  * dimension — the same per-dim fan-out at every k). All layout
  * parameters are pure functions of k, so a store's geometry is fully
  * determined by its meta sidecar's bound count — nothing else to record,
  * nothing to version.
  *
  * Scale notes: the build is one tiny min/max aggregate plus one shuffle
  * by bucket (the once-paid layout cost, amortized over every later
  * rectangle query — the q_join_bucketed ledger); the code itself is a
  * chain of codegen'd bit ops (shift/and/or), no UDF.
  */
object ZOrderLayout {

  /** Grid resolution per dimension in 2-D (16-bit ranks → 32-bit Morton
    * codes, comfortably inside a long). */
  val Bits = 16

  /** Bits of Morton prefix promoted to the `zbucket` partition column in
    * 2-D: 2^PrefixBits directories, PrefixBits/2 bits per dimension. */
  val PrefixBits = 4

  /** Per-dimension rank width for a k-dim layout: the full 16 while k·bits
    * fits a long's positive range, degrading evenly past 3 dimensions. */
  def bitsFor(k: Int): Int = math.min(Bits, 63 / k)

  /** Prefix bits for a k-dim layout: 2 per dimension (4^k bucket dirs) —
    * the 2-D PrefixBits rule at every k. */
  def prefixFor(k: Int): Int = 2 * k

  private val MaxCell = (1L << Bits) - 1
  private val FingerprintFile = "_zorder_fingerprint"
  private val MetaFile = "_zorder_meta"

  /** Per-dimension normalization bounds (global min/max of the raw
    * column — metadata-scale, computed once at build). */
  final case class Meta(xMin: Double, xMax: Double, yMin: Double, yMax: Double)

  /** k-dimensional bounds, one (min, max) per clustered column in build
    * order. `k = bounds.length` determines the whole layout geometry. */
  final case class MetaN(bounds: Seq[(Double, Double)]) {
    def k: Int = bounds.length
  }

  /** Grid rank of a raw value: floor-scaled into [0, maxCell]. Monotone
    * non-decreasing in `v`, which is what makes bucket pruning safe. */
  def rankOf(v: Double, mn: Double, mx: Double, maxCell: Long = MaxCell): Long = {
    val span = if (mx > mn) mx - mn else 1.0
    math.min(maxCell, math.max(0L, ((v - mn) / span * maxCell).toLong))
  }

  /** Column form of [[rankOf]] — same floor arithmetic, codegen'd. */
  private def rankCol(c: Column, mn: Double, mx: Double, maxCell: Long): Column = {
    val span = if (mx > mn) mx - mn else 1.0
    least(greatest(((c.cast("double") - lit(mn)) / lit(span) * lit(maxCell.toDouble))
      .cast("long"), lit(0L)), lit(maxCell))
  }

  /** Round-robin Morton interleave: dimension j's bit i lands at output
    * position i·k + j (so the most significant group is every dimension's
    * top bit, last dimension highest). Pure bit ops — stays in
    * whole-stage codegen. The 2-D layout (x bit i → 2i, y bit i → 2i+1)
    * is exactly the k = 2 case. */
  private def interleaveN(ranks: Seq[Column], bits: Int): Column = {
    val k = ranks.length
    (for (j <- 0 until k; i <- 0 until bits) yield
      shiftleft(ranks(j).bitwiseAND(lit(1L << i)), i * (k - 1) + j))
      .reduce(_ bitwiseOR _)
  }

  /** Decoded bounding box of one zbucket in 2-D — see [[bucketBoxN]]. */
  def bucketBox(b: Int): (Long, Long, Long, Long) = {
    val Seq((xLo, xHi), (yLo, yHi)) = bucketBoxN(b, 2, Bits, PrefixBits)
    (xLo, xHi, yLo, yHi)
  }

  /** Decoded per-dimension rank box of one zbucket: the bucket id's bits
    * are the top `prefix/k` bits of each dimension's rank (bucket bit
    * i·k + j is dimension j's rank bit `bits - prefix/k + i`). */
  def bucketBoxN(b: Int, k: Int, bits: Int, prefix: Int): Seq[(Long, Long)] = {
    val h = prefix / k
    (0 until k).map { j =>
      var top = 0L
      for (i <- 0 until h) top |= ((b >> (i * k + j)) & 1L) << i
      val w = bits - h
      (top << w, ((top + 1) << w) - 1)
    }
  }

  /** Write the clustered copy: one directory per Morton-prefix bucket,
    * rows sorted by the full code within each file. 2-D special case of
    * [[buildN]] (identical bytes and bucket numbering). */
  def build(df: DataFrame, xCol: String, yCol: String, path: String): Meta = {
    val m = buildN(df, Seq(xCol, yCol), path)
    Meta(m.bounds(0)._1, m.bounds(0)._2, m.bounds(1)._1, m.bounds(1)._2)
  }

  /** k-dimensional clustered build. ≥2 columns (a single column wants a
    * plain sort, not a space-filling curve); ≤8 keeps the 4^k bucket
    * fan-out a directory count, not a partition explosion. */
  /** Morton code as a plain Column over raw columns with given bounds —
    * the reusable kernel behind [[buildN]], exposed for
    * `TsTable.compact(clusterBy = …)`: a governed day rewrite sorts by
    * this code instead of ts, so the day's files become 2-D (or k-D)
    * tiles and the per-file colStats spans turn rectangle predicates
    * into file skips. Same rank + interleave arithmetic as the
    * standalone store build; pure codegen'd bit ops. */
  def codeColumn(cols: Seq[Column], bounds: Seq[(Double, Double)]): Column = {
    require(cols.length >= 2 && cols.length == bounds.length,
      s"codeColumn: need >= 2 columns with one (min,max) each, " +
        s"got ${cols.length} cols / ${bounds.length} bounds")
    val k = cols.length
    val bits = bitsFor(k)
    val maxCell = (1L << bits) - 1
    interleaveN(
      cols.zip(bounds).map { case (c, (mn, mx)) => rankCol(c, mn, mx, maxCell) },
      bits)
  }

  def buildN(df: DataFrame, cols: Seq[String], path: String): MetaN = {
    require(cols.length >= 2, "z-order needs at least 2 columns (use a plain sort for 1)")
    require(cols.length <= 8, s"z-order supports up to 8 dimensions, got ${cols.length}")
    val k = cols.length
    val bits = bitsFor(k)
    val maxCell = (1L << bits) - 1
    val spark = df.sparkSession
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val r = df.agg(aggs.head, aggs.tail: _*).head
    require(!r.isNullAt(0),
      s"cannot z-order an empty input (no rows to derive ${cols.mkString("/")} bounds from)")
    val meta = MetaN(cols.indices.map(j => (r.getDouble(2 * j), r.getDouble(2 * j + 1))))
    val z = interleaveN(
      cols.indices.map(j =>
        rankCol(col(cols(j)), meta.bounds(j)._1, meta.bounds(j)._2, maxCell)),
      bits)
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
        shiftright(col("zkey"), k * bits - prefixFor(k)).cast("int"))
      .repartition(col("zbucket"))
      .sortWithinPartitions(col("zbucket"), col("zkey"))
      .drop("zkey")
      .write.mode("overwrite").partitionBy("zbucket").parquet(path)
    IvfIndex.writeSidecar(spark, path, MetaFile,
      meta.bounds.flatMap(b => Seq(b._1, b._2)).mkString(","))
    meta
  }

  /** Rebuild only when the input (or the build parameters) changed — the
    * IvfIndex.buildIfNeeded amortization ledger. The fingerprint lands
    * after the data + meta sidecar, so a crashed build has no fingerprint
    * and is rebuilt. Returns true when a build ran. */
  def buildIfNeeded(df: DataFrame, xCol: String, yCol: String, path: String,
                    fingerprint: String): Boolean =
    buildIfNeededN(df, Seq(xCol, yCol), path, fingerprint)

  /** k-dim [[buildIfNeeded]]. The parameter tag pins the full geometry
    * (column list, per-dim bits, prefix), so a store built at another
    * dimensionality under the same path rebuilds rather than mis-serves.
    * For k = 2 the tag reduces to the historical `x:y:b16:p4` form —
    * existing 2-D stores stay amortized. */
  def buildIfNeededN(df: DataFrame, cols: Seq[String], path: String,
                     fingerprint: String): Boolean = {
    val spark = df.sparkSession
    val k = cols.length
    val full = s"$fingerprint:${cols.mkString(":")}:b${bitsFor(k)}:p${prefixFor(k)}"
    if (IvfIndex.readSidecar(spark, path, FingerprintFile).contains(full)) false
    else {
      buildN(df, cols, path)
      IvfIndex.writeSidecar(spark, path, FingerprintFile, full)
      true
    }
  }

  /** Read back the stored normalization bounds of a 2-D layout. */
  def readMeta(spark: SparkSession, path: String): Meta = {
    val m = readMetaN(spark, path)
    require(m.k == 2, s"$path is a ${m.k}-dimensional z-order store, not 2-D")
    Meta(m.bounds(0)._1, m.bounds(0)._2, m.bounds(1)._1, m.bounds(1)._2)
  }

  /** Stored bounds of a built layout at any dimensionality (the sidecar
    * is the flat min,max list per dimension; its length IS the k). */
  def readMetaN(spark: SparkSession, path: String): MetaN = {
    val raw = IvfIndex.readSidecar(spark, path, MetaFile)
      .getOrElse(sys.error(s"$path is not a z-order store (no $MetaFile)"))
    val ds = raw.split(',').map(_.toDouble)
    require(ds.length >= 4 && ds.length % 2 == 0,
      s"$path has a malformed z-order meta sidecar (${ds.length} values)")
    MetaN(ds.grouped(2).map(a => (a(0), a(1))).toSeq)
  }

  /** 2-D rectangle query — the k = 2 case of [[queryBox]]. */
  def queryRect(spark: SparkSession, path: String, xCol: String, yCol: String,
                xLo: Double, xHi: Double, yLo: Double, yHi: Double): DataFrame =
    queryBox(spark, path, Seq(xCol, yCol), Seq(xLo, yLo), Seq(xHi, yHi))

  /** k-dimensional box query over the clustered layout: decode the query
    * corners to grid ranks, keep only buckets whose bounding box
    * intersects, and re-apply the exact predicate. The bucket list is a
    * plan-time literal IN — Catalyst prunes the partition directories at
    * file listing. */
  def queryBox(spark: SparkSession, path: String, cols: Seq[String],
               lo: Seq[Double], hi: Seq[Double]): DataFrame = {
    val m = readMetaN(spark, path)
    val k = cols.length
    require(m.k == k,
      s"$path is a ${m.k}-dimensional z-order store; queried with $k columns")
    require(lo.length == k && hi.length == k,
      s"queryBox needs one (lo, hi) pair per column")
    val bits = bitsFor(k)
    val maxCell = (1L << bits) - 1
    val qr = cols.indices.map { j =>
      (rankOf(lo(j), m.bounds(j)._1, m.bounds(j)._2, maxCell),
        rankOf(hi(j), m.bounds(j)._1, m.bounds(j)._2, maxCell))
    }
    val buckets = (0 until (1 << prefixFor(k))).filter { b =>
      bucketBoxN(b, k, bits, prefixFor(k)).zip(qr).forall {
        case ((bLo, bHi), (qLo, qHi)) => bLo <= qHi && qLo <= bHi
      }
    }
    spark.read.parquet(path)
      .where(cols.indices.map(j =>
        col(cols(j)) >= lo(j) && col(cols(j)) <= hi(j))
        .foldLeft(col("zbucket").isin(buckets: _*))(_ && _))
  }
}
