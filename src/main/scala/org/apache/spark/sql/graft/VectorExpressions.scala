package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two array<double> columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * evaluated interpreted — per-element lambda dispatch plus re-evaluation of
  * invariant subtrees — which makes wide-vector workloads (64 hyperplane
  * projections × 64 dims per row in the LSH operators) orders of magnitude
  * slower than generated code. This Expression emits a tight fused
  * multiply-add loop into whole-stage codegen instead, the exact pattern the
  * project brief prescribes for operators Spark's builtins can't express
  * efficiently.
  *
  * Semantics match the HOF/DuckDB formulation bit-for-bit: strictly
  * sequential left-to-right IEEE accumulation, so oracle hash-parity is
  * preserved. Null arrays propagate null (nullIntolerant); null ELEMENTS are
  * treated as 0.0 contribution-wise rejection is the caller's job (the
  * engine's vector columns are containsNull=false).
  *
  * This file lives under org.apache.spark.sql because the Column <-> catalyst
  * Expression bridge (`classic.ExpressionUtils`) is private[sql]; it contains
  * only the bridge call and the expression itself.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd multi-table random-hyperplane LSH keys (Charikar,
  * STOC'02) for a dense vector.
  *
  * For `T = planes.length / planesPerTable` tables of `b = planesPerTable`
  * sign bits each:
  *
  *   bit_j  = ⟨vec, planes(j)⟩ > 0
  *   key_l  = (l << b) | bits of table l   (table-index tag ⇒ keys from
  *                                          different tables can never
  *                                          collide in an equi-join)
  *
  * With `expandBits = true` (multiprobe, Lv et al., VLDB'07 — the classic
  * probing-sequence idea reduced to radius 1), each table additionally
  * emits the b keys at Hamming distance 1 in the bit positions (the tag
  * bits are never flipped, so probes stay inside their table). Joining
  * plain keys on one side against expanded keys on the other matches every
  * pair whose table signature differs in ≤ 1 bit — multiplying per-table
  * recall several-fold while candidate volume grows only (b+1)/2ᵇ.
  *
  * The pre-r3 formulation (`transform(typedLit(planes), w => ...)` +
  * `aggregate(slice(...))`) evaluated every plane projection as an
  * interpreted higher-order lambda — T·b interpreted dot products per row.
  * Here the plane matrix is a codegen reference object and the whole key
  * computation is one fused loop nest inside whole-stage codegen.
  */
case class HyperplaneKeys(child: Expression, planes: Seq[Seq[Double]],
                          planesPerTable: Int, expandBits: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(planes.nonEmpty && planes.length % planesPerTable == 0,
    s"${planes.length} planes not divisible into tables of $planesPerTable")

  private val dim = planes.head.length
  private val numTables = planes.length / planesPerTable
  private val keysPerTable = if (expandBits) planesPerTable + 1 else 1

  @transient private lazy val flat: Array[Double] = planes.flatten.toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hyperplane_keys"

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val keys = new Array[Long](numTables * keysPerTable)
    val b = planesPerTable
    var pos = 0
    var l = 0
    while (l < numTables) {
      var key = l.toLong
      var j = 0
      while (j < b) {
        val off = (l * b + j) * dim
        val m = math.min(dim, v.numElements())
        var s = 0.0
        var d = 0
        while (d < m) {
          if (!v.isNullAt(d)) s += flat(off + d) * v.getDouble(d)
          d += 1
        }
        key = (key << 1) | (if (s > 0) 1L else 0L)
        j += 1
      }
      keys(pos) = key; pos += 1
      if (expandBits) {
        var j = 0
        while (j < b) { keys(pos) = key ^ (1L << j); pos += 1; j += 1 }
      }
      l += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", flat, "double[]")
      val keys = ctx.freshName("keys")
      val pos = ctx.freshName("pos")
      val l = ctx.freshName("l")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val key = ctx.freshName("key")
      val off = ctx.freshName("off")
      val b = planesPerTable
      val expandCode = if (expandBits)
        s"for (int $j = 0; $j < $b; $j++) { $keys[$pos++] = $key ^ (1L << $j); }"
      else ""
      s"""
         |long[] $keys = new long[${numTables * keysPerTable}];
         |int $pos = 0;
         |int $m = java.lang.Math.min($dim, $a.numElements());
         |for (int $l = 0; $l < $numTables; $l++) {
         |  long $key = (long) $l;
         |  for (int $j = 0; $j < $b; $j++) {
         |    int $off = ($l * $b + $j) * $dim;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $m; $d++) {
         |      if (!$a.isNullAt($d)) $s += $p[$off + $d] * $a.getDouble($d);
         |    }
         |    $key = ($key << 1) | (($s > 0) ? 1L : 0L);
         |  }
         |  $keys[$pos++] = $key;
         |  $expandCode
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneKeys =
    copy(child = newChild)
}

/** Native codegen'd nearest-centroid probe for IVF-style ANN: the
  * `nProbe` centroid indices closest (squared L2) to the input vector,
  * nearest first. The centroid matrix is a plan-time constant (trained
  * from a bounded sample at index-build time), embedded as a codegen
  * reference object — one fused distance loop per row, no per-centroid
  * interpreted lambdas. Ties break toward the lower centroid index, so
  * assignment is deterministic. */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]],
                            nProbe: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(centroids.nonEmpty && nProbe >= 1 && nProbe <= centroids.length,
    s"nProbe=$nProbe must be in [1, ${centroids.length}]")

  private val dim = centroids.head.length
  private val c = centroids.length

  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nearest_centroids"

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val m = math.min(dim, v.numElements())
    val bestIdx = new Array[Int](nProbe)
    val bestD = Array.fill(nProbe)(Double.MaxValue)
    var j = 0
    while (j < c) {
      var d = 0.0
      var t = 0
      while (t < m) {
        if (!v.isNullAt(t)) {
          val diff = v.getDouble(t) - flat(j * dim + t)
          d += diff * diff
        }
        t += 1
      }
      // insertion into the small sorted top-nProbe arrays (strict <:
      // equal distances keep the earlier/lower centroid index)
      var p = nProbe - 1
      if (d < bestD(p)) {
        while (p > 0 && d < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestIdx(p) = bestIdx(p - 1); p -= 1
        }
        bestD(p) = d; bestIdx(p) = j
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cm = ctx.addReferenceObj("centroids", flat, "double[]")
      val bi = ctx.freshName("bestIdx")
      val bd = ctx.freshName("bestD")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val m = ctx.freshName("m")
      val d = ctx.freshName("d")
      val df = ctx.freshName("diff")
      val p = ctx.freshName("p")
      s"""
         |int $m = java.lang.Math.min($dim, $a.numElements());
         |int[] $bi = new int[$nProbe];
         |double[] $bd = new double[$nProbe];
         |java.util.Arrays.fill($bd, Double.MAX_VALUE);
         |for (int $j = 0; $j < $c; $j++) {
         |  double $d = 0.0;
         |  for (int $t = 0; $t < $m; $t++) {
         |    if (!$a.isNullAt($t)) {
         |      double $df = $a.getDouble($t) - $cm[$j * $dim + $t];
         |      $d += $df * $df;
         |    }
         |  }
         |  int $p = $nProbe - 1;
         |  if ($d < $bd[$p]) {
         |    while ($p > 0 && $d < $bd[$p - 1]) {
         |      $bd[$p] = $bd[$p - 1]; $bi[$p] = $bi[$p - 1]; $p--;
         |    }
         |    $bd[$p] = $d; $bi[$p] = $j;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bi);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** Native codegen'd 8-bit scalar quantization of a dense vector (the SQ8
  * of FAISS / Jégou et al.'s IVF line): per-vector asymmetric min/range
  * coding, `code[i] = round((v[i] − min) / (max − min) · 255)`, one byte
  * per dimension. The code rides as a compact BINARY column next to the
  * full vector; parquet column pruning then lets an approximate scan read
  * 1 byte/dim instead of 8 — the ~8× probe-I/O cut — while survivors are
  * rescored from the untouched full column. The (min, scale) pair is NOT
  * embedded in the code bytes: callers store `array_min(v)` and
  * `array_max(v) − array_min(v)` as ordinary columns (exact same IEEE
  * values this expression computes), keeping the decode side join-free. */
case class SqEncode(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sq_encode"

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val n = v.numElements()
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val x = if (v.isNullAt(i)) 0.0 else v.getDouble(i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    val sc = mx - mn
    val out = new Array[Byte](n)
    if (sc > 0) {
      i = 0
      while (i < n) {
        val x = if (v.isNullAt(i)) 0.0 else v.getDouble(i)
        out(i) = Math.round((x - mn) / sc * 255.0).toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mn = ctx.freshName("mn")
      val mx = ctx.freshName("mx")
      val sc = ctx.freshName("sc")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $mn = Double.POSITIVE_INFINITY;
         |double $mx = Double.NEGATIVE_INFINITY;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |  if ($x < $mn) $mn = $x;
         |  if ($x > $mx) $mx = $x;
         |}
         |double $sc = $mx - $mn;
         |byte[] $out = new byte[$n];
         |if ($sc > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |    $out[$i] = (byte) Math.round(($x - $mn) / $sc * 255.0);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SqEncode =
    copy(child = newChild)
}

/** Native codegen'd cosine between an SQ8-coded vector ([[SqEncode]]) and
  * a full-precision probe: one fused loop dequantizes each byte
  * (`min + code·scale/255`) and accumulates dot and both norms — no
  * intermediate array, no decode column. Zero-norm degenerate inputs
  * yield 0.0 (not NaN) so approximate rankings stay total-ordered. */
case class SqCosine(code: Expression, qmin: Expression, qscale: Expression,
                    probe: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {

  override def first: Expression = code
  override def second: Expression = qmin
  override def third: Expression = qscale
  override def fourth: Expression = probe

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType, DoubleType, DoubleType,
      ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sq_cosine"

  override def nullSafeEval(c: Any, mn: Any, sc: Any, p: Any): Any = {
    val code = c.asInstanceOf[Array[Byte]]
    val lo = mn.asInstanceOf[Double]
    val step = sc.asInstanceOf[Double] / 255.0
    val pv = p.asInstanceOf[ArrayData]
    val n = math.min(code.length, pv.numElements())
    var dot = 0.0; var nv = 0.0; var np = 0.0
    var i = 0
    while (i < n) {
      val vi = lo + (code(i) & 0xFF) * step
      val pi = if (pv.isNullAt(i)) 0.0 else pv.getDouble(i)
      dot += vi * pi; nv += vi * vi; np += pi * pi
      i += 1
    }
    val den = math.sqrt(nv) * math.sqrt(np)
    if (den == 0.0) 0.0 else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, mn, sc, p) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val step = ctx.freshName("step")
      val dot = ctx.freshName("dot")
      val nv = ctx.freshName("nv")
      val np = ctx.freshName("np")
      val vi = ctx.freshName("vi")
      val pi = ctx.freshName("pi")
      val den = ctx.freshName("den")
      s"""
         |int $n = java.lang.Math.min($c.length, $p.numElements());
         |double $step = $sc / 255.0;
         |double $dot = 0.0; double $nv = 0.0; double $np = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $vi = $mn + ($c[$i] & 0xFF) * $step;
         |  double $pi = $p.isNullAt($i) ? 0.0 : $p.getDouble($i);
         |  $dot += $vi * $pi; $nv += $vi * $vi; $np += $pi * $pi;
         |}
         |double $den = java.lang.Math.sqrt($nv) * java.lang.Math.sqrt($np);
         |${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression, third: Expression,
      fourth: Expression): SqCosine =
    copy(code = first, qmin = second, qscale = third, probe = fourth)
}

/** Native codegen'd PRODUCT quantization of a dense vector (Jégou et al.
  * '11, "Product Quantization for Nearest Neighbor Search"): the vector
  * splits into M contiguous subspaces of dim/M components; each subvector
  * is replaced by the index of its nearest codebook centroid (K ≤ 256 per
  * subspace, trained offline), giving an M-BYTE code — for dim 64 doubles
  * that is 512 B → 8 B, a 64× cut where SQ8's is 8×. The codebooks ride in
  * the expression (plan-time constants, like [[NearestCentroids]]);
  * distinct-subspace codebooks are the standard PQ layout. Argmin ties
  * keep the LOWER centroid index (strict <), so codes are deterministic. */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ImplicitCastInputTypes {

  private val m = codebooks.length
  require(m >= 1, "PQ needs at least one subspace")
  private val kk = codebooks.head.length
  require(kk >= 1 && kk <= 256, s"PQ codebook size $kk must be in 1..256 (one byte per code)")
  require(codebooks.forall(_.length == kk), "ragged PQ codebooks (unequal K)")
  private val sub = codebooks.head.head.length
  require(codebooks.forall(_.forall(_.length == sub)),
    "ragged PQ codebooks (unequal subspace dim)")

  @transient private lazy val flat: Array[Double] =
    codebooks.flatten.flatten.toArray // [(m*kk + k)*sub + t]

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < kk) {
        var d = 0.0
        var t = 0
        while (t < sub) {
          val idx = mi * sub + t
          val x = if (idx < n && !v.isNullAt(idx)) v.getDouble(idx) else 0.0
          val diff = x - flat((mi * kk + c) * sub + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val idx = ctx.freshName("idx")
      val x = ctx.freshName("x")
      val d = ctx.freshName("d")
      val df = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $kk; $c++) {
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $sub; $t++) {
         |      int $idx = $mi * $sub + $t;
         |      double $x = ($idx < $n && !$a.isNullAt($idx)) ? $a.getDouble($idx) : 0.0;
         |      double $df = $x - $cb[($mi * $kk + $c) * $sub + $t];
         |      $d += $df * $df;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $out[$mi] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Native codegen'd cosine between a PQ code ([[PqEncode]]) and a
  * full-precision probe: one fused loop walks the M codebook entries the
  * code names and accumulates dot and both norms against the probe — the
  * asymmetric-distance evaluation of Jégou '11 §IV (probe exact, database
  * side reconstructed), no intermediate reconstructed array. Zero-norm
  * degenerate inputs yield 0.0 (not NaN), the [[SqCosine]] rule. */
case class PqCosine(code: Expression, probe: Expression,
                    codebooks: Seq[Seq[Seq[Double]]])
    extends BinaryExpression with ImplicitCastInputTypes {

  private val m = codebooks.length
  private val kk = codebooks.head.length
  private val sub = codebooks.head.head.length

  @transient private lazy val flat: Array[Double] =
    codebooks.flatten.flatten.toArray

  override def left: Expression = code
  override def right: Expression = probe
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_cosine"

  override def nullSafeEval(c: Any, p: Any): Any = {
    val code = c.asInstanceOf[Array[Byte]]
    val pv = p.asInstanceOf[ArrayData]
    val n = pv.numElements()
    val mm = math.min(m, code.length)
    var dot = 0.0; var nv = 0.0; var np = 0.0
    var mi = 0
    while (mi < mm) {
      val cBase = (mi * kk + (code(mi) & 0xFF)) * sub
      var t = 0
      while (t < sub) {
        val idx = mi * sub + t
        val vi = flat(cBase + t)
        val pi = if (idx < n && !pv.isNullAt(idx)) pv.getDouble(idx) else 0.0
        dot += vi * pi; nv += vi * vi; np += pi * pi
        t += 1
      }
      mi += 1
    }
    val den = math.sqrt(nv) * math.sqrt(np)
    if (den == 0.0) 0.0 else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, p) => {
      val cb = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
      val n = ctx.freshName("n")
      val mm = ctx.freshName("mm")
      val mi = ctx.freshName("mi")
      val t = ctx.freshName("t")
      val idx = ctx.freshName("idx")
      val cBase = ctx.freshName("cBase")
      val vi = ctx.freshName("vi")
      val pi = ctx.freshName("pi")
      val dot = ctx.freshName("dot")
      val nv = ctx.freshName("nv")
      val np = ctx.freshName("np")
      val den = ctx.freshName("den")
      s"""
         |int $n = $p.numElements();
         |int $mm = java.lang.Math.min($m, $c.length);
         |double $dot = 0.0; double $nv = 0.0; double $np = 0.0;
         |for (int $mi = 0; $mi < $mm; $mi++) {
         |  int $cBase = ($mi * $kk + ($c[$mi] & 0xFF)) * $sub;
         |  for (int $t = 0; $t < $sub; $t++) {
         |    int $idx = $mi * $sub + $t;
         |    double $vi = $cb[$cBase + $t];
         |    double $pi = ($idx < $n && !$p.isNullAt($idx)) ? $p.getDouble($idx) : 0.0;
         |    $dot += $vi * $pi; $nv += $vi * $vi; $np += $pi * $pi;
         |  }
         |}
         |double $den = java.lang.Math.sqrt($nv) * java.lang.Math.sqrt($np);
         |${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCosine =
    copy(code = newLeft, probe = newRight)
}

/** Native codegen'd ADC dot-product table (Jégou '11 §V, asymmetric
  * distance computation): for one probe, the M×K partial inner products
  * ip(p_m, c_{m,k}), flattened as `tab[m*K + k]`. Built ONCE per probe row
  * (M·K·sub multiplies) and carried as a column into the candidate join,
  * it turns per-candidate scoring from O(dim) reconstruction into O(M)
  * table lookups — the standard PQ trick, profitable once candidates per
  * probe exceed ~K (always true at corpus scale; at spec scale it roughly
  * breaks even, which [[PqCosineTabled]]'s scaladoc spells out). */
case class PqDotTable(probe: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ImplicitCastInputTypes {

  private val m = codebooks.length
  private val kk = codebooks.head.length
  private val sub = codebooks.head.head.length

  @transient private lazy val flat: Array[Double] =
    codebooks.flatten.flatten.toArray

  override def child: Expression = probe
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_dot_table"

  override def nullSafeEval(p: Any): Any = {
    val pv = p.asInstanceOf[ArrayData]
    val n = pv.numElements()
    val tab = new Array[Double](m * kk)
    var mi = 0
    while (mi < m) {
      var c = 0
      while (c < kk) {
        var d = 0.0
        var t = 0
        while (t < sub) {
          val idx = mi * sub + t
          val pi = if (idx < n && !pv.isNullAt(idx)) pv.getDouble(idx) else 0.0
          d += flat((mi * kk + c) * sub + t) * pi
          t += 1
        }
        tab(mi * kk + c) = d
        c += 1
      }
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(tab)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => {
      val cb = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
      val n = ctx.freshName("n")
      val tab = ctx.freshName("tab")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val idx = ctx.freshName("idx")
      val pi = ctx.freshName("pi")
      val d = ctx.freshName("d")
      s"""
         |int $n = $p.numElements();
         |double[] $tab = new double[${m * kk}];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  for (int $c = 0; $c < $kk; $c++) {
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $sub; $t++) {
         |      int $idx = $mi * $sub + $t;
         |      double $pi = ($idx < $n && !$p.isNullAt($idx)) ? $p.getDouble($idx) : 0.0;
         |      $d += $cb[($mi * $kk + $c) * $sub + $t] * $pi;
         |    }
         |    $tab[$mi * $kk + $c] = $d;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tab);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqDotTable =
    copy(probe = newChild)
}

/** Table-driven PQ cosine: M lookups into the probe's [[PqDotTable]] for
  * the dot product, M lookups into the STATIC per-centroid squared-norm
  * table (a plan-time constant of the codebooks) for ‖x̂‖, probe norm
  * passed in from the probe frame. Numerically this reorders the
  * [[PqCosine]] summation by subspace — ulp-level differences only, both
  * deterministic; the exact rescore phase absorbs either ranking. */
case class PqCosineTabled(code: Expression, ptab: Expression,
                          pnorm: Expression,
                          codebooks: Seq[Seq[Seq[Double]]])
    extends TernaryExpression with ImplicitCastInputTypes {

  private val m = codebooks.length
  private val kk = codebooks.head.length

  /** ‖c_{m,k}‖² flattened as [m*K + k] — probe-independent. */
  @transient private lazy val normSq: Array[Double] =
    codebooks.flatMap(_.map(c => c.map(x => x * x).sum)).toArray

  override def first: Expression = code
  override def second: Expression = ptab
  override def third: Expression = pnorm
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType, ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_cosine_tabled"

  override def nullSafeEval(c: Any, tb: Any, pn: Any): Any = {
    val code = c.asInstanceOf[Array[Byte]]
    val tab = tb.asInstanceOf[ArrayData]
    val np = pn.asInstanceOf[Double]
    val mm = math.min(m, code.length)
    var dot = 0.0; var nv = 0.0
    var mi = 0
    while (mi < mm) {
      val j = mi * kk + (code(mi) & 0xFF)
      dot += tab.getDouble(j)
      nv += normSq(j)
      mi += 1
    }
    val den = math.sqrt(nv) * np
    if (den == 0.0) 0.0 else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, tb, pn) => {
      val ns = ctx.addReferenceObj("pqNormSq", normSq, "double[]")
      val mm = ctx.freshName("mm")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val nv = ctx.freshName("nv")
      val den = ctx.freshName("den")
      s"""
         |int $mm = java.lang.Math.min($m, $c.length);
         |double $dot = 0.0; double $nv = 0.0;
         |for (int $mi = 0; $mi < $mm; $mi++) {
         |  int $j = $mi * $kk + ($c[$mi] & 0xFF);
         |  $dot += $tb.getDouble($j);
         |  $nv += $ns[$j];
         |}
         |double $den = java.lang.Math.sqrt($nv) * $pn;
         |${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqCosineTabled =
    copy(code = newFirst, ptab = newSecond, pnorm = newThird)
}

/** Column-level face of the native expressions (the only place that needs
  * the private[sql] bridge). */
object VectorExprs {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def hyperplaneKeys(vec: Column, planes: Seq[Seq[Double]],
                     planesPerTable: Int, expandBits: Boolean = false): Column =
    ExpressionUtils.column(HyperplaneKeys(
      ExpressionUtils.expression(vec), planes, planesPerTable, expandBits))

  def nearestCentroids(vec: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    ExpressionUtils.column(NearestCentroids(
      ExpressionUtils.expression(vec), centroids, nProbe))

  def sqEncode(vec: Column): Column =
    ExpressionUtils.column(SqEncode(ExpressionUtils.expression(vec)))

  def sqCosine(code: Column, qmin: Column, qscale: Column, probe: Column): Column =
    ExpressionUtils.column(SqCosine(
      ExpressionUtils.expression(code), ExpressionUtils.expression(qmin),
      ExpressionUtils.expression(qscale), ExpressionUtils.expression(probe)))

  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(vec), codebooks))

  def pqCosine(code: Column, probe: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqCosine(
      ExpressionUtils.expression(code), ExpressionUtils.expression(probe), codebooks))

  def pqDotTable(probe: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqDotTable(ExpressionUtils.expression(probe), codebooks))

  def pqCosineTabled(code: Column, ptab: Column, pnorm: Column,
                     codebooks: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqCosineTabled(
      ExpressionUtils.expression(code), ExpressionUtils.expression(ptab),
      ExpressionUtils.expression(pnorm), codebooks))
}
