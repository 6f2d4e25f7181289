package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Native codegen'd SimHash-64 (Charikar, STOC'02) over a token array.
  *
  * Semantics — identical to the higher-order-function formulation it
  * replaces (NearDedup.simhash64 pre-r3):
  *
  *   h_i       = xxhash64(token_i)           (seed 42, the builtin's default;
  *                                            null tokens hash to the seed,
  *                                            matching builtin xxhash64(null))
  *   vote[b]   = Σ_i (bit b of h_i ? +1 : −1)
  *   result    = fold b = 0..63: acc := (acc << 1) | (vote[b] > 0)
  *
  * The HOF form (`transform(sequence(0,63), b => aggregate(hashes, ...))`)
  * runs interpreted and makes 64 passes over the token-hash array per row —
  * the exact anti-pattern the repo measured ~100× slow for dot product. This
  * expression does ONE pass per row (64 vote updates per token are 64
  * shift-mask-adds on a register value) inside whole-stage codegen, via the
  * same XXH64 kernel the builtin xxhash64 uses, so fingerprints are
  * bit-identical to the HOF form (asserted in HashExprSpec).
  *
  * Lives under org.apache.spark.sql because the Column <-> Expression bridge
  * (`classic.ExpressionUtils`) is private[sql].
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"

  private val Seed = 42L // builtin xxhash64's default seed

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) Seed
        else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      sig = (sig << 1) | (if (votes(b) > 0) 1L else 0L)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val xxh = classOf[XXH64].getName
      s"""
         |int[] $votes = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.isNullAt($i) ? ${Seed}L
         |    : $xxh.hashUTF8String($a.getUTF8String($i), ${Seed}L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  $sig = ($sig << 1) | (($votes[$b] > 0) ? 1L : 0L);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Winnowing kernel (Schleimer/Wilkerson/Aiken, SIGMOD'03): k-gram rolling
  * hashes + sliding-window minimum via a monotonic deque — O(len) per
  * document, shared verbatim by interpreted eval and generated code (the
  * codegen path calls this object through a codegen reference). */
object WinnowKernel extends Serializable { // shipped to tasks as a codegen reference object
  private val Seed = 42L // builtin xxhash64's default seed

  /** Distinct, ascending window-min fingerprints of `norm`'s k-grams over
    * w-wide windows (full windows only; a doc with fewer than w grams but
    * ≥ 1 gram contributes the min of what exists — one window). Empty for
    * docs shorter than k chars. Matches the exploded
    * min-over(rowsBetween(0, w-1)) formulation value-for-value. */
  def fingerprints(norm: org.apache.spark.unsafe.types.UTF8String,
                   k: Int, w: Int): Array[Long] = {
    // One pass to find code-point byte offsets, then each k-gram hash reads
    // its byte range in place — calling substring(i, i+k) per gram would
    // re-scan from byte 0 every time (UTF-8 is variable-width): O(len²).
    // hashUnsafeBytes over the same byte range == hashUTF8String of the
    // substring (both hash the raw UTF-8 bytes; parity asserted in
    // LlmPackSpec against the builtin-xxhash64 exploded formulation).
    val nBytes = norm.numBytes()
    val base = norm.getBaseObject
    val off = norm.getBaseOffset
    val charOff = new Array[Int](nBytes + 1)
    var len = 0
    var b = 0
    while (b < nBytes) {
      charOff(len) = b
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + b))
      len += 1
    }
    charOff(len) = nBytes
    val n = len - (k - 1)
    if (n < 1) return Array.emptyLongArray
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      h(i) = XXH64.hashUnsafeBytes(base, off + charOff(i),
        charOff(i + k) - charOff(i), Seed)
      i += 1
    }
    windowMinDistinct(h, w)
  }

  /** md5-bit variant — the cross-engine-replayable twin (same move that
    * oracled the simhash keys: DuckDB shares md5, not xxhash64). Per-gram
    * hash = the first 15 hex digits of md5(gram bytes) read MSB-first,
    * i.e. (first 8 bytes big-endian) >>> 4 — a NON-NEGATIVE 60-bit value,
    * so window minima agree between Java's signed long and the oracle's
    * BIGINT digit-sum without sign gymnastics. Hash collisions cannot break
    * oracle parity (both engines compute identical values); they only dent
    * the MOSS guarantee, negligibly at 60 bits. */
  def fingerprintsMd5(norm: org.apache.spark.unsafe.types.UTF8String,
                      k: Int, w: Int): Array[Long] = {
    val bytes = norm.getBytes
    val nBytes = bytes.length
    val charOff = new Array[Int](nBytes + 1)
    var len = 0
    var b = 0
    while (b < nBytes) {
      charOff(len) = b
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(b))
      len += 1
    }
    charOff(len) = nBytes
    val n = len - (k - 1)
    if (n < 1) return Array.emptyLongArray
    val md = mdLocal.get()
    val d = digestBuf.get() // reused: one 16-B digest per GRAM otherwise
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, charOff(i), charOff(i + k) - charOff(i))
      md.digest(d, 0, 16)
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      h(i) = v >>> 4
      i += 1
    }
    windowMinDistinct(h, w)
  }

  @transient private lazy val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  @transient private lazy val digestBuf =
    new ThreadLocal[Array[Byte]] {
      override def initialValue(): Array[Byte] = new Array[Byte](16)
    }

  /** Shared winnowing tail: min of every w-wide window over the gram-hash
    * sequence (monotonic deque, O(n)), then sorted-distinct. */
  private def windowMinDistinct(h: Array[Long], w: Int): Array[Long] = {
    val n = h.length
    val lastStart = math.max(n - w, 0)
    val out = new Array[Long](lastStart + 1)
    val dq = new Array[Int](n)
    var head = 0; var tail = 0; var e = -1; var m = 0
    var pos = 0
    while (pos <= lastStart) {
      val end = math.min(pos + w - 1, n - 1)
      while (e < end) {
        e += 1
        while (tail > head && h(dq(tail - 1)) >= h(e)) tail -= 1
        dq(tail) = e; tail += 1
      }
      while (dq(head) < pos) head += 1
      out(m) = h(dq(head)); m += 1
      pos += 1
    }
    val trimmed = java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(trimmed)
    var uniq = 0
    var i = 0
    while (i < m) {
      if (i == 0 || trimmed(i) != trimmed(i - 1)) { trimmed(uniq) = trimmed(i); uniq += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(trimmed, uniq)
  }
}

/** Native winnowing fingerprints over a (pre-normalized) string column:
  * array<long> of distinct window-min k-gram hashes. Replaces a
  * per-character posexplode + window-min + re-aggregate pipeline — which
  * materializes O(len) rows per document and shuffles them through a
  * doc-keyed window — with one O(len) kernel call per row inside
  * whole-stage codegen: at 100 TB the fingerprint stage becomes a pure
  * scan (zero shuffles before the caller's own aggregation). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int,
                              md5Bits: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 1 && w >= 1, s"k=$k and w=$w must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow"

  private def method = if (md5Bits) "fingerprintsMd5" else "fingerprints"

  override def nullSafeEval(in: Any): Any = {
    val s = in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (md5Bits) WinnowKernel.fingerprintsMd5(s, k, w)
      else WinnowKernel.fingerprints(s, k, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val kernel = ctx.addReferenceObj("winnowKernel", WinnowKernel,
        WinnowKernel.getClass.getName)
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $kernel.$method($a, $k, $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** md5-bit SimHash kernel — the cross-engine-hashable variant backing
  * NearDedup.simhashMd5Pairs (the DuckDB oracle replays md5, which xxhash64
  * can't offer). Bit source: the FIRST 8 BYTES of md5(feature) read
  * big-endian — i.e. the first 16 hex digits of the canonical md5 string,
  * MSB-first — the exact layout the generated SQL oracle extracts digit by
  * digit. One MessageDigest per thread (reset per feature), one pass per
  * row. */
object SimHashMd5Kernel extends Serializable { // shipped to tasks as a codegen reference object
  @transient private lazy val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  @transient private lazy val digestBuf =
    new ThreadLocal[Array[Byte]] {
      override def initialValue(): Array[Byte] = new Array[Byte](16)
    }

  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = mdLocal.get()
    val d = digestBuf.get() // reused: one 16-B digest per FEATURE otherwise
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null features vote nowhere (sum() skips null)
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        md.digest(d, 0, 16)
        var v = 0L
        var k = 0
        while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
        var b = 0
        while (b < 64) {
          votes(b) += (if (((v >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 63
    while (b >= 0) { sig = (sig << 1) | (if (votes(b) > 0) 1L else 0L); b -= 1 }
    sig
  }
}

/** Native md5-bit SimHash-64 over a feature array — one kernel call per row
  * inside whole-stage codegen, replacing an explode + 64-sum-column hash
  * aggregate (which shuffles (doc, 64-long) state); with this the
  * fingerprint stage is a pure scan — zero shuffles at any corpus size.
  * CAUTION: an empty array yields fingerprint 0, not "no fingerprint";
  * callers must filter empty feature sets first if absence is the contract
  * (simhashMd5Pairs does). */
case class SimHashMd5(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash_md5"

  override def nullSafeEval(in: Any): Any =
    SimHashMd5Kernel.simhash(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val kernel = ctx.addReferenceObj("simhashMd5Kernel", SimHashMd5Kernel,
        SimHashMd5Kernel.getClass.getName)
      s"${ev.value} = $kernel.simhash($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

/** Column-level face. */
object HashExprs {
  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  def simhashMd5(features: Column): Column =
    ExpressionUtils.column(SimHashMd5(ExpressionUtils.expression(features)))

  def winnowFingerprints(norm: Column, k: Int, w: Int,
                         md5Bits: Boolean = false): Column =
    ExpressionUtils.column(WinnowFingerprints(
      ExpressionUtils.expression(norm), k, w, md5Bits))
}
