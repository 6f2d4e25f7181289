package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** MinHash signature as ONE imperative aggregate (SURVEY.md §4's deferred
  * "custom TypedImperativeAggregate for sketches" item): k permutation-
  * surrogate minima over the group's element hashes, kept in a single
  * Array[Long] buffer.
  *
  * The declarative formulation — k separate `min(xxhash64(lit(i), h))`
  * aggregate columns — is semantically identical but generates k agg
  * buffers and k expression trees; at k = 128 the generated aggregate
  * class is enormous and its janino compilation dominates query time at
  * small-to-mid scale (measured: the minhash query's cost barely moves
  * between sf0.001 and sf0.1 — fixed overhead, not data). Here the
  * whole signature is one buffer and one tight loop per row.
  *
  * Parity: sig_i = xxhash64(lit(i: Int), h: Long) = hashLong(h,
  * hashInt(i, 42)) — the builtin folds inputs left-to-right from seed 42,
  * so the per-i seeds are precomputable. Results are bit-identical to the
  * declarative form (asserted in HashExprSpec).
  *
  * Distribution: partial aggregation applies as usual — each partition
  * collapses its groups to k-long buffers map-side (`update`), the shuffle
  * moves signature-sized state only, and `merge` is an elementwise min —
  * associative and commutative, so the plan scales like any sum.
  */
case class MinHashSignature(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(k >= 1, s"k=$k must be >= 1")

  @transient private lazy val seeds: Array[Long] = {
    val s = new Array[Long](k)
    var i = 0
    while (i < k) { s(i) = XXH64.hashInt(i, 42L); i += 1 }
    s
  }

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val s = XXH64.hashLong(h, seeds(i))
        if (s < buf(i)) buf(i) = s
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](k)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSignature =
    copy(child = newChildren.head)
}

/** Per-ROW MinHash signature over a token/shingle array — the same k
  * permutation-surrogate minima as [[MinHashSignature]], computed in one
  * pass over the array with no explode and no aggregation.
  *
  * Bit-parity contract (asserted in HashExprSpec): for every element t,
  * h = xxhash64(t) (XXH64 over the UTF-8 bytes, seed 42 — the builtin's
  * exact kernel), and sig_i = min over elements of hashLong(h, seeds(i))
  * with seeds(i) = hashInt(i, 42) — identical to
  * `min(xxhash64(lit(i), xxhash64(t)))` and therefore to the aggregate
  * form over the exploded array. An empty array yields the aggregate's
  * empty buffer (all Long.MaxValue); callers filter empty shingle sets
  * exactly as they do on the aggregate path.
  *
  * Why it exists: the aggregate form costs `explode` row inflation plus a
  * doc-keyed EXCHANGE to regroup the shingle hashes. Signatures are a
  * per-document function of the document alone, so computing them in-row
  * turns the whole signature stage into a narrow map — at 100 TB the
  * shuffle it deletes was signature-sized per doc but still a full
  * all-to-all barrier over the corpus. Null elements hash to the seed,
  * matching builtin xxhash64(null) in the exploded form. */
case class MinHashRow(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 1, s"k=$k must be >= 1")

  @transient private lazy val seeds: Array[Long] = {
    val s = new Array[Long](k)
    var i = 0
    while (i < k) { s(i) = XXH64.hashInt(i, 42L); i += 1 }
    s
  }

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_row"

  def signatureOf(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < k) {
        val s = XXH64.hashLong(h, seeds(i))
        if (s < sig(i)) sig(i) = s
        i += 1
      }
      j += 1
    }
    sig
  }

  override def nullSafeEval(in: Any): Any =
    new GenericArrayData(
      signatureOf(in.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("minhashRow", this, getClass.getName)
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $self.signatureOf($a));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashRow =
    copy(child = newChild)
}

/** Column-level face. */
object AggExprs {
  def minhashSignature(hash: Column, k: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(hash), k).toAggregateExpression())
  def minhashRow(tokens: Column, k: Int): Column =
    ExpressionUtils.column(MinHashRow(ExpressionUtils.expression(tokens), k))
}
