package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, XXH64}
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

/** Column-level face. */
object AggExprs {
  def minhashSignature(hash: Column, k: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(hash), k).toAggregateExpression())
}
