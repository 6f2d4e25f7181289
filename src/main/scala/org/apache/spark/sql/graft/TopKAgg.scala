package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k best (score, id) pairs under the total order
  * score DESC, id ASC, held as a binary min-heap whose root is the current
  * WORST survivor — insert is O(log k), and a candidate no better than the
  * root is rejected in O(1), which is the common case once the heap warms
  * up. */
private[graft] final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** a-worse-than-b under (score DESC, id ASC): lower score, or same score
    * and higher id. Total, so results are deterministic under ties. */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i // index of the worst among i and its children
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      val (s, id) = (scores(i), ids(i))
      scores(i) = scores(w); ids(i) = ids(w)
      scores(w) = s; ids(w) = id
      i = w
    }
  }

  def offer(s: Double, id: Long): Unit =
    if (n < k) {
      // grow phase: append then sift up toward the worst-at-root invariant
      var i = n
      scores(i) = s; ids(i) = id
      n += 1
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          val (ps, pid) = (scores(p), ids(p))
          scores(p) = scores(i); ids(p) = ids(i)
          scores(i) = ps; ids(i) = pid
          i = p
        } else i = 0
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }

  /** Survivors best-first: (score DESC, id ASC). */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    out.sortWith { case ((sa, ia), (sb, ib)) => sa > sb || (sa == sb && ia < ib) }
  }
}

/** Top-k-per-group as ONE imperative aggregate with k-BOUNDED state — the
  * group-wise sibling of the global `TakeOrderedAndProject`.
  *
  * The declarative formulation (`row_number().over(partitionBy(g).orderBy(
  * score.desc)) <= k`, what q_window_topn_per_group showcases) shuffles
  * EVERY candidate row to its group's reducer before discarding all but k.
  * Here partial aggregation applies: each partition collapses to a k-entry
  * heap per group map-side (`update`), the shuffle moves ≤ groups × k
  * entries, and `merge` folds heaps — associative and commutative, so a
  * batch kNN join over a 100 TB corpus shuffles probes × partitions × k
  * pairs instead of probes × N candidate rows.
  *
  * Output: array<struct<sim double, vec_id bigint>> best-first under
  * (sim DESC, vec_id ASC) — a total order, so ties are deterministic.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k >= 1, s"k=$k must be >= 1")

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("sim", DoubleType, nullable = false),
      StructField("vec_id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) { buf.offer(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, id) =>
      new GenericInternalRow(Array[Any](s, id))
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAggExprs {
  /** Column face: the k best (score, id) pairs per group, best-first. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(TopKByScore(ExpressionUtils.expression(score),
      ExpressionUtils.expression(id), k).toAggregateExpression())
}
