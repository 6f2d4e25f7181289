package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query side of Spark's own Count-Min sketch.
  *
  * Spark ships the BUILD half as a builtin aggregate —
  * `count_min_sketch(col, eps, confidence, seed)`, a
  * TypedImperativeAggregate whose partial sketches merge map-side by
  * cell-wise addition — but no expression to QUERY the resulting binary
  * sketch inside a plan. This expression closes the loop:
  * `CmsEstimate(sketchBytes, item)` deserializes the sketch (once per
  * partition via a tiny identity cache — the bytes re-enter the scan as a
  * broadcast/scalar-subquery constant, so every row of a task sees the
  * same array) and returns `estimateCount(utf8 bytes of item)`.
  *
  * Estimator contract (Cormode/Muthukrishnan '05): estimates NEVER
  * undercount, and overcount ≤ eps·N with probability ≥ confidence —
  * asserted against exact counts in ApproxSpec. Deterministic for a fixed
  * seed, so heavy-hitter reports are stable across runs and cluster
  * layouts (cell-wise partial merge is commutative integer addition).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cms_estimate"

  override def nullSafeEval(sketchBytes: Any, item: Any): Any =
    CmsEstimate.estimate(sketchBytes.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, it) => {
      val obj = ctx.addReferenceObj("cmsEstimate", CmsEstimate,
        CmsEstimate.getClass.getName)
      s"${ev.value} = $obj.estimate($sk, $it);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate extends Serializable {
  // Identity-keyed single-slot cache, PER THREAD: the sketch bytes arrive
  // as one constant array per task (scalar subquery / broadcast), so
  // caching the last-seen reference avoids re-deserializing per row; the
  // ThreadLocal keeps concurrent tasks from clobbering each other's slot
  // (executor task threads each warm their own in one deserialization).
  @transient private lazy val cache =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  def estimate(bytes: Array[Byte], item: UTF8String): Long = {
    var entry = cache.get()
    if (entry == null || (entry._1 ne bytes)) {
      entry = (bytes,
        CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes)))
      cache.set(entry)
    }
    entry._2.estimateCount(item.getBytes)
  }
}

/** Column-level face. */
object CmsExprs {
  def estimate(sketch: Column, item: Column): Column =
    ExpressionUtils.column(CmsEstimate(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(item)))
}
