package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
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

/** Column-level face of the native expressions (the only place that needs
  * the private[sql] bridge). */
object VectorExprs {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
