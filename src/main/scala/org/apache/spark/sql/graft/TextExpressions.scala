package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object ShingleKernel extends Serializable { // codegen reference object
  // Same regex class Spark's split uses (Java \s = ASCII whitespace).
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Distinct word 3-grams in first-occurrence order. Replicates the HOF
    * formulation bit-for-bit:
    * `array_distinct(trigrams(split(trim(text), "\\s+")))` — including its
    * edges: trim strips 0x20 ONLY (Spark's StringTrim), the Java-regex
    * split keeps leading/trailing empty fields (limit −1), and empty
    * tokens participate in trigrams exactly as they would in zip_with. */
  def shingles3(text: UTF8String): Array[UTF8String] = {
    val full = text.toString
    var b = 0
    var e = full.length
    while (b < e && full.charAt(b) == ' ') b += 1
    while (e > b && full.charAt(e - 1) == ' ') e -= 1
    val toks = Ws.split(full.substring(b, e), -1)
    if (toks.length < 3) return Array.empty
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + 2 < toks.length) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    out
  }
}

/** Native distinct word-3-gram shingles of a string column. The HOF
  * formulation (two zip_with passes + filter + array_distinct) evaluates
  * every lambda interpreted — measured ~0.5 ms/doc on the documents
  * fixture, the single largest cost in the near-dup queries. This kernel
  * is one O(tokens) pass per row inside whole-stage codegen. Parity with
  * the HOF formulation (kept as TextFns.shingles3Hof) is asserted in
  * LlmPackSpec over the fixture and adversarial whitespace edges. */
case class Shingles3(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingles3"

  override def nullSafeEval(in: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ShingleKernel.shingles3(in.asInstanceOf[UTF8String])
        .asInstanceOf[Array[AnyRef]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val kernel = ctx.addReferenceObj("shingleKernel", ShingleKernel,
        ShingleKernel.getClass.getName)
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) $kernel.shingles3($a));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

/** Column-level face. */
object TextExprs {
  def shingles3(text: Column): Column =
    ExpressionUtils.column(Shingles3(ExpressionUtils.expression(text)))
}
