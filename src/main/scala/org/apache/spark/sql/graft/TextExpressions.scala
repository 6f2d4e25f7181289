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

  /** Distinct word n-grams in first-occurrence order. Replicates the HOF
    * formulation bit-for-bit:
    * `array_distinct(ngrams(split(trim(text), "\\s+")))` — including its
    * edges: trim strips 0x20 ONLY (Spark's StringTrim), the Java-regex
    * split keeps leading/trailing empty fields (limit −1), and empty
    * tokens participate in grams exactly as they would in zip_with. */
  def shinglesN(text: UTF8String, n: Int): Array[UTF8String] = {
    val full = text.toString
    var b = 0
    var e = full.length
    while (b < e && full.charAt(b) == ' ') b += 1
    while (e > b && full.charAt(e - 1) == ' ') e -= 1
    val toks = Ws.split(full.substring(b, e), -1)
    if (toks.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n - 1 < toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    out
  }

  def shingles3(text: UTF8String): Array[UTF8String] = shinglesN(text, 3)
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

/** Native distinct word-N-gram shingles — the generalized sibling of
  * [[Shingles3]] for operators whose span unit is not 3 (q_span_dedup's
  * 5-token spans). Same kernel, same O(tokens) single pass inside
  * whole-stage codegen, same HOF-replicating edge behavior (parity with a
  * zip_with chain asserted in LlmPackSpec for n=5). */
case class ShinglesN(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"graft_shingles$n"

  override def nullSafeEval(in: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ShingleKernel.shinglesN(in.asInstanceOf[UTF8String], n)
        .asInstanceOf[Array[AnyRef]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val kernel = ctx.addReferenceObj("shingleKernel", ShingleKernel,
        ShingleKernel.getClass.getName)
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) $kernel.shinglesN($a, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShinglesN =
    copy(child = newChild)
}

/** Column-level face. */
object NfcKernel extends Serializable { // codegen reference object
  /** Unicode NFC normalization (canonical composition). `isNormalized` is a
    * cheap scan that short-circuits the common all-ASCII/precomposed case to
    * a zero-copy pass-through — only rows that actually carry decomposed
    * sequences pay the composition. Matches DuckDB's `nfc_normalize` (both
    * implement UAX #15 canonical composition). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native NFC normalization of a string column — the canonical first step of
  * any text-cleaning pipeline (fold `e` + COMBINING ACUTE into `é` so
  * hashing/dedup/tokenization see one byte sequence per grapheme). Spark has
  * no builtin for this; a Scala UDF would break whole-stage codegen around
  * every normalize call, so it is a codegen'd UnaryExpression like the other
  * graft text kernels. Cross-engine parity with DuckDB `nfc_normalize` is
  * oracle-checked end-to-end by q_text_normalize. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(in: Any): Any =
    NfcKernel.nfc(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val kernel = ctx.addReferenceObj("nfcKernel", NfcKernel,
        NfcKernel.getClass.getName)
      s"${ev.value} = $kernel.nfc($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextExprs {
  def shingles3(text: Column): Column =
    ExpressionUtils.column(Shingles3(ExpressionUtils.expression(text)))
  def shinglesN(text: Column, n: Int): Column =
    ExpressionUtils.column(ShinglesN(ExpressionUtils.expression(text), n))
  def nfc(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))
}
