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

/** Column-level face. */
object HashExprs {
  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))
}
