// Lives under org.apache.spark.sql for the same reason as FloatVecDot:
// private[sql] helper types.
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native MinHash signature: k permutations h_j(x) = (a_j * (x mod p) + b_j)
  * mod p, each minimized over the input shingle-hash array, returned as
  * `array<long>` of length k.
  *
  * The higher-order-function formulation runs k interpreted passes over the
  * shingle array (k * n lambda dispatches per document); this compiles to a
  * k-by-n primitive loop nest inside whole-stage codegen.
  *
  * `p` must be 2^31 - 1 and coefficients < 2^31 so a * x + b stays within a
  * 63-bit long.
  */
case class MinhashSig(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(as.length == bs.length && as.nonEmpty, "need matching coefficient arrays")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val aArr = as.toArray
  private lazy val bArr = bs.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val n = sh.numElements()
    val k = aArr.length
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) { xs(i) = ((sh.getLong(i) % p) + p) % p; i += 1 }
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = aArr(j); val b = bArr(j)
      var best = Long.MaxValue
      i = 0
      while (i < n) {
        val h = (a * xs(i) + b) % p
        if (h < best) best = h
        i += 1
      }
      sig(j) = best
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, sh => {
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val xs = ctx.freshName("xs"); val h = ctx.freshName("h")
      val best = ctx.freshName("best"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $sh.numElements();
         |int $k = $aRef.length;
         |long[] $xs = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $xs[$i] = (($sh.getLong($i) % ${p}L) + ${p}L) % ${p}L;
         |}
         |long[] $sig = new long[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  long $best = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = ($aRef[$j] * $xs[$i] + $bRef[$j]) % ${p}L;
         |    if ($h < $best) $best = $h;
         |  }
         |  $sig[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  def minhashSig(shingles: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    ExpressionUtils.column(MinhashSig(ExpressionUtils.expression(shingles), as, bs, p))
}
