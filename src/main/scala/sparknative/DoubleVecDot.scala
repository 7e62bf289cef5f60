// Lives under org.apache.spark.sql because AbstractDataType and
// ExpressionUtils are private[sql] — the standard pattern for third-party
// native expressions.
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns — the
  * double twin of [[FloatVecDot]], for operators whose vectors must stay
  * in double end-to-end (the text-embedding chain, whose 6-dp-quantized
  * components and sims hash-check bit-for-bit against a SQL oracle).
  *
  * Accumulation is the same sequential left fold in double precision as
  * the HOF formulation (`aggregate(zip_with(...))`) AND the oracle's
  * `list_reduce` — identical operation order, identical bits — but
  * compiled to a tight primitive loop instead of one interpreted lambda
  * dispatch + boxed Double per element, which is the difference between
  * milliseconds and seconds at hundreds of thousands of candidate pairs.
  */
case class DoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  // Mismatched vector lengths yield NULL (like aggregate(zip_with(...)),
  // whose null padding nulls the whole fold) — never a silently truncated
  // plausible-but-wrong similarity.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DoubleVecDot =
    copy(left = newLeft, right = newRight)
}

object DoubleVecDot {
  /** Column-API entry point: dot product of two double-array columns. */
  def ddot(a: Column, b: Column): Column =
    ExpressionUtils.column(DoubleVecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
