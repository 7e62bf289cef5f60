// Lives under org.apache.spark.sql because AbstractDataType and
// ExpressionUtils are private[sql] — the standard pattern for third-party
// native expressions.
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * evaluated interpretively — one lambda dispatch and boxed Double per
  * element — and breaks whole-stage codegen. This expression compiles to a
  * tight primitive loop inside the generated code, which matters when the
  * similarity operators evaluate tens of millions of vector pairs.
  *
  * Accumulation is a sequential left fold in double precision: identical
  * numeric semantics to the HOF version (and to the verification oracle).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

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
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |    $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  /** Column-API entry point: dot product of two float-array columns. */
  def fdot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
