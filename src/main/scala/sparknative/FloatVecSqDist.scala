package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd squared euclidean distance over two `array<float>`
  * columns — the ADC lookup-table primitive for product quantization.
  *
  * Accumulates `(a[i]-b[i])^2` ascending-index in doubles: the EXACT fold
  * `NearestCells` uses for cell assignment and the verification oracle
  * replays (`list_reduce` over `range`), so a distance computed here is
  * bit-identical to the distance that picked the cell. Mismatched lengths
  * yield NULL, matching FloatVecDot.
  */
case class FloatVecSqDist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      val diff = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      sum += diff * diff
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val diff = ctx.freshName("diff")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $sum += $diff * $diff;
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatVecSqDist =
    copy(left = newLeft, right = newRight)
}

object FloatVecSqDist {
  /** Column-API entry point: squared L2 distance of two float-array columns. */
  def fsq(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVecSqDist(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
