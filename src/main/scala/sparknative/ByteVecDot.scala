package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, LongType}

/** Native dot product over two int8-quantized `array<tinyint>` vectors:
  * pure integer multiply-accumulate (exact — no float rounding), the hot
  * loop of the quantized ANN prefilter. 64-dim int8 products bound each
  * term by 127^2 and the sum by dim * 2^14, far inside a long.
  *
  * Like FloatVecDot, mismatched lengths yield NULL rather than a silently
  * truncated result.
  */
case class ByteVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += x.getByte(i).toLong * y.getByte(i).toLong
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
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += (long) $a.getByte($i) * (long) $b.getByte($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ByteVecDot =
    copy(left = newLeft, right = newRight)
}

object ByteVecDot {
  /** Column-API entry point: integer dot of two tinyint-array columns. */
  def bdot(a: Column, b: Column): Column =
    ExpressionUtils.column(ByteVecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
