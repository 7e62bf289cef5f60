package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a whole string: left fold of
  * `acc = (acc * 257 + codepoint) % 1e9+7` over the document's code points.
  *
  * Bit-identical to the HOF formulation
  * `aggregate(transform(split(text, ''), c -> ascii(c)), 0L, ...)` on BMP
  * text (`ascii` yields the code point), but evaluated as one primitive
  * loop per row instead of one interpreted lambda dispatch per CHARACTER —
  * the HOF version was the slowest real query in the r1 bench by an order
  * of magnitude per byte processed.
  */
case class RollingHash(child: Expression, base: Long = 257L)
    extends UnaryExpression with ExpectsInputTypes {

  require(base >= 2 && base < (1L << 31), "2 <= base < 2^31")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  def compute(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * base + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("roller", this, classOf[RollingHash].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def rollingHash(text: Column): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(text)))

  /** Fold with a caller-chosen base — two folds with different bases
    * compose into a wider portable hash (see Dedup.simhashPortable).
    */
  def rollingHashBase(text: Column, base: Long): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(text), base))
}
