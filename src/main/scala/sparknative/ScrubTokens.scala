package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Rebuild a document with its duplicated spans removed: given the
  * token array and the SORTED 1-based start positions of the n-token
  * windows to scrub, drop every token covered by any such window
  * (token i is covered by window w iff w <= i <= w+n-1) and re-join the
  * survivors with single spaces.
  *
  * One merged sweep: the start list advances with the token cursor, so
  * the row costs O(tokens + starts) — no per-token membership scan, no
  * exploded token shuffle. Returns (clean_text, n_kept, n_removed).
  */
case class ScrubTokens(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(n >= 1, "window width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(IntegerType))
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val dups = b.asInstanceOf[ArrayData]
    val t = toks.numElements()
    val m = dups.numElements()
    val sb = new java.lang.StringBuilder
    var kept = 0L
    var j = 0
    var i = 1
    while (i <= t) {
      // first start that could still cover token i: w >= i - n + 1
      while (j < m && dups.getInt(j) < i - n + 1) j += 1
      val covered = j < m && dups.getInt(j) <= i
      if (!covered) {
        if (kept > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i - 1).toString)
        kept += 1
      }
      i += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), kept, t - kept)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scrubber", this, classOf[ScrubTokens].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($a, $b);")
  }

  def compute(toks: ArrayData, dups: ArrayData): AnyRef =
    nullSafeEval(toks, dups).asInstanceOf[AnyRef]

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ScrubTokens =
    copy(left = newLeft, right = newRight)
}

object ScrubTokens {
  def scrubTokens(toks: Column, dupStarts: Column, n: Int): Column =
    ExpressionUtils.column(ScrubTokens(
      ExpressionUtils.expression(toks), ExpressionUtils.expression(dupStarts), n))
}
