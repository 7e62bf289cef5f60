package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted, distinct 64-bit hashes of token n-gram shingles, computed
  * natively: one pass hashing each n-token window (xxhash64 chained over
  * the window's tokens), then sort + in-place dedup.
  *
  * Replaces `array_sort(array_distinct(transform(sequence(...),
  * i -> xxhash64(element_at(...)...))))` — four interpreted array passes
  * with lambda dispatch per element — and feeds MinhashSig /
  * SortedIntersectCount directly.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @inline private def hashWindow(toks: ArrayData, start: Int): Long = {
    var h = 42L
    var k = 0
    while (k < n) {
      val s: UTF8String = toks.getUTF8String(start + k)
      h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), h)
      k += 1
    }
    h
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = hashWindow(toks, i); i += 1 }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 1
    var r = 1
    while (r < m) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  // Interpreted eval is already a tight primitive loop over the array; the
  // sort dominates, so codegen falls back to the eval path via the default
  // UnaryExpression codegen (a static call into this expression object).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.computeShingles($toks);")
  }

  /** Public entry for generated code. */
  def computeShingles(toks: ArrayData): ArrayData =
    nullSafeEval(toks).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def shingleHashes(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(tokens), n))
}
