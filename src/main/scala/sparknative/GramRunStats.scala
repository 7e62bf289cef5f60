package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Within-document n-gram repetition statistics, computed natively in one
  * pass: every n-token window is hashed (xxhash64 chained over the window,
  * the ShingleHashes primitive), the hash array is sorted, and a single
  * run-length scan yields (n_grams, top_gram_cnt, dup_gram_cnt).
  *
  * Replaces the explode -> groupBy(doc_id, gram) -> groupBy(doc_id)
  * two-exchange plan that shipped every gram of every document through a
  * shuffle just to count duplicates WITHIN each document — a per-row
  * computation. At 100 TB this turns the repetition filter from the
  * pipeline's widest shuffle into a scan-speed projection.
  *
  * Equal grams hash equal; distinct grams collide with probability
  * ~m²/2⁶⁵ per document (m ≈ doc length) — the same 64-bit-hash identity
  * SortedIntersectCount relies on for Jaccard.
  */
case class GramRunStats(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 2, "n-gram repetition needs n >= 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top_gram_cnt", LongType, nullable = false),
    StructField("dup_gram_cnt", LongType, nullable = false)))
  override def nullable: Boolean = true

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
    if (m <= 0) return null
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = hashWindow(toks, i); i += 1 }
    java.util.Arrays.sort(hs)
    var top = 1L
    var dup = 0L
    var run = 1L
    i = 1
    while (i < m) {
      if (hs(i) == hs(i - 1)) run += 1
      else {
        if (run > top) top = run
        if (run > 1) dup += run
        run = 1
      }
      i += 1
    }
    if (run > top) top = run
    if (run > 1) dup += run
    InternalRow(m.toLong, top, dup)
  }

  // the sort dominates; codegen is one static call into this object
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("runstats", this, classOf[GramRunStats].getName)
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
         |Object r = $ref.computeStats($toks);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) r; }
       """.stripMargin
    })
  }

  /** Public entry for generated code; null when fewer than n tokens. */
  def computeStats(toks: ArrayData): AnyRef =
    nullSafeEval(toks).asInstanceOf[AnyRef]

  override protected def withNewChildInternal(newChild: Expression): GramRunStats =
    copy(child = newChild)
}

object GramRunStats {
  def gramRunStats(tokens: Column, n: Int): Column =
    ExpressionUtils.column(GramRunStats(ExpressionUtils.expression(tokens), n))
}
