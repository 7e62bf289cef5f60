package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Native DSIR feature hashing: salted portable-fold buckets of the
  * unigram+bigram bag, computed in one primitive loop per document.
  *
  * Bit-identical to the HOF formulation
  * `transform(unigrams ++ bigrams, g -> pmod(RollingHash('dsir:' || g), m))`
  * — the base-257 mod 1e9+7 code-point fold over the salted gram string —
  * but each token is folded ONCE (value and 257^cpcount memoized) and every
  * gram hash composes memoized folds, so the per-row cost is O(chars +
  * grams) long-mults instead of a string concat ALLOCATION plus an
  * interpreted re-fold of every character per gram. The fold composition
  * identity is `fold(a ++ b) = fold(a) * 257^|b| + fold(b) (mod p)`.
  */
private[graftnative] object DsirHashCore {
  private val P = 1000000007L
  private val B = 257L

  /** fold("dsir:") — the salt every gram hash is prefixed with (the salt's
    * base power is folded in per token via tp()).
    */
  val SaltFold: Long = "dsir:".foldLeft(0L)((a, c) => (a * B + c) % P)

  /** Per-gram bucket ids (unigrams then bigrams, position order), each
    * `pmod(fold("dsir:" + gram), buckets)`.
    */
  def buckets(toks: ArrayData, m: Long): Array[Long] = {
    val t = toks.numElements()
    val th = new Array[Long](t)
    val tp = new Array[Long](t)
    var i = 0
    while (i < t) {
      val s = toks.getUTF8String(i).toString
      val len = s.length
      var acc = 0L
      var pow = 1L
      var j = 0
      while (j < len) {
        val cp = s.codePointAt(j)
        acc = (acc * B + cp) % P
        pow = (pow * B) % P
        j += Character.charCount(cp)
      }
      th(i) = acc; tp(i) = pow
      i += 1
    }
    val nGrams = if (t >= 2) 2 * t - 1 else t
    val out = new Array[Long](nGrams)
    i = 0
    while (i < t) { // unigrams: fold("dsir:" + tok)
      val h = (SaltFold * tp(i) + th(i)) % P
      out(i) = ((h % m) + m) % m
      i += 1
    }
    i = 0
    while (i < t - 1) { // bigrams: fold("dsir:" + t(i) + " " + t(i+1))
      var h = (SaltFold * tp(i) + th(i)) % P // fold("dsir:" + t(i))
      h = (h * B + 32L) % P                  // ... + " "
      h = (h * tp(i + 1) + th(i + 1)) % P    // ... + t(i+1)
      out(t + i) = ((h % m) + m) % m
      i += 1
    }
    out
  }

  /** Sum of `weights(bucket)` over the gram bag — the whole DSIR scoring
    * projection in one loop, no intermediate arrays.
    */
  def score(toks: ArrayData, weights: Array[Long]): Long = {
    val bs = buckets(toks, weights.length.toLong)
    var acc = 0L
    var i = 0
    while (i < bs.length) { acc += weights(bs(i).toInt); i += 1 }
    acc
  }
}

/** Array of salted gram bucket ids for the unigram+bigram bag — the model
  * pass's explode input.
  */
case class DsirBuckets(child: Expression, m: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(m >= 1, "bucket count must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(DsirHashCore.buckets(input.asInstanceOf[ArrayData], m))

  def compute(toks: ArrayData): ArrayData =
    new GenericArrayData(DsirHashCore.buckets(toks, m))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirBuckets", this, classOf[DsirBuckets].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.compute($toks);")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}

/** Per-document DSIR log-importance score in integer micro-units: sum of
  * the literal per-bucket weights over the gram bag, one primitive loop.
  * Weights are a Seq (structural equality), not an Array (reference
  * equality), so structurally equal DsirScore expressions canonicalize
  * equal and Catalyst subexpression elimination can fire.
  */
case class DsirScore(child: Expression, weights: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(weights.nonEmpty, "weights must be non-empty")

  @transient private lazy val wArr: Array[Long] = weights.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    DsirHashCore.score(input.asInstanceOf[ArrayData], wArr)

  def compute(toks: ArrayData): Long = DsirHashCore.score(toks, wArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirScore", this, classOf[DsirScore].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.compute($toks);")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}

object DsirHash {
  def dsirBuckets(tokens: Column, m: Long): Column =
    ExpressionUtils.column(DsirBuckets(ExpressionUtils.expression(tokens), m))

  def dsirScore(tokens: Column, weights: Array[Long]): Column =
    ExpressionUtils.column(
      DsirScore(ExpressionUtils.expression(tokens), weights.toIndexedSeq))
}
