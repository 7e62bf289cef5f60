package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Portable n-token window hashes, computed natively.
  *
  * Bit-identical to the HOF formulation
  * `transform(sequence(1, size(toks)-n+1), i ->
  *    RollingHash(array_join(slice(toks, i, n), " ")))`
  * — the base-257 mod 1e9+7 code-point fold over the space-joined window —
  * but via one primitive pass: each token is hashed once (its fold value
  * and 257^cpcount are memoized), and a window's hash composes n memoized
  * folds, so the per-row cost is O(chars + windows*n) long-mults instead
  * of O(windows * window_chars) interpreted work with a slice + join
  * ALLOCATION per window and a lambda dispatch per element.
  */
private[graftnative] object GramHashCore {
  private val P = 1000000007L
  private val B = 257L

  /** hs(w) = portable hash of the space-joined window toks[w..w+n-1];
    * returns null iff fewer than n tokens.
    */
  def windowHashes(toks: ArrayData, n: Int): Array[Long] = {
    val t = toks.numElements()
    val m = t - n + 1
    if (m <= 0) return null
    // memoize per-token fold value and 257^(codepoint count)
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
    val hs = new Array[Long](m)
    var w = 0
    while (w < m) {
      var acc = 0L
      var k = 0
      while (k < n) {
        if (k > 0) acc = (acc * B + 32L) % P // the joining space
        acc = (acc * tp(w + k) + th(w + k)) % P
        k += 1
      }
      hs(w) = acc
      w += 1
    }
    hs
  }
}

/** Position-ordered window hash array — the native drop-in for the
  * interpreted gram pipeline feeding posexplode (dup-span detection) and
  * explode + join (batch decontamination).
  */
case class GramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "window width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val hs = GramHashCore.windowHashes(input.asInstanceOf[ArrayData], n)
    if (hs == null) null else new GenericArrayData(hs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramHashes", this, classOf[GramHashes].getName)
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
         |Object r = $ref.compute($toks);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
       """.stripMargin
    })
  }

  def compute(toks: ArrayData): AnyRef = nullSafeEval(toks).asInstanceOf[AnyRef]

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  def gramHashes(tokens: Column, n: Int): Column =
    ExpressionUtils.column(GramHashes(ExpressionUtils.expression(tokens), n))
}

/** Whole-row contamination stats in one native pass: distinct window-hash
  * count and how many of those distincts appear in a plan-constant sorted
  * benchmark set (binary search per distinct). Fuses GramHashes +
  * array_distinct + SortedSetHits so the window hashes are computed ONCE
  * per row no matter how many output columns derive from them.
  */
case class GramSetStats(child: Expression, n: Int, set: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "window width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_hit", LongType, nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val hs = GramHashCore.windowHashes(input.asInstanceOf[ArrayData], n)
    if (hs == null) return null
    java.util.Arrays.sort(hs)
    var d = 0L
    var hits = 0L
    var i = 0
    while (i < hs.length) {
      if (i == 0 || hs(i) != hs(i - 1)) {
        d += 1
        if (java.util.Arrays.binarySearch(set, hs(i)) >= 0) hits += 1
      }
      i += 1
    }
    InternalRow(d, hits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramSetStats", this, classOf[GramSetStats].getName)
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
         |Object r = $ref.compute($toks);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) r; }
       """.stripMargin
    })
  }

  def compute(toks: ArrayData): AnyRef = nullSafeEval(toks).asInstanceOf[AnyRef]

  override protected def withNewChildInternal(newChild: Expression): GramSetStats =
    copy(child = newChild)
}

object GramSetStats {
  def gramSetStats(tokens: Column, n: Int, set: Array[Long]): Column = {
    val sorted = set.clone()
    java.util.Arrays.sort(sorted)
    ExpressionUtils.column(GramSetStats(ExpressionUtils.expression(tokens), n, sorted))
  }
}

/** Whole-row BLOOM-FILTER contamination stats: distinct window-hash count
  * and how many distincts possibly-hit an m-bit Bloom filter of the
  * benchmark gram set (k probes per hash via double hashing). The filter
  * is a plan-constant long[] of m/64 words — at 100 TB this is what an
  * exact sorted set (GramSetStats) cannot stay: a benchmark union of
  * millions of grams still broadcasts as m/8 bytes, at the price of a
  * bounded false-positive rate and zero false negatives.
  *
  * Probe arithmetic is pure integer math on the portable gram hash so a
  * SQL oracle can replay it exactly:
  *   h1 = h % m,  h2 = 1 + (h div m) % (m-1),  bit_i = (h1 + i*h2) % m.
  * h2 >= 1 keeps the probe stride nonzero; a coinciding probe pair is
  * harmless (it re-tests the same bit).
  */
case class GramBloomStats(child: Expression, n: Int, m: Int, k: Int, words: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "window width must be >= 1")
  require(m >= 64 && (m & (m - 1)) == 0, "bloom bit count must be a power of two >= 64")
  require(k >= 1, "probe count must be >= 1")
  require(words.length == m / 64, s"words must hold m/64 = ${m / 64} longs")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_hit", LongType, nullable = false)))
  override def nullable: Boolean = true

  private def maybeHit(h: Long): Boolean = {
    val h1 = h % m
    val h2 = 1L + (h / m) % (m - 1)
    var i = 0
    while (i < k) {
      val b = ((h1 + i * h2) % m).toInt
      if ((words(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = GramHashCore.windowHashes(input.asInstanceOf[ArrayData], n)
    if (hs == null) return null
    java.util.Arrays.sort(hs)
    var d = 0L
    var hits = 0L
    var i = 0
    while (i < hs.length) {
      if (i == 0 || hs(i) != hs(i - 1)) {
        d += 1
        if (maybeHit(hs(i))) hits += 1
      }
      i += 1
    }
    InternalRow(d, hits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramBloomStats", this, classOf[GramBloomStats].getName)
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
         |Object r = $ref.compute($toks);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) r; }
       """.stripMargin
    })
  }

  def compute(toks: ArrayData): AnyRef = nullSafeEval(toks).asInstanceOf[AnyRef]

  override protected def withNewChildInternal(newChild: Expression): GramBloomStats =
    copy(child = newChild)
}

object GramBloomStats {
  /** The k probe bit positions of gram hash `h` — shared by the filter
    * builder (Contamination.bloomStats) and the probe expression so the
    * two can never drift.
    */
  def bitPositions(h: Long, m: Int, k: Int): Array[Int] = {
    val h1 = h % m
    val h2 = 1L + (h / m) % (m - 1)
    Array.tabulate(k)(i => ((h1 + i * h2) % m).toInt)
  }

  def gramBloomStats(tokens: Column, n: Int, m: Int, k: Int, words: Array[Long]): Column =
    ExpressionUtils.column(
      GramBloomStats(ExpressionUtils.expression(tokens), n, m, k, words.clone()))
}
