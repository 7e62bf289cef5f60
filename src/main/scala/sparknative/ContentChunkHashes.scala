package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split a document at positions where a
  * Rabin-Karp rolling hash over the trailing `window` bytes hits a mask,
  * and return one 64-bit FNV-1a hash per chunk.
  *
  * Because boundaries depend only on local content, inserting or deleting
  * a span shifts at most the neighboring chunks — the property that makes
  * sub-document dedup and delta storage work where fixed-size chunking
  * degrades. Average chunk size ~= 2^maskBits bytes.
  */
case class ContentChunkHashes(child: Expression, window: Int, maskBits: Int,
    portableHash: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  require(window >= 2 && maskBits >= 1 && maskBits <= 30, "window>=2, 1<=maskBits<=30")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val Base = 257L
  private val Mod = 1000000007L
  private lazy val mask = (1L << maskBits) - 1
  // base^window mod p, to roll the oldest byte out
  private lazy val basePow: Long = {
    var r = 1L
    (0 until window).foreach(_ => r = r * Base % Mod)
    r
  }

  /** The state machine is identical in both modes (window roll, masked
    * boundary, per-chunk digest, trailing emission); the SYMBOL STREAM and
    * digest differ. Default: UTF-8 bytes with FNV-1a 64 digests
    * (wraparound 64-bit multiply — fast, but only computable in engines
    * with modular int64 semantics). `portableHash`: Unicode CODE POINTS
    * with the same base-257 mod-1e9+7 fold as the boundary hash — exactly
    * what a SQL engine folding per-character replays, on non-ASCII text
    * too. Identical on ASCII except for digest values.
    */
  def computeChunks(s: UTF8String): GenericArrayData = {
    val fnvInit = -3750763034362895579L // FNV-1a 64 offset basis
    val syms: Array[Int] =
      if (portableHash) {
        val str = s.toString
        val arr = new Array[Int](str.codePointCount(0, str.length))
        var i = 0; var j = 0
        while (i < str.length) {
          val cp = str.codePointAt(i)
          arr(j) = cp; j += 1; i += Character.charCount(cp)
        }
        arr
      } else {
        val bytes = s.getBytes
        val arr = new Array[Int](bytes.length)
        var i = 0
        while (i < bytes.length) { arr(i) = bytes(i) & 0xFF; i += 1 }
        arr
      }
    val n = syms.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var roll = 0L
    var chunkHash = if (portableHash) 0L else fnvInit
    var chunkLen = 0
    var i = 0
    while (i < n) {
      val b = syms(i)
      roll = (roll * Base + b) % Mod
      if (i >= window) {
        val old = syms(i - window)
        roll = ((roll - old * basePow % Mod) + Mod) % Mod
      }
      chunkHash =
        if (portableHash) (chunkHash * Base + b) % Mod
        else (chunkHash ^ b) * 1099511628211L // FNV-1a prime
      chunkLen += 1
      // boundary: rolling hash hits the mask once the window is full
      if (i >= window - 1 && (roll & mask) == 0) {
        out += chunkHash
        chunkHash = if (portableHash) 0L else fnvInit
        chunkLen = 0
      }
      i += 1
    }
    if (chunkLen > 0) out += chunkHash
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    computeChunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chunker", this, classOf[ContentChunkHashes].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $ref.computeChunks($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): ContentChunkHashes =
    copy(child = newChild)
}

object ContentChunkHashes {
  def contentChunkHashes(text: Column, window: Int, maskBits: Int): Column =
    ExpressionUtils.column(ContentChunkHashes(
      ExpressionUtils.expression(text), window, maskBits))

  /** Engine-portable chunk digests (mod-1e9+7 fold), same boundaries. */
  def contentChunkHashesPortable(text: Column, window: Int, maskBits: Int): Column =
    ExpressionUtils.column(ContentChunkHashes(
      ExpressionUtils.expression(text), window, maskBits, portableHash = true))
}
