package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns using codegen-friendly
  * higher-order functions — no UDFs, no driver-side collection.
  *
  * Elements are cast to double and folded sequentially (left fold), so the
  * result is deterministic for a given array — required for oracle-exact
  * comparisons and stable ranking.
  */
object Vectors {

  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float-array columns. */
  def cosine(aRaw: Column, bRaw: Column): Column = {
    val a = asDouble(aRaw)
    val b = asDouble(bRaw)
    dot(a, b) / (norm(a) * norm(b))
  }

  /** L2-normalize against a precomputed norm column (pass
    * `sqrt(fdot(a, a))` computed once per row — recomputing the norm inside
    * the element lambda would be O(d²)). Normalized vectors make cosine a
    * bare dot product.
    */
  def l2Normalize(aRaw: Column, precomputedNorm: Column): Column =
    transform(asDouble(aRaw), x => x / precomputedNorm)

  /** Per-vector symmetric int8 quantization scale: max|x| / 127. Compute as
    * its own column, then pass to [[quantize]] — same O(d²) caveat as the
    * norm. 4x smaller storage/shuffle for ANN candidate sets.
    */
  def int8Scale(aRaw: Column): Column =
    array_max(transform(aRaw, x => abs(x.cast("double")))) / 127.0

  /** Quantize to `array<tinyint>` against a precomputed scale column. */
  def quantize(aRaw: Column, scale: Column): Column =
    transform(aRaw, x => round(x.cast("double") / scale).cast("tinyint"))

  /** Dequantize back to doubles (error <= scale/2 per component). */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** The portable base-257 mod 1e9+7 code-point fold, evaluated on the
    * driver — used to derive deterministic pseudo-random structure (the
    * JL sign matrix) that a SQL oracle can rebuild from the same string.
    */
  def portableFold(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 257L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Johnson-Lindenstrauss sign random projection: reduce dim-`dim`
    * embeddings to `k` components, r_j = <emb, sign_j> where
    * sign_j[i] = +-1 from the parity of fold("jl:j:i") — a deterministic,
    * engine-replayable stand-in for the Gaussian matrix (Achlioptas'
    * database-friendly variant). Each component is one native fdot
    * against a plan-literal sign vector: k codegen'd scan-speed columns,
    * zero shuffle, and distances are preserved within (1 +- eps) for
    * eps ~ sqrt(ln n / k) — the cheap pre-filter/storage cut in front of
    * exact reranking.
    */
  def jlProject(emb: Column, dim: Int, k: Int): Seq[Column] = {
    import org.apache.spark.sql.graftnative.FloatVecDot.fdot
    (0 until k).map { j =>
      val signs = Array.tabulate(dim)(i =>
        if (portableFold(s"jl:$j:$i") % 2 == 0L) 1.0f else -1.0f)
      fdot(emb, typedLit(signs)).as(s"r_$j")
    }
  }
}
