package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftnative.FloatVecSqDist.fsq
import org.apache.spark.sql.graftnative.NearestCells.nearestCell

/** Product quantization ANN: the embedding is split into `m` subvectors,
  * each quantized against its own k-entry codebook, compressing a vector
  * to `m` small ints. Search is asymmetric distance computation (ADC): a
  * query precomputes, per subspace, the distance to every codebook entry
  * (an m*k lookup table), and a candidate's approximate distance is m
  * table lookups + (m-1) adds — no per-pair vector math at all.
  *
  * 100 TB posture: the corpus pass reads `m` ints per vector instead of
  * `dim` floats (16 bytes vs 256 at dim 64 — a 16x scan-bandwidth cut),
  * codes are a scan-speed native projection (m `NearestCells` argmins,
  * zero shuffle), LUTs ride the broadcast query set, and the only
  * exchange in the search plan is the final per-query top-k window —
  * identical plan shape to the brute-force baseline but over codes.
  *
  * Determinism: codebooks train per-subspace with Ivf.train (first-k
  * seeding, exact-decimal means, id tie-breaks); ADC sums the subspace
  * distances in ascending-subspace order, each computed with the
  * NearestCells/FloatVecSqDist ascending-index double fold — the oracle
  * replays every step bit-for-bit.
  */
object Pq {

  /** Train `m` per-subspace codebooks of `k` centroids each over
    * dim-`dim` embeddings. Driver memory is m*k*(dim/m) floats — tiny.
    */
  def train(embeddings: DataFrame, dim: Int, m: Int, k: Int, iters: Int): Seq[Seq[Seq[Float]]] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    (0 until m).map { s =>
      Ivf.train(
        embeddings.select(col("vec_id"),
          slice(col("embedding"), s * sub + 1, sub).as("embedding")),
        k, iters)
    }
  }

  /** PQ codes: one nearest-codebook-entry id per subspace — `m` native
    * argmin projections, zero shuffle, no row blowup.
    */
  def encode(embeddings: DataFrame, codebooks: Seq[Seq[Seq[Float]]], dim: Int): DataFrame = {
    val m = codebooks.size
    val sub = dim / m
    val codes = codebooks.zipWithIndex.map { case (cb, s) =>
      nearestCell(slice(col("embedding"), s * sub + 1, sub), cb).as(s"code_$s")
    }
    embeddings.select(col("vec_id") +: codes: _*)
  }

  /** ADC top-k search: queries carry per-subspace LUTs (distance to every
    * codebook entry), candidates carry codes; approximate distance is m
    * lookups + adds, ranked per query with an id tie-break.
    */
  def search(queries: DataFrame, candidates: DataFrame,
      codebooks: Seq[Seq[Seq[Float]]], dim: Int, topK: Int): DataFrame = {
    val m = codebooks.size
    val sub = dim / m
    val lutCols = codebooks.zipWithIndex.map { case (cb, s) =>
      array(cb.map(cent =>
        fsq(slice(col("q_emb"), s * sub + 1, sub), typedLit(cent))): _*)
        .as(s"lut_$s")
    }
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .select(col("query_id") +: lutCols: _*)
    val c = encode(candidates, codebooks, dim)
      .withColumnRenamed("vec_id", "neighbor_id")

    // codes are 0-based cell ids; element_at is 1-based
    val adc = (0 until m)
      .map(s => element_at(col(s"lut_$s"), col(s"code_$s") + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        (floor(col("adc") * 10000.0 + 0.5) / 10000.0).as("adc_r"))
  }
}
