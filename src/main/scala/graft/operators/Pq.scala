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
    *
    * All subspaces train JOINTLY: one seeding collect (the k lowest
    * vec_ids, sliced on the driver) and ONE Spark job per Lloyd
    * iteration covering every subspace — not m independent Ivf.train
    * loops (m * (iters+1) sequential jobs, all scheduler overhead at
    * bench scale and m redundant corpus scans per iteration at 100 TB).
    * The arithmetic is bit-identical to per-subspace Ivf.train: same
    * first-k seeding, same native argmin assignment over each slice,
    * same float -> decimal(20,10) exact order-independent mean.
    */
  def train(embeddings: DataFrame, dim: Int, m: Int, k: Int, iters: Int): Seq[Seq[Seq[Float]]] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val seeds = e.orderBy("vec_id").limit(k).collect().map(_.getSeq[Float](1))
    var codebooks: IndexedSeq[IndexedSeq[Seq[Float]]] =
      (0 until m).map(s => seeds.map(v => v.slice(s * sub, (s + 1) * sub)).toIndexedSeq)
    (0 until iters).foreach { _ =>
      val subCols = (0 until m).map { s =>
        struct(lit(s).as("s"),
          nearestCell(slice(col("embedding"), s * sub + 1, sub), codebooks(s)).as("cell"),
          slice(col("embedding"), s * sub + 1, sub).as("v"))
      }
      val means = e.select(explode(array(subCols: _*)).as("x"))
        .select(col("x.s").as("s"), col("x.cell").as("cell"),
          posexplode(col("x.v")).as(Seq("pos", "v")))
        .groupBy(col("s"), col("cell"), col("pos"))
        .agg((sum(col("v").cast("decimal(20,10)")).cast("double") /
          count(lit(1))).cast("float").as("m"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getFloat(3))
        .toMap
      codebooks = (0 until m).map { s =>
        codebooks(s).indices.map { c =>
          if (means.contains((s, c, 0)))
            (0 until sub).map(p => means((s, c, p))): Seq[Float]
          else codebooks(s)(c)
        }.toIndexedSeq
      }
    }
    codebooks
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

  /** IVF-PQ search — the architecture production vector stores compose:
    * an IVF coarse quantizer prunes candidates to the query's `nprobe`
    * cells, and PQ ADC ranks only those survivors. Candidate-side cost
    * per vector is one coarse argmin + m code argmins, ALL scan-speed
    * native projections; the join is a bucket equi-join on cell_id with
    * the (query x probe-cell, LUT) side broadcast. At 100 TB the encoded
    * corpus (cell_id + m codes per vector) is also the materialized-index
    * layout (see Ivf.searchIndex), making this the partition-pruned read
    * path. A pair can match at most one probe (a candidate holds exactly
    * one cell).
    */
  def searchIvfPq(queries: DataFrame, candidates: DataFrame,
      coarse: Seq[Seq[Float]], codebooks: Seq[Seq[Seq[Float]]],
      dim: Int, nprobe: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.NearestCells.nearestCells
    val m = codebooks.size
    val sub = dim / m
    val lutCols = codebooks.zipWithIndex.map { case (cb, s) =>
      array(cb.map(cent =>
        fsq(slice(col("q_emb"), s * sub + 1, sub), typedLit(cent))): _*)
        .as(s"lut_$s")
    }
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .select(col("query_id"), col("q_emb"),
        explode(nearestCells(col("q_emb"), coarse, nprobe)).as("cell_id"))
      .select(col("query_id") +: col("cell_id") +: lutCols: _*)
    val codes = codebooks.zipWithIndex.map { case (cb, s) =>
      nearestCell(slice(col("embedding"), s * sub + 1, sub), cb).as(s"code_$s")
    }
    val c = candidates.select(col("vec_id").as("neighbor_id") +:
      nearestCell(col("embedding"), coarse).as("cell_id") +: codes: _*)
    val adc = (0 until m)
      .map(s => element_at(col(s"lut_$s"), col(s"code_$s") + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    c.join(broadcast(q), "cell_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        (floor(col("adc") * 10000.0 + 0.5) / 10000.0).as("adc_r"))
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
