package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftnative.NearestCells.nearestCellDist

/** Diversity-aware coreset selection over an embedding column: greedy
  * k-center (farthest-point traversal, Gonzalez 1985) — the standard
  * 2-approximation to the k-center cover, and the "prototypes +
  * diversity" subset selection a training-data pipeline runs before
  * labeling, distillation, or eval-set construction (pick the k most
  * mutually distant exemplars; every corpus point is within the final
  * coverage radius of one of them).
  *
  * Determinism contract (oracle-replayable end to end): the seed is the
  * LOWEST vec_id; each step picks the point with the MAXIMUM squared
  * euclidean distance to its nearest chosen center (ties: lowest
  * vec_id), excluding already-chosen ids; distances accumulate in the
  * ascending-index double fold of [[org.apache.spark.sql.graftnative.NearestCellDist]]
  * — the same fold the IVF oracles replay, so selection, radii, and the
  * final assignment counts are all engine-exact.
  *
  * Scale shape: k driver round-trips, each a scan-speed native
  * projection + a TakeOrdered(1) — the per-step pull is ONE row (the
  * bounded-collect pattern of Ivf.train); no shuffle anywhere except
  * the k-row assignment aggregate at the end. O(k * N) distance work
  * total on the corpus scan side (each step evaluates distances to at
  * most k centers riding as a codegen reference object). At 100 TB with
  * bounded k this is k scans — the farthest-point structure is
  * inherently sequential (step s needs the argmax under centers 0..s-1),
  * so the scans are the price of the exact greedy; approximate at-scale
  * variants (sample-then-select) compose from the same pieces.
  */
object Coreset {

  /** One row per selected center: step (selection order, 0 = seed),
    * center_id, radius_sq_r (the max-min squared distance that selected
    * it, 4-dp micro-rounded; NULL for the seed), n_assigned (corpus
    * points whose nearest center it is; distance ties assign to the
    * earlier step, the native strict-< rule).
    */
  def kCenter(embeddings: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val seedRows = e.orderBy(col("vec_id").asc).limit(1).collect()
    if (seedRows.isEmpty) {
      // empty corpus -> empty selection with the contract schema
      val spark = embeddings.sparkSession
      import spark.implicits._
      return Seq.empty[(Int, Long, Option[Double], Long)]
        .toDF("step", "center_id", "radius_sq_r", "n_assigned")
    }
    val seed = seedRows(0)
    var centers = Vector[(Long, Seq[Float], Option[Double])](
      (seed.getLong(0), seed.getSeq[Float](1), None))
    var exhausted = false
    for (_ <- 1 until k if !exhausted) {
      val cents = centers.map(_._2)
      val chosen = centers.map(_._1)
      // one-row pull per step (bounded-collect, like Ivf.train's k rows)
      val farRows = e
        .where(!col("vec_id").isInCollection(chosen))
        .select(col("vec_id"), col("embedding"),
          nearestCellDist(col("embedding"), cents).getField("d").as("dmin"))
        .orderBy(col("dmin").desc, col("vec_id").asc)
        .limit(1).collect()
      if (farRows.isEmpty) exhausted = true // corpus smaller than k
      else {
        val far = farRows(0)
        centers = centers :+
          ((far.getLong(0), far.getSeq[Float](1), Some(far.getDouble(2))))
      }
    }
    val centsAll = centers.map(_._2)
    val assigned = e
      .select(nearestCellDist(col("embedding"), centsAll)
        .getField("cell").as("step"))
      .groupBy(col("step"))
      .agg(count(lit(1)).as("n_assigned"))
    val spark = embeddings.sparkSession
    import spark.implicits._
    val meta = centers.zipWithIndex.map { case ((id, _, r), i) =>
      (i, id, r.map(d => math.floor(d * 10000.0 + 0.5) / 10000.0))
    }.toDF("step", "center_id", "radius_sq_r")
    meta.join(broadcast(assigned), Seq("step"), "left")
      .select(col("step"), col("center_id"), col("radius_sq_r"),
        coalesce(col("n_assigned"), lit(0L)).as("n_assigned"))
  }

  /** [[kCenter]] + [[coverageAudit]] composed into the one-row
    * acceptance report a pipeline gates on: select k centers, then
    * audit the WHOLE corpus at the final selection radius (+1e-4, one
    * step of the 4-dp grid, so the micro-rounded threshold cannot
    * exclude the boundary point that defined it). The k-center
    * guarantee makes covered_bp = 10000 a structural invariant — a
    * driver-checked oracle row re-proves it from scratch every run.
    * Returns (k, radius_sq_r, n_points, n_covered, covered_bp,
    * max_dist_sq_r, mean_dist_sq_r).
    */
  def kCenterCoverage(embeddings: DataFrame, k: Int): DataFrame = {
    val sel = kCenter(embeddings, k).orderBy(col("step").asc).collect()
    require(sel.nonEmpty, "kCenterCoverage needs a non-empty corpus")
    val ids = sel.map(_.getAs[Long]("center_id")).toSet
    val byId = embeddings.select(col("vec_id"), col("embedding"))
      .where(col("vec_id").isInCollection(ids))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val centers = sel.map(r => byId(r.getAs[Long]("center_id"))).toSeq
    val lastRadius =
      if (sel.length < 2) 0.0
      else sel.last.getAs[Double]("radius_sq_r")
    val thr = lastRadius + 0.0001
    coverageAudit(embeddings, centers, thr)
      .select(lit(sel.length.toLong).as("k"),
        lit(lastRadius).as("radius_sq_r"),
        col("n_points"), col("n_covered"), col("covered_bp"),
        col("max_dist_sq_r"), col("mean_dist_sq_r"))
  }

  /** Coverage audit of a chosen center set: the fraction of corpus
    * points within `radiusSq` of their nearest center, plus the exact
    * max/mean nearest-center distance — the acceptance check run after
    * [[kCenter]] (or any cheaper selection) before the subset is trusted
    * to represent the corpus. One native projection + one bounded
    * aggregate; no shuffle beyond the 1-row agg.
    */
  def coverageAudit(embeddings: DataFrame, centers: Seq[Seq[Float]],
      radiusSq: Double): DataFrame =
    embeddings
      .select(nearestCellDist(col("embedding"), centers)
        .getField("d").as("dmin"))
      // per-row 4-dp micro-quantize BEFORE the sum: an integer sum is
      // partition-order independent, a raw double sum is not
      .select(col("dmin"),
        floor(col("dmin") * 10000.0 + 0.5).cast("long").as("d_u"))
      .agg(count(lit(1)).as("n_points"),
        count(when(col("dmin") <= radiusSq, 1)).as("n_covered"),
        floor(count(when(col("dmin") <= radiusSq, 1)) * 10000.0 /
          count(lit(1)) + 0.5).cast("long").as("covered_bp"),
        (floor(max(col("dmin")) * 10000.0 + 0.5) / 10000.0).as("max_dist_sq_r"),
        (floor(sum(col("d_u")) / count(lit(1)) + 0.5) / 10000.0)
          .as("mean_dist_sq_r"))
}
