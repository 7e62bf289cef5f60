package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftnative.FloatVecDot.fdot
import org.apache.spark.sql.graftnative.NearestCells.{nearestCell, nearestCells}

/** IVF (inverted-file) ANN: a coarse k-means quantizer partitions the
  * corpus into `k` cells; a query probes only the `nprobe` nearest cells.
  * The scale path beyond sign-LSH: cells adapt to the data distribution.
  *
  * Training is deterministic and order-independent: first-k seeding by
  * ascending id, fixed Lloyd iterations, id tie-breaks, and per-dimension
  * means computed as EXACT decimal sums (a plain avg() over doubles folds
  * in partition order and can flip a near-tied assignment between cluster
  * layouts). Centroids are tiny (k * dim floats) and live on the driver;
  * cell assignment is a native one-pass expression over the broadcast
  * matrix — no crossJoin row blowup, no argmin shuffle. At 100 TB the cell
  * id is a scan-speed derived column and search is an equi-join on it.
  */
object Ivf {

  /** Train the coarse quantizer; returns the centroid matrix (row index =
    * cell id). Driver memory is k * dim floats — fine to k ~ 1e5 at
    * dim 64; beyond that train a hierarchical quantizer instead.
    */
  def train(embeddings: DataFrame, k: Int, iters: Int): Seq[Seq[Float]] = {
    val e = embeddings.select(col("vec_id"), col("embedding"))

    // deterministic seeding: the k lowest vec_ids, cell i = i-th lowest
    var centroids: Seq[Seq[Float]] = e.orderBy("vec_id").limit(k)
      .collect().map(_.getSeq[Float](1)).toSeq

    (0 until iters).foreach { _ =>
      // per-cell, per-dimension exact mean: float -> decimal(20,10) is a
      // deterministic rounding, the decimal sum is order-independent, and
      // only then does the value return to float via one double division.
      // ONE shuffle per iteration; the k*dim mean cells are assembled
      // into centroid vectors on the driver (they're headed there anyway)
      // instead of a second groupBy + collect_list pass.
      val means = assign(e, centroids)
        .select(col("cell_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell_id"), col("pos"))
        .agg((sum(col("v").cast("decimal(20,10)")).cast("double") /
          count(lit(1))).cast("float").as("m"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getFloat(2))
        .toMap
      // empty cells keep their previous centroid
      centroids = centroids.indices.map { c =>
        if (means.contains((c, 0)))
          centroids(c).indices.map(p => means((c, p)))
        else centroids(c)
      }
    }
    centroids
  }

  /** Quantizer health report: per-cell population and mean squared L2
    * distance to the centroid (the k-means inertia, per cell) — the
    * monitoring signal that tells a production run when the coarse
    * quantizer has drifted from the corpus and needs retraining. Cell
    * assignment is the native no-shuffle projection; the k-row centroid
    * table re-joins as a broadcast; per-row distances are quantized to
    * micro-units (floor(d*1e6+0.5), a deterministic per-row op) so the
    * sum is exact integer arithmetic — reproducible across partition
    * layouts with no double-accumulation order dependence. Only the
    * 4-dp MEAN is emitted: trained centroid floats can differ in the
    * last ulp across engines (decimal->double conversion rounding), so
    * a raw micro-unit sum is not an engine-portable value, while the
    * per-cell mean absorbs ulp-level per-row flips.
    */
  def cellStats(embeddings: DataFrame, centroids: Seq[Seq[Float]]): DataFrame = {
    import org.apache.spark.sql.graftnative.FloatVecSqDist.fsq
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toDF("cell_id", "centroid")
    assign(embeddings.select(col("vec_id"), col("embedding")), centroids)
      .join(broadcast(cents), "cell_id")
      .select(col("cell_id"),
        floor(fsq(col("embedding"), col("centroid")) * 1000000.0 + 0.5)
          .cast("long").as("sqd_u"))
      .groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("sqd_u")).as("sum_sqd_u"))
      .select(col("cell_id"), col("n_vectors"),
        (floor(col("sum_sqd_u").cast("double") / col("n_vectors") / 100.0 + 0.5) / 10000.0)
          .as("mean_sqd_r"))
  }

  /** Nearest cell per vector — a native projection, zero shuffle. */
  def assign(embeddings: DataFrame, centroids: Seq[Seq[Float]]): DataFrame =
    embeddings.withColumn("cell_id", nearestCell(col("embedding"), centroids))

  /** Probe assignment: each query exploded to its `nprobe` nearest cells.
    * nprobe clamps to the cell count — a quantizer trained on a corpus
    * smaller than k has fewer centroids than requested, and probing more
    * cells than exist simply means probing all of them (exact search),
    * not an argument error surfaced from the expression layer.
    */
  private def probes(queries: DataFrame, centroids: Seq[Seq[Float]], nprobe: Int): DataFrame =
    queries.select(col("query_id"), col("q_emb"),
      explode(nearestCells(col("q_emb"), centroids,
        math.min(nprobe, centroids.length))).as("cell_id"))

  /** IVF top-k search: rank candidates by cosine within the probed cells.
    * Queries (with their probe cells) broadcast; the corpus streams once
    * through its single cell assignment and the bucket equi-join.
    */
  def search(queries: DataFrame, candidates: DataFrame, centroids: Seq[Seq[Float]],
      nprobe: Int, topK: Int): DataFrame = {
    val q = probes(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      centroids, nprobe)
      .withColumn("q_norm", sqrt(fdot(col("q_emb"), col("q_emb"))))
    val c = assign(candidates, centroids)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"), col("cell_id"),
        sqrt(fdot(col("embedding"), col("embedding"))).as("c_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.join(broadcast(q), "cell_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        fdot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("cell_id"), col("rank"),
        round(col("sim"), 4).as("sim_r"))
  }

  /** IVF RECALL audit: measured recall@k of [[search]] against the exact
    * brute-force top-k, one row per nprobe — the nprobe selection
    * contract, and the IVF companion of the sign-LSH calibration twin
    * (Similarity.lshCalibration). A 100 TB deployment picks nprobe from
    * this table: per probed-cell budget it reports how much of the TRUE
    * top-k the cell pruning actually keeps (mean and worst query).
    *
    * Cost shape: one brute-force pass over the corpus for the bounded
    * broadcast query panel (the ground truth the bucket join cannot
    * provide — same deliberate O(|Q| x N) as the calibration twins) plus
    * |nprobes| bounded searches; the audit output is |nprobes| rows.
    * The exact top-k and the query panel localCheckpoint so neither
    * recomputes per nprobe.
    */
  def recallAudit(queries: DataFrame, candidates: DataFrame,
      centroids: Seq[Seq[Float]], nprobes: Seq[Int], topK: Int): DataFrame = {
    val exact = Similarity.bruteForceTopK(queries, candidates, topK)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val panel = queries.select(col("vec_id").as("query_id")).localCheckpoint()
    // ONE corpus cell assignment shared by every audited nprobe (the
    // per-candidate argmin over centroids is the search's dominant scan
    // cost — re-deriving it per nprobe triples the audit for nothing);
    // probe cells carry their rank so each block is a cheap filter
    val assigned = assign(candidates, centroids)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        col("cell_id"), sqrt(fdot(col("embedding"), col("embedding"))).as("c_norm"))
      .localCheckpoint()
    val maxProbe = math.min(nprobes.max, centroids.length)
    val probed = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        sqrt(fdot(col("embedding"), col("embedding"))).as("q_norm"))
      .select(col("query_id"), col("q_emb"), col("q_norm"),
        posexplode(nearestCells(col("q_emb"), centroids, maxProbe)))
      .withColumnRenamed("pos", "probe_rank").withColumnRenamed("col", "cell_id")
      .localCheckpoint()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    nprobes.map { np =>
      val hits = assigned
        .join(broadcast(probed.where(col("probe_rank") < np)), "cell_id")
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim",
          fdot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= topK)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits"))
      // a query whose probed cells miss the ENTIRE true top-k has no
      // hits row — the left join keeps it in the audit at recall 0
      panel
        .join(hits, Seq("query_id"), "left")
        .select(coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .agg(count(lit(1)).as("n_queries"),
          (floor(sum(col("n_hits")) * 10000.0 / (count(lit(1)) * topK) + 0.5)
            / 10000.0).as("mean_recall_r"),
          (floor(min(col("n_hits")) * 10000.0 / topK + 0.5) / 10000.0)
            .as("min_recall_r"))
        .select(lit(np.toLong).as("nprobe"), col("n_queries"),
          col("mean_recall_r"), col("min_recall_r"))
    }.reduce(_ unionByName _)
  }

  /** Materialize the IVF index as a hive layout partitioned BY CELL:
    * `path/cell_id=<c>/...` — on a data lake this IS the inverted file.
    * A search that probes `nprobe` cells reads only those directories
    * (partition pruning), so search I/O is corpus_bytes * nprobe / k
    * regardless of corpus size — the property that makes IVF an index
    * rather than a scan. Norms are precomputed into the index so search
    * pays no per-candidate sqrt.
    */
  def buildIndex(embeddings: DataFrame, centroids: Seq[Seq[Float]],
      path: String): Unit =
    assign(embeddings.select(col("vec_id"), col("embedding")), centroids)
      .withColumn("norm", sqrt(fdot(col("embedding"), col("embedding"))))
      .write.partitionBy("cell_id").mode("overwrite").parquet(path)

  /** Search a materialized index: the query set's probed cells become an
    * IN filter on the partition column (queries are few — the cell list
    * is tiny), Spark prunes the unprobed directories at planning time,
    * and only then does the per-(query, cell) join run. Results are
    * identical to `search` over the full corpus.
    */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, centroids: Seq[Seq[Float]],
      nprobe: Int, topK: Int): DataFrame = {
    val q = probes(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      centroids, nprobe)
      .withColumn("q_norm", sqrt(fdot(col("q_emb"), col("q_emb"))))
    val probedCells: Seq[Int] =
      q.select(col("cell_id")).distinct().collect().map(_.getInt(0)).toSeq
    val c = spark.read.parquet(path)
      .where(col("cell_id").isin(probedCells: _*))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        col("cell_id").cast("int").as("cell_id"), col("norm").as("c_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.join(broadcast(q), "cell_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        fdot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("cell_id"), col("rank"),
        round(col("sim"), 4).as("sim_r"))
  }
}
