package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftnative.FloatVecDot.fdot

/** IVF (inverted-file) ANN: a coarse k-means quantizer partitions the
  * corpus into `k` cells; a query probes only the `nprobe` nearest cells.
  * The scale path beyond sign-LSH: cells adapt to the data distribution.
  *
  * Training is deterministic (first-k seeding, fixed Lloyd iterations, id
  * tie-breaks) — no RNG, so cell assignments are reproducible across runs
  * and executors. Centroids are tiny (k * dim doubles) and ride along as a
  * broadcast table; at 100 TB the cell id is a precomputed, partition-
  * friendly column and search is an equi-join on it.
  */
object Ivf {

  /** |a-c|^2 = a.a - 2 a.c + c.c with the self-dots hoisted: `a2`/`c2` are
    * precomputed columns, so each (vector, centroid) pair costs ONE dot
    * product instead of three.
    */
  private def sqDist(emb: Column, cen: Column, a2: Column, c2: Column): Column =
    a2 - lit(2.0) * fdot(emb, cen) + c2

  /** Centroids with their precomputed self-dot. */
  private def withC2(centroids: DataFrame): DataFrame =
    centroids.withColumn("c2", fdot(col("centroid"), col("centroid")))

  /** Train a deterministic coarse quantizer; returns (cell_id, centroid)
    * rows, centroid as array<float>.
    */
  def train(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings.select(col("vec_id"), col("embedding"))

    // deterministic seeding: the k lowest vec_ids
    var centroids = e.orderBy("vec_id").limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }.toSeq
      .toDF("cell_id", "centroid")

    (0 until iters).foreach { _ =>
      val assigned = assign(e, centroids)
      // new centroid = element-wise mean of the cell's members
      val next = assigned
        .select(col("cell_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell_id"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cell_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell_id"),
          expr("transform(pm, x -> CAST(x.m AS FLOAT))").as("centroid"))
      // keep empty cells' previous centroid; materialize to the driver
      // (k * dim floats) so the next iteration doesn't re-derive lineage
      val updated = centroids.as("old")
        .join(next.as("new"), Seq("cell_id"), "left")
        .select(col("cell_id"),
          coalesce(col("new.centroid"), col("old.centroid")).as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).toSeq
      centroids = updated.toDF("cell_id", "centroid")
    }
    centroids
  }

  /** Nearest cell per vector (deterministic tie-break on cell_id). */
  def assign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d"), col("cell_id"))
    embeddings
      .withColumn("a2", fdot(col("embedding"), col("embedding")))
      .crossJoin(broadcast(withC2(centroids)))
      .withColumn("d", sqDist(col("embedding"), col("centroid"), col("a2"), col("c2")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(embeddings.columns.map(col) :+ col("cell_id"): _*)
  }

  /** Probe assignment: each query mapped to its `nprobe` nearest cells. */
  private def probes(queries: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("d"), col("cell_id"))
    queries
      .withColumn("a2", fdot(col("q_emb"), col("q_emb")))
      .crossJoin(broadcast(withC2(centroids)))
      .withColumn("d", sqDist(col("q_emb"), col("centroid"), col("a2"), col("c2")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cell_id"))
  }

  /** IVF top-k search: rank candidates by cosine within the probed cells. */
  def search(queries: DataFrame, candidates: DataFrame, centroids: DataFrame,
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
}
