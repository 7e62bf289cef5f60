package graft

import graft.operators.Coreset

class CoresetSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated clusters (sizes 3/4/5) on coordinate axes with
    * deterministic jitter; cluster of vec v = v % 3 for v < 9, then two
    * extras in cluster 1 and one in cluster 2.
    */
  private def clustered = ((0 until 9).map(i => (i.toLong, i % 3)) ++
    Seq((9L, 1), (10L, 2), (11L, 2))).map { case (id, axis) =>
    val base = Array.fill(6)(0.02f * ((id * 3) % 4).toInt)
    base(axis) = 5.0f + 0.1f * (id % 2)
    (id, base, axis)
  }.toDF("vec_id", "embedding", "true_cluster")

  test("kCenter: one center per separated cluster, radii non-increasing") {
    val out = Coreset.kCenter(clustered, k = 3)
      .orderBy("step").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("center_id") == 0L) // seed = lowest id
    assert(out(0).isNullAt(out(0).fieldIndex("radius_sq_r")))
    // the three greedy centers cover all three clusters (max diversity)
    val centerCluster = out.map { r =>
      (r.getAs[Long]("center_id") % 3).toInt
    }.toSet
    assert(centerCluster.size == 3, s"centers not diverse: ${out.toSeq}")
    // selection radii never increase (farthest-point invariant)
    val radii = out.drop(1).map(_.getAs[Double]("radius_sq_r"))
    assert(radii.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // every point assigned; counts match the planted cluster sizes
    val counts = out.map(r =>
      (r.getAs[Long]("center_id") % 3).toInt -> r.getAs[Long]("n_assigned"))
      .toMap
    assert(counts.values.sum == 12L)
    // clusters: 0 -> {0,3,6}, 1 -> {1,4,7,9}, 2 -> {2,5,8,10,11}
    assert(counts == Map(0 -> 3L, 1 -> 4L, 2 -> 5L))
  }

  test("kCenter excludes chosen ids even on degenerate corpora") {
    // two distinct points, k = 2: the second center must be the OTHER
    // point, not a re-pick of the seed at distance 0
    val two = Seq((5L, Array(1.0f, 0.0f)), (9L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Coreset.kCenter(two, k = 2).orderBy("step").collect()
    assert(out.map(_.getAs[Long]("center_id")).toSeq == Seq(5L, 9L))
    assert(out.map(_.getAs[Long]("n_assigned")).toSeq == Seq(1L, 1L))
  }

  test("coverageAudit: full coverage at the final selection radius") {
    val sel = Coreset.kCenter(clustered, k = 3).orderBy("step").collect()
    val lastRadius = sel.last.getAs[Double]("radius_sq_r")
    val centerIds = sel.map(_.getAs[Long]("center_id")).toSet
    val centers = clustered.collect()
      .filter(r => centerIds.contains(r.getAs[Long]("vec_id")))
      .sortBy(r => sel.indexWhere(_.getAs[Long]("center_id") ==
        r.getAs[Long]("vec_id")))
      .map(r => r.getSeq[Float](r.fieldIndex("embedding"))).toSeq
    // the k-center guarantee: after k selections every point sits within
    // the last selection radius of some center (micro-rounding of the
    // audit threshold can only widen the ball)
    val row = Coreset.coverageAudit(clustered, centers, lastRadius + 1e-4)
      .collect()(0)
    assert(row.getAs[Long]("n_points") == 12L)
    assert(row.getAs[Long]("covered_bp") == 10000L)
    assert(row.getAs[Double]("max_dist_sq_r") <= lastRadius + 1e-4)
    assert(row.getAs[Double]("mean_dist_sq_r") <=
      row.getAs[Double]("max_dist_sq_r"))
    // the composed acceptance row reports the same guarantee in one call
    val acc = Coreset.kCenterCoverage(clustered, k = 3).collect()(0)
    assert(acc.getAs[Long]("k") == 3L)
    assert(acc.getAs[Double]("radius_sq_r") == lastRadius)
    assert(acc.getAs[Long]("covered_bp") == 10000L)
    assert(acc.getAs[Long]("n_points") == 12L)
  }
}
