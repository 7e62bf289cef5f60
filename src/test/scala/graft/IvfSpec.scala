package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.operators.Ivf

class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated clusters along coordinate axes + deterministic
    * jitter.
    */
  private def clustered = (0 until 30).map { i =>
    val axis = i % 3
    val base = Array.fill(8)(0.01f * ((i * 7) % 5))
    base(axis) = 10.0f
    (i.toLong, base, axis)
  }.toSeq.toDF("vec_id", "embedding", "true_cluster")

  test("train + assign groups separated clusters into consistent cells") {
    val centroids = Ivf.train(clustered, k = 3, iters = 2)
    assert(centroids.size == 3)
    val cells = Ivf.assign(clustered, centroids)
      .select("true_cluster", "cell_id")
      .collect().map(r => r.getInt(0) -> r.getInt(1))
    // every member of a true cluster lands in the same cell
    val byTrue = cells.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(byTrue.values.forall(_.size == 1), s"mixed cells: $byTrue")
    // and distinct clusters use distinct cells
    assert(byTrue.values.flatten.toSet.size == 3)
  }

  test("assign is a pure projection: no Exchange between scan and cell id") {
    val centroids = Ivf.train(clustered, k = 3, iters = 2)
    val plan = Ivf.assign(clustered, centroids).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"), s"cell assignment shuffled:\n$plan")
  }

  test("search returns an identical twin as the top neighbor") {
    val twin = Seq((100L, Array(10.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "true_cluster")
    val corpus = clustered.unionByName(twin)
    val centroids = Ivf.train(corpus, k = 3, iters = 2)
    val out = Ivf.search(
      corpus.where($"vec_id" === 100L), corpus, centroids, nprobe = 1, topK = 3)
      .orderBy("rank").collect()
    // vec 0 has embedding (10, jitter...) in the same axis-0 cell
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("neighbor_id") == 0L ||
      out.head.getAs[Double]("sim_r") > 0.99)
  }

  test("recallAudit: recall monotone in nprobe, full probe = exact") {
    // clusters of 3 per axis: a query's own cell holds only 2 non-self
    // neighbors, so IVF top-5 at nprobe=1 can hit at most 2 of the true
    // top-5 — recall exactly 2/5 — while probing every cell IS brute
    // force (recall exactly 1)
    val tiny = (0 until 9).map { i =>
      val axis = i % 3
      val base = Array.fill(8)(0.01f * ((i * 7) % 5))
      base(axis) = 10.0f
      (i.toLong, base, axis)
    }.toSeq.toDF("vec_id", "embedding", "true_cluster")
    val centroids = Ivf.train(tiny, k = 3, iters = 2)
    val out = Ivf.recallAudit(tiny.where($"vec_id" < 4), tiny, centroids,
        nprobes = Seq(1, 3), topK = 5)
      .collect().map(r => r.getAs[Long]("nprobe") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Double]("mean_recall_r"),
          r.getAs[Double]("min_recall_r")))).toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L)._1 == 4L)
    assert(out(3L)._2 == 1.0 && out(3L)._3 == 1.0)
    assert(out(1L)._2 == 0.4 && out(1L)._3 == 0.4)
  }

  test("training is deterministic") {
    val a = Ivf.train(clustered, 3, 2)
    val b = Ivf.train(clustered, 3, 2)
    assert(a == b)
  }

  test("nearestCells yields NULL for a vector of the wrong dimensionality") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graftnative.NearestCells.nearestCells
    val cents = Seq(Seq(0.0f, 0.0f), Seq(5.0f, 0.0f))
    val r = Seq((1L, Array(4.0f, 0.0f, 9.0f))).toDF("vec_id", "embedding")
      .select(nearestCells(col("embedding"), cents, 1).as("cells"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("cellStats reports per-cell population and mean inertia") {
    val cents = Seq(Seq(0.0f, 0.0f), Seq(10.0f, 0.0f))
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f)),   // cell 0, d^2 = 0
      (2L, Array(1.0f, 0.0f)),   // cell 0, d^2 = 1
      (3L, Array(10.0f, 2.0f))   // cell 1, d^2 = 4
    ).toDF("vec_id", "embedding")
    val out = Ivf.cellStats(vecs, cents).collect()
      .map(r => r.getAs[Int]("cell_id") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Double]("mean_sqd_r"))).toMap
    assert(out(0) == (2L, 0.5))
    assert(out(1) == (1L, 4.0))
  }

  test("materialized index search equals direct search and prunes unprobed cells") {
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = Ivf.train(e.where(col("vec_id") % 5 === 0), k = 16, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString
    Ivf.buildIndex(e, centroids, path)
    val queries = e.where(col("vec_id") < 8)
    val direct = Ivf.search(queries, e, centroids, nprobe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val indexed = Ivf.searchIndex(spark, path, queries, centroids, nprobe = 2, topK = 5)
    assert(indexed.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      == direct)
    // the probed-cell filter must prune at the partition level: the scan
    // reads fewer files than cells in the index. AQE wraps the executed
    // plan in adaptive stages that hide the scan node from collect, so
    // assert on a non-adaptive run of the same query.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val flat = try {
      val again = Ivf.searchIndex(spark, path, queries, centroids, nprobe = 2, topK = 5)
      again.collect()
      again
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val scan = flat.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val totalCells = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("cell_id="))
    assert(scan.metrics("numFiles").value < totalCells,
      s"scanned ${scan.metrics("numFiles").value} files out of $totalCells cells — no pruning")
  }

  test("nearestCells orders by distance with cell-id tie-break") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graftnative.NearestCells.nearestCells
    // centroids 1 and 2 are identical: the tie must resolve to cell 1
    val cents = Seq(Seq(0.0f, 0.0f), Seq(5.0f, 0.0f), Seq(5.0f, 0.0f))
    val out = Seq((1L, Array(4.0f, 0.0f))).toDF("vec_id", "embedding")
      .select(nearestCells(col("embedding"), cents, 3).as("cells"))
      .collect().head.getSeq[Int](0)
    assert(out == Seq(1, 2, 0))
  }
}
