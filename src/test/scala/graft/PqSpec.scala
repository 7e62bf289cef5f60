package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.FloatVecSqDist.fsq

import graft.operators.Pq

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("fsq matches the interpreted HOF fold and nulls on length mismatch") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(0.5f, 2.0f, 5.0f)),
      (Seq(0.1f, -0.2f, 0.3f), Seq(0.3f, 0.2f, -0.1f))
    ).toDF("a", "b")
    val rows = df.select(fsq($"a", $"b").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    val bad = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
    assert(bad.select(fsq($"a", $"b")).head().isNullAt(0))
  }

  // 4-dim vectors, m=2 subspaces: subspace clusters at (0,0) and (10,10).
  // With k=2 and iters=1 the codebooks converge to the cluster means, so
  // codes and ADC distances are hand-checkable.
  private def corpus = Seq(
    (0L, Seq(0.0f, 0.0f, 10.0f, 10.0f)),
    (1L, Seq(1.0f, 1.0f, 11.0f, 11.0f)),
    (2L, Seq(10.0f, 10.0f, 0.0f, 0.0f)),
    (3L, Seq(11.0f, 11.0f, 1.0f, 1.0f)),
    (4L, Seq(0.5f, 0.5f, 10.5f, 10.5f))
  ).toDF("vec_id", "embedding")

  test("encode assigns each subspace to its nearest codebook entry") {
    val cb = Pq.train(corpus, dim = 4, m = 2, k = 2, iters = 1)
    assert(cb.size == 2 && cb.forall(_.size == 2))
    val codes = Pq.encode(corpus, cb, dim = 4).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // vectors 0,1,4 share one subspace-0 cluster; 2,3 the other — codes
    // must agree within clusters and differ across them
    assert(codes(0L) == codes(1L) && codes(1L) == codes(4L))
    assert(codes(2L) == codes(3L))
    assert(codes(0L)._1 != codes(2L)._1 && codes(0L)._2 != codes(2L)._2)
  }

  test("ADC search ranks same-cluster vectors first and is deterministic") {
    val cb = Pq.train(corpus, dim = 4, m = 2, k = 2, iters = 1)
    val queries = corpus.where($"vec_id" === 0)
    val out = Pq.search(queries, corpus, cb, dim = 4, topK = 4)
      .orderBy("rank").collect()
    assert(out.length == 4)
    // neighbors 1 and 4 (same cluster) must outrank 2 and 3
    val order = out.map(_.getAs[Long]("neighbor_id")).toSeq
    assert(order.take(2).toSet == Set(1L, 4L))
    val again = Pq.search(queries, corpus, cb, dim = 4, topK = 4)
      .orderBy("rank").collect()
    assert(out.toSeq == again.toSeq)
  }

  test("IVF-PQ search only ranks candidates in probed cells") {
    import graft.operators.Ivf
    val cb = Pq.train(corpus, dim = 4, m = 2, k = 2, iters = 1)
    val coarse = Ivf.train(corpus, k = 2, iters = 2)
    val queries = corpus.where($"vec_id" === 0)
    // nprobe=1: only vector 0's own cell {0, 1, 4} is scanned; the
    // opposite cluster never reaches the ranking stage
    val out = Pq.searchIvfPq(queries, corpus, coarse, cb,
      dim = 4, nprobe = 1, topK = 4).collect()
    val ids = out.map(_.getAs[Long]("neighbor_id")).toSet
    assert(ids == Set(1L, 4L))
    // nprobe=2 probes both cells and recovers the full candidate set
    val wide = Pq.searchIvfPq(queries, corpus, coarse, cb,
      dim = 4, nprobe = 2, topK = 4).collect()
    assert(wide.map(_.getAs[Long]("neighbor_id")).toSet == Set(1L, 2L, 3L, 4L))
  }
}
