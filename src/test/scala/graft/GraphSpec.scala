package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // tiny trade log: customers 1..3, suppliers 10..11
  //   c1 -> s10, c1 -> s11, c2 -> s10, c3 -> s10  (c3 also repeats orders,
  //   which must collapse: edges are DISTINCT pairs)
  private def tinyOrders = Seq(
    (100L, 1L), (101L, 1L), (102L, 2L), (103L, 3L), (104L, 3L)
  ).toDF("o_orderkey", "o_custkey")
  private def tinyLineitem = Seq(
    (100L, 10L), (101L, 11L), (102L, 10L), (103L, 10L), (104L, 10L)
  ).toDF("l_orderkey", "l_suppkey")

  test("pageRank: conserved upper bound, determinism, and hub ordering") {
    val out = Graph.pageRank(tinyOrders, tinyLineitem, iters = 6, topK = 20)
      .collect()
    val ranks = out.map(r => r.getAs[String]("node_id") ->
      r.getAs[Long]("rank_micro")).toMap
    // 5 nodes (c1 c2 c3 s10 s11); every endpoint appears
    assert(ranks.keySet == Set("c:1", "c:2", "c:3", "s:10", "s:11"))
    // s10 has degree 3 (c1, c2, c3) and must out-rank everything
    val s10 = ranks("s:10")
    assert(ranks.values.forall(_ <= s10))
    // degree column reflects the distinct undirected adjacency
    val deg = out.map(r => r.getAs[String]("node_id") ->
      r.getAs[Long]("degree")).toMap
    assert(deg == Map("c:1" -> 2L, "c:2" -> 1L, "c:3" -> 1L,
      "s:10" -> 3L, "s:11" -> 1L))
    // total mass never exceeds injected mass: N*150000 per round on top of
    // damped carryover, bounded by N * 1e6 (floor division only loses)
    assert(ranks.values.sum <= 5L * 1000000L)
    // exact-integer arithmetic: a second run is bit-identical
    val again = Graph.pageRank(tinyOrders, tinyLineitem, iters = 6, topK = 20)
      .collect().map(r => r.getAs[String]("node_id") ->
        r.getAs[Long]("rank_micro")).toMap
    assert(again == ranks)
  }

  test("pageRank: symmetric graph yields equal ranks") {
    // c1 -> s10 and c2 -> s11 are two disjoint symmetric pairs: all four
    // nodes are structurally identical and must converge to the same rank
    val o = Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
    val l = Seq((1L, 10L), (2L, 11L)).toDF("l_orderkey", "l_suppkey")
    val ranks = Graph.pageRank(o, l, iters = 4, topK = 10).collect()
      .map(_.getAs[Long]("rank_micro")).toSet
    assert(ranks.size == 1)
  }

  test("pageRank: empty join yields empty result, not a crash") {
    val o = Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
    val l = Seq((99L, 10L)).toDF("l_orderkey", "l_suppkey")
    assert(Graph.pageRank(o, l).collect().isEmpty)
  }
}
