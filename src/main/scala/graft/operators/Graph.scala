package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational edge lists — the link-analysis
  * tier next to the connected-components family (Dedup.dupClusters): where
  * CC answers "which docs are the same", PageRank answers "which nodes
  * matter", the quality prior web-corpus pipelines (Common-Crawl-style)
  * attach to a harvested page before any content model runs.
  *
  * Reference anchor: the lake-SQL analytics family (trino.py:74) — graph
  * centrality is the canonical query that outgrows one-shot SQL and needs
  * the BSP join loop Spark executes natively.
  */
object Graph {

  /** The undirected customer–supplier edge list (both directions), the
    * shared substrate of [[pageRank]] and [[bfsLayers]]. */
  private def tradeEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val raw = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c:"), col("o_custkey").cast("string")).as("a"),
        concat(lit("s:"), col("l_suppkey").cast("string")).as("b"))
      .distinct()
    raw.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(raw.select(col("b").as("src"), col("a").as("dst")))
  }

  /** Exact-integer PageRank over the customer–supplier trade graph
    * (edges = distinct (o_custkey, l_suppkey) pairs via orders ⋈ lineitem,
    * undirected: each edge contributes both directions, so every node has
    * out-degree ≥ 1 and there is no dangling mass). Fixed `iters` BSP
    * rounds of r'(v) = 150000 + Σ_{u→v} (r(u) * 85) DIV (100 * outdeg(u))
    * starting from r₀ = 1 000 000 micro-units per node — damping 0.85
    * phrased entirely in BIGINT floor division, so the ranks are
    * hash-exact on any engine, partition count, or retry: zero float
    * hazard in an iterative algorithm that is normally all floats.
    *
    * Output: the top `topK` nodes by rank (ties toward the smaller id)
    * with their degree — bounded rows via TakeOrdered, never a full sort.
    *
    * 100 TB posture: the edge list is derived and materialized ONCE
    * (localCheckpoint); each round ships only the N-row share vector
    * (node, pre-divided contribution) as a BROADCAST into the edge join —
    * the edges never shuffle after their one distinct — and the groupBy(dst)
    * partial-aggregates map-side to ≤ N rows per partition before the one
    * slim exchange per round. Degree rides the rank vector via a broadcast
    * N-row join. This holds while the rank vector broadcasts (~10⁷ nodes);
    * beyond that the same loop runs with the edges bucketed by src in a
    * warehouse table (the q_dedup_ingest layout) so only the rank vector
    * ever exchanges. Rank mass is bounded by N * 10⁶ micro-units, so the
    * `* 85` stays far inside BIGINT.
    */
  def pageRank(orders: DataFrame, lineitem: DataFrame, iters: Int = 6,
      topK: Int = 20): DataFrame = {
    val edges0 = tradeEdges(orders, lineitem).localCheckpoint()
    val deg = edges0.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")).localCheckpoint()
    // dst-side degree rides each edge so a round's aggregate rebuilds the
    // (node, pr, deg) vector in ONE pass — no per-round degree join
    val edges = edges0
      .join(broadcast(deg.select(col("node").as("dst"),
        col("deg").as("dst_deg"))), "dst")
      .localCheckpoint()
    var ranks = deg.select(col("node"), lit(1000000L).as("pr"), col("deg"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val shares = ranks.select(col("node").as("src"),
        expr("(pr * 85) DIV (100 * deg)").as("contrib"))
      ranks = edges
        .join(broadcast(shares), "src")
        .groupBy(col("dst").as("node"))
        .agg((lit(150000L) + sum(col("contrib"))).as("pr"),
          max(col("dst_deg")).as("deg"))
        .localCheckpoint()
    }
    ranks
      .select(col("node").as("node_id"), col("pr").as("rank_micro"),
        col("deg").as("degree"))
      .orderBy(col("rank_micro").desc, col("node_id").asc)
      .limit(topK)
  }

  /** WEIGHTED exact-integer PageRank — [[pageRank]] with edge weights:
    * each undirected customer–supplier edge carries the DISTINCT ORDER
    * COUNT between the pair (trade intensity), and a node's damped mass
    * splits proportionally, share(u→v) = (r(u)·85·w_uv) DIV (100·W_u)
    * with W_u the node's total incident weight — still pure BIGINT floor
    * division, so weighted centrality stays hash-exact on any engine.
    * A steady high-volume relationship now outranks many one-off orders,
    * which the unweighted walk cannot see. Same per-round cost profile:
    * the weighted edge list materializes once with (w, dst_deg_w) riding
    * each edge, the share vector broadcasts, the aggregate map-side
    * combines.
    */
  def pageRankWeighted(orders: DataFrame, lineitem: DataFrame,
      iters: Int = 6, topK: Int = 20): DataFrame = {
    val raw = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c:"), col("o_custkey").cast("string")).as("a"),
        concat(lit("s:"), col("l_suppkey").cast("string")).as("b"),
        col("o_orderkey"))
      .groupBy(col("a"), col("b"))
      .agg(countDistinct(col("o_orderkey")).as("w"))
    val edges0 = raw.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(raw.select(col("b").as("src"), col("a").as("dst"), col("w")))
      .localCheckpoint()
    val wdeg = edges0.groupBy(col("src").as("node"))
      .agg(sum(col("w")).as("wdeg"), count(lit(1)).as("deg"))
      .localCheckpoint()
    val edges = edges0
      .join(broadcast(wdeg.select(col("node").as("dst"),
        col("wdeg").as("dst_wdeg"), col("deg").as("dst_deg"))), "dst")
      .localCheckpoint()
    var ranks = wdeg.select(col("node"), lit(1000000L).as("pr"), col("wdeg"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val shares = ranks.select(col("node").as("src"), col("pr"),
        col("wdeg"))
      ranks = edges
        .join(broadcast(shares), "src")
        .select(col("dst"),
          expr("(pr * 85 * w) DIV (100 * wdeg)").as("contrib"),
          col("dst_wdeg"))
        .groupBy(col("dst").as("node"))
        .agg((lit(150000L) + sum(col("contrib"))).as("pr"),
          max(col("dst_wdeg")).as("wdeg"))
        .localCheckpoint()
    }
    ranks.join(broadcast(wdeg.select(col("node"), col("deg"), col("wdeg")
        .as("w_total"))), "node")
      .select(col("node").as("node_id"), col("pr").as("rank_micro"),
        col("deg").as("degree"), col("w_total").as("weight_total"))
      .orderBy(col("rank_micro").desc, col("node_id").asc)
      .limit(topK)
  }

  /** BFS layer expansion from a seed set — the TRAVERSAL member of the
    * graph family (components answer "which", PageRank answers "who
    * matters", this answers "how far"): layer 0 is the seed customers
    * (a nation's), layer i+1 the unvisited neighbors of layer i, run for
    * `maxHops` BSP rounds. Emits one bounded row per layer — node count
    * split by side (on the bipartite trade graph the layers alternate
    * customer/supplier, which the split makes visible) — plus a final
    * `unreached` row for nodes outside the horizon: the
    * market-connectivity profile ("how many hops from the gold segment
    * to the rest of the marketplace").
    *
    * Scale shape: each round is one join of the edge list against the
    * BROADCAST frontier + one distinct, minus-ed against the visited set
    * by a broadcast anti-join (frontier and visited are node-bounded);
    * the edge list materializes once. Set semantics throughout — no
    * ordering, no float, hash-exact anywhere.
    */
  def bfsLayers(orders: DataFrame, lineitem: DataFrame, customer: DataFrame,
      seedNationKey: Int, maxHops: Int = 4): DataFrame = {
    val edges = tradeEdges(orders, lineitem).localCheckpoint()
    val nodes = edges.select(col("src").as("node")).distinct()
      .localCheckpoint()
    val seeds = customer.where(col("c_nationkey") === seedNationKey)
      .select(concat(lit("c:"), col("c_custkey").cast("string")).as("node"))
      .join(nodes, "node").localCheckpoint()
    def layerRow(df: DataFrame, label: Column): DataFrame =
      df.agg(count(lit(1)).as("n_nodes"),
        coalesce(sum(when(col("node").startsWith("c:"), 1L).otherwise(0L)),
          lit(0L)).as("n_customers"),
        coalesce(sum(when(col("node").startsWith("s:"), 1L).otherwise(0L)),
          lit(0L)).as("n_suppliers"))
        .select(label.as("layer"), col("n_nodes"), col("n_customers"),
          col("n_suppliers"))
    val spark = orders.sparkSession
    def zeroRow(hop: Int): DataFrame =
      spark.range(1).select(lit(hop.toLong).as("layer"),
        lit(0L).as("n_nodes"), lit(0L).as("n_customers"),
        lit(0L).as("n_suppliers"))
    var frontier = seeds
    var visited = seeds
    var out = layerRow(frontier, lit(0L))
    // convergence certificate, CC-style: once a frontier comes back empty
    // every later layer is empty by definition — emit literal zero rows
    // instead of paying join rounds past the graph's diameter
    var exhausted = frontier.limit(1).count() == 0
    for (hop <- 1 to maxHops) {
      if (!exhausted) {
        frontier = edges
          .join(broadcast(frontier.select(col("node").as("src"))), "src")
          .select(col("dst").as("node")).distinct()
          .join(broadcast(visited), Seq("node"), "left_anti")
          .localCheckpoint()
        visited = visited.unionByName(frontier).localCheckpoint()
        exhausted = frontier.limit(1).count() == 0
        out = out.unionByName(layerRow(frontier, lit(hop.toLong)))
      } else out = out.unionByName(zeroRow(hop))
    }
    val unreached = nodes.join(broadcast(visited), Seq("node"), "left_anti")
    out.unionByName(layerRow(unreached, lit(-1L)))
      .orderBy(col("layer"))
  }
}
