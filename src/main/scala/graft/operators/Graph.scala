package graft.operators

import org.apache.spark.sql.DataFrame
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
    val raw = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c:"), col("o_custkey").cast("string")).as("a"),
        concat(lit("s:"), col("l_suppkey").cast("string")).as("b"))
      .distinct()
    val edges0 = raw.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(raw.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
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
}
