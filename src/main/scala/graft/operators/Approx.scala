package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB substitutes for exact operators
  * whose state doesn't fit or whose shuffle doesn't pay:
  *
  * - distinct counts: HyperLogLog++ sketch, constant memory per group vs
  *   the expand/two-phase plan of exact countDistinct;
  * - quantiles: Greenwald-Khanna/KLL-style sketch via approx_percentile,
  *   single pass, no per-group sort;
  * - frequent items: count-min-style via Spark's freqItems.
  *
  * Exact variants live next to each operator (Etl.wipAggregate,
  * q_event_percentiles); these are the declared-error alternatives.
  */
object Approx {

  /** Distinct count per group with bounded relative error (default 5%,
    * Spark's approx_count_distinct rsd).
    */
  def distinctCounts(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_distinct_$valueCol"))

  /** Single-pass approximate percentiles per group. `accuracy` trades
    * memory for error (error <= 1/accuracy).
    */
  def percentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      percentages: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val pcts = percentages.mkString("array(", ", ", ")")
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"approx_percentile($valueCol, $pcts, $accuracy)")
        .as(s"approx_percentiles_$valueCol"))
  }

  /** Count-min sketch over the corpus token stream, certified against
    * exact counts for the true top-`k` tokens: (token, true_count,
    * cms_est) with cms_est >= true_count always (one-sided error) and
    * equality whenever none of the token's d cells collide.
    *
    * The sketch is d rows x w counters keyed by the salted portable fold
    * (bucket_r(t) = fold("cms" + r + ":" + t) % w) so a SQL oracle
    * replays the whole structure. 100 TB posture: the cells frame is a
    * map-side-combinable groupBy bounded at d*w counters per partition
    * (and d*w rows total — a fixed-size frequency summary of an unbounded
    * stream); estimates join the candidate set against the BROADCAST
    * sketch. The exact count side exists here to certify the estimates;
    * a production scorer keeps only the d*w cells.
    */
  def cmsTopK(docs: DataFrame, d: Int, w: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    val bucket = (r: Int, t: Column) =>
      pmod(rollingHash(concat(lit(s"cms$r:"), t)), lit(w.toLong))
    val cnt = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("true_count"))
    // cell(r, b) = sum of counts of all tokens hashing to b in row r;
    // building from the (token, count) aggregate is identical to folding
    // the raw stream (addition commutes) without a d-fold stream blowup
    val cells = cnt
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(r, col("token")).as("b"),
          col("true_count").as("c"))): _*)).as("x"))
      .groupBy(col("x.r").as("r"), col("x.b").as("b"))
      .agg(sum(col("x.c")).as("v"))
    cnt
      .select(col("token"), col("true_count"),
        posexplode(array((0 until d).map(r => bucket(r, col("token"))): _*))
          .as(Seq("r", "b")))
      .join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("token"), col("true_count"))
      .agg(min(col("v")).as("cms_est"))
      .orderBy(col("true_count").desc, col("token").asc)
      .limit(k)
  }
}
