package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy audits over tabular quasi-identifiers — the release gate a
  * training-data pipeline runs before publishing per-entity tables
  * (the reference's warehouse loads, rdb.py / transfer.py, expose
  * exactly such tables; this is the check that belongs in front of
  * them).
  */
object Privacy {

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    * al. 2007): per quasi-identifier combination (equivalence class),
    * the class size — k-anonymity demands every class have at least k
    * members, or its rows are re-identifiable by joining the quasi
    * columns against an external dataset — and the number of DISTINCT
    * sensitive values in the class — l-diversity demands at least l, or
    * a k-anonymous class still leaks the sensitive attribute (everyone
    * in it shares one value). One row per equivalence class, bounded by
    * the quasi-identifier domain, never the table; `releasable` is the
    * conjunction a release gate reads, the per-class counts are what
    * generalization / suppression planning reads.
    *
    * Scale shape: ONE aggregate keyed on the quasi columns; the
    * distinct-sensitive count rides the same shuffle (Spark plans the
    * standard two-phase expand — partial aggregation on (quasi, sens)
    * first, so the exchange carries at most one row per class-value
    * pair, not the table).
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitive: Column, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1 && l >= 1)
    val g = quasiCols.map(col)
    df.select(g :+ sensitive.as("sens"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("sens")).as("l_distinct"))
      .select(g ++ Seq(
        col("class_size"),
        (col("class_size") >= k).as("meets_k"),
        col("l_distinct"),
        (col("l_distinct") >= l).as("meets_l"),
        (col("class_size") >= k && col("l_distinct") >= l)
          .as("releasable")): _*)
      .orderBy(g: _*)
  }
}
