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

  /** Generalization-lattice sweep — the planning companion of
    * [[kAnonymityAudit]]: when the full quasi set fails k-anonymity, the
    * fix is to GENERALIZE (publish fewer / coarser quasi columns), and
    * the planner needs every lattice level's risk profile to pick the
    * minimal generalization that releases. One `cube` pass scores all
    * 2^|quasi| subset levels at once: per level, the class count, the
    * smallest class, how many classes violate k, and how many ROWS sit
    * in violating classes (the re-identifiable population — the number a
    * privacy review actually reads). `meets_k` marks releasable levels;
    * the first row in (n_generalized, retained) order with meets_k is
    * the minimal-loss release.
    *
    * Scale shape: cube expands each row 2^|quasi| ways (4 for the
    * registered pair — bounded, declared), partial-aggregates before the
    * exchange, and the level rollup is over class rows only. Quasi
    * columns must be non-null (real NULLs would collide with cube's
    * grouping nulls; `grouping()` flags keep the LEVELS apart but a
    * null-keyed class inside a level would merge — gate upstream).
    */
  def generalizationLattice(df: DataFrame, quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1)
    val g = quasiCols.map(col)
    // grouping() is only legal inside the cube's own agg clause
    val classes = df.cube(g: _*)
      .agg(count(lit(1)).as("class_size"),
        quasiCols.map(c => grouping(col(c)).cast("int").as(s"g_$c")): _*)
      .select(Seq(col("class_size")) ++
        quasiCols.map(c => col(s"g_$c")): _*)
    val retained = concat_ws("+",
      quasiCols.map(c => when(col(s"g_$c") === 0, lit(c))): _*)
    classes
      .groupBy(quasiCols.map(c => col(s"g_$c")): _*)
      .agg(count(lit(1)).as("n_classes"),
        min(col("class_size")).as("min_class_size"),
        sum(when(col("class_size") < k, 1L).otherwise(0L))
          .as("violating_classes"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("rows_at_risk"))
      .select(
        when(retained === "", "(none)").otherwise(retained).as("retained"),
        quasiCols.map(c => col(s"g_$c")).reduce(_ + _).cast("long")
          .as("n_generalized"),
        col("n_classes"), col("min_class_size"), col("violating_classes"),
        col("rows_at_risk"), (col("violating_classes") === 0).as("meets_k"))
      .orderBy(col("n_generalized"), col("retained"))
  }
}
