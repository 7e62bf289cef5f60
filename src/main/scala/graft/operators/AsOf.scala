package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no built-in for.
  *
  * For every left row, attach the latest right row of the same key with
  * `rightTs <= leftTs` (inclusive), or nulls if none — the semantics of
  * DuckDB/kdb ASOF LEFT JOIN.
  *
  * Implementation: tag and union both sides, then one window pass per key
  * ordered by (ts, tag) carrying the last-seen right row as a struct
  * (struct keeps the matched row's columns consistent — per-column
  * `last(ignoreNulls)` could mix columns from different right rows when
  * right values are legitimately null). ONE shuffle on the key — no
  * range-join explosion, no per-row subqueries; this is the
  * partition-friendly formulation that survives 100 TB.
  *
  * Right rows must be unique per (key, rightTs) for deterministic results.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val leftOnly = left.columns.filterNot(keyCols.contains).toSeq
    val rightOnly = right.columns.filterNot(c => keyCols.contains(c)).toSeq // includes rightTs

    val lpart = left.select(
      keyCols.map(col) ++
        leftOnly.map(col) ++
        Seq(lit(null).cast(org.apache.spark.sql.types.StructType(
          rightOnly.map(c => right.schema(c)))).as("_rv")) :+
        col(leftTs).as("_ets") :+ lit(1).as("_tag"): _*)
    val rpart = right.select(
      keyCols.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(rightOnly.map(col): _*).as("_rv")) :+
        col(rightTs).as("_ets") :+ lit(0).as("_tag"): _*)

    // right rows sort before left rows at equal ts -> inclusive (>=) match
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ets"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lpart.unionByName(rpart)
      .withColumn("_matched", last(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
      .select(keyCols.map(col) ++ leftOnly.map(col) ++
        rightOnly.map(c => col(s"_matched.$c").as(c)): _*)
  }

  /** As-of join with a staleness bound (kdb/QuestDB `tolerance`): the
    * matched right row is kept only if `leftTs - rightTs <= tolerance`
    * (same units as the ts columns), else the right columns are null.
    * Tolerance REJECTS a too-stale match — it never falls back to an
    * older right row (an older row is staler still) — so post-gating
    * the plain as-of result is exact, and the plan cost is identical:
    * the one union+window shuffle plus a per-row projection.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      tolerance: Long): DataFrame = {
    val rightOnly = right.columns.filterNot(keyCols.contains).toSeq
    val joined = asofJoin(left, right, keyCols, leftTs, rightTs)
      .withColumn("_fresh", col(rightTs).isNotNull &&
        col(leftTs) - col(rightTs) <= tolerance)
    rightOnly.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(col("_fresh"), col(c))
        .otherwise(lit(null).cast(right.schema(c).dataType)))
    }.drop("_fresh")
  }
}
