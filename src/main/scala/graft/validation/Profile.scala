package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType,
  LongType, ShortType, TimestampNTZType, TimestampType}

/** Column-level data profiling — the summary a warehouse computes on every
  * landed partition before anything downstream trusts it (the profiling
  * face of the rule-based Validator: rules assert, the profile DESCRIBES).
  * One row per column: row/null counts, null rate in bp, exact distinct
  * count, and numeric min/max (timestamps as epoch micros; non-numeric
  * columns carry NULL bounds).
  *
  * Shape: ONE aggregate pass emits every statistic (the distinct counts
  * expand the pass |cols|-ways — the standard profiler cost; a constant-
  * state alternative is one HLL register file per column, Approx.hllAudit's
  * machinery), then a LocalRelation-sized explode pivots the single stats
  * row into the per-column frame. No per-column rescans.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields
    def numeric(c: String): Option[Column] = cols.find(_.name == c).get.dataType match {
      case LongType | IntegerType | ShortType | DoubleType | FloatType =>
        Some(col(c).cast("double"))
      case TimestampType | TimestampNTZType =>
        Some(unix_micros(col(c).cast("timestamp")).cast("double"))
      case _ => None
    }
    val aggs: Seq[Column] = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { f =>
      val c = f.name
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c")) ++
        numeric(c).toSeq.flatMap(n =>
          Seq(min(n).as(s"min_$c"), max(n).as(s"max_$c")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { f =>
      val c = f.name
      val (mn, mx) = numeric(c) match {
        case Some(_) => (col(s"min_$c"), col(s"max_$c"))
        case None => (lit(null).cast("double"), lit(null).cast("double"))
      }
      struct(lit(c).as("col_name"), col(s"null_$c").as("n_null"),
        col(s"dist_$c").as("n_distinct"), mn.as("min_num"), mx.as("max_num"))
    }
    one.select(col("n_rows"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_name"), col("n_rows"), col("p.n_null"),
        round(col("p.n_null").cast("double") / col("n_rows").cast("double")
          * 10000.0, 0).cast("long").as("null_bp"),
        col("p.n_distinct"), col("p.min_num"), col("p.max_num"))
      .orderBy(col("col_name"))
  }

  /** The constant-state profile [[profile]]'s doc promises: per-column
    * distinct counts from one 512-register HLL file per column
    * (Approx.hllAudit's machinery) instead of the |cols|-way exact
    * `countDistinct` expand — at 100 TB the exact profiler's aggregation
    * state is O(Σ distinct values) while this one's is O(cols · 512)
    * BIGINTs, and the register build map-side combines.
    *
    * `cols` supplies each column's canonical STRING identity (caller
    * picks the portable form: integrals as decimal strings, timestamps
    * as epoch micros, doubles as 2-dp cents — the moneySum discipline —
    * so the register file replays bit-exactly on any engine). The scan
    * explodes |cols| (col_name, value) rows per input row — the same
    * rows the exact profiler hashes into its distinct maps — then
    * everything downstream is register-sized. The exact distinct count
    * and err_bp certificate ride along (the 43d audit pattern); a pure
    * production profile would drop them and keep constant state.
    */
  def profileHll(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    val entries = cols.map { case (n, c) =>
      struct(lit(n).as("col_name"), c.cast("string").as("v"))
    }
    val unpivoted = df
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
    graft.operators.Approx.hllAudit(unpivoted, "col_name", "v")
  }
}
