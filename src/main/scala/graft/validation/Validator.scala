package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chainable data-quality rule engine compiled to ONE aggregate pass.
  *
  * Reference: etl/utils/validation.py:47 (DataValidator) runs each rule as a
  * separate pandas scan. Here every `check_*` contributes an aggregate
  * expression and `report()` evaluates all of them in a single distributed
  * scan — at 100 TB the difference between 1 and N full-table reads.
  *
  * The report is a single row: `total_rows` plus one `<rule>_<column>`
  * failed-count per rule (0 = passed), mirroring ValidationReport's
  * per-rule failed_count.
  */
final class Validator private (df: DataFrame, rules: Vector[(String, Column)]) {

  private def add(name: String, agg: Column) =
    new Validator(df, rules :+ (name -> agg.cast("long").as(name)))

  /** Null count. Reference: validation.py:54 check_not_null. */
  def checkNotNull(c: String): Validator =
    add(s"not_null_$c", count(lit(1)) - count(col(c)))

  /** Duplicate count. Reference: validation.py:70 check_unique. */
  def checkUnique(c: String): Validator =
    add(s"unique_$c", count(col(c)) - countDistinct(col(c)))

  /** Out-of-range count. Reference: validation.py:86 check_range. */
  def checkRange(c: String, minVal: Option[Double] = None, maxVal: Option[Double] = None): Validator = {
    val below = minVal.map(col(c) < _)
    val above = maxVal.map(col(c) > _)
    val bad = (below, above) match {
      case (Some(b), Some(a)) => b || a
      case (Some(b), None)    => b
      case (None, Some(a))    => a
      case _                  => lit(false)
    }
    add(s"range_$c", count(when(bad, lit(1))))
  }

  /** Disallowed-value count. Reference: validation.py:141 check_values_in. */
  def checkValuesIn(c: String, allowed: Seq[String]): Validator =
    add(s"values_in_$c", count(when(col(c).isNotNull && !col(c).isin(allowed: _*), lit(1))))

  /** Pattern-mismatch count. Reference: validation.py:161 check_regex. */
  def checkRegex(c: String, pattern: String): Validator =
    add(s"regex_$c", count(when(col(c).isNotNull && !col(c).rlike(pattern), lit(1))))

  /** Arbitrary predicate violation count. Reference: validation.py:183. */
  def checkCustom(name: String, failed: Column): Validator =
    add(s"custom_$name", count(when(failed, lit(1))))

  /** Declared-type check (schema-level, no scan cost): 0 if the column's
    * Spark type matches the expected DDL string, else 1.
    * Reference: validation.py:115 check_type.
    */
  def checkType(c: String, expectedDdl: String): Validator = {
    val actual = df.schema.find(_.name == c).map(_.dataType.simpleString)
    val ok = actual.contains(
      org.apache.spark.sql.types.DataType.fromDDL(expectedDdl).simpleString)
    add(s"type_$c", lit(if (ok) 0L else 1L))
  }

  /** Row-count bounds: failed count is 1 when outside [min, max].
    * Reference: validation.py:200 check_row_count.
    */
  def checkRowCount(minCount: Option[Long] = None, maxCount: Option[Long] = None): Validator = {
    val n = count(lit(1))
    val bad = (minCount.map(n < _), maxCount.map(n > _)) match {
      case (Some(lo), Some(hi)) => lo || hi
      case (Some(lo), None)     => lo
      case (None, Some(hi))     => hi
      case _                    => lit(false)
    }
    add("row_count", when(bad, lit(1L)).otherwise(lit(0L)))
  }

  /** Single-pass report: total_rows + per-rule failed counts. */
  def report(): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("total_rows") +: rules.map(_._2)
    df.agg(aggs.head, aggs.tail: _*)
  }
}

object Validator {
  def apply(df: DataFrame): Validator = new Validator(df, Vector.empty)
}
