package graft.validation

import org.apache.spark.sql.DataFrame

/** Schema inference + validation, the metadata half of the reference's
  * parquet utilities.
  *
  * Reference: etl/utils/parquet.py:29 (infer_schema: column -> type map
  * read off the frame) and parquet.py:80 (validate_schema: compare against
  * an expected schema, report missing/extra columns). Schema is driver
  * metadata — no job runs; the report itself is a small DataFrame so it
  * can be sunk/joined like any other dataset.
  */
object SchemaCheck {

  /** Column -> Spark-DDL type, in schema order (parquet.py:29). */
  def inferSchema(df: DataFrame): Seq[(String, String)] =
    df.schema.map(f => f.name -> f.dataType.simpleString)

  /** Validation report (parquet.py:80): one row per expected or actual
    * column with status `ok` / `type_mismatch` / `missing` (expected,
    * absent) / `extra` (present, unexpected). Expected columns keep their
    * given order; extras follow in schema order.
    */
  def validateSchema(df: DataFrame, expected: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val actual = inferSchema(df)
    val actualMap = actual.toMap
    val expectedNames = expected.map(_._1).toSet
    val rows =
      expected.map { case (name, t) =>
        actualMap.get(name) match {
          case None                  => (name, Option(t), None: Option[String], "missing")
          case Some(a) if a == t     => (name, Option(t), Option(a), "ok")
          case Some(a)               => (name, Option(t), Option(a), "type_mismatch")
        }
      } ++ actual.collect { case (name, t) if !expectedNames.contains(name) =>
        (name, None: Option[String], Option(t), "extra")
      }
    rows.toDF("column_name", "expected_type", "actual_type", "status")
  }
}
